package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY §4 path (c)): top-k rows per key.
  *
  * The declarative formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k` — must fully sort every key group before ranking.
  * This operator keeps a size-k bounded heap per key instead: O(n log k)
  * per partition, no sort buffer, no rank column materialized. At 100 TB
  * that turns the dominant sort of a "top products per customer" query
  * into a streaming pass over the shuffled groups.
  *
  * Logical node → Strategy → UnaryExecNode, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * usable directly via `TopKPerKey.apply`.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each key's rows; the exchange this induces is the only
    * shuffle of the operator.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortExprs = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = GenerateOrdering.generate(
        BindReferences.bindReferences(sortExprs, org.apache.spark.sql.catalyst.expressions.AttributeSeq(schema)))
      // max-heap wrt ord: head is the worst retained row of the k best
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap += row.copy()
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap += row.copy()
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
              ord.asInstanceOf[Ordering[UnsafeRow]])
            heap += row.copy()
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sorted(ord.asInstanceOf[Ordering[UnsafeRow]]))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame API: top-k rows per key, emitted in sort order within each
    * key (no rank column — pair with a cheap post-projection if ranks are
    * needed). Key/sort columns are resolved by name against the child's
    * analyzed output, so the node enters planning fully resolved.
    *
    * @param order (columnName, ascending) pairs
    */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    val plan = TopKPerKeyNode(
      keys.map(attr),
      order.map { case (n, asc) =>
        SortOrder(attr(n),
          if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
          else org.apache.spark.sql.catalyst.expressions.Descending)
      },
      k,
      child)
    val spark = df.sparkSession
    // prefer registering once via GraftExtensions; this direct-API path
    // installs the strategy idempotently and under a lock so concurrent
    // callers can't race the read-append-write of session state
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
      }
    }
    GraftBridge.ofRows(spark, plan)
  }
}
