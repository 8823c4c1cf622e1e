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
  * into a streaming pass over the shuffled groups. State is bounded at
  * k rows per distinct key, and past a configurable byte budget the
  * heaps spill as key-sorted runs merged at the end (see
  * [[TopKPerKeyExec.doExecute]]) — a high-cardinality partition
  * degrades to disk like Spark's own window path instead of OOMing.
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

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numSpills" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of spilled runs"))

  /** Retained state is bounded at k rows per DISTINCT key — the
    * operator's own output size, strictly smaller than the window
    * path's full-group sort buffer — but a partition with enough
    * distinct keys still cannot hold every heap. Past
    * [[TopKPerKey.SpillBytesKey]] retained bytes, the heaps SPILL as a
    * key-sorted run and the pass continues; at the end the runs merge
    * key-by-key (each run holds a key's top-k over the rows it saw, so
    * the union's top-k is the partition's top-k), holding at most
    * runs×k rows of one key at a time — the ExternalAppendOnlyMap
    * shape, degrade-not-OOM like Spark's own window path.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortExprs = order
    val limit = k
    val spillBytes = conf.getConfString(
      TopKPerKey.SpillBytesKey, (64L << 20).toString).toLong
    val numSpills = longMetric("numSpills")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = GenerateOrdering.generate(
        BindReferences.bindReferences(sortExprs, org.apache.spark.sql.catalyst.expressions.AttributeSeq(schema)))
      val rowOrd = ord.asInstanceOf[Ordering[UnsafeRow]]
      // max-heap wrt ord: head is the worst retained row of the k best
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      var retained = 0L
      val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => spills.foreach(_.delete())))

      // one key-group in run order: key bytes + its ord-sorted rows
      def sortedGroups(): Iterator[(Array[Byte], Array[UnsafeRow])] =
        heaps.toArray
          .map { case (key, heap) => (key.getBytes, heap.toArray.sorted(rowOrd)) }
          .sortWith((a, b) => java.util.Arrays.compare(a._1, b._1) < 0)
          .iterator

      def spill(): Unit = {
        // spill through the DiskBlockManager so runs land on Spark's
        // configured local dirs (spill-space placement, cleanup
        // sweeps); outside a live SparkEnv (bare unit contexts) fall
        // back to java.io.tmpdir — the run format is identical
        val f = Option(org.apache.spark.SparkEnv.get) match {
          case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
          case None => java.io.File.createTempFile("graft-topk-spill", ".bin")
        }
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f)))
        try sortedGroups().foreach { case (kb, rows) =>
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(rows.length)
          rows.foreach { r =>
            val b = r.getBytes; out.writeInt(b.length); out.write(b)
          }
        } finally out.close()
        spills += f
        heaps.clear()
        retained = 0L
        numSpills += 1
      }

      iter.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) {
              heap += row.copy(); retained += row.getSizeInBytes
            } else if (ord.compare(row, heap.head) < 0) {
              retained -= heap.dequeue().getSizeInBytes
              heap += row.copy(); retained += row.getSizeInBytes
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            heap += row.copy()
            heaps.put(key.copy(), heap)
            retained += row.getSizeInBytes + key.getSizeInBytes
        }
        if (retained > spillBytes) spill()
      }

      if (spills.isEmpty) {
        // in-memory fast path — identical to the pre-spill operator
        heaps.valuesIterator.flatMap(_.toSeq.sorted(rowOrd))
      } else {
        // merge the runs plus the in-memory remainder, key by key
        val numFields = schema.length
        val sources: Seq[Iterator[(Array[Byte], Array[UnsafeRow])]] =
          spills.toSeq.map(TopKPerKey.readRun(_, numFields)) :+ sortedGroups()
        TopKPerKey.mergeRuns(sources, rowOrd, limit)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Session conf key bounding retained heap bytes per task before a
    * key-sorted run spills to disk (default 64 MiB). Specs shrink it to
    * force the spill path at test scale.
    */
  val SpillBytesKey = "spark.graft.topk.spill.bytes"

  /** Read one spilled run back as its (keyBytes, rows) groups, in the
    * key-byte order the run was written in. The stream closes on EOF
    * AND via a task-completion listener — a merge iterator abandoned
    * early (e.g. under a LIMIT) would otherwise hold the file handle
    * until executor GC; listeners run LIFO, so these closes land
    * before the partition's spill-file delete registered at task
    * start.
    */
  private[plans] def readRun(f: java.io.File, numFields: Int): Iterator[(Array[Byte], Array[UnsafeRow])] =
    new Iterator[(Array[Byte], Array[UnsafeRow])] {
      private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(f)))
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try in.close() catch { case _: java.io.IOException => () }
        })
      private var nextGroup: (Array[Byte], Array[UnsafeRow]) = advance()
      private def advance(): (Array[Byte], Array[UnsafeRow]) = {
        val klen = try in.readInt() catch {
          case _: java.io.EOFException => in.close(); return null
        }
        val kb = new Array[Byte](klen); in.readFully(kb)
        val n = in.readInt()
        val rows = Array.tabulate(n) { _ =>
          val rlen = in.readInt()
          val rb = new Array[Byte](rlen); in.readFully(rb)
          val row = new UnsafeRow(numFields)
          row.pointTo(rb, rlen)
          row
        }
        (kb, rows)
      }
      override def hasNext: Boolean = nextGroup != null
      override def next(): (Array[Byte], Array[UnsafeRow]) = {
        val g = nextGroup; nextGroup = advance(); g
      }
    }

  /** k-way merge of key-sorted runs: pops every run positioned at the
    * minimal key, re-selects top-k over the ≤ runs×k candidate rows
    * (each run's group is its top-k over a row subset, so the union's
    * top-k is exact), emits them ord-sorted. Memory is one key's
    * candidates at a time.
    */
  private[plans] def mergeRuns(
      sources: Seq[Iterator[(Array[Byte], Array[UnsafeRow])]],
      rowOrd: Ordering[UnsafeRow], limit: Int): Iterator[InternalRow] = {
    final class Head(val it: Iterator[(Array[Byte], Array[UnsafeRow])]) {
      var group: (Array[Byte], Array[UnsafeRow]) = _
      def advance(): Boolean = { group = if (it.hasNext) it.next() else null; group != null }
    }
    implicit val headOrd: Ordering[Head] =
      (a: Head, b: Head) => java.util.Arrays.compare(b.group._1, a.group._1) // min-heap
    val pq = scala.collection.mutable.PriorityQueue.empty[Head]
    sources.foreach { s => val h = new Head(s); if (h.advance()) pq += h }
    new Iterator[Array[UnsafeRow]] {
      override def hasNext: Boolean = pq.nonEmpty
      override def next(): Array[UnsafeRow] = {
        val first = pq.dequeue()
        val key = first.group._1
        val rows = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        rows ++= first.group._2
        if (first.advance()) pq += first
        while (pq.nonEmpty && java.util.Arrays.compare(pq.head.group._1, key) == 0) {
          val h = pq.dequeue()
          rows ++= h.group._2
          if (h.advance()) pq += h
        }
        rows.sorted(rowOrd).take(limit).toArray
      }
    }.flatMap(_.toSeq)
  }

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
