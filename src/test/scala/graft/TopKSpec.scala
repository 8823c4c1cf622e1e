package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bounded-heap TopKPerKey equals the window row_number formulation") {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val fast = TopKPerKey(orders,
        keys = Seq("o_custkey"),
        order = Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      .select($"o_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().toSet
    val window = graft.operators.Relational.windowTopK(spark, dir)
      .select($"o_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(fast == window)
    assert(fast.nonEmpty)
  }

  test("plan contains TopKPerKeyExec and exactly one exchange") {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val fast = TopKPerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert("Exchange".r.findAllIn(plan).size == 1)
    // and crucially: no Sort below the top-k (the point of the operator)
    assert(!plan.contains("Sort "))
  }

  test("adversarial key cardinality: spill path engages and stays exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import graft.plans.TopKPerKeyExec
    // 50k distinct keys × 4 rows against a 64 KiB retained-bytes bound:
    // every task must spill several runs, and the merged result must be
    // byte-for-byte the window formulation's
    val prev = spark.conf.getOption(TopKPerKey.SpillBytesKey)
    try {
      spark.conf.set(TopKPerKey.SpillBytesKey, (64L << 10).toString)
      val wide = spark.range(200000)
        .select(($"id" % 50000).as("key"), ($"id" * 2654435761L % 1000003).as("score"), $"id")
      val fast = TopKPerKey(wide, Seq("key"), Seq(("score", false), ("id", true)), 2)
      // collect the SAME QueryExecution the metric assertion reads — a
      // derived .select() would execute a fresh plan with fresh metrics
      val got = fast.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      import org.apache.spark.sql.expressions.Window
      val expected = wide.withColumn("rn",
          row_number().over(Window.partitionBy($"key")
            .orderBy($"score".desc, $"id".asc)))
        .where($"rn" <= 2).select($"key", $"id")
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"${got.size} vs ${expected.size} rows")
      // the exact path was NOT the in-memory one: the spill metric fired.
      // AQE hides the final stage behind leaf QueryStageExec wrappers,
      // so the traversal must step through their .plan explicitly
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def execs(p: SparkPlan): Seq[TopKPerKeyExec] = p match {
        case a: AdaptiveSparkPlanExec => execs(a.executedPlan)
        case q: QueryStageExec => execs(q.plan)
        case other => other.collect {
          case t: TopKPerKeyExec => Seq(t)
          case a: AdaptiveSparkPlanExec => execs(a.executedPlan)
          case q: QueryStageExec => execs(q.plan)
        }.flatten
      }
      val spills = execs(fast.queryExecution.executedPlan)
        .map(_.metrics("numSpills").value).sum
      assert(spills > 0, "spill threshold never engaged — the adversarial case ran in memory")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(TopKPerKey.SpillBytesKey, v)
        case None => spark.conf.unset(TopKPerKey.SpillBytesKey)
      }
    }
  }

  test("registered q_window_topk_heap actually runs through the custom exec") {
    val df = SparkEntry.queries("q_window_topk_heap")(spark, dir)
    // AQE wraps the plan, so collect() on the root won't traverse into
    // the adaptive subtree — the string form shows the full plan
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "the heap twin lost its TopKPerKeyExec — it would re-sort per group")
  }
}
