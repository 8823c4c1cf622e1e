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

  test("registered q_window_topk_heap actually runs through the custom exec") {
    val df = SparkEntry.queries("q_window_topk_heap")(spark, dir)
    // AQE wraps the plan, so collect() on the root won't traverse into
    // the adaptive subtree — the string form shows the full plan
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "the heap twin lost its TopKPerKeyExec — it would re-sort per group")
  }
}
