package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffle: co-locating both join sides on the join
  * key at write time removes the per-query exchange entirely — at 100 TB
  * the difference between a fact-fact join that reshuffles terabytes per
  * query and one that streams bucket-aligned files (SURVEY §5).
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed co-located join plans without a shuffle exchange") {
    import spark.implicits._
    Tables.orders(spark, dir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.customer(spark, dir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a merge join so the exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val bucketed = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), $"o_custkey" === $"c_custkey")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // same join over the raw parquet does shuffle — the cost bucketing removes
      val unbucketed = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
      // and the result is identical
      assert(bucketed.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
