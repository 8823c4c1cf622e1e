package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's skew claims as mechanized assertions (the ScanFloorSpec
  * precedent): static salting must spread a hot key's rows across all
  * salt slots without changing the join result, and AQE must split the
  * oversized partition of a skewed sort-merge join at runtime.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.builder("local[8]", 8).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 40k fact rows, 90% on key 1; 50-key dim. */
  private def skewed = {
    import spark.implicits._
    val fact = spark.range(40000)
      .select($"id".as("row_id"),
        when($"id" % 10 < 9, lit(1L)).otherwise(pmod($"id", lit(50))).as("k"),
        ($"id" * 3 % 97).as("v"))
    val dim = spark.range(50).select($"id".as("k"),
      concat(lit("dim_"), $"id").as("name"))
    (fact, dim)
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    val (fact, dim) = skewed
    val salts = 8
    val plain = fact.join(dim, "k")
      .select($"row_id", $"k", $"v", $"name")
      .collect().toSet
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", $"row_id", salts)
      .select($"row_id", $"k", $"v", $"name")
      .collect().toSet
    assert(salted == plain && plain.nonEmpty)
    // the hot key's rows land in EVERY salt slot, roughly evenly — the
    // by-construction guarantee that no single reduce task owns the key
    val perSalt = fact.where($"k" === 1)
      .select(pmod(hash($"row_id"), lit(salts)).as("s"))
      .groupBy($"s").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSalt.keySet == (0 until salts).toSet, s"empty salt slots: $perSalt")
    val (mx, mn) = (perSalt.values.max, perSalt.values.min)
    assert(mx < 2 * mn, s"salt imbalance: $perSalt")
  }

  test("registered skew join equals the unsalted join on events x customer") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = SkewJoin.skewJoinQuery(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = Tables.events(spark, dir)
      .join(Tables.customer(spark, dir), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(28,10)")).cast("double"), 6)
          .as("total_value"))
      .orderBy($"c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == plain)
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    val (fact, dim) = skewed
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.get(k)).toMap
    try {
      // force the SMJ path and make the hot partition count as skewed at
      // local data sizes (defaults target 256 MB partitions)
      conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", false)
      val joined = fact.join(dim, "k")
      // drive THIS DataFrame's own query execution (a write would spawn
      // a separate execution and leave this plan un-finalized)
      assert(joined.collect().length == 40000)
      // the FINAL adaptive plan marks the re-planned join with skew=true
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
