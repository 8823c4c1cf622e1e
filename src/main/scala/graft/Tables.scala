package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md).
  * Each loader selects from a single parquet file so Catalyst can push
  * filters / prune columns straight into the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events carries nanosecond parquet timestamps, which Spark 4 only
    * reads via the legacy nanosAsLong flag; ts arrives as a LongType of
    * nanos, converted by EventOps.events. The flag is session-scoped and
    * must be set at session construction (GraftSession does this; a
    * loader must not mutate shared session conf as a side effect), so
    * fail fast with guidance if the session wasn't built that way.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(NanosFlag).contains("true"),
      s"reading events.parquet (nanosecond timestamps) requires $NanosFlag=true " +
        "on the session — build it via graft.GraftSession or add the config")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
