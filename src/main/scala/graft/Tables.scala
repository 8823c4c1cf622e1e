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
  /** events has shipped with two timestamp encodings over time: plain
    * TIMESTAMP_MICROS (reads directly) and TIMESTAMP(NANOS), which
    * Spark 4 only reads via the legacy nanosAsLong flag (ts then arrives
    * as a LongType of nanos — EventOps.canonicalTs converts either
    * shape). The flag is session-scoped and must be set at session
    * construction (GraftSession does this; a loader must not mutate
    * shared session conf as a side effect), so when the footer actually
    * needs the flag and the session lacks it, rethrow the schema-read
    * failure with that guidance.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  def events(s: SparkSession, d: String): DataFrame =
    try load(s, d, "events")
    catch {
      case e: Exception
          if Option(e.getMessage).exists(_.toUpperCase.contains("NANOS")) &&
            !s.conf.getOption(NanosFlag).contains("true") =>
        throw new IllegalArgumentException(
          s"events.parquet carries nanosecond timestamps; set $NanosFlag=true " +
            "on the session — build it via graft.GraftSession or add the config",
          e)
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
