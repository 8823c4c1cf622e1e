package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md).
  * Each loader selects from a single parquet file so Catalyst can push
  * filters / prune columns straight into the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Target input bytes per task for [[fanOut]] — how finely a
    * below-core-count scan is spread before heavy row-local work
    * (tokenize/shingle/decode/vector kernels). Env-tunable
    * (SPARK_GRAFT_FANOUT_BYTES) so a deployment with fatter rows can
    * re-grain; the default suits compressed text at ~100 B/row.
    */
  private val FanOutBytes: Long =
    sys.env.get("SPARK_GRAFT_FANOUT_BYTES").map(_.toLong).getOrElse(64L * 1024)

  /** Scale-adaptive fan-out of a narrow scan feeding expensive
    * row-local work (guide §2: make partitioning derive from input
    * size, not a constant). A single-row-group parquet snapshot plans
    * as ONE scan task however many cores the session has, so the
    * scan+tokenize/decode stage of every text/vector operator runs
    * single-threaded while the rest of the machine idles. This helper
    * hash-repartitions on the frame's OWN row key — deterministic
    * placement, so retried tasks reproduce their partition (guide
    * §2.5) and results are unchanged for the engine's
    * order-independent aggregation discipline — to
    * min(cores, bytes/[[FanOutBytes]]) partitions.
    *
    * Fires ONLY when the planned scan parallelism is below the
    * session's core count and the input is big enough to be worth at
    * least four tasks: a production corpus (many well-sized files /
    * row groups) plans more scan tasks than cores and passes through
    * untouched, so this is strictly a small-snapshot fix, not a
    * local[32] tuning constant — at scale the added Exchange does not
    * exist.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // a streaming frame has no static scan to probe (and its builders
    // share this code via the row-local column algebra) — pass through
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    // fire ONLY on the unambiguous pathology this helper exists for — a
    // SINGLE-task scan (the one-row-group snapshot). A/B at the 10×
    // corpus (4 scan tasks on 32 cores) measured the spread HARMFUL on
    // multi-reference lineages (q_dedup_editdist 31 → 80 s,
    // q_winnow_pairs 11 → 22 s at sf1): once the scan has any
    // parallelism, the per-reference exchange costs more than the extra
    // cores buy, so a merely-below-core-count scan passes through.
    if (parts != 1) return df
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // an unknown size (LogicalRDD / foreachBatch micro-batches report
    // the conf default, effectively +inf) must not force a fan-out —
    // only spread what is measurably worth spreading
    if (bytes >= BigInt(Long.MaxValue) / 4) return df
    val want = (bytes / FanOutBytes).min(BigInt(cores)).toInt
    if (want >= math.max(4, parts + 1)) df.repartition(want, key) else df
  }

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
