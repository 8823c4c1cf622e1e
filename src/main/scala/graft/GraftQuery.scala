package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark query and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL for the driver's correctness gate.
  *
  * `singleShot` is REGISTRY metadata for the bench: true marks a query
  * whose first run installs [[SessionCache]] state (model fits, tally
  * frames, cluster labels) — a warm benchmark rep would time the memo,
  * not the plan, so Bench gives these ONE cold pass and names them in
  * the JSON line. Set it at the registration site of any query that
  * routes through SessionCache.getOrCompute.
  */
case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    singleShot: Boolean = false)
