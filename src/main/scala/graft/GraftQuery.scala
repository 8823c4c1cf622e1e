package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark query and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL for the driver's correctness gate.
  */
case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
