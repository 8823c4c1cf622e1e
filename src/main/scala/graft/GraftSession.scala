package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction for the graft mains and tests: local
  * master, shuffle parallelism sized to the worker threads, AQE with
  * skew-join handling, UTC session time, and the legacy nanosAsLong
  * flag the events table needs (see Tables.events) — set once here at
  * construction instead of leaking from a table loader.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // pid-scoped so concurrent runs on one host can't clobber each
      // other's managed tables
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config(Tables.NanosFlag, "true")
}
