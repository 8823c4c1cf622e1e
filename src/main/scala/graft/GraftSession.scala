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
      // InferFiltersFromGenerate synthesizes size(e)>0 from explode(e)
      // and predicate pushdown then INLINES e through the projection
      // that computes it — for computed arrays (every exploded column
      // here: shingles, n-grams, token lists) each row pays the array
      // construction 3x. explode already skips empty/null inputs, so
      // the inferred filter only helps stored array columns, which this
      // engine never explodes.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // pid-scoped so concurrent runs on one host can't clobber each
      // other's managed tables
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config(Tables.NanosFlag, "true")
}
