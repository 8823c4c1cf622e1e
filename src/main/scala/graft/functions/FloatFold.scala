package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-deterministic summation of double terms — the cross-engine
  * float-discipline idiom (SURVEY §8a): a plain `sum()` of doubles is
  * accumulation-order-dependent across partitions, and casting doubles
  * to DECIMAL rounds differently across engines, so bit-exact float
  * aggregation collects (key, term) pairs, sorts by key, and folds left
  * from 0.0. The DuckDB twin is
  * `list_reduce(list_prepend(0.0, list(term ORDER BY key)), (x,y)->x+y)`.
  *
  * Scale contract: the fold materializes its group's terms in one task,
  * so it is for BOUNDED-CARDINALITY inputs only — test-set-sized eval
  * frames, or per-distinct-threshold tallies after a `groupBy(score)`
  * collapse (the evaluation sweep's shape: thresholds, not rows).
  * Corpus-scale operators never fold per-row terms through this path.
  */
object FloatFold {

  /** Aggregate expression: fold `term` in ascending `key` order. Rows
    * where `keep` is false are excluded (tri-state: the whole entry is
    * null and collect_list drops it).
    */
  def orderedSum(key: Column, term: Column, keep: Column = lit(true)): Column =
    aggregate(
      transform(
        sort_array(collect_list(when(keep, struct(key.as("k"), term.as("v"))))),
        x => x("v")),
      lit(0.0), (acc, x) => acc + x)

  /** Fold that mirrors the oracle's NULL-on-empty-kept-set edge: when
    * `keep` excludes every row, the DuckDB twin's `list(...) FILTER` is
    * NULL and the whole fold is NULL — this variant returns null in that
    * case instead of orderedSum's 0.0 seed.
    */
  def orderedSumOrNull(key: Column, term: Column, keep: Column): Column =
    when(count(when(keep, lit(1))) > 0, orderedSum(key, term, keep))

  /** DuckDB twin. Pass `filter` to mirror a `keep` predicate. Empty
    * input folds to 0.0 via the prepended seed — EXCEPT when a filter
    * excludes every row, where `list(...)` is NULL and the whole fold is
    * NULL; Spark callers mirror that edge with [[orderedSumOrNull]].
    */
  def orderedSumSql(termExpr: String, keyExpr: String,
      filter: Option[String] = None): String = {
    val flt = filter.map(f => s" FILTER (WHERE $f)").getOrElse("")
    s"list_reduce(list_prepend(0.0, list($termExpr ORDER BY $keyExpr)$flt), (x, y) -> x + y)"
  }
}
