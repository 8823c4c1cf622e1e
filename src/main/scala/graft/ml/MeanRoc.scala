package graft.ml

import graft.GraftQuery
import graft.operators.Evaluation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean ROC curve across CV folds (reference: plotSTD,
  * src/TextClassification.py:826 — per-fold TPRs interpolated onto a
  * fixed 101-point FPR grid, then averaged). Interpolation is
  * step-carried-from-below (exact, integer-derived).
  *
  * Scale shape: the corpus-sized pass is one hash aggregation to
  * per-(fold, distinct-score) tallies; the per-fold windows then run over
  * threshold counts only, each fold collapses to its ≤101 distinct grid
  * thresholds (so the grid join touches ~1k rows however large the test
  * folds are), the step-carry is a running max over the grid, and the
  * cross-fold mean folds the 10 values in fixed iter order (list_reduce
  * twin in the oracle) so the one float sum is order-deterministic.
  */
object MeanRoc {

  def meanRocFolds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iters = s.range(0, 10).select($"id".cast("int").as("iter"))
    // deterministic 10-iteration shuffle-split: high LCG bit (the low bit
    // of x*odd+odd is pure parity and would degenerate the folds)
    val folds = Evaluation.scored(s, dir)
      .crossJoin(broadcast(iters))
      .where(Evaluation.shuffleSplitBit($"doc_id", $"iter", 10) === 1) // is_test
    // collapse each fold to per-threshold tallies first (one hash agg on
    // the corpus-sized frame — the Evaluation.ranked shape); the windows
    // below then see only (iter × distinct score) rows
    val grouped = folds.groupBy($"iter", $"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    meanRocFromTallies(s, grouped, Nil, iters)
  }

  /** The grid-interpolated mean-ROC algebra on ANY per-(parts..., iter,
    * score) tally frame (columns: parts..., iter, score, c, cp) — the
    * single implementation behind the analytic q_mean_roc_folds
    * (parts = ∅) and the fitted-model q_ml_mean_roc (parts = model), so
    * the two can't drift. Means fold per (parts..., g) over the iters in
    * fixed iter order; every window carries a partition spec
    * (cumTallies bucketing included).
    *
    * `domain` is the EXPECTED fold grid (columns: parts..., iter),
    * supplied explicitly rather than derived from the observed tallies:
    * a degenerate fold with zero test rows must still contribute a
    * tpr=0 curve to the mean (the oracle cross-joins the literal
    * generate_series fold list and divides by the full fold count — a
    * distinct() over observed folds would silently average over fewer).
    */
  private[graft] def meanRocFromTallies(
      s: SparkSession, grouped: DataFrame, parts: Seq[String],
      domain: DataFrame): DataFrame = {
    import s.implicits._
    val pc = parts.map(col)
    val pi = parts :+ "iter"
    // bucketed prefix-sum (Evaluation.cumTallies), not a per-iter window:
    // an iter group holds all of its fold's distinct scores
    val iterTotals = grouped.groupBy(pi.map(col): _*)
      .agg(sum($"cp").as("p"), sum($"c" - $"cp").as("n"))
    val ranked = Evaluation.cumTallies(grouped, pi)
      .join(broadcast(iterTotals), pi)
      .select(pc ++ Seq($"iter", $"score", $"c", $"cp", $"cum_tp",
        ($"rk" - $"cum_tp").as("cum_fp"), $"p", $"n"): _*)
    // collapse each fold to its best tpr per first-reachable grid point:
    // threshold becomes visible at g0 = ceil(cum_fp*100/n) (integer-exact)
    val perThresh = ranked
      .groupBy(pc ++ Seq($"iter", ((($"cum_fp" * 100) + $"n" - 1).divide($"n")
        .cast("long")).as("g0")): _*)
      .agg(max($"cum_tp".cast("double") / $"p").as("tpr0"))
    // step-carry: running max over the full grid per (parts, fold). The
    // domain side carries its own column names (d_*) so the join with
    // perThresh — potentially both descendants of one frame — has no
    // ambiguous attributes
    val grid = s.range(0, 101).select($"id".cast("long").as("g"))
    val gridded = domain.select(pi.map(c0 => col(c0).as(s"d_$c0")): _*)
      .crossJoin(broadcast(grid))
    val carried = gridded
      .join(perThresh,
        pi.map(c0 => col(s"d_$c0") === perThresh(c0))
          .reduce(_ && _) && $"g" === perThresh("g0"), "left")
      .select(pi.map(c0 => col(s"d_$c0")) ++ Seq($"g", $"tpr0"): _*)
      .withColumn("tpr", coalesce(
        max($"tpr0").over(
          Window.partitionBy(pi.map(c0 => col(s"d_$c0")): _*).orderBy($"g")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit(0.0)))
    // fixed-order fold of the per-fold values: deterministic float sum;
    // divide by the exact fold count (== 10.0 for both callers)
    carried.groupBy(parts.map(c0 => col(s"d_$c0").as(c0)) :+ $"g": _*)
      .agg(round(
        aggregate(
          transform(array_sort(collect_list(struct($"d_iter".as("iter"), $"tpr"))),
            x => x("tpr")),
          lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"), 6)
        .as("mean_tpr"),
        count(lit(1)).as("n_folds"))
      .orderBy(pc :+ $"g": _*)
  }

  val meanRocFoldsSql: String =
    s"""WITH ${Evaluation.scoredCteSql},
       |folds AS (
       |  SELECT iter, doc_id, y, score
       |  FROM scored, (SELECT unnest(generate_series(0, 9)) AS iter) i
       |  WHERE ${Evaluation.shuffleSplitBitSql("doc_id", "iter", 10)} = 1),
       |grouped AS (
       |  SELECT iter, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM folds GROUP BY iter, score),
       |rk AS (
       |  SELECT iter, score,
       |    sum(cp) OVER w AS cum_tp,
       |    sum(c - cp) OVER w AS cum_fp,
       |    sum(cp) OVER (PARTITION BY iter) AS p,
       |    sum(c - cp) OVER (PARTITION BY iter) AS n
       |  FROM grouped
       |  WINDOW w AS (PARTITION BY iter ORDER BY score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |per_thresh AS (
       |  SELECT iter, ((cum_fp * 100) + n - 1) // n AS g0,
       |    max(CAST(cum_tp AS DOUBLE) / p) AS tpr0
       |  FROM rk GROUP BY iter, ((cum_fp * 100) + n - 1) // n),
       |carried AS (
       |  SELECT i.iter, g.g,
       |    coalesce(max(pt.tpr0) OVER (PARTITION BY i.iter ORDER BY g.g
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS tpr
       |  FROM (SELECT unnest(generate_series(0, 9)) AS iter) i
       |  CROSS JOIN (SELECT unnest(generate_series(0, 100)) AS g) g
       |  LEFT JOIN per_thresh pt ON pt.iter = i.iter AND pt.g0 = g.g)
       |SELECT g,
       |  round(list_reduce(list(tpr ORDER BY iter), (x, y) -> x + y) / 10.0, 6)
       |    AS mean_tpr,
       |  count(*) AS n_folds
       |FROM carried GROUP BY g ORDER BY g""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_mean_roc_folds", meanRocFolds, Some(meanRocFoldsSql)))
}
