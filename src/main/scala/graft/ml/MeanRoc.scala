package graft.ml

import graft.GraftQuery
import graft.operators.Evaluation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean ROC curve across CV folds (reference: plotSTD,
  * src/TextClassification.py:826 — per-fold TPRs interpolated onto a
  * fixed 100-point FPR grid, then averaged). Interpolation here is
  * step-carried-from-below (exact, integer-derived) rather than scipy's
  * linear blend; the mean is the only float sum and is rounded to 6 dp.
  * One windowed pass per fold, one grid join, two aggregations — no
  * driver loop over folds.
  */
object MeanRoc {

  def meanRocFolds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iters = s.range(0, 10).select($"id".cast("int").as("iter"))
    // deterministic 10-iteration shuffle-split: same LCG as Evaluation.cvFolds
    val folds = Evaluation.scored(s, dir)
      .crossJoin(broadcast(iters))
      .where((($"doc_id" * 10 + $"iter") * 1103515245L + 12345L)
        % 2147483648L % 2 === 1) // is_test = 1
    val w = Window.partitionBy($"iter").orderBy($"score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"iter")
    val ranked = folds.select($"iter", $"y", $"score", $"doc_id",
      sum($"y").over(w).as("cum_tp"),
      sum(lit(1) - $"y").over(w).as("cum_fp"),
      sum($"y").over(tot).as("p"),
      sum(lit(1) - $"y").over(tot).as("n"))
    val grid = s.range(0, 101).select($"id".cast("int").as("g"))
    // step interpolation: tpr at grid point g = max tpr among rows with
    // fpr <= g/100  (integer comparison: cum_fp * 100 <= g * n)
    val perFold = ranked.join(broadcast(grid),
        $"cum_fp" * 100 <= $"g" * $"n")
      .groupBy($"iter", $"g")
      .agg(max($"cum_tp".cast("double") / $"p").as("tpr"))
    perFold.groupBy($"g")
      .agg(round(sum($"tpr") / 10.0, 6).as("mean_tpr"),
        count(lit(1)).as("n_folds"))
      .orderBy($"g")
  }

  val meanRocFoldsSql: String =
    s"""WITH ${Evaluation.scoredCteSql},
       |folds AS (
       |  SELECT iter, doc_id, y, score
       |  FROM scored, (SELECT unnest(generate_series(0, 9)) AS iter) i
       |  WHERE ((doc_id * 10 + iter) * 1103515245 + 12345) % 2147483648 % 2 = 1),
       |rk AS (
       |  SELECT iter, y, score, doc_id,
       |    sum(y) OVER w AS cum_tp,
       |    sum(1 - y) OVER w AS cum_fp,
       |    sum(y) OVER (PARTITION BY iter) AS p,
       |    sum(1 - y) OVER (PARTITION BY iter) AS n
       |  FROM folds
       |  WINDOW w AS (PARTITION BY iter ORDER BY score DESC, doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |per_fold AS (
       |  SELECT iter, g, max(CAST(cum_tp AS DOUBLE) / p) AS tpr
       |  FROM rk, (SELECT unnest(generate_series(0, 100)) AS g) gg
       |  WHERE cum_fp * 100 <= g * n
       |  GROUP BY iter, g)
       |SELECT g, round(sum(tpr) / 10.0, 6) AS mean_tpr, count(*) AS n_folds
       |FROM per_fold GROUP BY g ORDER BY g""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_mean_roc_folds", meanRocFolds, Some(meanRocFoldsSql)))
}
