package graft.ml

import graft.GraftQuery
import graft.operators.Evaluation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-validated model comparison (SURVEY §2.E): the reference's 5×2cv
  * paired t-test (ttest_5x2cv, src/TextClassification.py:1520) and
  * sample-size/learning curves (samplingCurveROC, :1021) re-expressed as
  * set-based plans — folds are deterministic LCG splits, per-fold AUCs
  * come from the exact integer rank-sum identity, and the t statistic is
  * a scalar combination of those AUCs. No driver-side loop over folds:
  * every fold × scorer AUC is one row of one windowed aggregation.
  */
object CrossVal {

  /** (r, f, scorer, doc_id, y, score) long frame for the 5×2 grid over
    * the two reference scorers: the continuous target-density score (A)
    * and the binary word-match prediction (B).
    */
  private def grid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scoredDf = Evaluation.scored(s, dir) // doc_id, y, score
    val wm = Evaluation.wordMatch(s, dir)
      .select($"doc_id", $"pred".cast("double").as("score_b"))
    val base = scoredDf.join(wm, "doc_id")
    val rf = s.range(0, 10).select(
      ($"id" / 2).cast("int").as("r"), ($"id" % 2).cast("int").as("f"))
    base.crossJoin(broadcast(rf))
      // high LCG bit — the low bit of x*odd+odd is pure parity and would
      // collapse the 5x2 grid to two distinct folds
      .where((((((($"doc_id" % 2147483648L) * 5 + $"r") % 2147483648L) * 1103515245L + 12345L) % 2147483648L)
        .divide(65536).cast("long") % 2) === $"f")
      .select($"r", $"f", $"doc_id", $"y",
        $"score".as("score_a"), $"score_b")
  }

  /** Per-(r, f, scorer) trapezoid AUC via Σ_neg cum_tp / (P·N). */
  private def foldAucs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = grid(s, dir)
    val long = g.select($"r", $"f", lit("a").as("scorer"), $"doc_id", $"y",
        $"score_a".as("score"))
      .unionByName(g.select($"r", $"f", lit("b").as("scorer"), $"doc_id", $"y",
        $"score_b".as("score")))
    val w = Window.partitionBy($"r", $"f", $"scorer")
      .orderBy($"score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    long.withColumn("cum_tp", sum($"y").over(w))
      .groupBy($"r", $"f", $"scorer")
      .agg((sum($"cum_tp" * (lit(1) - $"y")).cast("double") /
        (sum($"y") * sum(lit(1) - $"y"))).as("auc"))
  }

  /** 5×2cv paired t statistic between scorers A and B. */
  def ttest5x2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = foldAucs(s, dir)
      .groupBy($"r", $"f")
      .agg((max(when($"scorer" === "a", $"auc")) -
        max(when($"scorer" === "b", $"auc"))).as("d"))
    val perRound = d.groupBy($"r").agg(
      max(when($"f" === 0, $"d")).as("d0"),
      max(when($"f" === 1, $"d")).as("d1"))
      .select($"r", $"d0",
        // square by multiplication: JVM Math.pow and libm pow can differ
        // in the last ulp, x*x is IEEE-exact in both engines
        ((($"d0" - ($"d0" + $"d1") / 2) * ($"d0" - ($"d0" + $"d1") / 2)) +
          (($"d1" - ($"d0" + $"d1") / 2) * ($"d1" - ($"d0" + $"d1") / 2))).as("s2"))
    // fold the 5 per-round variances in fixed r order (FloatFold): a
    // plain double sum is accumulation-order-dependent, and casting
    // doubles to DECIMAL rounds differently across engines
    perRound.agg(
        max(when($"r" === 0, $"d0")).as("d00"),
        graft.functions.FloatFold.orderedSum($"r", $"s2").as("s_sqr"))
      .select($"d00", $"s_sqr",
        ($"d00" / sqrt($"s_sqr" / 5)).as("t_stat"))
  }

  val ttest5x2Sql: String = {
    val targetList = Evaluation.targets.map(t => s"'$t'").mkString("[", ", ", "]")
    val targetsRe = Evaluation.targetsRe
    s"""WITH base AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    CAST(len(list_filter(toks, t -> list_contains($targetList, t))) AS DOUBLE)
       |      / len(toks) AS score_a,
       |    CASE WHEN regexp_matches(text, '$targetsRe') THEN 1.0 ELSE 0.0 END AS score_b
       |  FROM (SELECT doc_id, lang, text,
       |          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM documents) d),
       |grid AS (
       |  SELECT r, f, doc_id, y, score_a, score_b
       |  FROM base, (SELECT unnest(generate_series(0, 4)) AS r) rr,
       |       (SELECT unnest(generate_series(0, 1)) AS f) ff
       |  WHERE ((((((doc_id % 2147483648) * 5 + r) % 2147483648) * 1103515245 + 12345) % 2147483648) // 65536) % 2 = f),
       |long AS (
       |  SELECT r, f, 'a' AS scorer, doc_id, y, score_a AS score FROM grid
       |  UNION ALL
       |  SELECT r, f, 'b' AS scorer, doc_id, y, score_b AS score FROM grid),
       |ranked AS (
       |  SELECT r, f, scorer, y,
       |    sum(y) OVER (PARTITION BY r, f, scorer ORDER BY score DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
       |  FROM long),
       |aucs AS (
       |  SELECT r, f, scorer,
       |    CAST(sum(cum_tp * (1 - y)) AS DOUBLE) / (sum(y) * sum(1 - y)) AS auc
       |  FROM ranked GROUP BY r, f, scorer),
       |diffs AS (
       |  SELECT r, f,
       |    max(CASE WHEN scorer = 'a' THEN auc END)
       |      - max(CASE WHEN scorer = 'b' THEN auc END) AS d
       |  FROM aucs GROUP BY r, f),
       |rounds AS (
       |  SELECT r, max(CASE WHEN f = 0 THEN d END) AS d0,
       |    max(CASE WHEN f = 1 THEN d END) AS d1
       |  FROM diffs GROUP BY r),
       |s2 AS (
       |  SELECT r, d0,
       |    (d0 - (d0 + d1) / 2) * (d0 - (d0 + d1) / 2)
       |      + (d1 - (d0 + d1) / 2) * (d1 - (d0 + d1) / 2) AS s2
       |  FROM rounds)
       |SELECT max(CASE WHEN r = 0 THEN d0 END) AS d00,
       |  ${graft.functions.FloatFold.orderedSumSql("s2", "r")} AS s_sqr,
       |  max(CASE WHEN r = 0 THEN d0 END)
       |    / sqrt(${graft.functions.FloatFold.orderedSumSql("s2", "r")} / 5) AS t_stat
       |FROM s2""".stripMargin
  }

  /** Nested LCG-ordered subsets at 20..100% — the shared sample-size
    * frame for the ROC and PR learning curves.
    */
  private def nestedSubsets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = Evaluation.scored(s, dir)
      .withColumn("h", (($"doc_id" % 2147483648L) * 2654435761L + 54321L) % 2147483648L)
    val wRank = Window.orderBy($"h".asc, $"doc_id".asc)
    val ranked = sc.withColumn("srank", row_number().over(wRank).cast("long"))
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy()))
    val fracs = s.range(1, 6).select(($"id" * 20).cast("int").as("frac_pct"))
    ranked.crossJoin(broadcast(fracs))
      .where($"srank" * 100 <= $"frac_pct" * $"n_total")
  }

  /** Sample-size AUC curve: AUC of the target-density scorer on nested
    * LCG-ordered subsets (20..100%) — the set-based learning-curve shape.
    */
  def learningCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = nestedSubsets(s, dir)
    val w = Window.partitionBy($"frac_pct")
      .orderBy($"score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sub.withColumn("cum_tp", sum($"y").over(w))
      .groupBy($"frac_pct")
      .agg((sum($"cum_tp" * (lit(1) - $"y")).cast("double") /
        (sum($"y") * sum(lit(1) - $"y"))).as("auc"))
      .orderBy($"frac_pct")
  }

  /** Sample-size average-precision curve (reference: sampleSizePR,
    * src/NLP_functions.py:794 / samplingCurvePR) — the PR twin of
    * learningCurve on the same nested subsets. Precision terms fold in
    * fixed rank order for bit-determinism (test-set-sized groups).
    */
  def learningCurvePr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = nestedSubsets(s, dir)
    val wCum = Window.partitionBy($"frac_pct")
      .orderBy($"score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRk = Window.partitionBy($"frac_pct").orderBy($"score".desc, $"doc_id".asc)
    sub.withColumn("rk", row_number().over(wRk).cast("long"))
      .withColumn("cum_tp", sum($"y").over(wCum))
      .groupBy($"frac_pct")
      // null (not NaN) when a subset has no positives — the oracle's
      // empty FILTERed list is NULL, and NULL/0 stays NULL
      .agg(round(when(sum($"y") > 0,
          graft.functions.FloatFold.orderedSum($"rk",
            $"cum_tp".cast("double") / $"rk", $"y" === 1) / sum($"y")),
          6).as("avg_precision"))
      .orderBy($"frac_pct")
  }

  val learningCurveSql: String = {
    val targetList = Evaluation.targets.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    CAST(len(list_filter(toks, t -> list_contains($targetList, t))) AS DOUBLE)
       |      / len(toks) AS score
       |  FROM (SELECT doc_id, lang,
       |          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM documents) d),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY
       |      ((doc_id % 2147483648) * 2654435761 + 54321) % 2147483648 ASC, doc_id ASC) AS BIGINT)
       |      AS srank,
       |    count(*) OVER () AS n_total
       |  FROM scored),
       |sub AS (
       |  SELECT frac_pct, doc_id, y, score FROM ranked,
       |    (SELECT unnest([20, 40, 60, 80, 100]) AS frac_pct) fr
       |  WHERE srank * 100 <= frac_pct * n_total),
       |cum AS (
       |  SELECT frac_pct, y,
       |    sum(y) OVER (PARTITION BY frac_pct ORDER BY score DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
       |  FROM sub)
       |SELECT frac_pct,
       |  CAST(sum(cum_tp * (1 - y)) AS DOUBLE) / (sum(y) * sum(1 - y)) AS auc
       |FROM cum GROUP BY frac_pct ORDER BY frac_pct""".stripMargin
  }

  val learningCurvePrSql: String = {
    val targetList = Evaluation.targets.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    CAST(len(list_filter(toks, t -> list_contains($targetList, t))) AS DOUBLE)
       |      / len(toks) AS score
       |  FROM (SELECT doc_id, lang,
       |          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM documents) d),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY
       |      ((doc_id % 2147483648) * 2654435761 + 54321) % 2147483648 ASC, doc_id ASC) AS BIGINT)
       |      AS srank,
       |    count(*) OVER () AS n_total
       |  FROM scored),
       |sub AS (
       |  SELECT frac_pct, doc_id, y, score FROM ranked,
       |    (SELECT unnest([20, 40, 60, 80, 100]) AS frac_pct) fr
       |  WHERE srank * 100 <= frac_pct * n_total),
       |cum AS (
       |  SELECT frac_pct, y,
       |    CAST(row_number() OVER w AS BIGINT) AS rk,
       |    sum(y) OVER (PARTITION BY frac_pct ORDER BY score DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
       |  FROM sub
       |  WINDOW w AS (PARTITION BY frac_pct ORDER BY score DESC, doc_id ASC))
       |SELECT frac_pct,
       |  round(${graft.functions.FloatFold.orderedSumSql(
                  "CAST(cum_tp AS DOUBLE) / rk", "rk", Some("y = 1"))}
       |    / sum(y), 6) AS avg_precision
       |FROM cum GROUP BY frac_pct ORDER BY frac_pct""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_ttest_5x2", ttest5x2, Some(ttest5x2Sql)),
    GraftQuery("q_learning_curve", learningCurve, Some(learningCurveSql)),
    GraftQuery("q_learning_curve_pr", learningCurvePr, Some(learningCurvePrSql)))
}
