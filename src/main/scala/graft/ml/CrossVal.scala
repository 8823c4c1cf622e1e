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
      .where(Evaluation.shuffleSplitBit($"doc_id", $"r", 5) === $"f")
      .select($"r", $"f", $"doc_id", $"y",
        $"score".as("score_a"), $"score_b")
  }

  /** Per-(r, f, scorer) tie-aware trapezoid AUC: collapse each fold to
    * per-threshold tallies first (one hash agg over the corpus-sized
    * frame), then Σ (c−cp)·(2·cum_tp−cp) / (2·P·N) over the tiny
    * per-threshold frames — same shape as [[Evaluation.ranked]].
    */
  private[graft] def foldAucs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = grid(s, dir)
    val long = g.select($"r", $"f", lit("a").as("scorer"), $"doc_id", $"y",
        $"score_a".as("score"))
      .unionByName(g.select($"r", $"f", lit("b").as("scorer"), $"doc_id", $"y",
        $"score_b".as("score")))
    val grouped = long.groupBy($"r", $"f", $"scorer", $"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    // bucketed prefix-sum (not a per-fold window): a fold group holds all
    // of its distinct corpus scores, so the same range-sharding as the
    // global sweep applies; products/denominator widen to decimal before
    // multiplying (int64-wrap headroom, see Evaluation.dec)
    Evaluation.cumTallies(grouped, Seq("r", "f", "scorer"))
      .groupBy($"r", $"f", $"scorer")
      .agg((Evaluation.aucNumerator /
        Evaluation.aucDenominator(sum($"cp"), sum($"c" - $"cp"))).as("auc"))
  }

  /** 5×2cv paired t statistic between scorers A and B. */
  def ttest5x2(s: SparkSession, dir: String): DataFrame =
    ttestStat(foldAucs(s, dir), "a", "b")

  /** The 5×2cv t statistic (Dietterich's test) on ANY per-fold-AUC frame
    * with columns (r, f, scorer, auc) — the single algebra shared by the
    * analytic-scorer pair (q_ttest_5x2) and the fitted-MLlib-model pair
    * (ModelEval.mlTtest5x2), so the two queries can't drift.
    */
  private[graft] def ttestStat(aucs: DataFrame, sa: String, sb: String): DataFrame = {
    import aucs.sparkSession.implicits._
    val d = aucs
      .groupBy($"r", $"f")
      .agg((max(when($"scorer" === sa, $"auc")) -
        max(when($"scorer" === sb, $"auc"))).as("d"))
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

  /** Shared oracle CTE prefix: the 5×2 grid's per-(r, f, scorer)
    * tie-aware AUCs (`aucs`), used by both the t-test and the
    * median-model oracles.
    */
  private val foldAucsCteSql: String = {
    val targetsRe = Evaluation.targetsRe
    s"""base AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    ${Evaluation.densityScoreSql("toks")} AS score_a,
       |    CASE WHEN regexp_matches(text, '$targetsRe') THEN 1.0 ELSE 0.0 END AS score_b
       |  FROM (SELECT doc_id, lang, text,
       |          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM documents) d),
       |grid AS (
       |  SELECT r, f, doc_id, y, score_a, score_b
       |  FROM base, (SELECT unnest(generate_series(0, 4)) AS r) rr,
       |       (SELECT unnest(generate_series(0, 1)) AS f) ff
       |  WHERE ${Evaluation.shuffleSplitBitSql("doc_id", "r", 5)} = f),
       |long AS (
       |  SELECT r, f, 'a' AS scorer, doc_id, y, score_a AS score FROM grid
       |  UNION ALL
       |  SELECT r, f, 'b' AS scorer, doc_id, y, score_b AS score FROM grid),
       |grouped AS (
       |  SELECT r, f, scorer, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM long GROUP BY r, f, scorer, score),
       |ranked AS (
       |  SELECT r, f, scorer, c, cp,
       |    sum(cp) OVER (PARTITION BY r, f, scorer ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
       |  FROM grouped),
       |aucs AS (
       |  SELECT r, f, scorer,
       |    CAST(sum((c - cp) * (2 * cum_tp - cp)) AS DOUBLE)
       |      / (2 * sum(cp) * sum(c - cp)) AS auc
       |  FROM ranked GROUP BY r, f, scorer)""".stripMargin
  }

  val ttest5x2Sql: String =
    s"""WITH $foldAucsCteSql,
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

  /** Median-model retrieval (reference: retrievingMedianModel,
    * src/TextClassification.py:1147 with middleIndex from :473). NOTE an
    * intentional divergence: the reference computes the middle index of
    * the SORTED AUC list but then indexes the UNSORTED fittedmodels list
    * with it — a positional pick of whatever iteration sits at index 4,
    * not the median-AUC model. This operator matches the evident intent
    * (return the iteration whose AUC is the median) rather than that
    * literal indexing. The 10 folds of the 5×2 grid (iter = r·2+f) are
    * ranked by the density scorer's tie-aware AUC; the pick is
    * `rank == ⌊(n−1)/2⌋`, which equals the reference's `round((len−1)/2)`
    * middle index for its 10-fold setting. The rank is a ≤10×10 broadcast
    * self-join on the fold-AUC frame — no window.
    */
  def medianModel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aucs = foldAucs(s, dir).where($"scorer" === "a")
      .select(($"r" * 2 + $"f").cast("int").as("iter"), $"auc")
    val mine = aucs.select($"iter".as("m_iter"), $"auc".as("m_auc"))
    val rk = mine.join(aucs,
        $"auc" < $"m_auc" || ($"auc" === $"m_auc" && $"iter" < $"m_iter"), "left")
      .groupBy($"m_iter", $"m_auc").agg(count($"iter").as("rank_before"))
    val n = aucs.agg(count(lit(1)).as("n_folds"))
    rk.crossJoin(broadcast(n))
      .where($"rank_before" === floor(($"n_folds" - lit(1)) / lit(2)))
      .select($"m_iter".as("median_iter"), $"m_auc".as("median_auc"))
  }

  val medianModelSql: String =
    s"""WITH $foldAucsCteSql,
       |a AS (SELECT CAST(r * 2 + f AS INT) AS iter, auc FROM aucs WHERE scorer = 'a'),
       |rk AS (
       |  SELECT a1.iter AS median_iter, a1.auc AS median_auc,
       |    (SELECT count(*) FROM a a2
       |     WHERE a2.auc < a1.auc OR (a2.auc = a1.auc AND a2.iter < a1.iter))
       |      AS rank_before
       |  FROM a a1),
       |n AS (SELECT count(*) AS n_folds FROM a)
       |SELECT median_iter, median_auc FROM rk, n
       |WHERE rank_before = CAST(floor((n_folds - 1) / 2) AS BIGINT)""".stripMargin

  /** Nested LCG-ordered subsets at 20..100% — the shared sample-size
    * frame for the ROC and PR learning curves. The global hash-order rank
    * is a two-pass range-partitioned prefix count (h is uniform in
    * [0, 2³¹), so 32 fixed h-ranges shard evenly): per-range row_number +
    * tiny broadcast offset join — no partition-less window.
    */
  private def nestedSubsets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = Evaluation.scored(s, dir)
      .withColumn("h", (($"doc_id" % 2147483648L) * 2654435761L + 54321L) % 2147483648L)
      // 2³¹ / 32 = 2²⁶: equal h always lands in one range, range order
      // agrees with h order, so per-range ranks compose with the offsets
      .withColumn("hb", ($"h" / 67108864L).cast("int"))
    val wIn = Window.partitionBy($"hb").orderBy($"h".asc, $"doc_id".asc)
    val inRange = sc.withColumn("r_in", row_number().over(wIn).cast("long"))
    val rangeTotals = sc.groupBy($"hb").agg(count(lit(1)).as("bc"))
    val offsets = rangeTotals.select($"hb".as("b1"))
      .join(rangeTotals.select($"hb".as("b2"), $"bc"), $"b2" < $"b1", "left")
      .groupBy($"b1").agg(coalesce(sum($"bc"), lit(0L)).as("off"))
    val totals = rangeTotals.agg(sum($"bc").as("n_total"))
    val fracs = s.range(1, 6).select(($"id" * 20).cast("int").as("frac_pct"))
    inRange.join(broadcast(offsets), $"hb" === $"b1")
      .crossJoin(broadcast(totals))
      .withColumn("srank", $"off" + $"r_in")
      .crossJoin(broadcast(fracs))
      .where($"srank" * 100 <= $"frac_pct" * $"n_total")
  }

  /** Per-(frac_pct, score) threshold tallies of the nested subsets with
    * cumulative counts — the shared collapsed frame for both curves. The
    * corpus-sized pass is one hash agg; the cumulative counts run on the
    * bucketed two-pass prefix-sum ([[Evaluation.cumTallies]]) rather than
    * a per-frac window, because the frac_pct=100 group holds EVERY
    * distinct corpus score and would otherwise be a single task.
    */
  private def subsetThresholds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grouped = nestedSubsets(s, dir)
      .groupBy($"frac_pct", $"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    Evaluation.cumTallies(grouped, Seq("frac_pct"))
  }

  /** Sample-size AUC curve: tie-aware AUC of the target-density scorer on
    * nested LCG-ordered subsets (20..100%) — the set-based learning-curve
    * shape.
    */
  def learningCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    subsetThresholds(s, dir)
      .groupBy($"frac_pct")
      .agg((Evaluation.aucNumerator /
        Evaluation.aucDenominator(sum($"cp"), sum($"c" - $"cp"))).as("auc"))
      .orderBy($"frac_pct")
  }

  /** Sample-size average-precision curve (reference: sampleSizePR,
    * src/NLP_functions.py:794 / samplingCurvePR) — the PR twin of
    * learningCurve on the same nested subsets. AP is the per-threshold
    * identity Σ cp·(cum_tp/rk)/P, so the FloatFold materializes one term
    * per distinct score (bounded cardinality), honoring its contract.
    */
  def learningCurvePr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    subsetThresholds(s, dir)
      .groupBy($"frac_pct")
      // null (not NaN) when a subset has no positives — the oracle's
      // empty FILTERed list is NULL, and NULL/0 stays NULL
      .agg(round(
          graft.functions.FloatFold.orderedSumOrNull($"rk",
            $"cp".cast("double") * $"cum_tp" / $"rk", $"cp" > 0) / sum($"cp"),
          6).as("avg_precision"))
      .orderBy($"frac_pct")
  }

  val learningCurveSql: String = {
    s"""WITH scored AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    ${Evaluation.densityScoreSql("toks")} AS score
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
       |grouped AS (
       |  SELECT frac_pct, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM sub GROUP BY frac_pct, score),
       |cum AS (
       |  SELECT frac_pct, c, cp,
       |    sum(cp) OVER (PARTITION BY frac_pct ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
       |  FROM grouped)
       |SELECT frac_pct,
       |  CAST(sum((c - cp) * (2 * cum_tp - cp)) AS DOUBLE)
       |    / (2 * sum(cp) * sum(c - cp)) AS auc
       |FROM cum GROUP BY frac_pct ORDER BY frac_pct""".stripMargin
  }

  val learningCurvePrSql: String = {
    s"""WITH scored AS (
       |  SELECT doc_id, ${graft.operators.Features.labelSqlExpr} AS y,
       |    ${Evaluation.densityScoreSql("toks")} AS score
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
       |grouped AS (
       |  SELECT frac_pct, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM sub GROUP BY frac_pct, score),
       |cum AS (
       |  SELECT frac_pct, c, cp,
       |    CAST(sum(c) OVER w AS BIGINT) AS rk,
       |    CAST(sum(cp) OVER w AS BIGINT) AS cum_tp
       |  FROM grouped
       |  WINDOW w AS (PARTITION BY frac_pct ORDER BY score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT frac_pct,
       |  round(${graft.functions.FloatFold.orderedSumSql(
                  "CAST(cp AS DOUBLE) * cum_tp / rk", "rk", Some("cp > 0"))}
       |    / sum(cp), 6) AS avg_precision
       |FROM cum GROUP BY frac_pct ORDER BY frac_pct""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_ttest_5x2", ttest5x2, Some(ttest5x2Sql)),
    GraftQuery("q_median_model", medianModel, Some(medianModelSql)),
    GraftQuery("q_learning_curve", learningCurve, Some(learningCurveSql)),
    GraftQuery("q_learning_curve_pr", learningCurvePr, Some(learningCurvePrSql)))
}
