package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators (SURVEY §2.D word-match + §2.E).
  *
  * The reference builds its ROC/PR curves by sorting the test set by
  * prediction score in the driver and walking a cumulative sum
  * (sortedPredictionList + score_binary, reference:
  * src/TextClassification.py:612-723). Here the corpus-sized pass is one
  * hash aggregation to per-threshold tallies (`groupBy(score)` — the
  * sweep only needs counts per distinct score, and ties share a
  * threshold), and the cumulative sums run over that collapsed frame as
  * a two-pass range-partitioned prefix-sum, so no operator ever funnels
  * the full corpus into a single task (see [[ranked]]).
  *
  * All curve coordinates are ratios of exact integer cumulative counts,
  * so every value is bit-deterministic regardless of partitioning.
  */
object Evaluation {

  /** Word-matching targets — the diagnosis-keyword analogue of the
    * reference's l_targets (notebook cell 36).
    */
  val targets: Seq[String] = Seq("data", "spark", "query")

  val targetsRe: String = "\\b(" + targets.mkString("|") + ")\\b"

  /** Regex word-matching classifier (reference: CustomBinaryModel,
    * src/TextClassification.py:32-75): pred = presence of any target.
    */
  def wordMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fan-out DROPPED (r22 A/B, warm 0.33 → 0.20 s without): one regex
    // per row is lighter than the exchange it would ride behind
    Tables.documents(s, dir)
      .select($"doc_id",
        ($"lang" === "en").cast("int").as("y"),
        regexp_like($"text", lit(targetsRe)).cast("int").as("pred"))
      .orderBy($"doc_id")
  }

  val wordMatchSql: String =
    s"""SELECT doc_id, ${Features.labelSqlExpr} AS y,
       |  CASE WHEN regexp_matches(text, '$targetsRe') THEN 1 ELSE 0 END AS pred
       |FROM documents ORDER BY doc_id""".stripMargin

  private val targetList = targets.map(t => s"'$t'").mkString("[", ", ", "]")

  /** Target-token density on a tokens column — the single source for
    * scored and modelCompare (both engines). Empty token lists score 0.0
    * (no targets present) instead of NaN: 0.0/0 would float NaN into the
    * sweep, where Spark's floor(NaN·16) buckets it LOW while a global
    * ORDER BY score DESC sorts it HIGH — a cross-engine divergence.
    */
  def densityScore(toks: Column): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(targets: _*))).cast("double") / size(toks))
      .otherwise(lit(0.0))

  def densityScoreSql(toksExpr: String): String =
    s"CASE WHEN len($toksExpr) > 0 THEN " +
      s"CAST(len(list_filter($toksExpr, t -> list_contains($targetList, t))) AS DOUBLE)" +
      s"\n      / len($toksExpr) ELSE 0.0 END"

  /** Deterministic pseudo-probability score: target-token density. The
    * continuous-score twin of wordMatch used to drive threshold sweeps.
    */
  def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fan-out DROPPED (r22 A/B): the tokenize+density kernel is light,
    // and ~15 Evaluation-family consumers each paid the exchange —
    // q_roc_curve warm 0.65 → 0.53 s, q_auc_trapezoid 0.77 → 0.49 s
    // without it (the r21 both-board family regression)
    Tables.documents(s, dir)
      .select($"doc_id", ($"lang" === "en").cast("int").as("y"),
        TF.tokens($"text").as("toks"))
      .select($"doc_id", $"y", densityScore($"toks").as("score"))
  }

  /** Just the scored-docs CTE body, reusable by other oracle builders. */
  val scoredCteSql: String =
    s"""scored AS (
       |  SELECT doc_id, ${Features.labelSqlExpr} AS y,
       |    ${densityScoreSql("toks")} AS score
       |  FROM (SELECT doc_id, lang,
       |          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM documents) d)""".stripMargin

  private val rankedCteSql: String =
    s"""grouped AS (
       |  SELECT score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM scored GROUP BY score),
       |ranked AS (
       |  SELECT score, c, cp,
       |    CAST(sum(c) OVER w AS BIGINT) AS rk,
       |    CAST(sum(cp) OVER w AS BIGINT) AS cum_tp,
       |    CAST(sum(c - cp) OVER w AS BIGINT) AS cum_fp,
       |    (SELECT CAST(sum(y) AS BIGINT) FROM scored) AS p,
       |    (SELECT CAST(count(*) - sum(y) AS BIGINT) FROM scored) AS n
       |  FROM grouped
       |  WINDOW w AS (ORDER BY score DESC
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  val scoredSql: String = scoredCteSql + ",\n" + rankedCteSql

  /** How many range buckets the threshold prefix-sum shards over. */
  private val SweepBuckets = 16

  /** Two-pass range-partitioned prefix sums over per-threshold tallies:
    * `grouped` carries (parts..., score, c, cp) with one row per distinct
    * (parts..., score); the result adds rk (cumulative c) and cum_tp
    * (cumulative cp) in score-DESC order within each parts group. Scores
    * are densities in [0,1], so [[SweepBuckets]] fixed ranges shard the
    * window (equal scores share a bucket, bucket order agrees with score
    * order); cross-bucket offsets come from a tiny broadcast self-join —
    * no partition-less window at any parts cardinality, including
    * parts = ∅ (the single global sweep) and a parts group holding every
    * distinct corpus score (the advisor's frac_pct=100 case).
    */
  private[graft] def cumTallies(grouped: DataFrame, parts: Seq[String]): DataFrame = {
    val pc = parts.map(col)
    val bucketed = grouped.withColumn("bkt",
      least(floor(col("score") * SweepBuckets), lit(SweepBuckets - 1)).cast("int"))
    val wIn = Window.partitionBy(pc :+ col("bkt"): _*).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = bucketed
      .withColumn("c_in", sum(col("c")).over(wIn))
      .withColumn("cp_in", sum(col("cp")).over(wIn))
    val bucketTotals = bucketed.groupBy(pc :+ col("bkt"): _*)
      .agg(sum(col("c")).as("bc"), sum(col("cp")).as("bcp"))
    // offset of a bucket = totals of all HIGHER buckets in its parts
    // group (score DESC order); ≤ parts-groups × SweepBuckets² pairs — a
    // broadcast nested-loop on a tiny frame. Explicit aliases: both sides
    // descend from bucketTotals.
    val lo = bucketTotals.select(
      parts.map(p => col(p).as(s"o_$p")) :+ col("bkt").as("obkt"): _*)
    val hi = bucketTotals.select(
      parts.map(p => col(p).as(s"h_$p")) :+ col("bkt").as("hbkt") :+
        col("bc") :+ col("bcp"): _*)
    val offsets = lo.join(hi,
        parts.map(p => col(s"o_$p") === col(s"h_$p"))
          .foldLeft(col("hbkt") > col("obkt"))(_ && _), "left")
      .groupBy(parts.map(p => col(s"o_$p")) :+ col("obkt"): _*)
      .agg(coalesce(sum(col("bc")), lit(0L)).as("off_c"),
        coalesce(sum(col("bcp")), lit(0L)).as("off_cp"))
    inBucket.join(broadcast(offsets),
        parts.map(p => col(p) === col(s"o_$p"))
          .foldLeft(col("bkt") === col("obkt"))(_ && _))
      .withColumn("rk", col("off_c") + col("c_in"))
      .withColumn("cum_tp", col("off_cp") + col("cp_in"))
      .drop("bkt" +: "obkt" +: "c_in" +: "cp_in" +: "off_c" +: "off_cp" +:
        parts.map(p => s"o_$p"): _*)
  }

  /** Exact-integer decimal(38,0) cast: AUC-style products like
    * (c−cp)·(2·cum_tp−cp) are bounded by 2·P·N, which wraps int64 once
    * P·N exceeds ~4.6e18 (P, N ≈ 2e9 — inside the 100 TB envelope).
    * DuckDB sums BIGINT into HUGEINT natively, so only the Spark side
    * needs widening; both engines then round the exact integer to double
    * once.
    */
  private[graft] def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Tie-aware trapezoid-AUC numerator Σ (c−cp)·(2·cum_tp−cp) over a
    * per-threshold frame, widened to decimal before the product.
    */
  private[graft] def aucNumerator: Column =
    sum(dec(col("c") - col("cp")) * dec(lit(2) * col("cum_tp") - col("cp")))
      .cast("double")

  /** 2·P·N denominator, widened to decimal before the product. */
  private[graft] def aucDenominator(p: Column, n: Column): Column =
    (dec(lit(2)) * dec(p) * dec(n)).cast("double")

  /** Ranked THRESHOLD frame — one row per distinct score (the sweep only
    * needs per-threshold tallies, and ties share a threshold in the
    * reference's sortedPredictionList semantics): score, c (rows at this
    * score), cp (positives at it), rk / cum_tp / cum_fp (cumulative from
    * the top), totals p / n.
    *
    * Scale shape: the corpus-sized pass is ONE hash aggregation
    * (`groupBy(score)`); the cumulative sums then run over the collapsed
    * per-threshold frame via [[cumTallies]] — per-bucket window + tiny
    * broadcast bucket-offset join — so no partition-less window (Spark's
    * "moving all data to a single partition" shape) appears anywhere in
    * the plan.
    */
  private[operators] def ranked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grouped = scored(s, dir)
      .groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    val totals = grouped.agg(sum($"cp").as("p"), (sum($"c") - sum($"cp")).as("n"))
    cumTallies(grouped, Nil)
      .crossJoin(broadcast(totals))
      .select($"score", $"c", $"cp", $"rk", $"cum_tp",
        ($"rk" - $"cum_tp").as("cum_fp"), $"p", $"n")
  }

  /** Threshold-sweep ROC points (reference: score_binary,
    * src/TextClassification.py:691-723) — one point per distinct
    * threshold, ties share a point (sklearn roc_curve semantics).
    */
  def rocCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ranked(s, dir)
      .select($"rk", $"score",
        ($"cum_tp".cast("double") / $"p").as("tpr"),
        ($"cum_fp".cast("double") / $"n").as("fpr"))
      .orderBy($"rk")
  }

  val rocCurveSql: String =
    s"""WITH $scoredSql
       |SELECT rk, score,
       |  CAST(cum_tp AS DOUBLE) / p AS tpr,
       |  CAST(cum_fp AS DOUBLE) / n AS fpr
       |FROM ranked ORDER BY rk""".stripMargin

  /** Trapezoid ROC-AUC (reference: calculateAUC,
    * src/TextClassification.py:385) over the per-threshold curve: each
    * threshold group contributes the trapezoid
    * Δfp · (tpr_prev + tpr) / 2 = (c−cp)·(2·cum_tp−cp) / (2·P·N) — the
    * tie-aware area, identical to the rank-sum AUC identity, and exact
    * integer arithmetic until the one final division.
    */
  def aucTrapezoid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ranked(s, dir)
      .agg((aucNumerator / aucDenominator(first($"p"), first($"n"))).as("auc"))
  }

  val aucTrapezoidSql: String =
    s"""WITH $scoredSql
       |SELECT CAST(sum((c - cp) * (2 * cum_tp - cp)) AS DOUBLE)
       |  / (2 * any_value(p) * any_value(n)) AS auc
       |FROM ranked""".stripMargin

  /** Precision-recall points (reference: modelPrecisionRecall,
    * src/TextClassification.py:446) — one point per distinct threshold.
    */
  def prCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ranked(s, dir)
      .select($"rk", $"score",
        ($"cum_tp".cast("double") / $"rk").as("precision"),
        ($"cum_tp".cast("double") / $"p").as("recall"))
      .orderBy($"rk")
  }

  val prCurveSql: String =
    s"""WITH $scoredSql
       |SELECT rk, score,
       |  CAST(cum_tp AS DOUBLE) / rk AS precision,
       |  CAST(cum_tp AS DOUBLE) / p AS recall
       |FROM ranked ORDER BY rk""".stripMargin

  /** F1 across the threshold sweep (reference: score_binary F1 column). */
  def f1Sweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pr = ($"cum_tp".cast("double") / $"rk")
    val rc = ($"cum_tp".cast("double") / $"p")
    ranked(s, dir)
      .select($"rk", $"score",
        when(pr + rc > 0.0, lit(2.0) * pr * rc / (pr + rc)).otherwise(0.0).as("f1"))
      .orderBy($"rk")
  }

  val f1SweepSql: String =
    s"""WITH $scoredSql
       |SELECT rk, score,
       |  CASE WHEN CAST(cum_tp AS DOUBLE) / rk + CAST(cum_tp AS DOUBLE) / p > 0
       |    THEN 2.0 * (CAST(cum_tp AS DOUBLE) / rk) * (CAST(cum_tp AS DOUBLE) / p)
       |         / (CAST(cum_tp AS DOUBLE) / rk + CAST(cum_tp AS DOUBLE) / p)
       |    ELSE 0.0 END AS f1
       |FROM ranked ORDER BY rk""".stripMargin

  /** Optimal cutoff where TPR ≈ 1−FPR (reference: optimalCutoff,
    * src/NLP_functions.py:229).
    */
  def optimalCutoff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ranked(s, dir)
      .select($"rk", $"score",
        ($"cum_tp".cast("double") / $"p").as("tpr"),
        ($"cum_fp".cast("double") / $"n").as("fpr"))
      .withColumn("balance", abs($"tpr" - (lit(1.0) - $"fpr")))
      .orderBy($"balance".asc, $"rk".asc)
      .limit(1)
      .select($"score".as("cutoff"), $"tpr", $"fpr")
  }

  val optimalCutoffSql: String =
    s"""WITH $scoredSql
       |SELECT score AS cutoff,
       |  CAST(cum_tp AS DOUBLE) / p AS tpr,
       |  CAST(cum_fp AS DOUBLE) / n AS fpr
       |FROM ranked
       |ORDER BY abs(CAST(cum_tp AS DOUBLE) / p
       |  - (1.0 - CAST(cum_fp AS DOUBLE) / n)) ASC, rk ASC
       |LIMIT 1""".stripMargin

  /** Label distribution per source — the notebook's "Distribution of
    * RA and Non-RA-cases" bar chart (cell 27): positive/negative case
    * counts and prevalence per corpus section. One hash aggregation.
    */
  def labelDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source")
      .agg(sum(($"lang" === "en").cast("long")).as("n_pos"),
        sum(($"lang" =!= "en").cast("long")).as("n_neg"),
        (sum(($"lang" === "en").cast("long")).cast("double") / count(lit(1)))
          .as("prevalence"))
      .orderBy($"source")
  }

  val labelDistSql: String =
    s"""SELECT source,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
       |    AS prevalence
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Per-CV-iteration F1 of the word-match classifier — the analytic
    * core of the reference's plotF1scores (src/TextClassification.py:
    * 1302, the F1 boxplot across folds): F1 on each iteration's test
    * half under the deterministic shuffle split. Exact integer counts
    * per fold, one aggregation.
    */
  def f1Folds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iters = s.range(0, 10).select($"id".cast("int").as("iter"))
    wordMatch(s, dir)
      .crossJoin(broadcast(iters))
      .where(shuffleSplitBit($"doc_id", $"iter", 10) === 1) // cvFolds' is_test
      .groupBy($"iter")
      .agg(sum($"y" * $"pred").as("tp"),
        sum((lit(1) - $"y") * $"pred").as("fp"),
        sum($"y" * (lit(1) - $"pred")).as("fn"))
      .select($"iter",
        ((lit(2) * $"tp").cast("double") /
          (lit(2) * $"tp" + $"fp" + $"fn")).as("f1"))
      .orderBy($"iter")
  }

  val f1FoldsSql: String =
    s"""WITH wm AS (
       |  SELECT doc_id, ${Features.labelSqlExpr} AS y,
       |    CASE WHEN regexp_matches(text, '$targetsRe') THEN 1 ELSE 0 END AS pred
       |  FROM documents),
       |folds AS (
       |  SELECT iter, y, pred
       |  FROM wm, (SELECT unnest(generate_series(0, 9)) AS iter) i
       |  WHERE ${shuffleSplitBitSql("doc_id", "iter", 10)} = 1),
       |cm AS (
       |  SELECT iter, CAST(sum(y * pred) AS BIGINT) AS tp,
       |    CAST(sum((1 - y) * pred) AS BIGINT) AS fp,
       |    CAST(sum(y * (1 - pred)) AS BIGINT) AS fn
       |  FROM folds GROUP BY iter)
       |SELECT iter, CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1
       |FROM cm ORDER BY iter""".stripMargin

  /** Full confusion-matrix sweep — the reference's confusion_window
    * (src/TextClassification.py:650): cumulative tp/fp/fn/tn plus
    * tpr/fpr/precision at every distinct threshold of the density score,
    * one row per threshold, all cells exact integer counts.
    */
  def confusionSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ranked(s, dir)
      .select($"rk", $"score",
        $"cum_tp".as("tp"), $"cum_fp".as("fp"),
        ($"p" - $"cum_tp").as("fn"), ($"n" - $"cum_fp").as("tn"),
        ($"cum_tp".cast("double") / $"p").as("tpr"),
        ($"cum_fp".cast("double") / $"n").as("fpr"),
        ($"cum_tp".cast("double") / $"rk").as("prc"))
      .orderBy($"rk")
  }

  val confusionSweepSql: String =
    s"""WITH $scoredSql
       |SELECT rk, score, cum_tp AS tp, cum_fp AS fp,
       |  p - cum_tp AS fn, n - cum_fp AS tn,
       |  CAST(cum_tp AS DOUBLE) / p AS tpr,
       |  CAST(cum_fp AS DOUBLE) / n AS fpr,
       |  CAST(cum_tp AS DOUBLE) / rk AS prc
       |FROM ranked ORDER BY rk""".stripMargin

  /** Per-class score distribution — the data behind the reference's
    * swarm/scatter plots (plotSwarm / plotScatter,
    * src/TextClassification.py:986, :484): per-document scores grouped by
    * true class into fixed-width buckets. One hash aggregation.
    */
  def scoreDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scored(s, dir)
      .groupBy($"y",
        least(floor($"score" * 20), lit(19)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min($"score").as("min_score"), max($"score").as("max_score"))
      .orderBy($"y", $"bucket")
  }

  val scoreDistributionSql: String =
    s"""WITH $scoredCteSql
       |SELECT y, CAST(least(floor(score * 20), 19) AS INT) AS bucket,
       |  count(*) AS n_docs, min(score) AS min_score, max(score) AS max_score
       |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Calibration / reliability diagram + Brier score — the probability-
    * quality view the threshold sweeps don't give (a model can rank
    * perfectly yet be mis-calibrated; the reference's swarm plots eyeball
    * this, the reliability curve measures it): scores in 10 fixed-width
    * bins, each bin's mean predicted score against its empirical
    * positive rate, with the global Brier score mean((score−y)²) on
    * every row. Float discipline: scores pre-round to integer
    * micro-units (round(score·10⁶) — the q_mixture_temperature
    * integers-before-the-sum precedent), so every aggregate is an exact
    * integer/decimal sum — order-independent at any parallelism — and
    * each output is one IEEE division at the end. The Brier sum widens
    * to decimal(38,0): (si−y·10⁶)² ≤ 10¹² wraps int64 at ~9M docs,
    * inside the 100 TB envelope. One corpus scan, one 10-group hash
    * agg + a broadcast single-row totals join.
    */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = scored(s, dir).select($"y",
      least(floor($"score" * 10), lit(9)).cast("int").as("bin"),
      round($"score" * 1000000).cast("long").as("si"))
    val bins = base.groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"y").cast("long").as("n_pos"),
        sum($"si").as("sum_si"))
    val sq = ($"si" - $"y".cast("long") * 1000000L).cast("decimal(38,0)")
    val tot = base.agg(
      (sum(sq * sq).cast("double") /
        (count(lit(1)).cast("double") * 1e12)).as("brier"))
    bins.crossJoin(broadcast(tot))
      .select($"bin", $"n_docs", $"n_pos",
        round($"n_pos".cast("double") / $"n_docs", 6).as("pos_rate"),
        round($"sum_si".cast("double") / ($"n_docs".cast("double") * 1e6), 6)
          .as("mean_score"),
        round($"brier", 6).as("brier"))
      .orderBy($"bin")
  }

  val calibrationSql: String =
    s"""WITH $scoredCteSql,
       |base AS (
       |  SELECT y, CAST(least(floor(score * 10), 9) AS INT) AS bin,
       |    CAST(round(score * 1000000) AS BIGINT) AS si
       |  FROM scored),
       |tot AS (
       |  SELECT CAST(sum((si - y * 1000000) * (si - y * 1000000)) AS DOUBLE)
       |    / (CAST(count(*) AS DOUBLE) * 1e12) AS brier
       |  FROM base)
       |SELECT bin, count(*) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos,
       |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate,
       |  round(CAST(sum(si) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6), 6)
       |    AS mean_score,
       |  round(t.brier, 6) AS brier
       |FROM base CROSS JOIN tot t
       |GROUP BY bin, t.brier ORDER BY bin""".stripMargin

  /** Confusion matrix + the reference's eight derived metrics
    * (scoresCM, src/TextClassification.py:865-890) for the word-match
    * classifier — one aggregation, metrics as exact-count ratios.
    */
  def confusionMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wordMatch(s, dir)
      .agg(
        sum($"y" * $"pred").as("tp"),
        sum((lit(1) - $"y") * $"pred").as("fp"),
        sum((lit(1) - $"y") * (lit(1) - $"pred")).as("tn"),
        sum($"y" * (lit(1) - $"pred")).as("fn"))
      .select($"tp", $"fp", $"tn", $"fn",
        ($"tp".cast("double") / ($"tp" + $"fn")).as("tpr"),
        ($"tn".cast("double") / ($"tn" + $"fp")).as("tnr"),
        ($"tp".cast("double") / ($"tp" + $"fp")).as("ppv"),
        ($"tn".cast("double") / ($"tn" + $"fn")).as("npv"),
        ($"fp".cast("double") / ($"fp" + $"tn")).as("fpr"),
        ($"fn".cast("double") / ($"tp" + $"fn")).as("fnr"),
        ($"fp".cast("double") / ($"tp" + $"fp")).as("fdr"),
        (($"tp" + $"tn").cast("double") / ($"tp" + $"fp" + $"tn" + $"fn")).as("acc"))
  }

  /** Shared wm/cm CTE chain (defines `cm` with tp/fp/tn/fn) — the single
    * source for the plain and normalized confusion-matrix oracles.
    */
  private val cmCtesSql: String =
    s"""wm AS (
       |  SELECT ${Features.labelSqlExpr} AS y,
       |    CASE WHEN regexp_matches(text, '$targetsRe') THEN 1 ELSE 0 END AS pred
       |  FROM documents),
       |cm AS (
       |  -- CAST: DuckDB sum(int) is HUGEINT, which pandas reads as float64
       |  -- and the driver's dtype-sensitive hash then mismatches Spark's int64
       |  SELECT CAST(sum(y * pred) AS BIGINT) AS tp,
       |    CAST(sum((1 - y) * pred) AS BIGINT) AS fp,
       |    CAST(sum((1 - y) * (1 - pred)) AS BIGINT) AS tn,
       |    CAST(sum(y * (1 - pred)) AS BIGINT) AS fn
       |  FROM wm)""".stripMargin

  val confusionMatrixSql: String =
    s"""WITH $cmCtesSql
       |SELECT tp, fp, tn, fn,
       |  CAST(tp AS DOUBLE) / (tp + fn) AS tpr,
       |  CAST(tn AS DOUBLE) / (tn + fp) AS tnr,
       |  CAST(tp AS DOUBLE) / (tp + fp) AS ppv,
       |  CAST(tn AS DOUBLE) / (tn + fn) AS npv,
       |  CAST(fp AS DOUBLE) / (fp + tn) AS fpr,
       |  CAST(fn AS DOUBLE) / (tp + fn) AS fnr,
       |  CAST(fp AS DOUBLE) / (tp + fp) AS fdr,
       |  CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn) AS acc
       |FROM cm""".stripMargin

  /** Row-normalized confusion matrix (reference: plot_confusion_matrix
    * with normalize=True, src/TextClassification.py:892 — each cell
    * divided by its true-class row total) for the word-match classifier.
    */
  def confusionMatrixNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the row-normalized cells ARE the plain matrix's rate columns
    confusionMatrix(s, dir)
      .select($"tpr".as("tp_rate"), $"fnr".as("fn_rate"),
        $"fpr".as("fp_rate"), $"tnr".as("tn_rate"))
  }

  val confusionMatrixNormSql: String =
    s"""WITH $cmCtesSql
       |SELECT CAST(tp AS DOUBLE) / (tp + fn) AS tp_rate,
       |  CAST(fn AS DOUBLE) / (tp + fn) AS fn_rate,
       |  CAST(fp AS DOUBLE) / (fp + tn) AS fp_rate,
       |  CAST(tn AS DOUBLE) / (fp + tn) AS tn_rate
       |FROM cm""".stripMargin

  /** High bit of the seeded LCG shuffle-split state — THE deterministic
    * fold-assignment bit, single-sourced for cvFolds, f1Folds, the
    * mean-ROC folds, and the 5×2 grid (mult = iterations 10, or rounds
    * 5). The HIGH bit, not the low: the low bit of x·odd+odd is pure
    * parity and would collapse every split to all-or-nothing; hence the
    * shift-16 before the mod-2.
    */
  private[graft] def shuffleSplitBit(docId: Column, iter: Column, mult: Long): Column =
    ((((((docId % 2147483648L) * mult + iter) % 2147483648L) * 1103515245L + 12345L) % 2147483648L)
      .divide(65536).cast("long") % 2)

  private[graft] def shuffleSplitBitSql(doc: String, iter: String, mult: Long): String =
    s"(((((($doc % 2147483648) * $mult + $iter) % 2147483648) * 1103515245 + 12345) % 2147483648) // 65536) % 2"

  /** Deterministic shuffle-split fold assignment — the distributed twin of
    * the reference's seeded ShuffleSplit (preset_CV10Folds,
    * src/NLP_functions.py:198): 10 iterations, each a ~50/50 LCG-hash
    * split, reproducible on any cluster without a driver-side permutation.
    */
  def cvFolds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iters = s.range(0, 10).select($"id".cast("int").as("iter"))
    Tables.documents(s, dir).select($"doc_id")
      .crossJoin(broadcast(iters))
      .select($"iter", $"doc_id",
        shuffleSplitBit($"doc_id", $"iter", 10).cast("int").as("is_test"))
      .orderBy($"iter", $"doc_id")
  }

  val cvFoldsSql: String =
    s"""SELECT iter, doc_id,
       |  CAST(${shuffleSplitBitSql("doc_id", "iter", 10)} AS INT) AS is_test
       |FROM documents, (SELECT unnest(generate_series(0, 9)) AS iter) i
       |ORDER BY iter, doc_id""".stripMargin

  /** Deterministic prevalence re-sampling (under-sample negatives to hit
    * target prevalence; reference: plotPrevalencePR,
    * src/TextClassification.py:1332 and classifyOnLowerPrevalence,
    * src/NLP_functions.py:260): keep all positives plus the first
    * ⌊P·(100−pp)/pp⌋ negatives in LCG-hash order.
    */
  def prevalenceResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Features.labeled(s, dir).select($"doc_id", $"y")
    val prevs = s.range(0, 3).select(
      when($"id" === 0, 25).when($"id" === 1, 50).otherwise(75).as("prev_pct"))
    val withH = docs.crossJoin(broadcast(prevs))
      .withColumn("h", (($"doc_id" % 2147483648L) * 2654435761L + 12345L) % 2147483648L)
    val w = Window.partitionBy($"prev_pct").orderBy($"h".asc, $"doc_id".asc)
    val negRanked = withH.where($"y" === 0)
      .withColumn("nrk", row_number().over(w).cast("long"))
    val pCount = docs.agg(sum($"y").as("p"))
    val negKept = negRanked.crossJoin(broadcast(pCount))
      .where($"nrk" <= floor($"p" * (lit(100) - $"prev_pct") / $"prev_pct"))
      .select($"prev_pct", $"doc_id", $"y")
    val posAll = withH.where($"y" === 1).select($"prev_pct", $"doc_id", $"y")
    posAll.unionByName(negKept).orderBy($"prev_pct", $"doc_id")
  }

  /** The resample as a reusable CTE chain (defines `resample`), shared
    * by q_prevalence_resample and the prevalence-PR sweep.
    */
  private val resampleCtesSql: String =
    s"""docs AS (
       |  SELECT doc_id, ${Features.labelSqlExpr} AS y FROM documents),
       |prevs AS (SELECT unnest([25, 50, 75]) AS prev_pct),
       |p AS (SELECT sum(y) AS p FROM docs),
       |neg AS (
       |  SELECT prev_pct, doc_id, y,
       |    CAST(row_number() OVER (PARTITION BY prev_pct
       |      ORDER BY ((doc_id % 2147483648) * 2654435761 + 12345) % 2147483648 ASC, doc_id ASC)
       |      AS BIGINT) AS nrk
       |  FROM docs, prevs WHERE y = 0),
       |resample AS (
       |  SELECT prev_pct, doc_id, y FROM docs, prevs WHERE y = 1
       |  UNION ALL
       |  SELECT prev_pct, doc_id, y FROM neg, p
       |  WHERE nrk <= floor(p.p * (100 - prev_pct) / prev_pct))""".stripMargin

  val prevalenceResampleSql: String =
    s"""WITH $resampleCtesSql
       |SELECT prev_pct, doc_id, y FROM resample
       |ORDER BY prev_pct, doc_id""".stripMargin

  /** Average-precision per prevalence level — the analytic core of the
    * reference's plotPrevalencePR (src/TextClassification.py:1332): how
    * precision-recall degrades as the positive-class prevalence drops.
    * Composes the deterministic resample with the density-score sweep:
    * per-(prev_pct, score) tallies in one hash agg, cumulative counts via
    * [[cumTallies]], AP as the per-threshold identity folded in fixed rk
    * order (one term per distinct score — FloatFold's contract).
    */
  def prevalencePr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = prevalenceResample(s, dir)
    val sc = scored(s, dir).select($"doc_id", $"score")
    val grouped = sub.join(sc, "doc_id")
      .groupBy($"prev_pct", $"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    cumTallies(grouped, Seq("prev_pct"))
      .groupBy($"prev_pct")
      .agg(round(
          graft.functions.FloatFold.orderedSumOrNull($"rk",
            $"cp".cast("double") * $"cum_tp" / $"rk", $"cp" > 0) / sum($"cp"),
          6).as("avg_precision"))
      .orderBy($"prev_pct")
  }

  val prevalencePrSql: String =
    s"""WITH $resampleCtesSql,
       |$scoredCteSql,
       |joined AS (
       |  SELECT r.prev_pct, r.y, s.score
       |  FROM resample r JOIN scored s USING (doc_id)),
       |grouped AS (
       |  SELECT prev_pct, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM joined GROUP BY prev_pct, score),
       |cum AS (
       |  SELECT prev_pct, c, cp,
       |    CAST(sum(c) OVER w AS BIGINT) AS rk,
       |    CAST(sum(cp) OVER w AS BIGINT) AS cum_tp
       |  FROM grouped
       |  WINDOW w AS (PARTITION BY prev_pct ORDER BY score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT prev_pct,
       |  round(${graft.functions.FloatFold.orderedSumSql(
                  "CAST(cp AS DOUBLE) * cum_tp / rk", "rk", Some("cp > 0"))}
       |    / sum(cp), 6) AS avg_precision
       |FROM cum GROUP BY prev_pct ORDER BY prev_pct""".stripMargin

  /** Deterministic class-balance over-sampling — the other half of the
    * reference's balancing surface (notebook cell 21 up-sample path,
    * complementing q_prevalence_resample's under-sample): every class is
    * replicated up to the majority count. Each row gets
    * n_copies = ⌊maxc/cnt⌋ plus one extra for the first (maxc mod cnt)
    * rows in LCG-hash order, so Σ n_copies = maxc for every class —
    * emitted as a copies column (exact integer arithmetic, no RNG, no
    * materialized duplication until the consumer explodes it).
    */
  def balanceOversample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Features.labeled(s, dir).select($"doc_id", $"y")
    val w = Window.partitionBy($"y")
      .orderBy(((($"doc_id" % 2147483648L) * 2654435761L + 54321L) % 2147483648L).asc, $"doc_id".asc)
    val ranked = docs.withColumn("rnk", row_number().over(w).cast("long"))
    val sizes = docs.groupBy($"y").agg(count(lit(1)).as("cnt"))
    val maxc = sizes.agg(max($"cnt").as("maxc"))
    ranked.join(broadcast(sizes), "y").crossJoin(broadcast(maxc))
      .select($"doc_id", $"y",
        (expr("maxc div cnt") +
          when($"rnk" <= $"maxc" % $"cnt", 1L).otherwise(0L)).as("n_copies"))
      .orderBy($"doc_id")
  }

  val balanceOversampleSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${Features.labelSqlExpr} AS y FROM documents),
       |ranked AS (
       |  SELECT doc_id, y,
       |    CAST(row_number() OVER (PARTITION BY y
       |      ORDER BY ((doc_id % 2147483648) * 2654435761 + 54321) % 2147483648 ASC, doc_id ASC)
       |      AS BIGINT) AS rnk
       |  FROM docs),
       |sizes AS (SELECT y, count(*) AS cnt FROM docs GROUP BY y),
       |mx AS (SELECT max(cnt) AS maxc FROM sizes)
       |SELECT doc_id, r.y,
       |  CAST(maxc // cnt + CASE WHEN rnk <= maxc % cnt THEN 1 ELSE 0 END
       |    AS BIGINT) AS n_copies
       |FROM ranked r JOIN sizes s ON r.y = s.y CROSS JOIN mx
       |ORDER BY doc_id""".stripMargin

  /** Hold-out model comparison (reference: holdOutSplitPerformance,
    * src/NLP_functions.py:311 — fit on one half, compare AUC/F1 on the
    * held-out half). The SQL-checkable pair is compared here: the
    * word-match model (density score) and the stratified dummy; the six
    * MLlib models' hold-out predictions are the q_ml_* family.
    *
    * AUC is the tie-aware rank-sum identity computed entirely in integer
    * arithmetic (midrank·2 stays integral; one final division), so the
    * result is bit-deterministic at any parallelism.
    */
  def modelCompare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fan-out DROPPED (r22 A/B, warm 1.71 → 1.25 s without): `test` is
    // referenced twice (word-match + dummy branch) and only the first
    // runs a token kernel — the doubled exchange cost more than it won
    val test = Tables.documents(s, dir)
      .where($"doc_id" % 2 === 1)
    val wm = test.select(lit("word_match").as("model"), $"doc_id",
      ($"lang" === "en").cast("int").as("y"),
      TF.tokens($"text").as("toks"),
      regexp_like($"text", lit(targetsRe)).cast("int").as("pred"))
      .select($"model", $"doc_id", $"y",
        densityScore($"toks").as("score"), $"pred")
    val prev = Tables.documents(s, dir).where($"doc_id" % 2 === 0)
      .agg((sum(($"lang" === "en").cast("int")).cast("double") / count(lit(1))).as("p"))
    val u = graft.ml.Classifiers.dummyU($"doc_id")
    val dm = test.crossJoin(broadcast(prev))
      .select(lit("dummy").as("model"), $"doc_id",
        ($"lang" === "en").cast("int").as("y"),
        (u.cast("double") / 1000.0).as("score"),
        (u < floor($"p" * 1000)).cast("int").as("pred"))
    val long = wm.unionByName(dm)
    val grouped = long.groupBy($"model", $"score")
      .agg(count(lit(1)).as("c"), sum($"y").as("cp"))
    val modelTotals = grouped.groupBy($"model").agg(sum($"c").as("tot_c"))
    // cum_before (rows strictly below this score) = tot_c − rk, with rk
    // the score-DESC cumulative from cumTallies — the rank sum runs on
    // the bucketed prefix-sum, not a per-model single-task window
    val ranks = cumTallies(grouped, Seq("model"))
      .join(broadcast(modelTotals), "model")
      .withColumn("cum_before", $"tot_c" - $"rk")
      .groupBy($"model")
      // decimal before the product: cp·(2·cum_before+c+1) is bounded by
      // 2·P·(P+N) and wraps int64 at ~2e9-row models (see dec)
      .agg(sum(dec($"cp") * dec(lit(2) * $"cum_before" + $"c" + 1)).as("s2"))
    val cm = long.groupBy($"model").agg(
      sum($"y").as("p"), sum(lit(1) - $"y").as("n"),
      sum($"y" * $"pred").as("tp"), sum((lit(1) - $"y") * $"pred").as("fp"),
      sum($"y" * (lit(1) - $"pred")).as("fn"))
    ranks.join(cm, "model")
      .select($"model",
        (($"s2" - dec($"p") * dec($"p" + 1)).cast("double") /
          aucDenominator($"p", $"n")).as("auc"),
        ((lit(2) * $"tp").cast("double") /
          (lit(2) * $"tp" + $"fp" + $"fn")).as("f1"))
      .orderBy($"model")
  }

  val modelCompareSql: String =
    s"""WITH test AS (
       |  SELECT doc_id, ${Features.labelSqlExpr} AS y, text,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |  FROM documents WHERE doc_id % 2 = 1),
       |prev AS (
       |  SELECT CAST(sum(${Features.labelSqlExpr}) AS DOUBLE) / count(*) AS p
       |  FROM documents WHERE doc_id % 2 = 0),
       |long AS (
       |  SELECT 'word_match' AS model, doc_id, y,
       |    ${densityScoreSql("toks")} AS score,
       |    CASE WHEN regexp_matches(text, '$targetsRe') THEN 1 ELSE 0 END AS pred
       |  FROM test
       |  UNION ALL
       |  SELECT 'dummy' AS model, doc_id, y,
       |    CAST(${graft.ml.Classifiers.dummyUSql("doc_id")} AS DOUBLE)
       |      / 1000.0 AS score,
       |    CASE WHEN ${graft.ml.Classifiers.dummyUSql("doc_id")}
       |      < floor(p * 1000) THEN 1 ELSE 0 END AS pred
       |  FROM test, prev),
       |grouped AS (
       |  SELECT model, score, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
       |  FROM long GROUP BY model, score),
       |ranks AS (
       |  SELECT model,
       |    CAST(sum(cp * (2 * cum_before + c + 1)) AS BIGINT) AS s2
       |  FROM (
       |    SELECT model, c, cp,
       |      CAST(coalesce(sum(c) OVER (PARTITION BY model ORDER BY score ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |        AS cum_before
       |    FROM grouped) z
       |  GROUP BY model),
       |cm AS (
       |  SELECT model, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS n,
       |    CAST(sum(y * pred) AS BIGINT) AS tp,
       |    CAST(sum((1 - y) * pred) AS BIGINT) AS fp,
       |    CAST(sum(y * (1 - pred)) AS BIGINT) AS fn
       |  FROM long GROUP BY model)
       |SELECT ranks.model,
       |  CAST(s2 - p * (p + 1) AS DOUBLE) / (2 * p * n) AS auc,
       |  CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1
       |FROM ranks JOIN cm ON ranks.model = cm.model
       |ORDER BY ranks.model""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_word_match", wordMatch, Some(wordMatchSql)),
    GraftQuery("q_model_compare", modelCompare, Some(modelCompareSql)),
    GraftQuery("q_balance_oversample", balanceOversample, Some(balanceOversampleSql)),
    GraftQuery("q_roc_curve", rocCurve, Some(rocCurveSql)),
    GraftQuery("q_auc_trapezoid", aucTrapezoid, Some(aucTrapezoidSql)),
    GraftQuery("q_pr_curve", prCurve, Some(prCurveSql)),
    GraftQuery("q_f1_sweep", f1Sweep, Some(f1SweepSql)),
    GraftQuery("q_optimal_cutoff", optimalCutoff, Some(optimalCutoffSql)),
    GraftQuery("q_confusion_matrix", confusionMatrix, Some(confusionMatrixSql)),
    GraftQuery("q_confusion_matrix_norm", confusionMatrixNorm,
      Some(confusionMatrixNormSql)),
    GraftQuery("q_cv_folds", cvFolds, Some(cvFoldsSql)),
    GraftQuery("q_prevalence_resample", prevalenceResample, Some(prevalenceResampleSql)),
    GraftQuery("q_prevalence_pr", prevalencePr, Some(prevalencePrSql)),
    GraftQuery("q_confusion_sweep", confusionSweep, Some(confusionSweepSql)),
    GraftQuery("q_score_distribution", scoreDistribution, Some(scoreDistributionSql)),
    GraftQuery("q_calibration", calibration, Some(calibrationSql)),
    GraftQuery("q_label_dist", labelDist, Some(labelDistSql)),
    GraftQuery("q_f1_folds", f1Folds, Some(f1FoldsSql)))
}
