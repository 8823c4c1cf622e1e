package graft.operators

import graft.{GraftQuery, SessionCache, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation (SURVEY §2.F capstone): the composed
  * training-data pipeline — exact dedup → quality gate → language gate —
  * as ONE declarative plan, so Catalyst fuses the stages (the quality
  * and language projections share a single scan and the dedup is the
  * only shuffle).
  */
object Curation {

  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // tokenize + quality metrics are heavy row-local work on a scan a
    // small snapshot plans single-task — spread it (Tables.fanOut is a
    // no-op once the scan itself parallelizes)
    val docs = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", $"text", $"lang", md5($"text".cast("binary")).as("h"))
    // exact dedup: keep the min doc_id per content hash
    val keep = docs.groupBy($"h").agg(min($"doc_id").as("doc_id"))
    docs.join(keep, Seq("h", "doc_id"), "left_semi")
      .select($"doc_id", $"lang", TF.tokens($"text").as("toks"), $"text")
      .select($"doc_id" +: $"lang" +:
        TextAnalysis.qualityMetricCols($"toks", $"text"): _*)
      .withColumn("quality",
        TextAnalysis.qualityCol($"n_tokens", $"stop_ratio", $"punct_ratio"))
      .where($"quality" >= 0.35 && $"lang" === "en")
      .select($"doc_id", $"n_tokens", $"quality")
      .orderBy($"doc_id")
  }

  /** Curation FUNNEL — the stage-by-stage attrition report of
    * [[curationPipeline]] (the number every curation run publishes:
    * how many docs each gate removed): raw → exact-dedup survivors →
    * +quality ≥ 0.35 → +lang = en, with per-stage retention. One
    * corpus scan computes every per-doc flag row-locally (dedup
    * survivorship via the same min-id semi-join frame), then FOUR
    * conditional sums in ONE single-row aggregate — the funnel costs
    * one pass however many stages it reports. Counts are exact
    * integers; rates exact ratios vs the previous stage.
    */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fan-out DROPPED (r22 A/B, warm 0.66 → 0.48 s without): `docs` is
    // referenced three times (dedup semi-join both sides + the staged
    // pass), so the exchange tripled while md5+tokens stayed light
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"text", $"lang", md5($"text".cast("binary")).as("h"))
    val keep = docs.groupBy($"h").agg(min($"doc_id").as("keep_id"))
    val flags = docs
      .join(keep, docs("h") === keep("h") && docs("doc_id") === keep("keep_id"))
      .select(docs("doc_id"), lit(1).as("kept"))
    val staged = docs
      .join(flags, Seq("doc_id"), "left")
      .select($"doc_id", $"lang", coalesce($"kept", lit(0)).as("kept"),
        TF.tokens($"text").as("toks"), $"text")
      .select($"doc_id", $"lang", $"kept",
        TextAnalysis.qualityFromToks($"toks", $"text").as("quality"))
    val agg = staged.agg(
      count(lit(1)).as("n_raw"),
      sum($"kept").cast("long").as("n_dedup"),
      sum(when($"kept" === 1 && $"quality" >= 0.35, 1).otherwise(0))
        .cast("long").as("n_quality"),
      sum(when($"kept" === 1 && $"quality" >= 0.35 && $"lang" === "en", 1)
        .otherwise(0)).cast("long").as("n_lang"))
    // every denominator is a prior stage's count, so a degenerate funnel
    // (empty corpus, or no doc passing a gate) hits 0/0 — which ANSI
    // mode throws on; the zipfFit/heapsFit guard: NULL, not a crash
    def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round(when(den > 0, num.cast("double") / den), 6)
    agg.select(
      $"n_raw", $"n_dedup", $"n_quality", $"n_lang",
      rate($"n_dedup", $"n_raw").as("dedup_rate"),
      rate($"n_quality", $"n_dedup").as("quality_rate"),
      rate($"n_lang", $"n_quality").as("lang_rate"),
      rate($"n_lang", $"n_raw").as("overall_rate"))
  }

  val curationFunnelSql: String = {
    val lst = TF.englishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH docs AS (
       |  SELECT doc_id, text, lang, md5(text) AS h FROM documents),
       |keep AS (SELECT h, min(doc_id) AS keep_id FROM docs GROUP BY h),
       |staged AS (
       |  SELECT d.doc_id, d.lang,
       |    CASE WHEN k.keep_id IS NOT NULL THEN 1 ELSE 0 END AS kept,
       |    ${TextAnalysis.qualitySqlExpr(
            "len(toks)",
            s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS DOUBLE) / len(toks)",
            "CAST(len(regexp_extract_all(d.text, '[^a-z0-9\\s]')) AS DOUBLE) / len(d.text)")} AS quality
       |  FROM (SELECT *, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |        FROM docs) d
       |  LEFT JOIN keep k ON d.h = k.h AND d.doc_id = k.keep_id),
       |agg AS (
       |  SELECT count(*) AS n_raw,
       |    CAST(sum(kept) AS BIGINT) AS n_dedup,
       |    CAST(sum(CASE WHEN kept = 1 AND quality >= 0.35 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_quality,
       |    CAST(sum(CASE WHEN kept = 1 AND quality >= 0.35 AND lang = 'en'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
       |  FROM staged)
       |SELECT n_raw, n_dedup, n_quality, n_lang,
       |  round(CASE WHEN n_raw > 0
       |    THEN CAST(n_dedup AS DOUBLE) / n_raw END, 6) AS dedup_rate,
       |  round(CASE WHEN n_dedup > 0
       |    THEN CAST(n_quality AS DOUBLE) / n_dedup END, 6) AS quality_rate,
       |  round(CASE WHEN n_quality > 0
       |    THEN CAST(n_lang AS DOUBLE) / n_quality END, 6) AS lang_rate,
       |  round(CASE WHEN n_raw > 0
       |    THEN CAST(n_lang AS DOUBLE) / n_raw END, 6) AS overall_rate
       |FROM agg""".stripMargin
  }

  val curationPipelineSql: String = {
    val lst = TF.englishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH docs AS (
       |  SELECT doc_id, text, lang, md5(text) AS h FROM documents),
       |keep AS (SELECT h, min(doc_id) AS doc_id FROM docs GROUP BY h),
       |ded AS (
       |  SELECT d.doc_id, d.lang, d.text,
       |    list_filter(string_split_regex(d.text, '\\s+'), t -> t <> '') AS toks
       |  FROM docs d SEMI JOIN keep k ON d.h = k.h AND d.doc_id = k.doc_id),
       |m AS (
       |  SELECT doc_id, lang, len(toks) AS n_tokens,
       |    CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS DOUBLE)
       |      / len(toks) AS stop_ratio,
       |    CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE)
       |      / len(text) AS punct_ratio
       |  FROM ded)
       |SELECT doc_id, n_tokens,
       |  ${TextAnalysis.qualitySqlExpr("n_tokens", "stop_ratio", "punct_ratio")} AS quality
       |FROM m
       |WHERE ${TextAnalysis.qualitySqlExpr("n_tokens", "stop_ratio", "punct_ratio")} >= 0.35
       |  AND lang = 'en'
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-doc curation features in TWO corpus scans — the q_doc_signals
    * lesson applied to the gate: per-signal scans don't survive 100 TB,
    * so every ROW-LOCAL signal (quality metrics + composite, the
    * dup-token repetition ratio, the corpus lang column) fuses into ONE
    * projection over a single scan, and only the LM signal keeps a
    * corpus pass of its own — explode, broadcast-join the materialized
    * LM artifact ([[TextAnalysis.lmModel]]), position-ordered mean. The
    * signal VALUES are pinned column-by-column against the standalone
    * operators by CurationSpec (same metric expressions, same rounding,
    * same ln inputs — bit-equal doubles), and PlanGuardSpec bounds the
    * feature plan to two corpus scans. Token-less docs have no LM rows
    * and drop at the doc_id join, as every heuristic gate already
    * drops them. Persisted once per session: the model fit AND the
    * scoring pass both read this frame (the ml.featurized precedent —
    * 8 scalar columns per doc, far smaller than the token explosions
    * that produce it).
    */
  private[graft] def gateFeatures(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrCompute(s, s"curation.gateFeatures:$dir") {
      gateFeaturePlan(s, dir).persist()
    }

  /** The un-persisted feature plan — split out so PlanGuardSpec can
    * assert the two-scan shape on a fresh build (the session-cached
    * frame above collapses to an in-memory leaf once persisted).
    */
  private[graft] def gateFeaturePlan(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      // scan 1: every row-local signal from one projection (fanned out —
      // the snapshot plans it single-task; still one scan, PlanGuard's
      // two-scan bound is about passes, and an Exchange is not a scan)
      val rowLocal = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
        .select($"doc_id", $"lang", $"text", TF.tokens($"text").as("toks"))
        .select(Seq($"doc_id", $"lang",
          // unrounded, like the standalone operator (same integer
          // inputs -> bit-equal double)
          (lit(1.0) -
            size(array_distinct($"toks")).cast("double") / size($"toks"))
            .as("dup_token_ratio")) ++
          TextAnalysis.qualityMetricCols($"toks", $"text"): _*)
        .withColumn("quality",
          TextAnalysis.qualityCol($"n_tokens", $"stop_ratio", $"punct_ratio"))
      // scan 2: the LM signal's per-doc pass over the broadcast artifact
      // (identical algebra to q_unigram_logprob: position-ordered fold,
      // 6-dp round)
      val tok = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
        .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos", "token")))
      val lm = tok.join(broadcast(TextAnalysis.lmModel(s, dir)), "token")
        .groupBy($"doc_id")
        .agg(round(
          aggregate(
            transform(array_sort(collect_list(struct($"pos", $"logp"))),
              x => x("logp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)), 6).as("avg_logprob"))
      rowLocal.join(lm, "doc_id")
  }

  private def featureVec = {
    import org.apache.spark.ml.functions.array_to_vector
    array_to_vector(array(
      col("n_tokens").cast("double"), col("stop_ratio"), col("punct_ratio"),
      col("dup_token_ratio"), col("avg_logprob")))
  }

  /** The fitted gate model plus its decision threshold, once per
    * (session, dir): a deterministic L-BFGS logistic regression over
    * the 5 curation signals with the corpus language flag as the
    * supervision target — the model-based filter real curation runs
    * NEXT TO the heuristics (quality classifiers trained on weak
    * labels). The gate keeps docs scoring ABOVE THE BASE RATE (train
    * prevalence): "more likely kept than the prior" is
    * calibration-robust where a fixed 0.5 silently empties the gate
    * whenever scores hug a sub-0.5 prevalence. 5 dims × corpus rows:
    * fit and prevalence are a few cheap passes at any scale.
    */
  private def gateModel(s: SparkSession, dir: String)
      : (org.apache.spark.ml.classification.LogisticRegressionModel, Double) =
    SessionCache.getOrCompute(s, s"curation.gateModel:$dir") {
      import s.implicits._
      import org.apache.spark.ml.classification.LogisticRegression
      val train = gateFeatures(s, dir).select(
        ($"lang" === "en").cast("double").as("label"),
        featureVec.as("features"))
      val model = new LogisticRegression().setMaxIter(25).fit(train)
      val prevalence = train.agg(avg($"label")).head().getDouble(0)
      (model, BigDecimal(prevalence).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }

  /** The curation pipeline with the MODEL-BASED fourth stage: exact
    * dedup → heuristic quality gate → language gate → fitted-model
    * score gate, composed as one declarative plan (the model transform
    * is a projection, so Catalyst still fuses the gate stack onto the
    * feature joins). Rows-only for the gate (the model fit is not
    * SQL-expressible); CurationSpec pins each fused column against its
    * standalone operator and the kept set against a by-hand
    * recomposition.
    */
  def curationModelGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.ml.functions.vector_to_array
    val docs = Tables.documents(s, dir)
      .select($"doc_id", md5($"text".cast("binary")).as("h"))
    val keep = docs.groupBy($"h").agg(min($"doc_id").as("doc_id"))
    val deduped = docs.join(keep, Seq("h", "doc_id"), "left_semi")
      .select($"doc_id")
    val (model, tau) = gateModel(s, dir)
    val scored = model.transform(
        gateFeatures(s, dir).join(deduped, "doc_id")
          .withColumn("features", featureVec))
      .withColumn("model_score",
        round(element_at(vector_to_array($"probability"), 2), 6))
    scored
      .where($"quality" >= 0.35 && $"lang" === "en" && $"model_score" >= tau)
      .select($"doc_id", $"n_tokens", $"quality", $"dup_token_ratio",
        $"avg_logprob", $"model_score")
      .orderBy($"doc_id")
  }

  /** Distinct-count rollup — exact count(distinct) per event type (the
    * approx_count_distinct/HLL swap-in point at 100 TB).
    */
  def distinctCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    EventOps.events(s, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val distinctCountsSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_curation_pipeline", curationPipeline, Some(curationPipelineSql)),
    GraftQuery("q_curation_funnel", curationFunnel, Some(curationFunnelSql)),
    GraftQuery("q_curation_model_gate", curationModelGate, None,
      singleShot = true),
    GraftQuery("q_distinct_counts", distinctCounts, Some(distinctCountsSql)))
}
