package graft.operators

import graft.{GraftQuery, Tables}
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
    val docs = Tables.documents(s, dir)
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
    GraftQuery("q_distinct_counts", distinctCounts, Some(distinctCountsSql)))
}
