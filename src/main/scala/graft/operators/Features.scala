package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering operators (SURVEY §2.C) — the distributed
  * re-expression of the reference's TfidfVectorizer / chi² / Pearson /
  * top-feature analyses (reference: src/NLP_functions.py:390-635).
  *
  * Numeric discipline: every statistic is derived from *exact integer
  * aggregates* (term counts, doc counts, label sums) with scalar IEEE
  * arithmetic applied only at the end, so results are independent of
  * partitioning/accumulation order and bit-match the DuckDB oracle.
  */
object Features {

  /** Exploded (doc_id, token) pairs. */
  private def docTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", explode(TF.tokens($"text")).as("token"))
  }

  private val docTokensSql =
    s"""(SELECT doc_id, ${TF.tokensSqlSelect("text")} AS token FROM documents)
       | t WHERE token <> ''""".stripMargin.replace("\n", "")

  /** Per-doc term frequency — one hash aggregation with map-side combine. */
  def tf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docTokens(s, dir)
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("tf"))
      .orderBy($"doc_id", $"token")
  }

  val tfSql: String =
    s"""SELECT doc_id, token, count(*) AS tf FROM $docTokensSql
       |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin

  /** Smoothed TF-IDF, sklearn semantics: idf = ln((1+n)/(1+df)) + 1
    * (TfidfVectorizer smooth_idf; L2 doc-normalization lives in the MLlib
    * pipeline path, not here, to keep values order-independent).
    * Two aggregations + one broadcast-able join on the tiny df table.
    */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tfidfFrame(s, dir)
      .select($"doc_id", $"token", $"tf", $"w".as("tfidf"))
      .orderBy($"doc_id", $"token")
  }

  /** The single source of the smoothed TF-IDF weight — (doc_id, token,
    * tf, w) unsorted — consumed by the registered q_tfidf and the
    * q_doc_knn retrieval weights, so the formula cannot diverge
    * between them.
    */
  private def tfidfFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dt = docTokens(s, dir)
    val tfDf = dt.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfDf = tfDf.groupBy($"token").agg(count(lit(1)).as("df"))
    // doc count as a broadcast 1-row aggregate — no eager driver job
    val nDf = Tables.documents(s, dir).agg(count(lit(1)).cast("double").as("n"))
    tfDf.join(broadcast(dfDf), "token")
      .crossJoin(broadcast(nDf))
      .select($"doc_id", $"token", $"tf", $"df",
        round($"tf" * (log((lit(1.0) + $"n") / (lit(1.0) + $"df")) + lit(1.0)), 6)
          .as("w"))
  }

  val tfidfSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM $docTokensSql GROUP BY doc_id, token),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT count(*) AS n FROM documents)
       |SELECT tf.doc_id, tf.token, tf.tf,
       |  round(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0), 6) AS tfidf
       |FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
       |ORDER BY tf.doc_id, tf.token""".stripMargin

  /** Label used across feature scoring / classification: y = (lang='en'),
    * the binary-diagnosis analogue of the reference's RA label.
    */
  def labeled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", ($"lang" === "en").cast("int").as("y"), $"text")
  }

  val labelSqlExpr = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"

  /** chi² token-vs-label scores over raw term counts (reference:
    * plotFeatureChiSquared, src/NLP_functions.py:390 — computed there over
    * sklearn's observed-frequency contingency; here over exact counts so
    * the statistic is reproducible at any scale).
    */
  def chi2Features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = labeled(s, dir)
    val dt = docs.select($"doc_id", $"y", explode(TF.tokens($"text")).as("token"))
    val perTok = dt.groupBy($"token")
      .agg(count(lit(1)).as("total_tf"), sum($"y" * lit(1L)).as("obs1"))
    val totals = docs.agg(
      count(lit(1)).as("n"), sum($"y").as("n1")).select($"n", $"n1")
    perTok.crossJoin(broadcast(totals))
      .select($"token",
        round(chi2Col($"total_tf", $"obs1", $"n", $"n1"), 6).as("chi2"))
      .orderBy($"token")
  }

  /** chi2 = Σ_c (obs_c − exp_c)²/exp_c with exp_c = total_tf · n_c/n.
    * Squares by multiplication — JVM Math.pow and libm pow may differ in
    * the last ulp; x*x is IEEE-exact in both engines.
    */
  private def chi2Col(totalTf: Column, obs1: Column, n: Column, n1: Column): Column = {
    val exp1 = totalTf * (n1.cast("double") / n.cast("double"))
    val exp0 = totalTf * ((n - n1).cast("double") / n.cast("double"))
    val obs0 = totalTf - obs1
    (obs1 - exp1) * (obs1 - exp1) / exp1 + (obs0 - exp0) * (obs0 - exp0) / exp0
  }

  val chi2FeaturesSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, $labelSqlExpr AS y,
       |    ${TF.tokensSqlSelect("text")} AS token FROM documents),
       |per_tok AS (
       |  SELECT token, count(*) AS total_tf, sum(y) AS obs1
       |  FROM dt WHERE token <> '' GROUP BY token),
       |tot AS (SELECT count(*) AS n, sum($labelSqlExpr) AS n1 FROM documents)
       |SELECT token,
       |  round(
       |    (obs1 - total_tf * (CAST(n1 AS DOUBLE) / n))
       |      * (obs1 - total_tf * (CAST(n1 AS DOUBLE) / n))
       |      / (total_tf * (CAST(n1 AS DOUBLE) / n))
       |    + ((total_tf - obs1) - total_tf * (CAST(n - n1 AS DOUBLE) / n))
       |      * ((total_tf - obs1) - total_tf * (CAST(n - n1 AS DOUBLE) / n))
       |      / (total_tf * (CAST(n - n1 AS DOUBLE) / n)), 6) AS chi2
       |FROM per_tok CROSS JOIN tot
       |ORDER BY token""".stripMargin

  /** Pearson corr(per-doc tf, label) per token, derived entirely from
    * integer sums (Σx over all docs = token total, zero-tf docs included
    * implicitly) — the reference's FeatureCorrelation
    * (src/NLP_functions.py:428) without materializing a dense matrix.
    */
  def featureCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = labeled(s, dir)
    val dt = docs.select($"doc_id", $"y", explode(TF.tokens($"text")).as("token"))
    val perDoc = dt.groupBy($"doc_id", $"y", $"token").agg(count(lit(1)).as("tf"))
    val perTok = perDoc.groupBy($"token").agg(
      sum($"tf").as("sx"), sum($"tf" * $"tf").as("sxx"), sum($"tf" * $"y").as("sxy"))
    val totals = docs.agg(count(lit(1)).as("n"), sum($"y").as("sy"))
    val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val den = sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                   ($"n" * $"sy" - $"sy" * $"sy").cast("double"))
    perTok.crossJoin(broadcast(totals))
      .select($"token",
        round(when(den =!= 0.0, num / den), 6).as("corr"))
      .where($"corr".isNotNull)
      .orderBy($"token")
  }

  val featureCorrSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, $labelSqlExpr AS y,
       |    ${TF.tokensSqlSelect("text")} AS token FROM documents),
       |per_doc AS (
       |  SELECT doc_id, y, token, count(*) AS tf
       |  FROM dt WHERE token <> '' GROUP BY doc_id, y, token),
       |per_tok AS (
       |  SELECT token, sum(tf) AS sx, sum(tf * tf) AS sxx, sum(tf * y) AS sxy
       |  FROM per_doc GROUP BY token),
       |tot AS (SELECT count(*) AS n, sum($labelSqlExpr) AS sy FROM documents)
       |SELECT token, corr FROM (
       |  SELECT token,
       |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
       |      nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |        * CAST(n * sy - sy * sy AS DOUBLE)), 0), 6) AS corr
       |  FROM per_tok CROSS JOIN tot) z
       |WHERE corr IS NOT NULL
       |ORDER BY token""".stripMargin

  /** Top-50 tokens by frequency, stopwords excluded (reference:
    * plotSampleDistribution, src/NLP_functions.py:571).
    */
  def topFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stopArr = TF.englishStopwords
    docTokens(s, dir)
      .where(!$"token".isin(stopArr: _*))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc)
      .limit(50)
  }

  val topFeaturesSql: String = {
    val lst = TF.englishStopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""SELECT token, count(*) AS cnt FROM $docTokensSql
       |  AND token NOT IN $lst
       |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 50""".stripMargin
  }

  /** Lexical dispersion points (token position within doc) for the top-20
    * tokens (reference: plotLexicalDispersion, src/NLP_functions.py:523).
    */
  def lexicalDispersion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top20 = docTokens(s, dir)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc).limit(20)
      .select($"token")
    Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos0", "token")))
      .select($"doc_id", ($"pos0" + 1).as("pos"), $"token")
      .join(broadcast(top20), "token")
      .select($"token", $"doc_id", $"pos")
      .orderBy($"token", $"doc_id", $"pos")
  }

  val lexicalDispersionSql: String =
    s"""WITH top20 AS (
       |  SELECT token FROM $docTokensSql
       |  GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 20),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
       |  FROM documents),
       |pts AS (
       |  SELECT doc_id, unnest(generate_series(1, len(l))) AS pos, l
       |  FROM toks)
       |SELECT l[pos] AS token, doc_id, pos FROM pts
       |WHERE l[pos] IN (SELECT token FROM top20)
       |ORDER BY token, doc_id, pos""".stripMargin

  /** Train/test token-distribution compare over the deterministic
    * doc_id-parity split, for the top-50 train tokens (reference:
    * plotTrainTestDistribution, src/NLP_functions.py:596).
    */
  def trainTestDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dt = docTokens(s, dir)
      .withColumn("is_train", (col("doc_id") % 2 === 0).cast("int"))
    dt.groupBy($"token")
      .agg(
        sum($"is_train").as("train_cnt"),
        sum(lit(1) - $"is_train").as("test_cnt"))
      .orderBy($"train_cnt".desc, $"token".asc)
      .limit(50)
  }

  val trainTestDistSql: String =
    s"""SELECT token,
       |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_cnt,
       |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS test_cnt
       |FROM $docTokensSql
       |GROUP BY token ORDER BY train_cnt DESC, token ASC LIMIT 50""".stripMargin

  /** Sparse "more-like-this" retrieval: top-5 cosine-nearest documents
    * per query doc (doc_id < 50 — wide enough that the capped
    * vocabulary still reaches several query docs on the degenerate
    * test corpus; queries broadcast, so the panel width is not a scale
    * lever) in smoothed TF-IDF space — the lexical
    * neighbor search next to q_bm25_search's term retrieval and the
    * dense q_ann_* family (near-duplicate triage, related-document
    * panels, label propagation seeds). Scale shape: the classic
    * inverted-index dot product — the bounded query-side weight frame
    * broadcasts, one equi-join on token generates only posting-list
    * candidates (never all-pairs), and per-pair dots / per-doc norms
    * are token-ORDERED FloatFold sums of the 6-dp-rounded weights, so
    * both engines accumulate identically; the top-5 window partitions
    * by query. Candidate volume is Σ_t df(t) over the query's terms,
    * so hot postings are CAPPED (the q_winnow_pairs
    * WinnowMaxPostings discipline): tokens with df > [[DocKnnMaxDf]]
    * are dropped from the weight frame — on BOTH the dot and norm
    * sides, so cos stays a true cosine in the capped space, and in the
    * oracle SQL, so the gate checks the capped semantics. A df-capped
    * token's idf is within ln(2) of the floor anyway (df ≥ 65 of n
    * docs ⇒ near-stopword), so the ranking it buys is noise while its
    * posting list is the corpus-sized shuffle the cap exists to
    * prevent. PlanGuardSpec pins the cap's presence in the plan. On the
    * synthetic test corpus (31-token vocabulary, ~80% df on all but
    * one token) the cap keeps only the one discriminative term — the
    * intended behavior, not an accident: neighbors ranked by shared
    * stopwords are noise, and a degenerate corpus with no rare terms
    * has no sparse-retrieval signal to rank by.
    */
  val DocKnnMaxDf = 64

  def docKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.FloatFold.orderedSum
    import org.apache.spark.sql.expressions.Window
    val w = tfidfWeights(s, dir)
    val norms = w.groupBy($"doc_id")
      .agg(sqrt(orderedSum($"token", $"w" * $"w")).as("nrm"))
    val q = w.where($"doc_id" < 50)
      .select($"doc_id".as("qid"), $"token", $"w".as("wq"))
    val dots = q.join(
        w.select($"doc_id".as("did"), $"token", $"w".as("wd")), "token")
      .where($"did" =!= $"qid")
      .groupBy($"qid", $"did")
      .agg(orderedSum($"token", $"wq" * $"wd").as("dot"))
    val scored = dots
      .join(norms.select($"doc_id".as("qid"), $"nrm".as("nq")), "qid")
      .join(norms.select($"doc_id".as("did"), $"nrm".as("nd")), "did")
      .select($"qid", $"did", round($"dot" / ($"nq" * $"nd"), 6).as("cos"))
    val rw = Window.partitionBy($"qid").orderBy($"cos".desc, $"did")
    scored.withColumn("rank", row_number().over(rw))
      .where($"rank" <= 5)
      .select($"qid".as("query_id"), $"did".as("doc_id"), $"cos", $"rank")
      .orderBy($"query_id", $"rank")
  }

  /** The rounded TF-IDF weight frame (doc_id, token, w) with the
    * hot-posting cap applied — the shared [[tfidfFrame]] restricted to
    * tokens with df ≤ [[DocKnnMaxDf]], minus the tf column. The filter
    * lands on the broadcast df side of the weight join, so capped
    * tokens never reach the retrieval equi-join at all.
    */
  private def tfidfWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tfidfFrame(s, dir).where($"df" <= DocKnnMaxDf)
      .select($"doc_id", $"token", $"w")
  }

  val docKnnSql: String = {
    def fold(term: String) =
      s"list_reduce(list_prepend(0.0, list($term ORDER BY token)), (a, b) -> a + b)"
    s"""WITH tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM $docTokensSql GROUP BY doc_id, token),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT count(*) AS n FROM documents),
       |w AS (
       |  SELECT tf.doc_id, tf.token,
       |    round(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0), 6) AS w
       |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
       |  WHERE df.df <= $DocKnnMaxDf),
       |norms AS (
       |  SELECT doc_id, sqrt(${fold("w * w")}) AS nrm FROM w GROUP BY doc_id),
       |dots AS (
       |  SELECT q.doc_id AS qid, d.doc_id AS did,
       |    list_reduce(list_prepend(0.0, list(q.w * d.w ORDER BY q.token)),
       |      (a, b) -> a + b) AS dot
       |  FROM w q JOIN w d ON q.token = d.token AND d.doc_id <> q.doc_id
       |  WHERE q.doc_id < 50
       |  GROUP BY q.doc_id, d.doc_id),
       |scored AS (
       |  SELECT qid, did, round(dot / (nq.nrm * nd.nrm), 6) AS cos
       |  FROM dots
       |  JOIN norms nq ON nq.doc_id = qid
       |  JOIN norms nd ON nd.doc_id = did),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, did) AS INT) AS rank
       |  FROM scored)
       |SELECT qid AS query_id, did AS doc_id, cos, rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_tf", tf, Some(tfSql)),
    GraftQuery("q_tfidf", tfidf, Some(tfidfSql)),
    GraftQuery("q_chi2_features", chi2Features, Some(chi2FeaturesSql)),
    GraftQuery("q_feature_corr", featureCorr, Some(featureCorrSql)),
    GraftQuery("q_top_features", topFeatures, Some(topFeaturesSql)),
    GraftQuery("q_lexical_dispersion", lexicalDispersion, Some(lexicalDispersionSql)),
    GraftQuery("q_train_test_dist", trainTestDist, Some(trainTestDistSql)),
    GraftQuery("q_doc_knn", docKnn, Some(docKnnSql)))
}
