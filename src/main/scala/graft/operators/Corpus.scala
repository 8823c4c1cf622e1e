package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the dedup/similarity families
  * (SURVEY §2.F): near-dup cluster assignment (connected components),
  * benchmark decontamination, deterministic stratified sampling, and the
  * sketch-based distinct-count path.
  */
object Corpus {

  /** Connected components over the MinHash-LSH near-dup pairs
    * (est_jaccard ≥ 0.5): every document in a component gets the
    * component's minimum doc_id as its cluster_id — the step that turns
    * pairwise near-dup evidence into "keep one per cluster" curation.
    *
    * Distributed min-label propagation: each round sends every node's
    * current label to its neighbors and keeps the minimum. Rounds needed
    * = graph diameter (near-dup components are tiny chains in practice;
    * the classic large-star/small-star contraction drops that to
    * O(log n) if a corpus ever produces deep chains). The driver loop
    * only checks a convergence flag — labels never leave the cluster —
    * and localCheckpoint truncates the growing lineage each round.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Dedup.minhashLsh(s, dir)
      .where($"est_jaccard" >= 0.5).select($"id_a", $"id_b")
    val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionByName(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
      .persist()
    var labels = edges.select($"src".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < 20) {
      val msgs = labels.join(edges, $"doc_id" === $"src")
        .select($"dst".as("doc_id"), $"cluster_id")
      val next = labels.unionByName(msgs)
        .groupBy($"doc_id").agg(min($"cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "prev"), "doc_id")
        .where($"cluster_id" =!= $"prev").limit(1).count()
      converged = changed == 0
      labels = next
      round += 1
    }
    edges.unpersist(blocking = false)
    labels.orderBy($"doc_id")
  }

  /** Oracle: transitive closure by recursive CTE, min reachable id per
    * node — the fixpoint the propagation loop converges to.
    */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (${Dedup.minhashLshSql}) m
       |  WHERE est_jaccard >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: corpus documents sharing ≥2 distinct
    * word-3-gram shingles with any "benchmark" document (stand-in set:
    * doc_id < 20 — in production a separate eval-suite table). The
    * benchmark side is tiny by construction, so the shingle join
    * broadcasts; the corpus side streams through map-side.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Dedup.shingles(s, dir)
    val bench = sh.where($"doc_id" < 20)
      .select($"doc_id".as("bench_id"), $"shingle")
    sh.where($"doc_id" >= 20)
      .join(broadcast(bench), "shingle")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where($"n_shared" >= 2)
      .orderBy($"doc_id", $"bench_id")
  }

  val contaminationSql: String =
    s"""WITH sh AS (SELECT * FROM ${Dedup.shinglesSql})
       |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
       |FROM sh c JOIN sh b ON c.shingle = b.shingle
       |WHERE b.doc_id < 20 AND c.doc_id >= 20
       |GROUP BY c.doc_id, b.doc_id
       |HAVING count(*) >= 2
       |ORDER BY c.doc_id, bench_id""".stripMargin

  /** Deterministic stratified sampling (the `sampleBy` surface): per-lang
    * keep-rates (en 10%, others 30%) decided by the high bits of an LCG
    * hash of doc_id — reproducible on any cluster, no RNG state.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", 10).otherwise(30)
    Tables.documents(s, dir)
      .select($"doc_id", $"lang")
      .where(((($"doc_id" * 1103515245L + 12345L) % 2147483648L)
        .divide(65536).cast("long") % 100) < rate)
      .orderBy($"doc_id")
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE ((CAST(doc_id * 1103515245 + 12345 AS BIGINT) % 2147483648) // 65536)
      |  % 100 < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
      |ORDER BY doc_id""".stripMargin

  /** Distinct users per event type, exact vs HLL++ sketch — the swap-in
    * point where exact distinct (a full shuffle of the keys) becomes a
    * mergeable constant-size sketch at 100 TB. Rows-only: DuckDB's
    * approx sketch differs from Spark's HLL++ by construction; the
    * CorpusSpec pins the sketch to <5% relative error instead.
    */
  def distinctApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    EventOps.events(s, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"user_id", 0.02).as("approx_users"))
      .orderBy($"event_type")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    GraftQuery("q_contamination_check", contamination, Some(contaminationSql)),
    GraftQuery("q_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    GraftQuery("q_distinct_approx", distinctApprox, None))
}
