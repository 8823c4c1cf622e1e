package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental near-dup — the shape a 100 TB pipeline actually
  * runs daily: the corpus's MinHash signatures persist ONCE as a table
  * bucketed on the LSH band key, and each day's delta batch joins
  * against it shuffling ONLY the delta. The corpus-sized side streams
  * bucket-aligned files with no Exchange (the BucketingSpec co-location
  * property applied to the signature store); re-signing or re-shuffling
  * the historical corpus per batch — the cost that makes naive daily
  * dedup infeasible at scale — never happens.
  *
  * Store rows carry the full 16-hash signature next to each band key,
  * so a band collision verifies minhash agreement from the joined row
  * itself — no second lookup join against the store.
  */
object IncrementalDedup {

  /** Bucket count of the signature store — sized to the cluster (a
    * production store uses O(total cores); the join requires only that
    * readers agree with the written spec, which saveAsTable records.
    */
  val StoreBuckets = 8

  /** Drop `table` AND clear its default managed location. The location
    * sweep matters only under the in-memory catalog (tests, one-shot
    * drivers): a session cycled in the same JVM forgets the table but
    * its warehouse directory survives, and the next CREATE fails with
    * location-already-exists. A production metastore persists the
    * entry, so DROP IF EXISTS alone would cover it there.
    */
  private[graft] def clearTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Materialize (or replace) the signature store for a corpus
    * snapshot: banded signature rows, bucketed AND sorted on the
    * (band, band_key) join key at write time — the pre-shuffle that
    * every future delta join reuses for free.
    */
  def writeStore(docs: DataFrame, table: String): Unit = {
    clearTable(docs.sparkSession, table)
    Dedup.signatureBands(docs)
      .write.bucketBy(StoreBuckets, "band", "band_key")
      .sortBy("band", "band_key")
      .mode("overwrite").saveAsTable(table)
  }

  /** Absorb a delta batch into the store after its dedup decision: the
    * delta's signature rows APPEND to the bucketed table (insertInto
    * honors the table's recorded bucket spec, so the new files land
    * bucket-aligned and tomorrow's delta join stays exchange-free on
    * the store side) — the write is sized to the delta, the historical
    * files are untouched.
    */
  def absorbDelta(s: SparkSession, delta: DataFrame, table: String): Unit =
    absorbDeltaBands(s, Dedup.signatureBands(delta), table)

  /** [[absorbDelta]] for a delta whose banded signatures are already
    * computed (the streaming maintenance loop signs each micro-batch
    * ONCE and feeds the same frame to the match join, the label update
    * and this absorb).
    */
  private[graft] def absorbDeltaBands(s: SparkSession, bands: DataFrame,
      table: String): Unit =
    bands
      .select(s.table(table).columns.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").insertInto(table)

  /** Periodic bucket-aligned compaction of a signature (or label)
    * store: each [[absorbDelta]] appends one delta-sized file-set per
    * bucket, so after N days a bucket holds N+1 files and the daily
    * join's scan cost creeps up with file count, not data size.
    * Compaction rewrites each bucket's files into one — WITHOUT a
    * shuffle: the bucketed scan is forced (one partition per bucket,
    * no Exchange), and writing with the identical bucket spec means
    * every task holds exactly one bucket's rows and emits exactly one
    * file. The rewrite lands in a shadow table that swaps in via a
    * metastore rename, so a reader never sees a half-compacted store.
    * Content, bucketing, and the exchange-free delta join are all
    * preserved (IncrementalDedupSpec proves each).
    */
  def compactStore(s: SparkSession, table: String): Unit = {
    val tmp = table + "__compacting"
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      sys.error(s"$table is not a bucketed store"))
    val scanConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = s.conf.get(scanConf)
    try {
      s.conf.set(scanConf, "false") // force the one-partition-per-bucket read
      s.table(table).write
        .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
          spec.bucketColumnNames.tail: _*)
        .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
        .mode("overwrite").saveAsTable(tmp)
    } finally s.conf.set(scanConf, prev)
    swapInStagedTable(s, table, tmp)
  }

  /** Crash-safe staged-table swap shared by every store-maintenance
    * loop (compaction here, the streaming HLL sketch store): the old
    * table renames ASIDE first, then staging renames IN, then the old
    * copy drops — so a crash at ANY point leaves a complete table under
    * a predictable name. The recovery contract is implemented HERE, not
    * left to the operator: if `table` is missing but `table__old`
    * exists (the previous run crashed in the aside→in window, so the
    * aside copy is the SOLE survivor), the helper renames it back
    * before doing anything destructive — the maintenance loop that
    * re-runs after the crash then swaps its freshly rebuilt staging in
    * normally. A leftover `table__old` NEXT TO a live `table` (crash
    * after the in-rename, before the final drop) just re-drops. The
    * previous DROP→RENAME order had a window where a crash left NO
    * table at the canonical name and readers failed with
    * table-not-found.
    */
  def swapInStagedTable(s: SparkSession, table: String, staging: String): Unit = {
    val old = table + "__old"
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(old))
      s.sql(s"ALTER TABLE $old RENAME TO $table")
    s.sql(s"DROP TABLE IF EXISTS $old")
    s.sql(s"ALTER TABLE $table RENAME TO $old")
    s.sql(s"ALTER TABLE $staging RENAME TO $table")
    s.sql(s"DROP TABLE $old")
  }

  /** Candidate near-dup matches of a DELTA batch against the store:
    * signature the delta (its own cost only), equi-join on
    * (band, band_key) — the store side reads bucket-aligned, the delta
    * side shuffles into the store's bucketing — dedup colliding pairs,
    * and report the minhash-agreement estimate from the two signatures
    * the matched row already carries. Append the delta's own
    * [[Dedup.signatureBands]] rows to the store table afterwards to
    * absorb the batch ([[absorbDelta]]).
    */
  /** LSH near-dup pairs WITHIN one docs frame (the delta's internal
    * pairs — [[deltaAgainstStore]] covers delta-vs-store): band-bucket
    * self-join on the frame's own signature rows, minhash agreement
    * from the sig arrays the matched rows already carry. Same estimate
    * algebra as the batch [[Dedup.minhashLsh]].
    */
  private[graft] def pairsWithin(delta: DataFrame): DataFrame =
    pairsWithinBands(Dedup.signatureBands(delta))

  /** [[pairsWithin]] over an ALREADY-BANDED signature frame — the
    * signature kernel (tokenize + shingle + 16 minhashes) is the
    * family's expensive row-local stage, so callers that already hold
    * banded rows (the bucketed store table just written, a micro-batch
    * signed once per loop) must not pay it again. Reading the store
    * TABLE here also makes the self-join exchange-free on both sides:
    * the table is bucketed on the join key (band, band_key), so neither
    * input shuffles (guide §2.4 — bucketed tables persist a partitioning
    * so repeated joins on the bucket key skip the shuffle entirely).
    */
  private[graft] def pairsWithinBands(b: DataFrame): DataFrame = {
    import b.sparkSession.implicits._
    val a = b.select($"band", $"band_key", $"doc_id".as("id_a"), $"sig".as("siga"))
    val c = b.select($"band", $"band_key", $"doc_id".as("id_b"), $"sig".as("sigb"))
    a.join(c, Seq("band", "band_key"))
      .where($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")
      .select($"id_a", $"id_b",
        (aggregate(zip_with($"siga", $"sigb", (x, y) => (x === y).cast("int")),
          lit(0), (acc, x) => acc + x).cast("double") / Dedup.NumHashes)
          .as("est_jaccard"))
  }

  /** Materialize (or replace) the cluster-label store — (doc_id,
    * cluster_id) rows bucketed AND sorted on cluster_id, so the
    * incremental relabel joins of [[updateClusters]] read the
    * corpus-sized label table bucket-aligned with no Exchange (the
    * signature-store property applied to labels).
    */
  def writeLabels(labels: DataFrame, table: String): Unit = {
    clearTable(labels.sparkSession, table)
    labels.write.bucketBy(StoreBuckets, "cluster_id")
      .sortBy("cluster_id")
      .mode("overwrite").saveAsTable(table)
  }

  /** INCREMENTAL cluster maintenance — new delta pairs update stored
    * labels without re-running the global contraction:
    *
    *  1. the delta's edges are gathered (delta-internal pairs + the
    *     delta-vs-store matches from the bucketed signature store), and
    *     every store endpoint is REPLACED BY ITS STORED CLUSTER LABEL —
    *     existing clusters enter the graph as single supernodes;
    *  2. star contraction runs over THIS quotient subgraph only —
    *     delta-sized plus one node per touched cluster, never the
    *     corpus;
    *  3. stored rows relabel by a cluster_id equi-join against the
    *     contraction output (bucket-aligned on the label store, no
    *     corpus shuffle); untouched clusters pass through byte-identical.
    *
    * Labels stay the component-minimum doc_id: a stored cluster's label
    * IS its component minimum, so contracting supernodes yields exactly
    * the merged component's global minimum — IncrementalDedupSpec
    * proves label equality with the from-scratch contraction on the
    * merged corpus.
    */
  def updateClusters(s: SparkSession, delta: DataFrame, sigTable: String,
      storedLabels: DataFrame, tau: Double = 0.5): DataFrame =
    // sign the delta ONCE: the store match and the delta-internal pairs
    // both consume the banded rows, and the signature kernel is the
    // expensive stage — localCheckpoint materializes the delta-sized
    // frame so the two consumers don't each recompute it (guide §1.2:
    // don't compute things twice before tuning anything else)
    updateClustersBands(s, Dedup.signatureBands(delta).localCheckpoint(),
      sigTable, storedLabels, tau)

  /** [[updateClusters]] over pre-signed delta bands — the streaming
    * maintenance loop shares one signed frame across update + absorb.
    */
  private[graft] def updateClustersBands(s: SparkSession, deltaBands: DataFrame,
      sigTable: String, storedLabels: DataFrame, tau: Double = 0.5): DataFrame = {
    import s.implicits._
    val ds = deltaBandsAgainstStore(s, deltaBands, sigTable)
      .where($"est_jaccard" >= tau).select($"delta_id", $"store_id")
    val dd = pairsWithinBands(deltaBands)
      .where($"est_jaccard" >= tau).select($"id_a", $"id_b")
    // store endpoints → their cluster supernode (unclustered store docs
    // stand for themselves)
    val st = storedLabels.select($"doc_id".as("store_id"),
      $"cluster_id".as("store_rep"))
    val edges = dd.unionByName(
      ds.join(st, Seq("store_id"), "left")
        .select($"delta_id".as("id_a"),
          coalesce($"store_rep", $"store_id").as("id_b")))
    // contraction over the delta-touched quotient graph only
    val sub = Corpus.starContract(s, edges)
    val subReps = sub.select($"doc_id".as("cluster_id"),
      $"cluster_id".as("new_cluster"))
    val relabeled = storedLabels.join(subReps, "cluster_id")
      .select($"doc_id", $"new_cluster".as("cluster_id"))
    val untouched = storedLabels
      .join(subReps.select($"cluster_id"), Seq("cluster_id"), "left_anti")
      .select($"doc_id", $"cluster_id")
    // subgraph nodes that are not stored cluster reps: delta docs and
    // previously-unclustered store docs get fresh rows
    val subNew = sub.join(
        storedLabels.select($"cluster_id".as("rid")).distinct(),
        $"doc_id" === $"rid", "left_anti")
      .select($"doc_id", $"cluster_id")
    untouched.unionByName(relabeled).unionByName(subNew)
  }

  def deltaAgainstStore(s: SparkSession, delta: DataFrame, table: String): DataFrame =
    deltaBandsAgainstStore(s, Dedup.signatureBands(delta), table)

  /** [[deltaAgainstStore]] over pre-signed delta bands (sign-once
    * callers: updateClusters, the streaming loop).
    */
  private[graft] def deltaBandsAgainstStore(s: SparkSession, bands: DataFrame,
      table: String): DataFrame = {
    import s.implicits._
    val d = bands
      .select($"band", $"band_key", $"doc_id".as("delta_id"), $"sig".as("dsig"))
    val st = s.table(table)
      .select($"band", $"band_key", $"doc_id".as("store_id"), $"sig".as("ssig"))
    d.join(st, Seq("band", "band_key"))
      .where($"delta_id" =!= $"store_id")
      .select($"delta_id", $"store_id", $"dsig", $"ssig")
      .dropDuplicates("delta_id", "store_id")
      .select($"delta_id", $"store_id",
        (aggregate(zip_with($"dsig", $"ssig", (a, b) => (a === b).cast("int")),
          lit(0), (acc, x) => acc + x).cast("double") / Dedup.NumHashes)
          .as("est_jaccard"))
      .orderBy($"delta_id", $"store_id")
  }

  /** Winnowing postings store — the substring-overlap screen's daily
    * loop, same posture as the signature store: distinct (fp, doc_id)
    * postings bucketed AND sorted on fp, so every future delta screen
    * reads the historical side bucket-aligned with no Exchange.
    * Corpus-hot fingerprints (boilerplate appearing in more than
    * [[TextAnalysis.WinnowMaxPostings]] docs in the snapshot) are
    * dropped at build time — the q_winnow_pairs cap applied to the
    * index; absorbs append raw delta postings, and the periodic
    * [[compactStore]] rebuild is where a deployment re-applies the cap
    * over accumulated history.
    */
  def writeWinnowStore(docs: DataFrame, table: String): Unit = {
    import docs.sparkSession.implicits._
    clearTable(docs.sparkSession, table)
    val p = TextAnalysis.winnowPostingsOf(docs)
    val rare = p.groupBy($"fp").agg(count(lit(1)).as("df"))
      .where($"df" <= TextAnalysis.WinnowMaxPostings).select($"fp")
    p.join(rare, "fp")
      .select($"fp", $"doc_id")
      .write.bucketBy(StoreBuckets, "fp").sortBy("fp")
      .mode("overwrite").saveAsTable(table)
  }

  /** Absorb a delta's winnow postings — append-only, bucket-aligned
    * (the [[absorbDelta]] contract applied to the postings table).
    */
  def absorbWinnowDelta(s: SparkSession, delta: DataFrame, table: String): Unit =
    TextAnalysis.winnowPostingsOf(delta)
      .select(s.table(table).columns.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").insertInto(table)

  /** Substring-overlap candidates of a delta batch against the store:
    * winnow the delta row-locally (its own cost only), equi-join the
    * postings table on fp — store side bucket-aligned, delta side
    * shuffles into the store's bucketing — and keep delta-vs-store doc
    * pairs sharing ≥ 2 fingerprints (the q_winnow_pairs gate).
    */
  def winnowDeltaAgainstStore(s: SparkSession, delta: DataFrame,
      table: String): DataFrame = {
    import s.implicits._
    val d = TextAnalysis.winnowPostingsOf(delta)
      .select($"fp", $"doc_id".as("delta_id"))
    val st = s.table(table).select($"fp", $"doc_id".as("store_id"))
    d.join(st, "fp")
      .where($"delta_id" =!= $"store_id")
      .groupBy($"delta_id", $"store_id")
      .agg(count(lit(1)).as("n_shared"))
      .where($"n_shared" >= 2)
      .orderBy($"delta_id", $"store_id")
  }

  /** The deterministic corpus split the REGISTERED daily-loop queries
    * run on: docs with doc_id ≡ 3 (mod 4) play today's delta batch, the
    * rest is yesterday's corpus. Both engines compute the split from
    * doc_id alone, so the DuckDB oracle reproduces it exactly.
    */
  private def splitMod4(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    (docs.where($"doc_id" % 4 =!= 3), docs.where($"doc_id" % 4 === 3))
  }

  val SigTable = "q_inc_sig_store"
  val LabelTable = "q_inc_label_store"

  /** REGISTERED daily delta-vs-store near-dup screen: build the bucketed
    * signature store from the store half ([[writeStore]] — at a real
    * deployment this is yesterday's persisted table, rebuilt here so the
    * query is self-contained and idempotent), then join the delta half
    * against it ([[deltaAgainstStore]] — store side reads bucket-aligned
    * with no Exchange, only the delta shuffles; IncrementalDedupSpec
    * pins the plan shape). The ORACLE is the batch MinHash-LSH pair SQL
    * over the FULL corpus restricted to pairs spanning the split — the
    * equality IncrementalDedupSpec proves, promoted into the driver's
    * hash gate (the q_window_topk_heap convention: an incremental plan
    * checked against its batch twin's SQL).
    */
  def incrementalDelta(s: SparkSession, dir: String): DataFrame = {
    val (store, delta) = splitMod4(s, dir)
    writeStore(store, SigTable)
    deltaAgainstStore(s, delta, SigTable)
  }

  val incrementalDeltaSql: String =
    s"""WITH ${Dedup.minhashCtesSql}
       |SELECT CASE WHEN id_a % 4 = 3 THEN id_a ELSE id_b END AS delta_id,
       |  CASE WHEN id_a % 4 = 3 THEN id_b ELSE id_a END AS store_id,
       |  est_jaccard
       |FROM est
       |WHERE (id_a % 4 = 3) <> (id_b % 4 = 3)
       |ORDER BY delta_id, store_id""".stripMargin

  /** REGISTERED incremental cluster maintenance: yesterday's labels are
    * the star contraction over the store half's own pairs, persisted to
    * the bucketed label store ([[writeLabels]]); the delta batch then
    * updates them through [[updateClusters]] — contraction over the
    * delta-touched quotient subgraph only, relabel via the bucket-aligned
    * cluster_id equi-join. The ORACLE is the from-scratch recursive-CTE
    * cluster SQL over the full merged corpus (Corpus.dedupClustersSql,
    * shared verbatim with q_dedup_clusters): incremental maintenance is
    * only correct if it lands on exactly the batch fixpoint, so the two
    * queries sharing one oracle IS the statement being checked.
    */
  def incrementalClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (store, delta) = splitMod4(s, dir)
    writeStore(store, SigTable)
    // yesterday's own pairs read the banded rows BACK from the store
    // table just written: the signature kernel ran once in writeStore,
    // and the (band, band_key) self-join is exchange-free on both sides
    // (bucketed on the join key)
    val storedLabels = Corpus.starContract(s,
      pairsWithinBands(s.table(SigTable))
        .where($"est_jaccard" >= 0.5).select($"id_a", $"id_b"))
    writeLabels(storedLabels, LabelTable)
    updateClusters(s, delta, SigTable, s.table(LabelTable))
      .orderBy($"doc_id")
  }

  val WinnowTable = "q_inc_winnow_store"

  /** REGISTERED daily winnow screen: build the bucketed postings store
    * from the store half (hot fingerprints capped at build —
    * [[writeWinnowStore]]), screen the delta half against it
    * ([[winnowDeltaAgainstStore]]). The ORACLE mirrors the INCREMENTAL
    * cap semantics declaratively — store-half postings capped at
    * store-half df, delta postings uncapped, ≥2-shared gate — so the
    * hash check is robust to a corpus where a fingerprint's full-corpus
    * df crosses the cap while its store-half df does not (the batch
    * q_winnow_pairs equivalence across the split is the separate,
    * corpus-conditional statement IncrementalDedupSpec proves).
    */
  def incrementalWinnow(s: SparkSession, dir: String): DataFrame = {
    val (store, delta) = splitMod4(s, dir)
    writeWinnowStore(store, WinnowTable)
    winnowDeltaAgainstStore(s, delta, WinnowTable)
  }

  val incrementalWinnowSql: String =
    s"""WITH ${TextAnalysis.winnowPostingsCtesSql},
       |sp AS (SELECT doc_id, fp FROM postings WHERE doc_id % 4 <> 3),
       |keep AS (
       |  SELECT fp FROM sp GROUP BY fp
       |  HAVING count(*) <= ${TextAnalysis.WinnowMaxPostings}),
       |st AS (SELECT doc_id, fp FROM sp JOIN keep USING (fp)),
       |d AS (SELECT doc_id, fp FROM postings WHERE doc_id % 4 = 3)
       |SELECT d.doc_id AS delta_id, st.doc_id AS store_id,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM d JOIN st USING (fp)
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY delta_id, store_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_incremental_delta", incrementalDelta, Some(incrementalDeltaSql)),
    GraftQuery("q_incremental_clusters", incrementalClusters,
      Some(Corpus.dedupClustersSql)),
    GraftQuery("q_incremental_winnow", incrementalWinnow,
      Some(incrementalWinnowSql)))
}
