package graft.streaming

import graft.{GraftQuery, Tables}
import graft.operators.{Corpus, EventOps}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** REGISTERED streaming queries (SURVEY §2.H promoted into the oracle
  * gate): each drives the REAL Structured Streaming operator from
  * [[EventsStream]] through an in-process `MemoryStream` feed split
  * into time-ordered micro-batches, then returns the sink table for
  * the driver's DuckDB compare — the oracle is the BATCH plan's SQL,
  * so the gate hash-checks the stream/batch equivalence the
  * StreamingSpec proves (the IncrementalDedup promotion convention:
  * q_incremental_* :: batch LSH SQL as q_stream_* :: batch event SQL).
  *
  * The MemoryStream + collect feed is the HARNESS, not the operator:
  * it stands in for `readStream.format("kafka"|"parquet")`, which has
  * the identical downstream topology (watermark → stateful operator →
  * sink). Everything the driver grades — watermark semantics, keyed
  * state, exact micro-unit arithmetic, first-arrival dedup — executes
  * in the streaming engine itself.
  */
object StreamQueries {

  import EventsStream.Event

  /** Shuffle-partition override for the stream DRIVES: a stateful
    * streaming query materializes one state store per shuffle partition
    * in EVERY micro-batch, so the per-batch fixed cost scales with the
    * partition count while sf0.1 micro-batch volumes (thousands of
    * rows) need only a few. State-store count is a property of the
    * CLUSTER a production stream runs on, not of the corpus — the
    * batch engine keeps its 32; only the stream drives narrow. Hash
    * partitioning by key means the override cannot change results,
    * only where state lives. Default 4, picked by the round-18
    * measured sweep over {4, 8, 32} (SURVEY §8j): q_stream_click_attrib
    * 25.7 → 5.6 s (two sources ⇒ two state stores per partition per
    * micro-batch, so it pays the per-partition fixed cost twice),
    * q_stream_dedup_exact 6.5 → 2.7 s, q_stream_neardup 3.7 → 2.2 s,
    * with no drive slower at 4 than at 8. Env-tunable
    * (SPARK_GRAFT_STREAM_PARTS) to re-run the sweep.
    */
  private lazy val StreamShuffleParts: String = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4")
    // validate at latch time: an unparseable or non-positive value fed
    // straight to spark.sql.shuffle.partitions only fails later inside
    // query execution with an error naming neither the value nor the
    // variable (ADVICE r18)
    require(raw.nonEmpty && raw.length <= 9 && raw.forall(_.isDigit) &&
      raw.toInt > 0,
      s"SPARK_GRAFT_STREAM_PARTS must be a positive integer, got '$raw'")
    raw
  }

  /** Pin `spark.sql.shuffle.partitions` to [[StreamShuffleParts]] for
    * the duration of one stream drive (the value is latched when the
    * streaming query STARTS), restoring the session's batch setting
    * after — oracle SQL and batch twins still run at the session's 32.
    */
  private def withStreamParts[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, StreamShuffleParts)
    try body finally s.conf.set(key, prev)
  }

  /** Run one streaming plan to completion over pre-chunked arrivals:
    * fresh MemoryStream, one micro-batch per chunk (each addData call
    * is one source block, so a chunk arrives as ONE ordered input
    * partition — what makes first-arrival stateful dedup deterministic
    * in the feed order), memory sink, stop, return the sink table.
    */
  private def runStream[A: Encoder](s: SparkSession, chunks: Seq[Seq[A]],
      build: Dataset[A] => DataFrame, sink: String,
      mode: OutputMode = OutputMode.Append): DataFrame = withStreamParts(s) {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[A]
    // RAM-backed checkpoint (EventsStream.ramCheckpoint): the per-batch
    // state-store/offset-log commits are small-file IO the MemoryStream
    // harness cannot replay anyway; deleted after stop()
    val ckpt = EventsStream.ramCheckpoint(sink)
    val q = build(mem.toDS()).writeStream.format("memory")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .queryName(sink).outputMode(mode).start()
    try chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    finally {
      // state-store evidence for the scale bench (r19 ask #5): the max
      // keyed-state row count / bytes any micro-batch held — the number
      // that must stay WATERMARK-bounded (cluster-sized), not
      // corpus-sized, as volume grows. Read from the query's progress
      // ring before stop() (recentProgress keeps far more entries than
      // the 3-5 batches a drive runs).
      val stateOps = q.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten)
      lastDriveStats.set(DriveStats(sink, q.recentProgress.length,
        if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max,
        if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max))
      q.stop()
      EventsStream.dropCheckpoint(ckpt)
    }
    s.table(sink)
  }

  /** Snapshot of the most recent [[runStream]] drive's state-store
    * posture, for StreamScaleBench — batch count plus the per-batch
    * maxima of keyed-state rows and bytes across all stateful
    * operators in the plan.
    */
  private[graft] final case class DriveStats(sink: String, batches: Int,
      maxStateRows: Long, maxStateBytes: Long)
  private[graft] val lastDriveStats =
    new java.util.concurrent.atomic.AtomicReference[DriveStats](
      DriveStats("", 0, 0L, 0L))

  /** The events table as time-ordered arrival batches: three chunks cut
    * at ts boundaries (equal-ts rows never split across chunks — the
    * within-batch (ts, event_id) processing order must cover each
    * timestamp completely), so no event ever arrives behind the
    * watermark and the stream sees the same total order the batch
    * window sort uses.
    */
  private def eventChunks(s: SparkSession, dir: String): Seq[Seq[Event]] = {
    import s.implicits._
    val evs = EventOps.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
      .sortBy(e => (EventsStream.tsMicros(e.ts), e.event_id))
    val times = evs.map(e => EventsStream.tsMicros(e.ts))
    val cut1 = times(times.length / 3)
    val cut2 = times(2 * times.length / 3)
    def us(e: Event) = EventsStream.tsMicros(e.ts)
    Seq(evs.filter(us(_) < cut1).toSeq,
      evs.filter(e => us(e) >= cut1 && us(e) < cut2).toSeq,
      evs.filter(us(_) >= cut2).toSeq).filter(_.nonEmpty)
  }

  /** Two far-future sentinel batches (user_id −1, filtered from every
    * result): batch n's data sets the watermark batch n+1 runs under,
    * so two pushes move the watermark past every real event's
    * gap/window and flush all remaining state — the in-process stand-in
    * for a live stream's later traffic.
    */
  private def sentinels(chunks: Seq[Seq[Event]]): Seq[Seq[Event]] = {
    val maxTs = chunks.last.last.ts.getTime
    Seq(
      Seq(Event(-1L, new java.sql.Timestamp(maxTs + 86400000L), -1L, "__wm__", 0.0)),
      Seq(Event(-2L, new java.sql.Timestamp(maxTs + 90000000L), -1L, "__wm__", 0.0)))
  }

  /** q_stream_sessionize — the real `flatMapGroupsWithState` gap
    * sessionization ([[EventsStream.sessionize]]: keyed SessionState,
    * event-time timeout flush, exact micro-unit value sums) driven over
    * the events table in three arrival batches. Sessions are re-keyed
    * after the sink by per-user start-time order (`row_number`), which
    * is exactly the batch plan's running-sum session numbering — so the
    * ORACLE IS the batch q_events_sessionize SQL, and the gate
    * hash-checks that the streamed state machine lands on the batch
    * fixpoint row for row (ids, bounds, counts, and decimal-exact value
    * sums).
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = eventChunks(s, dir)
    val sink = runStream[Event](s, chunks ++ sentinels(chunks),
      ds => EventsStream.sessionize(ds).toDF(), "graft_stream_sessionize")
    val w = Window.partitionBy($"user_id").orderBy($"session_start")
    sink.where($"user_id" >= 0)
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select($"user_id", $"session_id", $"n_events",
        $"session_start".as("start_ts"), $"session_end".as("end_ts"),
        $"sum_value")
      .orderBy($"user_id", $"session_id")
  }

  /** q_stream_window_live — the real watermarked tumbling-window
    * aggregation ([[EventsStream.windowedAgg]]) over the same arrival
    * batches; the sentinels push the watermark past every real window's
    * close so Append mode emits the complete finalized set. Oracle =
    * the batch q_stream_window_agg SQL: the streamed per-window
    * decimal-exact sums must equal the batch group-by's exactly.
    */
  def streamWindowLive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = eventChunks(s, dir)
    val sink = runStream[Event](s, chunks ++ sentinels(chunks),
      ds => EventsStream.windowedAgg(ds.toDF()), "graft_stream_window_live")
    sink.where($"event_type" =!= "__wm__")
      .orderBy($"event_type", $"window_start")
  }

  /** q_stream_curate — the live ingest-curation pipeline
    * ([[EventsStream.curateStream]]: PII mask → stateless quality gate
    * → watermarked first-arrival fingerprint dedup) over the documents
    * table arriving in doc_id order across two micro-batches. The feed
    * order makes the stateful dedup's survivor the MIN doc_id of each
    * fingerprint class (each chunk is one ordered input partition and
    * the state store keeps first arrivals), which is exactly what the
    * declarative oracle selects — so the masked text, the 6-dp quality
    * score, the gate decision, AND the survivor choice are all
    * hash-checked against batch SQL.
    */
  def streamCurate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1)
    // synthetic monotone arrival times (doc_id seconds from a fixed
    // epoch): the documents table has no event time, and the dedup
    // state horizon only needs SOME watermark to bound it
    val rows = docs.map { case (id, text) =>
      (id, new java.sql.Timestamp(1700000000000L + id * 1000L), text)
    }
    val half = rows.length / 2
    val sink = runStream[(Long, java.sql.Timestamp, String)](
      s, Seq(rows.take(half).toSeq, rows.drop(half).toSeq),
      ds => EventsStream.curateStream(ds.toDF("doc_id", "ts", "text")),
      "graft_stream_curate")
    sink.select($"doc_id", $"text", $"quality").orderBy($"doc_id")
  }

  /** Oracle twin of [[streamCurate]]: the same mask → quality → keep
    * min-doc_id-per-fingerprint pipeline as batch SQL (PII stage chain
    * from TextAnalysis.piiPatterns, quality composite from
    * TextAnalysis.qualitySqlExpr, fingerprint = md5 of the sorted
    * distinct token bag — all the already-hash-checked twins composed).
    */
  val streamCurateSql: String = {
    import graft.operators.TextAnalysis
    import graft.functions.{TextFunctions => TF}
    val masked = TextAnalysis.piiPatterns.foldLeft("text") {
      case (e, (_, pat, rep)) => s"regexp_replace($e, '$pat', '$rep', 'g')"
    }
    val lst = TF.englishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH masked AS (
       |  SELECT doc_id, $masked AS text FROM documents),
       |tk AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
       |  FROM masked),
       |q AS (
       |  SELECT doc_id, text,
       |    ${TextAnalysis.qualitySqlExpr(
             "len(toks)",
             s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS DOUBLE) / len(toks)",
             "CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE) / len(text)")} AS quality,
       |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag
       |  FROM tk),
       |gated AS (SELECT * FROM q WHERE quality >= 0.35),
       |kept AS (
       |  SELECT doc_id, text, quality,
       |    row_number() OVER (PARTITION BY bag ORDER BY doc_id) AS rn
       |  FROM gated)
       |SELECT doc_id, text, quality FROM kept WHERE rn = 1
       |ORDER BY doc_id""".stripMargin
  }

  /** q_stream_sketch_store — the continuous HLL sketch-store loop
    * ([[EventsStream.sketchStoreStream]]: per-micro-batch day sketches
    * union-merged into the persisted store through the crash-safe
    * staged-table swap) driven over the events table split into two
    * micro-batches, with the split boundary inside a day so the store
    * MUST merge partial day sketches. The result row per day carries
    * the exact trailing-7-day recount (plain SQL — the oracle) plus
    * two gated booleans computed from the live store: the streamed
    * estimate inside the 5% envelope (integer-exact predicate
    * 20·|est − exact| ≤ exact), and the split-day merge identity —
    * streamed store estimate == single-shot batch sketch estimate
    * (identical HLL registers ⇒ identical estimate; max-merge
    * mergeability is the property the store exists for). A false
    * anywhere breaks the hash, so the daily-loop merge discipline is
    * now oracle-checked, not just spec'd.
    */
  def streamSketchStore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val tbl = "graft_stream_hll_store"
    Seq(tbl, tbl + "__staging", tbl + "__old")
      .foreach(t => graft.operators.IncrementalDedup.clearTable(s, t))
    Seq.empty[(java.sql.Date, Array[Byte])].toDF("day", "sk")
      .write.format("parquet").saveAsTable(tbl)
    val evs = EventOps.events(s, dir)
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)]
      .collect().sortBy(_._2.getTime)
    val half = evs.length / 2
    withStreamParts(s) {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val ckpt = EventsStream.ramCheckpoint(tbl)
      val q = EventsStream.sketchStoreStream(s, mem.toDF().toDF("user_id", "ts"),
        tbl, Some(ckpt.getAbsolutePath))
      try {
        mem.addData(evs.take(half).toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(evs.drop(half).toIndexedSeq: _*); q.processAllAvailable()
      } finally { q.stop(); EventsStream.dropCheckpoint(ckpt) }
    }
    val streamed = Corpus.rollingEstFromSketches(s.table(tbl))
      .select($"day", $"est_users".as("streamed_est"))
    val du = EventOps.events(s, dir)
      .select($"user_id", to_date(date_trunc("DAY", $"ts")).as("day"))
    val single = Corpus.rollingEstFromSketches(
        du.groupBy($"day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk")))
      .select($"day", $"est_users".as("single_est"))
    Corpus.distinctRollingExact(s, dir)
      .join(streamed, "day").join(single, "day")
      .select($"day", $"exact_users",
        (abs($"streamed_est" - $"exact_users") * 20 <= $"exact_users")
          .as("est_within_5pct"),
        ($"streamed_est" === $"single_est").as("merge_exact"))
      .orderBy($"day")
  }

  /** Oracle twin of [[streamSketchStore]]: the exact trailing-window
    * recount (q_distinct_rolling_exact's SQL) with the two gate booleans
    * pinned TRUE — a sketch outside the envelope or a merge divergence
    * flips a boolean and breaks the hash.
    */
  val streamSketchStoreSql: String =
    s"""SELECT day, exact_users, TRUE AS est_within_5pct, TRUE AS merge_exact
       |FROM (${Corpus.distinctRollingExactSql}) t
       |ORDER BY day""".stripMargin

  /** q_stream_anomaly — the stream-static anomaly gate
    * ([[EventsStream.anomalyGateStream]]: arriving events join the
    * precomputed per-type moment table broadcast, the 3σ decision
    * evaluates row-locally in exact decimal arithmetic) over the full
    * events stream. Fully stateless, so every flagged row emits on
    * arrival and the sink equals the batch query exactly — ORACLE IS
    * q_events_anomaly's SQL, proving the ingest gate and the nightly
    * batch flag identically (the equivalence the moment-table refresh
    * pattern depends on).
    */
  def streamAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = eventChunks(s, dir)
    val moments = EventOps.valueMoments(EventOps.events(s, dir))
    val sink = runStream[Event](s, chunks,
      ds => EventsStream.anomalyGateStream(ds.toDF(), moments),
      "graft_stream_anomaly")
    sink.select($"event_id", $"event_type", $"value", $"z")
      .orderBy($"event_id")
  }

  /** q_stream_cms — the streaming count-min sketch
    * ([[EventsStream.cmsSketchStream]]: row-local salted key generators,
    * the sketch groupBy is the ONLY stateful operator and its state IS
    * the bounded 4×1024-counter sketch) over the documents corpus in two
    * micro-batches, Complete mode — the sink holds the final merged
    * sketch. The sketch hashes are the engine-portable md5 scheme, so
    * the ORACLE re-derives the ENTIRE sketch in SQL — the streamed
    * summary is hash-equal to a DuckDB-computed one, cell for cell.
    */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1)
    val half = docs.length / 2
    val sink = runStream[(Long, String)](
      s, Seq(docs.take(half).toSeq, docs.drop(half).toSeq),
      ds => EventsStream.cmsSketchStream(ds.toDF("doc_id", "text")),
      "graft_stream_cms", OutputMode.Complete)
    sink.select($"d", $"idx", $"cnt").orderBy($"d", $"idx")
  }

  /** Oracle twin of [[streamCms]]: the full 4×1024 sketch re-derived in
    * SQL (the q_heavy_hitters keyed/cms CTEs, emitted raw instead of
    * read through the top-k estimate join).
    */
  val streamCmsSql: String = {
    import graft.operators.{Corpus, Dedup}
    val keys = (0 until Corpus.CmsDepth).map { d =>
      s"SELECT $d AS d, ${Dedup.hash60Sql(s"token || '#$d'")} % ${Corpus.CmsWidth} AS idx FROM tok"
    }.mkString("\nUNION ALL\n")
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
       |  FROM documents),
       |keyed AS ($keys)
       |SELECT d, CAST(idx AS BIGINT) AS idx, CAST(count(*) AS BIGINT) AS cnt
       |FROM keyed GROUP BY d, idx ORDER BY d, idx""".stripMargin
  }

  /** q_stream_incremental — the stream-static incremental near-dup
    * ([[EventsStream.incrementalDedupStream]]: row-local banded MinHash
    * signatures, stream-static bucket join against the historical
    * signature store, watermark-bounded candidate dedup) with the SAME
    * mod-4 corpus split as the batch q_incremental_delta: store half
    * persisted through IncrementalDedup.writeStore, delta half arriving
    * as two micro-batches. The ORACLE IS q_incremental_delta's SQL —
    * the continuous ingest screen proven to surface exactly the batch
    * delta join's matches with identical minhash-agreement estimates.
    */
  def streamIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.IncrementalDedup
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    val tbl = "graft_stream_sig_store"
    IncrementalDedup.writeStore(docs.where($"doc_id" % 4 =!= 3), tbl)
    val delta = docs.where($"doc_id" % 4 === 3)
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) =>
        (id, new java.sql.Timestamp(1700000000000L + id * 1000L), text)
      }
    val half = delta.length / 2
    val sink = runStream[(Long, java.sql.Timestamp, String)](
      s, Seq(delta.take(half).toSeq, delta.drop(half).toSeq),
      ds => EventsStream.incrementalDedupStream(s,
        ds.toDF("doc_id", "ts", "text"), tbl),
      "graft_stream_incremental")
    sink.select($"doc_id".as("delta_id"), $"store_id", $"est_jaccard")
      .orderBy($"delta_id", $"store_id")
  }

  /** q_stream_winnow_match — the stream-static winnowing substring
    * screen ([[EventsStream.winnowMatchStream]]: row-local winnow
    * fingerprints, stream-static posting-list join, watermark-bounded
    * pair dedup) under the incremental mod-4 corpus split: the store
    * half's postings are the PRECOMPUTED static side (the daily batch
    * artifact, uncapped — the cap belongs to the incremental store
    * builder, q_incremental_winnow), the delta half arrives as two
    * doc_id-ordered micro-batches. The static side applies the
    * [[graft.operators.TextAnalysis.WinnowMaxPostings]] hot-fingerprint
    * cap exactly like the production store builder
    * (IncrementalDedup.writeWinnowStore): a boilerplate fingerprint in
    * thousands of store docs would otherwise fan the posting join out
    * quadratically; the cap bounds per-fingerprint fan-out at 64
    * whatever the corpus. (The 184 s this query cost at sf0.1 before
    * round 17 was NOT the fan-out: a redundant `where(size(sel) > 0)`
    * in the stream plan predicate-pushed the full O(n²)-inlined
    * fingerprint expression below the projection — see
    * EventsStream.winnowMatchStream — and the lazy static side was
    * re-evaluated every micro-batch; dropping the filter and persisting
    * the capped store takes it to ~8 s warm at sf0.1.) The sink's
    * (delta_id, store_id) pair set must equal the
    * declarative capped ≥1-shared-fingerprint join — the oracle
    * re-derives postings from scratch in SQL (the q_winnow_pairs CTE
    * chain + the incrementalWinnowSql keep CTE) and joins across the
    * same split, so the row-local fingerprint algebra, the capped
    * bucket join, and the streamed pair dedup are all hash-checked
    * against batch SQL.
    */
  def streamWinnowMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    val sp = TextAnalysis.winnowPostingsOf(docs.where($"doc_id" % 4 =!= 3))
    val rare = sp.groupBy($"fp").agg(count(lit(1)).as("df"))
      .where($"df" <= TextAnalysis.WinnowMaxPostings).select($"fp")
    // persist the capped store once: a stream-static join re-evaluates
    // the static plan EVERY micro-batch, and this one is a full-corpus
    // fingerprint pass referenced twice (postings + the cap agg) — in
    // production it is the precomputed daily artifact the stream reads,
    // so materializing it before the stream starts is the honest shape
    val postings = sp.join(rare, "fp").persist()
    postings.count()
    try {
      val delta = docs.where($"doc_id" % 4 === 3)
        .as[(Long, String)].collect().sortBy(_._1)
        .map { case (id, text) =>
          (id, new java.sql.Timestamp(1700000000000L + id * 1000L), text)
        }
      val half = delta.length / 2
      val sink = runStream[(Long, java.sql.Timestamp, String)](
        s, Seq(delta.take(half).toSeq, delta.drop(half).toSeq),
        ds => EventsStream.winnowMatchStream(ds.toDF("doc_id", "ts", "text"),
          postings),
        "graft_stream_winnow_match")
      // the memory sink holds materialized rows — the returned plan
      // reads it, not the postings lineage, so unpersist is safe here
      sink.select($"doc_id".as("delta_id"), $"store_id")
        .orderBy($"delta_id", $"store_id")
    } finally postings.unpersist()
  }

  /** Oracle twin of [[streamWinnowMatch]]: postings re-derived from the
    * documents table (the shared q_winnow_pairs CTE chain), split
    * mod-4, the store side capped at WinnowMaxPostings store-half df
    * (the incrementalWinnowSql keep CTE), distinct ≥1-shared pairs.
    * The streaming screen is deliberately the ≥1-shared recall-first
    * filter (EventsStream.winnowMatchStream doc); the ≥2-shared gate is
    * the batch finalizer's, oracle-checked separately as
    * q_incremental_winnow.
    */
  val streamWinnowMatchSql: String =
    s"""WITH ${graft.operators.TextAnalysis.winnowPostingsCtesSql},
       |sp0 AS (SELECT doc_id, fp FROM postings WHERE doc_id % 4 <> 3),
       |keep AS (
       |  SELECT fp FROM sp0 GROUP BY fp
       |  HAVING count(*) <= ${graft.operators.TextAnalysis.WinnowMaxPostings}),
       |sp AS (SELECT doc_id, fp FROM sp0 JOIN keep USING (fp)),
       |d AS (SELECT doc_id, fp FROM postings WHERE doc_id % 4 = 3)
       |SELECT DISTINCT d.doc_id AS delta_id, sp.doc_id AS store_id
       |FROM d JOIN sp USING (fp)
       |ORDER BY delta_id, store_id""".stripMargin

  /** q_stream_mixture_apply — the stream-static mixture
    * materialization ([[EventsStream.mixtureApplyStream]]: arriving
    * docs broadcast-join the precomputed per-source weight table, the
    * copy-count draw evaluates row-locally via the shared LCG
    * expression) driven over the documents table in two doc_id-ordered
    * micro-batches, with the weight table computed by the BATCH
    * q_mixture_temperature plan — the daily-refresh artifact the
    * stream consumes. Fully stateless, so the sink must equal the
    * batch q_mixture_apply row for row — and the ORACLE IS
    * q_mixture_apply's SQL, hash-proving ingest-time and backfill
    * replication decisions identical per (doc_id, boost).
    */
  def streamMixtureApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = Corpus.mixtureTemperature(s, dir).select($"source", $"boost")
    val docs = Tables.documents(s, dir).select($"doc_id", $"source")
      .as[(Long, String)].collect().sortBy(_._1)
    val half = docs.length / 2
    val sink = runStream[(Long, String)](
      s, Seq(docs.take(half).toSeq, docs.drop(half).toSeq),
      ds => EventsStream.mixtureApplyStream(ds.toDF("doc_id", "source"), weights),
      "graft_stream_mixture_apply")
    sink.select($"doc_id", $"source", $"boost", $"n_copies").orderBy($"doc_id")
  }

  /** q_stream_bpe_encode — streaming row-local BPE encoding
    * ([[graft.operators.Bpe.encodeDocsRowLocal]]: the trained merge
    * table broadcast per partition, each arriving doc encoded in one
    * primitive pass — zero state, zero shuffle) over the documents
    * table in two micro-batches. Rows-only for the gate like every BPE
    * query (the merge table is driver-trained, not SQL-expressible);
    * StreamingSpec pins streamed == batch q_bpe_encode per document,
    * and the registered run proves the encoder executes inside the
    * streaming engine at gate SF.
    */
  def streamBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Bpe
    val rank = Bpe.merges(s, dir).map(m => (m.left, m.right) -> m.rank).toMap
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1)
    val half = docs.length / 2
    val sink = runStream[(Long, String)](
      s, Seq(docs.take(half).toSeq, docs.drop(half).toSeq),
      ds => Bpe.encodeDocsRowLocal(ds.toDF("doc_id", "text"), rank),
      "graft_stream_bpe_encode")
    sink.orderBy($"doc_id")
  }

  /** q_stream_dedup_exact — the watermarked exact dedup
    * ([[EventsStream.dedupStream]]: `dropDuplicatesWithinWatermark` on
    * the event key, state bounded by the 2-hour horizon) driven over
    * the events table in three time-ordered chunks WITH REPLAYED
    * DUPLICATES: chunks 2 and 3 re-send the previous chunk's trailing
    * HOUR of events — a time bound, not a row count, because the
    * replay must stay inside the dedup state horizon at every SF: a
    * key's state lives until the watermark (maxTs − 2h) passes its
    * event time + 2h, so a ≤ 1h-old replay is guaranteed to hit LIVE
    * state and be dropped by the store, not by luck or by the late-row
    * filter. The sink must hold every event exactly once; ORACLE = the
    * events table itself (event_id is the key, so first-arrival dedup
    * of an at-least-once feed reproduces the exact relation — the
    * Kafka-redelivery contract this operator exists for).
    *
    * DATA CONTRACT: the oracle equality assumes event_id is globally
    * UNIQUE in the source table — a generator change that introduced
    * duplicate event_ids would make the streamed sink (first-arrival
    * deduped) diverge from the raw-table oracle in a way that looks
    * like a streaming bug. That invariant is a GENERATOR-level
    * contract, so it is asserted in the generator-contract layer
    * (TablesSpec "events.event_id is globally unique"), not here — the
    * r18 in-drive count/countDistinct assert added a corpus-sized
    * action to EVERY drive of this query (ADVICE r18).
    */
  def streamDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = eventChunks(s, dir)
    val replayed = chunks.zipWithIndex.map { case (c, i) =>
      if (i == 0) c
      else {
        val prev = chunks(i - 1)
        val cutUs = EventsStream.tsMicros(prev.last.ts) - 3600L * 1000000L
        prev.filter(e => EventsStream.tsMicros(e.ts) >= cutUs) ++ c
      }
    }
    val sink = runStream[Event](s, replayed,
      ds => EventsStream.dedupStream(ds.toDF()), "graft_stream_dedup_exact")
    sink.select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  val streamDedupExactSql: String =
    """SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** q_stream_neardup — the watermarked streaming near-dup dedup
    * ([[EventsStream.nearDedupStream]]: row-local bag-of-words
    * fingerprint, `dropDuplicatesWithinWatermark` on it) over the
    * documents table arriving in doc_id order across two micro-batches
    * — the raw dedup stage of q_stream_curate registered on its own,
    * so the fingerprint state machine is hash-checked without the
    * PII/quality stages in front. Survivor = min doc_id per
    * fingerprint class (ordered feed, one addData per micro-batch),
    * which is exactly what the declarative oracle selects.
    */
  def streamNearDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) =>
        (id, new java.sql.Timestamp(1700000000000L + id * 1000L), text)
      }
    val half = docs.length / 2
    val sink = runStream[(Long, java.sql.Timestamp, String)](
      s, Seq(docs.take(half).toSeq, docs.drop(half).toSeq),
      ds => EventsStream.nearDedupStream(ds.toDF("doc_id", "ts", "text")),
      "graft_stream_neardup")
    sink.select($"doc_id", $"bag_md5").orderBy($"doc_id")
  }

  /** Oracle twin of [[streamNearDedup]]: the min-doc_id-per-bag
    * survivor set (the streamCurate oracle's kept CTE without the
    * PII/quality stages).
    */
  val streamNearDedupSql: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag_md5
      |  FROM tk),
      |kept AS (
      |  SELECT doc_id, bag_md5,
      |    row_number() OVER (PARTITION BY bag_md5 ORDER BY doc_id) AS rn
      |  FROM b)
      |SELECT doc_id, bag_md5 FROM kept WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** q_stream_click_attrib — the watermarked STREAM-STREAM attribution
    * join ([[EventsStream.clickPurchaseJoin]]: clicks and purchases are
    * two live sources, the join condition bounds event time on both
    * ends so state expires) driven over the events table's click and
    * purchase slices, both chunked at the SAME ts cuts and fed in
    * lockstep (the global watermark is the min across sources, so a
    * boundary-spanning pair's click state is still live when its
    * purchase arrives). Inner join — every match emits as soon as both
    * rows exist, no sentinel flush needed. ORACLE = the declarative
    * range join in SQL: the streamed two-source state machine must
    * produce exactly the batch user/time-window join.
    */
  def streamClickAttrib(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val chunks = eventChunks(s, dir)
    withStreamParts(s) {
      val clicks = MemoryStream[Event]
      val purchases = MemoryStream[Event]
      val ckpt = EventsStream.ramCheckpoint("graft_stream_click_attrib")
      val q = EventsStream.clickPurchaseJoin(
          clicks.toDF().where($"event_type" === "click"),
          purchases.toDF().where($"event_type" === "purchase"))
        .writeStream.format("memory").queryName("graft_stream_click_attrib")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode(OutputMode.Append).start()
      try chunks.foreach { c =>
        clicks.addData(c: _*)
        purchases.addData(c: _*)
        q.processAllAvailable()
      } finally {
        // same state-store snapshot as runStream (this drive owns its
        // two-source harness, so it records its own)
        val stateOps = q.recentProgress.flatMap(p =>
          Option(p.stateOperators).toSeq.flatten)
        lastDriveStats.set(DriveStats("graft_stream_click_attrib",
          q.recentProgress.length,
          if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max,
          if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max))
        q.stop()
        EventsStream.dropCheckpoint(ckpt)
      }
    }
    s.table("graft_stream_click_attrib")
      .select($"user_id", $"click_id", $"purchase_id",
        $"click_ts", $"purchase_ts")
      .orderBy($"click_id", $"purchase_id")
  }

  val streamClickAttribSql: String =
    """WITH c AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  c.ts AS click_ts, p.ts AS purchase_ts
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  /** q_stream_clusters — the CONTINUOUS cluster-maintenance loop
    * ([[EventsStream.clusterMaintainStream]]: per micro-batch label
    * update through IncrementalDedup.updateClusters, bucketed label
    * store rewrite, signature absorb, cross-session refresh) registered
    * with the batch mod-4 split: store half persisted with its
    * contracted labels, delta half arriving in TWO micro-batches — so
    * the second batch's update must see the first batch's absorbed
    * signatures AND relabel against its written labels. The final
    * label store must equal the from-scratch contraction over the FULL
    * merged corpus — the ORACLE IS Corpus.dedupClustersSql, shared
    * verbatim with q_dedup_clusters and q_incremental_clusters: batch,
    * one-shot incremental, and continuous streaming maintenance all
    * land on the same fixpoint.
    */
  def streamClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Corpus, IncrementalDedup}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val sigT = "graft_stream_clu_sigs"
    val labT = "graft_stream_clu_labels"
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    val store = docs.where($"doc_id" % 4 =!= 3)
    IncrementalDedup.writeStore(store, sigT)
    // banded rows read back from the just-written bucketed store: the
    // signature kernel ran once in writeStore, and the self-join on the
    // bucket key shuffles neither side (IncrementalDedup.pairsWithinBands)
    val storedLabels = Corpus.starContract(s,
      IncrementalDedup.pairsWithinBands(s.table(sigT))
        .where($"est_jaccard" >= 0.5).select($"id_a", $"id_b"))
    IncrementalDedup.writeLabels(storedLabels, labT)
    val delta = docs.where($"doc_id" % 4 === 3)
      .as[(Long, String)].collect().sortBy(_._1)
    val half = delta.length / 2
    withStreamParts(s) {
      val mem = MemoryStream[(Long, String)]
      val ckpt = EventsStream.ramCheckpoint(labT)
      val q = EventsStream.clusterMaintainStream(s,
        mem.toDF().toDF("doc_id", "text"), sigT, labT,
        checkpointDir = Some(ckpt.getAbsolutePath))
      try {
        mem.addData(delta.take(half).toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(delta.drop(half).toIndexedSeq: _*); q.processAllAvailable()
      } finally {
        // same progress-ring capture as runStream — this drive loop is
        // bespoke (foreachBatch store maintenance), but StreamScaleBench
        // reads the identical DriveStats posture for its 10× rung
        val stateOps = q.recentProgress.flatMap(p =>
          Option(p.stateOperators).toSeq.flatten)
        lastDriveStats.set(DriveStats(labT, q.recentProgress.length,
          if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max,
          if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max))
        q.stop()
        EventsStream.dropCheckpoint(ckpt)
      }
    }
    s.table(labT).select($"doc_id", $"cluster_id").orderBy($"doc_id")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_stream_sessionize", streamSessionize,
      Some(EventOps.sessionizeSql)),
    GraftQuery("q_stream_window_live", streamWindowLive,
      Some(EventOps.streamWindowAggSql)),
    GraftQuery("q_stream_curate", streamCurate, Some(streamCurateSql)),
    GraftQuery("q_stream_sketch_store", streamSketchStore,
      Some(streamSketchStoreSql)),
    GraftQuery("q_stream_anomaly", streamAnomaly,
      Some(EventOps.eventsAnomalySql)),
    GraftQuery("q_stream_cms", streamCms, Some(streamCmsSql)),
    GraftQuery("q_stream_incremental", streamIncremental,
      Some(graft.operators.IncrementalDedup.incrementalDeltaSql)),
    GraftQuery("q_stream_winnow_match", streamWinnowMatch,
      Some(streamWinnowMatchSql)),
    GraftQuery("q_stream_mixture_apply", streamMixtureApply,
      Some(Corpus.mixtureApplySql)),
    GraftQuery("q_stream_bpe_encode", streamBpeEncode, None),
    GraftQuery("q_stream_dedup_exact", streamDedupExact,
      Some(streamDedupExactSql)),
    GraftQuery("q_stream_neardup", streamNearDedup,
      Some(streamNearDedupSql)),
    GraftQuery("q_stream_click_attrib", streamClickAttrib,
      Some(streamClickAttribSql)),
    GraftQuery("q_stream_clusters", streamClusters,
      Some(graft.operators.Corpus.dedupClustersSql)))
}
