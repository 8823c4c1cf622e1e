package graft.operators

import graft.{GraftQuery, SessionCache, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (SURVEY §2.F) — the REAL
  * trained tokenizer behind the token-budget operators, replacing the
  * "BPE-ish regex" placeholder counts with merges learned from the
  * corpus (the published BPE algorithm: Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape, per stage:
  *  - TRAIN: one corpus-wide word-count hash agg (bounded by the
  *    distinct-word vocabulary), truncated to the top [[MaxTrainWords]]
  *    words by frequency — a few MB at ANY corpus size (the
  *    CountVectorizer-vocab precedent, NamedFeatures) — then the merge
  *    loop runs driver-side: merges are inherently sequential (round
  *    n+1 counts pairs of the symbols round n produced), so no
  *    distributed plan exists; what keeps the driver work
  *    corpus-size-independent is the frequency truncation, and what
  *    keeps an 8k+ merge budget affordable is the indexed incremental
  *    trainer ([[trainMergesIndexed]] — each round pays only for the
  *    adjacencies the winning pair touches).
  *  - ENCODE: each DISTINCT word is encoded once (mapPartitions over
  *    the bounded word frame — the declared per-partition codec
  *    boundary, PNG/Deflater precedent, with the merge table arriving
  *    by broadcast), then a broadcast join stamps token sequences onto
  *    corpus word occurrences. Corpus-sized work is one explode + one
  *    hash agg; the O(word-length²) merge scan never touches a corpus
  *    row twice.
  *
  * The trained merge table is session-cached per (session, dir) — the
  * three registered queries share one fit, so they are `singleShot`
  * registry entries (the Bench one-cold-rep contract).
  */
object Bpe {

  /** Frequency-truncation bound of the training dictionary. */
  val MaxTrainWords = 1 << 16

  /** Merge-table size (= learned vocabulary budget beyond characters) —
    * a user-chosen budget in any BPE deployment, set to the
    * production-scale regime (subword vocabularies run 8k–64k merges).
    * Training is budget-OR-exhaustion bounded: an open-vocabulary
    * corpus spends the full budget; a closed vocabulary (the synthetic
    * word-soup test corpora) exhausts at its merge closure first, fully
    * absorbing every repeated word into one token — the truthful signal
    * that the vocabulary saturates the corpus. The indexed trainer
    * ([[trainMergesIndexed]]) keeps an 8k-merge fit cheap: cost is
    * proportional to adjacencies touched by each merge, not
    * O(merges × dictionary).
    */
  val NumMerges = 8192

  /** End-of-word sentinel symbol (Sennrich §3.2's `</w>`): merges can
    * learn word-final subwords distinct from word-internal ones.
    */
  val EndOfWord = "</w>"

  /** One learned merge: rank (application order), the symbol pair, and
    * the weighted pair count that won the rank.
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Merge every (l, r) adjacency in a symbol sequence (all
    * occurrences, left to right — the published apply rule).
    */
  private def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The driver-side training loop on a bounded word-frequency
    * dictionary: each round counts adjacent symbol pairs weighted by
    * word frequency, takes the max (ties broken by (left, right)
    * lexicographic order — determinism without a seed), merges it
    * everywhere, and records the rank. Stops early when no pair occurs
    * at least twice (nothing left worth a vocabulary slot).
    */
  private[graft] def trainMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) exhausted = true
      else {
        val ((l, r), c) = best.minBy { case ((bl, br), bc) => (-bc, bl, br) }
        merges += Merge(rank, l, r, c)
        vocab = vocab.map { case (syms, wc) => (mergePair(syms, l, r), wc) }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Greedy BPE encode of one word under a merge-rank table: repeatedly
    * apply the lowest-rank merge present until none applies (the
    * published inference rule — rank order, not corpus pair counts).
    */
  private[graft] def encodeWord(word: String,
      rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bl = ""; var br = ""
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bl = syms(i); br = syms(i + 1) }
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else syms = mergePair(syms, bl, br)
    }
    syms
  }

  /** The production trainer: identical merge sequence to [[trainMerges]]
    * (BpeSpec proves exact equivalence), but incremental — pair counts
    * and a pair→words occurrence index are maintained under an ordered
    * set keyed by (−count, left, right), so each round pays only for
    * the words the winning pair touches instead of rescanning the whole
    * dictionary. That turns the O(merges × dictionary) naive loop into
    * O(adjacencies touched), which is what makes an 8k–64k merge budget
    * affordable on the frequency-truncated dictionary regardless of
    * corpus size.
    */
  private[graft] def trainMergesIndexed(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = wordCounts.map { case (w, _) =>
      w.map(_.toString).toArray :+ EndOfWord
    }.toArray
    val weight: Array[Long] = wordCounts.map(_._2).toArray
    val pairCounts = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.HashSet[Int]]()
    // min element = the naive loop's minBy((-count, left, right)) winner;
    // only pairs at the >=2 frequency floor live in the tree
    val ord: Ordering[(Long, String, String)] =
      Ordering.by((t: (Long, String, String)) => (-t._1, t._2, t._3))
    val tree = mutable.TreeSet.empty[(Long, String, String)](ord)

    def bump(p: (String, String), delta: Long): Unit = {
      val old = pairCounts.getOrElse(p, 0L)
      val nu = old + delta
      if (old >= 2) tree.remove((old, p._1, p._2))
      if (nu >= 2) tree.add((nu, p._1, p._2))
      if (nu == 0L) pairCounts.remove(p) else pairCounts(p) = nu
    }

    // every adjacent position counts (overlapping repeats included),
    // exactly like the naive loop's per-position tally
    def removeWord(idx: Int): Unit = {
      val syms = words(idx); val c = weight(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, -c)
        pairWords.get(p).foreach(_ -= idx)
        i += 1
      }
    }

    def addWord(idx: Int): Unit = {
      val syms = words(idx); val c = weight(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, c)
        pairWords.getOrElseUpdate(p, mutable.HashSet[Int]()) += idx
        i += 1
      }
    }

    words.indices.foreach(addWord)
    val merges = mutable.ArrayBuffer[Merge]()
    var rank = 0
    while (rank < numMerges && tree.nonEmpty) {
      val (c, l, r) = tree.head
      merges += Merge(rank, l, r, c)
      // the occurrence index is exact, so only words actually holding
      // the pair are rewritten this round
      val affected = pairWords.getOrElse((l, r), mutable.HashSet[Int]()).toArray
      affected.foreach { idx =>
        removeWord(idx)
        words(idx) = mergePair(words(idx), l, r)
        addWord(idx)
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Corpus word counts: one hash agg bounded by the distinct-word
    * vocabulary, frequency-truncated to [[MaxTrainWords]] — the frame
    * the driver-side trainer consumes.
    */
  private[graft] def wordCounts(s: SparkSession, dir: String): Seq[(String, Long)] = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select(explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"w".asc)
      .limit(MaxTrainWords)
      .as[(String, Long)].collect().toSeq
  }

  /** The trained merge table for a corpus, fit once per (session, dir):
    * corpus word counts (hash agg), frequency-truncate, train
    * driver-side with the indexed trainer at the production budget.
    */
  private[graft] def merges(s: SparkSession, dir: String): Seq[Merge] =
    SessionCache.getOrCompute(s, s"bpe.merges:$dir") {
      trainMergesIndexed(wordCounts(s, dir), NumMerges)
    }

  /** Registered merge table: the learned subword vocabulary in rank
    * order. Rows-only for the gate (sequential merge training is not
    * SQL-expressible); BpeSpec pins the published reference example's
    * merge sequence exactly.
    */
  def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    merges(s, dir)
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.count))
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy($"merge_rank")
  }

  /** Every distinct corpus word encoded once — the bounded frame the
    * corpus join broadcasts. The encoder crosses into mapPartitions
    * with the merge table from a broadcast variable (per-partition
    * init, the codec-boundary shape).
    */
  private[graft] def encodedWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val rankBc = s.sparkContext.broadcast(
      merges(s, dir).map(m => (m.left, m.right) -> m.rank).toMap)
    val words = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select(explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
      .distinct()
      .as[String]
    words.mapPartitions { it =>
      val rank = rankBc.value // one broadcast read per partition
      it.map(w => (w, encodeWord(w, rank).toSeq))
    }.toDF("w", "toks")
  }

  /** Registered per-document encoding summary: word count, REAL subword
    * token count, and an order-sensitive md5 of the full token stream
    * (so the gate hash-checks the exact encoding, not just counts).
    * Corpus-side work is one posexplode + broadcast join + hash agg;
    * token order is pinned by sorting each doc's (pos, toks) structs
    * before hashing — collect_list order is not deterministic.
    */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val occurrences = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos", "w")))
      .where(length($"w") > 0)
    occurrences.join(broadcast(encodedWords(s, dir)), "w")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size($"toks")).as("bpe_tokens"),
        md5(concat_ws(" ",
          flatten(transform(array_sort(collect_list(struct($"pos", $"toks"))),
            x => x.getField("toks"))))).as("tokens_md5"))
      .orderBy($"doc_id")
  }

  /** Tokenizer fertility statistics per source — the standard
    * tokenizer-quality metrics of the multilingual-LM literature
    * (subwords per word = fertility, chars per subword, and the rate
    * of words split into >1 piece): how well the TRAINED vocabulary
    * fits each corpus slice. High fertility on a source means its
    * token budgets (q_pack_sequences_bpe, q_chunk_windows) stretch —
    * the signal that decides whether a vocabulary is retrained before
    * a 100 TB encode. Same scale shape as q_bpe_encode: distinct words
    * encode once, broadcast-join onto occurrences, one hash agg of
    * exact integer counts.
    */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val occurrences = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"source", explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
    occurrences.join(broadcast(encodedWords(s, dir)), "w")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size($"toks")).cast("long").as("n_subwords"),
        sum(length($"w")).cast("long").as("n_chars"),
        sum(when(size($"toks") > 1, 1L).otherwise(0L)).as("n_split_words"))
      .select($"source", $"n_words", $"n_subwords",
        round($"n_subwords".cast("double") / $"n_words", 6).as("fertility"),
        round($"n_chars".cast("double") / $"n_subwords", 6).as("chars_per_subword"),
        round($"n_split_words".cast("double") / $"n_words", 6).as("split_rate"))
      .orderBy($"source")
  }

  /** ROW-LOCAL per-document encoding — the STREAMING-composable form of
    * [[bpeEncode]]: each arriving doc tokenizes (the TokenizeWs
    * semantics exactly), greedy-encodes every word against the
    * broadcast merge table, and emits the same (n_words, bpe_tokens,
    * tokens_md5) columns inside ONE mapPartitions pass — no distinct,
    * no join, no aggregation, so it drops into a Structured Streaming
    * pipeline as a stateless stage (docs with zero words emit no row,
    * matching the batch groupBy's behavior). At ingest scale this is
    * what stamps real token budgets on documents as they arrive; the
    * trained merge table is the daily batch artifact, refreshed like
    * the mixture weight table. StreamingSpec proves streamed rows ≡
    * the batch [[bpeEncode]] rows for the same documents.
    */
  private[graft] def encodeDocsRowLocal(docs: DataFrame,
      rank: Map[(String, String), Int]): DataFrame = {
    import docs.sparkSession.implicits._
    val rankBc = docs.sparkSession.sparkContext.broadcast(rank)
    val ws = java.util.regex.Pattern.compile("\\s+")
    docs.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val rk = rankBc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val words = ws.split(text, -1).filter(_.nonEmpty)
          if (words.isEmpty) None
          else {
            val toks = words.flatMap(w => encodeWord(w, rk))
            md.reset()
            val digest = md.digest(
              toks.mkString(" ").getBytes(java.nio.charset.StandardCharsets.UTF_8))
            Some((id, words.length.toLong, toks.length.toLong,
              digest.map("%02x".format(_)).mkString))
          }
        }
      }.toDF("doc_id", "n_words", "bpe_tokens", "tokens_md5")
  }

  /** Sequence packing re-based on TRAINED subword counts — what an LLM
    * pipeline actually budgets (a 512-subword pack is a model's real
    * context slice; whitespace counts under-fill it). Same
    * range-partitioned prefix-sum algebra as q_pack_sequences
    * ([[Corpus.packTokens]]); only the token source changes. Documents
    * with no words keep their row at 0 tokens (left join), matching the
    * whitespace twin's coalesce.
    */
  def packSequencesBpe(s: SparkSession, dir: String, budget: Long = 512L): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val occurrences = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
    val counts = occurrences.join(broadcast(encodedWords(s, dir)), "w")
      .groupBy($"doc_id")
      .agg(sum(size($"toks")).cast("long").as("bpe"))
    val toks = Tables.documents(s, dir).select($"doc_id")
      .join(counts, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"bpe", lit(0L)).as("n_tokens"))
    Corpus.packTokens(s, toks, budget)
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_bpe_vocab", bpeVocab, None, singleShot = true),
    GraftQuery("q_bpe_encode", bpeEncode, None, singleShot = true),
    GraftQuery("q_pack_sequences_bpe", packSequencesBpe(_, _), None,
      singleShot = true),
    GraftQuery("q_bpe_fertility", bpeFertility, None, singleShot = true))
}
