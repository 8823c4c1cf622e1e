package graft.operators

import graft.{GraftQuery, SessionCache, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SURVEY §2.F) — the second major
  * tokenizer family of the LLM literature next to [[Bpe]]: Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates" (the SentencePiece `unigram`
  * model). Where BPE GROWS a vocabulary by greedy merges, ULM SHRINKS
  * one: a large candidate vocabulary is scored by EM over the corpus
  * likelihood p(w) = Σ_segmentations Π p(piece), then pruned toward a
  * target size; inference segments each word by Viterbi under the
  * final piece probabilities (the paper's eq. 2 / §3.2).
  *
  * Scale shape — the [[Bpe]] bounded-driver-work discipline verbatim:
  *  - TRAIN: the corpus reduces to the frequency-truncated word
  *    dictionary ([[Bpe.wordCounts]] — one hash agg, ≤ 2¹⁶ rows at any
  *    corpus size); the EM loop then runs driver-side over that
  *    dictionary. Candidate seeding is BPE-SEEDED per the round-15
  *    plan: the single characters plus every merged symbol the BPE
  *    trainer learned — candidates a greedy merge process already
  *    proved frequent, a few thousand strings.
  *  - E-step: per word, expected piece counts by the forward-backward
  *    lattice sum in log space (exact EM, not the Viterbi
  *    approximation — the lattice is O(len × maxPieceLen) per word);
  *    M-step: p(piece) = E[count]/Σ E[count]. Deterministic
  *    run-to-run: the dictionary arrives frequency-then-word ordered
  *    and every float fold runs in that fixed sequential order.
  *  - PRUNE: after each EM round, drop the lowest-expected-count
  *    pieces (never single characters — full coverage is invariant)
  *    down to [[PruneKeepFraction]] of the current vocabulary, floored
  *    at [[TargetVocab]] — the paper's iterative shrink loop.
  *  - ENCODE: distinct words Viterbi-segment once inside mapPartitions
  *    with the broadcast piece table (the [[Bpe.encodedWords]]
  *    codec-boundary shape), then a broadcast join stamps token
  *    sequences onto corpus occurrences.
  *
  * Rows-only for the gate (sequential EM training is not
  * SQL-expressible — the same boundary as the BPE merge loop); UlmSpec
  * pins a hand-computed Viterbi lattice, an EM round's expected counts
  * on a worked example, coverage, determinism, and the fertility
  * comparison against the BPE twin.
  */
object Ulm {

  /** Target vocabulary after pruning (the production regime — ULM
    * deployments run 8k–64k pieces; the shrink loop stops at whichever
    * of budget or seed exhaustion binds first, the [[Bpe.NumMerges]]
    * convention).
    */
  val TargetVocab = 8192

  /** Fraction of the vocabulary KEPT per prune round (the paper shrinks
    * by a constant factor per iteration).
    */
  val PruneKeepFraction = 0.75

  /** EM iterations per prune round, and prune rounds — small fixed
    * budgets: piece probabilities stabilize within a few rounds on a
    * frequency-truncated dictionary, and a bounded loop keeps the
    * trainer's cost corpus-size-independent.
    */
  val EmItersPerRound = 2
  val PruneRounds = 4

  /** Score assigned per character of a word that the piece vocabulary
    * cannot cover (an encode-time word outside the truncated training
    * dictionary may carry unseen characters) — far below any trained
    * logprob, so covered segmentations always win; deterministic.
    */
  val UnkLogProb = -100.0

  final case class Piece(piece: String, logProb: Double)

  /** The trained piece table with its final expected counts, fit once
    * per (session, dir): BPE-seeded candidates, EM + prune driver-side.
    */
  private[graft] def pieces(s: SparkSession, dir: String): Seq[(String, Double, Double)] =
    SessionCache.getOrCompute(s, s"ulm.pieces:$dir") {
      train(Bpe.wordCounts(s, dir),
        Bpe.merges(s, dir).map(m => m.left + m.right))
    }

  /** Candidate seed: all single characters of the dictionary (coverage
    * floor, never pruned) plus the BPE-learned merged symbols with the
    * end-of-word sentinel stripped (ULM segments bare words).
    */
  private[graft] def seedCandidates(wordCounts: Seq[(String, Long)],
      bpeMerged: Seq[String]): Seq[String] = {
    val chars = wordCounts.iterator.flatMap(_._1.toSeq).map(_.toString).toSet
    val merged = bpeMerged.iterator
      .map(_.replace(Bpe.EndOfWord, ""))
      .filter(p => p.length > 1)
      .toSet
    (chars ++ merged).toSeq.sorted
  }

  /** One word's forward-backward expected piece counts under the
    * current log-probs, added into `acc` weighted by the word's corpus
    * frequency; returns the word's log-likelihood contribution.
    * Unknown characters (no covering piece) score [[UnkLogProb]] so
    * the lattice never goes -∞.
    */
  private[graft] def accumulateExpectations(word: String, freq: Long,
      logp: collection.Map[String, Double], maxLen: Int,
      acc: collection.mutable.Map[String, Double]): Double = {
    val n = word.length
    def pieceLog(j: Int, i: Int): Option[Double] = {
      val p = word.substring(j, i)
      logp.get(p).orElse(if (i - j == 1) Some(UnkLogProb) else None)
    }
    def logsum(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i)
      pieceLog(j, i).foreach { lp => alpha(i) = logsum(alpha(i), alpha(j) + lp) }
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    beta(n) = 0.0
    for (j <- n - 1 to 0 by -1; i <- (j + 1) to math.min(n, j + maxLen))
      pieceLog(j, i).foreach { lp => beta(j) = logsum(beta(j), lp + beta(i)) }
    val total = alpha(n)
    for (j <- 0 until n; i <- (j + 1) to math.min(n, j + maxLen))
      pieceLog(j, i).foreach { lp =>
        val post = math.exp(alpha(j) + lp + beta(i) - total)
        val p = word.substring(j, i)
        if (logp.contains(p)) acc(p) = acc.getOrElse(p, 0.0) + freq * post
      }
    freq * total
  }

  /** Viterbi segmentation under a piece table (the paper's inference
    * rule): best-scoring split, ties broken toward the longer final
    * piece (smaller start index) then by the earlier comparison order —
    * fixed and documented so encode is deterministic.
    */
  private[graft] def viterbi(word: String, logp: collection.Map[String, Double],
      maxLen: Int): Array[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val p = word.substring(j, i)
      val lp = logp.get(p).orElse(if (i - j == 1) Some(UnkLogProb) else None)
      lp.foreach { l =>
        val cand = best(j) + l
        if (cand > best(i)) { best(i) = cand; back(i) = j }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = n
    while (i > 0) { val j = back(i); out += word.substring(j, i); i = j }
    out.reverseIterator.toArray
  }

  /** The driver-side trainer: seed → (EM × [[EmItersPerRound]] → prune)
    * × [[PruneRounds]] → final EM pass. Returns (piece, logProb,
    * expectedCount) rows, logprob-descending then piece-ascending.
    */
  private[graft] def train(wordCounts: Seq[(String, Long)],
      bpeMerged: Seq[String]): Seq[(String, Double, Double)] = {
    val chars = wordCounts.iterator.flatMap(_._1.toSeq).map(_.toString).toSet
    var vocab: Seq[String] = seedCandidates(wordCounts, bpeMerged)
    // seed probabilities from weighted substring occurrences — the
    // frequent-substring seeding of the paper's §4 setup
    def substringCounts(pieces: Set[String], maxLen: Int): collection.mutable.Map[String, Double] = {
      val acc = collection.mutable.HashMap[String, Double]()
      wordCounts.foreach { case (w, c) =>
        for (j <- 0 until w.length; i <- (j + 1) to math.min(w.length, j + maxLen)) {
          val p = w.substring(j, i)
          if (pieces.contains(p)) acc(p) = acc.getOrElse(p, 0.0) + c.toDouble
        }
      }
      acc
    }
    var maxLen = vocab.iterator.map(_.length).max
    var counts = substringCounts(vocab.toSet, maxLen)
    def toLogProbs(c: collection.Map[String, Double]): collection.mutable.Map[String, Double] = {
      // fixed fold order (piece-sorted) so the normalizer is identical
      // run to run
      val total = c.toSeq.sortBy(_._1).iterator.map(_._2).sum
      val m = collection.mutable.HashMap[String, Double]()
      c.foreach { case (p, v) =>
        m(p) = if (v > 0) math.log(v / total) else UnkLogProb
      }
      m
    }
    var logp = toLogProbs(counts)
    for (round <- 0 until PruneRounds) {
      for (_ <- 0 until EmItersPerRound) {
        val acc = collection.mutable.HashMap[String, Double]()
        wordCounts.foreach { case (w, c) =>
          accumulateExpectations(w, c, logp, maxLen, acc)
        }
        counts = acc
        logp = toLogProbs(counts)
      }
      if (round < PruneRounds - 1) {
        // prune: keep chars unconditionally, then the highest-expected
        // multi-char pieces up to the kept budget (ties to the
        // lexicographically smaller piece)
        val multi = vocab.filter(p => p.length > 1)
        val keepN = math.max(TargetVocab - chars.size,
          (multi.size * PruneKeepFraction).toInt)
        val kept = multi
          .sortBy(p => (-counts.getOrElse(p, 0.0), p))
          .take(keepN).toSet
        vocab = vocab.filter(p => p.length == 1 || kept(p))
        maxLen = vocab.iterator.map(_.length).max
        logp = toLogProbs(counts.filter { case (p, _) =>
          p.length == 1 || kept(p) })
      }
    }
    vocab.map(p => (p, logp.getOrElse(p, UnkLogProb), counts.getOrElse(p, 0.0)))
      .sortBy { case (p, lp, _) => (-lp, p) }
  }

  /** Registered piece table: the trained vocabulary with final
    * log-probs and expected counts. Rows-only (EM training is not
    * SQL-expressible); UlmSpec pins the algebra.
    */
  def ulmVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pieces(s, dir).zipWithIndex
      .map { case ((p, lp, ec), i) =>
        (i, p, BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(ec).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("piece_rank", "piece", "log_prob", "expected_count")
      .orderBy($"piece_rank")
  }

  /** Every distinct corpus word Viterbi-segmented once — the bounded
    * broadcast frame, [[Bpe.encodedWords]]'s shape with the piece
    * table in the broadcast.
    */
  private[graft] def encodedWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val tbl = pieces(s, dir).map { case (p, lp, _) => p -> lp }
    val maxLen = math.max(1, tbl.iterator.map(_._1.length).max)
    val tblBc = s.sparkContext.broadcast(tbl.toMap)
    val words = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select(explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
      .distinct()
      .as[String]
    words.mapPartitions { it =>
      val logp = tblBc.value
      it.map(w => (w, viterbi(w, logp, maxLen).toSeq))
    }.toDF("w", "toks")
  }

  /** Registered per-document encoding summary — schema-identical to
    * [[Bpe.bpeEncode]] so the two tokenizers read side by side:
    * word count, ULM token count, order-pinned md5 of the token stream.
    */
  def ulmEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val occurrences = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos", "w")))
      .where(length($"w") > 0)
    occurrences.join(broadcast(encodedWords(s, dir)), "w")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size($"toks")).as("ulm_tokens"),
        md5(concat_ws(" ",
          flatten(transform(array_sort(collect_list(struct($"pos", $"toks"))),
            x => x.getField("toks"))))).as("tokens_md5"))
      .orderBy($"doc_id")
  }

  /** The round-15 comparison query: per source, BPE fertility NEXT TO
    * ULM fertility and their ratio — the scoreboard a pipeline reads
    * before choosing its tokenizer (ULM's lattice segmentation
    * typically buys equal-or-lower fertility at the same budget; a
    * source where the ratio spikes is the one to inspect). Both sides
    * reuse their family's broadcast-encoded distinct-word frame; one
    * hash agg each, joined on source.
    */
  def ulmFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextFunctions => TF}
    val occurrences = Tables.fanOut(Tables.documents(s, dir), col("doc_id"))
      .select($"source", explode(TF.tokens($"text")).as("w"))
      .where(length($"w") > 0)
    def fert(enc: DataFrame, outCol: String): DataFrame =
      occurrences.join(broadcast(enc), "w")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_words"),
          sum(size($"toks")).cast("long").as("n_subwords"))
        .select($"source", $"n_words",
          round($"n_subwords".cast("double") / $"n_words", 6).as(outCol))
    fert(Bpe.encodedWords(s, dir), "bpe_fertility")
      .join(fert(encodedWords(s, dir), "ulm_fertility").drop("n_words"), "source")
      .select($"source", $"n_words", $"bpe_fertility", $"ulm_fertility",
        round($"ulm_fertility" / $"bpe_fertility", 6).as("fertility_ratio"))
      .orderBy($"source")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_ulm_vocab", ulmVocab, None, singleShot = true),
    GraftQuery("q_ulm_encode", ulmEncode, None, singleShot = true),
    GraftQuery("q_ulm_fertility", ulmFertility, None, singleShot = true))
}
