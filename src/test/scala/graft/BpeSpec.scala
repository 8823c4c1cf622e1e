package graft

import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Trained-BPE correctness: the merge loop reproduces the published
  * reference example (Sennrich, Haddow & Birch 2016 §3.2 — the
  * low/lower/newest/widest dictionary) exactly, encode follows rank
  * order, and the registered corpus queries are deterministic with
  * consistent counts.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The paper's worked dictionary: {'low':5, 'lower':2, 'newest':6,
    * 'widest':3}.
    */
  private val sennrich = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L)

  test("merge loop reproduces the published reference example") {
    val merges = Bpe.trainMerges(sennrich, 5)
    // round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 tie → lexicographic (e,s)
    // round 2: (es,t)=9 vs (t,</w>)=9 → (es,t)
    // round 3: (est,</w>)=9 beats (l,o)=7
    // rounds 4-5: (l,o)=7 then (lo,w)=7
    val expect = Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L))
    assert(merges.map(m => (m.left, m.right, m.count)) == expect,
      s"got ${merges}")
    assert(merges.map(_.rank) == (0 until 5))
  }

  test("encode applies merges in rank order: lowest -> [low, est</w>]") {
    val rank = Bpe.trainMerges(sennrich, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", rank).toSeq == Seq("low", "est</w>"))
    // an unseen word degrades to characters + the end marker
    assert(Bpe.encodeWord("ab", rank).toSeq == Seq("a", "b", "</w>"))
    // a word made of one learned unit collapses fully
    assert(Bpe.encodeWord("low", rank).toSeq == Seq("low", "</w>"))
  }

  test("training stops early when no pair repeats") {
    val merges = Bpe.trainMerges(Seq("ab" -> 1L), 10)
    // every pair in the single count-1 word occurs once — below the
    // min-frequency floor, nothing is worth a vocabulary slot
    assert(merges.isEmpty)
    assert(Bpe.trainMergesIndexed(Seq("ab" -> 1L), 10).isEmpty)
  }

  /** Deterministic open-vocabulary dictionary: all base-`alpha` digit
    * strings of length `len` over 'a'.., each with count 2 — enough
    * shared substructure to sustain thousands of merges.
    */
  private def openDict(alpha: Int, len: Int): Seq[(String, Long)] =
    (0 until math.pow(alpha, len).toInt).map { i =>
      val sb = new StringBuilder
      var v = i
      (0 until len).foreach { _ => sb.append(('a' + v % alpha).toChar); v /= alpha }
      (sb.toString, 2L)
    }

  test("indexed trainer reproduces the naive merge sequence exactly") {
    // the published worked example
    assert(Bpe.trainMergesIndexed(sennrich, 5) == Bpe.trainMerges(sennrich, 5))
    // a 1296-word open dictionary, deep into the merge sequence
    val dict = openDict(6, 4)
    assert(Bpe.trainMergesIndexed(dict, 300) == Bpe.trainMerges(dict, 300))
    // and on the real corpus dictionary, through full closure
    val wc = Bpe.wordCounts(spark, dir)
    val naive = Bpe.trainMerges(wc, Bpe.NumMerges)
    assert(Bpe.trainMergesIndexed(wc, Bpe.NumMerges) == naive)
    assert(naive.nonEmpty && naive.length < Bpe.NumMerges,
      "closed test vocabulary must exhaust before the production budget")
  }

  test("indexed trainer sustains a production-scale merge budget") {
    // 32768 distinct words: the merge closure exceeds the budget, so
    // the trainer must spend all 8192+ merges — and do it fast (the
    // naive loop would be O(merges x dictionary) here)
    val dict = openDict(8, 5)
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesIndexed(dict, Bpe.NumMerges)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length == Bpe.NumMerges, s"got ${merges.length}")
    assert(merges.map(_.rank) == (0 until Bpe.NumMerges))
    // every winner met the frequency floor
    assert(merges.forall(_.count >= 2L))
    assert(secs < 60.0, f"8k merges took $secs%.1f s")
  }

  test("q_bpe_vocab is deterministic, ranked, and algebraically consistent") {
    val a = Bpe.bpeVocab(spark, dir).collect()
    val b = Bpe.bpeVocab(spark, dir).collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    a.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) >= 2L)
    }
    // the closed corpus vocabulary exhausts (at ~105 merges) well
    // before the production budget: training is exhaustion-bounded
    // here, and every merge that was worth a slot is present
    assert(a.length < Bpe.NumMerges)
    assert(a.length > 48, "full closure must pass the old demo budget")
  }

  test("q_bpe_encode hashes a deterministic token stream with consistent counts") {
    import spark.implicits._
    val a = Bpe.bpeEncode(spark, dir).collect()
    val b = Bpe.bpeEncode(spark, dir).collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    a.foreach { r =>
      val (nWords, bpeTokens) = (r.getLong(1), r.getLong(2))
      // every word is at least one token; subwords can only add
      assert(bpeTokens >= nWords, s"doc ${r.getLong(0)}")
      assert(r.getString(3).length == 32) // md5 hex
    }
    // at full closure every repeated corpus word absorbs into ONE
    // token, so per-doc subword counts match whitespace counts minus
    // any sub-floor (hapax) words still split — encode must agree with
    // the trained table either way
    val rank = Bpe.merges(spark, dir)
      .map(m => (m.left, m.right) -> m.rank).toMap
    val ws = graft.operators.TextAnalysis.tokenStats(spark, dir)
      .select($"doc_id", $"ws_tokens").as[(Long, Int)].collect().toMap
    val collapsed = a.count(r => r.getLong(2) == ws(r.getLong(0)).toLong)
    assert(collapsed > 0, "a saturated vocabulary must collapse some doc fully")
    // the table still carries genuine subword structure: an UNSEEN word
    // encodes to multiple learned units, not characters
    val enc = Bpe.encodeWord("zzqx", rank).toSeq
    assert(enc.length > 1 && enc.last.nonEmpty)
    assert(Bpe.encodeWord("ab", Map.empty).toSeq == Seq("a", "b", "</w>"))
  }

  test("fertility stats are in range and sum-consistent with the per-doc encoding") {
    import spark.implicits._
    val f = Bpe.bpeFertility(spark, dir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val (nWords, nSub) = (r.getLong(1), r.getLong(2))
      val (fert, cps, split) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nSub >= nWords, s"source ${r.getString(0)}")
      assert(fert >= 1.0 && cps >= 1.0 && split >= 0.0 && split <= 1.0)
    }
    // per-source subword mass re-aggregates to the per-doc encoding total
    val bySource = f.map(_.getLong(2)).sum
    val byDoc = Bpe.bpeEncode(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"bpe_tokens"))
      .as[Long].collect().head
    assert(bySource == byDoc)
  }

  test("BPE-based packing keeps the packing invariants on real subword counts") {
    val rows = Bpe.packSequencesBpe(spark, dir).collect()
    assert(rows.nonEmpty)
    // prefix sums are consistent: tokens_before is non-decreasing in
    // doc_id order and each step advances by the previous doc's tokens
    var expectBefore = 0L
    rows.foreach { r =>
      val (nTokens, before, packId) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(before == expectBefore, s"doc ${r.getLong(0)}")
      assert(packId == before / 512L)
      expectBefore = before + nTokens
    }
    // and the counts agree with q_bpe_encode's per-doc totals
    val enc = Bpe.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == enc.getOrElse(r.getLong(0), 0L))
    }
  }
}
