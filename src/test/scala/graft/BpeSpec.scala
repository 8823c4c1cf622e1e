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
    // the corpus vocabulary exhausts at ~105 merges, so the configured
    // budget is the binding limit here
    assert(a.length == Bpe.NumMerges)
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
    // real subword counts differ from the whitespace counts they refine
    val ws = graft.operators.TextAnalysis.tokenStats(spark, dir)
      .select($"doc_id", $"ws_tokens").as[(Long, Int)].collect().toMap
    val diff = a.count(r => r.getLong(2) != ws(r.getLong(0)).toLong)
    assert(diff > 0, "BPE counts should not collapse to whitespace counts")
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
