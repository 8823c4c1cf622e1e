package graft

import graft.operators.Ulm
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM tokenizer contract (Kudo 2018): Viterbi inference and
  * the EM lattice pinned against hand-computed worked examples, full
  * segmentation coverage, run-to-run determinism, and the fertility
  * comparison against the BPE twin.
  */
class UlmSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("Viterbi picks the max-probability segmentation (worked example)") {
    // p(ab)=0.4, p(a)=0.3, p(b)=0.2, p(c)=0.1 (paper eq. 2 shape):
    //   [ab, c]  → 0.4·0.1 = 0.040
    //   [a, b, c]→ 0.3·0.2·0.1 = 0.006
    val logp = Map("ab" -> math.log(0.4), "a" -> math.log(0.3),
      "b" -> math.log(0.2), "c" -> math.log(0.1))
    assert(Ulm.viterbi("abc", logp, 2).toSeq == Seq("ab", "c"))
    // and with p(ab) low enough the character split must win:
    //   [ab, c] → 0.01·0.1 = 0.001 < 0.006
    val logp2 = logp.updated("ab", math.log(0.01))
    assert(Ulm.viterbi("abc", logp2, 2).toSeq == Seq("a", "b", "c"))
  }

  test("forward-backward expected counts match the closed form (worked example)") {
    // word "ab": P([ab]) = 0.4, P([a,b]) = 0.3·0.2 = 0.06, total 0.46;
    // posterior(ab) = 0.4/0.46, posterior(a) = posterior(b) = 0.06/0.46;
    // at corpus frequency 2 every expectation doubles and the word's
    // log-likelihood contribution is 2·ln(0.46)
    val logp = Map("ab" -> math.log(0.4), "a" -> math.log(0.3), "b" -> math.log(0.2))
    val acc = collection.mutable.HashMap[String, Double]()
    val ll = Ulm.accumulateExpectations("ab", 2L, logp, 2, acc)
    assert(math.abs(acc("ab") - 2 * 0.4 / 0.46) < 1e-9, acc.toString)
    assert(math.abs(acc("a") - 2 * 0.06 / 0.46) < 1e-9)
    assert(math.abs(acc("b") - 2 * 0.06 / 0.46) < 1e-9)
    assert(math.abs(ll - 2 * math.log(0.46)) < 1e-9)
  }

  test("training is deterministic and never prunes a character") {
    val wc = graft.operators.Bpe.wordCounts(spark, dir)
    val merged = graft.operators.Bpe.merges(spark, dir).map(m => m.left + m.right)
    val a = Ulm.train(wc, merged)
    val b = Ulm.train(wc, merged)
    assert(a == b && a.nonEmpty)
    val pieceSet = a.map(_._1).toSet
    val chars = wc.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieceSet), "a dictionary character was pruned")
  }

  test("every distinct corpus word segments back to itself") {
    val rows = Ulm.encodedWords(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks.mkString("") == w, s"'$w' segmented to $toks")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("registered queries: encode counts coherent, fertility comparison well-formed") {
    import spark.implicits._
    val enc = SparkEntry.queries("q_ulm_encode")(spark, dir)
      .select($"n_words".cast("long"), $"ulm_tokens".cast("long"))
      .as[(Long, Long)].collect()
    assert(enc.nonEmpty)
    // every word is at least one piece
    enc.foreach { case (nw, nt) => assert(nt >= nw && nw > 0) }
    val fert = SparkEntry.queries("q_ulm_fertility")(spark, dir).collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      val bpe = r.getDouble(2); val ulm = r.getDouble(3); val ratio = r.getDouble(4)
      assert(bpe >= 1.0 && ulm >= 1.0, s"fertility below 1: $r")
      assert(math.abs(ratio - ulm / bpe) < 1e-4)
    }
    val vocab = SparkEntry.queries("q_ulm_vocab")(spark, dir).collect()
    assert(vocab.nonEmpty)
    // log-probs descend with rank (the registered ordering) and are
    // genuine log-probabilities
    val lps = vocab.map(_.getDouble(2))
    assert(lps.zip(lps.tail).forall { case (x, y) => x >= y })
    assert(lps.forall(_ <= 0.0))
  }
}
