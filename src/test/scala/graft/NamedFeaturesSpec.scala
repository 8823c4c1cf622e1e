package graft

import graft.ml.{Classifiers, NamedFeatures}
import org.apache.spark.ml.classification.{LinearSVCModel, LogisticRegressionModel, RandomForestClassificationModel}
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Named feature importances / coefficients: a planted signal token must
  * surface as the top NAMED weight through both the linear `coef_`
  * branch and the tree-importance branch (the reference's
  * plot_coefficients contract — weights arrive with their terms, not
  * hashed indices), and the registered queries must hold their shape on
  * the real corpus.
  */
class NamedFeaturesSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 200 docs: positives carry the planted token "zzsignal" among LCG
    * filler tokens; negatives carry filler only. The vectorizer's
    * vocabulary must name it and every model must rank it first.
    */
  private lazy val planted = {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val label = i % 2
      // deterministic filler drawn from a 30-token pool: every token
      // appears in many docs on both sides, so only zzsignal separates
      val filler = (0 until 8).map(j => s"w${(i * 7 + j * 13) % 30}")
      val grams = if (label == 1) filler :+ "zzsignal" else filler
      (i.toLong, label.toDouble, grams)
    }
    rows.toDF("doc_id", "label", "grams")
  }

  test("planted signal token tops the linear coefficients by name") {
    val (pm, train) = NamedFeatures.fitNamed(planted)
    val vocab = pm.stages(0).asInstanceOf[CountVectorizerModel].vocabulary
    assert(vocab.contains("zzsignal"), "vocabulary lost the planted token")
    val cached = train.persist()
    try Seq("logreg", "svm").foreach { name =>
      val coef = Classifiers.estimators.toMap.apply(name).fit(cached) match {
        case m: LogisticRegressionModel => m.coefficients.toArray
        case m: LinearSVCModel => m.coefficients.toArray
      }
      val top = coef.zipWithIndex.maxBy(_._1)
      assert(vocab(top._2) == "zzsignal",
        s"$name: top coefficient names ${vocab(top._2)}")
    } finally cached.unpersist(blocking = false)
  }

  test("planted signal token tops the named RF importances") {
    val (pm, train) = NamedFeatures.fitNamed(planted)
    val vocab = pm.stages(0).asInstanceOf[CountVectorizerModel].vocabulary
    val cached = train.persist()
    try {
      val rf = Classifiers.estimators.toMap.apply("rf").fit(cached)
        .asInstanceOf[RandomForestClassificationModel]
      val top = rf.featureImportances.toArray.zipWithIndex.maxBy(_._1)
      assert(vocab(top._2) == "zzsignal",
        s"top importance names ${vocab(top._2)}")
    } finally cached.unpersist(blocking = false)
  }

  test("registered coefficient query has both models, signed ranks, real terms") {
    val rows = NamedFeatures.mlCoefficients(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == Set("logreg", "svm"))
    rows.groupBy(_._1).foreach { case (model, rs) =>
      val pos = rs.filter(_._2 > 0).sortBy(_._2)
      val neg = rs.filter(_._2 < 0).sortBy(-_._2)
      assert(pos.nonEmpty && neg.nonEmpty, s"$model: one-sided output")
      // ranks are contiguous from ±1 and weights decay with rank
      assert(pos.map(_._2).toSeq == (1 to pos.length))
      assert(neg.map(_._2).toSeq == (-1 to -neg.length by -1))
      assert(pos.forall(_._4 > 0) && neg.forall(_._4 < 0))
      pos.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4, s"$model: pos not sorted")
        case _ =>
      }
      neg.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4, s"$model: neg not sorted")
        case _ =>
      }
      // terms are real strings (named, not indices)
      assert(rs.forall(_._3.nonEmpty))
    }
  }

  test("registered named importance query is ranked, positive, named") {
    val rows = NamedFeatures.mlNamedImportance(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 2 * NamedFeatures.TopN)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.forall(_._3 > 0))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, "importances not sorted")
      case _ =>
    }
  }
}
