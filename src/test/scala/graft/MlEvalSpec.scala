package graft

import graft.ml.{Classifiers, CrossVal, ModelEval}
import graft.operators.Evaluation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** MLlib scores composed through the evaluation machinery: per-model
  * AUC determinism across independent refits, ROC-curve invariants, the
  * CV-fold grid shape, and the shared 5×2cv t-test algebra against a
  * hand-computed statistic.
  */
class MlEvalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Tie-aware trapezoid AUC of a (y, score) frame — the same collapsed-
    * tallies algebra as the registered queries, recomputed independently.
    */
  private def aucOf(scores: DataFrame): Double = {
    import spark.implicits._
    val grouped = scores.groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
    Evaluation.cumTallies(grouped, Nil)
      .agg((Evaluation.aucNumerator /
        Evaluation.aucDenominator(sum($"cp"), sum($"c" - $"cp"))).as("auc"))
      .as[Double].head()
  }

  test("per-model holdout AUC/AP cover the bank and sit in range") {
    val rows = ModelEval.mlRocAuc(spark, dir).collect()
    val models = rows.map(_.getString(0)).toSet
    assert(models == Classifiers.estimators.map(_._1).toSet)
    rows.foreach { r =>
      val (auc, ap) = (r.getDouble(1), r.getDouble(2))
      assert(auc >= 0.0 && auc <= 1.0, s"${r.getString(0)} auc=$auc")
      assert(ap > 0.0 && ap <= 1.0, s"${r.getString(0)} ap=$ap")
    }
  }

  test("registered per-model AUC is reproduced exactly by an independent refit") {
    import spark.implicits._
    val registered = ModelEval.mlRocAuc(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // cache-bypassed second fit on the same layout (featurize is the
    // uncached builder, fitOn a fresh training pass): seeded learners are
    // deterministic for a fixed input layout, so the AUC must be
    // bit-identical — one cheap linear model and one seeded ensemble
    Seq("logreg", "rf").foreach { name =>
      val (train, test) = Classifiers.featurize(spark, dir)
      val m = Classifiers.fitOn(name, train)
      val fresh = aucOf(m.transform(test).select(
        $"label".cast("int").as("y"), Classifiers.scoreExpr(name).as("score")))
      assert(fresh == registered(name), s"$name: $fresh != ${registered(name)}")
    }
  }

  test("per-model ROC curves are monotone and end at (1, 1)") {
    val rows = ModelEval.mlRocCurve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (model, pts) =>
      val sorted = pts.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, t1, f1), (_, _, t2, f2)) =>
          assert(t2 >= t1 && f2 >= f1, s"$model: non-monotone ROC")
        case _ =>
      }
      val (_, _, tl, fl) = sorted.last
      assert(tl == 1.0 && fl == 1.0, s"$model: curve ends at ($tl, $fl)")
    }
  }

  test("per-model PR curves have valid ranges and recall monotone in rk") {
    val rows = ModelEval.mlPrCurve(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (model, pts) =>
      val sorted = pts.sortBy(_._2)
      // precision CAN be 0.0 (a negative top-scored doc); both are rates
      sorted.foreach { case (_, rk, pr, rc) =>
        assert(pr >= 0.0 && pr <= 1.0 && rc >= 0.0 && rc <= 1.0,
          s"$model rk=$rk precision=$pr recall=$rc")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, r1), (_, _, _, r2)) =>
          assert(r2 >= r1, s"$model: recall not monotone")
        case _ =>
      }
      assert(sorted.last._4 == 1.0, s"$model: recall ends at ${sorted.last._4}")
    }
  }

  test("CV-fold grid covers both refit models on all 10 folds, AUC+AUPRC in range") {
    val rows = ModelEval.mlCvAuc(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSet == Set("naive_bayes", "logreg"))
    assert(rows.map(t => (t._2, t._3)).toSet ==
      (for { r <- 0 until 5; f <- 0 until 2 } yield (r, f)).toSet)
    rows.foreach { case (m, r, f, auc, ap) =>
      assert(auc >= 0.0 && auc <= 1.0, s"$m r=$r f=$f auc=$auc")
      // AP is a mean of precisions over positive thresholds: strictly
      // positive as long as the fold has a positive (every fold does —
      // the label is a deterministic function of text)
      assert(ap > 0.0 && ap <= 1.0, s"$m r=$r f=$f auprc=$ap")
    }
  }

  test("ttestStat reproduces a hand-computed Dietterich statistic") {
    import spark.implicits._
    // synthetic 5×2 grid with known AUCs
    val as = (0 until 5).flatMap(r => (0 until 2).map(f =>
      (r, f, "a", 0.70 + 0.011 * r + 0.02 * f)))
    val bs = (0 until 5).flatMap(r => (0 until 2).map(f =>
      (r, f, "b", 0.65 + 0.017 * r - 0.01 * f)))
    val aucs = (as ++ bs).toDF("r", "f", "scorer", "auc")
    val got = CrossVal.ttestStat(aucs, "a", "b").collect().head
    // same arithmetic shape as the plan: d per fold, per-round variance
    // around the round mean, variances folded in r order
    val d = (0 until 5).map { r =>
      val d0 = (0.70 + 0.011 * r) - (0.65 + 0.017 * r)
      val d1 = (0.70 + 0.011 * r + 0.02) - (0.65 + 0.017 * r - 0.01)
      (d0, d1)
    }
    val s2 = d.map { case (d0, d1) =>
      val m = (d0 + d1) / 2
      (d0 - m) * (d0 - m) + (d1 - m) * (d1 - m)
    }
    val sSqr = s2.reduceLeft(_ + _)
    val expected = d.head._1 / math.sqrt(sSqr / 5)
    assert(math.abs(got.getDouble(0) - d.head._1) < 1e-12)
    assert(math.abs(got.getDouble(2) - expected) < 1e-9,
      s"t=${got.getDouble(2)} expected=$expected")
  }

  test("the registered analytic t-test equals ttestStat on the analytic fold AUCs") {
    // the refactor's no-drift guarantee: q_ttest_5x2 IS the shared
    // algebra applied to the analytic scorers
    val viaShared = CrossVal.ttestStat(CrossVal.foldAucs(spark, dir), "a", "b")
      .collect().head
    val registered = CrossVal.ttest5x2(spark, dir).collect().head
    assert(viaShared == registered)
  }

  test("per-model mean ROC is monotone on the grid and ends at 1") {
    val rows = ModelEval.mlMeanRoc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 2 * 101 && rows.forall(_._4 == 10))
    rows.groupBy(_._1).foreach { case (model, pts) =>
      val sorted = pts.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L to 100L), s"$model: grid gaps")
      sorted.sliding(2).foreach {
        case Array((_, _, t1, _), (_, _, t2, _)) =>
          assert(t2 >= t1, s"$model: non-monotone mean ROC")
        case _ =>
      }
      assert(sorted.last._3 == 1.0, s"$model: ends at ${sorted.last._3}")
    }
  }

  test("model-refitting learning curve has the 5 nested sizes, AUC+AUPRC in range") {
    val rows = ModelEval.mlLearningCurve(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(20, 40, 60, 80, 100))
    rows.foreach { case (frac, auc, ap) =>
      assert(auc >= 0.0 && auc <= 1.0, s"frac=$frac auc=$auc")
      assert(ap > 0.0 && ap <= 1.0, s"frac=$frac auprc=$ap")
    }
  }

  test("fold AUPRC matches an independently computed average precision") {
    import spark.implicits._
    // recompute AP for one (scorer, r, f) cell from the raw tallies with
    // plain Scala arithmetic — the registered fold value must agree
    val cell = ModelEval.foldTallies(spark, dir)
      .where($"scorer" === "logreg" && $"r" === 0 && $"f" === 0)
      .select($"score", $"c", $"cp").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1) // descending score = rank order
    val p = cell.map(_._3).sum.toDouble
    var (rk, tp, ap) = (0L, 0L, 0.0)
    cell.foreach { case (_, c, cp) =>
      rk += c; tp += cp
      if (cp > 0) ap += cp * tp.toDouble / rk
    }
    val expected = BigDecimal(ap / p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val got = ModelEval.mlCvAuc(spark, dir)
      .where($"model" === "logreg" && $"r" === 0 && $"f" === 0)
      .select($"auprc").as[Double].head()
    assert(math.abs(got - expected) < 2e-6, s"got=$got expected=$expected")
  }

  test("grid search covers the full multi-estimator grid with deterministic best params") {
    import graft.ml.GridSearch
    // (estimator, rank, p1_name, p1, p2_name, p2, auc_roc)
    val rows = GridSearch.mlGridSearch(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3),
        r.getString(4), r.getDouble(5), r.getDouble(6)))
    // exact grid shape: every (estimator, named point), once, across ≥2
    // estimator families
    val shape = GridSearch.gridShape
    assert(rows.map(t => (t._1, t._3, t._5, t._4, t._6)).toSet ==
      shape.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet)
    assert(rows.length == shape.size)
    assert(rows.map(_._1).distinct.length >= 2, "sweep must cover >=2 estimators")
    // per estimator: ranks are a permutation ordered by
    // (auc desc, p1 asc, p2 asc)
    rows.groupBy(_._1).foreach { case (est, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"$est ranks")
      val resorted = rs.sortBy(t => (-t._7, t._4, t._6)).map(_._2)
      assert(resorted.toSeq == (1 to rs.length), s"$est rank must follow tiebreak")
    }
    rows.foreach(t => assert(t._7 >= 0.0 && t._7 <= 1.0, s"auc ${t._7}"))
    // best-params determinism across runs
    val again = GridSearch.mlGridSearch(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3),
        r.getString(4), r.getDouble(5), r.getDouble(6)))
    assert(again.toSeq == rows.toSeq)
    // the sweep must measure something: grid points may tie, but not
    // all collapse to one degenerate score
    assert(rows.map(_._7).distinct.length >= 2, "all grid AUCs identical")
  }

  test("grid-winner t-test carries the sweep's best params and a finite statistic") {
    import graft.ml.GridSearch
    val sweep = GridSearch.mlGridSearch(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3), r.getDouble(5)))
    val bestOf = sweep.filter(_._2 == 1).map(t => t._1 -> ((t._3, t._4))).toMap
    val rows = GridSearch.mlGridTtest(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // (estimator_a, a_reg_param, a_elastic_net, estimator_b, b_max_depth,
    //  b_num_trees, d00, s_sqr, t_stat)
    assert(r.getString(0) == "logreg" && r.getString(3) == "rf")
    assert((r.getDouble(1), r.getDouble(2)) == bestOf("logreg"),
      "t-test must refit the logreg winner the sweep selected")
    assert((r.getDouble(4), r.getDouble(5)) == bestOf("rf"),
      "t-test must refit the rf winner the sweep selected")
    val t = r.getDouble(8)
    assert(!t.isNaN && !t.isInfinite, s"t_stat $t")
    // determinism: seeded fits + deterministic folds → identical rerun
    val again = GridSearch.mlGridTtest(spark, dir).collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("ml calibration bins + brier equal a raw-score recompute for logreg") {
    import spark.implicits._
    val rows = ModelEval.mlCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val models = rows.map(_._1).distinct
    assert(models.length == Classifiers.estimators.length,
      "one calibration block per bank model")
    // recompute logreg's report from its raw hold-out scores
    val raw = Classifiers.holdoutScores(spark, dir, "logreg")
      .select($"y", $"score").as[(Int, Double)].collect()
    val lr = rows.filter(_._1 == "logreg")
    assert(lr.map(_._3).sum == raw.length, "bins partition the hold-out half")
    val sis = raw.map { case (y, sc) => (y, math.round(sc * 1e6)) }
    val wantBrier = sis.map { case (y, si) =>
      val d = si - y.toLong * 1000000L; BigInt(d) * BigInt(d)
    }.sum.toDouble / (raw.length * 1e12)
    assert(math.abs(lr.head._7 - wantBrier) < 1e-5, "brier")
    lr.foreach { case (_, bin, n, pos, rate, mean, _) =>
      assert(pos <= n && rate >= 0.0 && rate <= 1.0)
      assert(mean >= bin / 10.0 - 1e-6 && mean <= (bin + 1) / 10.0 + 1e-6)
    }
    // determinism off the session-cached tallies
    val again = ModelEval.mlCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(again.toSeq == rows.toSeq)
  }
}
