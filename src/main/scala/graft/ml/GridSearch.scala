package graft.ml

import graft.{GraftQuery, SessionCache}
import graft.operators.Evaluation
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hyperparameter sweep surface — the reference's caller-supplied
  * model-configuration knobs (createDictionary kwargs,
  * /root/reference/src/TextClassification.py:257; the notebook's
  * per-model parameter choices in cell 38) as a ParamGridBuilder sweep:
  * the MLlib tuning grid supplies the parameter space, the engine's own
  * threshold-tally algebra scores every grid point (the reuse the
  * CrossValidator evaluator would hide).
  *
  * Scale shape: fits are the cost (|grid| estimator fits over the
  * persisted featurized train half — resource-bound, exactly like the
  * bank); evaluation is ONE corpus-sized hash agg for ALL grid points
  * (scores union with the grid coordinates as group keys, then the
  * shared cumTallies/AUC algebra runs per grid point). The final
  * ranking window is grid-bounded by construction (|grid| rows after
  * aggregation), not corpus-sized.
  */
object GridSearch {

  /** The swept axes — regularization strength × elastic-net mixing of
    * the bank's linear model (2×3 = 6 fits).
    */
  val RegParams: Seq[Double] = Seq(1e-4, 1e-2, 1.0)
  val ElasticNets: Seq[Double] = Seq(0.0, 0.5)

  /** One AUC row per grid point, memoized per (session, dir) — the
    * sweep's |grid| fits are paid once per session like every bank fit.
    */
  private[ml] def gridAucs(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrCompute(s, s"ml.gridSearch:$dir") {
      import s.implicits._
      val (train, test) = Classifiers.featurized(s, dir)
      // maxIter 10: the cvPair precedent (ModelEval) — sweep refits are
      // deliberately lighter than the bank's maxIter-50 production fit
      val lr = new LogisticRegression().setMaxIter(10)
      val grid = new ParamGridBuilder()
        .addGrid(lr.regParam, RegParams.toArray)
        .addGrid(lr.elasticNetParam, ElasticNets.toArray)
        .build()
      // fit each grid point; tag its hold-out scores with the grid
      // coordinates so one downstream aggregation serves the whole sweep
      val scored = grid.toSeq.map { pm =>
        val m = lr.fit(train, pm)
        m.transform(test).select(
          lit(m.getRegParam).as("reg_param"),
          lit(m.getElasticNetParam).as("elastic_net"),
          $"label".cast("int").as("y"),
          Classifiers.scoreExpr("logreg").as("score"))
      }.reduce(_.unionByName(_))
      val tallies = scored.groupBy($"reg_param", $"elastic_net", $"score")
        .agg(count(lit(1)).as("c"), sum($"y").cast("long").as("cp"))
      val totals = tallies.groupBy($"reg_param", $"elastic_net")
        .agg(sum($"cp").as("p"), (sum($"c") - sum($"cp")).as("n"))
      Evaluation.cumTallies(tallies, Seq("reg_param", "elastic_net"))
        .join(broadcast(totals), Seq("reg_param", "elastic_net"))
        .groupBy($"reg_param", $"elastic_net")
        .agg(round(Evaluation.aucNumerator /
          Evaluation.aucDenominator(first($"p"), first($"n")), 6).as("auc_roc"))
        .persist() // |grid| rows
    }

  /** Registered sweep: every grid point with its hold-out AUC and rank
    * (1 = the selected hyperparameters; ties break on the smaller
    * regularization, then mixing — fully deterministic). Rows-only for
    * the gate (model fitting is not SQL-expressible); MlEvalSpec pins
    * the grid shape and best-params determinism.
    */
  def mlGridSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // grid-bounded frame: this window ranks |grid| rows, not the corpus
    val w = Window.orderBy($"auc_roc".desc, $"reg_param".asc, $"elastic_net".asc)
    gridAucs(s, dir)
      .withColumn("rank", row_number().over(w))
      .select($"rank", $"reg_param", $"elastic_net", $"auc_roc")
      .orderBy($"rank")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_ml_grid_search", mlGridSearch, None, singleShot = true))
}
