package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining reference-surface operators: threshold-targeted confusion
  * matrix (getConfusionMatrix, reference: src/TextClassification.py:793),
  * model feature importances (plot_coefficients /
  * yellowbrick FeatureImportances, :1243), and semi-structured event
  * props parsing (the engine's JSON path at scale).
  */
object Extras {

  /** Confusion matrix at the first threshold where TPR ≥ 0.9 — the
    * reference's getConfusionMatrix(desired=0.9, most_val='tpr'): sweep
    * the ranked predictions, pick the earliest point reaching the target
    * sensitivity, report the confusion counts + precision there.
    */
  def confusionAtCutoff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Evaluation.ranked(s, dir)
      .where($"cum_tp".cast("double") / $"p" >= 0.9)
      .orderBy($"rk".asc)
      .limit(1)
      .select($"score".as("threshold"),
        $"cum_tp".as("tp"), $"cum_fp".as("fp"),
        ($"p" - $"cum_tp").as("fn"), ($"n" - $"cum_fp").as("tn"),
        ($"cum_tp".cast("double") / $"p").as("tpr"),
        ($"cum_tp".cast("double") / ($"cum_tp" + $"cum_fp")).as("ppv"))
  }

  val confusionAtCutoffSql: String =
    s"""WITH ${Evaluation.scoredSql}
       |SELECT score AS threshold, cum_tp AS tp, cum_fp AS fp,
       |  (p - cum_tp) AS fn, (n - cum_fp) AS tn,
       |  CAST(cum_tp AS DOUBLE) / p AS tpr,
       |  CAST(cum_tp AS DOUBLE) / (cum_tp + cum_fp) AS ppv
       |FROM ranked
       |WHERE CAST(cum_tp AS DOUBLE) / p >= 0.9
       |ORDER BY rk ASC LIMIT 1""".stripMargin

  /** Top-20 feature importances of the seeded RandomForest — the
    * reference's FeatureImportances / plot_coefficients surface.
    * Rows-only (model internals aren't SQL-expressible).
    */
  def mlFeatureImportance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.ml.classification.RandomForestClassificationModel
    val data = graft.ml.Classifiers.prepared(s, dir)
    val train = data.where($"doc_id" % 2 === 0)
    val model = graft.ml.Classifiers.pipelines.toMap.apply("rf").fit(train)
    val rf = model.stages.last.asInstanceOf[RandomForestClassificationModel]
    val imp = rf.featureImportances
    val rows = imp.toArray.zipWithIndex
      .filter(_._1 > 0)
      .sortBy { case (v, i) => (-v, i) }
      .take(20)
      .map { case (v, i) => (i, v) }
    s.createDataFrame(rows.toSeq).toDF("feature_idx", "importance")
  }

  /** Parse the events JSON props column — get_json_object keeps the
    * parse inside codegen; at 100 TB this is a projection, no shuffle.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    EventOps.events(s, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"))
      .orderBy($"k")
  }

  val jsonExtractSql: String =
    """SELECT CAST(props->>'k' AS INT) AS k, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Decision-tree structure export — the reference's exportTreeGraphViz
    * (src/NLP_functions.py:637) surface: the fitted tree's node dump as
    * ordered rows (render to .dot client-side if desired). Rows-only.
    */
  def mlTreeExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.ml.classification.DecisionTreeClassificationModel
    val data = graft.ml.Classifiers.prepared(s, dir)
    val train = data.where($"doc_id" % 2 === 0)
    val model = graft.ml.Classifiers.pipelines.toMap.apply("dtree").fit(train)
    val dt = model.stages.last.asInstanceOf[DecisionTreeClassificationModel]
    val lines = dt.toDebugString.split("\n").toSeq.zipWithIndex
      .map { case (l, i) => (i, l) }
    s.createDataFrame(lines).toDF("line_no", "node")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_confusion_at_cutoff", confusionAtCutoff, Some(confusionAtCutoffSql)),
    GraftQuery("q_ml_feature_importance", mlFeatureImportance, None),
    GraftQuery("q_ml_tree_export", mlTreeExport, None),
    GraftQuery("q_json_extract", jsonExtract, Some(jsonExtractSql)))
}
