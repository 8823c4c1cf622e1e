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
       |SELECT score AS threshold,
       |  CAST(cum_tp AS BIGINT) AS tp, CAST(cum_fp AS BIGINT) AS fp,
       |  CAST(p - cum_tp AS BIGINT) AS fn, CAST(n - cum_fp AS BIGINT) AS tn,
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
    // session-cached fit — the SAME RandomForest as q_ml_rf, never a
    // duplicate training pass
    val rf = graft.ml.Classifiers.model(s, dir, "rf")
      .asInstanceOf[RandomForestClassificationModel]
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
    // session-cached fit — the SAME DecisionTree as q_ml_dtree
    val dt = graft.ml.Classifiers.model(s, dir, "dtree")
      .asInstanceOf[DecisionTreeClassificationModel]
    // strip the per-instance random uid so the dump is run-deterministic
    val lines = dt.toDebugString.replaceAll("uid=[A-Za-z0-9_]+", "uid=dtc")
      .split("\n").toSeq.zipWithIndex
      .map { case (l, i) => (i, l) }
    s.createDataFrame(lines).toDF("line_no", "node")
  }

  /** Composite classification report at a fixed threshold (reference:
    * classificationReport, src/TextClassification.py:1097): confusion
    * metrics at threshold 0.04 on the continuous score, plus tie-aware
    * ROC-AUC and average precision of the score — one row, computed from
    * the per-threshold tallies of [[Evaluation.ranked]], so the FloatFold
    * materializes one term per DISTINCT SCORE (bounded cardinality), not
    * one per corpus row.
    */
  def classificationReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val th = 0.04 // sits inside the target-density score's range
    Evaluation.ranked(s, dir)
      .select($"score", $"c", $"cp", $"rk", $"cum_tp", $"p", $"n",
        when($"score" >= th, 1L).otherwise(0L).as("pred"))
      .agg(
        sum($"cp" * $"pred").as("tp"), sum(($"c" - $"cp") * $"pred").as("fp"),
        sum(($"c" - $"cp") * (lit(1) - $"pred")).as("tn"),
        sum($"cp" * (lit(1) - $"pred")).as("fn"),
        (Evaluation.aucNumerator /
          Evaluation.aucDenominator(first($"p"), first($"n"))).as("auc_roc"),
        // sklearn average_precision: Σ_thresholds ΔR·P = Σ cp·(cum_tp/rk)/P;
        // terms folded in fixed rk order, null when there are no positives
        round(graft.functions.FloatFold.orderedSumOrNull($"rk",
            $"cp".cast("double") * $"cum_tp" / $"rk", $"cp" > 0) / first($"p"),
          6).as("avg_precision"))
      .select(lit(th).as("threshold"),
        ($"tp".cast("double") / ($"tp" + $"fn")).as("sensitivity"),
        ($"tn".cast("double") / ($"tn" + $"fp")).as("specificity"),
        ($"tp".cast("double") / ($"tp" + $"fp")).as("ppv"),
        ($"tn".cast("double") / ($"tn" + $"fn")).as("npv"),
        (($"tp" + $"tn").cast("double") / ($"tp" + $"fp" + $"tn" + $"fn")).as("accuracy"),
        (lit(2.0) * $"tp" / (lit(2.0) * $"tp" + $"fp" + $"fn")).as("f1"),
        $"auc_roc", $"avg_precision")
  }

  val classificationReportSql: String =
    s"""WITH ${Evaluation.scoredSql},
       |m AS (
       |  SELECT score, c, cp, rk, cum_tp, p, n,
       |    CASE WHEN score >= 0.04 THEN 1 ELSE 0 END AS pred
       |  FROM ranked),
       |agg AS (
       |  SELECT sum(cp * pred) AS tp, sum((c - cp) * pred) AS fp,
       |    sum((c - cp) * (1 - pred)) AS tn, sum(cp * (1 - pred)) AS fn,
       |    CAST(sum((c - cp) * (2 * cum_tp - cp)) AS DOUBLE)
       |      / (2 * any_value(p) * any_value(n)) AS auc_roc,
       |    round(${graft.functions.FloatFold.orderedSumSql(
                    "CAST(cp AS DOUBLE) * cum_tp / rk", "rk", Some("cp > 0"))}
       |      / any_value(p), 6) AS avg_precision
       |  FROM m)
       |SELECT CAST(0.04 AS DOUBLE) AS threshold,
       |  CAST(tp AS DOUBLE) / (tp + fn) AS sensitivity,
       |  CAST(tn AS DOUBLE) / (tn + fp) AS specificity,
       |  CAST(tp AS DOUBLE) / (tp + fp) AS ppv,
       |  CAST(tn AS DOUBLE) / (tn + fn) AS npv,
       |  CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn) AS accuracy,
       |  2.0 * tp / (2.0 * tp + fp + fn) AS f1,
       |  auc_roc, avg_precision
       |FROM agg""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_classification_report", classificationReport,
      Some(classificationReportSql)),
    GraftQuery("q_confusion_at_cutoff", confusionAtCutoff, Some(confusionAtCutoffSql)),
    GraftQuery("q_ml_feature_importance", mlFeatureImportance, None,
      singleShot = true),
    GraftQuery("q_ml_tree_export", mlTreeExport, None, singleShot = true),
    GraftQuery("q_json_extract", jsonExtract, Some(jsonExtractSql)))
}
