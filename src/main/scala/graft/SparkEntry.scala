package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All registered operators, in SURVEY §2 order. */
  val all: Seq[GraftQuery] =
    Relational.queries ++ TextQueries.queries ++ Features.queries ++
      Evaluation.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ EventOps.queries ++ Multimodal.queries ++
      TypoCorrection.queries ++ Extras.queries ++ Temporal.queries ++ Curation.queries ++
      Corpus.queries ++ Bpe.queries ++ Ulm.queries ++ SkewJoin.queries ++
      IncrementalDedup.queries ++ graft.streaming.StreamQueries.queries ++
      graft.sources.SourceQueries.queries ++
      graft.ml.Classifiers.queries ++ graft.ml.CrossVal.queries ++
      graft.ml.MeanRoc.queries ++ graft.ml.ModelEval.queries ++
      graft.ml.NamedFeatures.queries ++ graft.ml.GridSearch.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
