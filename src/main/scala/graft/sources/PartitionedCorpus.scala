package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet corpus layout — the physical design that
  * turns slice predicates into DIRECTORY pruning at 100 TB: writing
  * `partitionBy(lang)` lays one directory per language, and a reader
  * filtering on the partition column never lists, opens, or schedules
  * the other directories' files at all. This is stronger than row-group
  * predicate pushdown (PushedFilters still opens every footer): the
  * filter shows up as PartitionFilters on the scan and the input-file
  * set shrinks to the matching directories — the difference between
  * scanning 100 TB and scanning the 2 TB English slice. Within each
  * partition the deterministic doc_id sharding contract of
  * [[JsonlCorpus]]/[[OrcCorpus]] holds, so runs are byte-reproducible.
  * Partition columns should be low-cardinality slice keys (lang,
  * source, date); high-cardinality keys explode the directory count
  * and kill listing — that rule is the caller's contract.
  */
object PartitionedCorpus {

  def write(df: DataFrame, path: String, partitionCol: String, shards: Int): Unit =
    df.repartition(shards, col("doc_id"))
      .sortWithinPartitions(partitionCol, "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
