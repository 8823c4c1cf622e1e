package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ORC corpus sink/source — the columnar alternative for lakehouses
  * standardized on ORC rather than parquet. Same deterministic sharding
  * contract as [[JsonlCorpus]] (hash-of-doc_id shard membership, sorted
  * within shards, byte-reproducible run over run), and the reader keeps
  * predicate and column pushdown: a filtered, projected scan reads only
  * the matching stripes and columns (SourcesSpec asserts PushedFilters
  * and the narrowed ReadSchema on the ORC scan).
  */
object OrcCorpus {

  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Overwrite)
      .orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
