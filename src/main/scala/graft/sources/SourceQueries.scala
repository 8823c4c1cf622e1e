package graft.sources

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REGISTERED source/sink round-trips (SURVEY §2.I) — promoting the
  * format components from spec-only into the driver's oracle gate
  * (round 15): each query writes the documents corpus through a graft
  * sink into a pid-scoped scratch directory, reads it back through the
  * matching graft source, and returns the rows — the ORACLE is plain
  * SQL over the original parquet table, so a hash match proves the
  * sink→source round-trip VALUE-EXACT (types, encodings, quarantine
  * path, partition-directory layout), not just row-counted. Overwrite
  * sinks make every query idempotent; paths are pid-scoped (the
  * GraftSession warehouse convention) so concurrent runs cannot
  * clobber each other.
  */
object SourceQueries {

  private def scratch(name: String): String =
    s"/tmp/graft_srcq_${ProcessHandle.current().pid()}/$name"

  /** JSONL sink → quarantined JSONL source: deterministic shards out,
    * PERMISSIVE schema-first read back (zero corrupt rows on a clean
    * write — the quarantine split runs for real and its clean branch is
    * what the oracle checks). n_chars is not part of the JSONL
    * interchange schema, so the round-trip carries the four document
    * columns.
    */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = scratch("jsonl")
    JsonlCorpus.write(
      Tables.documents(s, dir).select($"doc_id", $"text", $"lang", $"source"),
      path, shards = 4)
    // the clean branch inline (corrupt-column NULL filter) rather than
    // JsonlCorpus.quarantine: quarantine caches its parse for the
    // two-branch split and hands the unpersist to the caller — a
    // registered query re-run per bench rep must not accumulate cached
    // copies it can never release
    JsonlCorpus.read(s, path)
      .where($"_corrupt".isNull)
      .select($"doc_id", $"text", $"lang", $"source").orderBy($"doc_id")
  }

  val jsonlRoundtripSql: String =
    """SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id"""

  /** ORC sink → ORC source: the columnar round-trip with the full
    * document schema (ORC preserves every type).
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = scratch("orc")
    OrcCorpus.write(Tables.documents(s, dir), path, shards = 4)
    OrcCorpus.read(s, path)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val orcRoundtripSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"""

  /** Hive-partitioned layout → pruned slice read: the corpus lands one
    * directory per lang, and the registered read filters lang = 'en' —
    * the filter becomes DIRECTORY pruning (PartitionFilters; the other
    * languages' files are never listed or opened — SourcesSpec asserts
    * the executed scan's numFiles), and the oracle checks the slice's
    * VALUES including the partition column round-tripping through its
    * directory encoding.
    */
  def partitionedPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = scratch("partitioned")
    PartitionedCorpus.write(Tables.documents(s, dir), path, "lang", shards = 4)
    PartitionedCorpus.read(s, path)
      .where($"lang" === "en")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val partitionedPruneSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |WHERE lang = 'en' ORDER BY doc_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_source_jsonl_roundtrip", jsonlRoundtrip, Some(jsonlRoundtripSql)),
    GraftQuery("q_source_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    GraftQuery("q_partitioned_prune", partitionedPrune, Some(partitionedPruneSql)))
}
