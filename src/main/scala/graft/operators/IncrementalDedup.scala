package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental near-dup — the shape a 100 TB pipeline actually
  * runs daily: the corpus's MinHash signatures persist ONCE as a table
  * bucketed on the LSH band key, and each day's delta batch joins
  * against it shuffling ONLY the delta. The corpus-sized side streams
  * bucket-aligned files with no Exchange (the BucketingSpec co-location
  * property applied to the signature store); re-signing or re-shuffling
  * the historical corpus per batch — the cost that makes naive daily
  * dedup infeasible at scale — never happens.
  *
  * Store rows carry the full 16-hash signature next to each band key,
  * so a band collision verifies minhash agreement from the joined row
  * itself — no second lookup join against the store.
  */
object IncrementalDedup {

  /** Bucket count of the signature store — sized to the cluster (a
    * production store uses O(total cores); the join requires only that
    * readers agree with the written spec, which saveAsTable records.
    */
  val StoreBuckets = 8

  /** Materialize (or replace) the signature store for a corpus
    * snapshot: banded signature rows, bucketed AND sorted on the
    * (band, band_key) join key at write time — the pre-shuffle that
    * every future delta join reuses for free.
    */
  def writeStore(docs: DataFrame, table: String): Unit =
    Dedup.signatureBands(docs)
      .write.bucketBy(StoreBuckets, "band", "band_key")
      .sortBy("band", "band_key")
      .mode("overwrite").saveAsTable(table)

  /** Absorb a delta batch into the store after its dedup decision: the
    * delta's signature rows APPEND to the bucketed table (insertInto
    * honors the table's recorded bucket spec, so the new files land
    * bucket-aligned and tomorrow's delta join stays exchange-free on
    * the store side) — the write is sized to the delta, the historical
    * files are untouched.
    */
  def absorbDelta(s: SparkSession, delta: DataFrame, table: String): Unit =
    Dedup.signatureBands(delta)
      .select(s.table(table).columns.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").insertInto(table)

  /** Candidate near-dup matches of a DELTA batch against the store:
    * signature the delta (its own cost only), equi-join on
    * (band, band_key) — the store side reads bucket-aligned, the delta
    * side shuffles into the store's bucketing — dedup colliding pairs,
    * and report the minhash-agreement estimate from the two signatures
    * the matched row already carries. Append the delta's own
    * [[Dedup.signatureBands]] rows to the store table afterwards to
    * absorb the batch ([[absorbDelta]]).
    */
  def deltaAgainstStore(s: SparkSession, delta: DataFrame, table: String): DataFrame = {
    import s.implicits._
    val d = Dedup.signatureBands(delta)
      .select($"band", $"band_key", $"doc_id".as("delta_id"), $"sig".as("dsig"))
    val st = s.table(table)
      .select($"band", $"band_key", $"doc_id".as("store_id"), $"sig".as("ssig"))
    d.join(st, Seq("band", "band_key"))
      .where($"delta_id" =!= $"store_id")
      .select($"delta_id", $"store_id", $"dsig", $"ssig")
      .dropDuplicates("delta_id", "store_id")
      .select($"delta_id", $"store_id",
        (aggregate(zip_with($"dsig", $"ssig", (a, b) => (a === b).cast("int")),
          lit(0), (acc, x) => acc + x).cast("double") / Dedup.NumHashes)
          .as("est_jaccard"))
      .orderBy($"delta_id", $"store_id")
  }
}
