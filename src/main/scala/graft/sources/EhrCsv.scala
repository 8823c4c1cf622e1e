package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Sources/sinks matching the reference's file formats: the `;`-separated
  * EHR annotation CSV it ingests (reference: notebook cell 4,
  * sample_data/dummydata.csv with columns PATNR;annotation;text) and the
  * `|`-separated predictions CSV it emits (writePredictionsToFile,
  * reference: src/NLP_functions.py:214).
  */
object EhrCsv {

  val ehrSchema: StructType = StructType(Seq(
    StructField("PATNR", DoubleType),
    StructField("annotation", BooleanType),
    StructField("text", StringType)))

  /** Read the reference's EHR CSV shape. An explicit schema keeps the
    * read single-pass (no sampling job); multiLine handles document
    * text with embedded newlines — [[writeEhr]] quotes them, and
    * without the option the line-oriented reader would mis-parse the
    * quoted record into malformed rows (silent NULLs under PERMISSIVE).
    * The cost is per-FILE instead of per-line-split parallelism, the
    * standard trade for quoted-newline CSV; at scale the ingest lands
    * in many files, so parallelism comes from file count.
    */
  def readEhr(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("multiLine", "true")
      .schema(ehrSchema)
      .csv(path)

  /** Write predictions in the reference's pipe-separated shape. */
  def writePredictions(df: DataFrame, path: String): Unit =
    df.write.option("sep", "|").option("header", "true")
      .mode("overwrite").csv(path)

  /** Write the reference's `;`-separated EHR shape — the sink half of
    * the round-trip the registered q_source_ehr_roundtrip hash-checks
    * (quoting handles embedded separators; [[readEhr]]'s explicit
    * schema reads it back typed).
    */
  def writeEhr(df: DataFrame, path: String): Unit =
    df.write.option("sep", ";").option("header", "true")
      .mode("overwrite").csv(path)
}
