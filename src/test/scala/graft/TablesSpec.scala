package graft

import graft.operators.EventOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Loader-contract spec: the events table has shipped with two parquet
  * timestamp encodings over time (TIMESTAMP(NANOS) behind the
  * nanosAsLong flag, and plain TIMESTAMP_MICROS), and a driver-side
  * regeneration once swapped one for the other mid-build. EventOps must
  * canonicalize `ts` to a microsecond TimestampType from EITHER
  * encoding, so a future swap can't silently take out the events query
  * family again. The nanos side reads a committed fixture
  * (src/test/resources/events_nanos); the micros side reads the real
  * driver-generated table.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"
  val nanosDir: String =
    getClass.getResource("/events_nanos/events.parquet").getPath
      .stripSuffix("/events.parquet")

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("events loads under the current driver-generated encoding and " +
    "canonicalizes to TimestampType") {
    val raw = Tables.events(spark, dir)
    val tsType = raw.schema("ts").dataType
    assert(tsType == LongType || tsType == TimestampType ||
      tsType == TimestampNTZType, s"unexpected ts type $tsType")
    val canon = EventOps.events(spark, dir)
    assert(canon.schema("ts").dataType == TimestampType)
    assert(canon.count() > 0)
  }

  test("events.event_id is globally unique (the streamDedupExact " +
    "raw-table-oracle data contract)") {
    // q_stream_dedup_exact's first-arrival dedup equals the raw events
    // table ONLY if event_id never repeats in the generated corpus; a
    // generator change that broke this would surface as a streaming
    // hash mismatch, so the generator contract is pinned HERE (one scan
    // in the test layer) instead of on every stream drive (ADVICE r18)
    val ev = EventOps.events(spark, dir)
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("nd"))
      .head()
    assert(ev.getLong(0) == ev.getLong(1),
      s"events.event_id must be unique: ${ev.getLong(0)} rows, " +
        s"${ev.getLong(1)} distinct ids")
  }

  test("events loads from a nanos-encoded footer (legacy flag path) and " +
    "canonicalizes identically") {
    import spark.implicits._
    val raw = Tables.events(spark, nanosDir)
    // under nanosAsLong the scan surfaces INT64 nanos
    assert(raw.schema("ts").dataType == LongType)
    val canon = EventOps.canonicalTs(raw)
    assert(canon.schema("ts").dataType == TimestampType)
    // fixture row 1 is 2024-01-01T00:07:00 (event_id=1, 7-minute stride)
    val first = canon.where($"event_id" === 1)
      .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(first == "2024-01-01 00:07:00")
    assert(canon.count() == 8)
  }

  test("documents and embeddings carry the schemas the oracle SQL is written against") {
    // the source round-trip and quantizer oracles are STATIC SQL over
    // these columns — a driver-side regeneration that drops or retypes
    // one must fail HERE with a named column, not as a cryptic
    // correctness-row error (the r13 events-drift lesson, applied to
    // the other two load-bearing tables)
    val docs = Tables.documents(spark, dir).schema
      .map(f => f.name -> f.dataType.typeName).toMap
    assert(docs.get("doc_id").contains("long") &&
      docs.get("text").contains("string") &&
      docs.get("lang").contains("string") &&
      docs.get("source").contains("string") &&
      docs.get("n_chars").contains("long"), s"documents schema drifted: $docs")
    val emb = Tables.embeddings(spark, dir).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    assert(emb.get("vec_id").contains("bigint") &&
      emb.get("embedding").exists(_.startsWith("array<float")) &&
      emb.contains("label"), s"embeddings schema drifted: $emb")
  }

  test("canonicalTs is a no-op on an already-canonical frame") {
    val canon = EventOps.events(spark, dir)
    assert(EventOps.canonicalTs(canon).schema("ts").dataType == TimestampType)
  }

  test("nanos footer without the legacy flag fails with actionable guidance") {
    // session-scoped SQL conf: a sibling session can drop the flag
    // without touching the suite session
    val bare = spark.newSession()
    bare.conf.unset(Tables.NanosFlag)
    val e = intercept[IllegalArgumentException] {
      Tables.events(bare, nanosDir).schema
    }
    assert(e.getMessage.contains(Tables.NanosFlag),
      s"guidance must name the flag: ${e.getMessage}")
    // the micros table still loads fine without the flag
    assert(Tables.events(bare, dir).count() > 0)
  }
}
