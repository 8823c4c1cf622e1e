package graft

import graft.sources.{JsonlCorpus, OrcCorpus}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("jsonl round-trip preserves the corpus") {
    import spark.implicits._
    val out = "/tmp/graft_jsonl_rt"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source")
    JsonlCorpus.write(docs, out, shards = 4)
    val back = JsonlCorpus.read(spark, out)
    val (clean, corrupt) = JsonlCorpus.quarantine(back)
    assert(corrupt.count() == 0)
    assert(clean.count() == docs.count())
    val a = docs.as[(Long, String, String, String)].collect().toSet
    val b = clean.select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)].collect().toSet
    assert(a == b)
  }

  test("orc round-trip preserves the corpus and pushes filters into the scan") {
    import spark.implicits._
    val out = "/tmp/graft_orc_rt"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source")
    OrcCorpus.write(docs, out, shards = 4)
    val back = OrcCorpus.read(spark, out)
    val a = docs.as[(Long, String, String, String)].collect().toSet
    val b = back.select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)].collect().toSet
    assert(a == b)
    // predicate + column pushdown reach the ORC scan
    val plan = back.where($"doc_id" >= 100).select($"doc_id", $"lang")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(doc_id,100)"), plan.take(2000))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      plan.take(2000))
  }

  test("jsonl quarantine isolates malformed lines without failing the scan") {
    val out = "/tmp/graft_jsonl_bad"
    val d = new java.io.File(out)
    d.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/shard0.jsonl"),
      """{"doc_id": 1, "text": "ok row", "lang": "en", "source": "s"}
        |this line is not json
        |{"doc_id": 2, "text": "also ok", "lang": "nl", "source": "s"}
        |""".stripMargin)
    val (clean, corrupt) = JsonlCorpus.quarantine(JsonlCorpus.read(spark, out))
    assert(clean.count() == 2)
    assert(corrupt.count() == 1)
  }
}
