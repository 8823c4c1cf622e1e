package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.builder("local[2]", 2)
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT stem_dutch('lichamen beelden') AS st,
        |  strip_accents('café ë') AS sa,
        |  damerau_levenshtein('ab', 'ba') AS dl,
        |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ad""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "licham beeld")
    assert(r.getString(1) == "cafe e")
    assert(r.getInt(2) == 1)
    assert(r.getDouble(3) == 11.0)
  }

  test("SQL misuse of custom expressions fails at analysis, not runtime") {
    val e = intercept[Exception] { spark.sql("SELECT stem_dutch(42)").collect() }
    assert(e.getMessage.contains("string") || e.getMessage.contains("DATATYPE"))
    val e2 = intercept[Exception] { spark.sql("SELECT array_dot('a', 'b')").collect() }
    assert(e2.getMessage.contains("array") || e2.getMessage.contains("DATATYPE"))
  }

  test("direct Tables.events load works without prior EventOps call") {
    assert(Tables.events(spark, "/root/testdata/sf0.001").count() > 0)
  }

  test("EHR csv source reads the reference sample shape") {
    val df = graft.sources.EhrCsv.readEhr(spark,
      "/root/reference/sample_data/dummydata.csv")
    assert(df.columns.toSeq == Seq("PATNR", "annotation", "text"))
    assert(df.count() > 100)
    assert(df.filter(df("annotation")).count() > 0)
  }
}
