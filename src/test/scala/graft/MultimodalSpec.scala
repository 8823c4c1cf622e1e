package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mapPartitions batch decode agrees with the declarative stub pipeline") {
    import spark.implicits._
    val decoded = Multimodal.decodeFeatures(spark, dir).collect()
      .map(d => d.doc_id -> d).toMap
    val meta = Multimodal.multimodalMeta(spark, dir)
      .select($"doc_id", $"n_bytes", $"f0", $"f1", $"f2", $"f3")
      .as[(Long, Int, Double, Double, Double, Double)].collect()
    assert(meta.nonEmpty && decoded.size == meta.length)
    meta.foreach { case (id, nBytes, f0, f1, f2, f3) =>
      val d = decoded(id)
      assert(d.n_bytes == nBytes)
      assert(d.features.sameElements(Array(f0, f1, f2, f3)))
      assert(d.features.forall(f => f >= 0.0 && f < 1.0))
    }
  }

  test("real PNG payloads decode to true dimensions and channel means") {
    import spark.implicits._
    val png = Multimodal.plantedPng(13, 7)
    val payloads = Seq(
      1L -> png,
      2L -> "definitely not an image".getBytes("UTF-8")).toDS()
    val out = Multimodal.decodeImages(payloads).collect()
      .map(d => d.doc_id -> d).toMap
    val img = out(1L)
    assert(img.mime == "image/png" && img.width == 13 && img.height == 7)
    assert(img.n_bytes == png.length)
    // expected channel means straight from the generator formula
    val exR = (0 until 13).map(x => x * 255 / 12).sum / 13.0 / 255.0
    val exG = (0 until 7).map(y => y * 255 / 6).sum / 7.0 / 255.0
    val exB = 0x40 / 255.0
    assert(math.abs(img.features(0) - exR) < 1e-12, s"r=${img.features(0)}")
    assert(math.abs(img.features(1) - exG) < 1e-12, s"g=${img.features(1)}")
    assert(math.abs(img.features(2) - exB) < 1e-12, s"b=${img.features(2)}")
    val other = out(2L)
    assert(other.mime == "application/octet-stream" &&
      other.width == -1 && other.features.isEmpty)
  }

  test("PNG decode round-trips through a many-partition frame") {
    import spark.implicits._
    // one payload per partition: the per-partition reader init path runs
    // on every partition, not just once
    val payloads = (0 until 8)
      .map(i => i.toLong -> Multimodal.plantedPng(3 + i, 4)).toDS()
      .repartition(8)
    val out = Multimodal.decodeImages(payloads).collect()
    assert(out.length == 8)
    out.foreach(d => assert(d.mime == "image/png" && d.width == 3 + d.doc_id))
  }
}
