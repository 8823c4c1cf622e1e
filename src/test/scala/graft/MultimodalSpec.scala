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
}
