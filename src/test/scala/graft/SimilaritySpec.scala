package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the k-means IVF variant must retrieve a meaningful share
  * of the true (brute-force) top-5 neighbors while scanning only
  * nprobe/nlist of the corpus, and repeat runs must be deterministic.
  */
class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.select($"q_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("k-means IVF recalls the brute-force top-5 well above the scan fraction") {
    val truth = neighborSets(Similarity.annCosineTopK(spark, dir))
    val ivf = neighborSets(Similarity.annIvfKmeans(spark, dir))
    val recalls = truth.map { case (q, ts) =>
      ivf.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe/nlist = 2/16 scans ~12.5% of the corpus; a working coarse
    // quantizer must beat that fraction by a wide margin
    assert(truth.size == 10 && mean >= 0.3, s"mean recall $mean")
  }

  test("k-means IVF is run-to-run deterministic") {
    val a = Similarity.annIvfKmeans(spark, dir).collect().toSeq
    val b = Similarity.annIvfKmeans(spark, dir).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("blocked pair enumeration equals the brute-force cosine dedup exactly") {
    val blocked = Similarity.cosineDedupBlocked(spark, dir).collect().toSeq
    val brute = Similarity.cosineDedup(spark, dir).collect().toSeq
    assert(blocked.nonEmpty && blocked == brute)
  }

}
