package graft

import graft.operators.{Dedup, Evaluation, TextQueries}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks of the operator library on the sf0.001 golden tables
  * (full value-level parity with DuckDB is covered by tools/selfcheck.py
  * and the driver's oracle gate; these pin down invariants).
  */
class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("entry returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query name has unique key and oracle keys subset") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("minhash est_jaccard upper-bounds agree with exact jaccard pairs") {
    import spark.implicits._
    val exact = Dedup.ngramJaccard(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(spark, dir)
      .where($"est_jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // LSH candidates at est>=0.5 should recover the genuine near-dups
    assert(lsh.intersect(exact).size >= (exact.size * 0.8).toInt)
  }

  test("calibration bins partition the corpus and brier matches a driver recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bins = Evaluation.calibration(spark, dir)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(bins.nonEmpty)
    val docs = graft.Tables.documents(spark, dir).count()
    assert(bins.map(_._2).sum == docs)
    // one global brier value on every row
    assert(bins.map(_._6).distinct.length == 1)
    bins.foreach { case (bin, n, pos, rate, mean, _) =>
      assert(bin >= 0 && bin <= 9 && pos <= n)
      assert(math.abs(rate - pos.toDouble / n) < 1e-6)
      // mean predicted score sits inside (or at the rounded edge of) its bin
      assert(mean >= bin / 10.0 - 1e-6 && mean <= (bin + 1) / 10.0 + 1e-6)
    }
    val exp = Evaluation.scored(spark, dir)
      .select(avg(pow($"score" - $"y", 2))).as[Double].head()
    assert(math.abs(bins.head._6 - exp) < 1e-5)
  }

  test("ROC curve is monotone and ends at (1,1)") {
    import spark.implicits._
    val roc = Evaluation.rocCurve(spark, dir)
      .select($"tpr", $"fpr").as[(Double, Double)].collect()
    assert(roc.last == ((1.0, 1.0)))
    assert(roc.sliding(2).forall { case Array(a, b) => b._1 >= a._1 && b._2 >= a._2 })
  }

  test("merge entries preserves every source document's text length") {
    import spark.implicits._
    val merged = TextQueries.mergeEntries(spark, dir)
      .select($"n_entries").as[Long].collect().sum
    val total = Tables.documents(spark, dir).count()
    assert(merged == total)
  }
}
