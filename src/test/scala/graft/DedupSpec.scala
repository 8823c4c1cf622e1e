package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("simhashPairs chunk-candidate equals brute-force hamming filter") {
    import spark.implicits._
    val fp = Dedup.simhash(spark, dir).cache()
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        call_function("bit_count",
          $"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .where($"hamming" <= 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val chunked = Dedup.simhashPairs(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(chunked == brute)
  }

  test("prefix-filtered jaccard equals the inverted-index join") {
    import spark.implicits._
    val plain = Dedup.ngramJaccard(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val prefix = Dedup.ngramJaccardPrefix(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(prefix == plain)
    assert(plain.nonEmpty)
  }

  test("prefix filter stays exact at non-default tau (rational bounds)") {
    import spark.implicits._
    // tau=0 disables all pruning -> every shared-shingle pair with its
    // exact jaccard; filtering that at 0.8 is the ground truth for tau=0.8
    val expected = Dedup.ngramJaccardPrefix(spark, dir, 0.0)
      .where($"jaccard" >= 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val got = Dedup.ngramJaccardPrefix(spark, dir, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("exact dedup keep_id is the minimum doc of each content group") {
    import spark.implicits._
    val total = Tables.documents(spark, dir).count()
    val d = Dedup.exact(spark, dir)
    assert(d.agg(sum($"n_copies")).as[Long].collect().head == total)
  }

  test("LSH ANN index: every band's buckets partition all vectors") {
    import spark.implicits._
    // round-18 multi-table census: one row per (band, bits) bucket —
    // each of the 32 band tables must partition the full store
    val buckets = Similarity.annLsh(spark, dir)
    val total = Tables.embeddings(spark, dir).count()
    val perBand = buckets.groupBy($"band").agg(sum($"n_vecs").as("nv"))
      .select($"nv").as[Long].collect()
    assert(perBand.length == 32 && perBand.forall(_ == total))
  }

  test("lsh planner: threshold falls and candidate volume grows with band count") {
    import spark.implicits._
    val plan = Dedup.lshPlan(spark, dir)
      .select($"bands", $"s_star", $"cand_pairs")
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    assert(plan.map(_._1).toSeq == Seq(1, 2, 4, 8, 16))
    // more, coarser bands = lower curve threshold and more generated
    // candidates — the recall/work tradeoff the planner exists to show
    assert(plan.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 <= b._3 })
    // the registered 4x4 banding sits at the router's tau=0.7 floor
    val s4 = plan.find(_._1 == 4).get._2
    assert(math.abs(s4 - 0.707107) < 1e-6)
  }

  test("containment finds the embedded doc one-directionally where jaccard misses it") {
    import spark.implicits._
    // doc 2 is a verbatim sub-span of doc 1: containment(2 in 1) = 1.0,
    // but symmetric jaccard is ~14/38 — below any dedup threshold
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (10 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, "totally unrelated text here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentOn(spark, docs, 0.8)
      .select($"id_a", $"id_b", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((2L, 1L, 1.0)))
  }

  test("minhash accuracy scoreboard: exact jaccard recomputed independently, error consistent") {
    import spark.implicits._
    val sb = Dedup.minhashAccuracy(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(sb.nonEmpty)
    // the scoreboard covers exactly the LSH candidate pairs
    val est = Dedup.minhashLsh(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(sb.map(r => (r._1, r._2)).toSet == est)
    // exact jaccard column agrees with the unpruned inverted-join truth
    val truth = Dedup.ngramJaccardPrefix(spark, dir, 0.0)
      .select($"id_a", $"id_b", round($"jaccard", 6))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    sb.foreach { case (a, b, estJ, exact, err) =>
      assert(math.abs(exact - truth.getOrElse((a, b), 0.0)) < 1e-9,
        s"pair ($a,$b)")
      assert(math.abs(err - math.abs(estJ - exact)) < 1e-5)
      assert(estJ >= 0.0 && estJ <= 1.0 && exact >= 0.0 && exact <= 1.0)
    }
  }

  test("edit-distance verify covers the LSH candidates with consistent similarity") {
    import spark.implicits._
    val rows = Dedup.editDistancePairs(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    val cand = Dedup.minhashLsh(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == cand)
    val texts = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { case (a, b, dist, sim, isDup) =>
      val mx = math.max(texts(a).length, texts(b).length)
      assert(sim >= 0.0 && sim <= 1.0)
      assert(math.abs(sim - (1.0 - dist.toDouble / mx)) < 1e-5)
      assert(isDup == (dist * 5 <= mx))
      // spot-check the distance itself on the shorter pairs
      if (texts(a).length + texts(b).length < 400) {
        val d = {
          val (s1, s2) = (texts(a), texts(b))
          val dp = Array.tabulate(s2.length + 1)(identity)
          for (i <- 1 to s1.length) {
            var prev = dp(0); dp(0) = i
            for (j <- 1 to s2.length) {
              val t = dp(j)
              dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
                prev + (if (s1(i - 1) == s2(j - 1)) 0 else 1))
              prev = t
            }
          }
          dp(s2.length)
        }
        assert(d.toLong == dist, s"pair ($a,$b)")
      }
    }
  }

  test("containment prefix filter equals the unpruned inverted join") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // tau=0 disables prefix/size/positional pruning -> every
    // shared-shingle ordered pair with its exact containment
    val brute = Dedup.containmentOn(spark, docs, 0.0)
      .where($"containment" >= 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val got = Dedup.containmentOn(spark, docs, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
