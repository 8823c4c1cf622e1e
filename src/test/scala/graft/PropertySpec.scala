package graft

import graft.operators.{Corpus, Dedup, Evaluation}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-case guards for the round's two core distributed
  * algorithms, each checked against a straightforward Scala reference
  * on seeded pseudo-random inputs (deterministic, CI-stable): the
  * large-star/small-star contraction vs brute-force connected
  * components, and the bucketed two-pass prefix-sum vs a naive global
  * cumsum.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.keys.map { n =>
      var seen = Set(n); var frontier = Set(n)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(seen)
        seen ++= frontier
      }
      n -> seen.min
    }.toMap
  }

  test("star contraction equals brute-force components on 25 random graphs") {
    import spark.implicits._
    (1 to 25).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(49)
      val m = rnd.nextInt(81)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = bruteComponents(edges).toSet
      val got = Corpus.starContract(spark, edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed n=$n m=${edges.size}")
    }
  }

  test("cumTallies equals the naive global cumsum on 20 random tally frames") {
    import spark.implicits._
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val k = 1 + rnd.nextInt(40)
      // distinct scores on a [0,1] grid (cumTallies' density contract)
      val rows = rnd.shuffle((0 to 40).toList).take(k).map { g =>
        val c = 1L + rnd.nextInt(5)
        (g / 40.0, c, rnd.nextLong(c + 1))
      }
      val expected = rows.sortBy(-_._1)
        .scanLeft((0.0, 0L, 0L)) { case ((_, rk, tp), (s, c, cp)) => (s, rk + c, tp + cp) }
        .drop(1).map { case (s, rk, tp) => s -> ((rk, tp)) }.toMap
      val got = Evaluation.cumTallies(rows.toDF("score", "c", "cp"), Nil)
        .select($"score", $"rk", $"cum_tp").as[(Double, Long, Long)]
        .collect().map { case (s, rk, tp) => s -> ((rk, tp)) }.toMap
      assert(got == expected, s"seed=$seed k=$k")
    }
  }

  test("positional-filtered prefix join equals brute-force jaccard on 12 random corpora") {
    import spark.implicits._
    // small vocab → hot shingles, shared 3-grams, boundary doc sizes —
    // the regime where a wrong prefix length or positional bound drops a
    // qualifying pair
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val docs = (0L until (10 + rnd.nextInt(30)).toLong).map { id =>
        val len = 3 + rnd.nextInt(18)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // exact rational τ, the same num/den arithmetic as the plan — a
      // double quotient could disagree at exact boundaries (J == τ)
      val (tau, num, den) =
        Seq((0.3, 3L, 10L), (0.5, 5L, 10L), (0.75, 75L, 100L))(rnd.nextInt(3))
      def shingleSet(text: String): Set[String] = {
        val t = text.split("\\s+").filter(_.nonEmpty)
        t.indices.collect {
          case i if i + 3 <= t.length => t.slice(i, i + 3).mkString(" ")
        }.toSet
      }
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = sa.intersect(sb).size.toLong
        if sa.nonEmpty && sb.nonEmpty &&
          inter * den >= num * (sa.size + sb.size - inter)
      } yield (ia, ib)).toSet
      val got = Dedup.ngramJaccardPrefixOn(spark, docs.toDF("doc_id", "text"), tau)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed tau=$tau docs=${docs.size}")
    }
  }

  test("one-sided containment prefix join equals brute force on 12 random corpora") {
    import spark.implicits._
    // same adversarial regime as the jaccard property: hot shingles,
    // shared 3-grams, boundary sizes — where a wrong one-sided prefix
    // length, size bound, or positional bound drops a qualifying pair
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(2000 + seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val docs = (0L until (10 + rnd.nextInt(30)).toLong).map { id =>
        val len = 3 + rnd.nextInt(18)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val (tau, num, den) =
        Seq((0.3, 3L, 10L), (0.5, 5L, 10L), (0.8, 8L, 10L))(rnd.nextInt(3))
      def shingleSet(text: String): Set[String] = {
        val t = text.split("\\s+").filter(_.nonEmpty)
        t.indices.collect {
          case i if i + 3 <= t.length => t.slice(i, i + 3).mkString(" ")
        }.toSet
      }
      // ORDERED pairs: containment is asymmetric
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = sa.intersect(sb).size.toLong
        if sa.nonEmpty && sb.nonEmpty && inter * den >= num * sa.size
      } yield (ia, ib)).toSet
      val got = Dedup.containmentOn(spark, docs.toDF("doc_id", "text"), tau)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed tau=$tau docs=${docs.size}")
    }
  }

  test("cumTallies with a partition column keeps groups independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      gi <- rnd.shuffle((0 to 40).toList).take(10 + rnd.nextInt(20))
    } yield {
      val c = 1L + rnd.nextInt(4)
      (g, gi / 40.0, c, rnd.nextLong(c + 1))
    }
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(-_._2)
        .scanLeft(("", 0.0, 0L, 0L)) { case ((_, _, rk, tp), (_, s, c, cp)) =>
          (g, s, rk + c, tp + cp)
        }.drop(1).map { case (gg, s, rk, tp) => (gg, s) -> ((rk, tp)) }
    }.toMap
    val got = Evaluation.cumTallies(rows.toDF("g", "score", "c", "cp"), Seq("g"))
      .select($"g", $"score", $"rk", $"cum_tp").as[(String, Double, Long, Long)]
      .collect().map { case (g, s, rk, tp) => (g, s) -> ((rk, tp)) }.toMap
    assert(got == expected)
  }
}
