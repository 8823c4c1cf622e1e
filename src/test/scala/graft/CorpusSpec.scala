package graft

import graft.operators.{Corpus, Dedup, Evaluation, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-2 corpus-curation operators (value
  * parity with DuckDB is covered by the oracle gate).
  */
class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dedup clusters: labels are component minima and pairs co-cluster") {
    import spark.implicits._
    val labels = Corpus.dedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(labels.nonEmpty)
    // a cluster id is always a member's id, never above its node
    labels.foreach { case (doc, cl) => assert(cl <= doc && labels(cl) == cl) }
    // every near-dup pair lands in the same cluster
    val pairs = Dedup.minhashLsh(spark, dir)
      .where($"est_jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
  }

  test("star-contraction clusters equal the propagation fixpoint") {
    import spark.implicits._
    val prop = Corpus.dedupClusters(spark, dir).as[(Long, Long)].collect().toSet
    val star = Corpus.dedupClustersStar(spark, dir).as[(Long, Long)].collect().toSet
    assert(star == prop && star.nonEmpty)
  }

  test("star contraction labels adversarial graphs with component minima") {
    import spark.implicits._
    // a deep path (the propagation worst case), a star, a triangle with
    // a bridge, an isolated pair — and reversed/duplicated edge noise
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (20L, 21L), (20L, 22L), (23L, 20L),
      (30L, 31L), (31L, 32L), (32L, 30L), (32L, 33L),
      (40L, 41L), (41L, 40L), (2L, 3L))
    val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.map { n =>
      val root = if (n <= 8) 1L else if (n <= 23) 20L else if (n <= 33) 30L else 40L
      n -> root
    }.toSet
    val got = Corpus.starContract(spark,
        edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("contamination check hits only corpus docs vs the benchmark set") {
    import spark.implicits._
    val rows = Corpus.contamination(spark, dir)
      .select($"doc_id", $"bench_id", $"n_shared")
      .as[(Long, Long, Long)].collect()
    assert(rows.forall { case (d, b, n) => d >= 20 && b < 20 && n >= 2 })
  }

  test("stratified sample keeps lang-dependent rates and is deterministic") {
    import spark.implicits._
    val sampled = Corpus.stratifiedSample(spark, dir)
    val total = Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val got = sampled.groupBy($"lang").agg(count(lit(1)).as("k"))
      .join(total, "lang")
      .select($"lang", ($"k".cast("double") / $"n").as("rate"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (lang, rate) =>
      val target = if (lang == "en") 0.10 else 0.30
      assert(math.abs(rate - target) < 0.12, s"$lang rate $rate")
    }
    // partition-count invariance
    val a = sampled.as[(Long, String)].collect().toSet
    val b = Corpus.stratifiedSample(spark, dir).repartition(13)
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("per-source caps keep the quality-top N of every source") {
    import spark.implicits._
    val kept = Corpus.sourceCaps(spark, dir)
      .select($"source", $"rank", $"doc_id", $"quality")
      .as[(String, Int, Long, Double)].collect()
    val perSource = kept.groupBy(_._1)
    val allSources = Tables.documents(spark, dir)
      .select($"source").distinct().as[String].collect().toSet
    assert(perSource.keySet == allSources, "a source vanished from the cap")
    // ranks are 1..cap and ordered by (quality desc, doc_id asc)
    perSource.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.length <= Corpus.SourceCap)
      val order = sorted.map(r => (-r._4, r._3)).toSeq
      assert(order == order.sorted, s"rank order broken: $sorted")
    }
    // the kept set IS the per-source quality top-N of the full scoring
    val full = TextAnalysis.qualityScore(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"source"), "doc_id")
      .select($"source", $"doc_id", $"quality")
      .as[(String, Long, Double)].collect()
    full.groupBy(_._1).foreach { case (src, rows) =>
      val expect = rows.sortBy(r => (-r._3, r._2))
        .take(Corpus.SourceCap).map(_._2).toSet
      val got = perSource(src).map(_._3).toSet
      assert(got == expect, s"$src kept $got, expected $expect")
    }
  }

  test("HLL distinct stays within 5% of exact per event type") {
    import spark.implicits._
    Corpus.distinctApprox(spark, dir)
      .select($"exact_users", $"approx_users")
      .as[(Long, Long)].collect().foreach { case (exact, approx) =>
        assert(math.abs(approx - exact).toDouble / exact < 0.05,
          s"approx $approx vs exact $exact")
      }
  }

  test("mixture materialization realizes each source's boost in expectation") {
    import spark.implicits._
    val applied = Corpus.mixtureApply(spark, dir).cache()
    val w = Corpus.mixtureTemperature(spark, dir)
      .select($"source", $"boost").as[(String, Double)].collect().toMap
    // copy counts are floor(boost) or floor(boost)+1, nothing else
    val bad = applied.where($"n_copies" < floor($"boost") ||
      $"n_copies" > floor($"boost") + 1).count()
    assert(bad == 0)
    // per-source mean copies tracks the boost (Bernoulli fraction draw;
    // 3-sigma binomial tolerance on the per-source doc count)
    applied.groupBy($"source")
      .agg(avg($"n_copies".cast("double")).as("m"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .foreach { case (src, m, n) =>
        val tol = 3 * math.sqrt(0.25 / n) + 1e-6
        assert(math.abs(m - w(src)) <= tol,
          s"$src mean $m vs boost ${w(src)} (n=$n)")
      }
    // deterministic: the same corpus draws the same copies
    val a = applied.select($"doc_id", $"n_copies").as[(Long, Long)].collect().toSet
    val b = Corpus.mixtureApply(spark, dir)
      .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(a == b)
    applied.unpersist()
  }

  test("count-min estimates dominate exact counts within the sketch bound") {
    import spark.implicits._
    val hh = Corpus.heavyHitters(spark, dir)
      .select($"exact_count", $"cms_estimate").as[(Long, Long)].collect()
    assert(hh.length == 20)
    val nTokens = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")))
      .count()
    hh.foreach { case (exact, est) =>
      // the CMS hard guarantee: never an underestimate; overestimate
      // bounded by colliding mass — N/64 is 16x the per-row expectation
      // for width 1024, far above any plausible 4-row min
      assert(est >= exact, s"CMS underestimated: $est < $exact")
      assert(est - exact <= nTokens / 64, s"overestimate $est vs $exact")
    }
  }

  test("IVF ANN returns valid per-query rankings with true cosines") {
    import spark.implicits._
    val ivf = Similarity.annIvf(spark, dir)
      .select($"q_id", $"neighbor_id", $"cos", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    val brute = Similarity.annCosineTopK(spark, dir)
      .select($"q_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length))
      assert(rows.length <= 5)
    }
    // where IVF and brute force agree on a neighbor, the cosine is identical
    ivf.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(bc == c)) }
  }

  test("repetition signals stay in range and bound each other") {
    import spark.implicits._
    // top_bigram_ratio is NULL by contract for sub-2-token docs (left
    // join), so decode it as an Option
    Corpus.repetitionFilter(spark, dir)
      .select($"n_tokens", $"n_distinct", $"dup_token_ratio",
        $"top_token_ratio", $"top_bigram_ratio")
      .as[(Long, Long, Double, Double, Option[Double])].collect().foreach {
        case (n, d, dup, topTok, topBg) =>
          assert(d <= n && dup >= 0.0 && dup < 1.0)
          assert(topTok > 0.0 && topTok <= 1.0)
          topBg.foreach(r => assert(r > 0.0 && r <= 1.0))
      }
  }

  test("span dedup reports only cross-doc spans with keep = min doc") {
    import spark.implicits._
    val rows = Corpus.spanDedup(spark, dir)
      .select($"n_docs", $"n_occurrences", $"keep_id")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, no, _) => assert(nd > 1 && no >= nd) }
  }

  test("source mixture weights recover the uniform target") {
    import spark.implicits._
    val rows = Corpus.sourceMixture(spark, dir)
      .select($"n_tokens", $"weight").as[(Long, Double)].collect()
    val total = rows.map(_._1).sum.toDouble
    rows.foreach { case (nt, w) =>
      // weight * source share == 1 / n_sources
      assert(math.abs(w * nt / total - 1.0 / rows.length) < 1e-12)
    }
  }

  test("unimax allocation waterfills: budget conserved, epochs capped, waterline shared") {
    import spark.implicits._
    val rows = Corpus.mixtureUnimax(spark, dir)
      .select($"n_tokens", $"capacity", $"allocation", $"epochs", $"capped")
      .as[(Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_._1).sum / 2
    // allocations sum to the budget (up to the per-row 2-dp rounding)
    assert(math.abs(rows.map(_._3).sum - budget) <= rows.length,
      s"sum ${rows.map(_._3).sum} vs budget $budget")
    rows.foreach { case (nt, cap, alloc, epochs, capped) =>
      assert(cap == nt * Corpus.UniMaxEpochCap)
      assert(alloc > 0 && alloc <= cap + 0.01)
      assert(epochs <= Corpus.UniMaxEpochCap + 1e-6)
      assert(math.abs(epochs - alloc / nt) < 1e-4)
      if (capped) assert(math.abs(alloc - cap) < 0.01, "capped => full capacity")
    }
    // every uncapped source sits on one shared waterline
    val waterlines = rows.filter(!_._5).map(_._3).distinct
    assert(waterlines.length <= 1, s"uncapped allocations differ: $waterlines")
    // a capped source's capacity must sit below the waterline
    waterlines.headOption.foreach { wl =>
      rows.filter(_._5).foreach { r => assert(r._2 <= wl + 0.01) }
    }
  }

  test("model compare: metrics in range, informed model beats dummy on F1") {
    import spark.implicits._
    val rows = Evaluation.modelCompare(spark, dir)
      .select($"model", $"auc", $"f1").as[(String, Double, Double)]
      .collect().map { case (m, a, f) => m -> (a, f) }.toMap
    rows.values.foreach { case (a, f) =>
      assert(a >= 0.0 && a <= 1.0 && f >= 0.0 && f <= 1.0) }
    // the density AUC is a weak signal at tiny SF; F1 separates reliably
    assert(rows("word_match")._2 > rows("dummy")._2)
  }

  test("bm25: per-term rankings are dense and higher-tf docs score higher at equal length") {
    import spark.implicits._
    val rows = Corpus.bm25Search(spark, dir)
      .select($"token", $"doc_id", $"score", $"rank")
      .as[(String, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length))
      // scores non-increasing with rank
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("novelty is consistent with the span-dedup table and covers every doc") {
    import spark.implicits._
    val nov = Corpus.novelty(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(nov.length == Tables.documents(spark, dir).count())
    nov.foreach { case (_, nChunks, nShared, novOpt) =>
      assert(nShared <= nChunks)
      if (nChunks == 0) assert(novOpt.isEmpty)
      else {
        val n = novOpt.get
        assert(n >= -1e-9 && n <= 1.0 + 1e-9)
        assert(math.abs(n - (1.0 - nShared.toDouble / nChunks)) < 1e-5)
      }
    }
    // any doc owning a cross-doc duplicated span (span-dedup table) must
    // have n_shared > 0; docs with zero table presence score novelty 1.0
    val dupHashes = Corpus.spanDedup(spark, dir)
      .select($"chunk_hash").as[Long].collect().toSet
    assert(dupHashes.nonEmpty)
    val byDoc = nov.map(r => r._1 -> r._3).toMap
    // recompute chunk ownership directly
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect()
    toks.foreach { case (id, ts) =>
      val chunks = ts.grouped(10).filter(_.length == 10).map(_.mkString(" ")).toSeq
      val sharedCount = chunks.count { c =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
            .take(15), 16)
        dupHashes(h)
      }
      assert(byDoc(id) == sharedCount.toLong, s"doc $id")
    }
  }

  test("rolling sketch store: estimates inside the HLL envelope, exact twin verified") {
    import spark.implicits._
    val rows = Corpus.distinctRolling(spark, dir)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // lgK=12 keeps relative error well under 5% at these cardinalities
    rows.foreach { case (day, exact, est, err) =>
      assert(exact >= 1 && est >= 1)
      assert(err <= 0.05, s"day $day: est $est vs exact $exact (err $err)")
      assert(math.abs(err - math.abs(est - exact).toDouble / exact) < 1e-6)
    }
    // exact twin equals a naive trailing recount on a mid-range day
    val du = graft.operators.EventOps.events(spark, dir)
      .select($"user_id", to_date(date_trunc("DAY", $"ts")).as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val probe = rows.map(_._1).sorted.apply(rows.length / 2)
    val naive = du.filter { case (_, d) =>
      !d.after(probe) && d.toLocalDate.plusDays(7).isAfter(probe.toLocalDate)
    }.map(_._1).distinct.length.toLong
    assert(rows.find(_._1 == probe).get._2 == naive)
    // determinism: the sketch estimate is a pure function of the data
    val again = Corpus.distinctRolling(spark, dir)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("bloom decontamination screen never misses an exact contamination hit") {
    import spark.implicits._
    val exact = Corpus.contamination(spark, dir)
      .as[(Long, Long, Long)].collect()
    val bloom = Corpus.contaminationBloom(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty && bloom.nonEmpty)
    // no false negatives: every exactly-contaminated doc is flagged, and
    // its hit count dominates its best per-bench shared-shingle count
    // (bloom positions of a truly shared shingle are always present)
    exact.foreach { case (docId, benchId, nShared) =>
      assert(bloom.contains(docId), s"doc $docId (bench $benchId) missed")
      assert(bloom(docId) >= nShared, s"doc $docId hits ${bloom.get(docId)} < $nShared")
    }
    // false positives only on full 3-way position collisions: the
    // flagged set must sit between the TRUE union-overlap set (docs
    // sharing >= 2 distinct shingles with the whole benchmark suite —
    // the screen's semantics, wider than the per-bench-doc exact pairs)
    // and that set plus a small collision tail
    val allSh = graft.operators.Dedup
      .shingleArrsOf(Tables.documents(spark, dir))
      .select($"doc_id", explode($"arr").as("shingle"))
      .as[(Long, String)].collect()
    val benchSet = allSh.collect { case (d, sh) if d < 20 => sh }.toSet
    val trueUnion = allSh.filter(_._1 >= 20).groupBy(_._1).toSeq
      .collect { case (d, rows) if rows.count(r => benchSet(r._2)) >= 2 => d }
      .toSet
    assert(trueUnion.subsetOf(bloom.keySet))
    val probed = Tables.documents(spark, dir).where($"doc_id" >= 20).count()
    val fp = bloom.keySet -- trueUnion
    assert(fp.size <= probed * 0.05,
      s"${fp.size} collision-only docs of $probed probed")
  }

  test("c-TF-IDF per source equals a driver-side recompute of the top-10") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val got = Corpus.ctfidfSource(spark, dir)
      .as[(String, String, Long, Double, Int)].collect()
    val tf = Tables.documents(spark, dir)
      .select($"source", explode(TF.tokens($"text")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("tf"))
      .as[(String, String, Long)].collect()
    val ft = tf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val avgMass = tf.map(_._3).sum.toDouble / tf.map(_._1).distinct.length
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, tok, c) => (tok, c, r6(c * math.log1p(avgMass / ft(tok)))) }
        .sortBy { case (tok, _, sc) => (-sc, tok) }
        .take(10).zipWithIndex
        .map { case ((tok, c, sc), i) => (src, tok, c, sc, i + 1) }
    }.toSet
    assert(got.toSet == want)
  }

  test("oversample copies equalize class mass") {
    import spark.implicits._
    val perClass = Evaluation.balanceOversample(spark, dir)
      .groupBy($"y").agg(sum($"n_copies").as("mass"))
      .select($"mass").as[Long].collect()
    assert(perClass.length == 2 && perClass.distinct.length == 1)
  }
}
