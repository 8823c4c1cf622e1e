package graft.operators

import graft.{GraftQuery, SessionCache, Tables}
import graft.functions.GraftExpressions.arrayDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators (SURVEY §2.F): brute-force cosine as
  * the correctness baseline, random-hyperplane LSH bucketing as the
  * 100 TB scale path.
  *
  * Dot products fold left-to-right (`aggregate` in Spark, `list_reduce`
  * in the oracle) so the float accumulation order is identical in both
  * engines; cosines are rounded to 6 dp before any ranking so top-k
  * ordering can never diverge on a final-ulp tie.
  */
object Similarity {

  /** Number of sign-LSH hyperplanes (= signature bits), the band count,
    * and bits per band: 256 planes banded 32 × 8. The 8-bit band
    * keyspace is the scale lever (see [[TauLshFloor]]): 256
    * buckets/band holds the near-orthogonal bulk's expected band
    * collisions to 32·2⁻⁸ = 1/8 per pair, where the pre-round-18 16×4
    * banding (16 buckets/band) collided at ~1 per pair and made the
    * route quadratic-regime on uniform data (dup-ladder fitted_exp
    * 1.78, SURVEY §8j). Declared at the TOP of the object: strict vals
    * below (annLshSql, cosineDedupLshSql) force the lazy SQL chains
    * during object init, and Scala initializes strict vals in
    * declaration order — these must come first or the chains bake in
    * zeros (the round-18 `generate_series(0, -1)` bug).
    */
  private val SignPlaneCount = 256
  private val SignBandCount = 32
  private val SignBandBits = 8
  private val SignWords = SignPlaneCount / 64
  // the band extraction below derives word/shift/mask from SignBandBits
  // (ADVICE r18) — valid only while bands never straddle a 64-bit word
  require(64 % SignBandBits == 0 && SignBandCount * SignBandBits == SignPlaneCount,
    "sign-LSH banding must tile the signature exactly")

  /** Directed multi-probe flips per band for the ANN search path
    * ([[lshTopK]]): besides each band's exact bucket, probe the buckets
    * with the band's ProbeFlips LOWEST-|margin| sign bits flipped (one
    * key per flipped bit, never combined) — for a true near neighbor
    * the bits most likely to disagree ARE the ones whose hyperplane
    * margins are smallest, so each directed flip recovers most of the
    * remaining single-bit-miss probability mass undirected flipping
    * would spread over 8 keys (Lv et al.'s multi-probe LSH,
    * re-expressed for sign bands). Per-neighbor model at cosine c with
    * p = 1 − arccos(c)/π: a band hits with probability
    * ≈ p⁸ + 8·p⁷(1−p)·β (β = P[the disagreeing bit ranks within the
    * first ProbeFlips by margin]). Round 19 measured the first flip at
    * recall@5 0.42 → 0.62 for ~2× probe volume; round 20 takes the
    * judge's next step — the SECOND-lowest-margin flip (3 keys/band,
    * ~3× exact-only volume) — and q_ann_recall prices whether it buys
    * recall ≥ 0.75 (measured rows in SURVEY §8m). The oracle mirror
    * ([[probesCtesSql]]) is parameterized on this constant (its rank
    * window keeps rows rn ≤ ProbeFlips with the same (|dot| ASC, p
    * ASC) order as the primitive loop's repeated argmin), so both
    * engines move together; flips must stay strictly inside the band
    * or the key xor would straddle words.
    */
  private val ProbeFlips = 2
  require(ProbeFlips >= 1 && ProbeFlips < SignBandBits,
    "directed flips must stay inside one band's bit range")

  /** Per-query cap on candidates entering the ANN path's EXACT rerank
    * (r20): bucket-join candidates are first ranked by full 256-bit
    * signature Hamming distance to the query — 32 bytes of bit work
    * per candidate, no vector fetch — and only the best
    * [[AnnShortlist]] per query pay the 64-double fetch + exact cosine.
    * This is the r19 dedup-route lesson (volume × payload, not volume
    * alone) applied to the search path: at corpus scale the rerank's
    * vector fetch is the expensive shuffle, and the shortlist caps it
    * at a CONSTANT per query regardless of how many bucket collisions
    * the probe set surfaces (measured sf0.1: 681 bucket candidates per
    * query, 128 exact-scored). Hamming over 256 sign bits ranks by
    * angle faithfully enough that the cap costs ZERO recall at
    * sf0.001/sf0.01 and 0.04 at sf0.1 (0.86/0.80/0.86 @ 1280 vs
    * 0.86/0.80/0.90 uncapped @ 1669/1719/6810 — scoreboard rows in
    * SURVEY §8m; 64 was measured too: same recall at the small SFs
    * but −0.10 at sf0.1). Unlike the IVF family, whose probed-list
    * volume grows with the corpus (604 → 2441 across the measured
    * SFs), this budget is CONSTANT per query at any corpus size. Ties
    * break on neighbor_id; the oracle mirrors the ranking from its
    * bands CTE (the bands partition the signature, so Σ band-wise
    * bit_count(xor) IS the full Hamming distance — the route
    * prefilter's argument).
    */
  private val AnnShortlist = 128

  /** vectors with their norms precomputed once (the pair loop then only
    * pays one ArrayDot per pair instead of three).
    */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Deliberately NOT fanned out (Tables.fanOut): this frame is
    // rebuilt dozens of times per query — every Lloyd round, census
    // pass and probe stage re-derives the lineage — so an added
    // Exchange multiplies across those jobs. A/B at sf0.1 (BenchOne,
    // identical order/reps): fan-out cost q_ann_lsh 5.3 → 12.8 s cold
    // (1.2 → 2.8 warm), q_ann_ivf_pq 11.2 → 13.8, q_semdedup
    // 5.8 → 6.6, q_ann_recall 5.9 → 6.7 — the opposite of the text
    // family, whose heavy single-pass kernels win from spreading.
    Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))
  }

  /** codegen'd left-to-right fold — bit-identical to the oracle's
    * list_reduce (see graft.functions.ArrayDot).
    */
  private def dot(a: Column, b: Column): Column = arrayDot(a, b)

  private val dotSql =
    "list_reduce([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))], (x, y) -> x + y)"
  private val normSql = (t: String) =>
    s"sqrt(list_reduce([$t.v[i] * $t.v[i] for i in generate_series(1, len($t.v))], (x, y) -> x + y))"
  private val cosineSql = s"$dotSql / (${normSql("a")} * ${normSql("b")})"

  private val vecsSql =
    "(SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings)"

  /** Brute-force broadcast twin of [[cosineDedupBlocked]] — kept as the
    * oracle-shaped baseline (SimilaritySpec asserts the two plans agree);
    * the broadcast nested-loop shape dies at corpus scale, so it is NOT
    * the registered plan.
    */
  def cosineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir)
    // a small corpus arrives as one parquet split; without a repartition
    // the broadcast nested-loop join's whole pair sweep runs as ONE task
    v.repartition(s.sparkContext.defaultParallelism)
      .as("a").join(broadcast(v.as("b")), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        round(dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"), 6).as("cos"))
      .where($"cos" >= 0.4)
      .orderBy($"id_a", $"id_b")
  }

  /** How many id-hash blocks the pair space shards over: B blocks →
    * B·(B+1)/2 block-pair tasks and each vector shuffled (B+1)× — at a
    * bigger cluster raise B ~ √tasks. 8 gives 36 even tasks on local[32].
    */
  private val PairBlocks = 8

  /** The REGISTERED q_embed_cosine_dedup plan — exact τ=0.4 cosine pairs
    * by BLOCK-PARTITIONED pair enumeration. Why not an LSH candidate
    * filter: at τ=0.4 (θ ≈ 66°) qualifying pairs are the tail of the
    * near-orthogonal bulk, and sign-LSH band recall at that angle is far
    * below 1 — any pruning sketch silently drops qualifying pairs, and
    * no exact sub-quadratic filter exists for dense vectors at low τ
    * (norm/prefix bounds degenerate when per-dimension mass is even). So
    * the exact semantics keep O(n²) compares, and the scale fix is the
    * memory/shuffle shape instead: vectors hash into [[PairBlocks]]
    * blocks, the B·(B+1)/2 block pairs become an equi-join key, and both
    * sides shuffle on it — bounded tasks at any corpus size, no
    * corpus-sized broadcast, no BroadcastNestedLoopJoin (PlanGuardSpec
    * asserts). Same result set as [[cosineDedup]]; the approximate scale
    * paths for high-similarity regimes are the registered q_ann_* family.
    *
    * SCALE POSTURE: this is the SMALL-SF EXACT TWIN. The compare count
    * is inherently O(n²) at exact low-τ semantics, so at corpus scale a
    * pipeline runs the registered q_embed_cosine_dedup_lsh route
    * ([[cosineDedupLshTop]] / [[cosineDedupRouted]]) instead; the
    * router refuses this sweep above sub-corpus scale without an
    * explicit opt-in.
    */
  def cosineDedupBlocked(s: SparkSession, dir: String): DataFrame =
    blockedPairs(s, vecs(s, dir), 0.4)

  /** The blocked exact pair sweep on any (vec_id, v, nrm) frame at
    * threshold `tau` — the low-τ leg of [[cosineDedupRouted]].
    */
  private[graft] def blockedPairs(s: SparkSession, vin: DataFrame, tau: Double): DataFrame = {
    import s.implicits._
    // pmod, not %: Spark's % keeps the sign, and a negative id's block
    // would match no block-pair row — its pairs would silently vanish
    val v = vin.withColumn("blk", pmod($"vec_id", lit(PairBlocks)).cast("int"))
    val blockPairs = s.createDataFrame(
      for { i <- 0 until PairBlocks; j <- i until PairBlocks } yield (i, j))
      .toDF("ba", "bb")
    // each side replicated to its block-pair rows (a tiny broadcast join),
    // then ONE shuffle equi-join on the composite (ba, bb) key — 36 even
    // keys, so parallelism is the block-pair count, not the block count
    val a = blockPairs.join(
      v.select($"blk".as("ba"), $"vec_id".as("id_x"), $"v".as("vx"), $"nrm".as("nx")), "ba")
    val b = blockPairs.join(
      v.select($"blk".as("bb"), $"vec_id".as("id_y"), $"v".as("vy"), $"nrm".as("ny")), "bb")
    a.join(b, Seq("ba", "bb"))
      .where($"ba" =!= $"bb" || $"id_x" < $"id_y")
      .select(least($"id_x", $"id_y").as("id_a"),
        greatest($"id_x", $"id_y").as("id_b"),
        round(dot($"vx", $"vy") / ($"nx" * $"ny"), 6).as("cos"))
      .where($"cos" >= tau)
      .orderBy($"id_a", $"id_b")
  }

  val cosineDedupSql: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cosineSql, 6) AS cos
       |FROM $vecsSql a, $vecsSql b
       |WHERE a.vec_id < b.vec_id AND round($cosineSql, 6) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** Brute-force cosine top-5 neighbors for the first 10 query vectors —
    * the ANN correctness baseline. Queries are broadcast; ranking is on
    * the rounded cosine with vec_id tiebreak.
    */
  def annCosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = vecs(s, dir)
    val q = v.where($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val scoredN = v.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 6).as("cos"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scoredN.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .orderBy($"q_id", $"rank")
  }

  val annCosineTopKSql: String =
    s"""SELECT q_id, neighbor_id, cos, rank FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |      round($cosineSql, 6) AS cos
       |    FROM $vecsSql a, $vecsSql b
       |    WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id) sc) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** LSH as a SEARCH path: the standard MULTI-TABLE, MULTI-PROBE query
    * over the same banded 256-bit sign index the dedup route builds
    * ([[signBands]] — 32 tables of 8-bit keys). Candidates are the
    * union of the query's 32 exact band buckets PLUS [[ProbeFlips]]
    * directed 1-bit-flip neighbor buckets per band ([[queryProbes]] —
    * flip the lowest-|margin| sign bits, the decisions a true near
    * neighbor most likely disagrees on), one equi-join on
    * (band, bits), deduped, exact cosine rerank, top-5. Round 18's
    * exact-bucket-only probe measured recall@5 0.42 at ~n/8 corpus
    * touched; round 19's first directed flip bought 0.62 at ~2× probe
    * volume; round 20 adds the second flip (3 keys/band) — the
    * measured row lives in q_ann_recall, and the census
    * ([[annLsh]]) prices the probe volume per bucket. Multi-table
    * banding itself is REDESIGNED round 18 (§8j): the old single
    * 16-bit-bucket probe only ever looked functional because the
    * degenerate raw-LCG planes collapsed the keyspace.
    */
  private[graft] def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lshRanked(s, dir).where($"rank" <= 5).orderBy($"q_id", $"rank")
  }

  /** The full ranked candidate frame behind [[lshTopK]] — every deduped
    * multi-probe candidate with its exact-cosine rank, BEFORE the top-5
    * cut, so the recall scoreboard reads hits (rank ≤ 5 ∩ truth) AND the
    * touched-candidate volume (row count) from one pass.
    */
  private def lshRanked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = vecs(s, dir)
    val sigs = cachedSigs(s, dir)
    val bands = bandsFrom(s, sigs).select($"vec_id", $"band", $"bits")
    val probes = queryProbes(s, v.where($"vec_id" < 10))
    val cand = broadcast(probes).join(bands, Seq("band", "bits"))
      .where($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id")).distinct()
    // STAGE 1 (r20) — signature-Hamming shortlist: rank every bucket
    // candidate by its full 256-bit Hamming distance to the query (a
    // 32-byte xor/popcount per pair on the already-memoized signature
    // frame) and keep the best AnnShortlist per query. Only the
    // shortlist pays stage 2's vector fetch — at corpus scale THAT
    // join's 512-byte payloads are the cost center (the r19 route
    // lesson), and the shortlist caps it at a constant per query.
    val qsig = sigs.where($"vec_id" < 10).select(($"vec_id".as("q_id") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"q$w"))): _*)
    val csig = sigs.select(($"vec_id".as("neighbor_id") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"c$w"))): _*)
    val hamming = (0 until SignWords)
      .map(w => bit_count(col(s"q$w").bitwiseXOR(col(s"c$w"))))
      .reduce(_ + _)
    val wH = Window.partitionBy($"q_id").orderBy($"h".asc, $"neighbor_id".asc)
    val short = cand.join(broadcast(qsig), "q_id").join(csig, "neighbor_id")
      .select($"q_id", $"neighbor_id", hamming.as("h"))
      .withColumn("hrk", row_number().over(wH))
      .where($"hrk" <= AnnShortlist)
      .select($"q_id", $"neighbor_id")
    // STAGE 2 — exact cosine rerank over the shortlist only
    val q = v.where($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id".asc)
    short.join(broadcast(q), "q_id")
      .join(v.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .select($"q_id", $"neighbor_id",
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
  }

  /** The banded sign index over the corpus, derived from the
    * session-memoized signature frame: the expensive shared artifact is
    * the 256-plane mapPartitions scan ([[signSignatures]] — ~n×256×64
    * FLOPs), so THAT is what persists, in its compact pre-explode form
    * (n rows × 4 words; persisting the 32×-exploded bands frame was
    * measured a loss — the materialization cost more than the scan it
    * saved, the round-14 SessionCache lesson again). [[annLsh]]
    * (census), [[lshTopK]] (search, via [[annRecall]]'s scoreboard)
    * and repeated probe calls share the one scan per session (ADVICE
    * r18); the explode to (band, bits) rows is recomputed per consumer
    * — column arithmetic, no shuffle. Registered consumers are marked
    * singleShot so the bench times the cold build, not the memo.
    */
  private def bandedIndex(s: SparkSession, dir: String): DataFrame =
    bandsFrom(s, cachedSigs(s, dir))

  /** The session-memoized compact signature frame itself — shared by
    * the band explosion ([[bandedIndex]]) and the ANN path's
    * signature-Hamming shortlist ([[lshRanked]] stage 1), which joins
    * the raw s0..s3 words rather than the exploded bands.
    */
  private def cachedSigs(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrCompute(s, s"sim.signSigs:$dir") {
      val f = signSignatures(s, vecs(s, dir)).persist()
      f.count()
      f
    }

  /** Multi-probe key set for a (small) query frame: per band the exact
    * bucket key plus [[ProbeFlips]] directed flips — the flipped bits
    * chosen by LOWEST |plane margin| (ties to the lower plane index),
    * i.e. the sign decisions a true near neighbor is most likely to
    * disagree on. Same primitive float loop as [[signSignatures]]
    * (left-to-right product-accumulate from 0.0 per plane), so the
    * oracle's `dots` CTE reproduces every margin bit-exactly and the
    * argmin is deterministic in both engines.
    */
  private[graft] def queryProbes(s: SparkSession, vin: DataFrame): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(signPlanes)
    vin.select($"vec_id", $"v").as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val planes = bc.value
        it.flatMap { case (id, vec) =>
          val a = vec.toArray
          require(a.length == 64,
            s"sign-LSH route requires 64-dim embeddings; got ${a.length} " +
              s"for vec_id=$id")
          val out = Seq.newBuilder[(Long, Int, Long)]
          var k = 0
          while (k < SignBandCount) {
            var bits = 0L
            // per-band margin ranking: absolute dot per plane, the
            // band's flip candidates are the smallest-margin planes
            val abs = new Array[Double](SignBandBits)
            var j = 0
            while (j < SignBandBits) {
              val pl = planes(k * SignBandBits + j)
              var acc = 0.0
              var i = 0
              while (i < 64) { acc += pl(i) * a(i); i += 1 }
              if (acc > 0) bits |= (1L << j)
              abs(j) = math.abs(acc)
              j += 1
            }
            out += ((id, k, bits))
            var f = 0
            val used = new Array[Boolean](SignBandBits)
            while (f < ProbeFlips) {
              var minAbs = Double.MaxValue
              var minBit = -1
              var b = 0
              while (b < SignBandBits) {
                if (!used(b) && abs(b) < minAbs) { minAbs = abs(b); minBit = b }
                b += 1
              }
              used(minBit) = true
              out += ((id, k, bits ^ (1L << minBit)))
              f += 1
            }
            k += 1
          }
          out.result()
        }
      }.toDF("q_id", "band", "bits")
  }

  /** Random-hyperplane LSH index census — one row per (band, bits)
    * bucket of the [[signBands]] multi-table index with count, id range
    * and an md5 digest of the sorted member list (the driver's
    * comparison layer sorts result columns, so outputs stay scalar) —
    * plus the MULTI-PROBE pressure columns (r19): `n_probes` counts how
    * many of the query set's probe keys ([[queryProbes]] — exact +
    * directed flips) land in the bucket, and `cand_volume` =
    * n_probes × n_vecs is the candidate rows the bucket contributes to
    * the search path before dedup/rerank. Σ cand_volume over the census
    * is the probe plan's total join volume — the number a deployment
    * reads to price a recall/volume trade before serving from the
    * index.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probeCounts = queryProbes(s, vecs(s, dir).where($"vec_id" < 10))
      .groupBy($"band", $"bits").agg(count(lit(1)).as("n_probes"))
    bandedIndex(s, dir).select($"vec_id", $"band", $"bits")
      .groupBy($"band", $"bits").agg(count(lit(1)).as("n_vecs"),
        min($"vec_id").as("min_vec_id"), max($"vec_id").as("max_vec_id"),
        md5(array_join(transform(sort_array(collect_list($"vec_id")),
          _.cast("string")), ",").cast("binary")).as("ids_md5"))
      .join(broadcast(probeCounts), Seq("band", "bits"), "left")
      .withColumn("n_probes", coalesce($"n_probes", lit(0L)))
      .withColumn("cand_volume", $"n_probes" * $"n_vecs")
      .orderBy($"band", $"bits")
  }

  /** The planes→dots→bands CTE chain shared by the bucket census
    * oracle, the LSH search-path oracle feeding the recall scoreboard,
    * and the dedup-route oracle — the [[fmix64]] HUGEINT mirror
    * ([[signPlanesCtesSql]]) plus the engine's exact left-to-right
    * plane dots and 8-bit band keys.
    */
  private lazy val signBandsCtesSql: String =
    s"""$signPlanesCtesSql,
       |v AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |dots AS (
       |  SELECT vec_id, p,
       |    list_reduce(list_prepend(0.0,
       |      [plane[i] * v[i] for i in generate_series(1, len(v))]),
       |      (x, y) -> x + y) AS dot
       |  FROM v, planes),
       |bands AS (
       |  SELECT vec_id, p // $SignBandBits AS band,
       |    CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << (p % $SignBandBits)) ELSE 0 END)
       |      AS BIGINT) AS bits
       |  FROM dots GROUP BY vec_id, p // $SignBandBits)""".stripMargin

  /** The multi-probe key set's oracle mirror ([[queryProbes]]): per
    * query band, the exact bucket plus one 1-bit flip per of the
    * [[ProbeFlips]] lowest-|margin| planes (each flipped from the
    * EXACT key, as the engine does) — the margin is the `dots` CTE's
    * plane dot (bit-identical to the engine's fold), and the rank
    * window's (|dot| ASC, p ASC) order equals the primitive loop's
    * repeated argmin with its used-bit mask.
    */
  private lazy val probesCtesSql: String =
    s"""qflip AS (
       |  SELECT vec_id, band, minp FROM (
       |    SELECT vec_id, p // $SignBandBits AS band, p AS minp,
       |      row_number() OVER (PARTITION BY vec_id, p // $SignBandBits
       |        ORDER BY abs(dot) ASC, p ASC) AS rn
       |    FROM dots WHERE vec_id < 10) z
       |  WHERE rn <= $ProbeFlips),
       |probes AS (
       |  SELECT vec_id AS q_id, band, bits FROM bands WHERE vec_id < 10
       |  UNION ALL
       |  SELECT b.vec_id, b.band,
       |    xor(b.bits, 1::BIGINT << (f.minp % $SignBandBits))
       |  FROM bands b JOIN qflip f
       |    ON b.vec_id = f.vec_id AND b.band = f.band)""".stripMargin

  val annLshSql: String =
    s"""WITH $signBandsCtesSql,
      |$probesCtesSql,
      |agg AS (
      |  SELECT band, bits, count(*) AS n_vecs,
      |    min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id,
      |    md5(string_agg(vec_id, ',' ORDER BY vec_id)) AS ids_md5
      |  FROM bands GROUP BY band, bits),
      |pc AS (SELECT band, bits, count(*) AS n_probes
      |  FROM probes GROUP BY band, bits)
      |SELECT a.band, a.bits, a.n_vecs, a.min_vec_id, a.max_vec_id, a.ids_md5,
      |  CAST(coalesce(pc.n_probes, 0) AS BIGINT) AS n_probes,
      |  CAST(coalesce(pc.n_probes, 0) * a.n_vecs AS BIGINT) AS cand_volume
      |FROM agg a LEFT JOIN pc USING (band, bits)
      |ORDER BY a.band, a.bits""".stripMargin

  /** Oracle twin of [[lshTopK]]: union of the multi-probe buckets
    * (exact + directed flip, [[probesCtesSql]]), exact-cosine rerank,
    * top-5 per query.
    */
  /** The probe plan's deduped candidate CTE — shared by the search
    * oracle ([[lshTopKSql]]) and the scoreboard's candidate-volume
    * count ([[lshCandCountSql]]).
    */
  private lazy val lshSearchCandCteSql: String =
    s"""cand0 AS (
      |  SELECT DISTINCT p.q_id, a.vec_id AS neighbor_id
      |  FROM probes p JOIN bands a ON p.band = a.band AND p.bits = a.bits
      |  WHERE a.vec_id <> p.q_id),
      |-- full-signature Hamming per candidate pair: the 32 bands
      |-- partition the 256 bits, so the sum of band-wise bit_count(xor)
      |-- IS the signature Hamming distance (the route prefilter's
      |-- argument, reused for the ANN shortlist ranking)
      |hams AS (
      |  SELECT c.q_id, c.neighbor_id,
      |    SUM(bit_count(xor(qb.bits, ab.bits))) AS h
      |  FROM cand0 c
      |  JOIN bands qb ON qb.vec_id = c.q_id
      |  JOIN bands ab ON ab.vec_id = c.neighbor_id AND ab.band = qb.band
      |  GROUP BY c.q_id, c.neighbor_id),
      |cand AS (
      |  SELECT q_id, neighbor_id FROM (
      |    SELECT q_id, neighbor_id,
      |      row_number() OVER (PARTITION BY q_id
      |        ORDER BY h ASC, neighbor_id ASC) AS hrk
      |    FROM hams) z
      |  WHERE hrk <= $AnnShortlist)""".stripMargin

  /** n_candidates of the lsh scoreboard row, re-derived: distinct
    * multi-probe bucket collision pairs entering the exact rerank.
    */
  private lazy val lshCandCountSql: String =
    s"""WITH $signBandsCtesSql,
      |$probesCtesSql,
      |$lshSearchCandCteSql
      |SELECT CAST(count(*) AS BIGINT) AS n FROM cand""".stripMargin

  private lazy val lshTopKSql: String =
    s"""WITH $signBandsCtesSql,
      |$probesCtesSql,
      |$lshSearchCandCteSql,
      |vn AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce([v[i] * v[i] for i in generate_series(1, len(v))],
      |      (x, y) -> x + y)) AS nrm
      |  FROM v)
      |SELECT q_id, neighbor_id, cos, rank FROM (
      |  SELECT c.q_id, c.neighbor_id,
      |    round(list_reduce([q.v[i] * a.v[i] for i in generate_series(1, len(q.v))],
      |      (x, y) -> x + y) / (q.nrm * a.nrm), 6) AS cos,
      |    CAST(row_number() OVER (PARTITION BY c.q_id ORDER BY
      |      round(list_reduce([q.v[i] * a.v[i] for i in generate_series(1, len(q.v))],
      |        (x, y) -> x + y) / (q.nrm * a.nrm), 6) DESC, c.neighbor_id ASC)
      |      AS INT) AS rank
      |  FROM cand c JOIN vn q ON c.q_id = q.vec_id
      |    JOIN vn a ON c.neighbor_id = a.vec_id) z
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** IVF-style ANN — the inverted-file scale path: a deterministic
    * coarse quantizer (centroids = the first 8 vectors; in production a
    * k-means fit) assigns every vector to its nearest centroid's list,
    * and each query (vec_id < 10) searches only its 2 nearest lists.
    * Per query the scan touches ~nprobe/nlist of the corpus instead of
    * all of it; centroids broadcast, so assignment is map-side and the
    * only shuffle is the final per-query top-k window.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame =
    ivfSearch(s, vecs(s, dir), fixedCents(s, dir))

  /** The deterministic fixed-centroid codebook ([[annIvf]]'s quantizer):
    * the first 8 vectors, shared with the recall scoreboard's ranked
    * variant.
    */
  private def fixedCents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    vecs(s, dir).where($"vec_id" < 8)
      .select($"vec_id".as("cent_id"), $"v".as("cv"), $"nrm".as("cnrm"))
  }

  /** The IVF search shape shared by the fixed-centroid oracle twin and
    * the k-means variant: assign every vector to its max-cosine centroid
    * list, probe each query's 2 nearest lists, top-5 within the probed
    * lists. Centroids and probes broadcast; the only shuffle is the final
    * per-query top-k window.
    */
  private def ivfSearch(s: SparkSession, v: DataFrame, cents: DataFrame): DataFrame = {
    import s.implicits._
    ivfRanked(s, v, cents).where($"rank" <= 5).orderBy($"q_id", $"rank")
  }

  /** [[ivfSearch]] without the top-5 cut: every (query, probed-list
    * vector) pair exact-scored and ranked — the frame the recall
    * scoreboard counts for the touched-candidate volume.
    */
  private def ivfRanked(s: SparkSession, v: DataFrame, cents: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id".asc)
    val assign = v.crossJoin(broadcast(cents))
      .select($"vec_id", $"v", $"nrm", $"cent_id",
        round(dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("ccos"))
      .withColumn("crk", row_number().over(wAssign))
      .where($"crk" === 1)
      .select($"vec_id", $"v", $"nrm", $"cent_id")
    val wProbe = Window.partitionBy($"q_id").orderBy($"pcos".desc, $"cent_id".asc)
    val probes = v.where($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .crossJoin(broadcast(cents))
      .select($"q_id", $"qv", $"qnrm", $"cent_id",
        round(dot($"qv", $"cv") / ($"qnrm" * $"cnrm"), 6).as("pcos"))
      .withColumn("prk", row_number().over(wProbe))
      .where($"prk" <= 2)
      .select($"q_id", $"qv", $"qnrm", $"cent_id")
    val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id".asc)
    // probes = queries × nprobe rows — always the small side; hint it so
    // the list scan stays a map-side broadcast join at any corpus size
    broadcast(probes).join(assign, "cent_id")
      .where($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 6).as("cos"))
      .withColumn("rank", row_number().over(wTop))
  }

  /** IVF with a REAL coarse quantizer — the production scale path: a
    * TRAINED k=16 quantizer partitions the corpus and its centroids
    * feed the same inverted-list search as [[annIvf]]. The fit is the
    * DETERMINISTIC Lloyd loop ([[trainCoarse]]: lowest-vec_id init,
    * row-local 6-dp argmin assignment, exact-integer re-means), so the
    * whole query is hash-checked — DuckDB re-derives the training
    * round by round ([[annIvfKmeansSql]]); the MLlib seeded fit stays
    * beside it as the quality cross-check twin (SimilaritySpec).
    */
  def annIvfKmeans(s: SparkSession, dir: String): DataFrame =
    // the fit is session-memoized (the ml/ fitted-model precedent): a
    // session running several registered queries — the recall
    // scoreboard plus this query — pays the k-means training once
    ivfSearch(s, vecs(s, dir), cachedCoarseCents(s, dir, 16))

  /** The fit itself, uncached — the determinism spec drives THIS entry
    * twice so memoization can't mask a nondeterministic training run
    * (order-independence is now BY CONSTRUCTION: the re-mean sums are
    * exact integers, but the spec keeps the end-to-end assertion).
    */
  private[graft] def annIvfKmeansUncached(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    ivfSearch(s, v, coarseCentFrame(s, trainCoarse(s, v, 16)))
  }

  /** The MLlib twin of the deterministic k=16 fit — the seeded KMeans
    * this engine would use where hash-checkability is not required;
    * kept for SimilaritySpec's quality cross-check (both quantizers
    * must clear the same recall floor over the same search).
    */
  private[graft] def annIvfKmeansMllib(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir)
    ivfSearch(s, v, fitCentroids(s, v, 16))
  }

  private def dotESql(x: String, y: String) =
    s"list_reduce([$x[i] * $y[i] for i in generate_series(1, len($x))], (x, y) -> x + y)"
  private def cosESql(x: String, xn: String, y: String, yn: String) =
    s"round(${dotESql(x, y)} / ($xn * $yn), 6)"

  /** The [[ivfSearch]] oracle parameterized over the centroid CTE chain
    * (which must end in cents(cent_id, cv, cnrm)) — one search SQL for
    * the fixed-centroid q_ann_ivf and the trained q_ann_ivf_kmeans.
    */
  /** The [[ivfSearch]] CTE prefix (corpus → assignment → probes),
    * shared by the search oracle and the candidate-volume count.
    */
  private def ivfCtesFrom(centsCtes: String): String = {
    def dotE(x: String, y: String) = dotESql(x, y)
    def cosE(x: String, xn: String, y: String, yn: String) = cosESql(x, xn, y, yn)
    s"""vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |vn AS (SELECT vec_id, v, sqrt(${dotE("v", "v")}) AS nrm FROM vv),
       |$centsCtes,
       |assign AS (
       |  SELECT vec_id, v, nrm, cent_id FROM (
       |    SELECT a.vec_id, a.v, a.nrm, c.cent_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cosE("a.v", "a.nrm", "c.cv", "c.cnrm")} DESC, c.cent_id ASC)
       |        AS INT) AS crk
       |    FROM vn a CROSS JOIN cents c) z
       |  WHERE crk = 1),
       |probes AS (
       |  SELECT q_id, qv, qnrm, cent_id FROM (
       |    SELECT q.vec_id AS q_id, q.v AS qv, q.nrm AS qnrm, c.cent_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosE("q.v", "q.nrm", "c.cv", "c.cnrm")} DESC, c.cent_id ASC)
       |        AS INT) AS prk
       |    FROM vn q CROSS JOIN cents c WHERE q.vec_id < 10) z
       |  WHERE prk <= 2)""".stripMargin
  }

  private def ivfSearchSqlFrom(centsCtes: String): String = {
    def cosE(x: String, xn: String, y: String, yn: String) = cosESql(x, xn, y, yn)
    s"""WITH ${ivfCtesFrom(centsCtes)}
       |SELECT q_id, neighbor_id, cos, rank FROM (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |    ${cosE("p.qv", "p.qnrm", "a.v", "a.nrm")} AS cos,
       |    CAST(row_number() OVER (PARTITION BY p.q_id
       |      ORDER BY ${cosE("p.qv", "p.qnrm", "a.v", "a.nrm")} DESC, a.vec_id ASC)
       |      AS INT) AS rank
       |  FROM probes p JOIN assign a USING (cent_id)
       |  WHERE a.vec_id <> p.q_id) z
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** n_candidates of an IVF scoreboard row, re-derived: (query, vector)
    * pairs inside the probed lists, excluding self — the full-precision
    * scan volume the inverted file bounds to ~nprobe/nlist of the
    * corpus.
    */
  private def ivfCandCountSqlFrom(centsCtes: String): String =
    s"""WITH ${ivfCtesFrom(centsCtes)}
       |SELECT CAST(count(*) AS BIGINT) AS n
       |FROM probes p JOIN assign a USING (cent_id)
       |WHERE a.vec_id <> p.q_id""".stripMargin

  val annIvfSql: String = ivfSearchSqlFrom(
    "cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM vn WHERE vec_id < 8)")

  /** ORACLE for the trained-quantizer IVF: the same search SQL over the
    * centroids DuckDB re-derives by unrolling the deterministic Lloyd
    * rounds ([[coarseCtesSql]], k = 16).
    */
  def annIvfKmeansSql: String = ivfSearchSqlFrom(coarseCtesSql("SELECT 16 AS k"))

  /** k-NN label agreement — the standard embedding-space label-noise /
    * mislabel diagnostic a training-data pipeline runs over labeled
    * embeddings: for each probe vector, the fraction of its 5 nearest
    * neighbors (exact cosine, the annCosineTopK algebra) sharing its
    * label. Low agreement flags candidate label errors or off-manifold
    * points. Probes broadcast like every ANN query set; at corpus scale
    * the neighbor search swaps to the ANN family (IVF/LSH/PQ) with the
    * same downstream agreement aggregation.
    */
  def labelKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val labels = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val v = vecs(s, dir).join(labels, "vec_id")
    val q = v.where($"vec_id" < 50)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"label".as("q_label"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id".asc)
    v.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"vec_id".as("neighbor_id"),
        $"label".as("n_label"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .groupBy($"q_id")
      .agg(first($"q_label").as("label"),
        sum(($"n_label" === $"q_label").cast("int")).cast("int").as("n_same"),
        (sum(($"n_label" === $"q_label").cast("int")).cast("double") / 5)
          .as("agree_frac"))
      .orderBy($"q_id")
  }

  val labelKnnSql: String =
    s"""WITH vv AS (
       |  SELECT vec_id, [x::DOUBLE for x in embedding] AS v, label
       |  FROM embeddings),
       |vn AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce([v[i] * v[i] for i in generate_series(1, len(v))],
       |      (x, y) -> x + y)) AS nrm, label
       |  FROM vv),
       |nb AS (
       |  SELECT q_id, q_label, n_label, rank FROM (
       |    SELECT a.vec_id AS q_id, a.label AS q_label, b.label AS n_label,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        round(list_reduce(
       |          [a.v[i] * b.v[i] for i in generate_series(1, len(a.v))],
       |          (x, y) -> x + y) / (a.nrm * b.nrm), 6) DESC,
       |        b.vec_id ASC) AS INT) AS rank
       |    FROM vn a JOIN vn b ON a.vec_id < 50 AND b.vec_id <> a.vec_id) z
       |  WHERE rank <= 5)
       |SELECT q_id, any_value(q_label) AS label,
       |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS INT)
       |    AS n_same,
       |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS DOUBLE) / 5
       |    AS agree_frac
       |FROM nb GROUP BY q_id ORDER BY q_id""".stripMargin

  /** Product-quantization ANN with asymmetric distance computation —
    * the MEMORY-side scale path the IVF/LSH family lacks: each vector
    * compresses to [[PqM]] one-byte codes (64 float dims → 8 bytes,
    * 32×), queries keep full precision and score candidates by summing
    * per-subspace dot-product lookups (ADC). Codebook is deterministic
    * (subvectors of the first [[PqK]] vectors — the annIvf
    * fixed-centroid precedent, which keeps the whole operator
    * SQL-expressible; a production deployment fits per-subspace k-means
    * and composes with the IVF lists to prune the ADC scan). Encoding
    * is a broadcast join + struct-min aggregation (no window, partial
    * aggregation applies); the ADC sum folds the 8 per-subspace terms
    * in fixed subspace order (FloatFold) so both engines accumulate
    * identically.
    */
  val PqM = 8 // subspaces
  val PqD = 8 // dims per subspace
  val PqK = 16 // codewords per subspace

  /** The PQ search shape on any unit-normalized (vec_id, vn) frame with
    * a query predicate — factored so the spec can drive it with planted
    * near-duplicate vectors.
    */
  private[graft] def pqTopK(s: SparkSession, vn: DataFrame, qPred: Column): DataFrame = {
    import s.implicits._
    pqRanked(s, vn, qPred).where($"rank" <= 5).orderBy($"q_id", $"rank")
  }

  /** [[pqTopK]] without the top-5 cut: every ADC-scored (query, vector)
    * pair ranked — for PQ the touched volume is the WHOLE corpus
    * (nq·(n−1) pairs, that is the method's honesty: it scans everything
    * but reads 8 code bytes per vector instead of 64 floats), and the
    * recall scoreboard prices exactly that.
    */
  private def pqRanked(s: SparkSession, vn: DataFrame, qPred: Column): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def subspaces(vecCol: Column): Column = explode(array((0 until PqM).map { m =>
      struct(lit(m).as("m"), slice(vecCol, m * PqD + 1, PqD).as("sv"))
    }: _*))
    val subs = vn.select($"vec_id", subspaces($"vn").as("ms"))
      .select($"vec_id", $"ms.m".as("m"), $"ms.sv".as("sv"))
    val cb = subs.where($"vec_id" < PqK)
      .select($"m", $"vec_id".cast("int").as("j"), $"sv".as("c"))
    // encode: argmin-L2 codeword per (vector, subspace) — struct-min
    // aggregation, never a window (clusterKeepBest precedent)
    val enc = subs.join(broadcast(cb), "m")
      .withColumn("diff", zip_with($"sv", $"c", (x, y) => x - y))
      .withColumn("d2", round(dot($"diff", $"diff"), 6))
      .groupBy($"vec_id", $"m")
      .agg(min(struct($"d2", $"j")).as("best"))
      .select($"vec_id", $"m", $"best.j".as("code"))
    // ADC lookup table: query × subspace × codeword dots (tiny: nq·M·K)
    val lut = vn.where(qPred)
      .select($"vec_id".as("q_id"), subspaces($"vn").as("ms"))
      .select($"q_id", $"ms.m".as("m"), $"ms.sv".as("qs"))
      .join(broadcast(cb), "m")
      .select($"q_id", $"m", $"j", dot($"qs", $"c").as("pdot"))
    val wTop = Window.partitionBy($"q_id").orderBy($"approx_cos".desc, $"neighbor_id".asc)
    // disambiguated lut keys: both sides carry an `m` after the join
    val lutR = lut.withColumnRenamed("m", "lm").withColumnRenamed("j", "lj")
    enc.join(broadcast(lutR), $"m" === $"lm" && $"code" === $"lj")
      .where($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(round(graft.functions.FloatFold.orderedSum($"m", $"pdot"), 6)
        .as("approx_cos"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("rank", row_number().over(wTop))
  }

  /** Registered PQ query: unit-normalized embeddings (ADC dot = approx
    * cosine), first 10 vectors as queries, top-5 by ADC score.
    */
  def annPq(s: SparkSession, dir: String): DataFrame =
    pqTopK(s, unitVecs(s, dir), col("vec_id") < 10)

  /** Unit-normalized (vec_id, vn) embedding frame — the PQ family's
    * input, shared with the recall scoreboard's ranked variant.
    */
  private def unitVecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    vecs(s, dir)
      .select($"vec_id", transform($"v", x => x / $"nrm").as("vn"))
  }

  /** The [[annPq]] oracle's CTE prefix through the ADC-scored pairs —
    * shared by the search oracle and the scoreboard's candidate count.
    */
  private lazy val pqCtesSql: String = {
    def dotE(terms: String) = s"list_reduce([$terms], (x, y) -> x + y)"
    s"""vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |vn AS (
       |  SELECT vec_id,
       |    [x / sqrt(${dotE("v[i] * v[i] for i in generate_series(1, len(v))")})
       |     for x in v] AS vn
       |  FROM vv),
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |subs AS (
       |  SELECT vec_id, m,
       |    [vn[m * ${PqD} + i] for i in generate_series(1, ${PqD})] AS sv
       |  FROM vn, ms),
       |cb AS (
       |  SELECT m, CAST(vec_id AS INT) AS j, sv AS c
       |  FROM subs WHERE vec_id < ${PqK}),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT s.vec_id, s.m, c.j,
       |      CAST(row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |        round(${dotE("(s.sv[i] - c.c[i]) * (s.sv[i] - c.c[i]) for i in generate_series(1, " + PqD + ")")}, 6)
       |        ASC, c.j ASC) AS INT) AS rk
       |    FROM subs s JOIN cb c USING (m)) z
       |  WHERE rk = 1),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.m, c.j,
       |    ${dotE("s.sv[i] * c.c[i] for i in generate_series(1, " + PqD + ")")} AS pdot
       |  FROM subs s JOIN cb c USING (m) WHERE s.vec_id < 10),
       |adc AS (
       |  SELECT l.q_id, e.vec_id AS neighbor_id,
       |    round(${graft.functions.FloatFold.orderedSumSql("pdot", "e.m")}, 6) AS approx_cos
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.j
       |  WHERE e.vec_id <> l.q_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  val annPqSql: String =
    s"""WITH $pqCtesSql
       |SELECT q_id, neighbor_id, approx_cos, rank FROM (
       |  SELECT q_id, neighbor_id, approx_cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_cos DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM adc) z
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** n_candidates of the pq scoreboard row, re-derived: the ADC scan
    * scores every non-self vector for every query — nq·(n−1) pairs.
    */
  private lazy val pqCandCountSql: String =
    s"""WITH $pqCtesSql
       |SELECT CAST(count(*) AS BIGINT) AS n FROM adc""".stripMargin

  /** TRAINED per-subspace PQ codebooks — the swap-in the deterministic
    * [[pqTopK]] codebook documents: Lloyd's k-means over each subspace's
    * subvectors, run as a DRIVER-BOUNDED DataFrame loop that trains all
    * [[PqM]] subspaces SIMULTANEOUSLY (one assign + one re-mean job per
    * iteration covers every subspace — at 100 TB that is `iters` bounded
    * shuffle rounds total, vs. M independent single-subspace fits each
    * paying its own passes). FULLY DETERMINISTIC since round 15 — not
    * just seedless but partitioning-independent and SQL-reproducible
    * (the [[trainCoarse]] discipline): init is the subvectors of the
    * [[PqK]] lowest vec_ids, assignment is argmin of the 6-dp-rounded
    * L2² with (d2, j) tiebreaks, and re-means are exact micro-unit
    * integer sums in decimal(38,0) divided and 6-dp-rounded as Spark
    * expressions — the same doubles on any partitioning AND in DuckDB's
    * unrolled re-derivation ([[residualCodebookCtesSql]]). Empty
    * clusters keep their previous codeword; per-iteration driver state
    * is the codebook itself (M·K·D doubles — KBs at any corpus size).
    *
    * Input `subs`: (vec_id, m, sv) subvector rows. Returns the codebook
    * as (m, j, c) rows ready to broadcast, plus the final total
    * quantization error (sum of per-row argmin L2²) so callers/specs can
    * verify training actually tightened the fit.
    */
  private[graft] def trainPqCodebooks(s: SparkSession, subs: DataFrame,
      iters: Int): (DataFrame, Double) = {
    import s.implicits._
    val d2 = (sv: Column, c: Column) => {
      val diff = zip_with(sv, c, (x, y) => x - y)
      round(dot(diff, diff), 6)
    }
    // persist the subvector frame for the loop's lifetime (the
    // trainCoarse discipline): init + every Lloyd round re-derived the
    // subspace explode otherwise — iters+2 passes become one
    val sc0 = subs.persist()
    try {
    // deterministic init: subvectors of the PqK lowest vec_ids per subspace
    val initIds = sc0.select($"vec_id").distinct()
      .orderBy($"vec_id").limit(PqK)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    var codebook: Seq[(Int, Int, Seq[Double])] = sc0
      .where($"vec_id".isin(initIds.keys.toSeq: _*))
      .select($"vec_id", $"m", $"sv").as[(Long, Int, Seq[Double])]
      .collect().map { case (id, m, sv) => (m, initIds(id), sv) }.toSeq
    var err = Double.NaN
    for (_ <- 0 until iters) {
      val cb = broadcast(codebook.toDF("m", "j", "c"))
      // assign: argmin-L2 codeword per (vector, subspace) — struct-min
      // agg (partial aggregation applies; never a window)
      val assign = sc0.join(cb, "m")
        .select($"vec_id", $"m", $"sv", $"j", d2($"sv", $"c").as("d2"))
        .groupBy($"vec_id", $"m")
        .agg(min(struct($"d2", $"j", $"sv")).as("best"))
        .select($"m", $"best.j".as("j"), $"best.d2".as("d2"),
          $"best.sv".as("sv"))
      // re-mean: ORDER-INDEPENDENT exact micro-unit integer sums per
      // (subspace, codeword, dimension) + the total quantization error,
      // in ONE pass (PqD fixed sum columns — no per-element explode);
      // the division + 6-dp round run as Spark expressions so the
      // rounding semantics are the engine's own
      val aggCols = sum($"d2").as("qerr") +: count(lit(1)).as("n") +:
        (0 until PqD).map(i =>
          sum(round($"sv"(i) * 1e6).cast("long").cast("decimal(38,0)")).as(s"s$i"))
      val stats = assign.groupBy($"m", $"j")
        .agg(aggCols.head, aggCols.tail: _*)
        .select(($"m" +: $"j" +: $"qerr" +: (0 until PqD).map(i =>
          round(col(s"s$i").cast("double") / 1e6 / $"n", 6).as(s"c$i"))): _*)
        .collect()
      err = stats.map(_.getDouble(2)).sum
      val moved = stats.map { r =>
        (r.getInt(0), r.getInt(1),
          (0 until PqD).map(i => r.getDouble(3 + i)): Seq[Double])
      }.map { case (m, j, c) => (m, j) -> c }.toMap
      // empty clusters keep their previous codeword
      codebook = codebook.map { case (m, j, c) => (m, j, moved.getOrElse((m, j), c)) }
    }
    (broadcast(codebook.toDF("m", "j", "c")), err)
    } finally sc0.unpersist(blocking = false)
  }

  /** IVF-PQ — the composed 100 TB ANN architecture the PQ scaladoc
    * declares: the seeded k-means coarse quantizer ([[annIvfKmeans]]
    * precedent) PRUNES the scan to nprobe inverted lists, and TRAINED
    * residual product quantization COMPRESSES every stored vector to
    * [[PqM]] code bytes. Vectors store (list, code₁..code_M) where codes
    * quantize the RESIDUAL vn − centroid (shared codebooks across
    * lists); a query scores a candidate as q·c + Σₘ LUT[m, codeₘ] — the
    * q·c term comes with the probe, the LUT is the query's dot with
    * each residual codeword (nq·M·K entries, broadcast). The ADC scores
    * rank a SHORTLIST of [[IvfPqShortlist]] candidates per query, which
    * a refine stage then scores EXACTLY (the standard IVF-PQ + refine
    * composition): per query the compressed scan touches
    * ~nprobe/nlist of the corpus reading bytes, and full floats are
    * fetched only for shortlist rows (an nq·shortlist-sized broadcast
    * equi-join). Everything corpus-sized moves through broadcast
    * equi-joins and struct-min aggs only.
    */
  val IvfPqNList = 16
  val IvfPqNProbe = 2
  val IvfPqIters = 5
  val IvfPqShortlist = 20

  /** The IVF-PQ search on any unit-normalized (vec_id, vn) frame —
    * factored like [[pqTopK]] so the spec can drive planted vectors.
    */
  private[graft] def ivfPqTopK(s: SparkSession, vnIn: DataFrame,
      qPred: Column): DataFrame =
    ivfPqFrames(s, vnIn, qPred)._1

  /** [[ivfPqTopK]] plus its ADC candidate stage: returns (top-5 frame,
    * ADC-scored (q_id, neighbor_id) pairs). The second frame's row count
    * is the method's touched-candidate volume — the compressed scan of
    * the probed lists, BEFORE the shortlist cut — priced by
    * [[annRecallTrained]]. One construction builds both (the coarse fit
    * and codebook training run once; the checkpointed assignment is
    * shared by both lineages).
    */
  private def ivfPqFrames(s: SparkSession, vnIn: DataFrame,
      qPred: Column): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vn = vnIn.select($"vec_id", $"vn")
    // coarse quantizer: the DETERMINISTIC Lloyd trainer on the unit
    // sphere (min-L2 on unit vectors ⇔ max cosine) — SQL-reproducible
    // like every other stage of this index since round 15
    val cents = broadcast(coarseCentFrame(s,
        trainCoarse(s, vn.select($"vec_id", $"vn".as("v")), IvfPqNList))
      .select($"cent_id", $"cv"))
    // assign each vector to its nearest list; carry the RESIDUAL
    // localCheckpoint (eager) truncates the lineage: the Lloyd loop,
    // the encode pass, and the init collect all re-read the assignment
    // instead of re-deriving the quantizer DAG per job; the
    // materialized partitions are reclaimed by the ContextCleaner when
    // this frame goes out of scope
    val assign = vn.crossJoin(cents)
      .select($"vec_id", $"vn", $"cent_id",
        round(dot(zip_with($"vn", $"cv", (x, y) => x - y),
          zip_with($"vn", $"cv", (x, y) => x - y)), 6).as("d2"))
      .groupBy($"vec_id")
      .agg(min(struct($"d2", $"cent_id", $"vn")).as("best"))
      .select($"vec_id", $"best.cent_id".as("cent_id"), $"best.vn".as("vn"))
      .join(cents, "cent_id")
      .select($"vec_id", $"cent_id",
        zip_with($"vn", $"cv", (x, y) => x - y).as("r"))
      .localCheckpoint()
    def subspaces(vecCol: Column): Column = explode(array((0 until PqM).map { m =>
      struct(lit(m).as("m"), slice(vecCol, m * PqD + 1, PqD).as("sv"))
    }: _*))
    // train shared residual codebooks on a DETERMINISTIC ¼ sample
    // (codebook quality needs a bounded training set, not the corpus —
    // the standard points-per-centroid cap practice; at 100 TB the
    // sampling predicate is what keeps index-build cost flat), then
    // encode EVERY vector's residual to M one-byte codes (struct-min
    // agg, pqTopK precedent)
    val rsubs = assign.select($"vec_id", subspaces($"r").as("ms"))
      .select($"vec_id", $"ms.m".as("m"), $"ms.sv".as("sv"))
    val (cb, _) = trainPqCodebooks(s,
      rsubs.where(pmod($"vec_id", lit(4)) === 0), IvfPqIters)
    val enc = rsubs.join(cb, "m")
      .withColumn("diff", zip_with($"sv", $"c", (x, y) => x - y))
      .withColumn("d2", round(dot($"diff", $"diff"), 6))
      .groupBy($"vec_id", $"m")
      .agg(min(struct($"d2", $"j")).as("best"))
      .select($"vec_id", $"m", $"best.j".as("code"))
      .join(assign.select($"vec_id", $"cent_id"), "vec_id")
    // probes: each query's nprobe nearest lists, with the q·c base term
    val wProbe = Window.partitionBy($"q_id").orderBy($"qc".desc, $"cent_id".asc)
    val q = vn.where(qPred).select($"vec_id".as("q_id"), $"vn".as("qv"))
    val probes = q.crossJoin(cents)
      .select($"q_id", $"qv", $"cent_id", round(dot($"qv", $"cv"), 6).as("qc"))
      .withColumn("prk", row_number().over(wProbe))
      .where($"prk" <= IvfPqNProbe)
      .select($"q_id", $"cent_id", $"qc")
    // ADC lookup table: query subvector × residual codeword dots
    val lut = q.select($"q_id".as("lq"), subspaces($"qv").as("ms"))
      .select($"lq", $"ms.m".as("lm"), $"ms.sv".as("qs"))
      .join(cb, $"lm" === $"m")
      .select($"lq", $"lm", $"j".as("lj"), dot($"qs", $"c").as("pdot"))
    // pruned + compressed scan: probed lists only, scored via LUT
    val adc = enc.join(broadcast(probes), "cent_id")
      .where($"vec_id" =!= $"q_id")
      .join(broadcast(lut), $"q_id" === $"lq" && $"m" === $"lm" &&
        $"code" === $"lj")
      .groupBy($"q_id", $"vec_id")
      .agg(round(max($"qc") +
        graft.functions.FloatFold.orderedSum($"m", $"pdot"), 6).as("approx_cos"))
      .withColumnRenamed("vec_id", "neighbor_id")
    val wShort = Window.partitionBy($"q_id")
      .orderBy($"approx_cos".desc, $"neighbor_id".asc)
    val shortlist = adc.withColumn("srk", row_number().over(wShort))
      .where($"srk" <= IvfPqShortlist)
      .select($"q_id", $"neighbor_id", $"approx_cos")
    // refine: exact scores for shortlist rows only — full floats are
    // read for nq·shortlist vectors, not the probed lists
    val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id".asc)
    val topk = broadcast(shortlist)
      .join(vn.select($"vec_id".as("neighbor_id"), $"vn".as("nv")), "neighbor_id")
      .join(broadcast(q.withColumnRenamed("q_id", "jq")), $"q_id" === $"jq")
      .select($"q_id", $"neighbor_id", $"approx_cos",
        round(dot($"qv", $"nv"), 6).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .where($"rank" <= 5)
      .orderBy($"q_id", $"rank")
    (topk, adc.select($"q_id", $"neighbor_id"))
  }

  /** Registered IVF-PQ query: unit-normalized embeddings, first 10
    * vectors as queries, top-5 by pruned ADC score. Hash-checked
    * end-to-end since the deterministic trainers landed
    * ([[annIvfPqSql]] re-derives every stage); SimilaritySpec pins the
    * recall floor vs. brute-force top-5 and that codebook training
    * tightened quantization error.
    */
  def annIvfPq(s: SparkSession, dir: String): DataFrame =
    annIvfPqBoth(s, dir)._1

  /** The memoized (top-5, ADC candidate pairs) pair behind [[annIvfPq]]
    * and [[annRecallTrained]]: the coarse-quantizer fit + Lloyd codebook
    * training + the checkpointed assignment all live in the pair's
    * construction — memoized per session so the registered query and
    * the recall scoreboard pay the index build once.
    */
  private def annIvfPqBoth(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    SessionCache.getOrCompute(s, s"sim.ivfPq:$dir") {
      ivfPqFrames(s, unitVecs(s, dir), col("vec_id") < 10)
    }

  /** Index build + search, uncached — the determinism spec's entry. */
  private[graft] def annIvfPqUncached(s: SparkSession, dir: String): DataFrame =
    ivfPqTopK(s, unitVecs(s, dir), col("vec_id") < 10)

  /** DuckDB re-derivation of the RESIDUAL codebook training
    * ([[trainPqCodebooks]] at [[IvfPqIters]] unrolled): pcb0 init from
    * the 16 lowest sample vec_ids' residual subvectors, then per
    * iteration an assignment CTE, the exact-integer per-dimension
    * re-mean, and the coalesced codebook. Assumes rsubs(vec_id, m, sv)
    * and samp (its ¼-sample) are defined by the enclosing WITH; ends in
    * pcb[[IvfPqIters]](m, j, c).
    */
  private def residualCodebookCtesSql: String = {
    // MATERIALIZED throughout — the coarseCtesSql inlining-blowup note,
    // squared: pcb_{t-1} is referenced twice per iteration on top of an
    // already-chained coarse quantizer
    val iters = (1 to IvfPqIters).map { t =>
      s"""pa$t AS MATERIALIZED (
         |  SELECT m, vec_id, sv, j FROM (
         |    SELECT s.m, s.vec_id, s.sv, c.j,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY ${l2RoundSql("s.sv", "c.c")} ASC, c.j ASC) AS rk
         |    FROM samp s JOIN pcb${t - 1} c USING (m)) z
         |  WHERE rk = 1),
         |pm$t AS MATERIALIZED (
         |  SELECT m, j, d.i AS dim,
         |    round(CAST(sum(CAST(round(sv[d.i] * 1000000) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / count(*), 6) AS cd
         |  FROM pa$t, (SELECT unnest(generate_series(1, $PqD)) AS i) d
         |  GROUP BY m, j, d.i),
         |pcb$t AS MATERIALIZED (
         |  SELECT p.m, p.j, coalesce(mm.c, p.c) AS c
         |  FROM pcb${t - 1} p LEFT JOIN (
         |    SELECT m, j, list(cd ORDER BY dim) AS c FROM pm$t GROUP BY m, j) mm
         |    USING (m, j))""".stripMargin
    }.mkString(",\n")
    s"""sampids AS MATERIALIZED (
       |  SELECT vec_id, j FROM (
       |    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j
       |    FROM (SELECT DISTINCT vec_id FROM samp) ids) z
       |  WHERE j < $PqK),
       |pcb0 AS MATERIALIZED (
       |  SELECT s.m, si.j, s.sv AS c FROM samp s JOIN sampids si USING (vec_id)),
       |$iters""".stripMargin
  }

  /** ORACLE for the composed IVF-PQ index — since round 15 EVERY stage
    * is deterministic, so DuckDB re-derives the whole architecture:
    * the unrolled coarse Lloyd chain on the unit sphere, min-L2 list
    * assignment + residuals, the unrolled residual codebook training on
    * the ¼ sample, full-corpus encoding, probes with the q·c base term,
    * the broadcast-LUT ADC fold, the 20-candidate shortlist, and the
    * exact refine.
    */
  /** The [[annIvfPqSql]] chain's CTE prefix through the pruned ADC scan
    * — shared by the search oracle and the trained scoreboard's
    * candidate-volume count ([[ivfPqCandCountSql]]).
    */
  private def ivfPqCtesSql: String = {
    s"""vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |vr AS (SELECT vec_id, v, sqrt(${dotESql("v", "v")}) AS nrm FROM vv),
       |vn AS MATERIALIZED (
       |  SELECT vec_id, [v[i] / nrm for i in generate_series(1, len(v))] AS v,
       |    1.0 AS nrm
       |  FROM vr),
       |${coarseCtesSql(s"SELECT $IvfPqNList AS k")},
       |asg AS MATERIALIZED (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT t.vec_id, t.v, c.cent_id,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY ${l2RoundSql("t.v", "c.cv")} ASC, c.cent_id ASC) AS rk
       |    FROM vn t CROSS JOIN cents c) z
       |  WHERE rk = 1),
       |res AS MATERIALIZED (
       |  SELECT a.vec_id, a.cent_id,
       |    [a.v[i] - c.cv[i] for i in generate_series(1, len(a.v))] AS r
       |  FROM asg a JOIN cents c USING (cent_id)),
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |rsubs AS MATERIALIZED (
       |  SELECT vec_id, m, [r[m * $PqD + i] for i in generate_series(1, $PqD)] AS sv
       |  FROM res, ms),
       |samp AS MATERIALIZED (SELECT * FROM rsubs WHERE vec_id % 4 = 0),
       |$residualCodebookCtesSql,
       |enc AS MATERIALIZED (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT s.vec_id, s.m, c.j,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY ${l2RoundSql("s.sv", "c.c")} ASC, c.j ASC) AS rk
       |    FROM rsubs s JOIN pcb$IvfPqIters c USING (m)) z
       |  WHERE rk = 1),
       |encc AS (
       |  SELECT e.vec_id, e.m, e.code, a.cent_id
       |  FROM enc e JOIN asg a USING (vec_id)),
       |qs AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM vn WHERE vec_id < 10),
       |probes AS (
       |  SELECT q_id, cent_id, qc FROM (
       |    SELECT q.q_id, c.cent_id, round(${dotESql("q.qv", "c.cv")}, 6) AS qc,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY round(${dotESql("q.qv", "c.cv")}, 6) DESC,
       |          c.cent_id ASC) AS rk
       |    FROM qs q CROSS JOIN cents c) z
       |  WHERE rk <= $IvfPqNProbe),
       |qsubs AS (
       |  SELECT q_id, m, [qv[m * $PqD + i] for i in generate_series(1, $PqD)] AS sv
       |  FROM qs, ms),
       |lut AS (
       |  SELECT s.q_id, s.m, c.j, ${dotESql("s.sv", "c.c")} AS pdot
       |  FROM qsubs s JOIN pcb$IvfPqIters c USING (m)),
       |adc AS (
       |  SELECT p.q_id, e.vec_id AS neighbor_id,
       |    round(max(p.qc) +
       |      ${graft.functions.FloatFold.orderedSumSql("l.pdot", "e.m")}, 6)
       |      AS approx_cos
       |  FROM encc e JOIN probes p USING (cent_id)
       |  JOIN lut l ON l.q_id = p.q_id AND l.m = e.m AND l.j = e.code
       |  WHERE e.vec_id <> p.q_id
       |  GROUP BY p.q_id, e.vec_id)""".stripMargin
  }

  def annIvfPqSql: String =
    s"""WITH ${ivfPqCtesSql},
       |short AS (
       |  SELECT q_id, neighbor_id, approx_cos FROM (
       |    SELECT adc.*, row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_cos DESC, neighbor_id ASC) AS rk
       |    FROM adc) z
       |  WHERE rk <= $IvfPqShortlist)
       |SELECT q_id, neighbor_id, approx_cos, cos, rank FROM (
       |  SELECT s.q_id, s.neighbor_id, s.approx_cos,
       |    round(${dotESql("q.qv", "n.v")}, 6) AS cos,
       |    CAST(row_number() OVER (PARTITION BY s.q_id
       |      ORDER BY round(${dotESql("q.qv", "n.v")}, 6) DESC,
       |        s.neighbor_id ASC) AS INT) AS rank
       |  FROM short s JOIN qs q USING (q_id) JOIN vn n ON n.vec_id = s.neighbor_id) z
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** n_candidates of the ivf_pq scoreboard row, re-derived: ADC-scored
    * (query, vector) pairs within the probed lists, pre-shortlist.
    */
  private def ivfPqCandCountSql: String =
    s"""WITH ${ivfPqCtesSql}
       |SELECT CAST(count(*) AS BIGINT) AS n FROM adc""".stripMargin

  /** ORACLE for the residual-PQ recall row: the IVF-PQ chain's top-k
    * intersected with the brute-force top-5, same shape as
    * [[annRecallSql]].
    */
  def annRecallTrainedSql: String =
    s"""WITH brute AS (SELECT q_id, neighbor_id FROM ($annCosineTopKSql)),
      |pqv AS (SELECT q_id, neighbor_id FROM ($annIvfPqSql)),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM brute),
      |hits AS (
      |  SELECT 'ivf_pq' AS method, count(*) AS hits
      |  FROM pqv JOIN brute USING (q_id, neighbor_id))
      |SELECT method, CAST(hits AS BIGINT) AS hits, n_truth,
      |  round(CAST(hits AS DOUBLE) / n_truth, 4) AS recall_at_5,
      |  CAST((SELECT n FROM ($ivfPqCandCountSql) t) AS BIGINT) AS n_candidates
      |FROM hits CROSS JOIN nt ORDER BY method""".stripMargin

  /** τ floor of the LSH route: at τ ≥ 0.7 (θ ≤ 45.6°, per-plane sign
    * agreement p = 1 − θ/π ≈ 0.747) a 32-band × 8-bit sign-LSH candidate
    * filter has per-pair band recall 1 − (1 − p⁸)³² ≈ 0.961 at the floor
    * — rising steeply with τ: ≈ 0.996 at τ = 0.8, ≈ 0.99998 at τ = 0.9,
    * the dup regime — and the [[HammingMax]] prefilter multiplies in
    * ~1 − 3·10⁻⁹ (a 5.7σ cut at the floor), so candidates + exact verify
    * is the scale path. Below the floor band recall collapses toward the
    * measured near-orthogonal regime (τ = 0.4 → θ ≈ 66°, recall ≪ 1)
    * and NO exact sub-quadratic filter exists for dense vectors, so the
    * only exact plan is the quadratic blocked sweep. The 8-bit band
    * keyspace (256 buckets/band) is what makes the route sub-quadratic
    * in practice: near-orthogonal bulk (p ≈ 0.5) collides in an expected
    * 32·2⁻⁸ = 1/8 bands per pair, vs 16·2⁻⁴ = 1 under the pre-round-18
    * 16×4 banding whose bulk term the dup ladder measured at
    * fitted_exp 1.78 (SURVEY §8j).
    */
  val TauLshFloor = 0.7

  /** ROUTED threshold-cosine dedup — the documented entry point a
    * pipeline calls instead of picking a pair plan by hand:
    *
    *  - `allowQuadratic = true`: the bounded-task blocked sweep
    *    ([[blockedPairs]]) at ANY τ — the only truly EXACT plan (every
    *    qualifying pair, no candidate filter). O(n²) compares, so
    *    affordable only below corpus scale; an explicit opt-in always
    *    dispatches here, including above the LSH floor.
    *  - otherwise, `tau ≥` [[TauLshFloor]]: banded sign-LSH candidates +
    *    exact cosine verification ([[lshVerified]]). Sub-quadratic; NO
    *    false positives (the verify step recomputes true cosine), and
    *    per-pair candidate recall ≥ (1 − (1 − p⁸)³²) · P[h ≤ 92] with
    *    p = 1 − θ/π (band recall ≈ 0.961 at the floor, ≈ 0.996 at
    *    τ = 0.8, ~1 − 2·10⁻⁵ at τ = 0.9; the [[HammingMax]] prefilter
    *    multiplies in 1 − 6.2·10⁻⁵ at the floor, ~1 above it) —
    *    near-exact but NOT exhaustive. This is the 100 TB route.
    *  - otherwise (`tau <` floor, no opt-in): exact low-τ semantics are
    *    inherently O(n²) compares (SURVEY §5) and band recall collapses,
    *    so the router REFUSES rather than silently going quadratic.
    *
    * The registered q_embed_cosine_dedup stays the τ=0.4 blocked sweep
    * (the driver's embeddings have no high-cos pairs to route) as the
    * small-SF exact twin; the LSH leg itself is hash-checked as the
    * registered q_embed_cosine_dedup_lsh ([[cosineDedupLshTop]]), and
    * this entry point is the library surface, spec'd on planted
    * near-duplicates (SimilaritySpec).
    */
  def cosineDedupRouted(s: SparkSession, dir: String, tau: Double,
      allowQuadratic: Boolean = false): DataFrame =
    routedPairs(s, vecs(s, dir), tau, allowQuadratic)

  private[graft] def routedPairs(s: SparkSession, v: DataFrame, tau: Double,
      allowQuadratic: Boolean): DataFrame =
    if (allowQuadratic) blockedPairs(s, v, tau)
    else if (tau >= TauLshFloor) lshVerified(s, v, tau)
    else throw new IllegalArgumentException(
      s"exact cosine pairs at tau=$tau < $TauLshFloor require O(n^2) compares " +
        "(no sub-quadratic exact filter exists for dense vectors at low tau); " +
        "pass allowQuadratic=true to run the blocked sweep on a sub-corpus " +
        "input, or raise tau to use the LSH-verified route")

  /** MurmurHash3's 64-bit finalizer (fmix64) — the public
    * xorshift-multiply avalanche chain. The pre-round-18 plane family
    * fed the seed through ONE raw LCG step (k·A + C), whose lattice
    * structure made consecutive planes near-PARALLEL (measured: median
    * |cos| between plane pairs 0.39, some pairs identical) — the
    * signature's 256 bits spanned only a handful of independent
    * directions, Hamming distances concentrated far below the binomial
    * model, and the band buckets collided on moderately-similar bulk at
    * ~12% of ALL pairs. That plane degeneracy — not the band keyspace —
    * was the real root cause of the route's measured quadratic regime
    * (SURVEY §8j). fmix64's three xorshift-multiply rounds restore
    * full-entropy coefficients (measured plane-pair |cos| ~ N(0, 1/64),
    * exactly the random-direction ideal), and every step is exact
    * HUGEINT arithmetic in the oracle's mirror (xor, floor-div by 2³³,
    * and a split 32-bit multiply mod 2⁶⁴ that stays inside INT128).
    */
  private def fmix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xFF51AFD7ED558CCDL
    z ^= (z >>> 33); z *= 0xC4CEB9FE1A85EC53L
    z ^= (z >>> 33)
    z
  }

  /** The 256 sign-LSH hyperplanes, materialized once on the driver —
    * the signature loop below and the oracle's `planes` CTE both
    * re-derive exactly these doubles from the same [[fmix64]] chain.
    * The plane family is 64-dim WIDE by construction (one coefficient
    * per embedding dimension): the route requires 64-dim input,
    * asserted fail-fast in the signature loop, because the oracle
    * indexes v[1..64] against plane[1..64] and any other width would
    * silently diverge.
    */
  private lazy val signPlanes: Array[Array[Double]] =
    Array.tabulate(SignPlaneCount, 64) { (p, d) =>
      val x = fmix64((p * 64 + d).toLong)
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  /** 256-bit sign signatures packed into [[SignWords]] longs (plane p →
    * bit p%64 of word p/64), computed per row in a mapPartitions
    * primitive loop against the broadcast plane matrix (the
    * [[assignIds]] precedent): the equivalent higher-order-function
    * expression — nested zip_with/aggregate lambdas — is
    * CodegenFallback, so it interpreted planes×dims expression nodes
    * PER ROW and dominated the route's sf1 wall time. The float
    * arithmetic is the expression's step for step: per plane one
    * left-to-right product-accumulate fold from 0.0 (each multiply and
    * add rounds individually — the JVM emits no fused multiply-add),
    * the bit set iff the fold is strictly positive, bits assembled with
    * OR (bit 63 through a sum would wrap the long).
    */
  private def signSignatures(s: SparkSession, vin: DataFrame): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(signPlanes)
    vin.select($"vec_id", $"v").as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val planes = bc.value
        it.map { case (id, vec) =>
          val a = vec.toArray
          require(a.length == 64,
            s"sign-LSH route requires 64-dim embeddings (the plane family " +
              s"and the oracle both index dims 1..64); got ${a.length} for vec_id=$id")
          val sig = new Array[Long](SignWords)
          var p = 0
          while (p < SignPlaneCount) {
            val pl = planes(p)
            var acc = 0.0
            var i = 0
            while (i < 64) { acc += pl(i) * a(i); i += 1 }
            if (acc > 0) sig(p / 64) |= (1L << (p % 64))
            p += 1
          }
          (id, sig)
        }
      }.toDF("vec_id", "sig")
      .select(($"vec_id" +: (0 until SignWords).map(w =>
        col("sig").getItem(w).as(s"s$w"))): _*)
  }

  /** The banded signature index: one row per (vector, band) with the
    * band's 8-bit bucket key and the four packed signature words along
    * for downstream Hamming work. Band k takes bits [8k, 8k+8) of the
    * signature: word k/8, shift 8·(k mod 8). Shared by the dedup
    * route's candidate join ([[lshVerifiedCandidates]]) and the ANN
    * multi-table probe ([[lshTopK]], [[annLsh]]) — ONE index serves
    * both workloads, which is exactly how a production deployment
    * would materialize it.
    */
  private def signBands(s: SparkSession, vin: DataFrame): DataFrame =
    bandsFrom(s, signSignatures(s, vin))

  /** Band explosion over an existing signature frame — split from
    * [[signBands]] so the memoized signature index can feed it too.
    */
  private def bandsFrom(s: SparkSession, sigs: DataFrame): DataFrame = {
    import s.implicits._
    val sigCols = (0 until SignWords).map(w => col(s"s$w"))
    // word/shift/mask derived from SignBandBits (not a hardcoded
    // 8-bands-per-word layout), so the tuning lever at the top of the
    // object actually tunes this extraction (ADVICE r18); the top-of-
    // object require pins the no-word-straddle precondition
    sigs
      .select(($"vec_id" +: sigCols) :+
        explode(array((0 until SignBandCount).map { k =>
          val word = (k * SignBandBits) / 64
          val shift = (k * SignBandBits) % 64
          val mask = (1L << SignBandBits) - 1
          struct(lit(k).as("band"),
            shiftrightunsigned(col(s"s$word"), shift)
              .bitwiseAND(lit(mask)).as("bits"))
        }: _*)).as("bk"): _*)
      .select(($"vec_id" +: sigCols) :+ $"bk.band" :+ $"bk.bits": _*)
  }

  /** High-τ leg: 32 bands × 8 sign bits generate candidates (equi-join
    * within a (band, bits) bucket — never all-pairs), candidate id pairs
    * dedup BEFORE verification (one dot product per pair, not per
    * colliding band), then the exact rounded cosine filters at `tau`.
    * Every join is an equi-join on bounded keys; at corpus scale the
    * bucket join is the same shape as the MinHash band join in
    * Dedup.minhashLsh.
    */
  private[graft] def lshVerified(s: SparkSession, vin: DataFrame, tau: Double): DataFrame = {
    import s.implicits._
    lshVerifiedCandidates(s, vin)
      .where($"cos" >= tau)
      .orderBy($"id_a", $"id_b")
  }

  /** Hamming prefilter bound on the 256-bit sign signature: a pair at
    * the τ = 0.7 floor (θ ≈ 45.6°) flips each sign bit with
    * p = θ/π ≈ 0.253, so its Hamming distance is Binomial(256, 0.253)
    * — mean 64.8, σ 6.96 — and P[h ≤ 92] = 1 − 6.2·10⁻⁵ exactly (a
    * 4.0σ cut; every pair ABOVE the floor is safer still). The
    * near-orthogonal bulk (θ ≈ 90°, h ~ Binomial(256, 0.5), mean 128,
    * σ 8) passes with only P = 4.0·10⁻⁶, so the distinct/fetch/verify
    * stages see ~4 per MILLION of the band-collision volume on a
    * no-dup-structure corpus. TIGHTENED 104 → 92 in round 19: the r18
    * choice (5.7σ, the 64-bit scheme's 26/64 scaled proportionally)
    * passed 0.16% of the bulk, and the sf3 deep-ladder rung measured
    * the consequence — 3.8·10⁷ of 2.7·10⁸ band emits surviving into
    * the verify fetch, whose per-pair 64-double payload turned the
    * two id-joins into a ~20 GB shuffle (~60 of the route's 66 s;
    * DiagLsh decomposition, §8l). At 4σ the certified floor recall
    * drops by 6·10⁻⁵ while the quadratic term's constant shrinks
    * ~400×: the verify volume is now dup-driven, not bulk-driven,
    * which is the only posture that survives 100 TB. The filter runs
    * as a streamed scalar predicate on the signature words the bucket
    * join already carries — BEFORE the candidate distinct and the
    * vector fetch.
    */
  private val HammingMax = 92

  /** The LSH route's verified candidate frame — the 3-stage cascade:
    * banded sign-LSH bucket collisions (coarse), Hamming prefilter on
    * the full 256-bit signatures (fine, [[HammingMax]]), exact rounded
    * cosine (verify) — before any τ filter; one source for
    * [[lshVerified]] and the registered [[cosineDedupLshTop]].
    * Band k takes bits [8k, 8k+8) of the packed signature: word k/8,
    * shift 8·(k mod 8) — the bands partition the 256 bits, which is
    * what lets the oracle reconstruct the full Hamming distance as a
    * sum of per-band bit_count(xor).
    */
  /** DiagLsh stage hooks (throwaway diagnostics, not registered). */
  private[graft] def diagVecs(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir)
  private[graft] def diagSignatures(s: SparkSession, dir: String): DataFrame =
    signSignatures(s, vecs(s, dir))
  private[graft] def diagBandCollisions(s: SparkSession, dir: String): (Long, Long) = {
    import s.implicits._
    val bands = signBands(s, vecs(s, dir))
    val left = bands.select(($"band" +: $"bits" +: $"vec_id".as("id_a") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"a$w"))): _*)
    val right = bands.select(($"band" +: $"bits" +: $"vec_id".as("id_b") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"b$w"))): _*)
    val hamming = (0 until SignWords)
      .map(w => bit_count(col(s"a$w").bitwiseXOR(col(s"b$w"))))
      .reduce(_ + _)
    val r = left.join(right, Seq("band", "bits"))
      .where($"id_a" < $"id_b")
      .select(count(lit(1)).as("emits"),
        sum(when(hamming <= HammingMax, 1L).otherwise(0L)).as("passed"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private[graft] def lshVerifiedCandidates(s: SparkSession, vin: DataFrame): DataFrame = {
    import s.implicits._
    val sigCols = (0 until SignWords).map(w => col(s"s$w"))
    val bands = signBands(s, vin)
    val left = bands.select(($"band" +: $"bits" +: $"vec_id".as("id_a") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"a$w"))): _*)
    val right = bands.select(($"band" +: $"bits" +: $"vec_id".as("id_b") +:
      (0 until SignWords).map(w => col(s"s$w").as(s"b$w"))): _*)
    val hamming = (0 until SignWords)
      .map(w => bit_count(col(s"a$w").bitwiseXOR(col(s"b$w"))))
      .reduce(_ + _)
    val cand = left.join(right, Seq("band", "bits"))
      .where($"id_a" < $"id_b" && hamming <= HammingMax)
      .select($"id_a", $"id_b").distinct()
    val va = vin.select($"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na"))
    val vb = vin.select($"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select($"id_a", $"id_b",
        round(dot($"va", $"vb") / ($"na" * $"nb"), 6).as("cos"))
  }

  /** The REGISTERED q_embed_cosine_dedup_lsh — the 100 TB cosine-dedup
    * ROUTE itself ([[lshVerified]], the τ ≥ [[TauLshFloor]] leg of
    * [[cosineDedupRouted]]) hash-checked end-to-end: the top-20
    * verified candidate pairs by exact cosine, each carrying the τ
    * gate's decision as a boolean. The driver's embeddings top out at
    * cos ≈ 0.51, so the τ = 0.7 filter itself would return zero rows —
    * the rank-limited shortlist keeps the oracle check NON-TRIVIAL
    * (every stage — 256-plane signature, banding, bucket join, exact
    * verify, ranking — must agree pair-for-pair) while `pass_tau`
    * encodes exactly what the route would emit. With this in the gate,
    * the registered q_embed_cosine_dedup (τ=0.4 blocked sweep) is the
    * documented small-SF EXACT twin; this query is the plan that runs
    * at corpus scale.
    */
  def cosineDedupLshTop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lshVerifiedCandidates(s, vecs(s, dir))
      .select($"id_a", $"id_b", $"cos",
        ($"cos" >= TauLshFloor).as("pass_tau"))
      .orderBy($"cos".desc, $"id_a", $"id_b")
      .limit(20)
  }

  /** One fmix64 xorshift-multiply round's `z *= M` step in HUGEINT:
    * the full 64-bit operand would overflow INT128 when multiplied by a
    * 64-bit constant, so split the operand at 2³² — (a·M) mod 2⁶⁴ =
    * (a_lo·M + ((a_hi·M) mod 2³²)·2³²) mod 2⁶⁴, every intermediate
    * < 2⁹⁶.
    */
  private def sqlMulMod(e: String, c: BigInt): String =
    s"((($e) % 4294967296) * $c + (((($e) // 4294967296) * $c) % 4294967296)" +
      s" * 4294967296) % 18446744073709551616"

  /** The [[fmix64]] plane-coefficient CTE chain shared verbatim by the
    * route oracle: seed = p·64+d, three xorshift(33)/multiply rounds in
    * exact HUGEINT, then the engine's (z >>> 11)/2⁵³ → [−1, 1) mapping
    * (all intermediates < 2⁵³, so the int→double cast is exact).
    */
  private lazy val signPlanesCtesSql: String = {
    val m1 = BigInt("18397679294719823053") // 0xFF51AFD7ED558CCD unsigned
    val m2 = BigInt("14181476777654086739") // 0xC4CEB9FE1A85EC53 unsigned
    s"""pd AS (
       |  SELECT p, d, CAST(p * 64 + d AS HUGEINT) AS z0
       |  FROM (SELECT unnest(generate_series(0, ${SignPlaneCount - 1})) AS p),
       |       (SELECT unnest(generate_series(0, 63)) AS d)),
       |z1 AS (SELECT p, d, xor(z0, z0 // 8589934592) AS z FROM pd),
       |z2 AS (SELECT p, d, ${sqlMulMod("z", m1)} AS z FROM z1),
       |z3 AS (SELECT p, d, xor(z, z // 8589934592) AS z FROM z2),
       |z4 AS (SELECT p, d, ${sqlMulMod("z", m2)} AS z FROM z3),
       |z5 AS (SELECT p, d, xor(z, z // 8589934592) AS z FROM z4),
       |planes AS (
       |  SELECT p, list(
       |      (CAST(z // 2048 AS DOUBLE) / 9007199254740992.0) * 2.0 - 1.0
       |      ORDER BY d) AS plane
       |  FROM z5 GROUP BY p)""".stripMargin
  }

  /** Oracle twin of [[cosineDedupLshTop]]: the 256 [[fmix64]]
    * hyperplanes re-derived in exact HUGEINT ([[signPlanesCtesSql]]),
    * 8-bit band keys from the plane signs, bucket-join
    * candidates, the engine's [[HammingMax]] prefilter mirrored as a
    * per-pair sum of band-wise bit_count(xor) — the bands partition the
    * 256 signature bits, so the sum IS the full Hamming distance; the
    * engine gates before its candidate distinct and the oracle after,
    * which is equivalent because the predicate is a pure per-pair
    * function — then exact left-to-right-fold cosine verify, top-20
    * with the τ-gate boolean. [[HammingMax]] is interpolated, not
    * hardcoded, so tuning the engine constant cannot silently diverge
    * from the oracle.
    */
  /** The route's candidate-stage CTE chain — band-bucket collisions
    * (cand0) through the Hamming prefilter (cand) — shared by the
    * registered shortlist oracle ([[cosineDedupLshSql]]) and the route
    * recall scoreboard ([[lshRouteRecallSql]]).
    */
  private lazy val lshCandCtesSql: String =
    s"""$signBandsCtesSql,
       |cand0 AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bits = y.bits
       |  WHERE x.vec_id < y.vec_id),
       |cand AS MATERIALIZED (
       |  -- the engine's Hamming prefilter on the full 256-bit signature:
       |  -- the 32 bands partition the 256 bits, so the pair's Hamming
       |  -- distance is the sum over bands of bit_count(xor(bits))
       |  SELECT c.id_a, c.id_b
       |  FROM cand0 c
       |  JOIN bands ba ON ba.vec_id = c.id_a
       |  JOIN bands bb ON bb.vec_id = c.id_b AND bb.band = ba.band
       |  GROUP BY c.id_a, c.id_b
       |  HAVING sum(bit_count(xor(ba.bits, bb.bits))) <= $HammingMax)""".stripMargin

  val cosineDedupLshSql: String =
    s"""WITH $lshCandCtesSql,
       |vn AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce([v[i] * v[i] for i in generate_series(1, len(v))],
       |      (x, y) -> x + y)) AS nrm
       |  FROM v),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    round(list_reduce([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))],
       |      (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cos
       |  FROM cand c JOIN vn a ON c.id_a = a.vec_id JOIN vn b ON c.id_b = b.vec_id)
       |SELECT id_a, id_b, cos, cos >= 0.7 AS pass_tau
       |FROM scored ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin

  /** The LSH cosine ROUTE's recall scoreboard — the measurement that
    * pins the (1−(1−p⁸)³²)·P[h ≤ [[HammingMax]]] recall model with
    * data: every exact pair from the blocked sweep (τ = 0.4,
    * [[cosineDedupBlocked]]) is checked for membership in the route's
    * candidate stage ([[lshVerifiedCandidates]] — bands + Hamming
    * prefilter; the exact-cosine verify drops nothing above any τ, so
    * candidate recall IS route recall), grouped into 0.05-wide cosine
    * bands. The expected shape on this corpus: ~0.5 at cos 0.4 (below
    * the route's τ floor — documented as unreliable territory), rising
    * through ~0.7 at 0.5 toward ≈ 0.96 at the 0.7 floor. A deployment
    * runs this on a bounded SAMPLE (the truth side is the O(n²)
    * sweep): recall is a property of the plane family, banding, and τ
    * — not of corpus size — so the sample-measured curve transfers.
    */
  def lshRouteRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = cosineDedupBlocked(s, dir).select($"id_a", $"id_b", $"cos")
    val cand = lshVerifiedCandidates(s, vecs(s, dir))
      .select($"id_a", $"id_b", lit(1).as("hit"))
    truth.join(cand, Seq("id_a", "id_b"), "left")
      .groupBy((floor($"cos" * 20) / 20).cast("double").as("cos_band"))
      .agg(count(lit(1)).as("n_true"), count($"hit").as("n_caught"))
      .select($"cos_band", $"n_true", $"n_caught",
        round($"n_caught".cast("double") / $"n_true", 4).as("recall"))
      .orderBy($"cos_band")
  }

  /** Oracle twin of [[lshRouteRecall]]: the blocked-sweep truth
    * ([[cosineDedupSql]] as a derived table) LEFT JOINed against the
    * route's candidate chain ([[lshCandCtesSql]]), banded and counted
    * with the same floor/round arithmetic.
    */
  lazy val lshRouteRecallSql: String =
    s"""WITH $lshCandCtesSql,
       |truth AS (SELECT id_a, id_b, cos FROM ($cosineDedupSql) t)
       |SELECT CAST(floor(t.cos * 20) / 20 AS DOUBLE) AS cos_band,
       |  CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(c.id_a) AS BIGINT) AS n_caught,
       |  round(CAST(count(c.id_a) AS DOUBLE) / count(*), 4) AS recall
       |FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
       |GROUP BY floor(t.cos * 20) / 20
       |ORDER BY cos_band""".stripMargin

  /** The ANN recall scoreboard — measured recall@5 against the
    * brute-force truth: ONE persisted brute-force frame (50 rows) and
    * one bounded semi-join per method. recall@5 = |returned ∩ true
    * top-5| / (queries × 5), the standard ANN benchmark statistic; a
    * method returning fewer than 5 candidates for a query (LSH with a
    * thin bucket) is priced honestly. Each row also carries
    * `n_candidates` — the method's touched-candidate volume (r19:
    * distinct probe-bucket pairs for lsh, probed-list pairs for the IVF
    * family, the full nq·(n−1) compressed scan for pq) — because recall
    * alone cannot rank an index: 0.8 recall touching n/8 beats 0.86
    * touching everything. This is the query a 100 TB deployment runs on
    * a sample before picking its index: the scoreboard is bounded no
    * matter the corpus. Split across two
    * registered queries by oracle strength: THIS one covers the
    * DuckDB-reproducible methods — lsh / ivf / pq AND (since the
    * coarse quantizer went deterministic) the trained ivf_kmeans —
    * hash-checked end-to-end ([[annRecallSql]]); [[annRecallTrained]]
    * covers ivf_pq, whose residual codebooks still train through
    * order-dependent float means. SimilaritySpec pins the floor each
    * method must clear on this corpus across both halves.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame =
    recallScoreboard(s, dir, Seq(
      "lsh" -> lshRanked(s, dir),
      "ivf" -> ivfRanked(s, vecs(s, dir), fixedCents(s, dir)),
      "ivf_kmeans" -> ivfRanked(s, vecs(s, dir), cachedCoarseCents(s, dir, 16)),
      "pq" -> pqRanked(s, unitVecs(s, dir), col("vec_id") < 10)))

  /** The residual-PQ half of the scoreboard, split out when its
    * training was not yet SQL-reproducible and kept separate so the
    * four-method board stays cheap to re-derive; same brute-force truth
    * frame and recall/volume algebra as [[annRecall]]. Its
    * `n_candidates` is the ADC-scored pair count (the compressed scan of
    * the probed lists, pre-shortlist) — the volume column that makes
    * ivf_pq comparable to the other rows.
    */
  def annRecallTrained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val brute = bruteTruth(s, dir)
    val nTruth = brute.count()
    val (topk, adcPairs) = annIvfPqBoth(s, dir)
    topk.select($"q_id", $"neighbor_id")
      .join(broadcast(brute), Seq("q_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(adcPairs.agg(count(lit(1)).as("n_candidates")))
      .select(lit("ivf_pq").as("method"), $"hits",
        lit(nTruth).as("n_truth"),
        round($"hits" / nTruth.toDouble, 4).as("recall_at_5"),
        $"n_candidates")
  }

  /** The brute-force truth frame, persisted once per (session, dir) —
    * both scoreboard halves intersect against the same 50 rows.
    */
  private def bruteTruth(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrCompute(s, s"sim.bruteTop5:$dir") {
      import s.implicits._
      val b = annCosineTopK(s, dir)
        .select($"q_id", $"neighbor_id").persist()
      b.count() // materialize
      b
    }

  /** One board row per method from its FULL ranked candidate frame
    * (rank over every scored candidate, pre-top-5): hits = |rank ≤ 5 ∩
    * brute-force truth| and n_candidates = the frame's row count — the
    * method's touched-candidate volume, read from the same single pass.
    * Recall alone cannot rank an index (0.8 recall touching n/8 beats
    * 0.86 touching the whole corpus); the volume column is what a
    * deployment weighs it against.
    */
  private def recallScoreboard(s: SparkSession, dir: String,
      methods: Seq[(String, DataFrame)]): DataFrame = {
    import s.implicits._
    val brute = bruteTruth(s, dir)
    val nTruth = brute.count() // = queries × 5 (persisted — cheap)
    val bruteHit = broadcast(brute.withColumn("hit", lit(1)))
    methods.map { case (name, ranked) =>
      ranked.select($"q_id", $"neighbor_id", $"rank")
        .join(bruteHit, Seq("q_id", "neighbor_id"), "left")
        .agg(count(when($"rank" <= 5, $"hit")).as("hits"),
          count(lit(1)).as("n_candidates"))
        .select(lit(name).as("method"), $"hits",
          lit(nTruth).as("n_truth"),
          round($"hits" / nTruth.toDouble, 4).as("recall_at_5"),
          $"n_candidates")
    }.reduce(_.unionByName(_)).orderBy($"method")
  }

  /** Oracle for the deterministic-quantizer scoreboard: each method's
    * top-k reproduced by its own oracle chain (the registered q_ann_lsh /
    * q_ann_ivf / q_ann_pq twins), intersected with the brute-force top-5
    * in SQL.
    */
  def annRecallSql: String =
    s"""WITH brute AS (SELECT q_id, neighbor_id FROM ($annCosineTopKSql)),
      |lshr AS (SELECT q_id, neighbor_id FROM ($lshTopKSql)),
      |ivfr AS (SELECT q_id, neighbor_id FROM ($annIvfSql)),
      |ivfk AS (SELECT q_id, neighbor_id FROM ($annIvfKmeansSql)),
      |pqr AS (SELECT q_id, neighbor_id FROM ($annPqSql)),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM brute),
      |hits AS (
      |  SELECT 'ivf' AS method, count(*) AS hits
      |  FROM ivfr JOIN brute USING (q_id, neighbor_id)
      |  UNION ALL
      |  SELECT 'ivf_kmeans', count(*) FROM ivfk JOIN brute USING (q_id, neighbor_id)
      |  UNION ALL
      |  SELECT 'lsh', count(*) FROM lshr JOIN brute USING (q_id, neighbor_id)
      |  UNION ALL
      |  SELECT 'pq', count(*) FROM pqr JOIN brute USING (q_id, neighbor_id)),
      |cands AS (
      |  SELECT 'ivf' AS method,
      |    (SELECT n FROM (${ivfCandCountSqlFrom(
             "cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM vn WHERE vec_id < 8)")}) t)
      |    AS n_candidates
      |  UNION ALL
      |  SELECT 'ivf_kmeans',
      |    (SELECT n FROM (${ivfCandCountSqlFrom(coarseCtesSql("SELECT 16 AS k"))}) t)
      |  UNION ALL
      |  SELECT 'lsh', (SELECT n FROM ($lshCandCountSql) t)
      |  UNION ALL
      |  SELECT 'pq', (SELECT n FROM ($pqCandCountSql) t))
      |SELECT method, CAST(hits AS BIGINT) AS hits, n_truth,
      |  round(CAST(hits AS DOUBLE) / n_truth, 4) AS recall_at_5,
      |  CAST(n_candidates AS BIGINT) AS n_candidates
      |FROM hits JOIN cands USING (method) CROSS JOIN nt
      |ORDER BY method""".stripMargin

  /** Norm-decorated view of an arbitrary (vec_id, v: array<double>)
    * frame — lets specs drive the router with planted vectors.
    */
  private[graft] def withNorms(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))

  /** DETERMINISTIC coarse-quantizer training — Lloyd's k-means made
    * hash-checkable, the discipline that let the PQ codebooks into the
    * oracle gate applied to the full-vector coarse quantizer. Init is
    * the k lowest vec_ids' vectors; each of [[CoarseIters]] rounds
    *
    *  1. assigns every vector ROW-LOCALLY against the packed centroid
    *     array (argmin of the 6-dp-rounded L2², ties to the lower
    *     cent_id) — zero shuffle, the corpus never moves;
    *  2. re-means each cluster with ORDER-INDEPENDENT exact integer
    *     sums (coordinates in micro-units summed as decimal(38,0) —
    *     the embedNormOutliers idiom), so the updated centroid is the
    *     same double on any partitioning AND in DuckDB's unrolled
    *     re-derivation ([[coarseCtesSql]]); new coordinates round to
    *     6 dp (cross-engine round parity), empty clusters keep their
    *     previous centroid.
    *
    * Driver state per round is the k×d codebook (KBs at any corpus
    * size; the trainPqCodebooks bounded-driver-work contract); cluster
    * shuffle per round is one k-group aggregate with map-side partial
    * aggregation. MLlib's seeded KMeans remains beside this as the
    * quality cross-check twin ([[fitCentroids]], SimilaritySpec) — the
    * deterministic fit exists so the k-means consumers can be CHECKED,
    * not because MLlib's is wrong.
    */
  val CoarseIters = 4

  /** 64 = [[PqM]]·[[PqD]] — the embedding store's dimension, pinned by
    * TablesSpec; the oracle's per-dimension re-mean unrolls over it.
    */
  val EmbedDim: Int = PqM * PqD

  /** Row-local argmin-L2² assignment of `vcol` against a driver-side
    * codebook: fold each centroid's distance inside one projection —
    * no join, no shuffle, the packed-centroid twin of ivfSearch's
    * broadcast assignment.
    */
  /** Spark's own Round(double, 6) semantics, replicated exactly —
    * java.math.BigDecimal.valueOf (the canonical Double.toString path)
    * + HALF_UP, the same function the SQL expression compiles to, so a
    * driver/executor-side Scala loop computes bit-identical values to
    * the declarative round(). DuckDB's round agrees on every value
    * observed in the gate, with one KNOWN midpoint caveat: DuckDB
    * rounds the BINARY double half-away-from-zero, while this decimal-
    * string path rounds the shortest DECIMAL rendering — on a double
    * whose decimal rendering is an exact 6-dp midpoint the two can
    * differ by one ulp of the 6th place. The L2² sums feeding argmin
    * assignment would hit this only if a distance lands exactly on
    * such a midpoint AND the two candidate centroids are that close;
    * the hash gate would surface it as a one-row assignment diff, and
    * the fix would be comparing scaled-integer distances instead.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Row-local argmin-L2² assignment against a broadcast codebook,
    * through the declared mapPartitions codec boundary (the BPE
    * encodeWord precedent): per row one primitive-loop scan of the k
    * centroids — zero shuffle, the corpus never moves, and ~100×
    * faster than the equivalent higher-order-function expression
    * (nested lambdas are CodegenFallback, so the fold interpreted
    * k×dim expression nodes PER ROW — measured as the planner's wall
    * time at k=128). The arithmetic is the oracle's, step for step:
    * left-to-right (x−y)² accumulation from 0.0, [[round6]] = the
    * engine round, ties to the lower cent_id.
    */
  private def assignIds(s: SparkSession, v: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents.sortBy(_._1).map(_._2.toArray).toArray)
    v.select($"vec_id", $"v").as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, vec) =>
          val a = vec.toArray
          var bestJ = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < cs.length) {
            val c = cs(j)
            var acc = 0.0
            var i = 0
            while (i < a.length) { val d = a(i) - c(i); acc += d * d; i += 1 }
            val d2 = round6(acc)
            if (d2 < bestD) { bestD = d2; bestJ = j } // strict <: ties keep lower j
            j += 1
          }
          (id, bestJ, vec)
        }
      }.toDF("vec_id", "j", "v")
  }

  private[graft] def trainCoarse(s: SparkSession, v: DataFrame, k: Int): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    // the Lloyd loop re-reads `v` once per round plus the init — persist
    // it for the loop's lifetime so the scan+normalize lineage runs once
    // instead of CoarseIters+1 times (VERDICT r21 #5: the embeddings
    // frame rebuilt dozens of times per query is WHY fan-out was toxic
    // here; a persist removes the recompute without adding an exchange).
    // Entirely inside this eager driver loop: persisted before the first
    // job, released in the finally — nothing leaks across queries/runs.
    val vc = v.persist()
    try {
    var cents: Seq[(Int, Seq[Double])] = vc.select($"vec_id", $"v")
      .orderBy($"vec_id").limit(k)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, c), j) => (j, c) }.toSeq
    val dim = cents.head._2.size
    for (_ <- 0 until CoarseIters) {
      val assigned = assignIds(s, vc, cents)
      // re-mean in the EXPLODED (j, dim, micro-int) shape — one generic
      // 3-column aggregate instead of 64 wide decimal-sum columns whose
      // generated code dominated the planner's wall time (measured 29 s
      // → the codegen, not the arithmetic; the shuffle still collapses
      // map-side to k×dim rows per task, so the shape is scale-neutral).
      // The division + final round run as Spark expressions so the
      // rounding semantics are BY CONSTRUCTION the engine's own.
      val moved = assigned
        .select($"j", posexplode(transform($"v", x =>
          round(x * 1e6).cast("long"))).as(Seq("dim", "mi")))
        .groupBy($"j", $"dim")
        .agg(count(lit(1)).as("n"), sum($"mi".cast("decimal(38,0)")).as("s"))
        .select($"j", $"dim",
          round($"s".cast("double") / 1e6 / $"n", 6).as("cd"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents = cents.map { case (j, c) =>
        if (moved.contains((j, 0)))
          (j, (0 until dim).map(i => moved((j, i))): Seq[Double])
        else (j, c)
      }
    }
    cents
    } finally vc.unpersist(blocking = false)
  }

  /** The trained codebook as the (cent_id, cv, cnrm) frame the IVF /
    * SemDeDup consumers take — a driver-local relation, broadcast by
    * every consumer join.
    */
  private[graft] def coarseCentFrame(s: SparkSession, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    s.createDataFrame(cents).toDF("cent_id", "cv")
      .withColumn("cnrm", sqrt(arrayDot(col("cv"), col("cv"))))
  }

  /** Session-memoized fit: every consumer of the same (dir, k) coarse
    * quantizer — IVF search, SemDeDup, the corpus map, the recall
    * scoreboard — pays the 4-round training once per session.
    */
  private def cachedCoarseCents(s: SparkSession, dir: String, k: Int): DataFrame =
    SessionCache.getOrCompute(s, s"sim.coarseCents:$dir:$k") {
      coarseCentFrame(s, trainCoarse(s, vecs(s, dir), k))
    }

  private def l2RoundSql(x: String, y: String): String =
    s"round(list_reduce([($x[i] - $y[i]) * ($x[i] - $y[i]) " +
      s"for i in generate_series(1, len($x))], (a, b) -> a + b), 6)"

  /** DuckDB re-derivation of [[trainCoarse]]: kk defines k, c0 the
    * lowest-vec_id init, then per round r an assignment CTE (a_r), the
    * exact-integer per-dimension re-mean (m_r), and the coalesced
    * codebook (c_r, empty clusters inheriting c_{r-1}); ends in
    * cents(cent_id, cv, cnrm). Assumes vn(vec_id, v, nrm) is defined
    * by the enclosing WITH.
    */
  private def coarseCtesSql(kSql: String): String = {
    // every chained CTE is MATERIALIZED: c_{r-1} is referenced twice per
    // round (assignment + the empty-cluster coalesce), so DuckDB's
    // default CTE inlining would grow the expression tree 2^rounds —
    // measured as a hung oracle once the residual-PQ chain stacked on
    // top of this one
    val rounds = (1 to CoarseIters).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT vec_id, v, j FROM (
         |    SELECT t.vec_id, t.v, c.j,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${l2RoundSql("t.v", "c.c")} ASC, c.j ASC) AS rk
         |    FROM vn t CROSS JOIN c${r - 1} c) z
         |  WHERE rk = 1),
         |m$r AS MATERIALIZED (
         |  SELECT j, d.i AS dim,
         |    round(CAST(sum(CAST(round(v[d.i] * 1000000) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / count(*), 6) AS cd
         |  FROM a$r, (SELECT unnest(generate_series(1, $EmbedDim)) AS i) d
         |  GROUP BY j, d.i),
         |c$r AS MATERIALIZED (
         |  SELECT p.j, coalesce(mm.c, p.c) AS c
         |  FROM c${r - 1} p LEFT JOIN (
         |    SELECT j, list(cd ORDER BY dim) AS c FROM m$r GROUP BY j) mm
         |    USING (j))""".stripMargin
    }.mkString(",\n")
    s"""kk AS MATERIALIZED ($kSql),
       |c0 AS MATERIALIZED (
       |  SELECT CAST(z.rn - 1 AS INT) AS j, z.v AS c
       |  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn
       |        FROM vn) z CROSS JOIN kk
       |  WHERE z.rn <= kk.k),
       |$rounds,
       |cents AS MATERIALIZED (
       |  SELECT j AS cent_id, c AS cv,
       |    sqrt(list_reduce([c[i] * c[i] for i in generate_series(1, len(c))],
       |      (a, b) -> a + b)) AS cnrm
       |  FROM c$CoarseIters)""".stripMargin
  }

  /** DuckDB re-derivation of [[trainCoarseHier]] + [[hierAssignOn]]:
    * kk0 pins the grounded k, the level-1 chain is [[coarseCtesSql]]
    * verbatim at k1 = ⌈√k⌉ (ending in `cents`), basg branch-partitions
    * every vector by the trainer's own argmin-L2, d0 inits each
    * branch's k2 lowest vec_ids, each round r re-derives the
    * branch-local assignment (e_r), the exact-integer re-mean keyed
    * (b, j) (n_r), and the coalesced sub-codebook (d_r); cents2 flattens
    * to cent_id = b·k2 + j and hasg is the two-level CONSUMER
    * assignment (argmax cosine within the branch, the winning ccos
    * kept). Every chained CTE MATERIALIZED (the coarseCtesSql
    * inlining-blowup note). Assumes vn(vec_id, v, nrm) is defined by
    * the enclosing WITH; `kSql` must select the grounded k FROM vn.
    */
  private def hierCtesSql(kSql: String): String = {
    val rounds = (1 to CoarseIters).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT vec_id, v, b, j FROM (
         |    SELECT t.vec_id, t.v, t.b, d.j,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${l2RoundSql("t.v", "d.c")} ASC, d.j ASC) AS rk
         |    FROM basg t JOIN d${r - 1} d ON t.b = d.b) z
         |  WHERE rk = 1),
         |n$r AS MATERIALIZED (
         |  SELECT b, j, dd.i AS dim,
         |    round(CAST(sum(CAST(round(v[dd.i] * 1000000) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / count(*), 6) AS cd
         |  FROM e$r, (SELECT unnest(generate_series(1, $EmbedDim)) AS i) dd
         |  GROUP BY b, j, dd.i),
         |d$r AS MATERIALIZED (
         |  SELECT p.b, p.j, coalesce(mm.c, p.c) AS c
         |  FROM d${r - 1} p LEFT JOIN (
         |    SELECT b, j, list(cd ORDER BY dim) AS c FROM n$r GROUP BY b, j) mm
         |    USING (b, j))""".stripMargin
    }.mkString(",\n")
    s"""kk0 AS MATERIALIZED ($kSql),
       |${coarseCtesSql("SELECT greatest(2, CAST(ceil(sqrt(k)) AS INT)) AS k FROM kk0")},
       |kk2 AS MATERIALIZED (
       |  SELECT greatest(1, CAST(ceil(CAST(kk0.k AS DOUBLE) / kk.k) AS INT)) AS k2
       |  FROM kk0, kk),
       |basg AS MATERIALIZED (
       |  SELECT vec_id, v, nrm, b FROM (
       |    SELECT t.vec_id, t.v, t.nrm, c.cent_id AS b,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY ${l2RoundSql("t.v", "c.cv")} ASC, c.cent_id ASC) AS rk
       |    FROM vn t CROSS JOIN cents c) z
       |  WHERE rk = 1),
       |d0 AS MATERIALIZED (
       |  SELECT z.b, CAST(z.rn - 1 AS INT) AS j, z.v AS c FROM (
       |    SELECT b, v, row_number() OVER (PARTITION BY b ORDER BY vec_id) AS rn
       |    FROM basg) z CROSS JOIN kk2
       |  WHERE z.rn <= kk2.k2),
       |$rounds,
       |cents2 AS MATERIALIZED (
       |  SELECT d.b, CAST(d.b * kk2.k2 + d.j AS INT) AS cent_id, d.c AS cv,
       |    sqrt(list_reduce([d.c[i] * d.c[i] for i in generate_series(1, len(d.c))],
       |      (a, b) -> a + b)) AS cnrm
       |  FROM d$CoarseIters d CROSS JOIN kk2),
       |hasg AS MATERIALIZED (
       |  SELECT vec_id, v, nrm, cent_id, ccos FROM (
       |    SELECT t.vec_id, t.v, t.nrm, c.cent_id,
       |      ${cosESql("t.v", "t.nrm", "c.cv", "c.cnrm")} AS ccos,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY ${cosESql("t.v", "t.nrm", "c.cv", "c.cnrm")} DESC,
       |          c.cent_id ASC) AS rk
       |    FROM basg t JOIN cents2 c ON t.b = c.b) z
       |  WHERE rk = 1)""".stripMargin
  }

  /** The corpus-grounded k as a SQL scalar — [[semDedupK]]'s
    * max(2, ceil(n/target)) re-stated over vn. A `def`: it reads vals
    * declared later in the object, and a val here would initialize
    * before them.
    */
  private def semDedupKSql: String =
    s"SELECT greatest(2, CAST(ceil(count(*) / $SemDedupTargetClusterSize.0) AS INT)) AS k FROM vn"

  /** SemDeDup cosine threshold (the paper sweeps 0.93-0.999 on real
    * near-dup data; 0.4 reaches this corpus's qualifying tail — the
    * q_embed_cosine_dedup precedent).
    */
  val SemDedupTau = 0.4

  /** The SemDeDup cluster-then-prune sweep on any (vec_id, v, nrm)
    * frame with given centroids — factored so the spec can drive
    * planted vectors and prove pair equality with the exact sweep
    * restricted to clusters. Returns one row per vector:
    * (vec_id, cluster_id, kept).
    */
  /** Argmax-cosine cluster assignment (the ivfSearch shape: centroid
    * side broadcast, rounded cosine + cent_id tiebreak) — one source
    * for SemDeDup's partition and the cluster-map report; keeps the
    * winning cosine as `ccos`.
    */
  private def assignToCentroids(v: DataFrame, cents: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id".asc)
    v.crossJoin(broadcast(cents))
      .select($"vec_id", $"v", $"nrm", $"cent_id",
        round(dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("ccos"))
      .withColumn("crk", row_number().over(wAssign))
      .where($"crk" === 1)
      .select($"vec_id", $"v", $"nrm", $"cent_id", $"ccos")
  }

  private[graft] def semDedupOn(s: SparkSession, v: DataFrame,
      cents: DataFrame, tau: Double): DataFrame =
    pruneAssigned(s, assignToCentroids(v, cents)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id")), tau)

  /** The within-cluster prune on any (vec_id, v, nrm, cent_id)
    * assignment: ONE shuffle equi-join on cluster_id — the published
    * pruning. Cluster count grows with the corpus (SemDeDup fits k=50k
    * on LAION), so per-cluster blocks stay bounded and the quadratic
    * never spans the corpus. Keep-min-id exemplar (the q_dedup_exact
    * convention): any vector with a smaller-id near-duplicate in its
    * cluster is pruned; transitive exemplar selection composes with
    * q_dedup_clusters. Shared by the flat-centroid spec path
    * ([[semDedupOn]]) and the registered hierarchical [[semDedup]].
    */
  private def pruneAssigned(s: SparkSession, assign: DataFrame, tau: Double): DataFrame = {
    import s.implicits._
    val a = assign.select($"cent_id", $"vec_id".as("id_x"), $"v".as("vx"), $"nrm".as("nx"))
    val b = assign.select($"cent_id", $"vec_id".as("id_y"), $"v".as("vy"), $"nrm".as("ny"))
    val dups = a.join(b, "cent_id")
      .where($"id_x" < $"id_y")
      .where(round(dot($"vx", $"vy") / ($"nx" * $"ny"), 6) >= tau)
      .select($"id_y").distinct()
    assign.join(dups.withColumnRenamed("id_y", "vec_id"), Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cent_id".as("cluster_id"), lit(true).as("kept"))
      .unionByName(
        dups.select($"id_y".as("vec_id")).join(assign, "vec_id")
          .select($"vec_id", $"cent_id".as("cluster_id"), lit(false).as("kept")))
      .orderBy($"vec_id")
  }

  /** The published contract made executable: SemDeDup's k scales with
    * the corpus so per-cluster blocks stay bounded (Abbas et al. fit
    * k=50k on LAION — about one cluster per few thousand items). The
    * grounding rule is a target MEAN cluster size: k = ceil(n/target),
    * which bounds expected within-cluster pair volume at
    * ~n·(target−1)/2 — linear in the corpus. [[semDedupPlan]] measures
    * the actual volumes around this k.
    */
  val SemDedupTargetClusterSize = 64

  private[graft] def semDedupK(n: Long): Int =
    math.max(2, math.ceil(n.toDouble / SemDedupTargetClusterSize).toInt)

  /** Level split of the corpus-grounded k: k1 = ⌈√k⌉ branch centroids,
    * k2 = ⌈k/k1⌉ sub-centroids per branch. ROUND-18 SCALE FIX (§8j):
    * single-level Lloyd with k ∝ n costs n·k = O(n²/target) per round
    * — the 30× deep-ladder point measured q_semdedup at 9.2× for 3×
    * data — so the k-∝-n consumers (SemDeDup, the corpus map, the k
    * planner) train a TWO-LEVEL quantizer instead: Lloyd at k1 over
    * the corpus, branch-partition, then branch-local Lloyd at k2 —
    * every stage is n·(k1 + k2) = O(n·√k) = O(n^1.5/√target), the
    * hierarchical-k-means shape every production IVF trainer uses.
    * Consumers assign level-1 by the trainer's own argmin-L2 (so the
    * consumed partition IS the trained one) and level-2 by the
    * established argmax-cosine consumer convention (ties to the lower
    * id at both levels); flat cluster id = b·k2 + j. The fixed-k
    * consumers (IVF k=16, PQ nlist) keep the single-level trainer.
    */
  private[graft] def hierDims(k: Int): (Int, Int) = {
    val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    (k1, math.max(1, math.ceil(k.toDouble / k1).toInt))
  }

  /** Branch-local argmin-L2² assignment against a per-branch broadcast
    * sub-codebook (the [[assignIds]] primitive-loop discipline, keyed
    * by the row's branch): round6 distances, strict < keeps the lower
    * j on ties — the oracle's row_number ordering exactly.
    */
  private def assignSubIds(s: SparkSession, vb: DataFrame,
      subs: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    val byBranch: Map[Int, Array[Array[Double]]] = subs.groupBy(_._1)
      .map { case (b, cs) => b -> cs.sortBy(_._2).map(_._3.toArray).toArray }
    val bc = s.sparkContext.broadcast(byBranch)
    vb.select($"vec_id", $"b", $"v").as[(Long, Int, Seq[Double])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, b, vec) =>
          val a = vec.toArray
          val cs = m(b)
          var bestJ = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < cs.length) {
            val c = cs(j)
            var acc = 0.0
            var i = 0
            while (i < a.length) { val d = a(i) - c(i); acc += d * d; i += 1 }
            val d2 = round6(acc)
            if (d2 < bestD) { bestD = d2; bestJ = j }
            j += 1
          }
          (id, b, bestJ, vec)
        }
      }.toDF("vec_id", "b", "j", "v")
  }

  /** The two-level fit: [[trainCoarse]] at k1, branch-partition by its
    * own argmin assignment, then [[CoarseIters]] branch-local Lloyd
    * rounds at k2 per branch — init the k2 lowest vec_ids WITHIN the
    * branch, re-means as exact micro-unit integer sums keyed (b, j),
    * empty sub-clusters keep their previous centroid (the
    * [[trainCoarse]] discipline verbatim, so the DuckDB unroll mirrors
    * round for round). Driver state per round is the ≈k×d codebook.
    */
  private[graft] def trainCoarseHier(s: SparkSession, v: DataFrame, k: Int)
      : (Seq[(Int, Seq[Double])], Seq[(Int, Int, Seq[Double])]) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (k1, k2) = hierDims(k)
    val cents1 = trainCoarse(s, v, k1)
    // branch frame persisted for the level-2 loop's lifetime (the
    // trainCoarse discipline): init + every branch-local Lloyd round
    // re-derived the level-1 assignment otherwise
    val vb = assignIds(s, v, cents1).select($"vec_id", $"j".as("b"), $"v")
      .persist()
    try {
    val dim = cents1.head._2.size
    var subs: Seq[(Int, Int, Seq[Double])] = vb
      .withColumn("rn", row_number().over(Window.partitionBy($"b").orderBy($"vec_id")))
      .where($"rn" <= k2)
      .select($"b", ($"rn" - 1).cast("int").as("j"), $"v")
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
    for (_ <- 0 until CoarseIters) {
      val moved = assignSubIds(s, vb, subs)
        .select($"b", $"j", posexplode(transform($"v", x =>
          round(x * 1e6).cast("long"))).as(Seq("dim", "mi")))
        .groupBy($"b", $"j", $"dim")
        .agg(count(lit(1)).as("n"), sum($"mi".cast("decimal(38,0)")).as("s"))
        .select($"b", $"j", $"dim",
          round($"s".cast("double") / 1e6 / $"n", 6).as("cd"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      subs = subs.map { case (b, j, c) =>
        if (moved.contains((b, j, 0)))
          (b, j, (0 until dim).map(i => moved((b, j, i))): Seq[Double])
        else (b, j, c)
      }
    }
    (cents1, subs)
    } finally vb.unpersist(blocking = false)
  }

  /** Session-memoized two-level CONSUMER assignment at the grounded k:
    * (vec_id, v, nrm, cent_id, ccos) with cent_id = b·k2 + j and ccos
    * the winning level-2 cosine. Level 1 re-runs the trainer's own
    * argmin-L2 branch pick (zero shuffle, broadcast codebook); level 2
    * is one broadcast equi-join ON THE BRANCH KEY — n·k2 rows, not
    * n·k — then the argmax-cosine window. Shared by q_semdedup and
    * q_embed_clusters, so a session pays fit + assignment once.
    */
  private def cachedHierAssign(s: SparkSession, dir: String, k: Int): DataFrame =
    SessionCache.getOrCompute(s, s"sim.hierAssign:$dir:$k") {
      hierAssignOn(s, vecs(s, dir), k)
    }

  private[graft] def hierAssignOn(s: SparkSession, v: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (_, k2) = hierDims(k)
    val (cents1, subs) = trainCoarseHier(s, v, k)
    val cents2 = s.createDataFrame(
        subs.map { case (b, j, c) => (b, b * k2 + j, c) })
      .toDF("b", "cent_id", "cv")
      .withColumn("cnrm", sqrt(arrayDot(col("cv"), col("cv"))))
    val vb = assignIds(s, v, cents1)
      .select($"vec_id", $"j".as("b"), $"v",
        sqrt(arrayDot($"v", $"v")).as("nrm"))
    val w = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id".asc)
    vb.join(broadcast(cents2), "b")
      .select($"vec_id", $"v", $"nrm", $"cent_id",
        round(dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("ccos"))
      .withColumn("crk", row_number().over(w))
      .where($"crk" === 1)
      .select($"vec_id", $"v", $"nrm", $"cent_id", $"ccos")
  }

  /** Embedding-space CORPUS MAP — the cluster-level cartography report
    * an embedding store publishes (and the reporting face of the same
    * partition SemDeDup prunes with — the k-means fit is shared
    * through SessionCache, so a session pays it once): per cluster,
    * its size, COHESION (mean cosine of members to their centroid —
    * low-cohesion clusters are the mixed/noisy regions worth manual
    * review), and the modal label with its count (how well the
    * embedding geometry recovers the labeling). Scale shape: TWO-LEVEL
    * assignment against broadcast codebooks ([[hierDims]] — n·(k1+k2)
    * dots, not n·k), one cluster-keyed hash agg; the cohesion fold
    * orders by vec_id and each cluster is bounded at
    * ~[[SemDedupTargetClusterSize]] members BY CONSTRUCTION of the
    * grounded k, so no fold buffers more than the target size.
    * HASH-CHECKED since the quantizer went deterministic
    * ([[embedClustersSql]]); SimilaritySpec pins invariants +
    * determinism.
    */
  def embedClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.FloatFold.orderedSum
    val v = vecs(s, dir)
    val k = semDedupK(v.count())
    val labels = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val assign = cachedHierAssign(s, dir, k)
      .select($"vec_id", $"cent_id", $"ccos")
      .join(labels, "vec_id")
    val labelCounts = assign.groupBy($"cent_id", $"label")
      .agg(count(lit(1)).as("ln"))
      .groupBy($"cent_id")
      // modal label, smaller label on ties (struct-MIN on (-count,
      // label), no window). Only the count is negated — it is always a
      // long; negating the LABEL would pin its dtype numeric, and a
      // regenerated corpus with string labels would fail analysis (the
      // r13 schema-drift precedent) instead of degrading gracefully
      .agg(min(struct((-$"ln").as("nln"), $"label")).as("m"))
      .select($"cent_id", $"m.label".as("top_label"), (-$"m.nln").as("top_label_n"))
    assign.groupBy($"cent_id")
      .agg(count(lit(1)).as("n_vecs"),
        round(orderedSum($"vec_id", $"ccos") / count(lit(1)), 6).as("cohesion"))
      .join(labelCounts, "cent_id")
      .select($"cent_id".as("cluster_id"), $"n_vecs", $"cohesion",
        $"top_label", $"top_label_n")
      .orderBy($"cluster_id")
  }

  /** ORACLE for the corpus map: two-level trained chain + consumer
    * assignment ([[hierCtesSql]]'s hasg, which keeps the winning ccos),
    * cohesion as the vec_id-ordered fold, modal label via the same
    * (count desc, label asc) ordering.
    */
  def embedClustersSql: String =
    s"""WITH vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |vn AS MATERIALIZED (
       |  SELECT vec_id, v, sqrt(${dotESql("v", "v")}) AS nrm FROM vv),
       |${hierCtesSql(semDedupKSql)},
       |asg AS (SELECT vec_id, cent_id, ccos FROM hasg),
       |coh AS (
       |  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vecs,
       |    round(${graft.functions.FloatFold.orderedSumSql("ccos", "vec_id")}
       |      / count(*), 6) AS cohesion
       |  FROM asg GROUP BY cent_id),
       |lab AS (
       |  SELECT a.cent_id, e.label, count(*) AS ln
       |  FROM asg a JOIN embeddings e USING (vec_id)
       |  GROUP BY a.cent_id, e.label),
       |top AS (
       |  SELECT cent_id, label AS top_label, CAST(ln AS BIGINT) AS top_label_n
       |  FROM (
       |    SELECT cent_id, label, ln,
       |      row_number() OVER (PARTITION BY cent_id
       |        ORDER BY ln DESC, label ASC) AS rk
       |    FROM lab) z
       |  WHERE rk = 1)
       |SELECT c.cent_id AS cluster_id, c.n_vecs, c.cohesion,
       |  t.top_label, t.top_label_n
       |FROM coh c JOIN top t USING (cent_id)
       |ORDER BY cluster_id""".stripMargin

  /** Seeded MLlib k-means fit at a given k, returned as the (cent_id,
    * cv, cnrm) frame [[semDedupOn]] consumes — since round 15 the
    * registered queries train through [[trainCoarse]] (hash-checkable);
    * this twin remains as SimilaritySpec's quality cross-check.
    */
  private def fitCentroids(s: SparkSession, v: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans().setK(k).setSeed(26062019L).setMaxIter(10)
      .setFeaturesCol("fv")
      .fit(v.select(array_to_vector($"v").as("fv")))
    s.createDataFrame(
        model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cent_id", "cv")
      .select($"cent_id", transform($"cv", _.cast("double")).as("cv"))
      .withColumn("cnrm", sqrt(arrayDot($"cv", $"cv")))
  }

  /** SemDeDup (Abbas et al. 2023) — SEMANTIC dedup by cluster-then-
    * prune, the embedding-space analogue of MinHash near-dup: a seeded
    * k-means partitions the space, candidate pairs are enumerated only
    * WITHIN a cluster, and exact cosine >= [[SemDedupTau]] prunes all
    * but the smallest-id member of each duplicate pair. Unlike the
    * guarded O(n²) q_embed_cosine_dedup sweep this is the corpus-scale
    * semantic-dedup shape: the TWO-LEVEL k-means fit and assignment are
    * O(n·√k) ([[hierDims]] — round 18; single-level Lloyd at k ∝ n was
    * n²/target per round, deep-ladder-measured), the pair join is
    * an equi-join on cluster_id, and k is GROUNDED in the corpus
    * ([[semDedupK]]: one cluster per [[SemDedupTargetClusterSize]]
    * items) so per-cluster work stays constant as the corpus grows.
    * HASH-CHECKED since the quantizer went deterministic
    * ([[semDedupSql]] re-derives fit + assignment + prune in DuckDB);
    * SimilaritySpec additionally proves pair equality with the exact
    * sweep restricted to co-clustered pairs and that a planted
    * duplicate is pruned.
    */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir)
    val k = semDedupK(v.count())
    pruneAssigned(s,
      cachedHierAssign(s, dir, k).select($"vec_id", $"v", $"nrm", $"cent_id"),
      SemDedupTau)
  }

  /** ORACLE for SemDeDup: the two-level trained chain (k re-derived
    * from the corpus, [[hierCtesSql]]), its consumer assignment (hasg),
    * within-cluster pair prune at τ, keep-min-id — the
    * [[pruneAssigned]] algebra verbatim.
    */
  def semDedupSql: String =
    s"""WITH vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |vn AS MATERIALIZED (
       |  SELECT vec_id, v, sqrt(${dotESql("v", "v")}) AS nrm FROM vv),
       |${hierCtesSql(semDedupKSql)},
       |dups AS (
       |  SELECT DISTINCT b.vec_id AS vid
       |  FROM hasg a JOIN hasg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  WHERE ${cosESql("a.v", "a.nrm", "b.v", "b.nrm")} >= $SemDedupTau)
       |SELECT t.vec_id, t.cent_id AS cluster_id, (d.vid IS NULL) AS kept
       |FROM hasg t LEFT JOIN dups d ON t.vec_id = d.vid
       |ORDER BY t.vec_id""".stripMargin

  /** The SemDeDup k planner — the q_lsh_plan template applied to
    * cluster-then-prune: for candidate k around the grounded choice
    * (a quarter of it up to four times it), the MEASURED quadratic exposure next to the linear
    * assignment cost. `candidate_pairs` = Σ n_c·(n_c−1)/2 over the
    * actual seeded-k-means cluster sizes — the exact number of cosine
    * evaluations the prune stage will pay; `assign_dots` = n·k, the
    * price of buying smaller clusters. The `chosen` row marks
    * [[semDedupK]]'s pick. Driver-side work is one bounded row per
    * candidate; each two-level fit is O(n·√k). HASH-CHECKED since the
    * quantizer went deterministic; SimilaritySpec asserts the
    * candidate-pair bound shrinks as k grows.
    */
  def semDedupPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir).persist()
    val n = v.count()
    val kStar = semDedupK(n)
    val candidates =
      Seq(kStar / 4, kStar / 2, kStar, kStar * 2, kStar * 4)
        .map(math.max(2, _)).distinct
    // each exploratory fit is the same deterministic two-level trainer
    // the production queries use (the planner must measure the
    // quantizer actually deployed, and the fits stay the bounded
    // 2×4-round budget); cluster sizes come from the same two-level
    // consumer assignment per k. The five fits are INDEPENDENT chains
    // of small driver-coordinated Lloyd rounds (~80 tiny jobs run
    // back-to-back), so they submit from concurrent driver threads —
    // Spark schedules jobs from multiple threads freely, each fit's
    // own rounds stay sequential, and determinism is untouched
    // (measured 12.0 → ~4 s on the sf0.1 board)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    // a DEDICATED fixed pool, not the shared global EC: the fit bodies
    // block on Spark collects, which on the global pool could starve
    // unrelated users; and the Await is finite so a hung fit surfaces
    // as a timeout naming this planner instead of blocking forever
    // (ADVICE r18)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(candidates.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val perK =
      try {
        candidates.map { k =>
          Future {
            val (k1, k2) = hierDims(k)
            hierAssignOn(s, v, k).select($"cent_id")
              .groupBy($"cent_id").agg(count(lit(1)).as("c"))
              .agg(
                lit(k).as("k"),
                count(lit(1)).cast("int").as("clusters_used"),
                max($"c").as("max_cluster"),
                sum(($"c" * ($"c" - 1)) / 2).cast("long").as("candidate_pairs"),
                lit(k1 + k2).as("dots_per_vec"))
          }
        }.map(Await.result(_, 30.minutes)).reduce(_.unionByName(_))
      } finally pool.shutdown()
    // assign_dots = n·(k1+k2), the two-level assignment's price of
    // buying smaller clusters — O(n·√k), no longer the single-level n·k
    val out = perK.select($"k", lit(n).as("n_vecs"), $"clusters_used",
        $"max_cluster", $"candidate_pairs",
        round($"candidate_pairs".cast("double") / n, 2).as("pairs_per_vec"),
        (lit(n) * $"dots_per_vec").as("assign_dots"),
        ($"k" === kStar).as("chosen"))
      .orderBy($"k")
    v.unpersist(blocking = false)
    out
  }

  /** ORACLE for the k planner — five instantiations of the unrolled
    * TWO-LEVEL training chain (one per candidate k, each its own
    * nested WITH scope), the two-level consumer assignment (hasg),
    * cluster-size aggregation, and the planner row (assign_dots =
    * n·(k1+k2), the hierarchical assignment's price); candidate k
    * values that coincide at small corpora produce identical rows that
    * plain UNION collapses, mirroring the engine's `.distinct` on the
    * candidate list.
    */
  def semDedupPlanSql: String = {
    val kStar =
      s"greatest(2, CAST(ceil(count(*) / $SemDedupTargetClusterSize.0) AS INT))"
    def inst(kOfStar: String => String): String = {
      val kSel = s"SELECT ${kOfStar(kStar)} AS k FROM vn"
      s"""(WITH vv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
         |vn AS MATERIALIZED (
         |  SELECT vec_id, v, sqrt(${dotESql("v", "v")}) AS nrm FROM vv),
         |${hierCtesSql(kSel)},
         |sizes AS (SELECT cent_id, count(*) AS c FROM hasg GROUP BY cent_id),
         |nn AS (SELECT count(*) AS n FROM vn),
         |ks AS (SELECT $kStar AS kstar FROM vn)
         |SELECT CAST(kk0.k AS INT) AS k, CAST(nn.n AS BIGINT) AS n_vecs,
         |  CAST(count(*) AS INT) AS clusters_used,
         |  CAST(max(s.c) AS BIGINT) AS max_cluster,
         |  CAST(sum((s.c * (s.c - 1)) // 2) AS BIGINT) AS candidate_pairs,
         |  round(CAST(sum((s.c * (s.c - 1)) // 2) AS DOUBLE) / nn.n, 2)
         |    AS pairs_per_vec,
         |  CAST(nn.n * (kk.k + kk2.k2) AS BIGINT) AS assign_dots,
         |  (kk0.k = ks.kstar) AS chosen
         |FROM sizes s CROSS JOIN kk0 CROSS JOIN kk CROSS JOIN kk2
         |  CROSS JOIN nn CROSS JOIN ks
         |GROUP BY kk0.k, kk.k, kk2.k2, nn.n, ks.kstar)""".stripMargin
    }
    // each WITH-scoped instantiation wraps as a derived table: DuckDB
    // 1.0's binder rejects a bare parenthesized WITH node inside a set
    // operation (INTERNAL "query node type mismatch")
    Seq[String => String](
      ks => s"greatest(2, $ks // 4)",
      ks => s"greatest(2, $ks // 2)",
      ks => ks,
      ks => s"$ks * 2",
      ks => s"$ks * 4")
      .map(inst).zipWithIndex
      .map { case (sql, i) => s"SELECT * FROM (\n$sql\n) inst$i" }
      .mkString("", "\nUNION\n", "\nORDER BY k")
  }

  /** Embedding-store hygiene: per-vector L2 norm with a corpus z-score
    * and a 3σ outlier flag — degenerate norms (zeros, near-zeros,
    * blow-ups) are embedding-pipeline failures that poison every
    * cosine downstream (a zero vector makes cosine NaN; an unnormalized
    * batch skews IVF centroids), so a store audits norms BEFORE
    * building indexes. Float discipline: the norm² is the row-local
    * codegen'd ArrayDot fold (bit-identical to the oracle's
    * list_reduce), pre-rounded to integer micro-units; the corpus
    * moments are exact decimal sums and the flag is the
    * q_events_anomaly multiplied-through integer predicate — no float
    * boundary anywhere in the gate. One scan, one single-row moments
    * aggregate, broadcast back. Output is per-vector (norm, z, flag) —
    * at 100 TB the same plan with `.where($"is_outlier")` ships only
    * the quarantine list.
    */
  def embedNormOutliers(s: SparkSession, dir: String): DataFrame =
    embedNormOutliersOf(Tables.embeddings(s, dir))

  /** The audit on ANY (vec_id, embedding) frame — factored so specs can
    * plant degenerate vectors (the driver's store is unit-normalized,
    * so the real corpus exercises only the zero-variance branch).
    */
  private[graft] def embedNormOutliersOf(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val dec = "decimal(38,0)"
    val base = emb
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))
      .select($"vec_id", $"nrm",
        round($"nrm" * 1000000).cast("long").cast(dec).as("ni"))
    val stats = base.agg(count(lit(1)).cast(dec).as("n"),
      sum($"ni").as("sv"), sum($"ni" * $"ni").as("svv"))
    val dev = $"n" * $"ni" - $"sv"
    val varn = $"n" * $"svv" - $"sv" * $"sv"
    base.crossJoin(broadcast(stats))
      .select($"vec_id", round($"nrm", 6).as("norm"),
        // a constant-norm store (e.g. already unit-normalized) has zero
        // variance: z is undefined (NULL), nothing flags
        when(varn > 0,
          round(dev.cast("double") / sqrt(varn.cast("double")), 6)).as("z"),
        (dev * dev > lit(9) * varn).as("is_outlier"))
      .orderBy($"vec_id")
  }

  val embedNormOutliersSql: String =
    s"""WITH base AS (
       |  SELECT vec_id, ${normSql("t")} AS nrm
       |  FROM (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
       |        FROM embeddings) t),
       |ints AS (
       |  SELECT vec_id, nrm,
       |    CAST(CAST(round(nrm * 1000000) AS BIGINT) AS HUGEINT) AS ni
       |  FROM base),
       |stats AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(ni) AS sv,
       |    sum(ni * ni) AS svv
       |  FROM ints)
       |SELECT i.vec_id, round(i.nrm, 6) AS norm,
       |  CASE WHEN s.n * s.svv - s.sv * s.sv > 0 THEN
       |    round(CAST(s.n * i.ni - s.sv AS DOUBLE)
       |      / sqrt(CAST(s.n * s.svv - s.sv * s.sv AS DOUBLE)), 6) END AS z,
       |  (s.n * i.ni - s.sv) * (s.n * i.ni - s.sv)
       |    > 9 * (s.n * s.svv - s.sv * s.sv) AS is_outlier
       |FROM ints i CROSS JOIN stats s
       |ORDER BY i.vec_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_embed_cosine_dedup", cosineDedupBlocked, Some(cosineDedupSql)),
    GraftQuery("q_lsh_route_recall", lshRouteRecall, Some(lshRouteRecallSql)),
    GraftQuery("q_embed_cosine_dedup_lsh", cosineDedupLshTop, Some(cosineDedupLshSql)),
    GraftQuery("q_ann_cosine_topk", annCosineTopK, Some(annCosineTopKSql)),
    GraftQuery("q_ann_lsh", annLsh, Some(annLshSql), singleShot = true),
    GraftQuery("q_ann_ivf", annIvf, Some(annIvfSql)),
    GraftQuery("q_ann_ivf_kmeans", annIvfKmeans, Some(annIvfKmeansSql),
      singleShot = true),
    GraftQuery("q_ann_pq", annPq, Some(annPqSql)),
    GraftQuery("q_ann_ivf_pq", annIvfPq, Some(annIvfPqSql), singleShot = true),
    GraftQuery("q_embed_label_knn", labelKnn, Some(labelKnnSql)),
    GraftQuery("q_semdedup", semDedup, Some(semDedupSql), singleShot = true),
    GraftQuery("q_semdedup_plan", semDedupPlan, Some(semDedupPlanSql),
      singleShot = true),
    GraftQuery("q_ann_recall", annRecall, Some(annRecallSql), singleShot = true),
    GraftQuery("q_ann_recall_trained", annRecallTrained, Some(annRecallTrainedSql),
      singleShot = true),
    GraftQuery("q_embed_norm_outliers", embedNormOutliers, Some(embedNormOutliersSql)),
    GraftQuery("q_embed_clusters", embedClusters, Some(embedClustersSql),
      singleShot = true))
}
