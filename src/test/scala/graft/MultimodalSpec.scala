package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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

  test("corrupt body behind valid PNG magic keeps the row, not the task") {
    import spark.implicits._
    val good = Multimodal.plantedPng(9, 5)
    // valid 4-byte magic, truncated/garbage body — the corpus-scale norm
    val truncated = good.take(20)
    val garbageBody = good.take(4) ++ Array.fill[Byte](64)(0x5a)
    val payloads = Seq(1L -> good, 2L -> truncated, 3L -> garbageBody).toDS()
    val out = Multimodal.decodeImages(payloads).collect()
      .map(d => d.doc_id -> d).toMap
    assert(out.size == 3, "a corrupt payload must not kill the task")
    assert(out(1L).mime == "image/png" && out(1L).width == 9)
    Seq(2L, 3L).foreach { id =>
      val d = out(id)
      assert(d.mime == "application/octet-stream" && d.width == -1 &&
        d.height == -1 && d.features.isEmpty, s"doc $id should fall back")
    }
  }

  test("real resize: decode, bilinear downscale, PNG re-encode") {
    import spark.implicits._
    val png = Multimodal.plantedPng(64, 48)
    val payloads = Seq(
      1L -> png,
      2L -> "not an image".getBytes("UTF-8"),
      3L -> png.take(16)).toDS() // corrupt body behind valid magic
    val out = Multimodal.resizeImages(payloads, maxDim = 16).collect()
      .map(d => d.doc_id -> d).toMap
    val t = out(1L)
    // aspect-preserving fit: 64x48 -> 16x12
    assert(t.mime == "image/png" && t.width == 64 && t.height == 48)
    assert(t.thumb_width == 16 && t.thumb_height == 12)
    assert(t.thumb_bytes > 0 && t.thumb_png.length == t.thumb_bytes)
    // the re-encoded thumbnail is itself a valid PNG with those dims,
    // and its channel means match what the operator reported
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(t.thumb_png))
    assert(round.getWidth == 16 && round.getHeight == 12)
    var (r, g, b) = (0L, 0L, 0L)
    for (y <- 0 until 12; x <- 0 until 16) {
      val px = round.getRGB(x, y)
      r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
    }
    val n = (16L * 12 * 255).toDouble
    assert(math.abs(t.features(0) - r / n) < 1e-12)
    assert(math.abs(t.features(1) - g / n) < 1e-12)
    assert(math.abs(t.features(2) - b / n) < 1e-12)
    // bilinear downscale of the planted gradient preserves channel means
    // to first order: compare against the full-size gradient means
    val exR = (0 until 64).map(x => x * 255 / 63).sum / 64.0 / 255.0
    val exG = (0 until 48).map(y => y * 255 / 47).sum / 48.0 / 255.0
    assert(math.abs(t.features(0) - exR) < 0.05, s"r=${t.features(0)} vs $exR")
    assert(math.abs(t.features(1) - exG) < 0.05, s"g=${t.features(1)} vs $exG")
    assert(math.abs(t.features(2) - 0x40 / 255.0) < 0.02)
    // never upscaled: a small image passes through at its own size
    assert(out(2L).mime == "application/octet-stream")
    assert(out(3L).mime == "application/octet-stream" &&
      out(3L).thumb_png.isEmpty)
  }

  test("resize never upscales below maxDim") {
    import spark.implicits._
    val small = Multimodal.plantedPng(5, 3)
    val out = Multimodal.resizeImages(Seq(1L -> small).toDS(), maxDim = 16)
      .collect().head
    assert(out.thumb_width == 5 && out.thumb_height == 3)
  }

  test("dHash pairs re-encodes and brightness shifts that md5 cannot") {
    import spark.implicits._
    // 1+2: same noise image, one brightness-shifted (+8, clamp-free) —
    // different BYTES, same perceptual content. 3: unrelated noise.
    // 4: corrupt payload.
    val p1 = Multimodal.plantedNoisePng(42L, 64, 48)
    val p2 = Multimodal.plantedNoisePng(42L, 64, 48, brightness = 8)
    val p3 = Multimodal.plantedNoisePng(7L, 64, 48)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    assert(!java.util.Arrays.equals(p1, p2), "payload bytes must differ")
    val payloads = Seq((1L, p1), (2L, p2), (3L, p3), (4L, corrupt))
      .toDS().repartition(2)
    val hashes = Multimodal.hashImages(payloads).cache()
    val byId = hashes.collect().map(h => h.doc_id -> h).toMap
    // uniform luminance shift preserves every left<right comparison
    assert(byId(1L).dhash == byId(2L).dhash)
    assert(byId(1L).dhash != byId(3L).dhash)
    assert(byId(4L).mime == "application/octet-stream")
    val pairs = Multimodal.imageDedupPairs(hashes)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
    hashes.unpersist()
  }

  test("chunk-bucketed image pairs equal brute-force hamming filtering") {
    import spark.implicits._
    // 20 noise images, 5 duplicated seeds -> planted identical pairs
    val payloads = (0 until 20).map { i =>
      (i.toLong, Multimodal.plantedNoisePng((i % 15).toLong, 32, 32))
    }.toDS().repartition(3)
    val hashes = Multimodal.hashImages(payloads).cache()
    val brute = hashes.as("a").join(hashes.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        call_function("bit_count",
          $"a.dhash".bitwiseXOR($"b.dhash")).as("hamming"))
      .where($"hamming" <= 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val chunked = Multimodal.imageDedupPairs(hashes)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(chunked == brute)
    assert(chunked.nonEmpty)
    hashes.unpersist()
  }

  test("JPEG payloads decode, resize, and hash through the same codec boundary") {
    import spark.implicits._
    val png = Multimodal.plantedPng(40, 30)
    val jpeg = Multimodal.reencodeJpeg(png)
    // JFIF magic present, PNG magic absent
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val out = Multimodal.decodeImages(Seq(1L -> jpeg).toDS()).collect().head
    assert(out.mime == "image/jpeg" && out.width == 40 && out.height == 30)
    // lossy compression moves channel means only marginally on a gradient
    val ref = Multimodal.decodeImages(Seq(1L -> png).toDS()).collect().head
    (0 until 3).foreach { c =>
      assert(math.abs(out.features(c) - ref.features(c)) < 0.02,
        s"channel $c: jpeg=${out.features(c)} png=${ref.features(c)}")
    }
    val rz = Multimodal.resizeImages(Seq(1L -> jpeg).toDS(), maxDim = 10)
      .collect().head
    assert(rz.mime == "image/jpeg" && rz.thumb_width == 10 && rz.thumb_height == 8)
    // the thumbnail store format stays PNG regardless of source format
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rz.thumb_png))
    assert(round.getWidth == 10 && round.getHeight == 8)
  }

  test("dHash pairs a JPEG re-encode of a PNG across formats; corrupt JPEG costs one row") {
    import spark.implicits._
    val p1 = Multimodal.plantedPng(64, 48)
    val p2 = Multimodal.reencodeJpeg(p1) // the SAME image, lossy family
    val p3 = Multimodal.plantedNoisePng(7L, 64, 48) // unrelated
    // valid JPEG magic (FF D8 FF), garbage body — must cost one
    // octet-stream row, never the task
    val corruptJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](32)(0x2a)
    val payloads = Seq((1L, p1), (2L, p2), (3L, p3), (4L, corruptJpeg))
      .toDS().repartition(2)
    val hashes = Multimodal.hashImages(payloads).cache()
    val byId = hashes.collect().map(h => h.doc_id -> h).toMap
    assert(byId(1L).mime == "image/png" && byId(2L).mime == "image/jpeg")
    assert(byId(4L).mime == "application/octet-stream")
    // the headline claim: re-encode ACROSS formats lands within the
    // near-dup radius — byte hashing can never pair these payloads
    val pairs = Multimodal.imageDedupPairs(hashes)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 3),
      s"png/jpeg twin must pair, got ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "unrelated image paired")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L), "corrupt row paired")
    hashes.unpersist()
  }

  test("registered image dedup returns exactly the mask-collision graph") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Multimodal.imageDedup(spark, dir)
      .as[(Long, Long, Int)].collect()
    val ids = Tables.documents(spark, dir)
      .select($"doc_id").as[Long].collect().sorted
    val want = (for {
      a <- ids; b <- ids if a < b && a % 256 == b % 256
    } yield (a, b)).toSet
    assert(got.map(r => (r._1, r._2)).toSet == want)
    // brightness variants are byte-different but perceptually identical
    assert(got.forall(_._3 == 0), "same-mask variants must sit at hamming 0")
    val aPair = got.head
    val bytesA = Multimodal.plantedStripePng(aPair._1)
    val bytesB = Multimodal.plantedStripePng(aPair._2)
    assert(!java.util.Arrays.equals(bytesA, bytesB),
      "paired payloads must differ at the byte level (dedup is perceptual)")
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
