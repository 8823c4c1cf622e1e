package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.F): treat media as opaque
  * `binary` payloads with typed metadata, and push them through a
  * decode → feature-extract pipeline.
  *
  * The container has no external image/audio codec libs, so the
  * CORPUS-FACING decode step is a DETERMINISTIC STUB (md5-derived
  * pseudo-features — the documents table holds text, not media bytes).
  * Everything around it — the binary column, metadata struct, per-batch
  * feature extraction shape, partitioning — is the real Spark plumbing
  * a production decode UDF drops into, and [[decodeImages]] PROVES the
  * boundary with a real codec: the JDK's javax.imageio PNG reader
  * decoding planted valid payloads ([[plantedPng]]) inside the same
  * mapPartitions iterator (MultimodalSpec asserts real decoded
  * dimensions and channel means).
  */
object Multimodal {

  /** Stub feature extractor: 4 doubles in [0,1) from payload hash chunks.
    * Replace with a real decoder (e.g. a mapInArrow/Pandas-UDF batch
    * decode on a cluster with codecs) — the schema contract stays.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // not fanned out: the per-row kernel (UTF-8 encode + md5) is a few
    // µs — far below the cost of shuffling the payload bytes (guide
    // §2.3: spreading light work isn't worth moving the rows)
    val payload = Tables.documents(s, dir)
      // binary payload column: the corpus stand-in for image/audio bytes
      .select($"doc_id", $"source", encode($"text", "UTF-8").as("payload"))
    val h = md5($"payload")
    // build the typed metadata struct + feature vector, then flatten to
    // scalar columns for the verify dump (the driver's comparison layer
    // sorts columns, so structs/arrays must not reach the output schema)
    payload.select(
        $"doc_id", $"source",
        length($"payload").as("n_bytes"),
        h.as("content_md5"),
        struct(
          lit("text/plain").as("mime"),
          length($"payload").as("size"),
          $"source".as("origin")).as("meta"),
        array((0 until 4).map { k =>
          (conv(substring(h, k * 8 + 1, 7), 16, 10).cast("long").cast("double") /
            268435456.0) // 16^7
        }: _*).as("features"))
      .select($"doc_id", $"source", $"n_bytes", $"content_md5",
        $"meta.mime".as("meta_mime"), $"meta.size".as("meta_size"),
        $"meta.origin".as("meta_origin"),
        $"features" (0).as("f0"), $"features" (1).as("f1"),
        $"features" (2).as("f2"), $"features" (3).as("f3"))
      .orderBy($"doc_id")
  }

  /** Flattened output is plain scalars, so the stub pipeline is fully
    * oracle-checkable: md5 hex chunks → longs → [0,1) doubles, identical
    * IEEE ops in both engines.
    */
  val multimodalMetaSql: String = {
    val fs = (0 until 4).map { k =>
      s"('0x' || substr(md5(text), ${k * 8 + 1}, 7))::BIGINT / 268435456.0 AS f$k"
    }.mkString(",\n  ")
    s"""SELECT doc_id, source,
       |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |  md5(text) AS content_md5,
       |  'text/plain' AS meta_mime,
       |  CAST(octet_length(encode(text)) AS INT) AS meta_size,
       |  source AS meta_origin,
       |  $fs
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** One decoded media record — the schema contract a real batch decoder
    * fills (features would be the embedder's output dimension).
    */
  case class Decoded(doc_id: Long, mime: String, n_bytes: Int,
      features: Array[Double])

  /** The batch-decode boundary itself: payloads cross into an opaque
    * per-partition decoder through `mapPartitions`, the same shape a
    * Pandas-UDF `mapInPandas` / `mapInArrow` decode has on a Python
    * cluster — rows arrive as an iterator per partition, the codec is
    * initialized ONCE per partition (the expensive part a per-row UDF
    * would pay per record), and batches stream through without
    * materializing the partition. The codec here is the deterministic
    * md5 stub (no image/audio libs in this container); swap
    * `decodeOne` for a real decoder and nothing else changes.
    */
  /** The per-record stub codec — THE extension point: replace this with
    * a real decoder/embedder and the surrounding plumbing is unchanged.
    * `codec` is whatever the per-partition init produced.
    */
  private def decodeOne(codec: java.security.MessageDigest,
      id: Long, bytes: Array[Byte]): Decoded = {
    codec.reset()
    val hex = codec.digest(bytes).map("%02x".format(_)).mkString
    Decoded(id, "text/plain", bytes.length,
      Array.tabulate(4) { k =>
        java.lang.Long.parseLong(hex.substring(k * 8, k * 8 + 7), 16) /
          268435456.0
      })
  }

  def decodeFeatures(s: SparkSession, dir: String): Dataset[Decoded] = {
    import s.implicits._
    // not fanned out: the decode stub is one MD5 per row — lighter than
    // the exchange it would ride behind
    val payloads = Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { rows =>
      // per-partition codec init happens here (stub: an MD5 instance)
      val codec = java.security.MessageDigest.getInstance("MD5")
      rows.map { case (id, bytes) => decodeOne(codec, id, bytes) }
    }
  }

  /** One REAL-decoded image record: actual pixel dimensions plus mean
    * RGB channel features in [0, 1]. Undecodable payloads keep their
    * row with mime `application/octet-stream` and -1 dimensions — a
    * curation pipeline filters on mime instead of losing rows.
    */
  case class DecodedImage(doc_id: Long, mime: String, width: Int, height: Int,
      n_bytes: Int, features: Array[Double])

  /** The codec-admission magic table: PNG (89 50 4E 47) and JPEG
    * (FF D8 FF — covers JFIF and EXIF variants; a real multimodal
    * corpus is dominated by JPEG). Only sniffed formats reach an
    * ImageReader — arbitrary binary never touches a codec — and a
    * payload with valid magic but a corrupt body still costs exactly
    * one octet-stream row.
    */
  private val Magics: Seq[(String, Array[Int])] = Seq(
    "png" -> Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt),
    "jpeg" -> Array(0xff, 0xd8, 0xff))

  private[graft] def sniffFormat(bytes: Array[Byte]): Option[String] =
    Magics.collectFirst {
      case (fmt, magic) if bytes.length >= magic.length &&
        magic.indices.forall(i => (bytes(i) & 0xff) == magic(i)) => fmt
    }

  /** Per-partition reader pool: one reusable ImageReader per sniffed
    * format family, created lazily on first use and dispose()d when the
    * partition iterator is exhausted — the once-per-partition
    * codec-init shape, extended across formats.
    */
  private final class ReaderPool {
    private val readers =
      scala.collection.mutable.HashMap[String, javax.imageio.ImageReader]()
    def reader(fmt: String): javax.imageio.ImageReader =
      readers.getOrElseUpdate(fmt,
        javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())
    def dispose(): Unit = {
      readers.values.foreach(_.dispose()); readers.clear()
    }
  }

  /** A REAL codec through the SAME partition boundary as
    * [[decodeFeatures]]: javax.imageio (JDK java.desktop — public
    * platform API, no external codec libs) decodes PNG and JPEG
    * payloads inside the `mapPartitions` iterator. One ImageReader per
    * FORMAT is obtained lazily per partition and re-targeted per
    * payload (`setInput`/`read`) — the once-per-partition codec-init
    * shape the stub documents, now exercised with real bytes across
    * both format families. Payloads are sniffed by magic first
    * ([[sniffFormat]]), so arbitrary binary never reaches a reader; a
    * payload with valid magic but a corrupt/truncated body also falls
    * back to the octet-stream row (corrupt media is the norm at corpus
    * scale — a bad payload must cost one row, never the task). Readers
    * are dispose()d when the partition iterator is exhausted.
    */
  def decodeImages(payloads: Dataset[(Long, Array[Byte])]): Dataset[DecodedImage] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      val pool = new ReaderPool
      var disposed = false
      def decode(id: Long, bytes: Array[Byte]): DecodedImage = {
        val undecodable = DecodedImage(id, "application/octet-stream", -1, -1,
          bytes.length, Array.empty)
        sniffFormat(bytes) match {
          case None => undecodable
          case Some(fmt) =>
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val reader = pool.reader(fmt)
              reader.setInput(iis)
              val img = reader.read(0)
              val (w, h) = (img.getWidth, img.getHeight)
              var (r, g, b) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val px = img.getRGB(x, y)
                  r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (w.toLong * h * 255).toDouble
              DecodedImage(id, s"image/$fmt", w, h, bytes.length,
                Array(r / n, g / n, b / n))
            } catch {
              // corrupt body behind valid magic (IIOException etc.):
              // keep the row, flag it by mime — setInput on the next
              // payload re-targets the reader cleanly
              case scala.util.control.NonFatal(_) => undecodable
            } finally iis.close()
        }
      }
      new Iterator[DecodedImage] {
        override def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !disposed) { pool.dispose(); disposed = true }
          h
        }
        override def next(): DecodedImage = {
          val (id, bytes) = rows.next()
          decode(id, bytes)
        }
      }
    }
  }

  /** One REAL-resized image record: original and thumbnail dimensions,
    * the thumbnail's channel means, and the re-encoded PNG bytes —
    * the full decode → transform → re-encode shape of a thumbnailing
    * pipeline. Undecodable payloads keep their row (octet-stream mime,
    * -1 dims, empty thumb), same contract as [[decodeImages]].
    */
  case class ResizedImage(doc_id: Long, mime: String, width: Int, height: Int,
      thumb_width: Int, thumb_height: Int, thumb_bytes: Int,
      features: Array[Double], thumb_png: Array[Byte])

  /** REAL image resize through the same per-partition codec boundary:
    * javax.imageio decode → java.awt Graphics2D bilinear downscale to
    * fit `maxDim` (aspect preserved, never upscaled) → javax.imageio
    * PNG re-encode. All three codec stages run inside one
    * `mapPartitions` pass — one reader per partition, per-row scratch
    * buffers only — so the operator is a narrow projection at any
    * corpus size. Corrupt payloads cost one fallback row, not the task.
    */
  def resizeImages(payloads: Dataset[(Long, Array[Byte])],
      maxDim: Int): Dataset[ResizedImage] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      val pool = new ReaderPool
      var disposed = false
      def resize(id: Long, bytes: Array[Byte]): ResizedImage = {
        val undecodable = ResizedImage(id, "application/octet-stream", -1, -1,
          -1, -1, 0, Array.empty, Array.empty)
        sniffFormat(bytes) match {
          case None => undecodable
          case Some(fmt) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val reader = pool.reader(fmt)
            reader.setInput(iis)
            val img = reader.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val (tw, th) = (math.max(1, math.round(w * scale).toInt),
              math.max(1, math.round(h * scale).toInt))
            val thumb = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = thumb.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, tw, th, null)
            } finally g2.dispose()
            var (r, g, b) = (0L, 0L, 0L)
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                val px = thumb.getRGB(x, y)
                r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
                x += 1
              }
              y += 1
            }
            val n = (tw.toLong * th * 255).toDouble
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(thumb, "png", bos)
            val out = bos.toByteArray
            ResizedImage(id, s"image/$fmt", w, h, tw, th, out.length,
              Array(r / n, g / n, b / n), out)
          } catch {
            case scala.util.control.NonFatal(_) => undecodable
          } finally iis.close()
        }
      }
      new Iterator[ResizedImage] {
        override def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !disposed) { pool.dispose(); disposed = true }
          h
        }
        override def next(): ResizedImage = {
          val (id, bytes) = rows.next()
          resize(id, bytes)
        }
      }
    }
  }

  /** One perceptual image hash: the 64-bit dHash (difference hash — the
    * standard perceptual-dedup fingerprint): decode → 9×8 bilinear
    * grayscale thumbnail → 64 adjacent-pixel comparisons. Byte-level
    * hashing (md5) misses re-encodes and brightness shifts; dHash is
    * invariant to both (uniform luminance shifts preserve every
    * left<right comparison), so near-identical IMAGES — not payloads —
    * land at hamming distance ≈ 0. Undecodable payloads keep their row
    * (octet-stream mime), the [[decodeImages]] contract.
    */
  case class ImageHash(doc_id: Long, mime: String, dhash: Long)

  /** dHash through the same per-partition codec boundary as
    * [[decodeImages]] — one reader per partition, per-row scratch
    * buffers, corrupt payloads cost one fallback row.
    */
  def hashImages(payloads: Dataset[(Long, Array[Byte])]): Dataset[ImageHash] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      val pool = new ReaderPool
      var disposed = false
      def hash(id: Long, bytes: Array[Byte]): ImageHash = {
        val undecodable = ImageHash(id, "application/octet-stream", 0L)
        sniffFormat(bytes) match {
          case None => undecodable
          case Some(fmt) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val reader = pool.reader(fmt)
            reader.setInput(iis)
            val img = reader.read(0)
            // 9x8 thumbnail: 8 horizontal comparisons x 8 rows = 64 bits
            val thumb = new java.awt.image.BufferedImage(
              9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = thumb.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, 9, 8, null)
            } finally g2.dispose()
            def gray(x: Int, y: Int): Int = {
              val px = thumb.getRGB(x, y)
              (((px >> 16) & 0xff) * 299 + ((px >> 8) & 0xff) * 587 +
                (px & 0xff) * 114) / 1000
            }
            var bits = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (gray(x, y) < gray(x + 1, y)) bits |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            ImageHash(id, s"image/$fmt", bits)
          } catch {
            case scala.util.control.NonFatal(_) => undecodable
          } finally iis.close()
        }
      }
      new Iterator[ImageHash] {
        override def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !disposed) { pool.dispose(); disposed = true }
          h
        }
        override def next(): ImageHash = {
          val (id, bytes) = rows.next()
          hash(id, bytes)
        }
      }
    }
  }

  /** Near-dup IMAGE pairs at hamming ≤ `maxHamming` over the dHash —
    * the [[Dedup.simhashPairs]] pigeonhole machinery on the 64-bit
    * perceptual hash: 4 chunks of 16 bits, ≤ 3 differing bits cannot
    * touch all 4 chunks, so candidates come from chunk-key equality
    * (a bucket equi-join, never all-pairs) and the exact hamming
    * filter verifies. Undecodable rows never pair (mime filter);
    * decoded rows pair ACROSS formats — dHash's whole point is that a
    * JPEG re-encode of a PNG is the same image.
    */
  def imageDedupPairs(hashes: Dataset[ImageHash],
      maxHamming: Int = 3): DataFrame = {
    import hashes.sparkSession.implicits._
    require(maxHamming < 4, "4 chunks pigeonhole only hamming <= 3")
    val chunks = hashes.toDF()
      .where($"mime".startsWith("image/"))
      .select($"doc_id", $"dhash", explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          call_function("shiftrightunsigned", $"dhash", lit(c * 16))
            .bitwiseAND(lit(65535L)).as("ckey"))
      }: _*)).as("ck"))
      .select($"doc_id", $"dhash", $"ck.chunk", $"ck.ckey")
    val hamming = call_function("bit_count",
      $"a.dhash".bitwiseXOR($"b.dhash"))
    chunks.as("a").join(chunks.as("b"),
        $"a.chunk" === $"b.chunk" && $"a.ckey" === $"b.ckey" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        hamming.as("hamming")).distinct()
      .where($"hamming" <= maxHamming)
      .orderBy($"id_a", $"id_b")
  }

  /** Deterministic pseudo-random real PNG: LCG-seeded pixels in
    * [0, 200] (headroom so a small uniform brightness shift never
    * clamps — the dHash-invariance test depends on exact preservation
    * of every pixel-pair ordering). Same seed → identical image;
    * different seeds → unrelated dHashes.
    */
  def plantedNoisePng(seed: Long, w: Int, h: Int, brightness: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var state = seed
    def next(): Int = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      (((state >>> 33) % 201).toInt + brightness) & 0xff
    }
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (next() << 16) | (next() << 8) | next())
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Re-encode any decodable payload as JPEG at an explicit quality —
    * the cross-format twin a perceptual-dedup test plants: the SAME
    * image through a lossy codec family, which byte hashing can never
    * pair and dHash must.
    */
  def reencodeJpeg(payload: Array[Byte], quality: Float = 0.95f): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Deterministic tiny real PNG (the plantedPii precedent for media):
    * a w×h RGB gradient encoded by the JDK's own PNG writer — a VALID
    * image payload for planting in tests and demos.
    */
  def plantedPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (((x * 255) / math.max(w - 1, 1)) << 16) |
          (((y * 255) / math.max(h - 1, 1)) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling — the video-payload shape: the payload is treated as
    * a sequence of fixed 32-byte "frames"; every 4th frame is sampled
    * and featurized (md5-stub, like the decode path). The explode is a
    * bounded `sequence` generator (≤ payload/32 rows per doc, pruned to
    * 1/4 by the stride filter before any feature work), so frame
    * sampling scales as a narrow projection — no shuffle.
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val F = 32
    val stride = 4
    // not fanned out: per-frame substr slicing is light row-local work;
    // shuffling the text payload to spread it costs more than it buys
    Tables.documents(s, dir)
      .where(length($"text") > 0)
      .select($"doc_id", $"text",
        explode(sequence(lit(0), ((length($"text") - 1) / F).cast("int")))
          .as("fi"))
      .select($"doc_id", $"text", $"fi".cast("long").as("frame_idx"))
      .where($"frame_idx" % stride === 0)
      .select($"doc_id", $"frame_idx",
        expr(s"substring(text, frame_idx * $F + 1, $F)").as("frame"))
      .select($"doc_id", $"frame_idx",
        md5($"frame".cast("binary")).as("frame_md5"),
        (conv(substring(md5($"frame".cast("binary")), 1, 7), 16, 10)
          .cast("long").cast("double") / 268435456.0).as("f0"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val multimodalFramesSql: String =
    """SELECT doc_id, frame_idx,
      |  md5(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_md5,
      |  ('0x' || substr(md5(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32)), 1, 7))::BIGINT
      |    / 268435456.0 AS f0
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(generate_series(0, (len(text) - 1) // 32)) AS frame_idx
      |  FROM documents WHERE len(text) > 0) t
      |WHERE frame_idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize — the thumbnail shape: a deterministic downsample keeping
    * every 4th 8-byte block of the payload, reassembled into a smaller
    * binary (the ORACLE-CHECKABLE stub for an image resize over the
    * text-payload corpus; [[resizeImages]] is the REAL
    * decode → downscale → re-encode codec through the partition
    * boundary, spec'd on planted PNGs). Pure narrow per-row work —
    * array comprehension over block indices, no generator, no shuffle.
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = 8
    val stride = 4
    val nBlocks = ((length($"text") - 1) / B).cast("int") + 1
    val thumb = array_join(
      transform(
        filter(sequence(lit(0), nBlocks - 1), i => i % stride === 0),
        i => $"text".substr(i * B + 1, lit(B))),
      "")
    Tables.documents(s, dir)
      .where(length($"text") > 0)
      .select($"doc_id", length($"text").as("n_bytes"), thumb.as("thumb"))
      .select($"doc_id", $"n_bytes",
        length($"thumb").as("thumb_bytes"),
        md5($"thumb".cast("binary")).as("thumb_md5"))
      .orderBy($"doc_id")
  }

  val multimodalResizeSql: String =
    """SELECT doc_id, n_bytes,
      |  CAST(len(thumb) AS INT) AS thumb_bytes,
      |  md5(thumb) AS thumb_md5
      |FROM (
      |  SELECT doc_id, CAST(len(text) AS INT) AS n_bytes,
      |    array_to_string(
      |      [substr(text, CAST(i * 8 + 1 AS INT), 8)
      |       for i in generate_series(0, (len(text) - 1) // 8) if i % 4 = 0],
      |      '') AS thumb
      |  FROM documents WHERE len(text) > 0) t
      |ORDER BY doc_id""".stripMargin

  /** Deterministic ramp-pattern PNG for [[imageDedup]], built AT the
    * dHash grid size (9×8) so the mask→hash map is injective by
    * construction: doc_id picks an 8-bit mask, adjacent columns step
    * ±12 in luminance per mask bit (dHash bit j IS mask bit j, every
    * row), and a small uniform brightness shift distinguishes the
    * bytes without moving a single hash bit. Same mask ⇒ perceptual
    * duplicates with different payloads; masks differing in b bits
    * sit at hamming 8·b ≥ 8 — far outside the ≤3 pair radius.
    */
  private[graft] def plantedStripePng(id: Long): Array[Byte] = {
    val mask = (id % 256).toInt
    val shift = ((id / 256) % 3).toInt * 15
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val lum = new Array[Int](9)
    lum(0) = 120 + shift
    for (j <- 0 until 8)
      lum(j + 1) = lum(j) + (if (((mask >> j) & 1) == 1) 12 else -12)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, (lum(x) << 16) | (lum(x) << 8) | lum(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REGISTERED image near-dup query — the real-codec dedup path run
    * end-to-end over a deterministic planted image corpus (the driver
    * tables carry no image column, so the corpus derives one real PNG
    * per doc_id at the executors — same determinism discipline as the
    * LCG samplers): decode → dHash through the per-partition codec
    * boundary → hamming≤3 pairs via the 4×16-bit chunk equi-join
    * (never all-pairs). Docs sharing a ramp mask are byte-DIFFERENT
    * brightness variants of the same image and must pair at hamming 0;
    * distinct masks sit at hamming ≥ 8 and must not pair — so the
    * output is exactly the mask-collision graph (doc_id ≡ mod 256),
    * which MultimodalSpec pins. ORACLE=rows (javax.imageio is not
    * reproducible in DuckDB).
    */
  def imageDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Deliberately NOT fanned out (Tables.fanOut): the per-row work is
    // javax.imageio encode/decode, whose reader plumbing serializes on
    // shared JVM-internal locks, and the lineage appears twice in the
    // chunk self-join — A/B at sf0.1 measured the fan-out SLOWER cold
    // (12.6 vs 5.4 s) with no warm win.
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id")).as[Long]
      .map(id => (id, plantedStripePng(id)))
    imageDedupPairs(hashImages(payloads), 3)
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    GraftQuery("q_multimodal_frames", multimodalFrames, Some(multimodalFramesSql)),
    GraftQuery("q_multimodal_resize", multimodalResize, Some(multimodalResizeSql)),
    GraftQuery("q_image_dedup", imageDedup, None))
}
