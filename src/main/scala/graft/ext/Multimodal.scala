package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns (SURVEY.md §2C): media as opaque `binary`
  * payloads + typed metadata, with the Spark-side plumbing — schema,
  * batch shape, partition-friendly transforms — fully real. The codec
  * boundary is STUBBED for compressed formats (no image/audio
  * libraries ship in this environment) but demonstrated for real with
  * a pure-JVM uncompressed-PPM decoder ([[Multimodal.PpmCodec]]).
  *
  * Layout convention:
  *   media(media_id BIGINT, kind STRING, payload BINARY,
  *         meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
  *
  * The decode stub is deterministic (byte-level features), so every
  * downstream stage — frame sampling, resize, feature extraction,
  * similarity over extracted vectors — is testable end-to-end today and
  * swaps to a real codec by replacing ONE function.
  */
object Multimodal {

  /** Deterministic synthetic media derived from `documents`: payload is
    * the UTF-8 text bytes, `kind` cycles image/audio/video, metadata is
    * sized from the payload. Stands in for `spark.read.format("binaryFile")`.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        // explicit floor: Spark's double→int cast truncates but DuckDB's
        // rounds, so the fractional division must never reach a cast
        (floor(length(col("text")) / lit(32.0)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB — codec boundary. A real deployment decodes the payload with
    * an image/audio library inside mapPartitions (one codec instance
    * per partition, never per row). Here: a deterministic 16-bin byte
    * histogram, L2-normalized — shaped exactly like an embedding so the
    * Similarity operators compose downstream.
    */
  def decodeToFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    // binary has no higher-order functions in Spark; the stub "decodes"
    // by charset-decoding and histogramming code points (deterministic,
    // byte-shaped). A real codec replaces `codes` with pixel/PCM values.
    val hist = expr(
      s"""transform(sequence(0, ${bins - 1}, 1), b ->
            size(filter(codes, cp -> CAST(cp % 256 / ${256 / bins} AS INT) = b)))""")
    media
      .withColumn("decoded", decode(col("payload"), "UTF-8"))
      .withColumn("codes",
        expr("transform(sequence(1, length(decoded)), i -> ascii(substring(decoded, i, 1)))"))
      .withColumn("hist", hist)
      .withColumn("norm", sqrt(aggregate(col("hist"),
        lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn("features",
        expr("transform(hist, h -> CAST(h AS DOUBLE) / norm)"))
      .select(col("media_id"), col("kind"), col("meta"), col("features"))
  }

  /** Fixed-size payload slicing shared by the video frame sampler and
    * the audio window energy face — full `frameBytes` slices, every
    * `stride`-th kept. The length guard is load-bearing: a payload
    * shorter than one frame has ZERO frames, and without it
    * `sequence(0, n-1)` with n = 0 DESCENDS in Spark
    * (sequence(0,-1) = [0,-1]) and fabricates frame indices.
    */
  private[graft] def frameSlices(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val slices =
      s"""transform(sequence(0, CAST(length(payload) / $frameBytes AS INT) - 1),
         |          i -> named_struct('idx', i, 'frame', substring(payload, i * $frameBytes + 1, $frameBytes)))""".stripMargin
    // stride 1 keeps everything — skip the tautological per-element
    // lambda pass (review: 'f.idx % 1 = 0' evaluated per window on the
    // audio path)
    val kept = if (stride == 1) slices
      else s"filter($slices, f -> f.idx % $stride = 0)"
    media
      .filter(length(col("payload")) >= frameBytes)
      .select(col("media_id"), posexplode(expr(kept)).as(Seq("pos", "f")))
      .select(col("media_id"), col("f.idx").as("frame_idx"), col("f.frame").as("frame"))
  }

  /** The ASCII-guarded registered-media universe shared by the
    * frame-sample and audio-energy faces (review: the guard block was
    * duplicated; the oracle reconstructs bytes via substr on
    * CHARACTERS — see syntheticPpmMedia's scaladoc for the trap).
    */
  private def asciiMedia(spark: SparkSession, dir: String, kind: String): DataFrame =
    syntheticMedia(spark, dir)
      .filter(col("media_id") < 200)
      .filter(col("kind") === kind)
      .filter(decode(col("payload"), "UTF-8").rlike("^[\\x01-\\x7F]*$"))

  /** Frame sampling for video payloads: slice the byte stream into
    * fixed-size frames and keep every `stride`-th — pure array ops, one
    * narrow pass, no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    frameSlices(media.filter(col("kind") === "video"), frameBytes, stride)

  /** STUB — resize boundary: truncate/zero-pad frames to a target size
    * (a real impl resamples pixels/samples; the batch shape is what
    * matters for the pipeline).
    */
  def resizeFrames(frames: DataFrame, targetBytes: Int = 16): DataFrame =
    frames.withColumn("resized",
      expr(s"substring(concat(frame, CAST(repeat(CHR(0), $targetBytes) AS BINARY)), 1, $targetBytes)"))

  /** Minimal binary-PPM (P6) reader — a REAL pure-JVM codec (round 6,
    * VERDICT r5 #8), so the "swap ONE function for a real codec" claim
    * has a working example in-repo. PPM is uncompressed ("P6", ASCII
    * width/height/maxval header with #-comments, then interleaved RGB
    * bytes), so no imaging library is needed; a libjpeg/FFmpeg binding
    * plugs into exactly this decode() seam for compressed formats
    * (which stay stubbed — they don't ship in this environment).
    */
  private[graft] object PpmCodec {
    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "need w*h*3 RGB bytes")
      s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ rgb
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < 2 || bytes(0) != 'P'.toByte || bytes(1) != '6'.toByte) return None
      var pos = 2
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < bytes.length) {
          val c = bytes(pos).toChar
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1 }
          else if (c.isWhitespace) pos += 1
          else done = true
        }
      }
      def int(): Option[Int] = {
        skipWs()
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte) pos += 1
        if (pos == start) None else Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
      }
      for {
        w <- int(); h <- int(); maxv <- int()
        if maxv == 255 && w > 0 && h > 0
        dataStart = pos + 1 // exactly one whitespace byte after maxval
        if bytes.length >= dataStart + w * h * 3
      } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + w * h * 3))
    }
  }

  /** Magic-sniffing image decode (round 18 — VERDICT r17 #5; JPEG leg
    * round 20 — VERDICT r19 #5): "P6" → [[PpmCodec]]; the PNG
    * signature and the JPEG SOI marker (FF D8 FF) → [[imageIoDecode]]
    * via `javax.imageio` (pure JDK — PNG and JPEG readers ship in
    * every JRE, no new dependency); anything else → None, the
    * codec-error path. This is the ONE function the scaladoc at the
    * top promises a real deployment swaps: the image faces accept a
    * MIXED PPM/PNG/JPEG payload column through the same mapPartitions
    * seam.
    *
    * Oracle note: the REGISTERED faces keep a PPM/PNG-only synthetic
    * column — both are lossless, so their decoded pixels replay
    * bit-identically in the DuckDB oracle. JPEG decode is LOSSY and
    * IDCT rounding is decoder-implementation-specific, so a JPEG leg
    * has no cross-engine pixel-replay oracle; it is proven by the
    * golden-decode spec (encode→decode round trip within a quantified
    * error bound, exact dims, fail-closed on truncation) and the
    * mixed-column spec instead.
    */
  private[graft] object ImageCodec {
    private val PngMagic = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    private val JpegMagic = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
    // stream decode straight from the byte array — never spill an
    // ImageIO disk cache on an executor
    javax.imageio.ImageIO.setUseCache(false)

    def decode(bytes: Array[Byte]): Option[PpmCodec.Image] =
      if (bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte)
        PpmCodec.decode(bytes)
      else if (bytes.length >= 4 && bytes.take(4).sameElements(PngMagic))
        imageIoDecode(bytes)
      else if (bytes.length >= 3 && bytes.take(3).sameElements(JpegMagic))
        imageIoDecode(bytes)
      else None

    /** PNG or JPEG → interleaved RGB in the [[PpmCodec.Image]] shape
      * (`ImageIO.read` re-sniffs the container itself; the magic gate
      * above only decides whether the bytes are worth handing to it).
      * PNG is lossless, so a PNG-encoded thumbnail decodes to the
      * IDENTICAL pixel bytes as its PPM twin — which is what lets the
      * mixed media column keep the existing pixel-replay oracles.
      * JPEG decodes to whatever its quantization kept. Alpha, if
      * present, is dropped (getRGB's opaque-RGB read).
      */
    private[graft] def imageIoDecode(bytes: Array[Byte]): Option[PpmCodec.Image] =
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
          val w = img.getWidth; val h = img.getHeight
          // one bulk pixel read (getRGB array form) — the per-pixel
          // getRGB(x, y) call is a method dispatch per pixel, the wrong
          // shape if real photos ever hit this seam
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0; var p = 0
          while (i < argb.length) {
            val v = argb(i)
            rgb(p) = ((v >> 16) & 0xFF).toByte
            rgb(p + 1) = ((v >> 8) & 0xFF).toByte
            rgb(p + 2) = (v & 0xFF).toByte
            p += 3; i += 1
          }
          PpmCodec.Image(w, h, rgb)
        }
        // NonFatal, not just IOException: ImageIO's PNG reader throws
        // RuntimeExceptions (IllegalArgument/IndexOutOfBounds) on
        // crafted or truncated payloads — a bad PNG must drop like a
        // codec error, never fail the Spark task
      } catch { case scala.util.control.NonFatal(_) => None }

    /** RGB bytes → PNG via the same JDK path (TYPE_INT_RGB, no
      * alpha) — the synthetic seam's second encoder and the spec's
      * golden-PNG generator.
      */
    private[graft] def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "need w*h*3 RGB bytes")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0; var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y,
            ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
          p += 3; x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** RGB bytes → baseline JPEG via the same JDK path — the golden
      * generator for the lossy leg's spec (round 20). Default ImageIO
      * quality; the spec asserts a per-channel error BOUND, never
      * exact bytes (see the decode scaladoc on why JPEG stays out of
      * the pixel-replay oracles).
      */
    private[graft] def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "need w*h*3 RGB bytes")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0; var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y,
            ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
          p += 3; x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
  }

  final case class PpmFeatures(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode PPM payloads to per-channel pixel statistics inside
    * mapPartitions — the production codec shape (per-partition setup,
    * not per-row; decode failures drop the row like a codec error
    * path). Everything upstream/downstream of the codec seam is the
    * same plumbing [[decodeToFeatures]] stubs.
    */
  def decodePpm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition scope: a real binding allocates its codec
        // context here, reused across the partition's rows
        it.flatMap { case (id, payload) =>
          PpmCodec.decode(payload).map { img =>
            val n = img.width * img.height
            val sums = new Array[Long](3)
            var i = 0
            while (i < img.pixels.length) { sums(i % 3) += img.pixels(i) & 0xFF; i += 1 }
            PpmFeatures(id, img.width, img.height,
              sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
          }
        }
      }.toDF()
  }

  /** Oracle-checked PPM decode: deterministic inline images through the
    * real codec, golden expected means.
    */
  def ppmQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def px(rgb: (Int, Int, Int)*): Array[Byte] =
      rgb.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val media = Seq(
      (1L, PpmCodec.encode(2, 2, px((255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255)))),
      (2L, PpmCodec.encode(3, 1, px((0, 0, 0), (128, 128, 128), (255, 255, 255)))),
      (3L, "not an image".getBytes("UTF-8")) // codec failure → dropped
    ).toDF("media_id", "payload")
    decodePpm(media)
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy(col("media_id"))
  }

  final case class MediaPayload(media_id: Long, payload: Array[Byte])
  final case class MediaHash(media_id: Long, phash: Long)

  /** dHash-64 — the standard difference perceptual hash: on a 9×8
    * grayscale image, bit (r,c) is set iff gray(r,c) > gray(r,c+1); 8
    * comparisons per row × 8 rows pack into one 64-bit word. Gray is
    * the integer mean of the RGB bytes (matches the oracle's integer
    * division exactly). Near-identical images flip few bits, so
    * near-dup detection is Hamming distance on 8-byte hashes — the
    * image analogue of SimHash over token text.
    */
  private[graft] def dHash64(img: PpmCodec.Image): Long = {
    require(img.width == 9 && img.height == 8, "dHash expects a 9x8 thumbnail")
    val gray = new Array[Int](img.width * img.height)
    var p = 0
    while (p < gray.length) {
      val r = img.pixels(3 * p) & 0xFF
      val g = img.pixels(3 * p + 1) & 0xFF
      val b = img.pixels(3 * p + 2) & 0xFF
      gray(p) = (r + g + b) / 3
      p += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      val r = i / 8; val c = i % 8
      if (gray(r * 9 + c) > gray(r * 9 + c + 1)) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Deterministic 9×8 PPM thumbnails derived from document text (RGB
    * byte j = UTF-8 byte j of the text, mod byte length — cross-engine
    * computable, which is what lets the DuckDB oracle reproduce the
    * hash bits). Guarded to ASCII-only documents (ADVICE r8): the
    * previous charAt/UTF-16 derivation silently diverged from the
    * oracle's character-based `ascii(substr(...))` on any code point
    * > 127 (different lengths AND different codes), so parity depended
    * on the corpus being pure ASCII. Under the explicit ASCII guard,
    * UTF-8 bytes == char codes == the oracle's extraction, for every
    * corpus. Near-dup texts yield near-identical images; a real corpus
    * lands here from `binaryFile` + a resize, with payload already a
    * thumbnail — this synthetic seam exists only to exercise the codec
    * + phash pipeline on reproducible pixels.
    */
  private[graft] def syntheticPpmMedia(docs: DataFrame): DataFrame =
    syntheticThumbs(docs, _ => "ppm")

  /** MIXED-format twin (round 18): the SAME deterministic 9×8
    * thumbnails, but even media_ids encode as PPM and odd ones as PNG
    * ([[ImageCodec.encodePng]]) — the registered image faces read this
    * column, so the sniffing decoder's PNG leg is oracle-exercised on
    * half the corpus. PNG is lossless, so the decoded pixels (hence
    * phash bits and channel partials) are bit-identical to the all-PPM
    * column and the pixel-replay oracles hold unchanged.
    */
  private[graft] def syntheticImageMedia(docs: DataFrame): DataFrame =
    syntheticThumbs(docs, id => if (id % 2 == 1) "png" else "ppm")

  /** THREE-codec twin (round 20 — VERDICT r19 #5): the same
    * thumbnails with media_id % 3 choosing PPM / PNG / JPEG. JPEG is
    * LOSSY (its decoded pixels depend on the encoder's quantization
    * and the decoder's IDCT rounding), so this column has no
    * cross-engine pixel-replay oracle — the REGISTERED faces keep the
    * lossless [[syntheticImageMedia]] mix, and this column is the
    * mixed-codec SPEC's input: the full feature/phash plumbing over
    * all three magics, with the JPEG rows asserted against an error
    * bound instead of exact bytes.
    */
  private[graft] def syntheticImageMediaLossy(docs: DataFrame): DataFrame =
    syntheticThumbs(docs,
      id => if (id % 3 == 1) "png" else if (id % 3 == 2) "jpg" else "ppm")

  private def syntheticThumbs(docs: DataFrame, codecOf: Long => String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) >= 1)
      .filter(col("text").rlike("^[\\x01-\\x7F]*$")) // ASCII-only: see Scaladoc
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = bytes.length
          val rgb = new Array[Byte](9 * 8 * 3)
          var j = 0
          while (j < rgb.length) { rgb(j) = bytes(j % n); j += 1 }
          val payload = codecOf(id) match {
            case "png" => ImageCodec.encodePng(9, 8, rgb)
            case "jpg" => ImageCodec.encodeJpeg(9, 8, rgb)
            case _     => PpmCodec.encode(9, 8, rgb)
          }
          MediaPayload(id, payload)
        }
      }.toDF()
  }

  /** Image payloads → perceptual hashes through the real codec seam:
    * decode inside mapPartitions ([[decodePpm]]'s shape) with the
    * magic-sniffing [[ImageCodec]] (PPM or PNG — round 18), hash with
    * [[dHash64]]. Undecodable payloads drop like codec errors.
    */
  def phashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          ImageCodec.decode(payload).map(img => MediaHash(id, dHash64(img)))
        }
      }.toDF()
  }

  /** Image near-dup pairs at Hamming ≤ `maxHamming` via banded
    * multi-index search (Manku et al., WWW'07 — the production simhash
    * dedup shape): split the 64-bit hash into `bands` fixed slices; by
    * pigeonhole, any pair within Hamming < `bands` shares at least one
    * identical slice, so an equi-join on (band, slice-value) generates
    * EVERY qualifying pair — banding is exact here, not approximate —
    * and the verify pass just computes `bit_count(xor)` on the 8-byte
    * hashes. No all-pairs stage anywhere: candidates are bucket-joins
    * on 16-bit slice keys, the same shape as the MinHash band join
    * ([[Dedup]]). At corpus scale the slices widen (more bands of more
    * bits over a longer hash) to keep buckets sparse; the operator
    * shape is unchanged.
    */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "pigeonhole exactness needs maxHamming < bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until bands).map(i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("phash"), width * i).bitwiseAND(lit(mask)).as("bv"))): _*)).as("b"))
      .select(col("media_id"), col("phash"), col("b.band").as("band"), col("b.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("m1"), col("b.media_id").as("m2"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .distinct() // a pair can match in several bands
      .filter(col("hamming") <= maxHamming)
  }

  /** Registered query: thumbnails from the first 200 documents —
    * MIXED PPM/PNG payloads (round 18) — → sniffing decode → dHash →
    * banded Hamming-≤3 pairs. The planted exact-dup documents surface
    * at Hamming 0; near-dup texts at small positive distances.
    */
  def phashQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    phashNearDupPairs(phashes(syntheticImageMedia(docs)))
      .orderBy(col("m1"), col("m2"))
  }

  /** Image near-dup CLUSTERING (`x_image_clusters`, round 17 — VERDICT
    * r16 #5): connected components over the phash banded-Hamming pair
    * graph — the images' dedup-apply decision, closing the loop the
    * pair face opens exactly the way `x_dedup_clusters` closes
    * `x_dedup_ngram`'s. Pairs come from [[phashNearDupPairs]] (banded
    * multi-index, exact by pigeonhole — no all-pairs stage); the solve
    * is the SHARED size-adaptive [[Dedup.componentsFor]] kernel
    * (driver union-find ≤ 10M edges, pointer-jumping above), so images
    * inherit the text family's 100 TB component machinery instead of
    * growing a copy. Universe = every image the codec DECODED (a
    * failed decode has no hash, no pairs, no cluster — the codec-error
    * path); cluster = component-min media_id, keep = is-canonical
    * (keep-the-smallest-id, the dedup-apply convention).
    */
  def imageClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val hs = phashes(syntheticImageMedia(docs))
    val pairs = phashNearDupPairs(hs)
      .select(col("m1").as("d1"), col("m2").as("d2"))
    Dedup.componentsFor(hs.select(col("media_id").as("doc_id")), pairs)
      .select(col("doc_id").as("media_id"), col("cluster"), col("keep"))
      .orderBy(col("media_id"))
  }

  /** One image's per-channel pixel partials straight out of the codec
    * loop — the shape a real deployment emits at the decode seam: ONE
    * pass over the pixel bytes yields (n, sum, sum-of-squares, min,
    * max) per channel, 3 bounded rows per image, so the corpus-wide
    * statistics are a plain mergeable aggregate with map-side partials
    * (≤ 3 rows per partition on the wire) — never a per-pixel row
    * explosion.
    */
  final case class ChannelPartial(media_id: Long, channel: String,
      n: Long, s: Long, sq: Long, mn: Long, mx: Long)

  /** Per-channel image statistics (`x_image_stats`, round 17 — VERDICT
    * r16 #5): corpus-wide count/sum/mean/std/min/max per RGB channel
    * off the REAL PPM decodes — the [[graft.ext.Profiling]]
    * `x_embed_stats` sibling for the image column, the camera/codec
    * drift check a multimodal pipeline runs before training (a
    * channel whose mean or spread jumps between ingest batches marks
    * a codec, color-space, or capture change). All-integer contract:
    * n/s/sq/min/max are exact integer sums of byte values; mean is
    * one truncating micro-division; std is the one-shape double
    * σ = √(n·Σx²−(Σx)²)/n quantized micro (exact bigint radicand,
    * ONE cast to double — the ln-leg convention applied to sqrt).
    */
  def imageChannelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val partials = syntheticImageMedia(docs)
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val names = Array("r", "g", "b")
        it.flatMap { case (id, payload) =>
          ImageCodec.decode(payload).toSeq.flatMap { img =>
            val n = new Array[Long](3); val s = new Array[Long](3)
            val sq = new Array[Long](3)
            val mn = Array.fill(3)(Long.MaxValue); val mx = Array.fill(3)(Long.MinValue)
            var i = 0
            while (i < img.pixels.length) {
              val c = i % 3
              val v = (img.pixels(i) & 0xFF).toLong
              n(c) += 1; s(c) += v; sq(c) += v * v
              if (v < mn(c)) mn(c) = v
              if (v > mx(c)) mx(c) = v
              i += 1
            }
            (0 until 3).map(c => ChannelPartial(id, names(c), n(c), s(c), sq(c), mn(c), mx(c)))
          }
        }
      }.toDF()
    partials.groupBy(col("channel"))
      .agg(sum(col("n")).as("n_px"), sum(col("s")).as("s"),
        sum(col("sq")).as("sq"), min(col("mn")).as("min_v"), max(col("mx")).as("max_v"))
      .select(col("channel"), col("n_px"), col("s").as("sum_v"),
        expr("s * 1000000 div n_px").as("mean_micro"),
        expr("CAST(floor(sqrt(CAST(n_px * sq - s * s AS DOUBLE)) * 1000000e0 / n_px"
          + " + 0.5) AS BIGINT)").as("std_micro"),
        col("min_v"), col("max_v"))
      .orderBy(col("channel"))
  }

  /** Registered video frame-sampling face (`x_frame_sample`, round 17):
    * the [[sampleFrames]] → [[resizeFrames]] plumbing promoted from
    * spec-only to oracle-proven — video payloads slice into 32-byte
    * frames, every 4th frame is kept (the stride sampler a video
    * pipeline runs before feature extraction; a real deployment swaps
    * the byte slicer for a keyframe decoder at the same seam), each
    * kept frame resizes to its 16-byte prefix, and the row carries a
    * deterministic byte-sum checksum so the DuckDB oracle replays the
    * whole slice/stride/resize arithmetic from the text bytes (the
    * [[syntheticPpmMedia]] ASCII-guard convention: UTF-8 bytes == char
    * codes, so `substr` on both engines reads the same payload). Pure
    * row-local array ops — zero shuffle except the presentation sort;
    * at 100 TB this is a free rider on the media scan.
    */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val frames = resizeFrames(sampleFrames(asciiMedia(spark, dir, "video")))
      .withColumn("rs", decode(col("resized"), "UTF-8"))
    frames.select(col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(col("rs")).cast("long").as("resized_len"),
        expr("aggregate(transform(sequence(1, length(rs)), i ->"
          + " ascii(substring(rs, i, 1))), 0L, (acc, x) -> acc + x)")
          .as("byte_sum"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Audio window energy (`x_audio_energy`, round 17): per-window
    * mean-square signal energy over PCM-interpreted payload bytes —
    * the voice-activity/silence-detection primitive an audio pipeline
    * runs before transcription or segment sampling (silent windows
    * are dropped, energetic ones batch to the model), completing the
    * media triple: images have phash/stats, video has frame sampling,
    * audio now has energy windowing. Samples are the bytes centered
    * at 128 (unsigned-8-bit PCM convention); per non-overlapping
    * 32-byte window: Σ(b−128)² as an exact integer, mean-square by
    * truncating division, and the silence verdict against an integer
    * threshold. Row-local slicing through the SHARED [[frameSlices]]
    * (stride 1 — energy wants every window), exact integer arithmetic
    * end to end — the oracle replays it from the text bytes under the
    * ASCII guard. Zero shuffle except the presentation sort.
    *
    * `silenceThreshold`'s default 1800 is FIXTURE-SPECIFIC (ADVICE
    * r17): the [[asciiMedia]] guard restricts payload bytes to
    * 0x01–0x7F, so every (b−128) offset is negative and mean_sq lands
    * in [1, 127²] — 1800 splits THAT synthetic distribution. Genuine
    * u8 PCM centers near 128 (quiet windows → mean_sq near 0), so a
    * real deployment MUST pass its own threshold (e.g. 25–400 for
    * 8-bit speech VAD); the default exists only so the registered
    * oracle face has a pinned verdict column.
    */
  def audioEnergyQuery(spark: SparkSession, dir: String,
      windowBytes: Int = 32, silenceThreshold: Long = 1800L): DataFrame = {
    frameSlices(asciiMedia(spark, dir, "audio"), windowBytes, stride = 1)
      .withColumn("w", decode(col("frame"), "UTF-8"))
      .select(col("media_id"), col("frame_idx").cast("long").as("win_idx"),
        expr("aggregate(transform(sequence(1, length(w)), i ->"
          + " CAST((ascii(substring(w, i, 1)) - 128) *"
          + " (ascii(substring(w, i, 1)) - 128) AS BIGINT)),"
          + " CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("sq_sum"))
      .select(col("media_id"), col("win_idx"), col("sq_sum"),
        expr(s"sq_sum DIV $windowBytes").as("mean_sq"),
        (expr(s"sq_sum DIV $windowBytes") < silenceThreshold).as("is_silence"))
      .orderBy(col("media_id"), col("win_idx"))
  }

  /** End-to-end demo: media → features → cosine-nearest media pairs
    * (reuses the Similarity cosine over the extracted features).
    */
  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    decodeToFeatures(syntheticMedia(spark, dir))
      .filter(col("media_id") < 50)
      .select(col("media_id"), col("kind"),
        col("meta.n_frames").as("n_frames"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"))
      .orderBy(col("media_id"))
}
