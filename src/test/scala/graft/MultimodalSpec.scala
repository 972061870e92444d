package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Multimodal plumbing: schema shape, deterministic decode stub, frame
  * sampling geometry, resize contract.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("synthetic media schema: binary payload + typed metadata") {
    val m = Multimodal.syntheticMedia(spark, dir)
    val f = m.schema.fields.map(x => x.name -> x.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("kind") == "string")
    assert(f("meta").startsWith("struct<width:int,height:int,sample_rate:int,n_frames:int"))
    assert(m.select("kind").distinct().as[String].collect().toSet == Set("image", "audio", "video"))
  }

  test("feature decode stub: unit-norm, deterministic across runs") {
    val feats = Multimodal.decodeToFeatures(Multimodal.syntheticMedia(spark, dir).limit(20))
    val norms = feats.select(
      aggregate(col("features"), lit(0.0), (acc, x) => acc + x * x).as("n2"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    val a = feats.select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    val b = Multimodal.decodeToFeatures(Multimodal.syntheticMedia(spark, dir).limit(20))
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(a == b)
  }

  test("frame sampling: stride-4 keeps every 4th fixed-size frame") {
    val media = Multimodal.syntheticMedia(spark, dir).filter(col("kind") === "video").limit(5)
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
    val byMedia = frames.groupBy("media_id").agg(
        count(lit(1)).as("n"), collect_list("frame_idx").as("idxs"))
      .as[(Long, Long, Seq[Int])].collect()
    assert(byMedia.nonEmpty)
    byMedia.foreach { case (_, _, idxs) =>
      assert(idxs.forall(_ % 4 == 0), s"non-stride frame kept: $idxs")
    }
    val lens = frames.select(length(col("frame"))).as[Int].collect()
    assert(lens.forall(_ <= 32))
  }

  test("frame sampling: a payload shorter than one frame yields zero frames, never bogus indices") {
    import spark.implicits._
    // sequence(0, -1) DESCENDS in Spark — without the length guard this
    // payload fabricated frame indices 0 and -1 (the bug this pins)
    val media = Seq((1L, "video", "tiny".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.sampleFrames(media, frameBytes = 32, stride = 4).count() == 0L)
  }

  test("audio energy: windows replay from text bytes, silence verdict splits the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = Multimodal.audioEnergyQuery(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .filter { case (id, t) =>
        id < 200 && id % 3 == 1 && t.length >= 32 && t.forall(c => c >= 1 && c <= 127)
      }
    val expected = docs.flatMap { case (id, t) =>
      (0 until t.length / 32).map { i =>
        val w = t.substring(i * 32, i * 32 + 32)
        (id, i.toLong) -> w.map(c => { val d = c.toInt - 128; (d * d).toLong }).sum
      }
    }.toMap
    assert(rows.length == expected.size, s"${rows.length} vs ${expected.size}")
    rows.foreach { case (id, wi, sq, ms, sil) =>
      assert(sq == expected((id, wi)), s"window ($id,$wi): $sq vs ${expected((id, wi))}")
      assert(ms == sq / 32 && sil == (ms < 1800L), s"window ($id,$wi) verdict")
    }
    // the calibrated threshold must actually discriminate on this corpus
    assert(rows.exists(_._5) && rows.exists(!_._5), "degenerate silence verdict")
  }

  test("resize: every frame exactly target size, truncation or zero-pad") {
    val media = Multimodal.syntheticMedia(spark, dir).filter(col("kind") === "video").limit(3)
    val resized = Multimodal.resizeFrames(Multimodal.sampleFrames(media), targetBytes = 16)
    val lens = resized.select(length(col("resized"))).as[Int].collect()
    assert(lens.nonEmpty && lens.forall(_ == 16), s"lens: ${lens.toSeq.distinct}")
  }

  test("PPM codec: real decode round-trips encode, handles comments, rejects junk") {
    import Multimodal.PpmCodec
    val rgb = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 10, 20, 30)
    val img = PpmCodec.decode(PpmCodec.encode(2, 2, rgb))
    assert(img.exists(i => i.width == 2 && i.height == 2 && i.pixels.sameElements(rgb)))
    // header comments are legal PPM and must be skipped
    val withComment = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    assert(PpmCodec.decode(withComment).exists(_.pixels.sameElements(rgb)))
    // junk, wrong magic, and truncated pixel data all fail closed
    assert(PpmCodec.decode("nope".getBytes).isEmpty)
    assert(PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode(PpmCodec.encode(2, 2, rgb).dropRight(1)).isEmpty)
    // the distributed decode: golden means, junk row dropped
    val out = Multimodal.ppmQuery(spark, dir)
      .as[(Long, Int, Int, Double, Double, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, 2, 2, 127.5, 0.0, 127.5),
      (2L, 3, 1, 127.6667, 127.6667, 127.6667)))
  }

  test("PNG codec: golden decode through the sniffing seam, lossless PPM parity, junk fails closed") {
    import Multimodal.{ImageCodec, PpmCodec}
    // golden 2x2: encode known RGB via the JDK writer, decode via the
    // sniffing seam, recover the exact pixels
    val rgb = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 10, 20, 30)
    val png = ImageCodec.encodePng(2, 2, rgb)
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte, "PNG signature")
    val img = ImageCodec.decode(png)
    assert(img.exists(i => i.width == 2 && i.height == 2 && i.pixels.sameElements(rgb)),
      "PNG decode must recover the exact RGB bytes (lossless)")
    // the sniffer still routes PPM and fails closed on junk
    assert(ImageCodec.decode(PpmCodec.encode(2, 2, rgb)).exists(_.pixels.sameElements(rgb)))
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(png.take(8)).isEmpty, "truncated PNG fails closed")
    // mixed-column parity: PNG-encoded thumbnails hash identically to
    // their PPM twins, so the pixel-replay oracles hold over the mixed
    // media column the registered faces now read
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 60)
    val ppmHashes = Multimodal.phashes(Multimodal.syntheticPpmMedia(docs))
      .as[(Long, Long)].collect().toMap
    val mixed = Multimodal.syntheticImageMedia(docs).cache()
    try {
      // odd ids really are PNG payloads (the PNG leg is exercised)
      val oddPayload = mixed.filter(col("media_id") % 2 === 1)
        .select("payload").as[Array[Byte]].head()
      assert((oddPayload(0) & 0xFF) == 0x89, "odd media_ids must be PNG-encoded")
      val mixedHashes = Multimodal.phashes(mixed).as[(Long, Long)].collect().toMap
      assert(mixedHashes == ppmHashes, "mixed PPM/PNG hashes must equal the all-PPM hashes")
    } finally mixed.unpersist(blocking = false)
  }

  test("JPEG codec: golden decode within quantified bounds; 3-codec mixed column decodes fully") {
    import Multimodal.{ImageCodec, PpmCodec}
    // golden flat-color 8x8: a single DCT block with DC-only energy,
    // so baseline JPEG round-trips it nearly exactly — a TIGHT bound
    // (lossy decode has no exact-byte contract; see ImageCodec's
    // scaladoc on why JPEG stays out of the pixel-replay oracles)
    val rgb = new Array[Byte](8 * 8 * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = 100.toByte; rgb(i + 1) = 150.toByte; rgb(i + 2) = 200.toByte; i += 3
    }
    val jpg = ImageCodec.encodeJpeg(8, 8, rgb)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8, "JPEG SOI marker")
    val img = ImageCodec.decode(jpg)
    assert(img.exists(d => d.width == 8 && d.height == 8), "dims must survive the round trip")
    val maxErr = img.get.pixels.zip(rgb)
      .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.max
    assert(maxErr <= 8, s"flat-color JPEG round trip must stay within 8/255/channel, got $maxErr")
    assert(ImageCodec.decode(jpg.take(6)).isEmpty, "truncated JPEG fails closed")

    // the full mixed PPM/PNG/JPEG column through the phash feature
    // plumbing: every codec decodes (count parity — an undecodable
    // payload would drop), the lossless legs stay bit-identical to
    // their PPM twins, and each JPEG row's per-channel means stay
    // within the DC-quantization bound of its lossless twin
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 60)
    val lossy = Multimodal.syntheticImageMediaLossy(docs).cache()
    try {
      val jpgPayload = lossy.filter(col("media_id") % 3 === 2)
        .select("payload").as[Array[Byte]].head()
      assert((jpgPayload(0) & 0xFF) == 0xFF && (jpgPayload(1) & 0xFF) == 0xD8,
        "media_id % 3 == 2 must be JPEG-encoded")
      val n = lossy.count()
      val hashes = Multimodal.phashes(lossy).as[(Long, Long)].collect().toMap
      assert(hashes.size.toLong == n, s"all three codecs must decode: ${hashes.size} of $n")
      val ppmById = Multimodal.syntheticPpmMedia(docs)
        .select(col("media_id"), col("payload")).as[(Long, Array[Byte])].collect().toMap
      val ppmHashes = Multimodal.phashes(Multimodal.syntheticPpmMedia(docs))
        .as[(Long, Long)].collect().toMap
      assert(hashes.keysIterator.filter(_ % 3 != 2).forall(id => hashes(id) == ppmHashes(id)),
        "lossless legs must bit-match the all-PPM hashes")
      val worstMeanErr = lossy.filter(col("media_id") % 3 === 2)
        .select(col("media_id"), col("payload")).as[(Long, Array[Byte])].collect()
        .map { case (id, payload) =>
          val a = ImageCodec.decode(payload).get.pixels
          val b = PpmCodec.decode(ppmById(id)).get.pixels
          (0 until 3).map { c =>
            def mean(px: Array[Byte]) =
              px.indices.collect { case j if j % 3 == c => px(j) & 0xFF }.sum.toDouble / (px.length / 3)
            math.abs(mean(a) - mean(b))
          }.max
        }.max
      assert(worstMeanErr <= 8.0,
        s"JPEG per-channel means must stay within 8/255 of the lossless twin, got $worstMeanErr")
    } finally lossy.unpersist(blocking = false)
  }

  test("dHash: identical images hash equal, one-pixel edits flip few bits, unrelated images are far") {
    import Multimodal.PpmCodec
    def thumb(f: Int => Int): PpmCodec.Image = {
      val rgb = new Array[Byte](9 * 8 * 3)
      var j = 0
      while (j < rgb.length) { rgb(j) = (f(j / 3) & 0xFF).toByte; j += 1 }
      PpmCodec.Image(9, 8, rgb)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = thumb(p => (p * 37) % 251)
    val copy = thumb(p => (p * 37) % 251)
    // one changed pixel disturbs at most its two adjacent comparisons
    val nearPixels = base.pixels.clone(); nearPixels(3 * 40) = 0; nearPixels(3 * 40 + 1) = 0; nearPixels(3 * 40 + 2) = 0
    val near = PpmCodec.Image(9, 8, nearPixels)
    val far = thumb(p => ((p % 9) % 2) * 255) // vertical stripes: opposite gradient signs
    val (hb, hc, hn, hf) = (Multimodal.dHash64(base), Multimodal.dHash64(copy),
      Multimodal.dHash64(near), Multimodal.dHash64(far))
    assert(hb == hc)
    assert(hamming(hb, hn) <= 2, s"one-pixel edit flipped ${hamming(hb, hn)} bits")
    assert(hamming(hb, hf) > 16, s"unrelated image too close: ${hamming(hb, hf)}")
  }

  test("banded phash pairs equal brute force (pigeonhole exactness) and surface planted dups") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").filter(col("doc_id") < 200)
    val hashes = Multimodal.phashes(Multimodal.syntheticPpmMedia(docs)).cache()
    val banded = Multimodal.phashNearDupPairs(hashes, maxHamming = 3, bands = 4)
      .select("m1", "m2", "hamming").as[(Long, Long, Long)].collect().toSet
    val brute = hashes.as("a").join(hashes.as("b"), col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        expr("bit_count(a.phash ^ b.phash)").cast("long"))
      .as[(Long, Long, Long)].collect()
      .filter(_._3 <= 3).toSet
    hashes.unpersist()
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    // the corpus plants exact-duplicate texts -> identical thumbnails
    assert(banded.exists(_._3 == 0L), "expected at least one Hamming-0 planted dup pair")
  }

  test("image clusters: union-find replay over the pair graph; planted dups share a cluster; canonical keeps") {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val hashes = Multimodal.phashes(Multimodal.syntheticPpmMedia(docs))
    val universe = hashes.select(col("media_id")).as[Long].collect().sorted
    val pairs = Multimodal.phashNearDupPairs(hashes)
      .select("m1", "m2").as[(Long, Long)].collect()
    // plain-Scala union-find replay (component min canonicality)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = universe.map(m => (m, find(m), find(m) == m)).toSeq
    val got = Multimodal.imageClusters(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == expected, s"cluster replay diverged (first got=${got.headOption})")
    // the planted exact-dup pair (Hamming 0) lands in ONE cluster with
    // exactly one canonical keeper
    val zero = Multimodal.phashNearDupPairs(hashes)
      .filter(col("hamming") === 0L).select("m1", "m2").as[(Long, Long)].collect()
    assert(zero.nonEmpty, "fixture drift: no planted Hamming-0 dup under doc_id < 200")
    val byCluster = got.map(r => r._1 -> r._2).toMap
    zero.foreach { case (a, b) =>
      assert(byCluster(a) == byCluster(b), s"planted dup ($a, $b) split across clusters")
    }
    got.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == c,
        s"cluster $c: keep is not exactly the min-id canonical")
    }
    // non-degenerate: at least one multi-member cluster exists
    assert(got.groupBy(_._2).exists(_._2.length > 1), "no non-singleton cluster")
  }

  test("image channel stats: exact replay from the text bytes through the codec seam") {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .filter { case (_, t) => t.nonEmpty && t.forall(c => c >= 1 && c <= 127) }
    // pixel byte j of each 9x8 thumbnail is text byte (j mod n); the
    // engine reads them back through the REAL PPM decode
    val vals = Array.fill(3)(scala.collection.mutable.ArrayBuffer.empty[Long])
    docs.foreach { case (_, t) =>
      val bytes = t.getBytes("UTF-8")
      for (j <- 0 until 216) vals(j % 3) += (bytes(j % bytes.length) & 0xFF).toLong
    }
    val names = Array("r", "g", "b")
    val expected = (0 until 3).map { c =>
      val v = vals(c)
      val n = v.length.toLong
      val s = v.sum
      val sq = v.map(x => x * x).sum
      val std = math.floor(math.sqrt((n * sq - s * s).toDouble) * 1000000e0 / n + 0.5).toLong
      (names(c), n, s, s * 1000000L / n, std, v.min, v.max)
    }.sortBy(_._1)
    val got = Multimodal.imageChannelStats(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"channel stats diverged (got=${got.headOption})")
    // byte values are genuinely spread (a constant channel would make
    // the drift check vacuous)
    got.foreach { r => assert(r._5 > 0 && r._7 > r._6, s"degenerate channel ${r._1}") }
  }
}
