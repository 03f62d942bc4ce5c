package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("attach + decode roundtrip recovers every metadata field") {
    val docs = wh.loadTable("documents")
    val decoded = Multimodal.decodeMeta(
      Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media")
    val bad = decoded
      .filter(col("width") =!= (lit(32) + col("id") % 64) ||
        col("height") =!= (lit(32) + (col("id") * 7) % 64) ||
        col("payload_bytes") =!= col("n_bytes") - 5)
      .count()
    assert(bad === 0)
    assert(decoded.count() === docs.count())
  }

  test("unknown container degrades to size-only metadata, not a failure") {
    val df = Seq((1L, "not a media container")).toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
    val r = Multimodal.decodeMeta(df, "id", "media").collect()(0)
    assert(r.isNullAt(r.fieldIndex("width")))
    assert(r.getLong(r.fieldIndex("n_bytes")) === 21L)
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val docs = wh.loadTable("documents").limit(30)
    val out = Multimodal.resizeMeta(
      Multimodal.decodeMeta(
        Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media"),
      maxW = 48, maxH = 48)
    out.collect().foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (tw, th) = (r.getAs[Long]("target_width"), r.getAs[Long]("target_height"))
      assert(tw <= 48 && th <= 48)
      assert(tw <= w && th <= h, "upscaled")
      // floor() can land the binding dimension one below the box edge
      if (w > 48 || h > 48) assert(tw >= 47 || th >= 47, "did not fill the box")
    }
  }

  test("sampleFramesMeta picks k evenly spaced frames, all frames when short") {
    val df = Seq((1L, 100L), (2L, 3L), (3L, 0L)).toDF("id", "n_frames")
    val out = Multimodal.sampleFramesMeta(df, "n_frames", 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("frame_indices"))).toMap
    assert(out(1L) === Seq(0L, 20L, 40L, 60L, 80L))
    assert(out(2L) === Seq(0L, 1L, 2L))
    assert(out(3L).isEmpty)
  }

  test("real ImageIO decode recovers planted dims and exact channel means (png, bmp)") {
    val docs = wh.loadTable("documents").limit(24)
    for (fmt <- Seq("png", "bmp")) { // lossless formats: stats must be exact
      val out = Multimodal.decodeImage(
        Multimodal.attachImage(docs, "doc_id", fmt), "id", "media")
        .collect().map(r => r.getAs[Long]("id") -> r).toMap
      assert(out.nonEmpty)
      out.foreach { case (id, r) =>
        val (w, h) = Multimodal.plantedDims(id)
        assert(r.getAs[Long]("width") === w.toLong)
        assert(r.getAs[Long]("height") === h.toLong)
        assert(r.getAs[String]("format") === fmt)
        // closed-form means: r varies only with x, g only with y
        val er = (0 until w).map(x => (x * 7 + id) % 256).sum.toDouble / w
        val eg = (0 until h).map(y => (y * 11 + id) % 256).sum.toDouble / h
        val eb = (for (x <- 0 until w; y <- 0 until h) yield (x + y + id) % 256)
          .sum.toDouble / (w.toLong * h)
        assert(r.getAs[Double]("mean_r") === er, s"mean_r id=$id fmt=$fmt")
        assert(r.getAs[Double]("mean_g") === eg, s"mean_g id=$id fmt=$fmt")
        assert(r.getAs[Double]("mean_b") === eb, s"mean_b id=$id fmt=$fmt")
      }
    }
  }

  test("ImageIO decode sniffs jpeg/gif and survives undecodable bytes") {
    val docs = wh.loadTable("documents").limit(8)
    for (fmt <- Seq("jpg", "gif")) { // lossy paths: dims + format survive
      val out = Multimodal.decodeImage(
        Multimodal.attachImage(docs, "doc_id", fmt), "id", "media")
        .collect()
      out.foreach { r =>
        val id = r.getAs[Long]("id")
        val (w, h) = Multimodal.plantedDims(id)
        assert(r.getAs[Long]("width") === w.toLong)
        assert(r.getAs[Long]("height") === h.toLong)
        assert(r.getAs[String]("format") === (if (fmt == "jpg") "jpeg" else fmt))
      }
    }
    val junk = Seq((1L, "definitely not an image")).toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
    val r = Multimodal.decodeImage(junk, "id", "media").collect()(0)
    assert(r.isNullAt(r.fieldIndex("width")))
    assert(r.getAs[Long]("n_bytes") === 23L)
  }

  test("real resize: decode → nearest-neighbor resample → re-encode → decode is exact") {
    val docs = wh.loadTable("documents").limit(16)
    val out = Multimodal.decodeImage(
      Multimodal.resizeImage(
        Multimodal.attachImage(docs, "doc_id"), "id", "media", maxW = 12, maxH = 12),
      "id", "media")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val (w, h) = Multimodal.plantedDims(id)
      val scale = math.min(math.min(12.0 / w, 12.0 / h), 1.0)
      val tw = math.max(1, math.floor(w * scale).toInt)
      val th = math.max(1, math.floor(h * scale).toInt)
      assert(r.getAs[Long]("width") === tw.toLong, s"width id=$id")
      assert(r.getAs[Long]("height") === th.toLong, s"height id=$id")
      assert(r.getAs[String]("format") === "png")
      def sx(x: Int) = (x.toLong * w / tw).toInt
      def sy(y: Int) = (y.toLong * h / th).toInt
      val er = (0 until tw).map(x => (sx(x) * 7 + id) % 256).sum.toDouble / tw
      val eb = (for (x <- 0 until tw; y <- 0 until th) yield (sx(x) + sy(y) + id) % 256)
        .sum.toDouble / (tw.toLong * th)
      assert(r.getAs[Double]("mean_r") === er, s"mean_r id=$id")
      assert(r.getAs[Double]("mean_b") === eb, s"mean_b id=$id")
    }
  }

  test("multi-page TIFF clip: frame count, sampled indices, and per-frame stats are exact") {
    val docs = wh.loadTable("documents").limit(12)
    val out = Multimodal.decodeFrames(
      Multimodal.attachTiffClip(docs, "doc_id"), "id", "media", k = 4)
      .collect().groupBy(_.getAs[Long]("id"))
    assert(out.nonEmpty)
    out.foreach { case (id, rows) =>
      val n = Multimodal.plantedFrameCount(id)
      val expectIdx =
        if (n <= 4) (0 until n).map(_.toLong)
        else (0 until 4).map(i => i.toLong * n / 4)
      assert(rows.map(_.getAs[Long]("frame_idx")).sorted.toSeq === expectIdx,
        s"sampled indices id=$id n=$n")
      rows.foreach { r =>
        val fi = r.getAs[Long]("frame_idx").toInt
        val (w, h) = Multimodal.plantedDims(id)
        assert(r.getAs[Long]("n_frames") === n.toLong)
        assert(r.getAs[Long]("width") === w.toLong)
        assert(r.getAs[Long]("height") === h.toLong)
        // frame-dependent formula: a decoder returning frame 0 for every
        // index would fail here
        val er = (0 until w).map(x => (x * 7 + id + 13L * fi) % 256).sum.toDouble / w
        assert(r.getAs[Double]("mean_r") === er, s"mean_r id=$id f=$fi")
      }
    }
    val junk = Seq((3L, "not a tiff")).toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
    assert(Multimodal.decodeFrames(junk, "id", "media", k = 4).count() === 0)
  }

  test("real WAV decode recovers format and exact amplitude stats; junk degrades") {
    val docs = wh.loadTable("documents").limit(16)
    val out = Multimodal.decodeAudio(
      Multimodal.attachWav(docs, "doc_id"), "id", "media")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val samples = Multimodal.plantedSamples(id)
      assert(r.getAs[Long]("sample_rate") === 8000L)
      assert(r.getAs[Long]("channels") === 1L)
      assert(r.getAs[Long]("n_frames") === samples.length.toLong)
      val sumAbs = samples.map(s => math.abs(s.toLong)).sum
      assert(r.getAs[Double]("mean_abs_ch0") === sumAbs.toDouble / samples.length)
      assert(r.getAs[Long]("peak_ch0") === samples.map(s => math.abs(s.toLong)).max)
    }
    val junk = Seq((7L, "certainly not audio data here")).toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
    val r = Multimodal.decodeAudio(junk, "id", "media").collect()(0)
    assert(r.isNullAt(r.fieldIndex("sample_rate")))
    assert(r.getAs[Long]("n_bytes") === 29L)
  }

  test("imageDHash is deterministic, format-invariant for lossless codecs, null on junk") {
    val spark2 = spark
    import spark2.implicits._
    val ids = (0L to 9L).toDF("doc_id")
    def hashes(fmt: String) = Multimodal.imageDHash(
        Multimodal.attachImage(ids, "doc_id", fmt), "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val png = hashes("png")
    assert(png === hashes("png"), "re-run must reproduce identical hashes")
    // BMP is lossless too: identical pixels ⇒ identical perceptual hash
    assert(png === hashes("bmp"))
    // undecodable bytes degrade to a NULL hash
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    assert(Multimodal.imageDHash(junk, "doc_id", "media")
      .filter(col("dhash").isNull).count() === 1)
  }

  test("imageNearDup surfaces identical-image clones via hamming blocking") {
    val spark2 = spark
    import spark2.implicits._
    // fixture encoder is periodic mod 768: id and id + 768 are the SAME
    // image — every (i, i+768) pair must appear at hamming 0
    val ids = ((0L to 7L) ++ (0L to 7L).map(_ + 768L)).toDF("doc_id")
    val got = Multimodal.imageNearDup(
        Multimodal.attachImage(ids, "doc_id"), "id", "media", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    (0L to 7L).foreach { i =>
      assert(got.contains((i, i + 768L, 0L)), s"planted pair $i missing")
    }
  }

  test("audioFingerprint is deterministic; near-dup surfaces identical-clip clones") {
    val spark2 = spark
    import spark2.implicits._
    // the waveform generator's true period: sample values are id*11 mod
    // 2^16 and clip length id mod 64, so id + 65536 is the identical clip
    val ids = ((0L to 7L) ++ (0L to 7L).map(_ + 65536L)).toDF("doc_id")
    def fps() = Multimodal.audioFingerprint(
        Multimodal.attachWav(ids, "doc_id"), "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = fps()
    assert(a === fps(), "re-run must reproduce identical fingerprints")
    (0L to 7L).foreach(i => assert(a(i) === a(i + 65536L), s"clone $i"))
    val got = Multimodal.audioNearDup(
        Multimodal.attachWav(ids, "doc_id"), "id", "media", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L to 7L).foreach(i => assert(got.contains((i, i + 65536L)), s"pair $i"))
    // junk bytes degrade to a NULL fingerprint
    val junk = Seq((1L, Array[Byte](9, 9, 9))).toDF("doc_id", "media")
    assert(Multimodal.audioFingerprint(junk, "doc_id", "media")
      .filter(col("afp").isNull).count() === 1)
  }

  test("videoFingerprint: majority of sampled-frame dHashes, clone-stable, null on junk") {
    val ids = (0L to 7L).toDF("doc_id")
    val clips = Multimodal.attachTiffClip(
      ids.unionByName(ids.select((col("doc_id") + 76800L).as("doc_id"))), "doc_id")
    def fps(): Map[Long, Long] =
      Multimodal.videoFingerprint(clips, "id", "media", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = fps()
    assert(a === fps(), "re-run must reproduce identical fingerprints")
    (0L to 7L).foreach(i => assert(a(i) === a(i + 76800L), s"clone $i"))

    // expected vhash from first principles: dHash each sampled frame via
    // the lossless PNG path, majority-vote the bits
    (0L to 7L).foreach { id =>
      val n = Multimodal.plantedFrameCount(id)
      val idxs = if (n <= 4) 0 until n else (0 until 4).map(i => i * n / 4)
      val frames = idxs.zipWithIndex.map { case (fi, j) =>
        val png = {
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(Multimodal.plantedFrame(id, fi), "png", bos)
          bos.toByteArray
        }
        (j.toLong, png)
      }
      val hs = Multimodal.imageDHash(
          frames.toDF("doc_id", "media"), "doc_id", "media")
        .collect().map(_.getLong(1))
      var want = 0L
      (0 until 64).foreach { b =>
        if (2 * hs.count(h => ((h >>> b) & 1L) == 1L) > hs.length) want |= 1L << b
      }
      assert(a(id) === want, s"vhash of clip $id")
    }

    val junk = Seq((1L, Array[Byte](7, 7, 7))).toDF("doc_id", "media")
    assert(Multimodal.videoFingerprint(junk, "doc_id", "media")
      .filter(col("vhash").isNull).count() === 1)

    val got = Multimodal.videoNearDup(clips, "id", "media", k = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L to 7L).foreach(i => assert(got.contains((i, i + 76800L)), s"pair $i"))
  }

  test("mapBinaryBatches streams partition batches through the decoder fn") {
    val docs = wh.loadTable("documents").limit(10)
    val out = Multimodal.mapBinaryBatches(
      Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))) {
      batch => batch.map { case (id, bytes) => org.apache.spark.sql.Row(id, bytes.length.toLong) }
    }
    assert(out.count() === 10)
    assert(out.filter(col("n") <= 5).count() === 0)
  }
}
