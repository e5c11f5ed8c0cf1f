package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** Synthesize a binary media table from documents (payload = utf8 bytes —
    * opaque to the pipeline, which is the point).
    */
  private def media = Tables(spark, sf, "documents")
    .select(col("doc_id").as("media_id"),
      lit("image").as("media_type"),
      col("text").cast("binary").as("payload"))

  test("decode stub attaches deterministic metadata per row") {
    val d1 = Multimodal.decode(media, "media_id", "payload")
    val d2 = Multimodal.decode(media, "media_id", "payload")
    assert(d1.count() == media.count())
    assert(d1.exceptAll(d2).count() == 0) // deterministic
    val row = d1.filter(col("media_id") === 0).collect()(0)
    // text payloads aren't images → stub fallback, tagged as such
    assert(Set("stub_png", "stub_jpeg", "stub_webp").contains(row.getAs[String]("format")))
    assert(row.getAs[Int]("width") >= 64)
  }

  test("feature extraction: L1-normalized 16-bin histogram, payload pruned") {
    val f = Multimodal.featureExtract(media, "media_id", "payload")
    assert(f.columns.toSeq == Seq("media_id", "features"))
    val feats = f.filter(col("media_id") === 0).collect()(0)
      .getAs[scala.collection.Seq[Float]]("features")
    assert(feats.size == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
  }

  test("frame sampling keeps every stride-th frame") {
    val decoded = Multimodal.decode(media, "media_id", "payload")
    val frames = Multimodal.frameSample(decoded, stride = 10)
    val one = decoded.filter(col("media_id") === 0).collect()(0)
    val expected = (0 until one.getAs[Int]("n_frames") by 10).size
    assert(frames.filter(col("media_id") === 0).count() == expected)
  }

  test("frame sampling tolerates zero-frame (empty payload) rows") {
    import spark.implicits._
    val withEmpty = Seq(
      (1L, Array.empty[Byte]),            // decodes to n_frames = 0
      (2L, "some video bytes".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val decoded = Multimodal.decode(withEmpty, "media_id", "payload")
    val frames = Multimodal.frameSample(decoded, stride = 10).collect()
    assert(!frames.exists(_.getLong(0) == 1L)) // no frames, no crash
    assert(frames.exists(_.getLong(0) == 2L))
  }

  test("resize spec clamps longer edge preserving aspect") {
    val decoded = Multimodal.decode(media, "media_id", "payload")
    val resized = Multimodal.resizeSpec(decoded, maxEdge = 256)
    resized.collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(w <= 256 || h <= 256)
      assert(math.max(w, h) <= 256 ||
        math.max(r.getAs[Int]("width"), r.getAs[Int]("height")) <= 256)
    }
  }

  test("golden media fixture decodes row-exactly to the Python-computed expectations") {
    // tools/make_media_fixture.py wrote the payloads (stdlib PNG/WAV
    // encoders + opaque blobs) AND the expected decode columns; the JVM
    // decoders must reproduce every row, not just the q55 aggregate
    val fixture = spark.read.parquet(Fixtures.golden("media.parquet"))
    val decoded = Multimodal.decode(fixture, "media_id", "payload")
    val feats = Multimodal.featureExtract(fixture, "media_id", "payload")
    val joined = decoded.join(feats, "media_id").join(fixture, "media_id")
    assert(joined.count() == 60)
    val bad = joined.filter(
      col("format") =!= col("exp_format") ||
      col("width") =!= col("exp_width") ||
      col("height") =!= col("exp_height") ||
      col("n_frames") =!= col("exp_n_frames") ||
      abs(element_at(col("features"), 1).cast("double") - col("exp_bin0")) > 1e-9)
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }

  test("real PNG payloads decode with true dimensions via ImageIO") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 1000))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((1L, png(320, 200)), (2L, png(64, 64)))
      .toDF("media_id", "payload")
    val decoded = Multimodal.decode(df, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(decoded(1L).getAs[String]("format") == "png")
    assert(decoded(1L).getAs[Int]("width") == 320)
    assert(decoded(1L).getAs[Int]("height") == 200)
    assert(decoded(2L).getAs[Int]("width") == 64)
    // non-image payloads fall back to the stub (tagged as such)
    val stub = Multimodal.decode(
      Seq((3L, "not an image".getBytes("UTF-8"))).toDF("media_id", "payload"),
      "media_id", "payload").collect()(0)
    assert(stub.getAs[String]("format").startsWith("stub_"))
  }

  test("real WAV payloads decode sample rate, channels, frames") {
    // synthesize a 0.5s 8kHz mono WAV in memory
    val rate = 8000f
    val n = 4000
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (math.sin(i * 0.05) * 16000).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = Multimodal.decodeAudio(bos.toByteArray)
    assert(decoded.isDefined)
    val (f, sr, ch, frames) = decoded.get
    assert(f == "wave")
    assert(sr == 8000)
    assert(ch == 1)
    assert(frames == 4000)
    assert(Multimodal.decodeAudio("noise".getBytes("UTF-8")).isEmpty)
  }

  test("audio envelope dedup: volume-scaled copies group, content differs") {
    import spark.implicits._
    def wav(gen: Int => Int): Array[Byte] = {
      val n = 4000
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = gen(i)
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // a clip with a loud first half, its exactly-doubled-volume copy
    // (no clipping), and a different shape (loud SECOND half)
    def frontLoaded(scale: Int)(i: Int): Int =
      if (i < 2000) (math.sin(i * 0.05) * 4000).toInt * scale else 0
    def backLoaded(i: Int): Int =
      if (i >= 2000) (math.sin(i * 0.05) * 8000).toInt else 0
    val base = wav(frontLoaded(1))
    val loud = wav(frontLoaded(2))
    val other = wav(backLoaded)
    // exact invariance under integer volume scaling
    assert(Multimodal.audioEnvelopeHash(base) ===
      Multimodal.audioEnvelopeHash(loud))
    assert(Multimodal.audioEnvelopeHash(base) !==
      Multimodal.audioEnvelopeHash(other))
    assert(Multimodal.audioEnvelopeHash("noise".getBytes("UTF-8")).isEmpty)
    val groups = Multimodal.audioDupGroups(
      Seq((1L, base), (2L, loud), (3L, other), (4L, "x".getBytes("UTF-8")))
        .toDF("media_id", "payload"),
      "media_id", "payload").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keeper") == 1L)
    assert(groups(0).getSeq[Long](3).toSeq == Seq(1L, 2L))
  }

  test("real image resize clamps the longer edge") {
    val img = new java.awt.image.BufferedImage(400, 100,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val resized = Multimodal.resizeImage(bos.toByteArray, maxEdge = 200)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 200)
    assert(back.getHeight == 50)
    // already-small images pass through untouched
    val small = Multimodal.resizeImage(bos.toByteArray, maxEdge = 1000)
    assert(small.sameElements(bos.toByteArray))
  }

  test("binary-size partitioning bounds bytes per partition") {
    val parted = Multimodal.withBinaryPartitioning(media, "payload",
      targetBytes = 20000)
    assert(parted.rdd.getNumPartitions >= 2)
  }

  test("perceptual dedup groups re-encoded duplicates, keeps distinct images") {
    import spark.implicits._
    def gradient(w: Int, h: Int, flip: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = if (flip) 255 - (255 * x / w) else 255 * x / w
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def flat(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, rgb)
      enc(img, "png")
    }
    val a = gradient(128, 96, flip = false)
    val rows = Seq(
      1L -> enc(a, "png"),
      2L -> enc(a, "bmp"), // same pixels, different container
      3L -> Multimodal.resizeImage(enc(a, "png"), maxEdge = 64), // downscaled
      4L -> enc(gradient(128, 96, flip = true), "png"), // visually distinct
      5L -> Array[Byte](1, 2, 3), // not an image: ignored
      6L -> flat(0xffffff), // flat white: ahash bits all 0...
      7L -> flat(0x000000)) // ...and so is flat black — must NOT group
    val groups = Multimodal.imageDupGroups(rows.toDF("media_id", "payload"),
      "media_id", "payload").collect()
    assert(groups.length == 1, groups.mkString(";"))
    val members = groups(0).getAs[scala.collection.Seq[Long]]("members")
    assert(members.contains(1L) && members.contains(2L), members)
    // the downscale shares the 8×8 hash; mean drift must not split it out
    assert(members.contains(3L), members)
    assert(!members.contains(4L) && !members.contains(5L))
    assert(!members.contains(6L) && !members.contains(7L), members)
    assert(groups(0).getAs[Long]("keeper") == 1L)
  }

  test("perceptual near-dup pairs tolerate bit flips; flats pair by mean only") {
    import spark.implicits._
    def gradient(flip: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(128, 96,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 128; y <- 0 until 96) {
        val v = if (flip) 255 - (255 * x / 128) else 255 * x / 128
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def flat(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, rgb)
      enc(img)
    }
    // blemish ONE 8×8-grid cell: exactly one ahash bit flips (the cell
    // turns white) and the global mean moves ~4 luma — well inside the
    // ~32-luma margin between the gradient's cell values and the mean,
    // so no other bit follows. The exact-group path would split these.
    val near = gradient(flip = false)
    for (x <- 0 until 16; y <- 0 until 12) near.setRGB(x, y, 0xffffff)
    val rows = Seq(
      1L -> enc(gradient(flip = false)),
      2L -> enc(near),                    // ≤3 bit flips -> pairs with 1
      3L -> enc(gradient(flip = true)),   // visually inverted -> no pair
      4L -> flat(0xffffff), 5L -> flat(0xffffff), // identical flats pair
      6L -> flat(0x000000),               // flat black: hash 0 too, mean 0
      7L -> Array[Byte](9, 9, 9))         // not an image: ignored
    val pairs = Multimodal.imageNearDupPairs(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (4L, 5L)),
      pairs.mkString(";"))
    assert(pairs.forall(_._3 <= 3), pairs.mkString(";"))
  }
}
