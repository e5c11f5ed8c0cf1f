package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * batch-shaped per-partition transforms.
  *
  * The actual codec step is a clearly marked STUB (no image/audio libraries
  * in this container): `decodeStub` derives deterministic fake metadata
  * from the bytes. Everything around it — the schema contract, the
  * mapPartitions batch shape, partition sizing, the feature pipeline — is
  * real and tested; swapping the stub for a JNI/javacv decoder changes one
  * function.
  *
  * Scale notes: payload columns dominate row width, so operators here
  * project the payload away as early as possible (metadata-only outputs),
  * and `withBinaryPartitioning` resizes partitions by payload bytes, not
  * row count — the knob that keeps executor memory flat at 100 TB.
  */
object Multimodal {

  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("media_type", StringType)    // image | audio | video
    .add("payload", BinaryType)
    .add("meta", new StructType()
      .add("format", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("n_frames", IntegerType))

  /** Decode metadata. Real path first: `javax.imageio` (JDK built-in)
    * handles PNG/JPEG/GIF/BMP — no external libraries needed. Payloads
    * ImageIO cannot read (video/audio/exotic codecs — their libs are NOT in
    * this container) fall back to the deterministic STUB so the pipeline
    * shape stays exercised end-to-end; swap the fallback for a JNI/javacv
    * decoder without touching callers.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Int) = {
    if (payload == null || payload.isEmpty) return ("empty", 0, 0, 0)
    decodeImage(payload)
      // audio rides the same (format, w, h, frames) slots as
      // (format, sampleRateHz, channels, nFrames)
      .orElse(decodeAudio(payload))
      .getOrElse {
        val h = java.util.Arrays.hashCode(payload)
        // floorMod: math.abs(Int.MinValue) is negative — abs%n can throw/skew
        val fmt = Seq("png", "jpeg", "webp")(math.floorMod(h, 3))
        val w = 64 + math.floorMod(h, 1024)
        val ht = 64 + math.floorMod(h / 1024, 1024)
        (s"stub_$fmt", w, ht, 1 + math.floorMod(h, 300))
      }
  }

  /** Real image decode via ImageIO: (format, width, height, n_frames=1). */
  def decodeImage(payload: Array[Byte]): Option[(String, Int, Int, Int)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0), math.max(1, r.getNumImages(true))))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally in.close()
  }

  /** Real audio decode via `javax.sound.sampled` (JDK built-in: WAV/AIFF/
    * AU): (format, sampleRateHz, channels, nFrames). Compressed codecs
    * (mp3/ogg) have no in-container library → None → stub fallback.
    */
  def decodeAudio(payload: Array[Byte]): Option[(String, Int, Int, Int)] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val fileFmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        Some((fileFmt.getType.toString.toLowerCase(java.util.Locale.ROOT),
          fmt.getSampleRate.toInt, fmt.getChannels,
          math.max(1, in.getFrameLength.toInt)))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Real image resize via ImageIO + Graphics2D: clamp the longer edge to
    * `maxEdge`, re-encode as PNG. Non-image payloads pass through.
    */
  def resizeImage(payload: Array[Byte], maxEdge: Int): Array[Byte] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) payload
      else {
        val scale = math.min(1.0, maxEdge.toDouble / math.max(img.getWidth, img.getHeight))
        if (scale >= 1.0) payload
        else {
          val w = math.max(1, math.ceil(img.getWidth * scale).toInt)
          val h = math.max(1, math.ceil(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH),
            0, 0, null)
          finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    } catch { case _: Exception => payload }
  }

  /** Attach decoded metadata (mapPartitions batch shape: one decoder
    * instance per partition, rows streamed through it).
    */
  def decode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val out = new StructType()
      .add("media_id", LongType)
      .add("format", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("n_frames", IntegerType)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { rows =>
      // real decoders are expensive to construct — do it once per partition
      rows.map { r =>
        val (fmt, w, h, f) = decodeStub(r.getAs[Array[Byte]](pIdx))
        Row(r.getLong(idIdx), fmt, w, h, f)
      }
    }(Encoders.row(out))
  }

  /** Byte-histogram feature vector (16 bins, L1-normalized) — the
    * deterministic stand-in for an embedding-model feature extractor;
    * returns (id, features array<float>) with the payload projected away.
    */
  def featureExtract(df: DataFrame, idCol: String, payloadCol: String,
                     bins: Int = 16): DataFrame = {
    val extract = udf { bytes: Array[Byte] =>
      val h = new Array[Float](bins)
      if (bytes != null && bytes.nonEmpty) {
        bytes.foreach(b => h((b & 0xFF) * bins / 256) += 1f)
        val n = bytes.length.toFloat
        (0 until bins).foreach(i => h(i) /= n)
      }
      h.toSeq
    }
    df.select(col(idCol), extract(col(payloadCol)).as("features"))
  }

  /** Frame sampling for video-shaped rows: keep every `stride`-th frame
    * index up to the decoded frame count (metadata-level; a real
    * implementation emits one payload slice per kept frame).
    */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("media_id"),
      // empty/undecodable payloads decode to n_frames=0; sequence(0,-1,s)
      // throws at runtime, so zero-frame rows emit no frames instead
      explode(when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>"))).as("frame_idx"))

  /** Resize spec (metadata transform — the payload op is the stub's job):
    * clamp the longer edge to `maxEdge` preserving aspect ratio.
    */
  def resizeSpec(decoded: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxEdge) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Repartition by accumulated payload size so each partition carries at
    * most ~`targetBytes` of media (row-count partitioning is wrong for
    * fat binary columns).
    */
  def withBinaryPartitioning(df: DataFrame, payloadCol: String,
                             targetBytes: Long): DataFrame = {
    val totalBytes = df.agg(sum(length(col(payloadCol)))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val nPart = math.max(1, math.min(10000, (totalBytes / targetBytes).toInt + 1))
    df.repartition(nPart)
  }

  /** Perceptual image signature: 64-bit average-hash (downscale to 8×8
    * luma, bit i set when pixel i is above the mean) PLUS the quantized
    * mean itself. The mean matters: every flat/low-contrast image has
    * average-hash 0 regardless of color — a white frame and a black frame
    * must not collide, and the bit pattern alone can't separate them.
    * Non-decodable payloads → None.
    */
  def averageHash(payload: Array[Byte]): Option[(Long, Int)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val small = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        try g.drawImage(img.getScaledInstance(8, 8, java.awt.Image.SCALE_AREA_AVERAGING),
          0, 0, null)
        finally g.dispose()
        val luma = Array.tabulate(64) { i =>
          val rgb = small.getRGB(i % 8, i / 8)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        val mean = luma.sum / 64
        var h = 0L
        var i = 0
        while (i < 64) { if (luma(i) > mean) h |= (1L << i); i += 1 }
        Some((h, mean))
      }
    } catch { case _: Exception => None }
  }

  /** Perceptual image dedup groups: group on the 64-bit average-hash, with
    * the luma mean joining the key ONLY for degenerate bit patterns (a
    * uniform image has no pixel above its own mean → hash 0 for every flat
    * color; the mean is what separates flat white from flat black). For
    * non-degenerate images the hash alone groups, so a downscale/re-encode
    * whose mean drifts ±1 still matches. Tolerance to lossy re-encodes that
    * flip hash BITS needs the banded pairwise path
    * (`DedupOps.simhashPairs` shape). One narrow decode pass + one
    * hash-groupBy — the payload bytes never shuffle.
    */
  def imageDupGroups(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val ah = udf { payload: Array[Byte] =>
      if (payload == null) None else averageHash(payload)
    }
    df.select(col(idCol), ah(col(payloadCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col(idCol), col("sig._1").as("ahash"),
        when(col("sig._1") === 0L, col("sig._2")).otherwise(lit(-1))
          .as("mean_luma"))
      .groupBy(col("ahash"), col("mean_luma"))
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).cast("long").as("n_dups"),
        sort_array(collect_list(col(idCol))).as("members"))
      .filter(col("n_dups") > 1)
  }

  /** Amplitude-envelope audio fingerprint: decode WAV PCM (16-bit signed
    * little-endian, mono or stereo downmixed — pure JDK javax.sound, no
    * native codecs), split the sample stream into 16 equal segments,
    * take each segment's mean |amplitude|, and quantize every segment to
    * 4 bits RELATIVE to the loudest segment — 64 bits total. All math is
    * integer (Long sums, `floor(m·15/M)`), so the fingerprint is
    * deterministic AND exactly invariant under integer volume scaling
    * (the ratio m/M is preserved: floor(c·m·15/(c·M)) = floor(m·15/M)) —
    * re-leveled copies of the same clip collide, different content does
    * not. None for undecodable/non-16-bit payloads and silent clips
    * carry fingerprint 0.
    */
  def audioEnvelopeHash(payload: Array[Byte], segments: Int = 16): Option[Long] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val nFrames = bytes.length / 2 / ch
        if (nFrames < segments) return None
        val sums = new Array[Long](segments)
        val counts = new Array[Long](segments)
        var i = 0
        while (i < nFrames) {
          val seg = (i.toLong * segments / nFrames).toInt
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            sums(seg) += math.abs(s.toLong)
            c += 1
          }
          counts(seg) += ch
          i += 1
        }
        // loudest segment by RATIONAL mean (cross-multiplied — no integer
        // division anywhere, so integer volume scaling cancels exactly)
        var mi = 0
        var s = 1
        while (s < segments) {
          if (BigInt(sums(s)) * counts(mi) > BigInt(sums(mi)) * counts(s)) mi = s
          s += 1
        }
        var fp = 0L
        s = 0
        while (s < segments) {
          val q = if (sums(mi) == 0) 0L
            else (BigInt(sums(s)) * 15 * counts(mi)
              / (BigInt(sums(mi)) * counts(s))).toLong
          fp = (fp << 4) | q
          s += 1
        }
        Some(fp)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Audio dedup groups by [[audioEnvelopeHash]] — the audio counterpart
    * of [[imageDupGroups]]: one narrow decode pass, only (id, 8-byte
    * fingerprint) rows shuffle (payload bytes never leave their scan
    * partition), hash-groupBy keyed on the fingerprint, groups of ≥2
    * reported with the minimum id as keeper. Volume-rescaled copies
    * group together by the envelope's scale invariance.
    */
  def audioDupGroups(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val fp = udf { payload: Array[Byte] =>
      if (payload == null) None else audioEnvelopeHash(payload)
    }
    df.select(col(idCol), fp(col(payloadCol)).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).cast("long").as("n_dups"),
        sort_array(collect_list(col(idCol))).as("members"))
      .filter(col("n_dups") > 1)
  }

  /** Perceptual NEAR-dup image pairs: average-hash signatures joined by
    * the banded Hamming path ([[DedupOps.hammingPairs]], ≤ `maxDist` bit
    * flips — tolerant of lossy re-encodes that flip hash bits, which the
    * exact [[imageDupGroups]] key cannot be). Degenerate flat images
    * (hash 0 — every uniform color) carry no bit structure, so they pair
    * only on exact quantized-mean equality, never through the bands.
    * One narrow decode pass; only (id, 8-byte hash) rows shuffle.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxDist: Int = 3): DataFrame = {
    val ah = udf { payload: Array[Byte] =>
      if (payload == null) None else averageHash(payload)
    }
    val sigs = df.select(col(idCol), ah(col(payloadCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col(idCol), col("sig._1").as("ahash"),
        col("sig._2").as("mean_luma"))
      .cache()
    val banded = DedupOps.hammingPairs(
      sigs.filter(col("ahash") =!= 0L), idCol, "ahash", maxDist)
    val deg = sigs.filter(col("ahash") === 0L)
    val degPairs = deg.select(col(idCol).as("id_a"), col("mean_luma"))
      .join(deg.select(col(idCol).as("id_b"), col("mean_luma")),
        Seq("mean_luma"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    DedupOps.materializeAndRelease(banded.unionByName(degPairs), sigs)
  }
}
