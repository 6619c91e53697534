package graft

import org.apache.spark.sql.Row
import graft.engine.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, Array[Byte])*) = {
    val data = rows.map { case (id, mt, bytes) =>
      Row(id, mt, bytes, Row("synthetic", 100, 50, 1000L))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2),
      Multimodal.mediaSchema)
  }

  test("featurize emits the contracted schema with deterministic features") {
    val df = media((1L, "image", "hello world".getBytes("UTF-8")),
      (2L, "audio", Array[Byte](1, 2, 3)))
    val out = Multimodal.featurize(df)
    assert(out.schema == Multimodal.featureSchema)
    val r = out.orderBy("media_id").collect()
    assert(r(0).getAs[Int]("n_bytes") == 11)
    assert(r(0).getAs[String]("content_digest") ==
      // md5("hello world") — stable, engine-independent
      "5eb63bbbe01eeed093cb22bb8f5acdc3")
    val f1 = r(0).getSeq[Float](r(0).fieldIndex("feature"))
    assert(f1.length == 8 && math.abs(f1.sum - 1.0f) < 1e-6)
    // determinism across runs
    val again = Multimodal.featurize(df).orderBy("media_id").collect()
    assert(again(0).getSeq[Float](again(0).fieldIndex("feature")) == f1)
  }

  /** Real PNG bytes: solid `rgb` fill at w×h via the JVM's own encoder. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("featurize REALLY decodes PNG payloads: dims and features come from pixels") {
    val red = png(6, 4, 0xff0000)
    val df = media((1L, "image", red),
      (2L, "image", "not an image at all".getBytes("UTF-8")), // mislabeled
      (3L, "audio", png(2, 2, 0x0000ff))) // image bytes under an audio label
    val out = Multimodal.featurize(df).orderBy("media_id").collect()

    // decoded dims come from the BYTES: 6×4 for the real PNG…
    assert(out(0).getAs[Int]("decoded_width") == 6)
    assert(out(0).getAs[Int]("decoded_height") == 4)
    val f = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    assert(math.abs(f(0) - 1.0f) < 1e-3 && f(1) == 0.0f && f(2) == 0.0f,
      s"solid red must embed as (1,0,0,…): $f")
    assert(math.abs(f(5) - 0.6f) < 1e-6, s"aspect 6/(6+4): $f")
    assert(f(7) == 1.0f, "decoded-flag must be set on the real-codec path")

    // …null for bytes no reader understands (falls back to the stub)…
    assert(out(1).isNullAt(out(1).fieldIndex("decoded_width")))
    val stub = out(1).getSeq[Float](out(1).fieldIndex("feature"))
    assert(math.abs(stub.sum - 1.0f) < 1e-5, "stub path is the byte histogram")

    // …and sniffing trusts bytes, not the media_type label
    assert(out(2).getAs[Int]("decoded_width") == 2)
    val fb = out(2).getSeq[Float](out(2).fieldIndex("feature"))
    assert(math.abs(fb(2) - 1.0f) < 1e-3, s"solid blue under 'audio' label: $fb")
  }

  /** Real WAV bytes: 16-bit signed mono PCM at `rate` Hz — a square wave
    * of amplitude `amp` with period 8 frames — via the JVM's own writer. */
  private def wav(rate: Float, frames: Int, amp: Short): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s: Int = if ((i / 4) % 2 == 0) amp else -amp
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("featurize REALLY decodes WAV payloads: rate, duration and sample stats") {
    val payload = wav(rate = 8000f, frames = 8000, amp = 16384)
    val df = media((1L, "audio", payload),
      (2L, "image", payload), // WAV bytes under an image label still decode
      (3L, "audio", "definitely not audio".getBytes("UTF-8")))
    val out = Multimodal.featurize(df).orderBy("media_id").collect()

    // container facts come from the BYTES: 8 kHz, 8000 frames = 1000 ms
    assert(out(0).getAs[Int]("decoded_sample_rate") == 8000)
    assert(out(0).getAs[Long]("decoded_duration_ms") == 1000L)
    assert(out(0).isNullAt(out(0).fieldIndex("decoded_width")))
    val f = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    // square wave: |sample| is constant, so RMS == peak == amp/32767
    val amp = 16384f / 32767f
    assert(math.abs(f(0) - amp) < 1e-4, s"rms: $f")
    assert(math.abs(f(1) - amp) < 1e-4, s"peak: $f")
    // period-8 square wave: one sign flip per 4 frames
    assert(math.abs(f(2) - 0.25f) < 1e-3, s"zero-crossing rate: $f")
    assert(math.abs(f(3) - 0.5f) < 1e-3, s"zero DC offset maps to 0.5: $f")
    assert(math.abs(f(5) - 8000f / 96000f) < 1e-6, s"rate descriptor: $f")
    assert(f(7) == 1.0f, "decoded-flag must be set on the real-codec path")

    // sniffing trusts bytes, not the media_type label
    assert(out(1).getAs[Int]("decoded_sample_rate") == 8000)
    // …and undecodable payloads fall back to the stub with null audio facts
    assert(out(2).isNullAt(out(2).fieldIndex("decoded_sample_rate")))
    assert(out(2).isNullAt(out(2).fieldIndex("decoded_duration_ms")))
    val stub = out(2).getSeq[Float](out(2).fieldIndex("feature"))
    assert(math.abs(stub.sum - 1.0f) < 1e-5, "stub path is the byte histogram")

    // determinism across runs
    val again = Multimodal.featurize(df).orderBy("media_id").collect()
    assert(again(0).getSeq[Float](again(0).fieldIndex("feature")) == f)
  }

  test("resize REALLY resamples decodable images and re-encodes deterministic PNG") {
    val src = png(8, 8, 0x00ff00)
    val df = media((1L, "image", src))
    val out = Multimodal.resize(df, w = 3, h = 5).collect()
    val bytes = out(0).getAs[Array[Byte]]("content")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "resized payload must itself be a decodable PNG")
    assert(img.getWidth == 3 && img.getHeight == 5)
    assert((img.getRGB(1, 2) & 0xffffff) == 0x00ff00, "solid fill survives resample")
    val meta = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 3 && meta.getAs[Int]("height") == 5)
    // byte-determinism of the re-encode (no timestamps in the PNG writer)
    val again = Multimodal.resize(df, w = 3, h = 5).collect()(0)
      .getAs[Array[Byte]]("content")
    assert(java.util.Arrays.equals(bytes, again))
  }

  /** Real MJPEG-in-AVI bytes via the JVM's own JPEG encoder + a minimal
    * RIFF writer: 'RIFF…AVI ' → LIST hdrl(avih) → LIST movi(00dc×n).
    * This is a genuine container — any MJPEG-capable player reads it. */
  private def avi(frames: Seq[java.awt.image.BufferedImage],
                  usPerFrame: Long): Array[Byte] = {
    def fcc(s: String) = s.getBytes("US-ASCII")
    def u32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]) = {
      val pad: Array[Byte] =
        if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fcc(id) ++ u32(data.length) ++ data ++ pad
    }
    def list(typ: String, data: Array[Byte]) = chunk("LIST", fcc(typ) ++ data)
    val jpegs = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val w = frames.head.getWidth.toLong
    val h = frames.head.getHeight.toLong
    val avih = u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(frames.length) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(w) ++ u32(h) ++
      Array.fill[Byte](16)(0)
    val body = fcc("AVI ") ++ list("hdrl", chunk("avih", avih)) ++
      list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    fcc("RIFF") ++ u32(body.length) ++ body
  }

  /** Solid-fill frame for the AVI fixtures. */
  private def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("featurize REALLY decodes AVI payloads: frame dims, duration, pixel features") {
    // 4 solid-red frames, 16×12, 40 ms each (25 fps) → 160 ms clip
    val clip = avi(Seq.fill(4)(frame(16, 12, 0xff0000)), usPerFrame = 40000L)
    val df = media((1L, "video", clip),
      (2L, "image", clip), // AVI bytes under an image label still decode
      (3L, "video", "definitely not a video".getBytes("UTF-8")))
    val out = Multimodal.featurize(df).orderBy("media_id").collect()

    // container facts come from the BYTES: first-frame dims, avih duration
    assert(out(0).getAs[Int]("decoded_width") == 16)
    assert(out(0).getAs[Int]("decoded_height") == 12)
    assert(out(0).getAs[Long]("decoded_duration_ms") == 160L)
    assert(out(0).isNullAt(out(0).fieldIndex("decoded_sample_rate")))
    val f = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    // JPEG is lossy but solid red survives to ~1 digit
    assert(math.abs(f(0) - 1.0f) < 0.05 && f(1) < 0.1f && f(2) < 0.1f,
      s"solid-red clip must embed as (≈1,≈0,≈0,…): $f")
    assert(f(7) == 1.0f, "decoded-flag must be set on the real-codec path")

    // sniffing trusts bytes, not the media_type label…
    assert(out(1).getAs[Int]("decoded_width") == 16)
    // …and undecodable payloads fall back to the stub with null dims
    assert(out(2).isNullAt(out(2).fieldIndex("decoded_width")))
    val stub = out(2).getSeq[Float](out(2).fieldIndex("feature"))
    assert(math.abs(stub.sum - 1.0f) < 1e-5, "stub path is the byte histogram")

    // determinism across runs
    val again = Multimodal.featurize(df).orderBy("media_id").collect()
    assert(again(0).getSeq[Float](again(0).fieldIndex("feature")) == f)
  }

  test("sampleFrames emits REAL evenly-spaced frames from AVI payloads") {
    // 6 frames with distinct fills so frame identity is observable
    val fills = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff, 0xff00ff)
    val clip = avi(fills.map(frame(8, 8, _)), usPerFrame = 40000L)
    val df = media((1L, "video", clip))
    val out = Multimodal.sampleFrames(df, k = 3).orderBy("frame_index").collect()
    assert(out.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 2, 4),
      "k=3 over 6 frames samples stream positions 0, 2, 4")
    out.zip(Seq(0xff0000, 0x0000ff, 0x00ffff)).foreach { case (r, rgb) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img != null, "sampled frame must be a decodable JPEG")
      assert(img.getWidth == 8 && img.getHeight == 8)
      val p = img.getRGB(4, 4)
      def d(a: Int, b: Int) = math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
        math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
        math.abs((a & 0xff) - (b & 0xff))
      assert(d(p, rgb) < 60, f"frame fill survives JPEG: got ${p & 0xffffff}%06x want $rgb%06x")
    }
  }

  test("featurize batches within partitions (batch boundary has no effect)") {
    val rows = (1L to 100L).map(i => (i, "image", Array.fill(10)(i.toByte)))
    val small = Multimodal.featurize(media(rows: _*), batchSize = 7).orderBy("media_id").collect()
    val large = Multimodal.featurize(media(rows: _*), batchSize = 64).orderBy("media_id").collect()
    assert(small.toSeq == large.toSeq)
    assert(small.length == 100)
  }

  test("featurize handles null and empty payloads") {
    val df = media((1L, "image", Array.emptyByteArray), (2L, "image", null))
    val out = Multimodal.featurize(df).orderBy("media_id").collect()
    assert(out.forall(_.getAs[Int]("n_bytes") == 0))
    assert(out.forall(r => r.getSeq[Float](r.fieldIndex("feature")).length == 8))
  }

  test("sampleFrames fans each video into k covering slices") {
    val bytes = (0 until 10).map(_.toByte).toArray
    val df = media((1L, "video", bytes), (2L, "image", bytes))
    val out = Multimodal.sampleFrames(df, k = 3).orderBy("media_id", "frame_index").collect()
    assert(out.length == 3) // image rows excluded
    val slices = out.map(_.getAs[Array[Byte]]("frame_bytes"))
    assert(slices.map(_.length).sum == 10) // slices cover the payload
    assert(slices.flatten.toSeq == bytes.toSeq)
  }

  test("resize rewrites image meta + scales payload, leaves other media alone") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val df = media((1L, "image", bytes), (2L, "video", bytes))
    val out = Multimodal.resize(df, w = 50, h = 50).orderBy("media_id").collect()
    assert(out(0).schema == Multimodal.mediaSchema) // schema contract holds
    val imgMeta = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(imgMeta.getAs[Int]("width") == 50 && imgMeta.getAs[Int]("height") == 50)
    assert(imgMeta.getAs[String]("format") == "synthetic")
    // pixel ratio (50*50)/(100*50) = 1/2 → payload halves (stub buffer law)
    assert(out(0).getAs[Array[Byte]]("content").length == 50)
    // non-image rows pass through untouched
    assert(out(1).getAs[Array[Byte]]("content").length == 100)
    assert(out(1).getStruct(out(1).fieldIndex("meta")).getAs[Int]("width") == 100)
    // upscale never grows the fake buffer past the original
    val up = Multimodal.resize(df, w = 400, h = 400).orderBy("media_id").collect()
    assert(up(0).getAs[Array[Byte]]("content").length == 100)
    // NULL payloads stay NULL — unfetched/corrupt markers must survive
    val n = Multimodal.resize(media((3L, "image", null)), w = 50, h = 50).collect()
    assert(n(0).isNullAt(n(0).fieldIndex("content")))
  }

  test("syntheticMedia builds the media schema from the test documents") {
    val df = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    assert(df.schema == Multimodal.mediaSchema ||
      df.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    assert(df.count() > 0)
    val types = df.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  /** Same deterministic gradient pixels, encoded by the named codec —
    * different formats produce different BYTES for identical content. */
  private def gradient(fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, ((x * 15) << 16) | ((y * 20) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("imageHashDedup groups transcoded copies that byte hashing can never catch") {
    val asPng = gradient("png")
    val asBmp = gradient("bmp")
    assert(!java.util.Arrays.equals(asPng, asBmp),
      "fixture must be a true transcode: same pixels, different bytes")
    val df = media(
      (1L, "image", asPng),
      (2L, "image", asBmp),                          // transcoded duplicate
      (3L, "image", png(16, 12, 0x808080)),          // different picture
      (4L, "image", "not an image".getBytes("UTF-8"))) // undecodable
    val out = Multimodal.imageHashDedup(df).orderBy("media_id").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (Option(r.get(r.fieldIndex("phash"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("keeper"), r.getAs[Long]("n_members"),
          r.getAs[Boolean]("is_dup"))).toMap

    // the transcode pair shares one hash and one keeper (lowest id)…
    assert(out(1L)._1.isDefined && out(1L)._1 == out(2L)._1)
    assert(out(1L)._2 == 1L && !out(1L)._4)
    assert(out(2L)._2 == 1L && out(2L)._4 && out(2L)._3 == 2L)
    // …a different picture hashes apart…
    assert(out(3L)._1.isDefined && out(3L)._1 != out(1L)._1)
    assert(out(3L)._2 == 3L && !out(3L)._4)
    // …and an undecodable payload keeps itself with a NULL hash
    assert(out(4L)._1.isEmpty && out(4L)._2 == 4L && !out(4L)._4)
  }

  /** Deterministic 16-bit mono PCM (seeded LCG "audio"), containerized
    * by the named writer — WAV is little-endian, AIFF big-endian, so
    * the same samples produce very different bytes. */
  private def clip(container: javax.sound.sampled.AudioFileFormat.Type,
                   seed: Int): Array[Byte] = {
    import javax.sound.sampled._
    val n = 2048
    val samples = new Array[Byte](n * 2)
    var x = seed
    for (i <- 0 until n) {
      x = x * 1103515245 + 12345
      // seed-dependent loud/quiet BLOCK pattern: the fingerprint reads
      // the envelope, so "different audio" must differ in envelope, not
      // merely in sample noise
      val loud = ((i * 64 / n) + seed) % 2 == 0
      val s = ((x >> 16).toShort / (if (loud) 1 else 8)).toShort
      samples(2 * i) = (s & 0xff).toByte
      samples(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // little-endian src
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, container, bos)
    bos.toByteArray
  }

  test("audioHashDedup groups container re-encodes of the same PCM") {
    import javax.sound.sampled.AudioFileFormat.Type.{AIFF, WAVE}
    val asWav = clip(WAVE, seed = 7)
    val asAiff = clip(AIFF, seed = 7)
    assert(!java.util.Arrays.equals(asWav, asAiff),
      "fixture must be a true re-containerization: same PCM, different bytes")
    val df = media(
      (1L, "audio", asWav),
      (2L, "audio", asAiff),                        // same samples, AIFF
      (3L, "audio", clip(WAVE, seed = 100)),        // different (opposite-parity envelope)
      (4L, "audio", "not audio".getBytes("UTF-8"))) // undecodable
    val out = Multimodal.audioHashDedup(df).orderBy("media_id").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (Option(r.get(r.fieldIndex("phash"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("keeper"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(1L)._1.isDefined && out(1L)._1 == out(2L)._1,
      "WAV and AIFF of identical PCM must fingerprint identically")
    assert(out(2L)._2 == 1L && out(2L)._3)
    assert(out(3L)._1.isDefined && out(3L)._1 != out(1L)._1)
    assert(out(4L)._1.isEmpty && out(4L)._2 == 4L && !out(4L)._3)
  }

  /** High-contrast test card: left half black, right half white, with an
    * optional 2×2 block in the black half flipped white — the flip maps
    * to one 8×8-thumbnail cell, so the aHash of the perturbed card
    * differs from the original's in a small, non-zero number of bits. */
  private def halfCard(perturb: Boolean, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x >= 8) 0xffffff else 0x000000)
    if (perturb)
      for (y <- 2 until 4; x <- 2 until 4) img.setRGB(x, y, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("imageNearDup clusters a bit-perturbed transcode that exact dedup misses") {
    val orig = halfCard(perturb = false, "png")
    val nudged = halfCard(perturb = true, "bmp") // perturbed AND transcoded
    val df = media(
      (1L, "image", orig),
      (2L, "image", nudged),
      (3L, "image", png(16, 16, 0x808080)),          // unrelated picture
      (4L, "image", "not an image".getBytes("UTF-8"))) // undecodable
    // exact-equality dedup cannot group them (hashes differ in >0 bits)…
    val exact = Multimodal.imageHashDedup(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("keeper")).toMap
    assert(exact(1L) == 1L && exact(2L) == 2L,
      "fixture must be a true near-dup: hashes differ, exact dedup splits them")
    // …the banded Hamming path does
    val near = Multimodal.imageNearDup(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("keeper"), r.getAs[Long]("n_members"),
          r.getAs[Boolean]("is_dup"))).toMap
    val hd = {
      val hs = Multimodal.imageNearDup(df).filter("media_id <= 2")
        .select("phash").collect().map(_.getLong(0))
      java.lang.Long.bitCount(hs(0) ^ hs(1))
    }
    assert(hd >= 1 && hd <= 3, s"perturbation moved $hd bits — fixture drifted")
    assert(near(1L) == ((1L, 2L, false)), near.toString)
    assert(near(2L) == ((1L, 2L, true)), near.toString)
    assert(near(3L)._1 == 3L && !near(3L)._3)
    assert(near(4L)._1 == 4L && !near(4L)._3)
  }

  test("audioNearDup clusters a one-window re-level that exact dedup misses") {
    import javax.sound.sampled.AudioFileFormat.Type.{AIFF, WAVE}
    // clipPerturbed: same PCM as clip(seed) except ONE 32-frame window's
    // gain flips — one envelope bit moves, give or take the mean shift
    def clipP(container: javax.sound.sampled.AudioFileFormat.Type,
              seed: Int, flipWindow: Int): Array[Byte] = {
      import javax.sound.sampled._
      val n = 2048
      val samples = new Array[Byte](n * 2)
      var x = seed
      for (i <- 0 until n) {
        x = x * 1103515245 + 12345
        val w = i * 64 / n
        val loudBase = (w + seed) % 2 == 0
        val loud = if (w == flipWindow) !loudBase else loudBase
        val s = ((x >> 16).toShort / (if (loud) 1 else 8)).toShort
        samples(2 * i) = (s & 0xff).toByte
        samples(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, container, bos)
      bos.toByteArray
    }
    val orig = clipP(WAVE, seed = 7, flipWindow = -1)
    val nudged = clipP(AIFF, seed = 7, flipWindow = 10) // re-leveled AND re-containerized
    val df = media(
      (1L, "audio", orig),
      (2L, "audio", nudged),
      (3L, "audio", clipP(WAVE, seed = 100, flipWindow = -1)),
      (4L, "audio", "not audio".getBytes("UTF-8")))
    val exact = Multimodal.audioHashDedup(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("keeper")).toMap
    assert(exact(1L) == 1L && exact(2L) == 2L,
      "fixture must be a true near-dup: envelopes differ, exact dedup splits them")
    val near = Multimodal.audioNearDup(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("keeper"), r.getAs[Boolean]("is_dup"))).toMap
    val hd = {
      val hs = Multimodal.audioNearDup(df).filter("media_id <= 2")
        .select("phash").collect().map(_.getLong(0))
      java.lang.Long.bitCount(hs(0) ^ hs(1))
    }
    assert(hd >= 1 && hd <= 3, s"re-level moved $hd bits — fixture drifted")
    assert(near(1L) == ((1L, false)) && near(2L) == ((1L, true)), near.toString)
    assert(near(3L)._1 == 3L && !near(3L)._2)
    assert(near(4L)._1 == 4L && !near(4L)._2)
  }

  test("videoNearDup clusters a re-encoded clip; frame majority absorbs single-frame noise") {
    // edge-split pattern frames: aHash is content-bearing (a solid fill
    // hashes to 0 — useless as a fixture)
    def pat(split: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if (x >= split) 0xffffff else 0x000000)
      img
    }
    // a second JPEG generation at LOW quality: decode the lossy encode,
    // hand the ringing pixels back — avi() re-encodes them at default
    // quality, so the stored frame BYTES differ from the original
    // clip's even though the pictures still read the same
    def gen2(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.5f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    val (a, b, c) = (pat(8), pat(4), pat(12))
    val clip1 = avi(Seq(a, b, a), usPerFrame = 40000L)
    val clip2 = avi(Seq(gen2(a), gen2(b), gen2(a)), usPerFrame = 40000L) // re-encode
    val clip3 = avi(Seq(a, c, a), usPerFrame = 40000L) // one frame swapped
    val clip4 = avi(Seq.fill(3)(pat(2)), usPerFrame = 40000L) // unrelated clip
    val df = media(
      (1L, "video", clip1),
      (2L, "video", clip2),
      (3L, "video", clip3),
      (4L, "video", clip4),
      (5L, "video", "not a video at all".getBytes("UTF-8"))) // undecodable
    assert(!java.util.Arrays.equals(clip1, clip2),
      "fixture must be a true re-encode: container bytes differ")
    val rows = Multimodal.videoNearDup(df, k = 3).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          r.getAs[Long]("keeper"), r.getAs[Boolean]("is_dup"))).toMap
    // the re-encoded clip keeps its majority hash within the band
    // guarantee and clusters with the original (0 moved bits is a
    // legitimate re-encode outcome — the claim is ≤ 3, not ≥ 1)
    val hd = java.lang.Long.bitCount(rows(1L)._1.get ^ rows(2L)._1.get)
    assert(hd <= 3, s"re-encode moved $hd bits — outside the band guarantee")
    assert(rows(2L)._2 == 1L && rows(2L)._3, rows.toString)
    // frame majority absorbs the single swapped frame EXACTLY: with the
    // A-pattern appearing in 2 of 3 sampled frames, the middle frame's
    // vote never decides a bit, so clip3's hash equals clip1's
    assert(rows(3L)._1 == rows(1L)._1,
      s"majority must absorb a single-frame swap: ${rows(1L)._1} vs ${rows(3L)._1}")
    assert(rows(3L)._2 == 1L && rows(3L)._3, rows.toString)
    // an unrelated clip keeps itself; an undecodable payload has NULL
    // phash and keeps itself (the family contract)
    assert(rows(4L)._2 == 4L && !rows(4L)._3, rows.toString)
    assert(rows(5L)._1.isEmpty && rows(5L)._2 == 5L && !rows(5L)._3, rows.toString)
  }
}
