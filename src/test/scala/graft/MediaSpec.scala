package graft

import graft.multimodal.Media

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "payload zero"), (1L, "payload one"), (2L, "payload two"))
    .toDF("doc_id", "text")

  test("fromText builds typed blobs with metadata") {
    val blobs = Media.fromText(docs, "doc_id", "text").collect()
    assert(blobs.length == 3)
    assert(blobs.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
    assert(blobs.forall(b => b.bytes.nonEmpty && b.duration_ms > 0))
  }

  test("featurize runs partition-locally and is deterministic") {
    val blobs = Media.fromText(docs, "doc_id", "text")
    val f1 = Media.featurize(blobs).collect().sortBy(_.media_id)
    val f2 = Media.featurize(blobs).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(f => f.feature.length == 8 && f.width > 0 && f.height > 0))
  }

  test("sampleFrames explodes only video rows beyond frame 0") {
    val feats = Media.featurize(Media.fromText(docs, "doc_id", "text"))
    val frames = Media.sampleFrames(feats, 10)
    val byKind = frames.groupBy("kind").count().as[(String, Long)].collect().toMap
    // image/audio rows decode to a single frame each
    assert(byKind.filter(_._1 != "video").values.forall(_ > 0))
  }

  // ---- real javax.imageio decode behind the featurize seam (round 8)

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage decodes real PNG bytes: true dims + luminance strips") {
    val white = Media.MediaBlob(1L, "image", pngBytes(40, 20, 0xFFFFFF),
      declared_width = 999, declared_height = 999, sample_rate = 0, duration_ms = 0L)
    val black = Media.MediaBlob(2L, "image", pngBytes(8, 8, 0x000000),
      declared_width = 999, declared_height = 999, sample_rate = 0, duration_ms = 0L)
    val fw = Media.decodeImage(white, featureDim = 4)
    assert(fw.width == 40 && fw.height == 20 && fw.n_frames == 1)
    assert(fw.feature.length == 4 && fw.feature.forall(f => f > 0.99f))
    val fb = Media.decodeImage(black, featureDim = 4)
    assert(fb.width == 8 && fb.height == 8)
    assert(fb.feature.forall(f => f < 0.01f))
  }

  test("resizeImage bounds the longer edge, preserves aspect and content; pass-through otherwise") {
    // 64×16 white PNG → maxDim 32 → 32×8, still white
    val big = Media.MediaBlob(40L, "image", pngBytes(64, 16, 0xFFFFFF), 0, 0, 0, 0L)
    val small = Media.resizeImage(big, maxDim = 32)
    assert(small.declared_width == 32 && small.declared_height == 8)
    val dec = Media.decodeImage(small, featureDim = 4)
    assert(dec.width == 32 && dec.height == 8)
    dec.feature.foreach(f => assert(math.abs(f - 1.0f) < 1e-2, s"white stayed white: $f"))
    // resize is distributed-composable: map over the typed Dataset
    import spark.implicits._
    val ds = spark.createDataset(Seq(big)).map(b => Media.resizeImage(b, 32))
    assert(ds.collect().head.declared_width == 32)
    // already-small, non-image, and undecodable payloads pass through
    val tiny = Media.MediaBlob(41L, "image", pngBytes(8, 8, 0), 0, 0, 0, 0L)
    assert(Media.resizeImage(tiny, 32) eq tiny)
    val junk = Media.MediaBlob(42L, "image", Array[Byte](1, 2, 3), 0, 0, 0, 0L)
    assert(Media.resizeImage(junk, 32) eq junk)
    val audio = Media.MediaBlob(43L, "audio", pngBytes(64, 16, 0), 0, 0, 0, 0L)
    assert(Media.resizeImage(audio, 32) eq audio)
  }

  test("decodeImage falls back to the stub on undecodable payloads") {
    def flat(f: Media.MediaFeatures) =
      (f.media_id, f.kind, f.width, f.height, f.n_frames, f.feature.toSeq)
    val junk = Media.MediaBlob(3L, "image", Array[Byte](1, 2, 3, 4),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    assert(flat(Media.decodeImage(junk)) == flat(Media.decodeStub(junk)))
    val audio = Media.MediaBlob(4L, "audio", pngBytes(4, 4, 0),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    assert(flat(Media.decodeImage(audio)) == flat(Media.decodeStub(audio)))
  }

  test("featurize runs the real decoder distributed over partitions") {
    import spark.implicits._
    val blobs = (1L to 12L).map(i => Media.MediaBlob(
      i, "image", pngBytes(10 + i.toInt, 10, 0x808080),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L))
      .toDS().repartition(4)
    val feats = Media.featurize(blobs, featureDim = 4, decoder = Media.decodeImage _)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.width).toSeq == (11 to 22).toSeq)
    assert(feats.forall(f => f.feature.forall(v => v > 0.4f && v < 0.6f)))
  }


  private def wavBytes(samples: Array[Short], rate: Float = 16000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio decodes real WAV bytes: rate, channels, frames, RMS slices") {
    // first half silence, second half full-scale square wave
    val n = 1600
    val samples = Array.tabulate(n)(i =>
      if (i < n / 2) 0.toShort
      else (if (i % 2 == 0) 30000 else -30000).toShort)
    val blob = Media.MediaBlob(5L, "audio", wavBytes(samples),
      declared_width = 0, declared_height = 0, sample_rate = 16000, duration_ms = 100L)
    val f = Media.decodeAudio(blob, featureDim = 4)
    assert(f.width == 16000 && f.height == 1 && f.n_frames == n)
    assert(f.feature.length == 4)
    assert(f.feature(0) < 0.01f && f.feature(1) < 0.01f) // silent half
    assert(f.feature(2) > 0.8f && f.feature(3) > 0.8f)   // loud half
  }

  test("decodeReal dispatches by kind; audio junk falls back to the stub") {
    def flat(f: Media.MediaFeatures) =
      (f.media_id, f.kind, f.width, f.height, f.n_frames, f.feature.toSeq)
    val junk = Media.MediaBlob(6L, "audio", Array[Byte](9, 9, 9),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    assert(flat(Media.decodeReal(junk)) == flat(Media.decodeStub(junk)))
    val img = Media.MediaBlob(7L, "image", pngBytes(6, 6, 0xFFFFFF),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    assert(Media.decodeReal(img).width == 6)
    val vid = Media.MediaBlob(8L, "video", Array[Byte](1),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    // video on the REAL path never fabricates content features — null, not
    // stub values, even when the container is unparseable
    val vf = Media.decodeReal(vid)
    assert(vf.feature == null)
    assert((vf.media_id, vf.width, vf.height, vf.n_frames) ==
      { val s0 = Media.decodeStub(vid); (s0.media_id, s0.width, s0.height, s0.n_frames) })
  }

  /** Minimal valid ISO-BMFF: ftyp + moov[mvhd, trak[tkhd, mdia[minf[stbl[
    * stsz]]]]] — the boxes probeVideo reads, with real sizes/offsets. */
  private def mp4Bytes(w: Int, h: Int, frames: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload size
      bb.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload size
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", bb.array())
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0).putInt(0).putInt(frames) // ver/flags, sample_size=0, count
      box("stsz", bb.array())
    }
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
    box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++ box("moov", mvhd ++ trak)
  }

  /** Minimal AVI RIFF with an avih MainAVIHeader. */
  private def aviBytes(w: Int, h: Int, frames: Int, usPerFrame: Int): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("ISO-8859-1")).putInt(56)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    avih.putInt(frames).putInt(0).putInt(1).putInt(0)
    avih.putInt(w).putInt(h)
    val listSize = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4 + avih.capacity())
    val body = "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ listSize.array() ++
      "hdrl".getBytes("ISO-8859-1") ++ avih.array()
    val riff = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("ISO-8859-1")).putInt(body.length)
    riff.array() ++ body
  }

  /** Full AVI RIFF with one video stream (hdrl: avih + strl{strh,strf})
    * and one frame chunk in movi — the structure aviKeyframeLuminance
    * walks. */
  private def aviWithFrame(w: Int, h: Int, frames: Int, usPerFrame: Int,
      bitCount: Int, compression: Int, chunkId: String,
      frame: Array[Byte]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val base = id.getBytes("ISO-8859-1") ++ le(payload.length) ++ payload
      if (payload.length % 2 == 1) base :+ 0.toByte else base
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ payload)
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    avih.putInt(frames).putInt(0).putInt(1).putInt(0)
    avih.putInt(w).putInt(h) // trailing reserved bytes stay zero
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("ISO-8859-1"))
    strh.put((if (compression == 0) "DIB " else "MJPG").getBytes("ISO-8859-1"))
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(bitCount.toShort)
    strf.putInt(compression)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", chunk(chunkId, frame))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
  }

  test("MJPEG AVI: first keyframe decodes through the JDK JPEG codec — REAL luminance") {
    // frame = an actual JPEG of a synthetic gradient image
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = x * 255 / 15
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    val avi = aviWithFrame(16, 8, 30, 33333, bitCount = 24,
      compression = 0x47504A4D /* 'MJPG' le */, chunkId = "00dc", frame = jpeg)
    val (kw, kh, feat) = Media.aviKeyframeLuminance(avi, featureDim = 4).get
    assert(kw == 16 && kh == 8)
    // identical to decoding the same JPEG as an image — same codec, same strips
    val asImage = Media.decodeImage(Media.MediaBlob(1L, "image", jpeg, 0, 0, 0, 0L),
      featureDim = 4)
    assert(feat.toSeq == asImage.feature.toSeq)
    assert(feat(0) < feat(3), "gradient: left strip darker than right")
    // probeVideo carries the REAL feature alongside the container metadata
    val blob = Media.MediaBlob(30L, "video", avi, 0, 0, 0, 0L)
    val f = Media.probeVideo(blob, featureDim = 4)
    assert(f.width == 16 && f.height == 8 && f.n_frames == 30)
    assert(f.feature != null && f.feature.toSeq == feat.toSeq)
  }

  test("uncompressed BI_RGB AVI: raw bottom-up DIB rows yield exact strip luminance") {
    // 4×2 frame: left half white, right half black; 24-bit BGR rows padded
    // to 4 bytes (stride 12), bottom-up
    val w = 4; val h = 2
    val stride = ((w * 3 + 3) / 4) * 4
    val dib = new Array[Byte](stride * h)
    for (row <- 0 until h; x <- 0 until w) {
      val v = if (x < 2) 0xff.toByte else 0x00.toByte
      val o = row * stride + x * 3
      dib(o) = v; dib(o + 1) = v; dib(o + 2) = v
    }
    val avi = aviWithFrame(w, h, 1, 40000, bitCount = 24, compression = 0,
      chunkId = "00db", frame = dib)
    val (kw, kh, feat) = Media.aviKeyframeLuminance(avi, featureDim = 2).get
    assert(kw == 4 && kh == 2)
    assert(math.abs(feat(0) - 1.0f) < 1e-3, s"white strip: ${feat(0)}")
    assert(math.abs(feat(1)) < 1e-3, s"black strip: ${feat(1)}")
    // a codec'd stream (not MJPEG/DIB) still refuses to fabricate: the
    // fake 'h264' frame can't decode → null feature, container dims real
    val codecd = aviWithFrame(w, h, 1, 40000, bitCount = 24,
      compression = 0x34363268 /* 'h264' */, chunkId = "00dc",
      frame = Array[Byte](1, 2, 3, 4))
    val f = Media.probeVideo(Media.MediaBlob(31L, "video", codecd, 0, 0, 0, 0L))
    assert(f.width == 4 && f.feature == null)
  }

  test("probeVideo parses a real MP4 header: dims, frame count, duration") {
    val blob = Media.MediaBlob(9L, "video", mp4Bytes(320, 240, 48, 1000, 2000),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    val meta = Media.parseMp4(blob.bytes).get
    assert(meta == Media.VideoMeta(320, 240, 48, 2000L))
    val f = Media.probeVideo(blob)
    assert(f.width == 320 && f.height == 240 && f.n_frames == 48)
  }

  test("probeVideo parses an AVI RIFF header; junk falls back to the stub") {
    val blob = Media.MediaBlob(10L, "video", aviBytes(640, 360, 90, 33333),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    val meta = Media.parseAvi(blob.bytes).get
    assert(meta == Media.VideoMeta(640, 360, 90, 90L * 33333 / 1000))
    val f = Media.probeVideo(blob)
    assert(f.width == 640 && f.height == 360 && f.n_frames == 90)
    // dims come from the container; content features are NULL by policy —
    // there is no codec, so nothing may fabricate them
    assert(f.feature == null)
    val junk = Media.MediaBlob(11L, "video", Array[Byte](0, 1, 2, 3),
      declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    assert(Media.probeVideo(junk).width == Media.decodeStub(junk).width)
    assert(Media.probeVideo(junk).feature == null)
  }

  test("distributed featurize: video features null-not-fabricated, image/audio real") {
    import spark.implicits._
    val blobs = Seq(
      Media.MediaBlob(20L, "video", mp4Bytes(320, 240, 48, 1000, 2000),
        declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L),
      Media.MediaBlob(21L, "image", pngBytes(6, 6, 0xFFFFFF),
        declared_width = 0, declared_height = 0, sample_rate = 0, duration_ms = 0L)
    ).toDS().repartition(2)
    val out = Media.featurize(blobs, decoder = Media.decodeReal)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(20L).feature == null && out(20L).width == 320)
    assert(out(21L).feature != null && out(21L).width == 6)
    // downstream consumers select features WHERE feature IS NOT NULL —
    // a null video row drops out instead of polluting similarity math
    val usable = Media.featurize(blobs, decoder = Media.decodeReal).toDF()
      .filter(org.apache.spark.sql.functions.col("feature").isNotNull).count()
    assert(usable == 1L)
  }

}
