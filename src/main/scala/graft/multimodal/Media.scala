package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / frame-sampling run as partition-local
  * typed transforms.
  *
  * The Spark-side plumbing — schema, encoders, batch shape, partitioning —
  * is real and tested. Image and audio decode are REAL (JDK codecs:
  * javax.imageio, javax.sound); video gets REAL container metadata
  * ([[probeVideo]]: MP4 `moov/mvhd/tkhd/stsz` + AVI `avih` header parsing)
  * and REAL first-keyframe luminance for the AVI flavors a pure JDK can
  * decode — MJPEG (frame chunks are JPEGs) and uncompressed BI_RGB DIB
  * ([[aviKeyframeLuminance]]). Codec'd streams (H.264/… — the JDK ships
  * no video codec) carry a NULL feature, never a fabricated one;
  * [[decodeStub]] remains the explicitly-fake decoder for pipeline-shape
  * tests. The null-for-codec'd-video stance is PERMANENT policy under the
  * zero-dependency constraint: every MP4 video track is codec'd (MJPEG-
  *in-MP4 does not occur in practice — MJPEG ships in AVI, which is
  * handled), so no pure-JVM MP4 keyframe path exists to add; a
  * deployment wanting real H.264 features plugs a decoder into the
  * [[decodeReal]] seam rather than changing this module.
  *
  * Scale posture: all transforms are `mapPartitions`-shaped (one JVM-local
  * pass, no shuffle); heavy payloads should be read with a small
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory, and feature extraction parallelizes per-partition with
  * zero driver involvement.
  */
object Media {

  /** An opaque media payload: bytes + source-asserted metadata. */
  case class MediaBlob(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      declared_width: Int,
      declared_height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Decoded features: fixed-width vector + actual (decoded) dims. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Build a media table from any DataFrame with (id, payload) columns —
    * payload text is encoded to bytes; metadata is synthesized
    * deterministically. This stands in for `spark.read.format("binaryFile")`
    * over an object store, which yields the same (bytes + metadata) shape. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaBlob] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      (col(idCol) % 640 + 16).cast("int").as("declared_width"),
      (col(idCol) % 480 + 16).cast("int").as("declared_height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("long").as("duration_ms"))
      .as[MediaBlob]
  }

  /** STUB decode ???: a real implementation would hand `blob.bytes` to an
    * image/audio codec here and return true dimensions + an embedding from
    * a vision/audio model. This deterministic fake derives everything from
    * the payload so tests are stable and the pipeline shape (partition-
    * local batch decode, fixed-width float feature output) is the real
    * thing. */
  def decodeStub(blob: MediaBlob, featureDim: Int = 8): MediaFeatures = {
    val h = java.util.Arrays.hashCode(blob.bytes)
    def mix(i: Int): Int = {
      var x = h ^ (i * 0x9e3779b9)
      x ^= x >>> 16; x *= 0x85ebca6b; x ^= x >>> 13
      x
    }
    MediaFeatures(
      media_id = blob.media_id,
      kind = blob.kind,
      width = math.abs(mix(1)) % 2048 + 1,
      height = math.abs(mix(2)) % 2048 + 1,
      n_frames = if (blob.kind == "video") math.abs(mix(3)) % 300 + 1 else 1,
      feature = Array.tabulate(featureDim)(i => (mix(i + 4) % 1000) / 1000.0f))
  }

  /** REAL image decode via javax.imageio — PNG/JPEG/GIF/BMP readers ship
    * with the JDK, so this path needs no external codec. Returns the TRUE
    * decoded dimensions and a fixed-width feature: mean luminance over
    * `featureDim` vertical strips (the classic thumbnail-embedding
    * stand-in — deterministic, resolution-independent, and computed on a
    * bounded 64-pixel-per-strip sample so a 100-megapixel scan costs the
    * same as a thumbnail). Non-image kinds and undecodable payloads fall
    * back to [[decodeStub]], keeping the pipeline total. */
  def decodeImage(blob: MediaBlob, featureDim: Int = 8): MediaFeatures = {
    if (blob.kind != "image") return decodeStub(blob, featureDim)
    val img =
      try {
        javax.imageio.ImageIO.setUseCache(false) // no executor tmp files
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob.bytes))
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) decodeStub(blob, featureDim)
    else MediaFeatures(blob.media_id, blob.kind, img.getWidth, img.getHeight, 1,
      lumStrips(img.getWidth, img.getHeight, featureDim, img.getRGB))
  }

  /** REAL image resize — javax.imageio decode → Graphics2D bilinear
    * scale → PNG re-encode, all JDK: bounds the longer edge to `maxDim`
    * preserving aspect ratio (the standard training-data normalization
    * before feature extraction). Already-small images, non-image kinds,
    * and undecodable payloads pass through UNCHANGED so the pipeline
    * stays total; partition-local like every media transform (compose as
    * `blobs.map(b => Media.resizeImage(b, 256))`). */
  def resizeImage(blob: MediaBlob, maxDim: Int = 256): MediaBlob = {
    if (blob.kind != "image") return blob
    val img =
      try {
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob.bytes))
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || (img.getWidth <= maxDim && img.getHeight <= maxDim)) blob
    else {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val w = math.max(1, math.round(img.getWidth * scale).toInt)
      val h = math.max(1, math.round(img.getHeight * scale).toInt)
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      blob.copy(bytes = bos.toByteArray, declared_width = w, declared_height = h)
    }
  }

  /** Mean luminance over `featureDim` vertical strips of a `w`×`h` pixel
    * grid read through `rgb(x, y)` (packed 0xRRGGBB) — the shared
    * feature for every real pixel source (decoded images, AVI
    * keyframes). Bounded sampling: at most 8×8 pixels per strip. */
  private def lumStrips(w: Int, h: Int, featureDim: Int, rgb: (Int, Int) => Int): Array[Float] = {
    val feat = new Array[Float](featureDim)
    var s = 0
    while (s < featureDim) {
      val x0 = (w.toLong * s / featureDim).toInt
      val x1 = math.max((w.toLong * (s + 1) / featureDim).toInt, x0 + 1)
      val xs = math.max(1, (x1 - x0) / 8)
      val ys = math.max(1, h / 8)
      var acc = 0.0; var npx = 0
      var y = 0
      while (y < h) {
        var x = x0
        while (x < x1 && x < w) {
          val v = rgb(x, y)
          val lum = 0.299 * ((v >> 16) & 0xff) + 0.587 * ((v >> 8) & 0xff) +
            0.114 * (v & 0xff)
          acc += lum / 255.0; npx += 1
          x += xs
        }
        y += ys
      }
      feat(s) = if (npx == 0) 0f else (acc / npx).toFloat
      s += 1
    }
    feat
  }

  /** REAL audio decode via javax.sound.sampled — the JDK ships WAV/AIFF/AU
    * PCM readers, no external codec needed. Returns the TRUE sample count
    * and rate and a fixed-width feature: RMS amplitude over `featureDim`
    * time slices (bounded sampling, so a 10-hour recording costs the same
    * as a clip). Non-audio kinds and undecodable payloads fall back to
    * [[decodeStub]]. Width carries the sample rate and height the channel
    * count (the struct's dims slots, reused as the reference's typed
    * metadata would be). */
  def decodeAudio(blob: MediaBlob, featureDim: Int = 8): MediaFeatures = {
    if (blob.kind != "audio") return decodeStub(blob, featureDim)
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob.bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) decodeStub(blob, featureDim)
    else try {
      val fmt = in.getFormat
      val frameLen = in.getFrameLength.toInt
      val frameSize = math.max(fmt.getFrameSize, 1)
      val bytes = new Array[Byte](frameLen * frameSize)
      var off = 0
      var n = 0
      while (off < bytes.length && { n = in.read(bytes, off, bytes.length - off); n > 0 })
        off += n
      val feat = new Array[Float](featureDim)
      val bps = fmt.getSampleSizeInBits / 8
      if (bps == 2 && frameLen > 0) {
        val big = fmt.isBigEndian
        var s = 0
        while (s < featureDim) {
          val f0 = (frameLen.toLong * s / featureDim).toInt
          val f1 = math.max((frameLen.toLong * (s + 1) / featureDim).toInt, f0 + 1)
          val step = math.max(1, (f1 - f0) / 64) // bounded sampling
          var acc = 0.0; var cnt = 0
          var f = f0
          while (f < f1 && f < frameLen) {
            val i = f * frameSize // first channel
            val v =
              if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            acc += (v / 32768.0) * (v / 32768.0); cnt += 1
            f += step
          }
          feat(s) = if (cnt == 0) 0f else math.sqrt(acc / cnt).toFloat
          s += 1
        }
      }
      MediaFeatures(blob.media_id, blob.kind,
        width = fmt.getSampleRate.toInt, height = fmt.getChannels,
        n_frames = frameLen, feature = feat)
    } catch {
      case scala.util.control.NonFatal(_) => decodeStub(blob, featureDim)
    } finally in.close()
  }

  /** Parsed video container metadata (header-only — no frame decode). */
  case class VideoMeta(width: Int, height: Int, nFrames: Int, durationMs: Long)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def fourcc(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "ISO-8859-1") else ""

  /** ISO-BMFF (MP4/MOV) box children of [from, to): (type, payloadStart,
    * end). Handles 64-bit largesize and size==0 (to end of enclosing). */
  private def mp4Children(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      var size = be32(b, o)
      val typ = fourcc(b, o + 4)
      var hdr = 8
      if (size == 1 && o + 16 <= to) { size = be64(b, o + 8); hdr = 16 }
      else if (size == 0) size = (to - o).toLong
      if (size < hdr || o + size > to) return out.result() // malformed tail
      out += ((typ, o + hdr, o + size.toInt))
      o += size.toInt
    }
    out.result()
  }

  /** MP4/MOV metadata from `moov`: `mvhd` timescale+duration,
    * the video `trak`'s `tkhd` 16.16-fixed dims, and its
    * `stbl/stsz` sample (frame) count. Returns None when the payload is
    * not a parseable ISO-BMFF file. */
  def parseMp4(b: Array[Byte]): Option[VideoMeta] =
    try {
      val top = mp4Children(b, 0, b.length)
      // a real MP4 leads with ftyp; accept bare moov too (some .mov)
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      val inMoov = mp4Children(b, moov._2, moov._3)
      val durationMs = inMoov.find(_._1 == "mvhd").map { case (_, s, _) =>
        val v = b(s) & 0xff
        val (ts, dur) =
          if (v == 1) (be32(b, s + 20), be64(b, s + 24))
          else (be32(b, s + 12), be32(b, s + 16))
        if (ts > 0) dur * 1000L / ts else 0L
      }.getOrElse(0L)
      val traks = inMoov.filter(_._1 == "trak").map { case (_, s, e) =>
        val kids = mp4Children(b, s, e)
        val (w, h) = kids.find(_._1 == "tkhd").map { case (_, ts, _) =>
          val v = b(ts) & 0xff
          val off = if (v == 1) ts + 88 else ts + 76
          ((be32(b, off) >> 16).toInt, (be32(b, off + 4) >> 16).toInt)
        }.getOrElse((0, 0))
        val frames = (for {
          mdia <- kids.find(_._1 == "mdia")
          minf <- mp4Children(b, mdia._2, mdia._3).find(_._1 == "minf")
          stbl <- mp4Children(b, minf._2, minf._3).find(_._1 == "stbl")
          stsz <- mp4Children(b, stbl._2, stbl._3).find(_._1 == "stsz")
        } yield be32(b, stsz._2 + 8).toInt).getOrElse(0)
        (w, h, frames)
      }
      // the video track is the one with pixel dims
      traks.find(_._1 > 0).orElse(traks.headOption)
        .map { case (w, h, f) => VideoMeta(w, h, f, durationMs) }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** AVI metadata from the RIFF `avih` MainAVIHeader: µs-per-frame, total
    * frames, dims. Walks the RIFF chunk structure properly (chunks are
    * fourcc + le32 size + payload, padded to EVEN offsets; LIST chunks
    * nest) instead of a byte scan — a scan both misses 2-byte-aligned
    * headers and can false-match 'avih' inside chunk data. */
  def parseAvi(b: Array[Byte]): Option[VideoMeta] =
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
      def findAvih(from: Int, to: Int): Option[Int] = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(b, o)
          val size = le32(b, o + 4).toInt
          if (size < 0 || o + 8 + size > to) return None // malformed
          // MainAVIHeader is 56 bytes; a shorter avih would make the reads
          // below spill into the next chunk's bytes
          if (id == "avih") return if (size >= 56) Some(o + 8) else None
          val r = if (id == "LIST") findAvih(o + 12, o + 8 + size) else None
          if (r.isDefined) return r
          o += 8 + size + (size & 1) // chunks pad to even
        }
        None
      }
      findAvih(12, b.length).map { p =>
        val usPerFrame = le32(b, p)
        val totalFrames = le32(b, p + 16).toInt
        val w = le32(b, p + 32).toInt
        val h = le32(b, p + 36).toInt
        VideoMeta(w, h, totalFrames, totalFrames * usPerFrame / 1000L)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF children of [from, to): (id, listType or "", payloadStart,
    * payloadEnd); chunks pad to even offsets, LIST/RIFF carry a list-type
    * fourcc ahead of their payload. */
  private def riffChildren(b: Array[Byte], from: Int, to: Int): Seq[(String, String, Int, Int)] = {
    val out = Seq.newBuilder[(String, String, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      val id = fourcc(b, o)
      val size = le32(b, o + 4).toInt
      if (size < 0 || o + 8 + size > to) return out.result() // malformed tail
      val lt = if ((id == "LIST" || id == "RIFF") && size >= 4) fourcc(b, o + 8) else ""
      val ps = if (lt.nonEmpty) o + 12 else o + 8
      out += ((id, lt, ps, o + 8 + size))
      o += 8 + size + (size & 1)
    }
    out.result()
  }

  /** The AVI's first 'vids' stream, from the hdrl strl lists:
    * (streamIndex, biBitCount, biCompression, biWidth, signed biHeight) —
    * strh identifies the stream kind, strf is its BITMAPINFOHEADER. */
  private def aviVideoStreamInfo(b: Array[Byte]): Option[(Int, Int, Long, Int, Int)] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    val top = riffChildren(b, 12, b.length)
    val hdrl = top.find(c => c._1 == "LIST" && c._2 == "hdrl").getOrElse(return None)
    riffChildren(b, hdrl._3, hdrl._4)
      .filter(c => c._1 == "LIST" && c._2 == "strl")
      .zipWithIndex
      .flatMap { case (sl, idx) =>
        val kids = riffChildren(b, sl._3, sl._4)
        val isVids = kids.find(_._1 == "strh")
          .exists(k => k._4 - k._3 >= 4 && fourcc(b, k._3) == "vids")
        if (!isVids) None
        else kids.find(_._1 == "strf").collect {
          case f if f._4 - f._3 >= 40 =>
            val p = f._3
            (idx, (le32(b, p + 14) & 0xffffL).toInt, le32(b, p + 16),
              le32(b, p + 4).toInt, le32(b, p + 8).toInt)
        }
      }
      .headOption
  }

  /** First data chunk of stream `streamIdx` in the movi list ('NNdc'
    * compressed / 'NNdb' uncompressed DIB), descending into 'rec '
    * groups. */
  private def aviFirstFrame(b: Array[Byte], streamIdx: Int): Option[Array[Byte]] = {
    val top = riffChildren(b, 12, b.length)
    val movi = top.find(c => c._1 == "LIST" && c._2 == "movi").getOrElse(return None)
    val pre = f"$streamIdx%02d"
    def scan(from: Int, to: Int): Option[Array[Byte]] =
      riffChildren(b, from, to).iterator.flatMap {
        case ("LIST", "rec ", s, e) => scan(s, e)
        case (id, _, s, e)
            if id.startsWith(pre) && (id.endsWith("dc") || id.endsWith("db")) && e > s =>
          Some(java.util.Arrays.copyOfRange(b, s, e))
        case _ => None
      }.nextOption()
    scan(movi._3, movi._4)
  }

  /** REAL first-keyframe luminance for the AVI flavors the JDK can decode
    * without an external codec: MJPEG (each frame chunk is a JPEG —
    * javax.imageio ships that codec) and uncompressed BI_RGB 24/32-bit
    * DIB frames (raw BGR(A) rows, bottom-up unless biHeight < 0, rows
    * padded to 4 bytes). Returns the decoded frame's (width, height,
    * luminance strips); None when the stream's codec needs a real video
    * decoder. */
  def aviKeyframeLuminance(b: Array[Byte], featureDim: Int = 8): Option[(Int, Int, Array[Float])] =
    try {
      aviVideoStreamInfo(b).flatMap { case (idx, bitCount, comp, w0, hRaw) =>
        aviFirstFrame(b, idx).flatMap { frame =>
          val img =
            try {
              javax.imageio.ImageIO.setUseCache(false)
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
            } catch { case scala.util.control.NonFatal(_) => null }
          if (img != null)
            Some((img.getWidth, img.getHeight,
              lumStrips(img.getWidth, img.getHeight, featureDim, img.getRGB)))
          else if (comp == 0L && (bitCount == 24 || bitCount == 32) && w0 > 0 && hRaw != 0) {
            val h = math.abs(hRaw)
            val bpp = bitCount / 8
            val stride = ((w0 * bpp + 3) / 4) * 4
            if (frame.length < stride.toLong * h) None
            else {
              val topDown = hRaw < 0
              def rgbAt(x: Int, y: Int): Int = {
                val row = if (topDown) y else h - 1 - y
                val o = row * stride + x * bpp
                ((frame(o + 2) & 0xff) << 16) | ((frame(o + 1) & 0xff) << 8) | (frame(o) & 0xff)
              }
              Some((w0, h, lumStrips(w0, h, featureDim, rgbAt)))
            }
          } else None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video probing — container metadata always (MP4/MOV
    * `moov/mvhd/tkhd/stsz`, AVI RIFF `avih`: header-only, exactly how
    * binaryFile pipelines qualify video at scale without paying a
    * decode), plus REAL first-keyframe content features where a pure-JDK
    * decode exists: MJPEG and uncompressed-DIB AVI streams
    * ([[aviKeyframeLuminance]] — the same vertical-strip luminance as
    * [[decodeImage]]).
    *
    * DEPENDENCY POLICY (settled): no external codec will be added — the
    * build is zero-egress and the JDK ships no H.264/H.265/VP9 decoder —
    * so for codec'd streams (all MP4 video, non-MJPEG AVI) the feature
    * slot is NULL, never fabricated. Downstream consumers null-check
    * (MediaSpec pins it); [[decodeStub]] remains the explicitly-fake
    * test decoder for pipeline-shape work. Unparseable payloads keep the
    * stub's fake dims (the pipeline stays total) but still carry a null
    * feature: content was not decoded either way. */
  def probeVideo(blob: MediaBlob, featureDim: Int = 8): MediaFeatures = {
    if (blob.kind != "video") return decodeStub(blob, featureDim)
    parseMp4(blob.bytes) match {
      case Some(meta) =>
        // MP4 frames are codec-encoded (H.264/...): metadata real, content null
        decodeStub(blob, featureDim).copy(
          width = meta.width, height = meta.height,
          n_frames = math.max(meta.nFrames, 1), feature = null)
      case None => parseAvi(blob.bytes) match {
        case Some(meta) =>
          decodeStub(blob, featureDim).copy(
            width = meta.width, height = meta.height,
            n_frames = math.max(meta.nFrames, 1),
            feature = aviKeyframeLuminance(blob.bytes, featureDim).map(_._3).orNull)
        case None => decodeStub(blob, featureDim).copy(feature = null)
      }
    }
  }

  /** Dispatch decoder: real image and audio codecs where the JDK has them;
    * header-parsed container metadata for video (no JDK codec exists — the
    * frame features stay stubbed, the dims/frame-count are real). */
  def decodeReal(blob: MediaBlob, featureDim: Int = 8): MediaFeatures =
    blob.kind match {
      case "image" => decodeImage(blob, featureDim)
      case "audio" => decodeAudio(blob, featureDim)
      case "video" => probeVideo(blob, featureDim)
      case _       => decodeStub(blob, featureDim)
    }

  /** Partition-local decode + featurize: the canonical shape for codec
    * work on a cluster (each partition decodes its blobs in one pass;
    * nothing is collected to the driver). `decoder` picks the codec:
    * [[decodeStub]] (default, dependency-free) or [[decodeImage]] (real
    * javax.imageio decode for image kinds). */
  def featurize(blobs: Dataset[MediaBlob], featureDim: Int = 8,
      decoder: (MediaBlob, Int) => MediaFeatures = decodeStub): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(b => decoder(b, featureDim)))
  }

  /** Frame sampling for video-kind rows: emit every `every`-th frame index
    * up to the decoded frame count — 1→N explode done partition-locally. */
  def sampleFrames(feats: Dataset[MediaFeatures], every: Int): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(every))))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("width"), col("height"))
  }
}
