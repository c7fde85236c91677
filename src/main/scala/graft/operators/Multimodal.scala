package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque BINARY
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition over the typed Dataset.
  *
  * Image formats the JDK's own `javax.imageio` ships readers for
  * (png/gif/bmp/jpeg) are decoded FOR REAL — width, height, and
  * per-channel pixel means come from actual pixels
  * ([[Multimodal.tryDecodeImage]], value-oracled by `mm_decode`).
  * WAV/PCM audio decodes FOR REAL through `javax.sound.sampled`
  * ([[Multimodal.tryDecodeWavPcm]], value-oracled by `mm_audio_fp`).
  * Everything else (compressed audio/video/unknown) keeps the
  * clearly-marked deterministic STUB ([[Multimodal.stubDecode]]) —
  * those codecs are absent in this environment — and a production
  * decoder drops into the same per-partition seam.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mimeHint: String)

  /** Extracted features: payload stats + fixed-dim embedding. For
    * payloads `javax.imageio` can decode, `width`/`height` and the
    * per-channel pixel means are REAL; for everything else they are -1
    * (the labeled stub seam). */
  final case class MediaFeatures(
      id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, avg_r: Long, avg_g: Long, avg_b: Long,
      feature: Array[Float])

  /** Container sniffing from magic bytes — pure Catalyst expression. */
  def sniffFormat(bin: Column): Column = {
    val magic = lower(hex(substring(bin, 1, 4)))
    when(magic.startsWith("ffd8ff"), "jpeg")
      .when(magic.startsWith("89504e47"), "png")
      .when(magic.startsWith("47494638"), "gif")
      .when(magic.startsWith("424d"), "bmp")
      .when(magic.startsWith("52494646"), "riff") // wav/avi/webp family
      .when(magic.startsWith("664c6143"), "flac")
      .otherwise("bin")
  }

  /** Real image decode through the JDK's `javax.imageio` (pure-JVM,
    * headless-safe — no native codec needed for png/gif/bmp/jpeg).
    * Returns (width, height, mean R, mean G, mean B over all pixels),
    * or None when no ImageIO reader accepts the payload — callers fall
    * back to the stub seam. Channel means round half-up to longs, so a
    * solid-color fixture reproduces its exact channel bytes (the
    * `mm_decode` oracle's closed form). */
  def tryDecodeImage(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((w, h, math.round(sr.toDouble / n), math.round(sg.toDouble / n),
          math.round(sb.toDouble / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (libs absent in this container). Folds the payload bytes into
    * a fixed-dim L2-normalized float vector; same bytes -> same feature.
    * Replace this function body with a real codec in production. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    out
  }

  /** Per-partition feature extraction over the typed Dataset — the real
    * distributed plumbing: one decoder context per partition (the
    * expensive-init pattern real codecs need), streaming the rows.
    * Image-magic payloads go through the REAL `javax.imageio` decode
    * ([[tryDecodeImage]]); everything else keeps the stub seam with
    * width/height/channel means pinned to -1. The decode attempt is
    * gated on magic bytes so non-image payloads never pay an ImageIO
    * reader probe. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init for non-JDK codecs would go here
      rows.map { r =>
        val m = r.media
        val fmt =
          if (m.length >= 3 && (m(0) & 0xff) == 0xff && (m(1) & 0xff) == 0xd8) "jpeg"
          else if (m.length >= 4 && (m(0) & 0xff) == 0x89 && m(1) == 'P' && m(2) == 'N' && m(3) == 'G') "png"
          else if (m.length >= 4 && m(0) == 'G' && m(1) == 'I' && m(2) == 'F' && m(3) == '8') "gif"
          else if (m.length >= 2 && m(0) == 'B' && m(1) == 'M') "bmp"
          else if (r.mimeHint.nonEmpty) r.mimeHint
          else "bin"
        val decoded =
          if (fmt == "jpeg" || fmt == "png" || fmt == "gif" || fmt == "bmp")
            tryDecodeImage(m)
          else None
        val (w, h, ar, ag, ab) = decoded.getOrElse((-1, -1, -1L, -1L, -1L))
        MediaFeatures(r.id, m.length.toLong, fmt, w, h, ar, ag, ab, stubDecode(m, dim))
      }
    }
  }

  /** 64-bit dHash (difference hash) — the classic image perceptual
    * fingerprint: the picture downsamples to a 9×8 grayscale grid by
    * EXACT integer area-averaging (cell (r,c) floor-averages the integer
    * lumas of pixel block [⌊r·h/8⌋, ⌊(r+1)·h/8⌋) × [⌊c·w/9⌋,
    * ⌊(c+1)·w/9⌋); luma = ⌊(299·R + 587·G + 114·B) / 1000⌋ — all-integer
    * so an oracle can reproduce the hash in closed form from a fixture's
    * pixel function), and bit r·8+c of the hash is set iff cell (r,c) is
    * strictly brighter than its right neighbor (r,c+1). Gradient
    * comparisons survive global brightness/contrast shifts and
    * re-encoding — the property that makes Hamming distance on dHashes a
    * near-duplicate signal where a byte hash sees nothing. A 9×8 input
    * hashes its pixels directly (the identity pooling the value oracle
    * pins); an n×-upscaled copy pools back to the same grid, so
    * resized copies collide (spec-pinned). None when no ImageIO reader
    * accepts the payload or the image is smaller than the grid. */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val cell = Array.ofDim[Long](8, 9)
        var r = 0
        while (r < 8) {
          val y0 = r * h / 8
          val y1 = (r + 1) * h / 8
          var c = 0
          while (c < 9) {
            val x0 = c * w / 9
            val x1 = (c + 1) * w / 9
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)) / 1000L
                x += 1
              }
              y += 1
            }
            cell(r)(c) = sum / ((y1 - y0).toLong * (x1 - x0))
            c += 1
          }
          r += 1
        }
        var fp = 0L
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (cell(r)(c) > cell(r)(c + 1)) fp |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        Some(fp)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed perceptual-hash extraction — (id, n_bytes, format,
    * phash) over the typed media Dataset, one ImageIO context per
    * partition like [[decodeFeatures]]. `phash` is NULL for payloads no
    * reader decodes (or that are smaller than the hash grid) — exactly
    * the rows [[Dedup.fingerprintPairs]] then drops, so the pair join
    * never manufactures a match from two failures. Feed the result to
    * `Dedup.fingerprintPairs(_, "id", "phash", maxHamming)` for banded
    * (never all-pairs) image near-dup candidates. */
  def imagePHashes(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        (r.id, r.media.length.toLong, dHash64(r.media))
      }
    }.toDF("id", "n_bytes", "phash")
  }

  /** Real WAV/PCM audio decode through the JDK's `javax.sound.sampled`
    * (pure-JVM — the WAVE container + PCM codec ship in the JDK, no
    * native library). Accepts PCM_SIGNED 16-bit and 8-bit payloads in
    * either endianness; multi-channel frames mix down to their
    * floor-averaged mono sample. Returns the mono sample sequence
    * (16-bit range), or None when `javax.sound` has no reader for the
    * payload or the encoding is compressed (those stay on the labeled
    * [[stubDecode]] seam — e.g. mp3/ogg, whose codecs are absent
    * here). */
  def tryDecodeWavPcm(bytes: Array[Byte]): Option[Array[Int]] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 16 && bits != 8) || ch < 1) None
        else {
          val raw = in.readAllBytes()
          val bytesPerSample = bits / 8
          val n = raw.length / (bytesPerSample * ch)
          val out = new Array[Int](n)
          var t = 0
          while (t < n) {
            var sum = 0L
            var c = 0
            while (c < ch) {
              val off = (t * ch + c) * bytesPerSample
              val s =
                // 8-bit payloads scale to the promised 16-bit range
                // (<< 8): without the scale, every 8-bit sample sits
                // under audioEnergyFingerprint's 2048-per-level
                // quantum and all 8-bit audio would fingerprint as
                // silence (hamming-0 "duplicates" of each other)
                if (bits == 8) raw(off).toInt << 8
                else if (fmt.isBigEndian)
                  (raw(off) << 8) | (raw(off + 1) & 0xff)
                else (raw(off + 1) << 8) | (raw(off) & 0xff)
              sum += s
              c += 1
            }
            out(t) = Math.floorDiv(sum, ch).toInt
            t += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 60-bit audio ENERGY fingerprint over decoded PCM samples — the
    * audio sibling of [[dHash64]], built from the same all-integer
    * discipline so a fixture oracle reproduces it in closed form:
    * samples split into frames of `frameSize`, frame i's level =
    * min(15, Σ|sample| / (frameSize·2048)) (a 4-bit quantized mean
    * absolute amplitude; 16-bit full scale 32768 = 16 levels of 2048,
    * the denominator staying `frameSize` even for a partial tail frame
    * — implicit zero padding), and the first 15 levels pack into bits
    * 4i..4i+3. 60 bits keeps the top nibble clear, so no engine's
    * shift can touch the sign bit. Energy envelopes survive phase and
    * container re-encoding — the property that makes Hamming distance
    * here a near-duplicate signal (one edited frame moves one nibble:
    * ≤ 4 bits). Empty sample arrays fingerprint to 0 (silence). */
  def audioEnergyFingerprint(samples: Array[Int], frameSize: Int): Long = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    var fp = 0L
    var i = 0
    while (i < 15) {
      var sum = 0L
      var t = i * frameSize
      val end = math.min(samples.length, (i + 1) * frameSize)
      while (t < end) { sum += math.abs(samples(t).toLong); t += 1 }
      val level = math.min(15L, sum / (frameSize.toLong * 2048L))
      fp |= level << (4 * i)
      i += 1
    }
    fp
  }

  /** Distributed audio-fingerprint extraction — (id, n_bytes,
    * n_samples, afp) over the typed media Dataset, one decoder context
    * per partition like [[imagePHashes]]. `afp` is NULL for payloads
    * `javax.sound` cannot decode to PCM — exactly the rows
    * [[Dedup.fingerprintPairs]] then drops. Feed the result to
    * `Dedup.fingerprintPairs(_, "id", "afp", maxHamming = 4,
    * fpBits = 60)` for banded (never all-pairs) audio near-dup
    * candidates: 4 bits of Hamming tolerance = one fully-changed
    * frame nibble. */
  def audioFingerprints(ds: Dataset[MediaRow], frameSize: Int = 256): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val dec = tryDecodeWavPcm(r.media)
        (r.id, r.media.length.toLong,
          dec.map(_.length.toLong),
          dec.map(audioEnergyFingerprint(_, frameSize)))
      }
    }.toDF("id", "n_bytes", "n_samples", "afp")
  }

  /** Container-level video metadata — format, duration, geometry, codec
    * fourcc — parsed pure-JVM from the MP4 (ISO BMFF) and AVI (RIFF)
    * header structures. This is the metadata a training pipeline
    * filters and stratifies on (drop sub-second clips, bucket by
    * resolution, route by codec) and it needs NO codec: the container
    * headers are plain length-prefixed trees. Keyframe PIXELS remain
    * honestly out of scope (no JDK video codec exists — the one
    * labeled stub in this library); [[sampleChunks]] covers the
    * frame-sampling plumbing shape. */
  final case class VideoMeta(format: String, durationMs: Long,
      width: Int, height: Int, codec: String)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** First direct child box of type `tp` in an ISO BMFF container span
    * — (payloadStart, payloadEnd). Boxes are [be32 size][fourcc]
    * trees; a malformed size (under 8, past the span, or the 64-bit
    * `size==1` escape) stops the walk. */
  private def mp4Find(b: Array[Byte], start: Int, end: Int,
      tp: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size = be32(b, off)
      if (size < 8 || off + size > end) return None
      if (fourcc(b, off + 4) == tp) return Some((off + 8, off + size.toInt))
      off += size.toInt
    }
    None
  }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] =
    for {
      (moovS, moovE) <- mp4Find(b, 0, b.length, "moov")
      (mvhdS, _) <- mp4Find(b, moovS, moovE, "mvhd")
      (trakS, trakE) <- mp4Find(b, moovS, moovE, "trak")
      (tkhdS, _) <- mp4Find(b, trakS, trakE, "tkhd")
      (mdiaS, mdiaE) <- mp4Find(b, trakS, trakE, "mdia")
      (minfS, minfE) <- mp4Find(b, mdiaS, mdiaE, "minf")
      (stblS, stblE) <- mp4Find(b, minfS, minfE, "stbl")
      (stsdS, _) <- mp4Find(b, stblS, stblE, "stsd")
    } yield {
      // mvhd: v0 packs creation/modification as 32-bit, v1 as 64-bit —
      // timescale/duration shift accordingly
      val (timescale, duration) =
        if ((b(mvhdS) & 0xff) == 1) (be32(b, mvhdS + 20), be64(b, mvhdS + 24))
        else (be32(b, mvhdS + 12), be32(b, mvhdS + 16))
      // tkhd: width/height are 16.16 fixed-point at the end of the
      // fixed-layout payload (offset 76 for v0, 88 for v1)
      val geomOff = tkhdS + (if ((b(tkhdS) & 0xff) == 1) 88 else 76)
      val w = (be32(b, geomOff) >> 16).toInt
      val h = (be32(b, geomOff + 4) >> 16).toInt
      // stsd: [v/f][entry_count][first sample entry = [size][codec fourcc]...]
      val codec = fourcc(b, stsdS + 12)
      val durMs = if (timescale == 0L) 0L else duration * 1000L / timescale
      VideoMeta("mp4", durMs, w, h, codec)
    }

  /** First child of a RIFF span: either the plain chunk `id`, or (when
    * `listType` is set) the LIST whose type matches — returns the
    * payload span AFTER the list-type fourcc for lists. Chunks are
    * [fourcc][le32 size][payload padded to even]. */
  private def aviFind(b: Array[Byte], start: Int, end: Int,
      id: String, listType: Option[String] = None): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val cid = fourcc(b, off)
      val size = le32(b, off + 4)
      val pEnd = off + 8 + size
      if (size < 0 || pEnd > end) return None
      listType match {
        case Some(lt) =>
          if (cid == "LIST" && size >= 4 && fourcc(b, off + 8) == lt)
            return Some((off + 12, pEnd.toInt))
        case None =>
          if (cid == id) return Some((off + 8, pEnd.toInt))
      }
      off = (pEnd + (pEnd & 1L)).toInt // chunks pad to even offsets
    }
    None
  }

  private def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    for {
      (hdrlS, hdrlE) <- aviFind(b, 12, b.length, "", Some("hdrl"))
      (avihS, avihE) <- aviFind(b, hdrlS, hdrlE, "avih")
      if avihE - avihS >= 40
      (strlS, strlE) <- aviFind(b, hdrlS, hdrlE, "", Some("strl"))
      (strhS, strhE) <- aviFind(b, strlS, strlE, "strh")
      if strhE - strhS >= 8
    } yield {
      val uspf = le32(b, avihS) // microseconds per frame
      val frames = le32(b, avihS + 16)
      val w = le32(b, avihS + 32).toInt
      val h = le32(b, avihS + 36).toInt
      val codec = fourcc(b, strhS + 4) // fccHandler (fccType at +0)
      VideoMeta("avi", uspf * frames / 1000L, w, h, codec)
    }
  }

  /** Parse container-level video metadata from raw bytes: MP4 (ISO
    * BMFF box tree, big-endian) or AVI (RIFF chunk tree,
    * little-endian). None for anything else or any malformed header —
    * the null seam video rows share with undecodable audio/images. */
  def tryParseVideoMeta(bytes: Array[Byte]): Option[VideoMeta] =
    try {
      if (bytes.length >= 12 && fourcc(bytes, 4) == "ftyp") parseMp4(bytes)
      else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
        fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed container-metadata extraction — (id, n_bytes, format,
    * duration_ms, width, height, codec) over the typed media Dataset,
    * the filter/stratify substrate for video corpora. Metadata columns
    * are NULL for unparseable payloads — the same null seam as
    * [[audioFingerprints]]/[[imagePHashes]]. */
  def videoMetas(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val m = tryParseVideoMeta(r.media)
        (r.id, r.media.length.toLong, m.map(_.format), m.map(_.durationMs),
          m.map(_.width), m.map(_.height), m.map(_.codec))
      }
    }.toDF("id", "n_bytes", "format", "duration_ms", "width", "height", "codec")
  }

  /** Frame/chunk sampling over a binary payload: fixed-size chunk offsets
    * as a generator (explode) — the shape of video frame-sampling with the
    * frame decode stubbed to a chunk checksum. */
  def sampleChunks(df: DataFrame, idCol: String, binCol: String,
      chunkBytes: Int, maxChunks: Int, portableHash: Boolean = false): DataFrame = {
    val nChunks = least(
      ceil(length(col(binCol)).cast(DoubleType) / chunkBytes).cast(IntegerType),
      lit(maxChunks))
    // sequence(0, -1) yields the DESCENDING array [0, -1], not empty —
    // guard zero-length payloads to zero chunks explicitly
    val offsets = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val chunk = col(binCol).substr(col("off") * chunkBytes + 1, lit(chunkBytes))
    // portable checksum = md5 over the chunk's lowercase hex (a VARCHAR
    // digest every engine has; md5-of-BLOB is not portable); crc32 is
    // the cheaper default
    val checksum = if (portableHash) md5(lower(hex(chunk))).as("chunk_md5")
      else crc32(chunk).as("chunk_crc")
    df.select(col(idCol), col(binCol),
        posexplode(offsets).as(Seq("chunk_idx", "off")))
      .select(col(idCol), col("chunk_idx"),
        (col("off").cast(LongType) * chunkBytes).as("offset"),
        checksum)
  }
}
