package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batched per-partition
  * passes.
  *
  * IMAGE decode is REAL: JDK `javax.imageio` (PNG/JPEG/BMP/GIF — no extra
  * deps) decodes the payload and the features are actual pixel statistics
  * ([[decodeImage]]). AUDIO decode is REAL for PCM WAV/AIFF/AU: JDK
  * `javax.sound.sampled` (again no extra deps) decodes the samples and the
  * features are actual waveform statistics ([[decodeAudio]]). VIDEO decode
  * is REAL for MJPEG (concatenated JPEG frames — per-frame ImageIO +
  * temporal luma aggregation, [[decodeVideoMjpeg]]); codec-bearing
  * containers (MP4/H.264, VP9, AV1, …) are a DOCUMENTED LIMITATION of this
  * pure-JDK build and fall back — like any payload a real decoder cannot
  * parse — to the deterministic [[stubDecode]] rather than failing the
  * batch. Swapping in a full codec stack (javacv / JNI) changes only
  * [[stubDecode]]'s body: same batch iteration, same output schema.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,                  // image | audio | video
      content: Array[Byte],
      meta: Map[String, String])     // width/height/sample_rate/duration_ms...

  /** Extracted features: fixed-dim embedding + basic stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  val FeatureDim = 16

  /** Deterministic synthetic media corpus (payload bytes derived from id) —
    * the fixture generator for the plumbing tests. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { r =>
      val id = r
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val bytes = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      val meta = kind match {
        case "image" => Map("width" -> s"${64 + id % 64}", "height" -> s"${64 + id % 48}")
        case "audio" => Map("sample_rate" -> "16000", "duration_ms" -> s"${100 + id % 900}")
        case _ => Map("fps" -> "30", "duration_ms" -> s"${1000 + id % 9000}")
      }
      MediaRecord(id, kind, bytes, meta)
    }
  }

  /** REAL image decode via JDK ImageIO: pixel statistics as the feature
    * vector. Layout (FeatureDim = 16):
    * {{{
    * 0: width   1: height   2: aspect (w/h)
    * 3-5: mean R,G,B (0..1)   6: mean luma   7: luma stddev
    * 8-15: 8-bin luma histogram (fractions, sums to 1)
    * }}}
    * Large images are sampled on a deterministic pixel stride (≤ ~65k
    * samples), so the per-record cost is bounded whatever the resolution.
    * Returns None when ImageIO cannot parse the payload (caller falls back
    * to [[stubDecode]] — undecodable bytes must not fail a whole batch). */
  /** Decode-size ceiling: a few-KB payload can DECLARE a 50k×50k canvas (a
    * decompression bomb) and ImageIO.read would allocate w·h·4 bytes before
    * any sampling — check the header dims first and refuse anything that
    * would materialize over ~256 MB. */
  private[multimodal] val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Bomb-guarded ImageIO read (header dims checked before any pixel
    * allocation); null when the payload is undecodable or over the pixel
    * ceiling. Shared by [[decodeImage]] and [[imageAHash]]. */
  private[multimodal] def readGuardedImage(
      content: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      if (iis == null) null
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          reader.setInput(iis)
          try {
            // header-only dims — no pixel allocation yet
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException | _: RuntimeException => null }

  private[multimodal] def decodeImage(r: MediaRecord): Option[MediaFeatures] = {
    val img = readGuardedImage(r.content)
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val stride = math.max(1L, math.round(math.sqrt(w.toLong * h / 65536.0))).toInt
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var sl = 0.0; var sl2 = 0.0
      val hist = new Array[Long](8)
      var n = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val cr = ((rgb >> 16) & 0xFF) / 255.0
          val cg = ((rgb >> 8) & 0xFF) / 255.0
          val cb = (rgb & 0xFF) / 255.0
          val luma = 0.299 * cr + 0.587 * cg + 0.114 * cb
          sr += cr; sg += cg; sb += cb
          sl += luma; sl2 += luma * luma
          hist(math.min(7, (luma * 8).toInt)) += 1L
          n += 1L
          x += stride
        }
        y += stride
      }
      val f = new Array[Float](FeatureDim)
      f(0) = w.toFloat; f(1) = h.toFloat; f(2) = w.toFloat / h
      f(3) = (sr / n).toFloat; f(4) = (sg / n).toFloat; f(5) = (sb / n).toFloat
      val meanL = sl / n
      f(6) = meanL.toFloat
      f(7) = math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)).toFloat
      var i = 0
      while (i < 8) { f(8 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
      Some(MediaFeatures(r.media_id, r.kind, r.content.length.toLong, f))
    }
  }

  /** REAL audio decode via JDK javax.sound.sampled (PCM WAV/AIFF/AU —
    * 8/16-bit, any channel count, either endianness): waveform statistics
    * as the feature vector. Multi-channel frames are averaged to mono;
    * samples normalize to [-1, 1) (16-bit: /32768, 8-bit: /128). Layout
    * (FeatureDim = 16):
    * {{{
    * 0: sample_rate (Hz)   1: channels   2: duration (seconds)
    * 3: RMS   4: peak |sample|   5: zero-crossing rate (sign flips/(n-1))
    * 6: mean (DC offset)   7: sample stddev
    * 8-15: 8-bin |sample| histogram (fractions, sums to 1)
    * }}}
    * Same decompression-bomb stance as images: the frame count is read from
    * the HEADER and anything over [[MaxDecodeFrames]] (or unknown-length /
    * non-PCM / >16-bit payloads) returns None before any allocation, and the
    * caller falls back to [[stubDecode]] — undecodable bytes must not fail
    * a whole batch. */
  private[multimodal] val MaxDecodeFrames: Long = 16L * 1024 * 1024

  private[multimodal] def decodeAudio(r: MediaRecord): Option[MediaFeatures] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val decoded =
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val frames = ais.getFrameLength
          val pcmOk =
            (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
              (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
          if (!pcmOk || fmt.getChannels <= 0 || frames <= 0 ||
              frames > MaxDecodeFrames) None
          else Some((fmt, frames.toInt, ais.readAllBytes()))
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    decoded.map { case (fmt, frames, bytes) =>
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val big = fmt.isBigEndian
      val bytesPerSample = bits / 8
      val n = math.min(frames, bytes.length / (bytesPerSample * channels))
      var sum = 0.0; var sum2 = 0.0; var peak = 0.0
      var crossings = 0L; var prevSign = 0
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val off = (i * channels + c) * bytesPerSample
          val v =
            if (bits == 16) {
              val (b0, b1) = (bytes(off), bytes(off + 1))
              val s = if (big) (b0 << 8) | (b1 & 0xFF) else (b1 << 8) | (b0 & 0xFF)
              s / 32768.0
            } else if (signed) bytes(off) / 128.0
            else ((bytes(off) & 0xFF) - 128) / 128.0
          acc += v
          c += 1
        }
        val s = acc / channels
        sum += s; sum2 += s * s
        val as = math.abs(s)
        if (as > peak) peak = as
        hist(math.min(7, (as * 8).toInt)) += 1L
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1L
        if (sign != 0) prevSign = sign
        i += 1
      }
      val f = new Array[Float](FeatureDim)
      f(0) = fmt.getSampleRate
      f(1) = channels.toFloat
      f(2) = (n / fmt.getSampleRate.toDouble).toFloat
      f(3) = math.sqrt(sum2 / math.max(1, n)).toFloat
      f(4) = peak.toFloat
      f(5) = if (n > 1) (crossings.toDouble / (n - 1)).toFloat else 0f
      val mean = sum / math.max(1, n)
      f(6) = mean.toFloat
      f(7) = math.sqrt(math.max(0.0, sum2 / math.max(1, n) - mean * mean)).toFloat
      var j = 0
      while (j < 8) { f(8 + j) = (hist(j).toDouble / math.max(1, n)).toFloat; j += 1 }
      MediaFeatures(r.media_id, r.kind, r.content.length.toLong, f)
    }
  }

  /** REAL video decode for MJPEG — concatenated JPEG frames, the rawest
    * motion-JPEG form (multipart camera streams, many .mjpeg files): split
    * the payload on JPEG SOI markers (FF D8 FF), decode up to
    * [[MaxVideoFrames]] frames on a deterministic stride through
    * [[decodeImage]]'s ImageIO path (inheriting its per-frame
    * decompression-bomb guard), and aggregate per-frame luma statistics
    * into temporal features. Container formats that need real codecs
    * (MP4/H.264, VP9, AV1, …) are OUT OF SCOPE for this pure-JDK build —
    * they return None here and fall back to [[stubDecode]]; that is the
    * documented limitation of this container, not a pending promise.
    * Layout (FeatureDim = 16):
    * {{{
    * 0: frames detected   1: width   2: height   3: aspect
    * 4: mean frame luma   5: temporal luma stddev (across frames)
    * 6: mean spatial luma stddev (within frames)
    * 7: mean |Δ mean-luma| between consecutive sampled frames (motion proxy)
    * 8-15: 8-bin luma histogram averaged over sampled frames
    * }}} */
  private[multimodal] val MaxVideoFrames = 32

  private[multimodal] def decodeVideoMjpeg(r: MediaRecord): Option[MediaFeatures] = {
    val bytes = r.content
    // SOI scan: FF D8 FF opens a JFIF frame. Inside valid entropy-coded
    // data FF is always escaped (00) or a restart marker (D0-D7), so D8
    // only appears at frame starts. (An EXIF-embedded thumbnail could
    // false-split; its fragment then simply fails ImageIO and is skipped.)
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
          bytes(i + 2) == 0xFF.toByte) starts += i
      i += 1
    }
    if (starts.isEmpty) None
    else {
      val total = starts.length
      // deterministic stride so a long clip costs <= MaxVideoFrames decodes
      val stride = math.max(1, (total + MaxVideoFrames - 1) / MaxVideoFrames)
      val frames = starts.indices.by(stride).take(MaxVideoFrames).flatMap { si =>
        val from = starts(si)
        val until = if (si + 1 < total) starts(si + 1) else bytes.length
        decodeImage(r.copy(content =
          java.util.Arrays.copyOfRange(bytes, from, until))).map(_.feature)
      }
      if (frames.isEmpty) None
      else {
        val nf = frames.length
        val lumas = frames.map(_(6).toDouble)
        val meanL = lumas.sum / nf
        val f = new Array[Float](FeatureDim)
        f(0) = total.toFloat
        f(1) = frames.head(0); f(2) = frames.head(1); f(3) = frames.head(2)
        f(4) = meanL.toFloat
        f(5) = math.sqrt(
          lumas.map(l => (l - meanL) * (l - meanL)).sum / nf).toFloat
        f(6) = (frames.map(_(7).toDouble).sum / nf).toFloat
        f(7) =
          if (nf < 2) 0f
          else (lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum
            / (nf - 1)).toFloat
        var b = 0
        while (b < 8) {
          f(8 + b) = (frames.map(_(8 + b).toDouble).sum / nf).toFloat
          b += 1
        }
        Some(MediaFeatures(r.media_id, r.kind, bytes.length.toLong, f))
      }
    }
  }

  /** STUB decode ??? — the fallback for payloads none of the REAL decoders
    * ([[decodeImage]], [[decodeAudio]], [[decodeVideoMjpeg]]) can parse —
    * for video that means every codec-bearing container format, which this
    * pure-JDK build cannot decode by documented limitation. Deterministic:
    * features are rolling-hash projections of the payload, so tests can
    * assert exact values. A real codec integration (javacv/JNI) would
    * replace only this body: same batch iteration, same output schema. */
  private[multimodal] def stubDecode(r: MediaRecord): MediaFeatures = {
    val f = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < r.content.length) {
      h = 31L * h + r.content(i)
      f(i % FeatureDim) += ((h % 1000L) / 1000.0f)
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, r.content.length.toLong, f)
  }

  /** Batched per-partition decode/feature-extract: the Scala analogue of a
    * `mapInPandas` batch UDF — payloads are processed `batchSize` at a time
    * per partition (a real decoder would amortize codec init per batch).
    * The input is first hash-repartitioned so payload bytes distribute
    * evenly regardless of upstream layout. */
  def decodeFeatures(media: Dataset[MediaRecord], batchSize: Int = 64,
                     partitions: Option[Int] = None): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repartitioned = partitions.map(media.repartition(_)).getOrElse(media)
    repartitioned.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch A/V codec setup would go here (ImageIO is stateless)
        batch.iterator.map { r =>
          if (r.kind == "image") decodeImage(r).getOrElse(stubDecode(r))
          else if (r.kind == "audio") decodeAudio(r).getOrElse(stubDecode(r))
          else if (r.kind == "video") decodeVideoMjpeg(r).getOrElse(stubDecode(r))
          else stubDecode(r)
        }
      }
    }
  }

  /** Average-hash (aHash) perceptual fingerprint of one image payload:
    * block-average the luma plane to an 8×8 grid (integer pixel sums per
    * cell — deterministic, no resampling filter to disagree about), then
    * bit k = 1 iff cell k's luma is strictly above the 64-cell mean.
    * Robust to re-encoding/minor edits, cheap, and fully deterministic —
    * the classic near-dup key for image corpora (the pHash family's
    * simplest member). None when the payload is undecodable or over the
    * bomb ceiling. */
  private[graft] def imageAHash(content: Array[Byte]): Option[Long] = {
    val img = readGuardedImage(content)
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val cx = math.min(7, x * 8 / w)
          val rgb = img.getRGB(x, y)
          // integer luma (ITU-R 601 weights scaled by 1000) — exact sums
          val luma = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
            114L * (rgb & 0xFF)
          val c = cy * 8 + cx
          sums(c) += luma
          counts(c) += 1L
          x += 1
        }
        y += 1
      }
      // cell means on a fixed 1e-3 grid (all-integer arithmetic)
      val cell = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
      val mean = cell.sum / 64.0
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (cell(i) > mean) bits |= 1L << i
        i += 1
      }
      Some(bits)
    }
  }

  /** Energy-contour fingerprint of one PCM audio payload — the audio
    * analogue of [[imageAHash]]: the mono waveform splits into 64 equal
    * windows, each window's mean |amplitude| is computed exactly, and bit
    * k = 1 iff window k's energy is strictly above the 64-window mean.
    * Robust to gain-preserving re-encodes and small trims; deterministic
    * (same sample-decode arithmetic as [[decodeAudio]], same PCM/frame
    * guards). None for undecodable / non-PCM / oversized payloads. */
  private[graft] def audioAHash(content: Array[Byte]): Option[Long] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val decoded =
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val frames = ais.getFrameLength
          val pcmOk =
            (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
              (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
          if (!pcmOk || fmt.getChannels <= 0 || frames <= 0 ||
              frames > MaxDecodeFrames) None
          else Some((fmt, frames.toInt, ais.readAllBytes()))
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    decoded.flatMap { case (fmt, frames, bytes) =>
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val big = fmt.isBigEndian
      val bytesPerSample = bits / 8
      val n = math.min(frames, bytes.length / (bytesPerSample * channels))
      if (n < 64) None
      else {
        val sums = new Array[Double](64)
        val counts = new Array[Long](64)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = (i * channels + c) * bytesPerSample
            val v =
              if (bits == 16) {
                val (b0, b1) = (bytes(off), bytes(off + 1))
                val s = if (big) (b0 << 8) | (b1 & 0xFF)
                        else (b1 << 8) | (b0 & 0xFF)
                s / 32768.0
              } else if (signed) bytes(off) / 128.0
              else ((bytes(off) & 0xFF) - 128) / 128.0
            acc += v
            c += 1
          }
          val w = math.min(63, (i.toLong * 64 / n).toInt)
          sums(w) += math.abs(acc / channels)
          counts(w) += 1L
          i += 1
        }
        val energy = Array.tabulate(64)(k =>
          if (counts(k) == 0) 0.0 else sums(k) / counts(k))
        val mean = energy.sum / 64.0
        var out = 0L
        var k = 0
        while (k < 64) {
          if (energy(k) > mean) out |= 1L << k
          k += 1
        }
        Some(out)
      }
    }
  }

  /** Per-image perceptual hashes for a media corpus: (media_id, ahash) for
    * every decodable image row — batched per-partition like
    * [[decodeFeatures]]. */
  def imageHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap(r =>
        imageAHash(r.content).map(hs => (r.media_id, hs))))
    }.toDF("media_id", "ahash")
  }

  /** Per-frame majority fingerprint of an MJPEG payload — the video member
    * of the aHash family: every sampled frame (same SOI split + decode
    * stride as [[decodeVideoMjpeg]]) hashes through [[imageAHash]], and
    * output bit k is set iff set in a strict MAJORITY of frames (ties →
    * 0) — the [[graft.functions.BitMajorityAgg]] rule, making the
    * fingerprint stable under per-frame noise and small cuts. None when no
    * frame decodes. */
  private[graft] def videoAHash(content: Array[Byte]): Option[Long] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < content.length) {
      if (content(i) == 0xFF.toByte && content(i + 1) == 0xD8.toByte &&
          content(i + 2) == 0xFF.toByte) starts += i
      i += 1
    }
    if (starts.isEmpty) None
    else {
      val total = starts.length
      val stride = math.max(1, (total + MaxVideoFrames - 1) / MaxVideoFrames)
      val hashes = starts.indices.by(stride).take(MaxVideoFrames).flatMap { si =>
        val from = starts(si)
        val until = if (si + 1 < total) starts(si + 1) else content.length
        imageAHash(java.util.Arrays.copyOfRange(content, from, until))
      }
      if (hashes.isEmpty) None
      else {
        val n = hashes.length
        var out = 0L
        var b = 0
        while (b < 64) {
          val ones = hashes.count(h => (h >> b & 1L) == 1L)
          if (2 * ones > n) out |= 1L << b
          b += 1
        }
        Some(out)
      }
    }
  }

  /** Per-video fingerprints: (media_id, ahash) for every MJPEG row with at
    * least one decodable frame — pairs flow through the hash-generic
    * [[imageNearDupPairs]] banding. */
  def videoHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap(r =>
        videoAHash(r.content).map(hs => (r.media_id, hs))))
    }.toDF("media_id", "ahash")
  }

  /** Per-audio energy fingerprints: (media_id, ahash) for every decodable
    * PCM audio row — [[imageHashes]]'s audio twin; pair with
    * [[imageNearDupPairs]] (the banding is hash-generic). */
  def audioHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap(r =>
        audioAHash(r.content).map(hs => (r.media_id, hs))))
    }.toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs by Hamming distance over [[imageHashes]]:
    * the 64-bit hash splits into 4 disjoint 16-bit bands; candidate pairs
    * share at least one EXACT band (pigeonhole: any pair within
    * `maxBits` ≤ 3 differing bits MUST agree on some band — the
    * [[graft.operators.Dedup.simhashPairs]] chunk-blocking guarantee), and
    * candidates verify with an exact popcount on the XOR. Blocking keeps
    * the self-join band-local: shuffle scales with band-bucket candidate
    * counts, never |images|². Output (id_a < id_b, hamming). */
  def imageNearDupPairs(hashes: DataFrame, maxBits: Int = 3): DataFrame = {
    require(maxBits >= 0 && maxBits <= 3,
      s"4-band blocking guarantees recall only for maxBits <= 3, got $maxBits")
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("ahash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
        && col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"),
        bit_count(col("l.ahash").bitwiseXOR(col("r.ahash"))).as("hamming"))
      .where(col("hamming") <= maxBits)
      .distinct()
  }

  /** Metadata-level resize: rewrites width/height for image rows, payload
    * untouched (a real pipeline would re-encode; the plumbing — filtering by
    * kind, map rewrite — is what this exercises). */
  def resizeMeta(media: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else {
        val w = r.meta.getOrElse("width", "0").toInt
        val h = r.meta.getOrElse("height", "0").toInt
        val scale = if (math.max(w, h) <= maxSide) 1.0
                    else maxSide.toDouble / math.max(w, h)
        r.copy(meta = r.meta ++ Map(
          "width" -> math.round(w * scale).toString,
          "height" -> math.round(h * scale).toString,
          "resized" -> (scale != 1.0).toString))
      }
    }
  }

  /** Frame sampling plan for video rows: every `everyMs` within duration →
    * one output row per sampled frame offset (explode-shaped). */
  def frameSamplePlan(media: Dataset[MediaRecord], everyMs: Int = 1000): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .map(r => (r.media_id, r.meta.getOrElse("duration_ms", "0").toLong))
      .toDF("media_id", "duration_ms")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs.toLong)))
          .as("frame_offset_ms"))
  }
}
