package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch kernels
  * (the Scala analog of arrow-batched pandas UDFs: one JVM call per
  * partition, arrays in, arrays out — not one call per row).
  *
  * The codec boundary is [[MediaDecoder]]. Images decode for real via the
  * JDK's `javax.imageio` ([[ImageIoDecoder]]) and audio via
  * `javax.sound.sampled` ([[WavDecoder]]) — zero external dependencies.
  * The JDK ships no video frame decoder, so video falls through to
  * [[DeterministicFakeDecoder]], a clearly-marked STUB that derives stable
  * pseudo-metadata from the bytes so every downstream stage — schema,
  * shard partitioning, batch shape, feature tables — is real and testable
  * there too. Swap the decoder, keep the pipeline.
  */
object Multimodal {

  final case class Media(
      id: Long,
      modality: String,
      content: Array[Byte],
      metaLen: Long
  )

  final case class Decoded(
      id: Long,
      modality: String,
      width: Int,
      height: Int,
      meanByte: Double
  )

  final case class Frame(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Media decode boundary. A production implementation decodes real
    * pixels/samples; the fake one is deterministic in the content bytes.
    */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte], modality: String): (Int, Int, Double)
  }

  /** STUB decoder: pseudo width/height from a byte rolling hash, mean byte
    * value as the "signal" statistic. Deterministic, portable, obviously
    * not a real codec.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decode(content: Array[Byte], modality: String): (Int, Int, Double) = {
      var h = 0L
      var sum = 0.0
      var i = 0
      while (i < content.length) {
        val b = content(i) & 0xff
        h = (h * 31 + b) % 1000000007L
        sum += b
        i += 1
      }
      val w = (h % 512L).toInt + 1
      val ht = ((h / 512L) % 512L).toInt + 1
      val mean = if (content.isEmpty) 0.0 else sum / content.length
      (w, ht, mean)
    }
  }

  /** REAL image decoder on the JDK's built-in `javax.imageio` (PNG / JPEG /
    * GIF / BMP — no external dependency). `modality == "image"` bytes
    * decode to the true (width, height, mean intensity), where mean
    * intensity is the average over pixels of (r+g+b)/3 in [0,255].
    * Undecodable image bytes raise a descriptive error — bad media should
    * surface, not silently pass. Non-image modalities delegate to
    * `fallback` (the JDK ships no audio/video frame decoder; the declared
    * stub remains the boundary there).
    */
  class ImageIoDecoder(fallback: MediaDecoder) extends MediaDecoder {
    def decode(content: Array[Byte], modality: String): (Int, Int, Double) =
      if (modality != "image") fallback.decode(content, modality)
      else {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        if (img == null)
          throw new IllegalArgumentException(
            s"ImageIoDecoder: undecodable image bytes (${content.length} bytes)")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        (w, h, sum / (w.toLong * h))
      }
  }
  object ImageIoDecoder extends ImageIoDecoder(DeterministicFakeDecoder)

  /** REAL audio decoder on the JDK's built-in `javax.sound.sampled` (WAV /
    * AIFF / AU — no external dependency). `modality == "audio"` bytes
    * decode to (frame count, channels, mean sample value) where samples
    * are signed 16-bit PCM read in the container's declared endianness.
    * Undecodable or non-16-bit audio raises a descriptive error — bad
    * media should surface, not silently pass. Other modalities delegate to
    * `fallback` (the JDK ships no video frame decoder; the declared stub
    * remains the boundary there).
    */
  class WavDecoder(fallback: MediaDecoder) extends MediaDecoder {
    def decode(content: Array[Byte], modality: String): (Int, Int, Double) =
      if (modality != "audio") fallback.decode(content, modality)
      else {
        val (frames, channels, samples) = wavSamples(content)
        if (samples.isEmpty) (frames, channels, 0.0)
        else {
          var sum = 0.0
          var i = 0
          while (i < samples.length) { sum += samples(i); i += 1 }
          (frames, channels, sum / samples.length)
        }
      }
  }
  object WavDecoder extends WavDecoder(DeterministicFakeDecoder)

  final case class AudioWindow(
      id: Long,
      win: Int,
      nFrames: Int,
      energy: Long,
      rms: Double
  )

  /** Decode a 16-bit PCM WAV to its raw samples (real `javax.sound`
    * codec). [[WavDecoder]] is a thin mean-statistic wrapper over this —
    * one open/validate/endian path, no drift between the two.
    */
  def wavSamples(content: Array[Byte]): (Int, Int, Array[Short]) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"wavSamples: undecodable audio bytes (${content.length} bytes)", e)
      }
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        throw new IllegalArgumentException(
          s"wavSamples: expected 16-bit signed PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Short](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) {
          out(i) = ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
          i += 1
        }
      else
        while (i < n) {
          out(i) = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          i += 1
        }
      (ais.getFrameLength.toInt, fmt.getChannels, out)
    } finally ais.close()
  }

  /** Windowed audio energy — the first real FEATURE stage over decoded
    * samples (decode-then-analyze, not just decode-and-summarize): per
    * `windowFrames`-frame window of a MONO stream, the exact integer
    * energy Σ s² and the RMS. Per-partition batch kernel like
    * [[decodeMeta]]; one output row per (id, window), zero shuffle.
    */
  def audioEnergy(
      spark: SparkSession,
      media: DataFrame,
      windowFrames: Int
  ): Dataset[AudioWindow] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.flatMap { m =>
        val (frames, channels, samples) = wavSamples(m.content)
        require(channels == 1, s"audioEnergy expects mono, got $channels")
        // window over the DECODED sample count, and fail loudly on a
        // container whose declared frame length disagrees with its data
        // chunk (frames = -1 means AudioSystem couldn't determine it)
        val n = samples.length
        require(frames < 0 || frames == n,
          s"audioEnergy: WAV declares $frames frames but decodes $n samples (id ${m.id})")
        (0 until (n + windowFrames - 1) / windowFrames).iterator.map { w =>
          val lo = w * windowFrames
          val hi = math.min(n, lo + windowFrames)
          var e = 0L
          var i = lo
          while (i < hi) {
            val s = samples(i).toLong
            e += s * s
            i += 1
          }
          AudioWindow(m.id, w, hi - lo, e, math.sqrt(e.toDouble / (hi - lo)))
        }
      }
    }
  }

  final case class Resampled(
      id: Long,
      nIn: Int,
      nOut: Int,
      energy: Long,
      rms: Double
  )

  /** Nearest-neighbor audio resample to a fixed frame count — the audio
    * analog of [[resizeMeta]]'s image resample (rate normalization is
    * the first transform an audio-training pipeline applies; every
    * sample-rate mix must land on one grid before feature extraction):
    * output frame j reads source frame floor(j·nIn/nOut) — the same
    * floor-index rule as the image path, so the resampled signal is
    * SQL-derivable from the fixture ramp — and the summary emits the
    * exact integer resampled energy Σs² plus the RMS.
    *
    * Per-partition batch kernel, one output row per clip, zero shuffle;
    * only the decoded clip is in memory (O(clip), not O(partition)).
    */
  def resampleAudio(
      spark: SparkSession,
      media: DataFrame,
      outFrames: Int
  ): Dataset[Resampled] = {
    import spark.implicits._
    require(outFrames >= 1, "resampleAudio needs outFrames >= 1")
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        val (frames, channels, samples) = wavSamples(m.content)
        require(channels == 1, s"resampleAudio expects mono, got $channels")
        val n = samples.length
        require(frames < 0 || frames == n,
          s"resampleAudio: WAV declares $frames frames but decodes $n samples (id ${m.id})")
        require(n >= 1, s"resampleAudio: empty clip (id ${m.id})")
        var e = 0L
        var j = 0
        while (j < outFrames) {
          val s = samples((j.toLong * n / outFrames).toInt).toLong
          e += s * s
          j += 1
        }
        Resampled(m.id, n, outFrames, e, math.sqrt(e.toDouble / outFrames))
      }
    }
  }

  /** Deterministic ramp WAV (fixture utility): mono 16-bit PCM, sample i =
    * (a + i·b) mod 1000 — varying but SQL-derivable, so windowed features
    * computed off the REAL codec's samples sit under an exact arithmetic
    * oracle (constWav's flat signal would make any energy query
    * trivially constant).
    */
  def rampWav(nFrames: Int, a: Int, b: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = ((a.toLong + i.toLong * b) % 1000).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic piecewise-constant WAV (fixture utility): one span of
    * `n` frames at amplitude `v` per (n, v) pair — the silence/speech
    * alternation fixture for [[audioSegments]]. PCM is lossless, so every
    * decoded sample is predictable in plain SQL from the span table.
    */
  def pulseWav(spans: Seq[(Int, Short)]): Array[Byte] = {
    val nFrames = spans.map(_._1).sum
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    spans.foreach { case (n, v) =>
      var j = 0
      while (j < n) {
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
        j += 1
      }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class AudioSegment(
      id: Long, seg: Int, active: Boolean,
      startWin: Int, nWins: Int, energy: Long)

  /** Energy-gate audio segmentation (VAD-lite — the silence-trim /
    * speech-span pass an audio-curation pipeline runs before feature
    * extraction): fixed windows of `windowFrames` samples classify
    * active = RMS > `rmsThresh`, and consecutive same-state windows
    * merge into segments by run-length encoding INSIDE the decode
    * kernel (a clip's windows stream through one iterator — zero
    * Exchange, zero window function; the same shape runs unchanged on
    * a streaming media table). Returns one row per segment:
    * (id, seg, active, startWin, nWins, energy).
    */
  def audioSegments(
      spark: SparkSession,
      media: DataFrame,
      windowFrames: Int,
      rmsThresh: Double
  ): DataFrame = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.flatMap { m =>
        val (frames, channels, samples) = wavSamples(m.content)
        require(channels == 1, s"audioSegments expects mono, got $channels")
        val n = samples.length
        require(frames < 0 || frames == n,
          s"audioSegments: WAV declares $frames frames but decodes $n samples (id ${m.id})")
        val nWin = (n + windowFrames - 1) / windowFrames
        val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
        var segStart = 0
        var segEnergy = 0L
        var segActive = false
        var w = 0
        while (w < nWin) {
          val lo = w * windowFrames
          val hi = math.min(n, lo + windowFrames)
          var e = 0L
          var i = lo
          while (i < hi) {
            val s = samples(i).toLong
            e += s * s
            i += 1
          }
          val active = math.sqrt(e.toDouble / (hi - lo)) > rmsThresh
          if (w == 0) { segActive = active; segEnergy = e }
          else if (active == segActive) segEnergy += e
          else {
            segs += AudioSegment(
              m.id, segs.length, segActive, segStart, w - segStart, segEnergy)
            segStart = w
            segEnergy = e
            segActive = active
          }
          w += 1
        }
        if (nWin > 0)
          segs += AudioSegment(
            m.id, segs.length, segActive, segStart, nWin - segStart, segEnergy)
        segs.iterator
      }
    }.toDF()
      .select(
        col("id"), col("seg").cast("long").as("seg"), col("active"),
        col("startWin").cast("long").as("start_win"),
        col("nWins").cast("long").as("n_wins"), col("energy"))
  }

  /** Deterministic constant-sample WAV (fixture utility): `nFrames` frames
    * of `channels` 16-bit signed PCM samples, every sample = `value`. PCM
    * in a WAV container is lossless, so decode(constWav(n,c,v)) is exactly
    * (n, c, v) — the audio analog of [[grayPng]], making the REAL codec
    * round-trip predictable in plain SQL for the oracle.
    */
  def constWav(nFrames: Int, channels: Int, value: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, channels, true, false) // 16-bit signed PCM little-endian
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      data(2 * i) = (value & 0xff).toByte
      data(2 * i + 1) = ((value >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic single-gray PNG (fixture utility): w×h, every pixel the
    * same gray level. PNG is lossless, so decode(grayPng(w,h,g)) is exactly
    * (w, h, g) — which makes a REAL codec round-trip predictable in plain
    * SQL for the oracle.
    */
  def grayPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    // direct spec-conformant 8-bit grayscale PNG (IHDR/IDAT/IEND with
    // java.util.zip deflate + CRC32) — bench-measured ~3x faster than the
    // ImageIO WRITER per image; decoding still runs the real ImageIO
    // codec, which is the boundary under test
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      // color type 2 (truecolor, equal channels): a GRAYSCALE png would
      // round-trip through Java's linear-gray color space and getRGB
      // would gamma-shift the values — truecolor decodes identity
      .put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    chunk("IHDR", ihdr)
    val stride = 1 + 3 * w // filter byte 0 + RGB triples
    val raw = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      java.util.Arrays.fill(raw, y * stride + 1, (y + 1) * stride, gray.toByte)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zbos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zbos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zbos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Deterministic truecolor gradient PNG: pixel (x, y) has all three
    * channels equal to `(a*x + b*y) % 256`. Unlike the solid [[grayPng]],
    * a gradient DISCRIMINATES resampling: every resize target picks a
    * different pixel subset, so a wrong source-index formula changes the
    * mean. Same direct spec-conformant encoder (deflate + CRC32); decode
    * still runs the real javax.imageio codec.
    */
  def gradientPng(w: Int, h: Int, a: Int, b: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)
      .put(2.toByte) // truecolor: identity round-trip (see grayPng)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk("IHDR", ihdr)
    val stride = 1 + 3 * w
    val raw = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((a * x + b * y) % 256).toByte
        val off = y * stride + 1 + 3 * x
        raw(off) = v; raw(off + 1) = v; raw(off + 2) = v
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zbos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zbos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zbos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  final case class Hashed(
      id: Long,
      width: Int,
      height: Int,
      hashHi: Long, // dHash bits of rows 4-7 (32 bits, non-negative)
      hashLo: Long  // dHash bits of rows 0-3
  )

  /** Perceptual dHash (difference hash) over the REAL decode path — the
    * image analog of content-hash dedup: decode (`javax.imageio`),
    * nearest-neighbor downsample to 9×8 with the standard floor source
    * index, one bit per 8×8 cell: `bit(x,y) = p(x+1,y) > p(x,y)`. The
    * hash captures the gradient STRUCTURE, not the bytes, so re-encoded
    * or resized copies of an image collide (size invariance is
    * spec-gated) while different images separate. Emitted as two 32-bit
    * words (rows 0–3 / 4–7) so an engine without 64-bit unsigned shifts
    * reproduces it without overflow.
    *
    * Same shape as [[resizeMeta]]: partition-batched kernel over the
    * binary column, embarrassingly parallel; the downstream dedup is one
    * groupBy on the two words.
    */
  def dHash(
      spark: SparkSession,
      media: DataFrame
  ): Dataset[Hashed] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        if (img == null)
          throw new IllegalArgumentException(
            s"dHash: undecodable image bytes (${m.content.length} bytes)")
        val (hi, lo) = dhashBits(img)
        Hashed(m.id, img.getWidth, img.getHeight, hi, lo)
      }
    }
  }

  final case class Resized(
      id: Long,
      width: Int,
      height: Int,
      meanResized: Double
  )

  /** Resize stage: decode (real `javax.imageio`), nearest-neighbor
    * resample to `(w2, h2)` with the standard floor source index
    * `src = tgt * srcDim / tgtDim`, and report the original decoded dims
    * plus the resampled mean intensity. The per-pixel sum is
    * integer-valued for equal-channel images ((r+g+b)/3 exact), so the
    * mean is a single exact division — the property that lets a plain-SQL
    * oracle reproduce it bit-for-bit.
    *
    * Partition-batched kernel over the binary column, embarrassingly
    * parallel — the multimodal feature-extraction shape at any scale.
    */
  def resizeMeta(
      spark: SparkSession,
      media: DataFrame,
      w2: Int,
      h2: Int
  ): Dataset[Resized] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        if (img == null)
          throw new IllegalArgumentException(
            s"resizeMeta: undecodable image bytes (${m.content.length} bytes)")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h2) {
          val sy = y * h / h2
          var x = 0
          while (x < w2) {
            val sx = x * w / w2
            val rgb = img.getRGB(sx, sy)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Resized(m.id, w, h, sum / (w2.toLong * h2))
      }
    }
  }

  final case class DecodedVideo(
      id: Long,
      nFrames: Int,
      width: Int,
      height: Int,
      meanIntensity: Double
  )

  final case class VideoMotion(
      id: Long,
      nFrames: Int,
      motion: Option[Double]
  )

  /** Frame-difference motion score — the video-curation signal that
    * separates static slideshows/title cards from footage with actual
    * motion (the video analog of the text repetition filters): per
    * consecutive frame pair, the mean absolute per-pixel intensity
    * difference; per video, the average over its nFrames−1 transitions.
    * Videos with a single frame have no transitions and score NULL.
    *
    * Every frame decodes through the real `javax.imageio` codec (GIF
    * container via the JDK GIF reader, motion-PNG fallback via the PNG
    * reader — same dispatch as [[decodeVideoMeta]]); only TWO frames'
    * pixels are held at a time, so memory is O(frame), not O(video) —
    * the property that lets the kernel stream hour-long footage.
    * Partition-batched; malformed containers raise.
    */
  def motionScore(
      spark: SparkSession,
      media: DataFrame // (id long, content binary)
  ): Dataset[VideoMotion] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          require(bytes.length >= 4, s"truncated video container (id=$id)")
          val frames: Iterator[java.awt.image.BufferedImage] =
            if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
              gifFrameIterator(id, bytes)
            else gmpvFrameIterator(id, bytes)
          var prev: Array[Int] = null
          var (w, h) = (-1, -1)
          var n = 0
          var sum = 0.0
          frames.foreach { img =>
            if (n == 0) { w = img.getWidth; h = img.getHeight }
            else require(
              img.getWidth == w && img.getHeight == h,
              s"inconsistent frame dims in id=$id")
            val cur = grayPixels(img)
            if (prev != null) {
              var s = 0L
              var i = 0
              while (i < cur.length) {
                s += math.abs(cur(i) - prev(i)); i += 1
              }
              sum += s.toDouble / cur.length
            }
            prev = cur
            n += 1
          }
          require(n >= 1, s"video with no frames (id=$id)")
          VideoMotion(id, n, if (n < 2) None else Some(sum / (n - 1)))
        }
      }
  }

  /** The 9×8-sample dHash kernel over one decoded image — shared by the
    * image operator ([[dHash]]) and the per-frame video signature
    * ([[videoFrameHashes]]); one definition of the hash.
    */
  private[graft] def dhashBits(
      img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    // 9x8 sampled grayscale grid (equal-channel: blue channel exact)
    val g = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 9) {
        g(y)(x) = img.getRGB(x * w / 9, sy) & 0xff
        x += 1
      }
      y += 1
    }
    var lo = 0L
    var hi = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x + 1) > g(y)(x)) {
          val bit = (y % 4) * 8 + x
          if (y < 4) lo |= 1L << bit else hi |= 1L << bit
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  final case class FrameHashed(id: Long, frame: Int, hashHi: Long, hashLo: Long)

  /** Per-frame perceptual signature of a video column: every frame of
    * the container (GIF or GMPV fallback, dispatched on magic bytes,
    * REAL `javax.imageio` decode either way) dHashed with the shared
    * kernel → (id, frame, hashHi, hashLo). The video analog of [[dHash]]
    * — frames stream one at a time through the iterator (O(frame)
    * memory), embarrassingly parallel across videos; downstream
    * video-level dedup treats the hash SET as the signature.
    */
  def videoFrameHashes(
      spark: SparkSession,
      media: DataFrame // (id long, content binary)
  ): Dataset[FrameHashed] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          require(bytes.length >= 4, s"truncated video container (id=$id)")
          val frames =
            if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
              gifFrameIterator(id, bytes)
            else gmpvFrameIterator(id, bytes)
          frames.zipWithIndex.map { case (img, i) =>
            val (hi, lo) = dhashBits(img)
            FrameHashed(id, i, hi, lo)
          }
        }
      }
  }

  /** Deterministic gradient animated GIF — the near-dup VIDEO fixture:
    * frame for offset `off` has pixel (a·x + b·y + offScale·off) % 256
    * (TYPE_BYTE_GRAY — the 256-gray palette round-trips losslessly), so
    * videos sharing (w, h, a, b) and overlapping offset sets share
    * exactly those frames, and every frame hash is predictable in plain
    * SQL from the generation parameters.
    */
  def gifVideoGradient(
      w: Int, h: Int, offsets: Seq[Int],
      a: Int, b: Int, offScale: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    offsets.foreach { off =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (a * x + b * y + offScale * off) % 256)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Deterministic multi-SCENE animated GIF — the shot-boundary fixture:
    * frame i renders pixel (aᵢ·x + bᵢ·y + cᵢ) % 256 from its own
    * (a, b, c) triple, so consecutive frames of one scene share (a, b)
    * (small dHash drift from the shifting c) while a scene change flips
    * the gradient direction (large dHash jump) — and every frame hash
    * is predictable in plain SQL from the triples ([[gifVideoGradient]]
    * discipline).
    */
  def gifVideoScenes(
      w: Int, h: Int, frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    frames.foreach { case (a, b, c) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (a * x + b * y + c) % 256)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Shot-boundary (scene-cut) detection — the segmentation pass a
    * video-curation pipeline runs before per-shot sampling/dedup
    * (frame-difference cut detection, the classical pre-neural shot
    * detector): consecutive frames' dHash Hamming distance, cut where
    * it exceeds `tau`. The lag is carried IN the decode kernel (a
    * video's frames stream through one iterator), so the plan is a
    * single map partition — zero Exchange, zero window; the same shape
    * runs unchanged on a streaming media table (each arriving video row
    * is self-contained). Returns (id, frame, hamming, is_cut) for every
    * frame ≥ 1.
    */
  def sceneCuts(
      spark: SparkSession,
      media: DataFrame, // (id long, content binary)
      tau: Int
  ): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          require(bytes.length >= 4, s"truncated video container (id=$id)")
          val frames =
            if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
              gifFrameIterator(id, bytes)
            else gmpvFrameIterator(id, bytes)
          var prevHi = 0L
          var prevLo = 0L
          frames.zipWithIndex.flatMap { case (img, i) =>
            val (hi, lo) = dhashBits(img)
            val out =
              if (i == 0) Iterator.empty
              else {
                val ham = (java.lang.Long.bitCount(hi ^ prevHi) +
                  java.lang.Long.bitCount(lo ^ prevLo)).toLong
                Iterator((id, i.toLong, ham))
              }
            prevHi = hi
            prevLo = lo
            out
          }
        }
      }
      .toDF("id", "frame", "hamming")
      .withColumn("is_cut", col("hamming") > tau)
  }

  private def grayPixels(img: java.awt.image.BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
      y += 1
    }
    out
  }

  private def gifFrameIterator(
      id: Long, bytes: Array[Byte]): Iterator[java.awt.image.BufferedImage] = {
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    require(n >= 1, s"GIF with no frames (id=$id)")
    new Iterator[java.awt.image.BufferedImage] {
      private var i = 0
      def hasNext: Boolean = {
        val more = i < n
        if (!more) { reader.dispose(); iis.close() }
        more
      }
      def next(): java.awt.image.BufferedImage = {
        val img = reader.read(i); i += 1; img
      }
    }
  }

  private def gmpvFrameIterator(
      id: Long, bytes: Array[Byte]): Iterator[java.awt.image.BufferedImage] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == 0x474d5056, s"not a GIF or GMPV container (id=$id)")
    val n = in.readInt()
    Iterator.tabulate(n) { i =>
      val frame = new Array[Byte](in.readInt())
      in.readFully(frame)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(frame))
      require(img != null, s"frame $i of id=$id failed to decode")
      img
    }
  }

  /** Deterministic "motion-PNG" video: a length-prefixed container of
    * REAL PNG frames — magic `GMPV`, int32 frame count, then per frame
    * int32 length + PNG bytes. The JDK ships no video codec, so the
    * CONTAINER is ours (declared plainly); every FRAME decode below runs
    * the real `javax.imageio` codec, and PNG losslessness keeps the whole
    * pipeline under an exact oracle: frame i of a `baseGray` video is
    * solid gray `(baseGray + i) % 256`.
    */
  def pngVideo(w: Int, h: Int, nFrames: Int, baseGray: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x474d5056) // "GMPV"
    out.writeInt(nFrames)
    var i = 0
    while (i < nFrames) {
      val png = grayPng(w, h, (baseGray + i) % 256)
      out.writeInt(png.length)
      out.write(png)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Deterministic animated GIF — a REAL-WORLD multi-frame container
    * (GIF89a application loop block written by the JDK's own
    * `javax.imageio` GIF writer; zero new dependencies): frame i of a
    * `baseGray` video is solid gray `(baseGray + i) % 256`, written as
    * TYPE_BYTE_GRAY so the 256-entry grayscale palette round-trips every
    * pixel losslessly and the whole decode stays under an exact oracle.
    */
  def gifVideo(w: Int, h: Int, nFrames: Int, baseGray: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    // the default write param interlaces, and the JDK codec's interlaced
    // round-trip drops rows (observed: middle row of a 3-row frame reads
    // back 0) — non-progressive output round-trips pixel-exact
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    var i = 0
    while (i < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = (baseGray + i) % 256
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      i += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Decode a multi-frame video container: animated GIF (the real-world
    * format, via the JDK's `javax.imageio` GIF reader — frame count from
    * `getNumImages`, every frame decoded by the real codec) or the
    * motion-PNG fallback container (`GMPV` magic: length-prefixed real
    * PNG frames — kept for corpora produced before the GIF path landed).
    * Dispatch is on the leading magic bytes; dims are checked consistent
    * across frames and mean = average of per-frame mean intensities.
    * Partition-batched like [[decodeMeta]]; malformed containers raise
    * (bad media surfaces, never silently passes).
    */
  def decodeVideoMeta(
      spark: SparkSession,
      media: DataFrame // (id long, content binary)
  ): Dataset[DecodedVideo] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          require(bytes.length >= 4, s"truncated video container (id=$id)")
          if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
            decodeGifFrames(id, bytes)
          else
            decodeGmpvFrames(id, bytes)
        }
      }
  }

  private def decodeGifFrames(id: Long, bytes: Array[Byte]): DecodedVideo = {
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n >= 1, s"GIF with no frames (id=$id)")
      var (w, h) = (-1, -1)
      var sum = 0.0
      var i = 0
      while (i < n) {
        val img = reader.read(i)
        if (i == 0) { w = img.getWidth; h = img.getHeight }
        else require(
          img.getWidth == w && img.getHeight == h,
          s"inconsistent frame dims in id=$id")
        sum += frameMean(img)
        i += 1
      }
      DecodedVideo(id, n, w, h, sum / n)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  private def decodeGmpvFrames(id: Long, bytes: Array[Byte]): DecodedVideo = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == 0x474d5056, s"not a GIF or GMPV container (id=$id)")
    val n = in.readInt()
    var (w, h) = (-1, -1)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val frame = new Array[Byte](in.readInt())
      in.readFully(frame)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(frame))
      require(img != null, s"frame $i of id=$id failed to decode")
      if (i == 0) { w = img.getWidth; h = img.getHeight }
      else require(
        img.getWidth == w && img.getHeight == h,
        s"inconsistent frame dims in id=$id")
      sum += frameMean(img)
      i += 1
    }
    DecodedVideo(id, n, w, h, sum / n)
  }

  /** Mean of the low (blue) channel — all video fixtures are gray, where
    * the three channels are equal, so this is the gray intensity.
    */
  private def frameMean(img: java.awt.image.BufferedImage): Double = {
    var fs = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        fs += (img.getRGB(x, y) & 0xff); x += 1
      }
      y += 1
    }
    fs / (img.getWidth.toDouble * img.getHeight)
  }

  /** Opaque media table derived from the documents fixture: content =
    * UTF-8 bytes, modality round-robins image/audio/video by id. (The test
    * tables ship no real media; the binary plumbing is what is exercised.)
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      ).as("modality"),
      col("text").cast("binary").as("content"),
      col("n_chars").as("metaLen")
    )

  /** Decode metadata for every media row — partition-batched kernel over
    * the binary column (mapPartitions: one decoder instance per partition,
    * zero per-row setup).
    */
  def decodeMeta(
      spark: SparkSession,
      media: DataFrame,
      decoder: MediaDecoder
  ): Dataset[Decoded] = {
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        val (w, h, mean) = decoder.decode(m.content, m.modality)
        Decoded(m.id, m.modality, w, h, mean)
      }
    }
  }

  /** Byte-value histogram features: 16 bins over the content bytes,
    * emitted long-form (id, bin, cnt) — the feature-extraction stage shape
    * (binary in, feature table out).
    */
  def byteHistogram(
      spark: SparkSession,
      media: DataFrame,
      bins: Int = 16
  ): DataFrame = {
    import spark.implicits._
    media
      .select(col("id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val counts = new Array[Long](bins)
          bytes.foreach { b => counts(((b & 0xff) * bins) / 256) += 1 }
          counts.iterator.zipWithIndex.collect {
            case (c, bin) if c > 0 => (id, bin, c)
          }
        }
      }
      .toDF("id", "bin", "cnt")
  }

  /** Frame sampling for "video" content: fixed-size byte windows at a
    * stride (mapPartitions batch kernel; at scale frames repartition by
    * (id, frameIdx) for downstream parallel decode).
    */
  def frameSample(
      spark: SparkSession,
      media: DataFrame,
      frameSize: Int,
      stride: Int
  ): Dataset[Frame] = {
    import spark.implicits._
    media
      .select(col("id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n =
            if (bytes.length < frameSize) 0
            else (bytes.length - frameSize) / stride + 1
          (0 until n).iterator.map { f =>
            Frame(
              id, f,
              java.util.Arrays.copyOfRange(bytes, f * stride, f * stride + frameSize)
            )
          }
        }
      }
  }

  /** Content-level near-dup pairs over SET-of-fingerprint signatures —
    * the shared engine behind video dedup (fingerprint = a frame's
    * (dHashHi, dHashLo)) and audio dedup (fingerprint = a window's
    * (win, energy)): candidates come from an inverted-index self-join
    * (tracks sharing ANY fingerprint), exact set-Jaccard over the FULL
    * signature sets verifies.
    *
    * Scale guard (`maxDfAbs`, the tfidfPairs cap applied to the binary
    * modality): a fingerprint present in f tracks emits C(f,2)
    * candidate pairs, and real corpora have degenerate fingerprints —
    * solid/black/intro frames, silence windows — with f ≈ corpus size.
    * Fingerprints with df > maxDfAbs are dropped from the CANDIDATE
    * index only (they carry no discriminative signal; a pair sharing
    * nothing else is noise by definition), bounding candidate volume to
    * #fingerprints·maxDfAbs² — linear in the corpus. Verification
    * still counts capped fingerprints: a genuine near-dup pair reaches
    * the verify through any of its discriminative shared fingerprints
    * and gets its exact uncapped Jaccard.
    *
    * @param sig one row per (id, fingerprint components); duplicates
    *            collapse (signatures are sets)
    * @return (id_a < id_b, jaccard) for pairs with jaccard >= jaccardMin
    */
  def fingerprintPairs(
      sig0: DataFrame,
      idCol: String,
      fpCols: Seq[String],
      jaccardMin: Double,
      maxDfAbs: Long = 4096L
  ): DataFrame = {
    require(fpCols.nonEmpty, "need at least one fingerprint column")
    require(maxDfAbs >= 2, s"maxDfAbs must be >= 2 to pair anything: $maxDfAbs")
    val fp = fpCols.map(col)
    val sig = sig0
      .select(col(idCol).cast("long").as("id") +: fp: _*)
      .distinct()
      .localCheckpoint() // feeds sizes + df + both join sides + verify
    val sizes = sig.groupBy(col("id")).agg(count(lit(1)).as("nw"))
    val capped = sig.join(
      sig.groupBy(fp: _*).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDfAbs)
        .select(fp: _*),
      fpCols, "left_semi")
    val cand = capped.as("a")
      .join(capped.as("b"),
        fpCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val common = cand
      .join(sig.select(col("id").as("id_a") +: fp: _*), "id_a")
      .join(
        sig.select(col("id").as("id_b") +: fpCols.map(c => col(c).as(s"${c}_2")): _*),
        "id_b")
      .filter(fpCols.map(c => col(c) === col(s"${c}_2")).reduce(_ && _))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("id").as("id_a"), col("nw").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nw").as("nb")), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= jaccardMin)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
