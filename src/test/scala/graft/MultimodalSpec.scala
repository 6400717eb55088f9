package graft

import graft.multimodal.Multimodal

/** The multimodal decode boundary: the real javax.imageio codec for
  * images (lossless PNG round-trip => exact metadata), the declared fake
  * for modalities the JDK cannot decode, and loud failure on bad bytes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageIoDecoder decodes a generated PNG to exact (w, h, mean)") {
    val bytes = Multimodal.grayPng(37, 11, 200)
    val (w, h, mean) = Multimodal.ImageIoDecoder.decode(bytes, "image")
    assert(w == 37 && h == 11)
    assert(mean == 200.0)
  }

  test("ImageIoDecoder mean intensity averages channels per pixel") {
    // 1x2: one pure red (85.0 intensity hand-computed: (255+0+0)/3),
    // one white (255)
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, mean) = Multimodal.ImageIoDecoder.decode(bos.toByteArray, "image")
    assert(w == 2 && h == 1)
    assert(math.abs(mean - (255.0 / 3.0 + 255.0) / 2.0) < 1e-12)
  }

  test("undecodable image bytes fail loudly; audio/video fall back to the stub") {
    val junk = "definitely not a png".getBytes("UTF-8")
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(junk, "image")
    }
    assert(e.getMessage.contains("undecodable"), e.getMessage)
    // non-image modalities delegate to the deterministic fake
    assert(Multimodal.ImageIoDecoder.decode(junk, "audio")
      == Multimodal.DeterministicFakeDecoder.decode(junk, "audio"))
  }

  test("WavDecoder decodes a generated constant-PCM WAV to exact (frames, channels, mean)") {
    val bytes = Multimodal.constWav(nFrames = 40, channels = 2, value = -321)
    val (frames, channels, mean) = Multimodal.WavDecoder.decode(bytes, "audio")
    assert(frames == 40 && channels == 2)
    assert(mean == -321.0)
    // mono, positive value, single frame — header/endianness edge
    val (f1, c1, m1) =
      Multimodal.WavDecoder.decode(Multimodal.constWav(1, 1, 1000), "audio")
    assert(f1 == 1 && c1 == 1 && m1 == 1000.0)
  }

  test("rampWav round-trips sample-exact through the real codec; energy windows partition frames") {
    val wav = Multimodal.rampWav(150, a = 7, b = 3)
    val (frames, channels, samples) = Multimodal.wavSamples(wav)
    assert(frames == 150 && channels == 1)
    (0 until 150).foreach { i =>
      assert(samples(i) == ((7 + i * 3) % 1000).toShort, s"sample $i")
    }
    val media = Seq((1L, "audio", wav, 0L))
      .toDF("id", "modality", "content", "metaLen")
    val wins = Multimodal.audioEnergy(spark, media, windowFrames = 64)
      .collect().sortBy(_.win)
    assert(wins.map(_.nFrames).toSeq == Seq(64, 64, 22))
    val expect = (128 until 150).map { i =>
      val v = (7L + i * 3) % 1000; v * v
    }.sum
    assert(wins(2).energy == expect)
  }

  test("undecodable audio bytes fail loudly; image/video fall back to the stub") {
    val junk = "definitely not a wav".getBytes("UTF-8")
    val e = intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decode(junk, "audio")
    }
    assert(e.getMessage.contains("undecodable"), e.getMessage)
    assert(Multimodal.WavDecoder.decode(junk, "video")
      == Multimodal.DeterministicFakeDecoder.decode(junk, "video"))
  }

  test("decodeMeta over a PNG media table uses the real codec end-to-end") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val media = (0L until 20L).map { i =>
      val w = (i % 5 + 1).toInt
      val h = (i % 3 + 1).toInt
      (i, "image", Multimodal.grayPng(w, h, (i * 11 % 256).toInt), 0L)
    }.toDF("id", "modality", "content", "metaLen")
    val out = Multimodal
      .decodeMeta(spark, media, Multimodal.ImageIoDecoder)
      .collect()
    assert(out.length == 20)
    out.foreach { d =>
      assert(d.width == (d.id % 5 + 1).toInt, d)
      assert(d.height == (d.id % 3 + 1).toInt, d)
      assert(d.meanByte == (d.id * 11 % 256).toDouble, d)
    }
  }

  test("gradient PNG round-trips through the real codec pixel-exactly") {
    import spark.implicits._
    val media = Seq((1L, "image", Multimodal.gradientPng(5, 4, 3, 5), 0L))
      .toDF("id", "modality", "content", "metaLen")
    val d = Multimodal.decodeMeta(spark, media, Multimodal.ImageIoDecoder)
      .collect().head
    assert(d.width == 5 && d.height == 4)
    val want = (for (y <- 0 until 4; x <- 0 until 5)
      yield ((3 * x + 5 * y) % 256).toDouble).sum / 20
    assert(d.meanByte == want, d)
  }

  test("nearest-neighbor resize: identity at same dims, exact means up and down") {
    import spark.implicits._
    val media = Seq((1L, "image", Multimodal.gradientPng(8, 6, 3, 5), 0L))
      .toDF("id", "modality", "content", "metaLen")
    def nnMean(w: Int, h: Int, w2: Int, h2: Int): Double =
      (for (y <- 0 until h2; x <- 0 until w2)
        yield ((3 * (x * w / w2) + 5 * (y * h / h2)) % 256).toDouble)
        .sum / (w2 * h2)
    val same = Multimodal.resizeMeta(spark, media, 8, 6).collect().head
    assert(same.width == 8 && same.height == 6)
    assert(same.meanResized == nnMean(8, 6, 8, 6))
    val down = Multimodal.resizeMeta(spark, media, 3, 2).collect().head
    assert(down.meanResized == nnMean(8, 6, 3, 2))
    val up = Multimodal.resizeMeta(spark, media, 16, 9).collect().head
    assert(up.meanResized == nnMean(8, 6, 16, 9))
  }

  test("motion-PNG container: per-frame ImageIO decode, exact stats, malformed raises") {
    import spark.implicits._
    val bytes = Multimodal.pngVideo(w = 4, h = 3, nFrames = 3, baseGray = 254)
    val media = Seq((7L, bytes)).toDF("id", "content")
    val d = Multimodal.decodeVideoMeta(spark, media).collect().head
    assert(d.nFrames == 3 && d.width == 4 && d.height == 3)
    // grays 254, 255, 0 (wrap) -> mean of frame means = 509/3
    assert(d.meanIntensity == (254.0 + 255.0 + 0.0) / 3, d)
    val bad = Seq((8L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))).toDF("id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoMeta(spark, bad).collect()
    }
  }

  test("animated GIF: real-world container round-trips per-frame through the JDK codec") {
    import spark.implicits._
    val bytes = Multimodal.gifVideo(w = 4, h = 3, nFrames = 3, baseGray = 254)
    // it really is a GIF — the standard magic, readable by any GIF tool
    assert(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
    val media = Seq((7L, bytes)).toDF("id", "content")
    val d = Multimodal.decodeVideoMeta(spark, media).collect().head
    assert(d.nFrames == 3 && d.width == 4 && d.height == 3)
    // grays 254, 255, 0 (wrap) survive the 256-gray palette losslessly
    assert(d.meanIntensity == (254.0 + 255.0 + 0.0) / 3, d)
    // one entry point, two containers: GIF and the motion-PNG fallback
    // decode identically through the magic-byte dispatch
    val mixed = Seq(
      (1L, Multimodal.gifVideo(5, 2, 4, 10)),
      (2L, Multimodal.pngVideo(5, 2, 4, 10))
    ).toDF("id", "content")
    val rows = Multimodal.decodeVideoMeta(spark, mixed).collect()
      .map(r => (r.nFrames, r.width, r.height, r.meanIntensity)).toSet
    assert(rows == Set((4, 5, 2, (10.0 + 11 + 12 + 13) / 4)), rows.toString)
  }

  test("audio resample: identity at source rate, floor-index downsample, mono enforced") {
    import spark.implicits._
    // ramp 10,13,16,19 (a=10,b=3,n=4)
    val wav = Multimodal.rampWav(nFrames = 4, a = 10, b = 3)
    val media = Seq((1L, "audio", wav, 0L))
      .toDF("id", "modality", "content", "metaLen")
    // identity: outFrames == nIn reads every sample once
    val idn = Multimodal.resampleAudio(spark, media, outFrames = 4).collect().head
    assert(idn.nIn == 4 && idn.energy == 100L + 169 + 256 + 361)
    // downsample to 2: indices floor(0*4/2)=0, floor(1*4/2)=2 -> 10,16
    val dn = Multimodal.resampleAudio(spark, media, outFrames = 2).collect().head
    assert(dn.energy == 100L + 256 && dn.rms == math.sqrt((100.0 + 256) / 2))
    // upsample to 8: each source sample read twice
    val up = Multimodal.resampleAudio(spark, media, outFrames = 8).collect().head
    assert(up.energy == 2 * idn.energy)
    val stereo = Seq((2L, "audio", Multimodal.constWav(4, 2, 5), 0L))
      .toDF("id", "modality", "content", "metaLen")
    intercept[org.apache.spark.SparkException] {
      Multimodal.resampleAudio(spark, stereo, 4).collect()
    }
  }

  test("motion score: unit steps, palette wrap, single-frame NULL, both containers") {
    import spark.implicits._
    // grays 254, 255, 0: transitions |255-254|=1 and |0-255|=255
    val media = Seq(
      (1L, Multimodal.gifVideo(w = 4, h = 3, nFrames = 3, baseGray = 254)),
      (2L, Multimodal.pngVideo(w = 4, h = 3, nFrames = 3, baseGray = 254)),
      (3L, Multimodal.gifVideo(w = 4, h = 3, nFrames = 1, baseGray = 10))
    ).toDF("id", "content")
    val r = Multimodal.motionScore(spark, media).collect()
      .map(v => v.id -> v).toMap
    assert(r(1L).nFrames == 3 && r(1L).motion.contains((1.0 + 255.0) / 2))
    // the fallback container decodes identically through the dispatch
    assert(r(2L).motion == r(1L).motion)
    // single frame: no transitions
    assert(r(3L).nFrames == 1 && r(3L).motion.isEmpty)
    val bad = Seq((9L, Array[Byte](1, 2, 3, 4, 5))).toDF("id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.motionScore(spark, bad).collect()
    }
  }

  test("dHash: size-invariant for a scaled copy, discriminates gradients, undecodable raises") {
    import spark.implicits._
    // same no-wrap gradient at 20x16 and 40x32 (a 2x scaled copy — byte
    // hashing can never pair them; the perceptual hash must), plus a
    // WRAPPING gradient (a=50 overflows 256 every ~5 px, flipping some
    // x-difference bits to 0 — dHash is an x-difference sign map, so only
    // wrap structure separates monotone gradients)
    val media = Seq(
      (1L, "image", Multimodal.gradientPng(20, 16, 2, 3), 0L),
      (2L, "image", Multimodal.gradientPng(40, 32, 2, 3), 0L),
      (3L, "image", Multimodal.gradientPng(20, 16, 50, 3), 0L)
    ).toDF("id", "modality", "content", "metaLen")
    val h = Multimodal.dHash(spark, media).collect()
      .map(x => x.id -> (x.hashHi, x.hashLo)).toMap
    assert(h(1L) == h(2L), s"scaled copy split: $h")
    assert(h(1L) != h(3L), s"different gradients collided: $h")
    // no-wrap increasing gradient: every x-difference bit is 1
    assert(h(1L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)), h)

    val bad = Seq((9L, "image", Array[Byte](1, 2, 3), 0L))
      .toDF("id", "modality", "content", "metaLen")
    intercept[org.apache.spark.SparkException] {
      Multimodal.dHash(spark, bad).collect()
    }
  }

  test("videoFrameHashes: per-frame == image dHash of the same content; trims overlap") {
    import spark.implicits._
    // video of gradient frames at offsets {0,1,2}; a "trimmed copy" at
    // {1,2}; an unrelated class. Frame hash must equal the image dHash
    // of an identically-generated still (one kernel, two containers).
    def frame(off: Int) = {
      // same pixel law as gifVideoGradient: (a·x + b·y + 40·off) % 256
      val w = 20; val h = 16
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, (37 * x + 25 * y + 40 * off) % 256)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val vids = Seq(
      (1L, Multimodal.gifVideoGradient(20, 16, Seq(0, 1, 2), 37, 25, 40)),
      (2L, Multimodal.gifVideoGradient(20, 16, Seq(1, 2), 37, 25, 40)),
      (3L, Multimodal.gifVideoGradient(20, 16, Seq(0, 1), 91, 13, 40))
    ).toDF("id", "content")
    val fh = Multimodal.videoFrameHashes(spark, vids).collect()
      .groupBy(_.id).view
      .mapValues(_.map(f => (f.hashHi, f.hashLo)).toSet).toMap
    val still = Seq(
      (10L, "image", frame(0), 0L), (11L, "image", frame(1), 0L),
      (12L, "image", frame(2), 0L)
    ).toDF("id", "modality", "content", "metaLen")
    val ih = Multimodal.dHash(spark, still).collect()
      .map(x => x.id -> ((x.hashHi, x.hashLo))).toMap
    assert(fh(1L) == Set(ih(10L), ih(11L), ih(12L)),
      s"GIF frame hashes diverge from still-image dHash: ${fh(1L)} vs $ih")
    // the trimmed copy's signature is a strict subset -> Jaccard 2/3
    assert(fh(2L).subsetOf(fh(1L)) && fh(2L).size == 2)
    // unrelated class shares nothing
    assert((fh(3L) & fh(1L)).isEmpty, s"${fh(3L)} overlaps ${fh(1L)}")
  }

  test("fingerprintPairs: planted ubiquitous fingerprint never generates candidates; verify stays exact") {
    // 10 tracks; fingerprint (0,0) is in EVERY one (the black-frame /
    // silence-window degenerate) — uncapped it alone fans out C(10,2) =
    // 45 candidate pairs; tracks 1 and 2 additionally share 3 genuine
    // fingerprints (a real near-dup pair)
    val rows =
      (1L to 10L).map(id => (id, 0L, 0L)) ++ // ubiquitous
        Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L),
          (2L, 1L, 1L), (2L, 2L, 2L), (2L, 3L, 3L)) ++
        (3L to 10L).map(id => (id, id * 100, id * 100)) // own noise
    val sig = rows.toDF("id", "f1", "f2")
    // cap 5 kills the df=10 fingerprint from the candidate index: only
    // the genuine pair survives, and its Jaccard still counts the
    // ubiquitous fingerprint in BOTH sets (4 shared / 4 union = 1.0)
    val capped = Multimodal
      .fingerprintPairs(sig, "id", Seq("f1", "f2"), jaccardMin = 0.0, maxDfAbs = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet == Set((1L, 2L)), s"capped candidates: $capped")
    assert(capped((1L, 2L)) == 1.0, s"verify must be uncapped-exact: $capped")
    // without the cap the degenerate fingerprint pairs everything: 45
    // candidate pairs reach the verify — the quadratic tail the cap cuts
    val uncapped = Multimodal
      .fingerprintPairs(sig, "id", Seq("f1", "f2"), jaccardMin = 0.0, maxDfAbs = 1000)
      .count()
    assert(uncapped == 45L, s"uncapped pair count: $uncapped")
  }

  test("sceneCuts: planted boundaries flagged exactly; drift below tau tolerated") {
    import spark.implicits._
    // video 1: two static shots (gradient inverted at frame 3) ->
    // exactly one cut; video 2: one shot with small c-drift -> no cuts
    val v1 = Multimodal.gifVideoScenes(32, 16,
      Seq.fill(3)((35, 25, 0)) ++ Seq.fill(2)((221, 25, 0)))
    val v2 = Multimodal.gifVideoScenes(32, 16,
      (0 until 4).map(j => (35, 25, 2 * j)))
    val media = Seq((1L, v1), (2L, v2)).toDF("id", "content")
    val got = Multimodal.sceneCuts(spark, media, tau = 8)
      .as[(Long, Long, Long, Boolean)].collect()
    val cuts = got.filter(_._4)
    assert(cuts.map(r => (r._1, r._2)).toSeq == Seq((1L, 3L)),
      got.mkString(","))
    // within-shot static frames are hash-identical
    assert(got.filter(r => r._1 == 1L && r._2 != 3L).forall(_._3 == 0L))
    // the drifting shot stays under tau but may move a little
    assert(got.filter(_._1 == 2L).forall(_._3 <= 8L))
    // three-scene video: both boundaries surface
    val v3 = Multimodal.gifVideoScenes(32, 16,
      Seq.fill(2)((35, 25, 0)) ++ Seq.fill(2)((221, 25, 0))
        ++ Seq.fill(2)((35, 150, 0)))
    val got3 = Multimodal.sceneCuts(
        spark, Seq((3L, v3)).toDF("id", "content"), tau = 8)
      .filter(org.apache.spark.sql.functions.col("is_cut"))
      .select(org.apache.spark.sql.functions.col("frame"))
      .as[Long].collect().sorted
    assert(got3.toSeq == Seq(2L, 4L), got3.mkString(","))
  }

  test("mm_keyframes: shots tile the video, keyframe = shot start, boundary strength carried") {
    // the declared sf0.001 fixture plants exactly one boundary per video
    // at n1 = id % 3 + 2 with total n1 + n2 frames
    val rows = SparkEntry.queries("mm_keyframes")(spark, sf0001)
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (id, rs) =>
      assert(rs.length == 2, s"video $id: ${rs.length} shots")
      val byShot = rs.sortBy(_.getLong(1))
      val n1 = id % 3 + 2
      val n2 = id % 2 + 2
      // shot 1: starts at 0, no opening boundary, runs to the cut
      assert(byShot(0).getLong(2) == 0L && byShot(0).getLong(4) == 0L)
      assert(byShot(0).getLong(3) == n1, s"video $id shot1 ${byShot(0)}")
      // shot 2: starts at the planted cut, strong boundary
      assert(byShot(1).getLong(2) == n1 && byShot(1).getLong(3) == n2)
      assert(byShot(1).getLong(4) > 4, s"video $id boundary ${byShot(1)}")
      // shots tile: lengths sum to the frame total
      assert(rs.map(_.getLong(3)).sum == n1 + n2)
    }
  }

  test("audioSegments: RLE spans, states, exact energies; single-state and partial-window clips") {
    import spark.implicits._
    // silence(2w) -> tone 120 (3w) -> silence(1w) at 64-frame windows
    val wav = Multimodal.pulseWav(Seq(
      (128, 0.toShort), (192, 120.toShort), (64, 0.toShort)))
    val media = Seq((1L, "audio", wav, 0L))
      .toDF("id", "modality", "content", "metaLen")
    val segs = Multimodal
      .audioSegments(spark, media, windowFrames = 64, rmsThresh = 50.0)
      .as[(Long, Long, Boolean, Long, Long, Long)].collect().sortBy(_._2)
    assert(segs.map(r => (r._2, r._3, r._4, r._5)).toSeq ==
      Seq((0L, false, 0L, 2L), (1L, true, 2L, 3L), (2L, false, 5L, 1L)))
    assert(segs(1)._6 == 3L * 64 * 120 * 120 && segs(0)._6 == 0L)
    // all-silent clip -> one inactive segment
    val quiet = Seq((2L, "audio",
      Multimodal.pulseWav(Seq((256, 3.toShort))), 0L))
      .toDF("id", "modality", "content", "metaLen")
    val q = Multimodal
      .audioSegments(spark, quiet, windowFrames = 64, rmsThresh = 50.0)
      .as[(Long, Long, Boolean, Long, Long, Long)].collect()
    assert(q.length == 1 && !q(0)._3 && q(0)._5 == 4L)
    assert(q(0)._6 == 256L * 9, "energy must sum even below the gate")
    // partial final window: 96 loud frames = 1 full + 1 half window
    val part = Seq((3L, "audio",
      Multimodal.pulseWav(Seq((96, 200.toShort))), 0L))
      .toDF("id", "modality", "content", "metaLen")
    val pr = Multimodal
      .audioSegments(spark, part, windowFrames = 64, rmsThresh = 50.0)
      .as[(Long, Long, Boolean, Long, Long, Long)].collect()
    assert(pr.length == 1 && pr(0)._3 && pr(0)._5 == 2L)
    assert(pr(0)._6 == 96L * 200 * 200)
  }
}
