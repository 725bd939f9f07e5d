package graft

import graft.core.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary transport, per-partition batch extraction,
  * real content-derived features, content-hash dedup join.
  */
class MultimodalSpec extends SparkSpec {

  test("documents ride as binary payloads and featurize per partition") {
    val docs  = Tables(spark, "/root/testdata/sf0.001").documents
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "image")
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    val row = feats.filter(col("media_id") === 0).head()
    assert(row.feature.isEmpty) // text bytes don't decode as an image
    assert(row.n_bytes > 0)

    // deterministic: re-extraction yields identical features + hashes
    val again = Multimodal.extractFeatures(media)
    val a = feats.select("media_id", "content_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = again.select("media_id", "content_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("content hash joins features back without rereading payloads") {
    val docs  = Tables(spark, "/root/testdata/sf0.001").documents.limit(50)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "image")
    val feats = Multimodal.extractFeatures(media)
    // identical payloads → identical hash (exact dedup on media)
    val dupGroups = feats.groupBy("content_hash").count().filter(col("count") > 1).count()
    assert(dupGroups == 0) // all sf0.001 docs are distinct
  }

  test("javax.imageio branch decodes real PNGs: width/height/channel means") {
    import spark.implicits._
    // fixture: id=17 -> 4x3 PNG of constant color (51, 85, 119)
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(17L))
    assert(img.contains((4, 3, 51.0, 85.0, 119.0)))
    // undecodable bytes are a data condition, not a failure
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // end to end through the batched extractor: image decodes, audio stays
    // stubbed, modality routing decides
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.syntheticPng(1L), "s://1"),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](1, 2, 3), "s://2")).toDS()
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(out(0).is_decoded && out(0).image_width.contains(2L) &&
      out(0).image_height.contains(2L))
    assert(out(0).mean_r.contains(3.0) && out(0).mean_g.contains(5.0) &&
      out(0).mean_b.contains(7.0))
    assert(!out(1).is_decoded && out(1).image_width.isEmpty && out(1).mean_r.isEmpty)
  }

  test("dHash64 is a perceptual gradient hash: stable in-family, far cross-family") {
    def h(id: Long): Long =
      Multimodal.dHash64(Multimodal.syntheticPatternPng(id)).get
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // same family (id % 16), different variants: near-duplicates
    assert(ham(h(3L), h(19L)) <= 7)
    assert(ham(h(3L), h(3L + 16 * 20)) <= 7)
    // different families: far apart
    assert(ham(h(3L), h(4L)) > 7)
    // uniform brightness shift leaves GRADIENTS (and so the hash) intact:
    // re-render family 3 with every pixel +5
    val img = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 36) {
      var g = (x * (3 + 3 % 5) + y * (5 + 3 % 7) + 3 * 37) % 180 + 10 + 5
      if ((x * 7 + y * 11) % 23 == 0) g += 60
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dHash64(bos.toByteArray).get === h(3L))
    // undecodable payloads: data condition, not a failure
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash64(null).isEmpty)
  }

  test("resizeImage rescales for real; resizeAll passes non-images through") {
    import spark.implicits._
    // constant-color 4x3 source (id=17) → 5x4: dims change, color survives
    val resized = Multimodal.resizeImage(Multimodal.syntheticPng(17L), 5, 4)
    assert(resized.isDefined)
    assert(Multimodal.decodeImage(resized.get).contains((5, 4, 51.0, 85.0, 119.0)))
    assert(Multimodal.resizeImage("junk".getBytes("UTF-8"), 5, 4).isEmpty)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.syntheticPng(1L), "s://1"),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](1, 2, 3), "s://2")).toDS()
    val out = Multimodal.resizeAll(media, 6, 2).collect().sortBy(_.media_id)
    assert(Multimodal.decodeImage(out(0).payload).contains((6, 2, 3.0, 5.0, 7.0)))
    assert(out(1).payload.toSeq == Seq[Byte](1, 2, 3)) // untouched
  }

  test("GVID container round-trips and sampleFrames decodes every k-th frame") {
    import spark.implicits._
    val vid = Multimodal.syntheticVideo(17L, 4)
    assert(Multimodal.videoFrames(vid).length == 4)
    assert(Multimodal.videoFrames("junk".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.videoFrames(null).isEmpty)
    val media = Seq(
      Multimodal.MediaRecord(17L, "video", vid, "s://17"),
      Multimodal.MediaRecord(9L, "image", Multimodal.syntheticPng(9L), "s://9")).toDS()
    val out = Multimodal.sampleFrames(media, every = 2).collect().sortBy(_.frame_idx)
    // frames 0 and 2 of video 17; image rows are not videos → skipped
    assert(out.map(f => (f.media_id, f.frame_idx)).toSeq == Seq((17L, 0L), (17L, 2L)))
    val f0 = out(0) // frame 0 = syntheticPng(17*31+0 = 527)
    assert(f0.frame_width == 527 % 7 + 1 && f0.frame_height == 527 % 5 + 1)
    assert(f0.mean_r == (527 * 3) % 256 && f0.mean_g == (527 * 5) % 256 &&
      f0.mean_b == (527 * 7) % 256)
  }

  test("RIFF parser decodes synthetic WAVs exactly; rejects non-WAV payloads") {
    import graft.operators.Multimodal
    for (id <- Seq(0L, 3L, 49L, 123L)) {
      val Some((rate, n, mean)) = Multimodal.decodeWav(Multimodal.syntheticWav(id))
      assert(rate == 8000 + (id % 4).toInt * 4000)
      assert(n == (id % 50) + 10)
      val expected = (0 until n.toInt)
        .map(i => math.abs((id * 31 + i * 17) % 2001 - 1000)).sum.toDouble / n
      assert(mean == expected, s"id=$id mean $mean != $expected")
    }
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    // a stereo/8-bit WAV is valid RIFF but outside the PCM-16-mono contract
    val w = Multimodal.syntheticWav(7L)
    w(22) = 2 // channels := 2
    assert(Multimodal.decodeWav(w).isEmpty)
  }

  test("audioFingerprint64 is a perceptual envelope hash: stable in-family, far cross-family") {
    def h(id: Long): Long =
      Multimodal.audioFingerprint64(Multimodal.syntheticToneWav(id)).get
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // same family (id % 16), different variants: near-duplicates
    assert(ham(h(3L), h(19L)) <= 7)
    assert(ham(h(3L), h(3L + 16 * 20)) <= 7)
    // different families: far apart
    assert(ham(h(3L), h(4L)) > 7)
    // independent arithmetic restatement (the oracle's formula) for id=5:
    // 65 bands of 4 samples, bit k = band k quieter than band k+1
    val id = 5L
    val f  = (id % 16).toInt
    val v  = id / 16
    val samples = (0 until 260).map { i =>
      val base = ((i.toLong * (17 + 26 * f) + 97L * f) % 2001) - 1000
      if ((i * 7 + v * 53) % 131 == v % 131) base + 500 else base
    }
    val bands = samples.grouped(4).map(_.map(math.abs).sum).toArray
    var expect = 0L
    for (k <- 0 until 64) if (bands(k) < bands(k + 1)) expect |= 1L << k
    assert(h(id) === expect)
    // uniform gain ×2 scales every band energy equally: the envelope's
    // up/down sequence (and so the hash) is invariant — the property an
    // exact content hash lacks
    val wav = Multimodal.syntheticToneWav(3L)
    val bb  = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 260)
      bb.putShort(44 + i * 2, (bb.getShort(44 + i * 2) * 2).toShort)
    assert(Multimodal.audioFingerprint64(wav).get === h(3L))
    // band-unaligned lengths go through the mean cross-multiplication
    // (syntheticWav clips are 10–59 samples: most bands empty) — still a
    // deterministic hash, not an error
    assert(Multimodal.audioFingerprint64(Multimodal.syntheticWav(7L)).isDefined)
    // undecodable payloads: data condition, not a failure
    assert(Multimodal.audioFingerprint64("not a wav".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.audioFingerprint64(null).isEmpty)
  }

  test("decoders terminate without throwing on adversarial bytes (fuzz)") {
    import org.scalatest.concurrent.TimeLimits._
    import org.scalatest.time.{Seconds, Span}
    // the round-6 advisor found a chunk header that made decodeWav loop
    // forever; this pins the fix class-wide: random byte strings AND
    // every single-byte corruption of valid headers must return promptly
    failAfter(Span(60, Seconds)) {
      val rnd = new scala.util.Random(42) // test-only randomness
      for (_ <- 0 until 300) {
        val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
        Multimodal.decodeWav(bytes)
        Multimodal.imageStats(bytes)
        Multimodal.videoFrames(bytes)
      }
      val wav = Multimodal.syntheticWav(17L)
      for (pos <- 0 until math.min(wav.length, 60)) {
        val m = wav.clone(); m(pos) = (m(pos) ^ 0xFF).toByte
        Multimodal.decodeWav(m) // any Option result is fine; hanging is not
      }
      val png = Multimodal.syntheticPng(17L)
      for (pos <- 0 until math.min(png.length, 60)) {
        val m = png.clone(); m(pos) = (m(pos) ^ 0xFF).toByte
        Multimodal.imageStats(m)
      }
      val vid = Multimodal.syntheticVideo(5L, 2)
      for (pos <- 0 until math.min(vid.length, 60)) {
        val m = vid.clone(); m(pos) = (m(pos) ^ 0xFF).toByte
        Multimodal.videoFrames(m)
      }
    }
  }

  test("feature vectors are real content-derived: hist bins, band sums, frame agg") {
    import spark.implicits._
    // image id=17: 4×3 constant color (51, 85, 119) → whole pixel count in
    // bins 51>>6=0, 85>>6=1, 119>>6=1 of the R/G/B blocks
    val Some(st) = Multimodal.imageStats(Multimodal.syntheticPng(17L))
    assert(st.hist.toSeq == Seq(12L, 0, 0, 0, 0, 12L, 0, 0, 0, 12L, 0, 0))
    // audio id=3: band sums computed from first principles, total = sum
    val Some((_, n3, mean3, bands3)) = Multimodal.wavStats(Multimodal.syntheticWav(3L), 8)
    val samples = (0 until n3.toInt).map(i => math.abs((3L * 31 + i * 17) % 2001 - 1000))
    assert(bands3.toSeq ==
      (0 until 8).map(b => samples.indices.filter(i => i * 8 / n3.toInt == b)
        .map(i => samples(i).toLong).sum))
    assert(bands3.sum == math.round(mean3 * n3)) // integer total consistency
    // video: feature = per-frame hist sums; end to end through the extractor
    val media = Seq(
      Multimodal.MediaRecord(17L, "image", Multimodal.syntheticPng(17L), "s://i"),
      Multimodal.MediaRecord(3L, "audio", Multimodal.syntheticWav(3L), "s://a"),
      Multimodal.MediaRecord(5L, "video", Multimodal.syntheticVideo(5L, 3), "s://v"),
      Multimodal.MediaRecord(9L, "image", "junk".getBytes("UTF-8"), "s://j")).toDS()
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out(17L).feature.toSeq == st.hist.map(_.toFloat).toSeq)
    assert(out(3L).feature.toSeq == bands3.map(_.toFloat).toSeq)
    val expVid = Multimodal.videoFrames(Multimodal.syntheticVideo(5L, 3))
      .flatMap(Multimodal.imageStats).map(_.hist)
      .reduce((a, b) => Array.tabulate(a.length)(i => a(i) + b(i)))
    assert(out(5L).feature.toSeq == expVid.map(_.toFloat).toSeq)
    assert(out(5L).is_decoded) // video now counts as decoded
    assert(out(9L).feature.isEmpty && !out(9L).is_decoded)
  }

  test("q164 pattern videos: container round-trip and family frame sharing") {
    // construction invariants behind the q164 oracle: frame f of video
    // `seq` IS syntheticPatternPng(patternFrameKey(seq, f))
    for (seq <- Seq(0L, 1L, 7L, 8L, 23L)) {
      val frames = Multimodal.videoFrames(Multimodal.syntheticPatternVideo(seq))
      assert(frames.size == Multimodal.patternVideoFrameCount(seq))
      frames.zipWithIndex.foreach { case (png, f) =>
        assert(png.sameElements(
          Multimodal.syntheticPatternPng(Multimodal.patternFrameKey(seq, f))))
      }
    }
    // same family (block of 8), same parity → the shorter video's frame
    // keys are a prefix of the longer's → full frame-hash containment
    def keys(seq: Long) = (0 until Multimodal.patternVideoFrameCount(seq))
      .map(Multimodal.patternFrameKey(seq, _)).toSet
    assert(keys(0L).subsetOf(keys(2L)) || keys(2L).subsetOf(keys(0L)))
    // cross parity overlaps but (for equal lengths) never fully contains
    assert(keys(0L).intersect(keys(3L)).nonEmpty)
    // different families never share a key
    assert(keys(1L).intersect(keys(9L)).isEmpty)
  }
}
