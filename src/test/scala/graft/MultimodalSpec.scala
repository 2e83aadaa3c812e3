package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Media, MediaCodecs}
import SparkTestSession._

class MultimodalSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world", "s0"), (1L, "abc", "s1"), (2L, "0123456789" * 20, "s2"))
    .toDF("doc_id", "text", "source")

  test("media table derivation: kind cycles, payload is UTF-8 bytes") {
    val m = Media.mediaFromDocuments(docs).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video")) // 1-based element_at
    assert(new String(m(0).payload, "UTF-8") == "hello world")
  }

  test("feature extraction is deterministic and partition-local") {
    val f = Media.extractFeatures(Media.mediaFromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(f.map(_.n_bytes).toSeq == Seq(11L, 3L, 200L))
    val expected = MediaCodecs.decodeStub("image", "hello world".getBytes("UTF-8"))
    assert((f(0).width, f(0).height, f(0).mean_intensity) == expected)
  }

  test("video frame sampling chunks payloads on stride") {
    val frames = Media.sampleFrames(Media.mediaFromDocuments(docs), stride = 2).collect()
      .sortBy(_.frame_no)
    // doc 2 is 'video': 200 bytes → four 64-byte chunks → stride 2 → 2 frames
    assert(frames.length == 2)
    assert(frames.forall(_.media_id == 2L))
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1))
  }

  test("image kind with a REAL encoded PNG decodes via ImageIO (not the stub)") {
    // 2×2 PNG: two black pixels, one white, one mid-gray (128,128,128)
    val im = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0x000000); im.setRGB(1, 0, 0xffffff)
    im.setRGB(0, 1, 0x000000); im.setRGB(1, 1, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray
    val rows = Seq(Media.MediaRow(7L, "image", png, "fixture")).toDS()
    val f = Media.extractFeatures(rows).collect()(0)
    assert((f.width, f.height) == (2, 2))
    assert(math.abs(f.mean_intensity - (0.0 + 255.0 + 0.0 + 128.0) / 4) < 1e-9)
    assert(f.n_bytes == png.length.toLong)
    // direct codec check: real decode found, garbage falls back to None
    assert(MediaCodecs.decodeImage(png).isDefined)
    assert(MediaCodecs.decodeImage("not an image".getBytes).isEmpty)
  }

  test("perceptual aHash: real image path lights the bright half; stub is hand-computable") {
    // 16×16 PNG: left half black, right half white → aHash cells in
    // columns 4..7 of every row are above the mean (bits where cx >= 4)
    val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      im.setRGB(x, y, if (x >= 8) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val bits = MediaCodecs.imageAHashBits(bos.toByteArray).get
    for (j <- 0 until 64)
      assert(bits(j) == (j % 8 >= 4), s"bit $j (cell col ${j % 8})")
    // identical pixels ⇒ identical hash through the Dataset operator
    val rows = Seq(Media.MediaRow(1L, "image", bos.toByteArray, "f"),
      Media.MediaRow(2L, "image", bos.toByteArray, "f")).toDS()
    val hs = Media.perceptualHash(rows).collect().sortBy(_.media_id)
    assert(hs(0).phash_hi == hs(1).phash_hi && hs(0).phash_lo == hs(1).phash_lo)
    assert(hs(0).phash_hi != 0L || hs(0).phash_lo != 0L)
    // stub: 128 bytes, second half high → chunks 32..63 above mean; the
    // packed halves are all-ones hi, all-zeros lo
    val payload = Array.tabulate(128)(i => if (i >= 64) 200.toByte else 10.toByte)
    val (hi, lo) = MediaCodecs.packAHashBits(MediaCodecs.byteAHashBits(payload))
    assert(hi == 0xffffffffL && lo == 0L)
    // constant payload: no chunk exceeds the mean → zero hash
    val (h0, l0) = MediaCodecs.packAHashBits(
      MediaCodecs.byteAHashBits(Array.fill(100)(42.toByte)))
    assert(h0 == 0L && l0 == 0L)
  }

  test("audio kind with a REAL WAV payload decodes via javax.sound (not the stub)") {
    // 100 frames of constant 16-bit sample 16384, mono, 8 kHz, little-endian
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](200)
    var i = 0
    while (i < 200) { pcm(i) = 0x00; pcm(i + 1) = 0x40; i += 2 } // 0x4000 = 16384 LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val rows = Seq(Media.MediaRow(8L, "audio", wav, "fixture")).toDS()
    val f = Media.extractFeatures(rows).collect()(0)
    assert((f.width, f.height) == (100, 1)) // frames × channels
    assert(math.abs(f.mean_intensity - 16384.0 / 32768.0 * 255.0) < 1e-9)
    // garbage bytes are not decodable audio
    assert(MediaCodecs.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("resize: real PNG scales aspect-preserving; stub is raster arithmetic") {
    // 100x40 PNG → fit 64x64 → scale 0.64 → 64x26
    val im = new java.awt.image.BufferedImage(100, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val (w, h, out) = MediaCodecs.resizeImage(bos.toByteArray, 64, 64).get
    assert((w, h) == (64, 26))
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert((decoded.getWidth, decoded.getHeight) == (64, 26))
    // already-inside-the-box image passes through at original size
    assert(MediaCodecs.resizeImage(bos.toByteArray, 200, 200).get._1 == 100)
    // stub: 200-byte payload → 64-wide raster, ceil(200/64)=4 rows
    val (sw, sh, sb) = MediaCodecs.resizeStub(Array.fill[Byte](200)(7), 64, 64)
    assert((sw, sh, sb.length) == (64, 4, 200))
    // end-to-end through the Dataset op on the real fixture
    val rows = Seq(Media.MediaRow(9L, "image", bos.toByteArray, "fixture")).toDS()
    val r = Media.resizeImages(rows, 64, 64).collect()(0)
    assert((r.out_w, r.out_h) == (64, 26))
  }

  test("video kind with a REAL MP4 header probes tkhd dims (not the stub)") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    // tkhd version 0: 4 bytes version+flags, 72 bytes of fixed fields,
    // then 16.16 fixed-point width (320) and height (240)
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0) ++
        be32(320L << 16) ++ be32(240L << 16))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
        "isomiso2".getBytes("US-ASCII")) ++
      box("moov", box("trak", tkhd)) ++
      box("mdat", Array.fill[Byte](32)(5))
    assert(MediaCodecs.probeVideoDims(mp4).contains((320, 240)))
    // through the dispatch: dims from the header, mean from the bytes
    val (w, h, _) = MediaCodecs.decode("video", mp4)
    assert((w, h) == (320, 240))
    // a v1 tkhd (64-bit times) shifts the dims by 12 bytes
    val tkhdV1 = box("tkhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
        be32(1920L << 16) ++ be32(1080L << 16))
    val mp4v1 = box("moov", box("trak", tkhdV1))
    assert(MediaCodecs.probeVideoDims(mp4v1).contains((1920, 1080)))
    // end-to-end through the Dataset op
    val rows = Seq(Media.MediaRow(10L, "video", mp4, "fixture")).toDS()
    val f = Media.extractFeatures(rows).collect()(0)
    assert((f.width, f.height) == (320, 240))
  }

  test("video kind with a REAL AVI header probes avih dims; garbage stays stubbed") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val avihData = le32(33367) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(100) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(640) ++ le32(480) ++ Array.fill[Byte](16)(0) // dwWidth, dwHeight @ 32/36
    val inner = "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(avihData.length) ++ avihData
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4L + inner.length + 8) ++
      "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
    assert(MediaCodecs.probeVideoDims(avi).contains((640, 480)))
    // non-container bytes fall back to the deterministic stub
    val garbage = "0123456789".getBytes("US-ASCII")
    assert(MediaCodecs.probeVideoDims(garbage).isEmpty)
    assert(MediaCodecs.decode("video", garbage) ==
      MediaCodecs.decodeStub("video", garbage))
  }

  test("videoDupGroups: perturbed re-encodes group, unrelated videos stay out") {
    // 320-char payloads → chunks 0..4, sampled keyframes 0,1,2 (stride 2).
    // b = a with byte 1 substituted: keyframe 0 perturbed, keyframes 1,2
    // byte-identical → n_shared >= 2 → grouped. c shares nothing.
    val a = "the quick brown fox jumps over the lazy dog " * 8 // 352 chars
    val b = "X" + a.substring(1)
    val c = "completely different payload content here un" * 8
    val media = Seq(
      Media.MediaRow(2L, "video", a.getBytes("UTF-8"), "s"),
      Media.MediaRow(3000002L, "video", b.getBytes("UTF-8"), "s"),
      Media.MediaRow(5L, "video", c.getBytes("UTF-8"), "s"))
      .toDS()
    val got = Media.videoDupGroups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 2L, 1L), (3000002L, 2L, 0L)),
      s"expected the planted pair grouped under keeper 2, got $got")
  }

  test("keyframeDupEdges equals the brute-force aligned-hamming pair set (pigeonhole complete)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planted = docs
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 2)
      .withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 3000000L)
      .withColumn("text", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("X"),
        org.apache.spark.sql.functions.expr("substring(text, 2)")))
    val media = Media.mediaFromDocuments(docs.unionByName(planted))
      .filter(_.kind == "video")
    // driver-side truth: every aligned frame pair with hamming <= 3
    val frames = Media.sampleFrames(media, stride = 2).collect()
      .map { f =>
        val (hi, lo) = MediaCodecs.packAHashBits(
          MediaCodecs.byteAHashBits(f.frame_bytes))
        (f.media_id, f.frame_no, hi, lo)
      }
    val expected = (for {
      (va, fa, hia, loa) <- frames; (vb, fb, hib, lob) <- frames
      if va < vb && fa == fb
      h = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
      if h <= 3
    } yield ((va, vb), fa)).groupBy(_._1)
      .map { case (p, fs) => (p._1, p._2, fs.map(_._2).distinct.size.toLong) }
      .filter(_._3 >= 2L).toSet
    // production path (blocks built exactly as videoDupGroups does)
    val ph = Media.sampleFrames(media, stride = 2)
      .map { f =>
        val (hi, lo) = MediaCodecs.packAHashBits(
          MediaCodecs.byteAHashBits(f.frame_bytes))
        (f.media_id, f.frame_no.toLong, hi, lo)
      }.toDF("video_id", "frame_no", "hi", "lo")
    val blocks = ph.select(
      org.apache.spark.sql.functions.col("video_id"),
      org.apache.spark.sql.functions.col("frame_no"),
      org.apache.spark.sql.functions.col("hi"),
      org.apache.spark.sql.functions.col("lo"),
      org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.expr(
        "transform(sequence(0, 3), q -> struct(q AS q, " +
          "CASE WHEN q < 2 THEN shiftright(lo, CAST(q * 16 AS INT)) & 65535 " +
          "ELSE shiftright(hi, CAST((q - 2) * 16 AS INT)) & 65535 END AS blk))"))
        .as("qb"))
      .select(org.apache.spark.sql.functions.col("video_id"),
        org.apache.spark.sql.functions.col("frame_no"),
        org.apache.spark.sql.functions.col("hi"),
        org.apache.spark.sql.functions.col("lo"),
        org.apache.spark.sql.functions.col("qb.q"),
        org.apache.spark.sql.functions.col("qb.blk"))
    val got = Media.keyframeDupEdges(blocks, maxHamming = 3, minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"banded candidates diverge from brute force: got ${got.size}, expected ${expected.size}")
  }

  test("mediaStats matches a hand computation") {
    val s = Media.mediaStats(Media.mediaFromDocuments(docs)).collect()
    assert(s(0).getLong(2) == 11L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(s(0).getString(3) == md)
  }

  test("VideoDecoder SPI end-to-end: ServiceLoader-discovered decoder makes decode AND frame sampling real") {
    import graft.multimodal.{SyntheticRawVideoDecoder, VideoDecoder}
    VideoDecoder.clear() // no explicit registration: discovery must answer
    assert(VideoDecoder.active.exists(_.isInstanceOf[SyntheticRawVideoDecoder]),
      s"ServiceLoader did not discover the test-scope decoder: ${VideoDecoder.active}")
    val f0 = Array.fill(12)(10.toByte)
    val f1 = Array.fill(12)(30.toByte)
    val payload = SyntheticRawVideoDecoder.container(4, 3, Seq(f0, f1))
    // decode: true container dims + true pixel mean — values neither the
    // probe (no MP4/AVI header here) nor the stub could produce
    assert(MediaCodecs.decode("video", payload) == ((4, 3, 20.0)))
    // frame sampling: REAL frame boundaries (2 frames of w*h=12 bytes),
    // not the stub's 64-byte chunking (which would yield ONE 34-byte chunk)
    val ds = Seq(Media.MediaRow(1L, "video", payload, "spi")).toDS()
    val frames = Media.sampleFrames(ds).collect().sortBy(_.frame_no)
    assert(frames.length == 2)
    assert(frames(0).frame_bytes.toSeq == f0.toSeq)
    assert(frames(1).frame_bytes.toSeq == f1.toSeq)
    // a payload the decoder declines keeps the stub chain end to end
    val garbage = ("x" * 100).getBytes("US-ASCII")
    assert(MediaCodecs.decode("video", garbage) == MediaCodecs.decodeStub("video", garbage))
    val stubFrames = Media.sampleFrames(
      Seq(Media.MediaRow(2L, "video", garbage, "spi")).toDS()).collect()
    assert(stubFrames.map(_.frame_bytes.toSeq).toSeq ==
      MediaCodecs.frameSampleStub(garbage, 2).map(_.toSeq).toSeq)
  }

  test("VideoDecoder SPI: a registered decoder takes over video decode; clear restores the default") {
    import graft.multimodal.VideoDecoder
    val garbage = "0123456789".getBytes("US-ASCII")
    val stubAnswer = MediaCodecs.decodeStub("video", garbage)
    // default chain: probe fails on garbage → stub
    assert(MediaCodecs.decode("video", garbage) == stubAnswer)
    // inject an "ffmpeg-backed" decoder (deterministic fake with the SPI's
    // real signature): fixed dims, intensity = first payload byte
    VideoDecoder.register(new VideoDecoder {
      def decode(payload: Array[Byte]): Option[(Int, Int, Double)] =
        if (payload.isEmpty) None
        else Some((640, 480, (payload(0) & 0xff).toDouble))
    })
    try {
      assert(MediaCodecs.decode("video", garbage) == ((640, 480, '0'.toInt.toDouble)))
      // a decoder that declines (None) falls back to the default chain
      VideoDecoder.register(new VideoDecoder {
        def decode(payload: Array[Byte]): Option[(Int, Int, Double)] = None
      })
      assert(MediaCodecs.decode("video", garbage) == stubAnswer)
    } finally VideoDecoder.clear()
    assert(MediaCodecs.decode("video", garbage) == stubAnswer)
    // image/audio dispatch is untouched by registration state
    assert(MediaCodecs.decode("image", garbage) ==
      MediaCodecs.decodeStub("image", garbage))
  }

  test("audioVadSegments: active islands merge, the silent gap splits them") {
    // frames of 32 bytes: loud 'z'(122) frames clear the 95-mean gate,
    // silent ' '(32) frames don't → segments [0,1] and [3,3]
    val loud = "z" * 32
    val silent = " " * 32
    val payload = loud + loud + silent + loud
    val media = Seq(Media.MediaRow(4L, "audio", payload.getBytes("UTF-8"), "s"))
      .toDS()
    val out = Media.audioVadSegments(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((4L, 1L, 0L, 1L, 2L), (4L, 2L, 3L, 3L, 1L)),
      s"got ${out.toSeq}")
  }

  test("videoSceneCuts: identical adjacent keyframes score 0, an inverted block cuts at 64") {
    // payload = four copies of block A (32 'a' + 32 'z') then B = ~A:
    // chunks c0..c4, sampled keyframes f0=A, f1=A(c2), f2=B(c4).
    // aHash bits are byte>mean per position → A and B invert all 64 bits.
    val a = "a" * 32 + "z" * 32
    val b = "z" * 32 + "a" * 32
    val media = Seq(Media.MediaRow(2L, "video", (a * 4 + b).getBytes("UTF-8"), "s"))
      .toDS()
    val out = Media.videoSceneCuts(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out == Seq((2L, 1L, 0L, false), (2L, 2L, 64L, true)), s"got $out")
  }
}
