package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video as opaque BINARY payloads
  * with typed metadata, processed partition-wise.
  *
  * The Spark-side plumbing — schema, typed Dataset rows, partition-batched
  * processing, explode of extracted frames — is real and tested. The codec
  * layer (JPEG decode, audio resample, …) is a clearly marked STUB
  * ([[MediaCodecs]]): this container has no image/audio libraries, so the
  * stubs produce deterministic fake decodes with the exact signature a real
  * codec would have. Swapping in a real codec changes one function, not the
  * dataflow.
  *
  * Scale: payloads never leave their partition (mapPartitions, no shuffle);
  * feature rows are small; downstream joins happen on media_id.
  */
object Media {

  /** A media row: `payload` is the raw encoded bytes. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            source: String)
  /** Extracted features: one row per media item. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, mean_intensity: Double)
  /** A sampled frame from a video payload. */
  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Derive a deterministic media table from `documents` (the testdata has
    * no binary table): payload = UTF-8 bytes of the text, kind cycles
    * image/audio/video. Stands in for `spark.read.format("binaryFile")`.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents
      .select(col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaRow]
  }

  /** Perceptual-hash row: the 64-bit average-hash split into two
    * non-negative BIGINT halves.
    */
  final case class PHash(media_id: Long, phash_hi: Long, phash_lo: Long)

  /** 64-bit perceptual average-hash per media row — the image near-dup
    * key (hamming-close hashes ⇒ visually-near-identical images; exact
    * dups hash equal, so groupBy(phash) is the multimodal analogue of
    * text exact-dedup). Real path: 8×8 luminance aHash over the decoded
    * image; stub path (and `realCodecs = false`, which the oracle query
    * pins): the byte-chunk aHash — both decide bits by exact integer
    * cross-multiplication, no FP. Banding/pairing reuses the SimHash
    * hamming machinery downstream.
    */
  def perceptualHash(media: Dataset[MediaRow],
                     realCodecs: Boolean = true): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bits =
          if (realCodecs && r.kind == "image")
            MediaCodecs.imageAHashBits(r.payload)
              .getOrElse(MediaCodecs.byteAHashBits(r.payload))
          else MediaCodecs.byteAHashBits(r.payload)
        val (hi, lo) = MediaCodecs.packAHashBits(bits)
        PHash(r.media_id, hi, lo)
      }
    }
  }

  /** Decode + feature-extract, one partition at a time. A real
    * implementation would hold one codec context per partition (the reason
    * for mapPartitions rather than a per-row UDF).
    *
    * `realCodecs = false` pins every row to the deterministic stub
    * arithmetic — the declared oracle query uses it so its DuckDB replay
    * is exact BY CONSTRUCTION (the test table derives payloads from text;
    * with the dispatch on, a payload that happened to parse as a real
    * container would silently diverge from the stub-replaying oracle).
    * Real binary sources use the default (true): ImageIO / javax.sound
    * decode with stub fallback for undecodable bytes.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      realCodecs: Boolean = true): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, mean) =
          if (realCodecs) MediaCodecs.decode(r.kind, r.payload)
          else MediaCodecs.decodeStub(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, mean)
      }
    }
  }

  /** A resize result: target-bounded dimensions + the transformed payload. */
  final case class Resized(media_id: Long, out_w: Int, out_h: Int,
                           out_bytes: Array[Byte])

  /** Resize image payloads to fit `(maxW, maxH)` (aspect preserved),
    * partition-local like every codec op. Real path: ImageIO decode →
    * bilinear scale → PNG re-encode. Payloads that are not decodable
    * images go through the deterministic stub transform instead
    * ([[MediaCodecs.resizeStub]]) — `realCodecs = false` pins the stub for
    * the declared oracle query (same convention as [[extractFeatures]]).
    */
  def resizeImages(media: Dataset[MediaRow], maxW: Int = 64, maxH: Int = 64,
                   realCodecs: Boolean = true): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, bytes) =
          if (realCodecs) MediaCodecs.resizeImage(r.payload, maxW, maxH)
            .getOrElse(MediaCodecs.resizeStub(r.payload, maxW, maxH))
          else MediaCodecs.resizeStub(r.payload, maxW, maxH)
        Resized(r.media_id, w, h, bytes)
      }
    }
  }

  /** Oracle-friendly inventory over [[resizeImages]]: one row per resized
    * image with output dims, byte count, and a byte digest.
    *
    * The digest is md5 of the HEX of the bytes (both engines emit
    * uppercase hex): DuckDB's md5 only accepts VARCHAR, and
    * `substr(text, …)` counts CHARACTERS — hashing a raw byte prefix of
    * non-ASCII text would silently diverge. Hex-encoding first makes the
    * digest byte-exact for ANY payload on both engines.
    */
  def resizeStats(media: Dataset[MediaRow], maxW: Int = 64, maxH: Int = 64,
                  realCodecs: Boolean = true): DataFrame = {
    resizeImages(media, maxW, maxH, realCodecs).toDF()
      .select(col("media_id"), col("out_w"), col("out_h"),
        length(col("out_bytes")).cast("long").as("n_bytes"),
        md5(hex(col("out_bytes")).cast("binary")).as("out_md5"))
      .orderBy("media_id")
  }

  /** Frame-sample video payloads. An injected [[VideoDecoder]] (SPI:
    * registered or ServiceLoader-discovered, resolved PER EXECUTOR JVM
    * inside the task) that answers `frames` makes the extraction real;
    * payloads no decoder claims fall back to the deterministic stub
    * chunking (every `stride`-th 64-byte chunk — the oracle's arithmetic).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      VideoDecoder.active.flatMap(_.frames(r.payload))
        .getOrElse(MediaCodecs.frameSampleStub(r.payload, stride))
        .zipWithIndex.map { case (bytes, i) => Frame(r.media_id, i, bytes) }
    }
  }

  /** Frame inventory as a DataFrame query (oracle-friendly surface over
    * [[sampleFrames]]): one row per sampled frame with its byte length and
    * md5 — the metadata a downstream training pipeline joins on without
    * ever shuffling the frame bytes.
    */
  def frameStats(media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    sampleFrames(media, stride)
      .map(f => (f.media_id, f.frame_no.toLong,
        f.frame_bytes.length.toLong, f.frame_bytes))
      .toDF("media_id", "frame_no", "n_bytes", "fb")
      .select(col("media_id"), col("frame_no"), col("n_bytes"),
        md5(col("fb")).as("frame_md5"))
      .orderBy("media_id", "frame_no")
  }

  /** Byte-level stats as a plain DataFrame query (oracle-friendly):
    * (media_id, kind, n_bytes, payload_md5).
    */
  def mediaStats(media: Dataset[MediaRow]): DataFrame = {
    media.toDF()
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("media_id")
  }

  /** Video-level near-duplicate GROUPS from keyframe perceptual hashes —
    * the multimodal composition of [[sampleFrames]] + [[perceptualHash]]'s
    * aHash + the SimHash pigeonhole banding
    * ([[graft.pipeline.Dedup.simhashPairs]]) + dup-cluster CC
    * ([[graft.pipeline.Dedup.dedupClusters]]):
    *
    *  1. sample keyframes per video (stub chunker — deterministic, so the
    *     DuckDB oracle replays it);
    *  2. 64-bit byte aHash per keyframe, packed (hi, lo);
    *  3. candidate pairs by 4×16-bit block equality within the SAME
    *     frame_no (temporal alignment rides IN the join key) — the
    *     pigeonhole guarantee: Hamming ≤ 3 ⇒ ≥ 1 equal block, so banding
    *     is COMPLETE for the verify threshold, never all-pairs;
    *  4. verify exact Hamming ≤ `maxHamming` on the candidates;
    *  5. videos sharing ≥ `minSharedFrames` aligned near-dup keyframes
    *     form an edge; groups = connected components on that video-pair
    *     graph (≪ corpus — near-dup components are sparse).
    *
    * Output: (video_id, cluster = min video id in group, keep) for every
    * video in a dup group, ordered by video_id.
    *
    * Scale: frame payload bytes never shuffle (the hash reduces each
    * frame to 2 longs before the explode); candidates are band-bucket
    * equi-joins; the CC runs on qualified VIDEO pairs only.
    */
  /** The UNMATERIALIZED candidate stage of [[videoDupGroups]] (factored
    * so PlanSpec pins the production body — the brandesForwardLevel
    * discipline): band-bucket equi-join on (q, blk, frame_no), exact
    * Hamming verify, aligned-frame count per video pair. Never all-pairs
    * — the equi-join keys carry the band AND the temporal alignment.
    */
  private[graft] def keyframeDupEdges(blocks: DataFrame, maxHamming: Int,
                                      minSharedFrames: Int): DataFrame = {
    val l = blocks.select(col("video_id").as("va"), col("frame_no"),
      col("hi").as("hia"), col("lo").as("loa"), col("q"), col("blk"))
    val r = blocks.select(col("video_id").as("vb"), col("frame_no"),
      col("hi").as("hib"), col("lo").as("lob"), col("q"), col("blk"))
    l.join(r, Seq("q", "blk", "frame_no"))
      .filter(col("va") < col("vb"))
      .select("va", "vb", "frame_no", "hia", "loa", "hib", "lob").distinct()
      .filter(expr("bit_count(hia ^ hib) + bit_count(loa ^ lob)")
        <= maxHamming)
      .groupBy("va", "vb")
      .agg(countDistinct("frame_no").as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
  }

  /** Energy-threshold voice-activity segmentation per audio payload — the
    * classic VAD gate (frame the signal, threshold frame energy, merge
    * consecutive active frames into segments) that decides which spans of
    * an audio corpus are worth transcribing/training on. The stub signal
    * model is the byte stream as 8-bit samples (this container ships no
    * audio codec; a real decoder changes [[MediaCodecs.decodeAudio]], not
    * this dataflow): a 32-byte frame is ACTIVE when its byte sum clears
    * `meanThreshold`×length — an exact-integer test, so the whole
    * relation is BIGINT end to end and DuckDB-replayable.
    *
    * Scale: framing is partition-local (payload bytes never shuffle — the
    * frame reduces to two longs at the scan); segments are a
    * gaps-and-islands window partitioned by ONE audio's frame list
    * (bounded by the payload, the videoSceneCuts discipline). Output:
    * (media_id, seg_no, start_frame, end_frame, n_frames) ordered.
    */
  def audioVadSegments(media: Dataset[MediaRow], frameLen: Int = 32,
                       meanThreshold: Int = 95): DataFrame = {
    import media.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = media.filter(_.kind == "audio").flatMap { r =>
      r.payload.grouped(frameLen).zipWithIndex.map { case (chunk, i) =>
        (r.media_id, i.toLong, chunk.length.toLong,
          chunk.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }.toDF("media_id", "frame_no", "n_bytes", "sum_bytes")
    val active = frames.filter(col("sum_bytes") > lit(meanThreshold) * col("n_bytes"))
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    active.withColumn("grp", col("frame_no") - row_number().over(w))
      .groupBy("media_id", "grp")
      .agg(min("frame_no").as("start_frame"), max("frame_no").as("end_frame"),
        count(lit(1)).cast("long").as("n_frames"))
      .withColumn("seg_no", row_number()
        .over(Window.partitionBy("media_id").orderBy("start_frame")).cast("long"))
      .select("media_id", "seg_no", "start_frame", "end_frame", "n_frames")
      .orderBy("media_id", "seg_no")
  }

  /** Scene-cut detection per video: Hamming distance between CONSECUTIVE
    * keyframe aHashes, a boundary where it clears `cutHamming` — the
    * classic shot-boundary heuristic (adjacent frames inside a shot hash
    * near-identically; a cut decorrelates the hash). The training-data
    * use: scene boundaries are where a video pipeline samples one
    * representative frame per shot instead of `stride`-uniform.
    *
    * Scale: frames reduce to (hi, lo) longs at the scan ([[videoDupGroups]]
    * discipline — payload bytes never shuffle); adjacency is a
    * `lag` window partitioned by video — safe here because a partition is
    * ONE video's keyframe list (bounded by the payload, thousands at
    * most), not a corpus-sized key. Output: one row per adjacent-frame
    * boundary (video_id, frame_no, hamming, is_cut), ordered.
    */
  def videoSceneCuts(media: Dataset[MediaRow], stride: Int = 2,
                     cutHamming: Int = 17): DataFrame = {
    import media.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val ph = sampleFrames(media, stride)
      .map { f =>
        val (hi, lo) = MediaCodecs.packAHashBits(
          MediaCodecs.byteAHashBits(f.frame_bytes))
        (f.media_id, f.frame_no.toLong, hi, lo)
      }.toDF("video_id", "frame_no", "hi", "lo")
    val w = Window.partitionBy("video_id").orderBy("frame_no")
    ph.withColumn("phi", lag("hi", 1).over(w))
      .withColumn("plo", lag("lo", 1).over(w))
      .filter(col("phi").isNotNull)
      .select(col("video_id"), col("frame_no"),
        expr("bit_count(hi ^ phi) + bit_count(lo ^ plo)").cast("long")
          .as("hamming"))
      .withColumn("is_cut", col("hamming") >= cutHamming)
      .orderBy("video_id", "frame_no")
  }

  def videoDupGroups(media: Dataset[MediaRow], stride: Int = 2,
                     maxHamming: Int = 3,
                     minSharedFrames: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    val ph = sampleFrames(media, stride)
      .map { f =>
        val (hi, lo) = MediaCodecs.packAHashBits(
          MediaCodecs.byteAHashBits(f.frame_bytes))
        (f.media_id, f.frame_no.toLong, hi, lo)
      }.toDF("video_id", "frame_no", "hi", "lo")
    // one row per (frame, block); feeds BOTH sides of the self-join —
    // materialize once (the simhashPairs discipline)
    val blocks = ph.select(col("video_id"), col("frame_no"), col("hi"),
        col("lo"), explode(expr(
          "transform(sequence(0, 3), q -> struct(q AS q, " +
            "CASE WHEN q < 2 THEN shiftright(lo, CAST(q * 16 AS INT)) & 65535 " +
            "ELSE shiftright(hi, CAST((q - 2) * 16 AS INT)) & 65535 END AS blk))"))
          .as("qb"))
      .select(col("video_id"), col("frame_no"), col("hi"), col("lo"),
        col("qb.q"), col("qb.blk"))
      .localCheckpoint(true)
    val pairs = keyframeDupEdges(blocks, maxHamming, minSharedFrames)
      .localCheckpoint(true) // small; feeds edges AND vertices
    val verts = pairs.select(col("va").as("vertex"))
      .unionAll(pairs.select(col("vb").as("vertex"))).distinct()
    val cc = graft.graph.GraphOps.connectedComponents(
      pairs.select(col("va").as("src"), col("vb").as("dst")), verts,
      ordered = false)
    cc.select(col("vertex").as("video_id"), col("component").as("cluster"))
      .withColumn("keep",
        when(col("video_id") === col("cluster"), 1L).otherwise(0L))
      .orderBy("video_id")
  }
}

/** Codec layer. The IMAGE path is real — the JDK's `javax.imageio`
  * decodes PNG/JPEG/GIF/BMP with no external dependency. Audio/video
  * decode remains a clearly-marked deterministic STUB (this container
  * ships no media libraries); swapping in a real codec changes one
  * function, not the dataflow.
  */
object MediaCodecs {

  /** Real image decode via the JDK's ImageIO. Returns None when the
    * payload is not a decodable image (ImageIO reads the magic bytes and
    * gives up fast on non-images — deterministic either way).
    * Mean intensity = per-pixel (R+G+B)/3, averaged over the image.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    decodeImageRaw(payload).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      // bulk row fetch — per-pixel getRGB pays a bounds+colormodel cost per call
      val row = new Array[Int](w)
      var sum = 0.0
      var y = 0
      while (y < h) {
        im.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          x += 1
        }
        y += 1
      }
      (w, h, if (w * h == 0) 0.0 else sum / (w * h))
    }
  }

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/AU/AIFF).
    * Returns None when the payload is not a decodable audio stream.
    * Shape: (frames, channels, mean |amplitude| scaled to 0..255 for
    * 16-bit PCM; raw byte mean otherwise).
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength.toInt
        val data = ais.readAllBytes()
        val mean =
          if (fmt.getSampleSizeInBits == 16 && data.length >= 2) {
            var s = 0.0
            var i = 0
            while (i + 1 < data.length) {
              val v =
                if (fmt.isBigEndian) ((data(i).toInt << 8) | (data(i + 1) & 0xff)).toShort
                else ((data(i + 1).toInt << 8) | (data(i) & 0xff)).toShort
              s += math.abs(v.toDouble)
              i += 2
            }
            s / (data.length / 2) / 32768.0 * 255.0
          } else if (data.nonEmpty) {
            data.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / data.length
          } else 0.0
        Some((frames, fmt.getChannels, mean))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Dispatch: real JDK decode where one exists — ImageIO for image
    * payloads, javax.sound for audio — with the deterministic stub as the
    * fallback for undecodable bytes (e.g. the documents-derived test
    * table, whose oracle replays the stub arithmetic exactly). Video has
    * no JDK codec; an injected [[VideoDecoder]] (SPI: registered or
    * ServiceLoader-discovered) answers first when present, otherwise the
    * DIMENSIONS come from a real container-header probe
    * ([[probeVideoDims]] — MP4 tkhd / AVI avih) and only the frame decode
    * itself remains stubbed (mean intensity falls back to the byte mean).
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Double) = kind match {
    case "image" => decodeImage(payload).getOrElse(decodeStub(kind, payload))
    case "audio" => decodeAudio(payload).getOrElse(decodeStub(kind, payload))
    case "video" =>
      VideoDecoder.active.flatMap(_.decode(payload))
        .orElse(probeVideoDims(payload).map { case (w, h) => (w, h, byteMean(payload)) })
        .getOrElse(decodeStub(kind, payload))
    case _ => decodeStub(kind, payload)
  }

  /** Deterministic video container-header probe — no codec required:
    *  - MP4 / ISO BMFF: walk the top-level box tree to `moov` → `trak` →
    *    `tkhd` and read the 16.16 fixed-point track width/height (the
    *    first track with nonzero dims wins — audio tracks carry 0×0);
    *  - AVI: `RIFF….AVI ` with the 56-byte `avih` main header, dwWidth /
    *    dwHeight at byte offsets 32/36 of the chunk (little-endian).
    * Returns None for anything else (then the stub answers).
    */
  def probeVideoDims(payload: Array[Byte]): Option[(Int, Int)] =
    probeMp4Dims(payload).orElse(probeAviDims(payload))

  private def beInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def leInt(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk ISO BMFF boxes in [start, end); recurse into container boxes on
    * the moov→trak path; return the first tkhd with nonzero dims.
    */
  private def mp4Walk(b: Array[Byte], start: Long, end: Long,
                      depth: Int): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size0 = beInt(b, off.toInt)
      val typ = fourcc(b, off.toInt + 4)
      // size==1 → 64-bit largesize follows; size==0 → box runs to EOF
      val (hdr, size) =
        if (size0 == 1 && off + 16 <= end)
          (16L, (beInt(b, off.toInt + 8) << 32) | beInt(b, off.toInt + 12))
        else if (size0 == 0) (8L, end - off)
        else (8L, size0)
      if (size < hdr || off + size > end) return None // corrupt length
      typ match {
        case "moov" if depth == 0 =>
          val r = mp4Walk(b, off + hdr, off + size, 1)
          if (r.isDefined) return r
        case "trak" if depth == 1 =>
          val r = mp4Walk(b, off + hdr, off + size, 2)
          if (r.isDefined) return r
        case "tkhd" if depth == 2 =>
          val c = (off + hdr).toInt
          if (c < end) {
            val version = b(c) & 0xff
            // after version+flags: v0 fixed fields span 72 bytes before
            // width, v1 (64-bit times) 84 — then 16.16 width, height
            val wOff = c + 4 + (if (version == 1) 84 else 72)
            if (wOff + 8 <= end) {
              val w = (beInt(b, wOff) >> 16).toInt
              val h = (beInt(b, wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) return Some((w, h))
            }
          }
        case _ => ()
      }
      off += size
    }
    None
  }

  private def probeMp4Dims(b: Array[Byte]): Option[(Int, Int)] = {
    // an MP4 starts with a box whose type is ftyp/moov/mdat/free/wide/skip
    if (b.length < 12) return None
    val t = fourcc(b, 4)
    if (!Set("ftyp", "moov", "mdat", "free", "skip", "wide").contains(t)) return None
    mp4Walk(b, 0L, b.length.toLong, 0)
  }

  private def probeAviDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    // scan chunk-aligned-ish for the avih fourcc (one 56-byte main header
    // per file); dwWidth/dwHeight at data offsets 32/36
    var i = 12
    while (i + 8 + 40 <= b.length) {
      if (b(i) == 'a' && b(i + 1) == 'v' && b(i + 2) == 'i' && b(i + 3) == 'h') {
        val data = i + 8
        if (data + 40 <= b.length) {
          val w = leInt(b, data + 32).toInt
          val h = leInt(b, data + 36).toInt
          if (w > 0 && h > 0) return Some((w, h)) else return None
        }
      }
      i += 1
    }
    None
  }

  private def byteMean(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length

  /** Real image resize via ImageIO + Graphics2D bilinear scaling, PNG
    * re-encoded. Aspect-preserving fit into (maxW, maxH); images already
    * inside the box pass through re-encoded at original size. None when
    * the payload is not a decodable image.
    */
  def resizeImage(payload: Array[Byte], maxW: Int,
                  maxH: Int): Option[(Int, Int, Array[Byte])] = {
    decodeImageRaw(payload).map { im =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / im.getWidth, maxH.toDouble / im.getHeight))
      val w = math.max(1, math.round(im.getWidth * scale).toInt)
      val h = math.max(1, math.round(im.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (w, h, bos.toByteArray)
    }
  }

  /** STUB resize: "scales" a non-decodable payload by treating it as a
    * 1-byte-per-pixel raster — output = the first maxW·maxH bytes, dims =
    * the smallest box holding them at width ≤ maxW. Deterministic
    * arithmetic over the payload, so the documents-derived test table is
    * oracle-replayable (substr + length in DuckDB).
    */
  def resizeStub(payload: Array[Byte], maxW: Int,
                 maxH: Int): (Int, Int, Array[Byte]) = {
    val n = math.min(payload.length, maxW * maxH)
    val w = math.min(n, maxW)
    val h = if (w == 0) 0 else (n + w - 1) / w
    (w, h, payload.take(n))
  }

  private def decodeImageRaw(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Real perceptual average-hash: 8×8 luminance grid over the decoded
    * image, bit (cy·8+cx) set iff the cell's mean luminance exceeds the
    * image mean. The comparison is EXACT integer cross-multiplication
    * (cellSum·totalCnt > totalSum·cellCnt) — no FP means, so the bits
    * are deterministic for identical pixels on any platform. None when
    * the payload is not a decodable image.
    */
  def imageAHashBits(payload: Array[Byte]): Option[Array[Boolean]] =
    decodeImageRaw(payload).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val cellSum = new Array[Long](64)
      val cellCnt = new Array[Long](64)
      var totalSum = 0L
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        im.getRGB(0, y, w, 1, row, 0, w)
        val cy = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          val j = cy * 8 + (x.toLong * 8 / w).toInt
          cellSum(j) += lum
          cellCnt(j) += 1
          totalSum += lum
          x += 1
        }
        y += 1
      }
      val totalCnt = w.toLong * h
      Array.tabulate(64)(j => cellSum(j) * totalCnt > totalSum * cellCnt(j))
    }

  /** STUB average-hash over raw payload bytes: 64 contiguous index-range
    * chunks (byte i → chunk (i·64) div n), bit j set iff the chunk's byte
    * mean exceeds the payload mean — the same exact integer
    * cross-multiplication as [[imageAHashBits]], so the whole hash is
    * replayable in SQL over the text-derived test payloads (ASCII:
    * codepoint == byte).
    */
  def byteAHashBits(payload: Array[Byte]): Array[Boolean] = {
    val n = payload.length
    val bits = new Array[Boolean](64)
    if (n == 0) return bits
    val chunkSum = new Array[Long](64)
    val chunkCnt = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val j = (i.toLong * 64 / n).toInt
      val v = payload(i) & 0xff
      chunkSum(j) += v
      chunkCnt(j) += 1
      total += v
      i += 1
    }
    var j = 0
    while (j < 64) {
      bits(j) = chunkSum(j) * n > total * chunkCnt(j)
      j += 1
    }
    bits
  }

  /** Pack 64 hash bits into two non-negative BIGINT halves (hi = bits
    * 32..63, lo = 0..31) — two positive longs instead of one sign-risky
    * 64-bit value, so SQL replication never overflows.
    */
  def packAHashBits(bits: Array[Boolean]): (Long, Long) = {
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 64) {
      if (bits(j)) {
        if (j >= 32) hi |= 1L << (j - 32) else lo |= 1L << j
      }
      j += 1
    }
    (hi, lo)
  }

  /** STUB decode: pretends to decode an image/audio/video payload and
    * reports (width, height, mean byte intensity). Deterministic in the
    * payload bytes. Real impl for audio/video: ffmpeg bindings.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val mean = if (n == 0) 0.0 else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    kind match {
      case "image" => (n % 640 + 1, n % 480 + 1, mean)
      case "audio" => (n, 1, mean) // samples × 1 channel
      case _       => (n % 320 + 1, n % 240 + 1, mean)
    }
  }

  /** STUB frame sampler: every `stride`-th 64-byte chunk. */
  def frameSampleStub(payload: Array[Byte], stride: Int): Seq[Array[Byte]] =
    payload.grouped(64).zipWithIndex.collect {
      case (chunk, i) if i % stride == 0 => chunk
    }.toSeq
}
