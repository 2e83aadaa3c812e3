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

  test("mediaStats matches a hand computation") {
    val s = Media.mediaStats(Media.mediaFromDocuments(docs)).collect()
    assert(s(0).getLong(2) == 11L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(s(0).getString(3) == md)
  }
}
