package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Compression
import SparkTestSession._

class CompressionSpec extends AnyFunSuite {
  import spark.implicits._

  private def deflateOnce(s: String): (Long, Array[Byte]) = {
    val d = Compression.newDeflater()
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    (out.size().toLong, out.toByteArray)
  }

  test("deflateLen is a genuine DEFLATE stream length: inflate round-trips the input") {
    val texts = Seq("hello world", "a" * 500,
      "the quick brown fox jumps over the lazy dog. " * 20)
    val d = Compression.newDeflater()
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      // length from the shared kernel == length of an independently
      // produced stream, and that stream inflates back to the input
      val (len1, stream) = deflateOnce(t)
      assert(Compression.deflateLen(bytes, d) == len1)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(stream)
      val out = new Array[Byte](bytes.length + 16)
      val n = inf.inflate(out)
      inf.end()
      assert(n == bytes.length && out.take(n).sameElements(bytes),
        s"inflate did not round-trip for ${t.take(20)}…")
    }
    d.end()
  }

  test("codec-context reuse: reset between rows leaves no cross-row state") {
    // a long row before a short one must not change the short one's
    // length (a missing reset would let the dictionary window leak)
    val d = Compression.newDeflater()
    val long = ("lorem ipsum dolor sit amet " * 100).getBytes("UTF-8")
    val short = "hello world".getBytes("UTF-8")
    val fresh = deflateOnce("hello world")._1
    Compression.deflateLen(long, d)
    assert(Compression.deflateLen(short, d) == fresh,
      "comp_len after a prior row diverges from a fresh context")
    d.end()
  }

  test("compressionRatio: distributed result equals the sequential kernel row-for-row") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Compression.compressionRatio(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val d = Compression.newDeflater()
    val expected = docs.select("doc_id", "text").collect()
      .filter(_.getString(1).nonEmpty)
      .map { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val cl = Compression.deflateLen(b, d)
        (r.getLong(0), (b.length.toLong, cl, cl * 10000L / b.length))
      }.toMap
    d.end()
    assert(got == expected)
  }

  test("ratio_bp separates repetition from prose (the signal the filter exists for)") {
    val docs = Seq(
      (1L, "spam spam spam spam " * 50),            // heavy repetition
      (2L, "It was the best of times, it was the worst of times, " +
        "it was the age of wisdom, it was the age of foolishness, it " +
        "was the epoch of belief, it was the epoch of incredulity."),
      (3L, ""))                                      // excluded: no ratio
      .toDF("doc_id", "text")
    val rows = Compression.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(!rows.contains(3L), "empty doc must be excluded, not divide by zero")
    assert(rows(1L) < rows(2L),
      s"repetitive doc must compress below prose: $rows")
  }
}
