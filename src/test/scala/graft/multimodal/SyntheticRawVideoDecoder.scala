package graft.multimodal

/** Test-only SPI implementation exercising the ServiceLoader discovery
  * path end-to-end (registered via `src/test/resources/META-INF/services/
  * graft.multimodal.VideoDecoder`): a REAL decode of a trivial raw-gray
  * container, standing in for an ffmpeg-backed production decoder.
  *
  * Container format ("GRV1"):
  *   bytes 0..3  magic "GRV1"
  *   bytes 4..5  width  (big-endian u16)
  *   bytes 6..7  height (big-endian u16)
  *   bytes 8..9  frame count (big-endian u16)
  *   then frameCount × (width·height) single-channel intensity bytes.
  *
  * Returns None for anything without the magic, so every other payload —
  * including all driver testdata — keeps the probe + stub chain and the
  * golden media oracles are unaffected by this decoder being on the test
  * classpath.
  */
class SyntheticRawVideoDecoder extends VideoDecoder {

  private def parse(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    def u16(off: Int): Int = ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)
    if (payload.length < 10 ||
        new String(payload, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) != "GRV1")
      None
    else {
      val (w, h, nf) = (u16(4), u16(6), u16(8))
      val frameLen = w * h
      if (w <= 0 || h <= 0 || payload.length < 10 + nf * frameLen) None
      else Some((w, h,
        (0 until nf).map(i => payload.slice(10 + i * frameLen, 10 + (i + 1) * frameLen).toSeq.toArray)))
    }
  }

  override def decode(payload: Array[Byte]): Option[(Int, Int, Double)] =
    parse(payload).map { case (w, h, fs) =>
      val all = fs.flatten
      (w, h, if (all.isEmpty) 0.0
             else all.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / all.length)
    }

  override def frames(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    parse(payload).map(_._3)
}

object SyntheticRawVideoDecoder {
  /** Build a GRV1 container from gray frames (test helper). */
  def container(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == w * h))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GRV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    Seq(w, h, frames.length).foreach { v =>
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    frames.foreach(out.write)
    out.toByteArray
  }
}
