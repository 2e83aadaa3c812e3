package graft.multimodal

/** SPI for injecting a real video frame decoder. The JDK ships no video
  * codec, so the default pipeline decodes video payloads with the real
  * container-header probe ([[MediaCodecs.probeVideoDims]]) plus a
  * byte-mean intensity stand-in — honest about what a JDK-only runtime
  * can do. A deployment with ffmpeg (or any native codec) available makes
  * the decode real WITHOUT forking the pipeline by providing an
  * implementation of this trait.
  *
  * Implementations must be Serializable and thread-safe: decode runs
  * inside executor tasks, many concurrently per JVM.
  */
trait VideoDecoder extends Serializable {
  /** Full decode of one video payload:
    * (width, height, mean frame intensity 0..255), or None when these
    * bytes are not decodable by this implementation (the pipeline then
    * falls back to the container probe + stub chain).
    */
  def decode(payload: Array[Byte]): Option[(Int, Int, Double)]

  /** Real frame extraction: the decoded frames of one video payload (raw
    * bytes per frame, decoder-defined pixel layout), or None when these
    * bytes are not decodable here — [[Media.sampleFrames]] then falls
    * back to its stub chunking. Default None so dimension-only decoders
    * (a probe wrapper, a metadata-only codec) satisfy the SPI unchanged.
    */
  def frames(payload: Array[Byte]): Option[Seq[Array[Byte]]] = None
}

/** Resolution: an explicitly registered decoder wins, else
  * `java.util.ServiceLoader` discovery (the cluster path — ship the
  * implementation jar with a `META-INF/services/graft.multimodal.
  * VideoDecoder` entry and every executor resolves it from its own
  * classpath; no driver-state shipping involved), else None and
  * [[MediaCodecs.decode]] keeps its probe+stub behavior. `register` is
  * the single-JVM path (local mode, tests): it does not propagate to
  * remote executors — use the ServiceLoader route on a cluster.
  */
object VideoDecoder {
  @volatile private var registered: Option[VideoDecoder] = None

  def register(d: VideoDecoder): Unit = { registered = Some(d) }

  def clear(): Unit = { registered = None }

  private lazy val discovered: Option[VideoDecoder] = {
    val it = java.util.ServiceLoader.load(classOf[VideoDecoder]).iterator()
    if (it.hasNext) Some(it.next()) else None
  }

  def active: Option[VideoDecoder] = registered.orElse(discovered)
}
