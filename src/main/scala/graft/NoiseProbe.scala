package graft

import java.nio.file.{Files, Path}

/** Fixed-work host-noise probes, shared by the bench parent, the soak
  * writers, and the maintenance A/B tool (r18 verdict #2/#6: every
  * committed measurement basis must carry its own contention evidence,
  * and the tools that certify a basis must be able to REJECT one whose
  * probes deviate from the committed idle nominals instead of leaving
  * the adjudication to a later judge read).
  *
  * Two sizes:
  *  - [[full]] — the r17 noise_control probe (200M xorshift steps +
  *    256 MiB fsync'd write / read-back, ~1-2 s unloaded): run before
  *    and after a whole bench/soak run.
  *  - [[mini]] — ~100 ms (30M steps + 32 MiB): cheap enough to run
  *    BETWEEN bench units so a contention window that opens and closes
  *    mid-run is localized to the units it actually hit (r18 verdict
  *    #6); pre/post-only probes miss it entirely.
  *
  * Probes are serialized on a JVM-wide lock so two pool workers never
  * measure each other's probe as load.
  */
object NoiseProbe {

  /** Committed IDLE nominals for this box's FULL probe, measured in a
    * quiet window (round 19; re-measure when the host changes).
    * Override with GRAFT_PROBE_NOMINALS="cpuSec,readMbS".
    */
  val NominalCpuSec = 0.42
  val NominalReadMbS = 3500.0

  def nominals: (Double, Double) =
    sys.env.get("GRAFT_PROBE_NOMINALS").map(_.split(",")) match {
      case Some(Array(c, r)) => (c.trim.toDouble, r.trim.toDouble)
      case _ => (NominalCpuSec, NominalReadMbS)
    }

  final case class Result(cpuSec: Double, writeMbS: Double,
                          readMbS: Double, kind: String) {
    def json: String =
      f"""{"cpu_spin_sec":$cpuSec%.3f,"disk_write_mb_s":$writeMbS%.1f,""" +
        f""""disk_read_mb_s":$readMbS%.1f,"kind":"$kind"}"""
    /** Inside the idle band? Defined for FULL probes only (the mini
      * probe's fixed work differs; it is adjudication evidence, not a
      * gate). Band: cpu_spin <= 1.2x nominal AND disk_read >= 0.5x
      * nominal — the same band tools/build_calibration.py enforces.
      */
    def withinIdleBand: Boolean = {
      require(kind == "full", "idle band is calibrated for the full probe")
      val (c, r) = nominals
      cpuSec <= 1.2 * c && readMbS >= 0.5 * r
    }
  }

  private val lock = new Object

  /** The bench-artifact probe: ~1-2 s unloaded. */
  def full(scratch: Path): Result = run(scratch, 200000000L, 256, "full")

  /** The between-units probe: ~100 ms unloaded. */
  def mini(scratch: Path): Result = run(scratch, 30000000L, 32, "mini")

  /** Idle-nominal measurement: `sbt "runMain graft.ProbeCheck [n]"` — run
    * in an idle window to (re-)base the committed nominals above.
    */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val d = Files.createTempDirectory("graft_probe_check_")
    (1 to n).foreach { _ =>
      val r = full(d)
      println(s"FULL ${r.json} within_idle_band=${r.withinIdleBand}")
      println(s"MINI ${mini(d).json}")
    }
  }

  private def run(scratch: Path, steps: Long, mb: Int,
                  kind: String): Result = lock.synchronized {
    // fixed CPU work: xorshift64 spin, measured as 5 equal segments with
    // the MEDIAN segment scaled back up — a single momentary scheduler
    // blip (observed: one 0.73 s outlier between 0.41 s idle runs) must
    // not reject an otherwise-idle basis, while SUSTAINED contention
    // inflates the median segment just like the whole spin
    var x = 0x9E3779B97F4A7C15L
    val seg = steps / 5
    val segSecs = (0 until 5).map { _ =>
      var i = 0L
      val s0 = System.nanoTime()
      while (i < seg) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      (System.nanoTime() - s0) / 1e9
    }.sorted
    val cpuSec = segSecs(2) * 5
    // fixed disk work on the scratch volume: fsync'd write + read-back
    // (the read mostly measures page cache / memory bandwidth — itself
    // a contention signal under a 32-thread load)
    val buf = java.nio.ByteBuffer.allocate(1 << 20)
    java.util.Arrays.fill(buf.array(), 0x5A.toByte)
    val f = scratch.resolve(s"noise_probe_$kind.bin")
    import java.nio.file.StandardOpenOption._
    val t1 = System.nanoTime()
    val wch = java.nio.channels.FileChannel.open(f, CREATE, WRITE, TRUNCATE_EXISTING)
    try {
      var j = 0
      while (j < mb) { buf.rewind(); wch.write(buf); j += 1 }
      wch.force(true)
    } finally wch.close()
    val wSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val rch = java.nio.channels.FileChannel.open(f, READ)
    try {
      var n = 1
      while (n > 0) { buf.rewind(); n = rch.read(buf) }
    } finally rch.close()
    val rSec = (System.nanoTime() - t2) / 1e9
    Files.deleteIfExists(f)
    // consume x so the spin cannot be optimized away
    val cpuSecAdj = if (x == 0L) -1.0 else cpuSec
    Result(cpuSecAdj, mb / wSec, mb / rSec, kind)
  }
}
