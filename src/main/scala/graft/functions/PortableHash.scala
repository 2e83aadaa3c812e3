package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable hashing — the parity recipes every oracle-checked
  * operator shares. xxhash64 is Spark-only; md5 is identical everywhere.
  */
object PortableHash {

  /** First 60 bits of the value's md5 as a BIGINT (always positive).
    * DuckDB reproduces it bit-for-bit as
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`, which makes any
    * computation built on it (winnowing window-mins, simhash sign-sums)
    * hash-oracle-replayable end to end.
    */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Driver-side Scala twin of [[md5Bits60]] over a UTF-8 string — same
    * bits as the Column form on the same text, and as DuckDB's
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`. For parameter-scale
    * constant derivation (e.g. per-replica bootstrap coefficients) that
    * both engines must re-derive identically.
    */
  def md5Bits60Of(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) >>> 4
  }
}
