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
}
