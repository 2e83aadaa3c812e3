package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: MERGE INTO semantics (upsert +
  * delete) as one dataflow — the maintenance step a lakehouse table
  * (SCD2's current-snapshot sibling) runs per ingest batch.
  */
object Cdc {

  /** Apply a change batch to a keyed snapshot: `changes` carries the key,
    * an `op` column ('U' upsert / 'D' delete), and the base's payload
    * columns (for 'U'). Unmatched base rows pass through; 'U' replaces or
    * inserts; 'D' drops. Keys must be unique per side (snapshot contract).
    *
    * Scale: ONE full-outer shuffle join on the key — no driver state, no
    * per-row dispatch; both sides co-partition and the CASE projection is
    * codegen'd. The classic skew/broadcast levers apply unchanged when
    * the change batch is small (broadcast) or hot-keyed (salt).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty, "base must carry payload columns beside the key")
    val b = base.select(col(key) +: payload.map(c => col(c).as(s"b_$c")): _*)
    val c = changes.select(col(key) +: (col(opCol) +:
      payload.map(cn => col(cn).as(s"c_$cn"))): _*)
    b.join(c, Seq(key), "full_outer")
      .filter(col(opCol).isNull || col(opCol) === "U")
      .select(col(key) +: payload.map(cn =>
        when(col(opCol) === "U", col(s"c_$cn")).otherwise(col(s"b_$cn")).as(cn)): _*)
  }
}
