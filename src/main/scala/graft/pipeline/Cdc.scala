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
  /** The deterministic demo change set BOTH merge twins apply (batch
    * `merge_upsert`, streaming `stream_merge_upsert`) — updates every
    * %10==0 key, deletes every %10==7, inserts a shifted copy of every
    * %1000==1. Change keys are pairwise DISTINCT across the three ops,
    * so the set is order-insensitive and a micro-batched application
    * commutes to the batch result — the property that lets one oracle
    * replay both twins.
    */
  def demoChanges(base: DataFrame): DataFrame =
    base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("op"), col("o_custkey"),
        (col("o_totalprice") + 100.0).as("o_totalprice"))
      .unionByName(base.filter(col("o_orderkey") % 10 === 7)
        .select(col("o_orderkey"), lit("D").as("op"), col("o_custkey"),
          col("o_totalprice")))
      .unionByName(base.filter(col("o_orderkey") % 1000 === 1)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit("U").as("op"), col("o_custkey"), col("o_totalprice")))

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
