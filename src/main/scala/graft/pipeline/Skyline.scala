package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row dominates, where
  * `y` dominates `x` iff y.price ≤ x.price AND y.sval ≥ x.sval with at
  * least one strict — the classic "cheapest AND biggest" multi-criteria
  * operator.
  *
  * The naive form is a quadratic NOT EXISTS self-join (the oracle runs
  * exactly that). The sort-scan form here is O(n log n) and fully
  * distributed: a row is on the skyline iff its value equals its price
  * group's max AND strictly exceeds every strictly-lower price group's
  * max — one groupBy(price), one [[Ranking.withRunningMax]] prefix scan
  * over the (small) distinct-price frame, and one broadcast join back.
  * Ties on BOTH dims stay in (identical points don't dominate each
  * other), matching the NOT EXISTS semantics.
  */
object Skyline {

  /** Skyline of `df` minimizing `minimize` and maximizing `maximize`
    * (LongType). Output: (sid, price, sval) ordered by sid.
    */
  def skyline2D(df: DataFrame, id: Column, minimize: Column,
                maximize: Column): DataFrame = {
    val rows = df.select(id.cast("long").as("sid"), minimize.as("price"),
      maximize.cast("long").as("sval"))
    val pm = rows.groupBy("price").agg(max("sval").as("smax"))
    val sky = Ranking.withRunningMax(pm, "smax", col("price"))
      .filter(col("prev_max").isNull || col("smax") > col("prev_max"))
      .select(col("price"), col("smax").as("sval"))
    rows.join(broadcast(sky), Seq("price", "sval"))
      .select("sid", "price", "sval")
      .orderBy("sid")
  }
}
