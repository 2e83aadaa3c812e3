package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global ranking WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no PARTITION BY collapses the whole dataset
  * onto ONE task — the canonical scale trap for percentile/rank queries.
  * The distributed form is the two-pass sort-rank: `orderBy` performs a
  * range-partitioned sort (every partition holds a contiguous key range),
  * then `zipWithIndex` assigns global indices with one extra job that
  * counts per-partition sizes and broadcasts the offsets — rank becomes
  * per-partition arithmetic. Same output as the window, no serialization
  * point.
  */
object Ranking {

  /** Append a 0-based global `idx` column in `sortCols` order (ties must
    * be broken by the caller's sort columns for determinism).
    */
  def withGlobalIndex(df: DataFrame, sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add("idx", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Append `prev_max`: the max of LongType `valueCol` over all STRICTLY
    * preceding rows in `sortCols` order (null on the global first row) —
    * the distributed prefix-max scan. Same two-pass shape as
    * [[withGlobalIndex]]: per-partition maxima (one tiny collect, one row
    * per partition) become broadcast prefix offsets, then the scan is
    * per-partition arithmetic. No single-partition window anywhere.
    */
  def withRunningMax(df: DataFrame, valueCol: String, sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*).localCheckpoint(true) // feeds both passes
    val vi = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // (seen, max) per partition: an explicit emptiness flag, NOT a
    // Long.MinValue sentinel — a genuine MinValue data value must still
    // report itself as a preceding max downstream.
    val partMax = rdd.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var m = Long.MinValue
      it.foreach { r =>
        val v = r.getLong(vi)
        if (!seen || v > m) m = v
        seen = true
      }
      Iterator((i, (seen, m)))
    }.collect().sortBy(_._1).map(_._2)
    // prefix(i) = (any row before partition i, max over partitions < i)
    val prefix = partMax.scanLeft((false, Long.MinValue)) {
      case ((ps, pm), (s, m)) =>
        if (!s) (ps, pm)
        else if (!ps || m > pm) (true, m)
        else (ps, pm)
    }.dropRight(1)
    val schema = sorted.schema.add("prev_max", LongType, nullable = true)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var (seenRun, run) = prefix(i)
      it.map { r =>
        val pm: Any = if (!seenRun) null else run
        val v = r.getLong(vi)
        if (!seenRun || v > run) run = v
        seenRun = true
        Row.fromSeq(r.toSeq :+ pm)
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }

  /** Append inclusive running sums `cum_<c>` of the LongType columns
    * `sumCols` in `sortCols` order — the distributed prefix-sum scan,
    * same two-pass shape as [[withRunningMax]] (per-partition totals →
    * broadcast offsets → per-partition scan).
    */
  def withRunningSums(df: DataFrame, sumCols: Seq[String],
                      sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*).localCheckpoint(true) // feeds both passes
    val vis = sumCols.map(sorted.schema.fieldIndex).toArray
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](vis.length)
      it.foreach { r =>
        var c = 0
        while (c < vis.length) { s(c) += r.getLong(vis(c)); c += 1 }
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val prefix = partSums.scanLeft(new Array[Long](vis.length)) { (acc, s) =>
      Array.tabulate(vis.length)(c => acc(c) + s(c))
    }.dropRight(1)
    val schema = sumCols.foldLeft(sorted.schema)((sch, c) =>
      sch.add(s"cum_$c", LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val run = prefix(i).clone()
      it.map { r =>
        var c = 0
        while (c < vis.length) { run(c) += r.getLong(vis(c)); c += 1 }
        Row.fromSeq(r.toSeq ++ run.toList) // toList COPIES — run keeps mutating
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }

  /** Exact equi-depth histogram: `k` NTILE buckets over `value` in
    * (value, tieCols) total order, SQL-standard uneven split (first
    * n mod k buckets take one extra row). Built on the global index, not
    * `ntile() OVER (ORDER BY ...)` — the single-task trap. `lo`/`hi` are
    * raw input doubles (bit-identical cross-engine, unrounded).
    * Output: (bucket, n_rows, lo, hi) ordered by bucket.
    */
  def equiDepthHistogram(df: DataFrame, value: Column, tieCols: Seq[Column],
                         k: Int): DataFrame = {
    val base = df.select(value.as("v") +: tieCols: _*)
    val sortCols = col("v") +: base.schema.names.tail.toSeq.map(col)
    withNtile(base, k, sortCols: _*)
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_rows"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket")
  }

  /** Append the SQL-standard `ntile(k)` bucket (1-based, first n mod k
    * buckets one row larger) in `sortCols` total order, built on the
    * global index — shared by [[equiDepthHistogram]] and the
    * [[ZOrder]] layout so NTILE semantics cannot diverge between them.
    */
  def withNtile(df: DataFrame, k: Int, sortCols: Column*): DataFrame = {
    val idxd = withGlobalIndex(df, sortCols: _*)
    idxd.crossJoin(broadcast(idxd.agg(count(lit(1)).as("n"))))
      .withColumn("q", expr(s"n div $k"))
      .withColumn("r", expr(s"n % $k"))
      .withColumn("bucket",
        when(col("idx") < col("r") * (col("q") + 1),
          expr("idx div (q + 1)") + 1)
          .otherwise(col("r") + expr("(idx - r * (q + 1)) div q") + 1)
          .cast("long"))
      .drop("n", "q", "r", "idx")
  }

  /** RFM segmentation — the classic lifecycle-marketing scoring: per
    * customer, Recency (days since last order, against the corpus max
    * date), Frequency (order count) and Monetary (revenue), each bucketed
    * into `k` quantile bands with the SQL-standard NTILE semantics of
    * [[withNtile]] (ascending metric, custkey tiebreak — so r_q 1 = most
    * recent, f_q/m_q k = best). Three global-index passes over the
    * customer-sized frame, all distributed (no single-task window);
    * recency is exact integer day arithmetic; revenue rounds 2 dp (the
    * one order-jittered double sum, [[revenuePercentiles]] precedent).
    * Output: (custkey, recency_days, n_orders, revenue, r_q, f_q, m_q)
    * ordered by custkey.
    */
  def rfmSegments(orders: DataFrame, k: Int = 4): DataFrame = {
    val maxD = orders.agg(max(col("o_orderdate")).as("maxd"))
    val base = orders
      .groupBy(col("o_custkey").cast("long").as("custkey"))
      .agg(max("o_orderdate").as("lastd"),
        count(lit(1)).cast("long").as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .crossJoin(broadcast(maxD))
      .withColumn("recency_days",
        datediff(col("maxd").cast("date"), col("lastd").cast("date")).cast("long"))
      .select("custkey", "recency_days", "n_orders", "revenue")
      .localCheckpoint(true) // feeds three sequential ntile passes
    val r = withNtile(base, k, col("recency_days"), col("custkey"))
      .withColumnRenamed("bucket", "r_q")
    val f = withNtile(r, k, col("n_orders"), col("custkey"))
      .withColumnRenamed("bucket", "f_q")
    withNtile(f, k, col("revenue"), col("custkey"))
      .withColumnRenamed("bucket", "m_q")
      .orderBy("custkey")
  }

  /** Per-customer revenue with exact `percent_rank` and `ntile(k)` decile
    * semantics computed from the global index (rank r of n, zero-based:
    * pct = r/(n−1); ntile buckets: the first n mod k buckets take
    * ⌈n/k⌉ rows — the SQL-standard uneven split). The percent is one
    * division of two exact integers — bit-identical cross-engine; the
    * revenue sum is order-jittered, so it rounds to 2 dp on both sides.
    * Output: (custkey, revenue, pct_rank, decile) ordered by custkey.
    */
  def revenuePercentiles(orders: DataFrame, k: Int = 10): DataFrame = {
    val rev = orders
      .groupBy(col("o_custkey").cast("long").as("custkey"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val idxd = withGlobalIndex(rev, col("revenue"), col("custkey"))
      .localCheckpoint(true) // feeds both the count and the output
    idxd.crossJoin(broadcast(idxd.agg(count(lit(1)).as("n"))))
      .withColumn("pct_rank",
        when(col("n") === 1, lit(0.0))
          .otherwise(col("idx").cast("double") / (col("n") - lit(1)).cast("double")))
      // ntile: q = n div k, r = n mod k; first r buckets hold q+1 rows
      .withColumn("q", expr(s"n div $k"))
      .withColumn("r", expr(s"n % $k"))
      .withColumn("decile",
        when(col("idx") < col("r") * (col("q") + 1),
          expr("idx div (q + 1)") + 1)
          .otherwise(col("r") + expr("(idx - r * (q + 1)) div q") + 1)
          .cast("long"))
      .select(col("custkey"), col("revenue"), col("pct_rank"), col("decile"))
      .orderBy("custkey")
  }
}
