package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** Event-stream analytics over `events(event_id, ts, user_id, event_type,
  * value, props)`. Window functions partition by user — the natural shuffle
  * key; at 100 TB this is one shuffle on user_id and everything downstream
  * stays co-partitioned.
  */
object Events {

  /** Epoch millis from `ts`, whatever physical flavor the source ships
    * (LONG nanos under `nanosAsLong`, TIMESTAMP, or the regenerated
    * testdata's TIMESTAMP_NTZ) — delegated to [[graft.TsCompat]], the one
    * place that knows them all. Floors like DuckDB's epoch_ms.
    */
  private[pipeline] def msOf(events: DataFrame): Column =
    graft.TsCompat.msOf(events)

  /** Gap-based sessionization (30-minute inactivity). Timestamps are
    * compared in epoch millis (unix_millis ⇔ DuckDB epoch_ms — both floor).
    * Output: one row per (user_id, session_id).
    */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms")
    events
      .select(col("user_id").cast("long").as("user_id"), msOf(events).as("ms"), col("value"))
      .withColumn("new_s",
        when(lag("ms", 1).over(byUser).isNull ||
             col("ms") - lag("ms", 1).over(byUser) > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_s").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id").cast("long").as("session_id"))
      .agg(min("ms").cast("long").as("session_start_ms"),
           count(lit(1)).cast("long").as("n_events"),
           round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Event-sequence transition counts: for each user's event stream in
    * (ms, event_id) order, count consecutive (event_type → next type)
    * pairs over the whole corpus — the first-order Markov transition
    * table sequence mining starts from. One shuffle on user_id (the lag
    * window), then a small aggregate. Output:
    * (from_type, to_type, n) ordered.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        msOf(events).as("ms"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Rolling per-user metrics: average of the last `frame` event values
    * (ROWS frame ending at the current row) — the window-FRAME shape
    * (sessionize only needs lag/running-sum). Ordering inside a user is
    * (ms, event_id) so ties are deterministic across engines.
    * Output: (event_id, user_id, ms, rolling_avg) ordered by event_id.
    */
  def rollingAvg(events: DataFrame, frame: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(-(frame - 1), Window.currentRow)
    events
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        msOf(events).as("ms"), col("value"))
      .withColumn("rolling_avg", round(avg("value").over(w), 4))
      .select("event_id", "user_id", "ms", "rolling_avg")
      .orderBy("event_id")
  }

  /** Per-event-type stats with a JSON-extracted field from `props`
    * (`get_json_object` ⇔ DuckDB `json_extract_string`).
    */
  def typeStats(events: DataFrame): DataFrame = {
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(round(avg("k"), 3).as("avg_k"), count(lit(1)).cast("long").as("n"))
      .orderBy("event_type")
  }

  /** Per-event-type EXACT discrete quantiles of `value` (ANSI
    * PERCENTILE_DISC: the smallest data value whose cumulative proportion
    * ≥ p). Discrete — not interpolated — so each output IS a raw input
    * double and hash-matches any IEEE engine bit-for-bit with no rounding
    * (DuckDB `quantile_disc` has the same contract).
    *
    * Scale: exact grouped quantiles sort within each (small-cardinality)
    * type group after one shuffle; at extreme per-group volumes the
    * streaming-sketch alternative is approx_percentile, traded here for
    * oracle-exactness.
    */
  def valueQuantiles(events: DataFrame): DataFrame = {
    events
      .groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"),
        count(lit(1)).cast("long").as("n"))
      .orderBy("event_type")
  }

  /** Hash-SAMPLED discrete quantiles — the read-pruned percentile path at
    * corpus scale: rows whose md5₆₀(event_id) clears a power-of-two
    * threshold form a deterministic 1/2^`shift` sample (stable across
    * runs, engines, and partitionings — `TABLESAMPLE`/rand() are none of
    * those), and the [[valueQuantiles]] PERCENTILE_DISC kernel runs on
    * the sample alone. Every output IS a raw input double (discrete, not
    * interpolated) so cross-engine equality needs no rounding contract;
    * the approximation error vs the exact quantiles is the audited
    * property (PropertyOracleSpec: sampled p50 within the exact p40–p60
    * band), the classic ε ≈ O(1/√sample) rank-error trade.
    *
    * Scale: the per-group sort that dominates exact grouped quantiles
    * shrinks 2^shift-fold; the sample predicate is a codegen'd hash
    * compare applied at the scan. Output:
    * (event_type, n_sample, p50, p90, p99) ordered.
    */
  def sampledValueQuantiles(events: DataFrame, shift: Int = 3): DataFrame =
    quantilesOfSample(sampleByHash(events, shift))

  /** The deterministic 1/2^shift md5-threshold sample — row-local, so it
    * applies identically per micro-batch at INGEST (the streaming twin's
    * store holds only sample rows) and over a batch table.
    */
  private[graft] def sampleByHash(events: DataFrame, shift: Int): DataFrame =
    events.filter(graft.functions.PortableHash
      .md5Bits60(col("event_id").cast("string")) < (1L << (60 - shift)))

  /** The PERCENTILE_DISC half of [[sampledValueQuantiles]], shared with
    * the streaming twin so the two cannot drift.
    */
  private[graft] def quantilesOfSample(sample: DataFrame): DataFrame =
    sample
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_sample"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"))
      .select("event_type", "n_sample", "p50", "p90", "p99")
      .orderBy("event_type")

  /** Histogram-SKETCH grouped quantiles — the third point on the
    * quantile cost curve after exact ([[valueQuantiles]]: per-group sort)
    * and sampled ([[sampledValueQuantiles]]: pruned scan, still a sort):
    * equi-width bin counts are a CONSTANT-SIZE MERGEABLE state
    * (types × bins exact BIGINT rows — additive, so partial histograms
    * combine map-side and across ingest batches), and each quantile is
    * answered by integer-exact bin selection plus one fixed-op-tree
    * linear interpolation inside the bin. Accuracy bound: the estimate
    * is within one bin `width` of a true q-quantile — the equi-width
    * trade a monitoring dashboard takes for O(bins) state (cf. the
    * sketch family's CMS/KMV trades).
    *
    * Cross-engine exactness: bins come from ONE IEEE divide + floor
    * (identical bits); cumulative counts and the selection predicate
    * `100·cum ≥ p·n` are exact BIGINT (no FP compare decides a bin);
    * the interpolation `bin·w + (w·(p·n − 100·cumBefore)) / (100·cs)`
    * is a fixed op tree over exact integers with one division — shipped
    * UNROUNDED (bit-identical; rounding a bit-identical double can
    * itself diverge). The cum window runs over the PARAMETER-SCALE
    * (type, bin) frame, never the events.
    * Output: (event_type, p, n, bin, est) for p ∈ ps, ordered.
    */
  def histQuantiles(events: DataFrame, width: Double = 10.0,
                    ps: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantilesOfBins(histBinCounts(events, width)
      .localCheckpoint(true), // parameter-scale; feeds cum window AND totals
      width, ps)

  /** The ONE data-sized pass of [[histQuantiles]]: exact (type, bin)
    * BIGINT counts — purely ADDITIVE (the mergeable sketch state), so
    * the streaming twin ([[graft.streaming.StreamOps
    * .histQuantilesReplayBatch]]) folds per-batch count frames into a
    * running state losslessly.
    */
  private[graft] def histBinCounts(events: DataFrame,
                                   width: Double): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / lit(width)).cast("long").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).cast("long").as("cs"))

  /** The parameter-scale tail of [[histQuantiles]] over a materialized
    * (event_type, bin, cs) frame — shared VERBATIM by the batch query
    * and the streaming twin.
    */
  private[graft] def quantilesOfBins(b: DataFrame, width: Double,
                                     ps: Seq[Int]): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("bin")
    val c = b.withColumn("cum", sum("cs").over(w).cast("long"))
      .withColumn("cumb", col("cum") - col("cs"))
    val n = b.groupBy("event_type").agg(sum("cs").cast("long").as("n"))
    val sel = c.join(n, "event_type")
      .select(col("event_type"), col("bin"), col("cs"), col("cumb"),
        col("cum"), col("n"), explode(typedlit(ps)).as("p"))
      .filter(lit(100L) * col("cum") >= col("p") * col("n"))
    val rk = Window.partitionBy("event_type", "p").orderBy("bin")
    sel.withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("p").cast("long").as("p"), col("n"),
        col("bin"),
        (col("bin").cast("double") * lit(width) +
          (lit(width) * (col("p") * col("n") - lit(100L) * col("cumb"))
            .cast("double")) / (lit(100.0) * col("cs").cast("double")))
          .as("est"))
      .orderBy("event_type", "p")
  }

  /** Winsorization — the outlier-clipping normalization a training-data
    * pipeline applies before feature scaling: per event type, clamp
    * `value` into its own [p_lo, p_hi] discrete-quantile band. Every
    * number here is a RAW input double (PERCENTILE_DISC returns data
    * values; least/greatest select between them) — bit-identical on any
    * engine with NO rounding. One tiny per-type quantile aggregate
    * broadcast back over the events — a scan-speed plan at any scale.
    * Output: (event_id, event_type, value, value_w) ordered.
    */
  def winsorize(events: DataFrame, lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    val q = events.groupBy("event_type")
      .agg(expr(s"percentile_disc($lo) WITHIN GROUP (ORDER BY value)").as("p_lo"),
        expr(s"percentile_disc($hi) WITHIN GROUP (ORDER BY value)").as("p_hi"))
    events.join(broadcast(q), "event_type")
      .select(col("event_id").cast("long").as("event_id"), col("event_type"),
        col("value"),
        least(greatest(col("value"), col("p_lo")), col("p_hi")).as("value_w"))
      .orderBy("event_id")
  }

  /** Robust outlier detection via the median absolute deviation — the
    * heavy-tail-safe alternative to z-scores (mean/stddev are themselves
    * dragged by the outliers they're meant to find): flag events with
    * `|value − median| > k·MAD` per type. Exact and rounding-free
    * cross-engine: the median and the MAD are discrete quantiles (raw
    * input doubles / single-subtraction deviations), and `k·MAD` is one
    * IEEE multiply. Two tiny per-type aggregates broadcast back over the
    * scan. Output: flagged rows (event_id, event_type, value, med, mad)
    * ordered.
    */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val dev = events.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(k) * col("mad"))
      .select(col("event_id").cast("long").as("event_id"), col("event_type"),
        col("value"), col("med"), col("mad"))
      .orderBy("event_id")
  }

  /** Funnel analysis: users whose first view precedes their first click,
    * which precedes their first purchase (conditional-min aggregation —
    * one shuffle on user_id, no self-joins).
    */
  def funnelUsers(events: DataFrame): DataFrame = {
    events
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
        msOf(events).as("ms"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ms"))).as("first_view"),
        min(when(col("event_type") === "click", col("ms"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ms"))).as("first_purchase"))
      .filter(col("first_view") < col("first_click") &&
        col("first_click") < col("first_purchase"))
      .select(col("user_id"), col("first_view").cast("long").as("first_view"),
        col("first_click").cast("long").as("first_click"),
        col("first_purchase").cast("long").as("first_purchase"))
      // NULLS LAST matches DuckDB's default ASC placement
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** SLIDING-window event rates via Spark's `window()` function — windows
    * of `lenMin` minutes advancing every `slideMin` (each event lands in
    * len/slide overlapping windows; epoch-aligned starts, the same
    * convention DuckDB replays with a bin explode). Overlap factor is the
    * only row amplification; one shuffle on (window, type) with map-side
    * partial aggregation. Output: (window_start_ms, event_type, n) ordered.
    */
  def slidingRates(events: DataFrame, lenMin: Int = 10, slideMin: Int = 5): DataFrame = {
    events
      .select(timestamp_millis(msOf(events)).as("t"), col("event_type"))
      .groupBy(window(col("t"), s"$lenMin minutes", s"$slideMin minutes"),
        col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"))
      .orderBy("window_start_ms", "event_type")
  }

  /** Tumbling-hour event rates: (hour_ms, event_type, n, sum_value). */
  def hourlyRates(events: DataFrame): DataFrame = {
    val ms = msOf(events)
    events
      .select((ms - ms % 3600000L).as("hour_ms"),
        col("event_type"), col("value"))
      .groupBy("hour_ms", "event_type")
      .agg(count(lit(1)).cast("long").as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_ms", "event_type")
  }

  /** EWMA-smoothed hourly event volume — the time-series smoothing
    * primitive behind rate dashboards and anomaly baselines. α = 1/2
    * over a `kernelHours` lookback, so the weight for lag d is 2^(K−1−d)
    * — an EXACT BIGINT: the weighted numerator and the present-weight
    * denominator are exact integer sums and each smoothed value spends
    * exactly ONE IEEE division (bit-identical cross-engine, shipped
    * unrounded). Hours with no events drop out of BOTH sums — gap-aware
    * normalization, not zero-fill. The kernel lookup is a BANDED
    * self-join (bin = hour div K; each target covers its bin and the
    * previous, sources carry their own bin — the [[RangeJoin]] recipe),
    * ONE equi-join shuffle with ≤ 2K candidates per target; NEVER a
    * single-partition ordered window over the time axis (the
    * hourly_drawdown discipline: a global `ROWS BETWEEN 9 PRECEDING`
    * window would serialize the whole series through one task).
    * Output: (hour_ms, n_events, ewma) ordered.
    */
  def hourlyEwma(events: DataFrame, kernelHours: Int = 10): DataFrame = {
    val k = kernelHours
    val ms = msOf(events)
    val hourly = events.select((ms - ms % 3600000L).as("hm"))
      .groupBy("hm").agg(count(lit(1)).cast("long").as("x"))
      .select(expr("hm div 3600000").as("h"), col("x"))
      .localCheckpoint(true) // small (one row per hour); feeds BOTH join sides
    val targets = hourly
      .select(col("h").as("t"),
        explode(array(expr(s"h div $k") - 1, expr(s"h div $k"))).as("bin"))
    val sources = hourly
      .select(expr(s"h div $k").as("bin"), col("h").as("i"), col("x"))
    targets.join(sources, "bin")
      .filter(col("t") - col("i") >= 0 && col("t") - col("i") <= k - 1)
      .select(col("t"), col("x"),
        expr(s"CAST(shiftleft(CAST(1 AS BIGINT), CAST(${k - 1} - (t - i) AS INT)) AS BIGINT)")
          .as("w"))
      .groupBy("t")
      .agg(sum(col("w") * col("x")).cast("long").as("num"),
        sum(col("w")).cast("long").as("den"))
      .join(hourly.select(col("h").as("t"), col("x")), Seq("t"))
      .select((col("t") * 3600000L).as("hour_ms"), col("x").as("n_events"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma"))
      .orderBy("hour_ms")
  }

  /** Cohort retention: users grouped by first-seen week (their cohort),
    * counted in every subsequent week they were active — the retention
    * matrix. The plan dedups (user, week) pairs FIRST, so the final
    * aggregate is a plain count, not a COUNT DISTINCT (whose per-group
    * dedup state is the classic retention-query scale trap); the cohort
    * join shuffles on user_id, the same key the dedup used. Week
    * arithmetic is pure epoch-ms integer math, engine-identical.
    * Output: (cohort_ms, week_offset, n_users) ordered.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weekMs = 604800000L
    val ms = msOf(events)
    val uw = events
      .select(col("user_id").cast("long").as("u"), (ms - ms % weekMs).as("wk"))
      .distinct()
    val firstWeek = uw.groupBy("u").agg(min("wk").as("cw"))
    uw.join(firstWeek, Seq("u"))
      .groupBy(col("cw").cast("long").as("cohort_ms"),
        expr(s"(wk - cw) div $weekMs").cast("long").as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy("cohort_ms", "week_offset")
  }

  /** Per-user event cadence: EXACT discrete quantiles of the inter-arrival
    * gap (ms between a user's consecutive events) per event type of the
    * LATER event — the latency/cadence profile. Gaps are BIGINT
    * differences off one lag window (shuffle on user_id); PERCENTILE_DISC
    * returns raw gap values, so every output is integer-exact with no
    * rounding. Output: (event_type, p50_gap_ms, p90_gap_ms, n_gaps).
    */
  def interArrivalQuantiles(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        msOf(events).as("ms"), col("event_type"))
      .withColumn("gap", col("ms") - lag("ms", 1).over(byUser))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)").cast("long").as("p50_gap_ms"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)").cast("long").as("p90_gap_ms"),
        count(lit(1)).cast("long").as("n_gaps"))
      .orderBy("event_type")
  }

  /** Cumulative distinct users per day — the growth curve. COUNT(DISTINCT)
    * OVER is unsupported (and unbounded-state) in most engines; the
    * first-seen rewrite makes it exact and cheap: each user contributes
    * once on their first-seen day, per-day new-user counts prefix-sum via
    * the distributed scan ([[Ranking.withRunningSums]]). Days without new
    * users carry no row (the curve is defined at its jump points).
    * Output: (day_ms, new_users, cum_users) ordered.
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val ms = msOf(events)
    val perDay = events
      .select(col("user_id").cast("long").as("u"), (ms - ms % 86400000L).as("day_ms"))
      .groupBy("u").agg(min("day_ms").as("first_day"))
      .groupBy(col("first_day").as("day_ms"))
      .agg(count(lit(1)).cast("long").as("new_users"))
    Ranking.withRunningSums(perDay, Seq("new_users"), col("day_ms"))
      .select(col("day_ms").cast("long").as("day_ms"), col("new_users"),
        col("cum_new_users").as("cum_users"))
      .orderBy("day_ms")
  }

  /** Volume-anomaly detection: hours whose event count deviates from the
    * corpus mean by more than `zThreshold` population standard
    * deviations. The z-score is built from EXACT integer moments
    * (N, Σn, Σn² — all BIGINT) in one fixed op tree,
    * z = (n·N − Σn) / √(N·Σn² − (Σn)²), so there is no FP-summation-
    * order hazard anywhere and the doubles ship unrounded. One shuffle
    * (the hourly count), moments broadcast back as one row.
    * Zero variance (every hour identical, or a single hour) makes z
    * undefined (0/0 = NaN — which Spark's `>` drops but DuckDB sorts above
    * every number); the exact-integer guard N·Σn² − (Σn)² > 0 excludes the
    * degenerate corpus identically in both engines: no hour is anomalous
    * when there is no variance.
    * Output: (hour_ms, n, z) ordered by hour_ms.
    */
  def hourlyAnomalies(events: DataFrame, zThreshold: Double = 2.5): DataFrame = {
    val ms = msOf(events)
    val hourly = events
      .select((ms - ms % 3600000L).as("hour_ms"))
      .groupBy("hour_ms").agg(count(lit(1)).cast("long").as("n"))
    val moments = hourly.agg(count(lit(1)).cast("long").as("nh"),
      sum("n").cast("long").as("sn"),
      sum(col("n") * col("n")).cast("long").as("snn"))
    hourly.crossJoin(broadcast(moments))
      .filter(col("nh") * col("snn") - col("sn") * col("sn") > 0)
      .withColumn("z", (col("n") * col("nh") - col("sn")).cast("double") /
        sqrt((col("nh") * col("snn") - col("sn") * col("sn")).cast("double")))
      .filter(abs(col("z")) > zThreshold)
      .select(col("hour_ms").cast("long"), col("n"), col("z"))
      .orderBy("hour_ms")
  }

  /** First-order Markov next-event prediction: for every event type, the
    * most likely successor — the argmax row of the [[typeTransitions]]
    * table per from_type, with the transition probability as one division
    * of exact BIGINT counts (bit-identical cross-engine, unrounded).
    * The argmax is an anti-join against any strictly better row
    * (more observations, or equal observations and lexicographically
    * smaller successor) — the formulation both engines evaluate
    * identically, with no reliance on engine-specific arg_max tie rules.
    * Scale: the transitions table is |types|² rows — the anti-join and
    * the totals join are broadcast-sized whatever the corpus size.
    * Output: (from_type, next_type, n, n_from, p) ordered by from_type.
    */
  def markovNextEvent(events: DataFrame): DataFrame = {
    val trans = typeTransitions(events).localCheckpoint(true) // three consumers
    val totals = trans.groupBy("from_type").agg(sum("n").cast("long").as("n_from"))
    val better = trans.select(col("from_type"),
      col("to_type").as("bt"), col("n").as("bn"))
    trans.join(better,
        trans("from_type") === better("from_type") &&
          (col("bn") > col("n") ||
            (col("bn") === col("n") && col("bt") < col("to_type"))),
        "left_anti")
      .join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type").as("next_type"), col("n"),
        col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("from_type")
  }

  /** Largest traffic DROPS: per hour, the peak hourly event count over all
    * STRICTLY preceding hours and the drawdown below that peak — pure
    * BIGINT end to end (no doubles anywhere). The prefix-max is the
    * distributed two-pass scan ([[Ranking.withRunningMax]] — per-partition
    * maxima broadcast as offsets), never `max() OVER (ORDER BY …)`'s
    * single-task sort. Output: hours with drawdown ≥ `minDrop`
    * (hour_ms, n, peak_before, drawdown) ordered by hour_ms.
    */
  def hourlyDrawdown(events: DataFrame, minDrop: Long = 1L): DataFrame = {
    val ms = msOf(events)
    val hourly = events
      .select((ms - ms % 3600000L).as("hour_ms"))
      .groupBy("hour_ms").agg(count(lit(1)).cast("long").as("n"))
    Ranking.withRunningMax(hourly, "n", col("hour_ms"))
      .filter(col("prev_max").isNotNull &&
        col("prev_max") - col("n") >= minDrop)
      .select(col("hour_ms").cast("long").as("hour_ms"), col("n"),
        col("prev_max").as("peak_before"),
        (col("prev_max") - col("n")).as("drawdown"))
      .orderBy("hour_ms")
  }

  /** CUSUM change-point over hourly event volume (Page 1954; the
    * Pettitt-style single-change scan): the hour k maximizing
    * |S_k − (k/m)·S_m| — where the cumulative count S_k departs furthest
    * from the uniform-rate line — flags WHEN the event rate shifted, the
    * counterpart of [[hourlyDrawdown]]'s "how far below peak". The
    * argmax is decided on the EXACT BIGINT cross-multiplied numerator
    * |m·S_k − k·S_m| (the [[graft.pipeline.Drift.ksStatistic]]
    * discipline — no FP comparison anywhere), ties to the earliest hour;
    * the normalized statistic and the before/after mean rates each spend
    * one final IEEE division. Cumulative counts ride the distributed
    * two-pass prefix scan, never a single-partition window. Output: one
    * row (change_hour_ms, k, m, d_num, cusum, mean_before, mean_after).
    */
  def hourlyChangePoint(events: DataFrame): DataFrame =
    changePointOfHourly(hourlyCounts(events))

  /** The data-sized half of [[hourlyChangePoint]]: hourly event counts.
    * Factored out so the STREAMING twin can maintain exactly this
    * relation incrementally across micro-batches (hour_ms-keyed additive
    * state) and then run the SAME scan kernel below — the
    * decontamination-pair discipline: one kernel, two execution modes.
    */
  def hourlyCounts(events: DataFrame): DataFrame = {
    val ms = msOf(events)
    events
      .select((ms - ms % 3600000L).as("hour_ms"))
      .groupBy("hour_ms").agg(count(lit(1)).cast("long").as("n"))
  }

  /** The parameter-scale half of [[hourlyChangePoint]]: the CUSUM argmax
    * over an `(hour_ms, n)` relation (one row per hour — bounded by the
    * time range, not the event volume).
    */
  def changePointOfHourly(hourly: DataFrame): DataFrame = {
    val cum = Ranking.withRunningSums(
      Ranking.withGlobalIndex(hourly, col("hour_ms")), Seq("n"), col("idx"))
    val tot = broadcast(cum.agg(max("cum_n").cast("long").as("sn"),
      count(lit(1)).cast("long").as("m")))
    cum.crossJoin(tot)
      .withColumn("k", col("idx") + 1L)
      .withColumn("d", abs(col("m") * col("cum_n") - col("k") * col("sn")))
      .orderBy(col("d").desc, col("hour_ms"))
      .limit(1)
      .select(col("hour_ms").cast("long").as("change_hour_ms"),
        col("k"), col("m"), col("d").as("d_num"),
        (col("d").cast("double") / (col("m") * col("sn"))).as("cusum"),
        (col("cum_n").cast("double") / col("k")).as("mean_before"),
        when(col("k") === col("m"), lit(null).cast("double"))
          .otherwise((col("sn") - col("cum_n")).cast("double") /
            (col("m") - col("k"))).as("mean_after"))
  }

  /** Two-proportion A/B conversion test: users split deterministically by
    * the portable 60-bit md5 hash (arm A = even hash), conversion = the
    * user has ≥1 HIGH-VALUE purchase (value > 100 — plain purchase is
    * saturated in this corpus: every user converts and the pooled
    * variance degenerates to 0/0). The z statistic is built ONLY from the
    * four exact BIGINT counts (n_a, conv_a, n_b, conv_b) in one fixed
    * IEEE op tree — identical evaluation order in both engines, shipped
    * unrounded (same contract as BM25). The exact-integer guard keeps the
    * degenerate corpora (empty arm, all-converted, none-converted — where
    * z is undefined and ANSI Spark would raise where DuckDB yields
    * NaN/Inf) out identically on both sides: such input yields zero rows.
    * One shuffle (per-user aggregate); the rest is a one-row reduction.
    * Output: one row (n_a, conv_a, n_b, conv_b, z).
    */
  def abTestConversion(events: DataFrame, minValue: Double = 100.0): DataFrame = {
    import graft.functions.PortableHash.md5Bits60
    val users = events
      .select(col("user_id").cast("long").as("u"), col("event_type"), col("value"))
      .groupBy("u")
      .agg(max(when(col("event_type") === "purchase" && col("value") > minValue, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm", pmod(md5Bits60(col("u").cast("string")), lit(2L)))
    val counts = users.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("arm") === 0L, col("converted")).otherwise(0L)).cast("long").as("conv_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(col("arm") === 1L, col("converted")).otherwise(0L)).cast("long").as("conv_b"))
    // z = (pa − pb) / sqrt(p·(1−p)·(1/na + 1/nb)), pooled p — every input
    // an exact integer, each division written once, fixed order
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    counts
      .filter(col("n_a") > 0 && col("n_b") > 0 &&
        col("conv_a") + col("conv_b") > 0 &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        ((pa - pb) / sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double")))).as("z"))
  }

  /** Funnel conversion by A/B arm: per md5-split arm (the
    * [[abTestConversion]] split), how many users reach each funnel stage
    * (any view; first view before first click; that before first
    * purchase — the [[funnelUsers]] chain). All exact BIGINT counts, no
    * rate doubles — downstream dashboards divide. One shuffle (per-user
    * conditional mins), then a 2-row aggregate.
    * Output: (arm, n_users, n_viewed, n_clicked, n_purchased) ordered.
    */
  def funnelByArm(events: DataFrame): DataFrame = {
    import graft.functions.PortableHash.md5Bits60
    val ms = msOf(events)
    events
      .select(col("user_id").cast("long").as("u"), col("event_type"), ms.as("ms"))
      .groupBy("u")
      .agg(min(when(col("event_type") === "view", col("ms"))).as("fv"),
        min(when(col("event_type") === "click", col("ms"))).as("fc"),
        min(when(col("event_type") === "purchase", col("ms"))).as("fp"))
      .withColumn("arm", pmod(md5Bits60(col("u").cast("string")), lit(2L)))
      .groupBy("arm")
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(when(col("fv").isNotNull, 1L).otherwise(0L)).cast("long").as("n_viewed"),
        sum(when(col("fv") < col("fc"), 1L).otherwise(0L)).cast("long").as("n_clicked"),
        sum(when(col("fv") < col("fc") && col("fc") < col("fp"), 1L)
          .otherwise(0L)).cast("long").as("n_purchased"))
      .orderBy("arm")
  }

  /** Long-to-wide pivot: per-day event counts, one column per type in
    * `types` (the explicit value list keeps the schema static — no
    * pre-scan job — and makes the plan a single partial-aggregating
    * shuffle on day, exactly the conditional-sum the oracle writes).
    * Absent (day, type) cells are 0, not null.
    * Output: (day_ms, n_<type>...) ordered by day_ms.
    */
  def dailyTypePivot(events: DataFrame, types: Seq[String]): DataFrame = {
    val ms = msOf(events)
    events
      .select((ms - ms % 86400000L).as("day_ms"), col("event_type"))
      .groupBy("day_ms")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day_ms") +:
        types.map(tp => coalesce(col(tp), lit(0L)).cast("long").as(s"n_$tp")): _*)
      .orderBy("day_ms")
  }
}
