package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-hub skew soak for the wedge/clique census family (round-12
  * task #8): quantify what the degree-ordered orientation buys under the
  * adversarial case the ID-ordered plan could not bound — a single
  * high-degree hub whose id sorts FIRST.
  *
  * Setup: the sf0.1 co-purchase pair graph, plus one synthetic hub wired
  * to `hubDeg` vertices. The adversarial id for the ID-ordered plan is
  * the MEDIAN of the range (a smallest- or largest-id hub is never the
  * middle of a canonical a&lt;b&lt;c wedge): the median-rank vertex becomes
  * the hub, wired to the hubDeg/2 smallest and hubDeg/2 largest other
  * vertices, so the ID-ordered wedge join fans in_id·out_id ≈ (hubDeg/2)²
  * candidate rows onto ONE join key (a single straggler task). Under the
  * (degree, id) orientation every hub edge points INTO the hub (it has
  * the max degree) and the hub's wedge fan-out is zero — the work moves
  * to the low-degree endpoints where it is bounded by the O(√m)
  * out-degree.
  *
  * Measured: triangle census via the library (degree-ordered) vs an
  * inline ID-ordered twin (the pre-round-12 plan, kept HERE as the
  * experiment's control — not in the library), on the base graph and the
  * hub graph; plus the K4 census on both graphs via the library. Both
  * orientations count the same triangles (asserted) — only the work
  * distribution differs. Writes HUBSOAK.json.
  *
  * Usage: `sbt "runMain graft.HubSoak [sf0.1Dir]"`; env:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_HUB_DEG (default 10000),
  * SPARK_GRAFT_HUBSOAK_OUT.
  */
object HubSoak {

  /** The pre-round-12 ID-ordered triangle plan (control). */
  private def idOrderedTriangles(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .localCheckpoint(true)
    val tri = p
      .join(p.select(col("a").as("b"), col("b").as("c")), "b")
      .join(p.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hubDeg = sys.env.getOrElse("SPARK_GRAFT_HUB_DEG", "10000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = SparkEntry.coPurchasePairs(spark, srcDir, minOrders = 1L)
      .localCheckpoint(true)
    // median-rank vertex becomes the hub (deterministic), wired to the
    // hubDeg/2 smallest and hubDeg/2 largest OTHER vertices — maximal
    // in_id·out_id fan-out through one key for the ID-ordered control
    val verts = base.select(col("a").as("v"))
      .unionAll(base.select(col("b").as("v")))
      .distinct().orderBy("v")
      .collect().map(_.getLong(0)) // vertex ids: parameter-scale (|parts|)
    val hubId = verts(verts.length / 2)
    val half = hubDeg / 2
    val others = verts.filter(_ != hubId)
    val targets = (others.take(half) ++ others.takeRight(half)).distinct
    import spark.implicits._
    val hubEdges = targets.toSeq
      .map(v => (math.min(v, hubId), math.max(v, hubId))).toDF("a", "b")
    val hubbed = base
      // drop any pre-existing hub edges so the union stays a distinct set
      .join(hubEdges, Seq("a", "b"), "left_anti")
      .unionAll(hubEdges)
      .localCheckpoint(true)

    // JVM/codegen warm-up (the Soak discipline)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // NOTE: no blanket unpersist here — base/hubbed are localCheckpoints
    // shared by every measurement (unpersisting them truncates lineage
    // they cannot recompute); the cache clear + gc is the per-measurement
    // hygiene
    def isolate(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }
    // median of reps with per-rep isolation: kills measurement-order JIT
    // confounds between the four configurations
    val reps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "3").toInt
    def time(f: => Long): (Double, Long) = {
      var n = 0L
      val times = (1 to reps).map { _ =>
        isolate()
        val t0 = System.nanoTime()
        n = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ((times(times.size / 2) + times((times.size - 1) / 2)) / 2, n)
    }

    // triangle sums must agree between orientations on BOTH graphs —
    // the experiment compares work distribution, never results
    def triSum(df: DataFrame): Long =
      df.agg(sum("n_triangles")).collect()(0).getLong(0)

    val (tDegBase, sDegBase) = time(triSum(graph.GraphOps.triangleCounts(base)))
    val (tIdBase, sIdBase) = time(triSum(idOrderedTriangles(base)))
    val (tDegHub, sDegHub) = time(triSum(graph.GraphOps.triangleCounts(hubbed)))
    val (tIdHub, sIdHub) = time(triSum(idOrderedTriangles(hubbed)))
    require(sDegBase == sIdBase, s"base census diverged: $sDegBase vs $sIdBase")
    require(sDegHub == sIdHub, s"hub census diverged: $sDegHub vs $sIdHub")

    def k4Sum(df: DataFrame): Long =
      df.agg(coalesce(sum("n_cliques4"), lit(0L))).collect()(0).getLong(0)
    val (k4Base, _) = time(k4Sum(graph.GraphOps.fourCliqueCounts(base)))
    val (k4Hub, _) = time(k4Sum(graph.GraphOps.fourCliqueCounts(hubbed)))

    val json =
      f"""{"src":"$srcDir","hub_degree":$hubDeg,"hub_id":$hubId,"cpus":$cpus,"reps":$reps,""" +
        f""""triangle":{"degree_base_sec":$tDegBase%.2f,"id_base_sec":$tIdBase%.2f,""" +
        f""""degree_hub_sec":$tDegHub%.2f,"id_hub_sec":$tIdHub%.2f,""" +
        f""""hub_slowdown_degree":${tDegHub / tDegBase}%.2f,""" +
        f""""hub_slowdown_id":${tIdHub / tIdBase}%.2f},""" +
        f""""fourclique":{"degree_base_sec":$k4Base%.2f,"degree_hub_sec":$k4Hub%.2f,""" +
        f""""hub_slowdown_degree":${k4Hub / k4Base}%.2f},""" +
        f""""note":"median-id vertex $hubId wired to the $hubDeg/2 smallest and """ +
        """largest other vertices: the ID-ordered control funnels in_id*out_id """ +
        """wedge candidates through the single middle key, degree-ordering points """ +
        """every hub edge INTO the hub (zero hub fan-out); triangle sums asserted """ +
        """equal across orientations"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_HUBSOAK_OUT", "HUBSOAK.json")), json)
    spark.stop()
  }
}
