package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the batch K4 census (optimization round 19):
  * times each materialization boundary of [[graft.graph.GraphOps.fourCliqueCounts]]
  * separately so the 17 s sequential cost can be attributed. Not a declared
  * query; not part of the bench.
  */
object ProfileK4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[k4prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // replicate fourCliqueCounts stage by stage
    val pairs = SparkEntry.coPurchasePairs(spark, sfDir, minOrders = 1L)
    val p = time("p = coPurchasePairs checkpoint") {
      pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
        .localCheckpoint(true)
    }
    System.err.println(s"[k4prof] |p| = ${time("p.count")(p.count())}")
    val deg = time("deg checkpoint") {
      graft.graph.GraphOps.pairDegrees(p).localCheckpoint(true)
    }
    val o = time("o = orientByDegree checkpoint") {
      graft.graph.GraphOps.orientByDegree(p, deg).localCheckpoint(true)
    }
    val probe = graft.graph.GraphOps.censusProbe(o)
    val tri = time("orientedTriangles materialize") {
      graft.graph.GraphOps.orientedTriangles(o, probe).localCheckpoint(true)
    }
    System.err.println(s"[k4prof] |tri| = ${tri.count()}")
    val quad = time("quad joins materialize") {
      tri.join(probe(o.select(col("u").as("w"), col("v").as("t"))), "w")
        .join(probe(o.select(col("u"), col("v").as("t"))), Seq("u", "t"), "left_semi")
        .join(probe(o.select(col("u").as("v"), col("v").as("t"))), Seq("v", "t"), "left_semi")
        .localCheckpoint(true)
    }
    System.err.println(s"[k4prof] |quad| = ${quad.count()}")
    val out = time("explode+agg+orderBy") {
      quad.select(explode(array(col("u"), col("v"), col("w"), col("t"))).as("vertex"))
        .groupBy("vertex").agg(count(lit(1)).cast("long").as("n_cliques4"))
        .orderBy("vertex").count()
    }
    System.err.println(s"[k4prof] |out| = $out")
    // wedge fan-out size (the quantity the probes filter)
    val wedges = time("raw wedge count (no closing probe)") {
      o.join(o.select(col("u").as("v"), col("v").as("w")), "v").count()
    }
    System.err.println(s"[k4prof] |wedges| = $wedges; |o| = ${o.count()}")
    // extension-path candidate volume (the old quad fan-out)
    val extCand = time("extension candidate count") {
      tri.join(o.select(col("u").as("w"), col("v").as("t")), "w").count()
    }
    System.err.println(s"[k4prof] |extCand| = $extCand")
    // ALTERNATIVE quad shape: triangle self-join on the shared ≺-min edge
    // (u, v); the two third-corners w < x (id order) give the unordered
    // pair once; closing edge {w, x} verified against the ID-canonical
    // pair set p
    val quad2 = time("tri-pair quads materialize") {
      tri.join(tri.select(col("u"), col("v"), col("w").as("x")), Seq("u", "v"))
        .filter(col("w") < col("x"))
        .join(probe(p.select(col("a").as("w"), col("b").as("x"))),
          Seq("w", "x"), "left_semi")
        .localCheckpoint(true)
    }
    System.err.println(s"[k4prof] |quad2| = ${quad2.count()} (must equal |quad|)")
    val pairCand = time("tri-pair candidate count") {
      tri.join(tri.select(col("u"), col("v"), col("w").as("x")), Seq("u", "v"))
        .filter(col("w") < col("x")).count()
    }
    System.err.println(s"[k4prof] |pairCand| = $pairCand")
    spark.stop()
  }
}
