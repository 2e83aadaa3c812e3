package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import SparkTestSession._

/** Bucketing = the pre-shuffle lever for repeated co-located joins: both
  * sides written bucketed on the join key join WITHOUT an Exchange. At
  * 100 TB this turns every recurring fact⋈fact join from a full shuffle
  * into a local zip of bucket files.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed tables join with no shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == lineitem.count()) // every lineitem has its order

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("bucketed GraphCatalog: frontier join reads the edge snapshot without an Exchange") {
    import graft.graph.GraphCatalog
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat_bucketed_").toString
    val cat = new GraphCatalog(spark, tmp, buckets = Some(4))
    val plain = new GraphCatalog(spark, tmp) // same dirs, path-reader view
    val edges = undirected((1, 2), (1, 4), (2, 5), (2, 7), (3, 4), (6, 7))
    cat.add("GB", edges)
    try {
      val e = cat.load("GB")
      // the per-round BFS shape: frontier ⋈ edges ON src. The bucketed
      // snapshot must contribute NO Exchange — only the frontier side
      // repartitions to match the bucket layout.
      val frontier = Seq(1L).toDF("src")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = e.join(frontier, "src")
        val nExchanges = "Exchange hashpartitioning".r
          .findAllIn(joined.queryExecution.executedPlan.toString).length
        assert(nExchanges == 1,
          s"expected only the frontier-side Exchange, got $nExchanges:\n" +
            joined.queryExecution.executedPlan)
        // degree aggregate on the bucket key: zero Exchanges
        val deg = e.groupBy("src").count()
        assert(!deg.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"),
          "degree aggregate on bucket key still shuffles")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // correctness: bucketed read == plain path read of the same snapshot
      val viaBucket = e.orderBy("src", "dst").collect().toSeq
      val viaPath = plain.load("GB").orderBy("src", "dst").collect().toSeq
      assert(viaBucket == viaPath)
      // MVCC still holds: modify writes v2 bucketed; v1 stays time-travelable
      cat.modify("GB", undirected((1, 2)))
      assert(cat.versions("GB") == Seq(1L, 2L))
      assert(cat.load("GB").count() == 2)
      assert(cat.load("GB", 1L).count() == 12)
      // vacuum drops the superseded version's table AND files
      cat.vacuum("GB")
      assert(cat.versions("GB") == Seq(2L))
    } finally cat.dropAll()
  }

  test("bucketed GraphCatalog: delta chain + compact keep the bucketed no-Exchange read") {
    import graft.graph.GraphCatalog
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat_bcompact_").toString
    val cat = new GraphCatalog(spark, tmp, buckets = Some(4))
    try {
      cat.add("GC", Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      cat.modifyDelta("GC", Seq((3L, 4L)).toDF("src", "dst"))
      cat.modifyDelta("GC", Seq((4L, 5L)).toDF("src", "dst"))
      assert(cat.load("GC").count() == 4L)
      // compact folds the bucketed chain into ONE bucketed base version
      cat.compact("GC")
      assert(cat.versions("GC").length == 1)
      assert(cat.load("GC").orderBy("src", "dst").collect().toSeq ==
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
          .map(p => org.apache.spark.sql.Row(p._1, p._2)))
      // the compacted snapshot still carries the bucket layout: a degree
      // aggregate on the bucket key plans NO Exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val deg = cat.load("GC").groupBy("src").count()
        assert(!deg.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"),
          "compacted bucketed snapshot lost the no-shuffle aggregate")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally cat.dropAll()
  }

  test("bucketed GraphCatalog: time travel to a vacuumed pre-compaction version throws typed, never a partial chain") {
    // r13 task: the compaction's vacuum deletes the superseded base+delta
    // versions — a time-travel read of one of them must fail with the
    // typed version miss (listing what IS retained), and must never serve
    // a partial chain (e.g. a surviving delta without its vacuumed base).
    import graft.graph.{GraphCatalog, GraphNotFoundException}
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat_bvac_").toString
    val cat = new GraphCatalog(spark, tmp, buckets = Some(4))
    try {
      cat.add("GV", Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))     // v1 base
      cat.modifyDelta("GV", Seq((3L, 4L)).toDF("src", "dst"))       // d2
      cat.modifyDelta("GV", Seq((4L, 5L)).toDF("src", "dst"))       // d3
      // pre-compaction versions are all time-travelable
      assert(cat.load("GV", 2L).count() == 3L)
      cat.compact("GV") // -> v4 base; vacuum removes v1, d2, d3
      assert(cat.versions("GV") == Seq(4L), s"retained: ${cat.versions("GV")}")
      // every vacuumed version throws the TYPED miss naming the retained set
      Seq(1L, 2L, 3L).foreach { v =>
        val e = intercept[GraphNotFoundException] { cat.load("GV", v) }
        assert(e.getMessage.contains("vacuumed or never written"),
          s"v$v: wrong error: ${e.getMessage}")
        assert(e.getMessage.contains("retained versions: 4"),
          s"v$v: retained set missing from: ${e.getMessage}")
      }
      // the retained compacted base still serves the full contents
      assert(cat.load("GV", 4L).count() == 4L)
      assert(cat.load("GV").count() == 4L)
    } finally cat.dropAll()
  }
}
