package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.model.MatrixCodec
import SparkTestSession._

/** Local FS under a test-only `graftfs://` scheme, discoverable ONLY through
  * a `fs.graftfs.impl` conf key — lets a spec prove which Hadoop conf a
  * filesystem resolution actually used.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

class MatrixSourceSpec extends AnyFunSuite {

  private def writeGraph(dir: java.nio.file.Path, name: String,
                         n: Int, edges: Seq[(Long, Long)]): Unit =
    java.nio.file.Files.writeString(dir.resolve(name),
      MatrixCodec.renderMatrixText(n, edges))

  test("format(graft-matrix) reads a directory of graphs file-parallel with graph_id") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_spec_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    writeGraph(dir, "G2.txt", 2, Seq((1L, 2L), (2L, 1L)))
    java.nio.file.Files.writeString(dir.resolve("notes.md"), "ignored")
    val out = spark.read.format("graft-matrix").load(dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("G1", 1L, 2L), ("G1", 2L, 1L), ("G1", 2L, 3L), ("G1", 3L, 2L),
      ("G2", 1L, 2L), ("G2", 2L, 1L)))
    // two files → two input partitions
    val parts = spark.read.format("graft-matrix").load(dir.toString)
      .rdd.getNumPartitions
    assert(parts == 2)
  }

  test("column pruning reaches the scan (pushed required schema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_prune_")
    writeGraph(dir, "G1.txt", 2, Seq((1L, 2L)))
    val q = spark.read.format("graft-matrix").load(dir.toString).select(col("src"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("graft-matrix"), scan)
    assert(scan.contains("src") && !scan.contains("graph_id"),
      s"required schema not pruned to src:\n$scan")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("loads through the Hadoop FS API: explicit file: URI directory scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_uri_")
    writeGraph(dir, "G1.txt", 2, Seq((1L, 2L), (2L, 1L)))
    writeGraph(dir, "G2.txt", 2, Seq((2L, 2L)))
    val out = spark.read.format("graft-matrix").load(s"file://$dir")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("G1", 1L, 2L), ("G1", 2L, 1L), ("G2", 2L, 2L)))
  }

  test("V2 write: one file per graph_id, clustering/order planned by Spark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_write_")
    // rows deliberately interleaved and unsorted: the sink's declared
    // RequiresDistributionAndOrdering must regroup and order them
    val edges = Seq(
      ("G2", 2L, 1L), ("G1", 1L, 2L), ("G2", 1L, 2L),
      ("G1", 2L, 1L), ("G1", 2L, 3L), ("G2", 2L, 2L))
      .toDF("graph_id", "src", "dst").repartition(4)
    edges.write.format("graft-matrix").mode("append").save(dir.toString)
    val files = {
      val listing = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".txt")).toSet // Hadoop local FS adds .crc sidecars
      } finally listing.close()
    }
    assert(files == Set("G1.txt", "G2.txt"), files.toString)
    val back = spark.read.format("graft-matrix").load(dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == Set(
      ("G1", 1L, 2L), ("G1", 2L, 1L), ("G1", 2L, 3L),
      ("G2", 1L, 2L), ("G2", 2L, 1L), ("G2", 2L, 2L)))
    // deterministic bytes: G1 has 3 vertices -> 3x3 matrix
    assert(java.nio.file.Files.readString(dir.resolve("G1.txt"))
      == MatrixCodec.renderMatrixText(3, Seq((1L, 2L), (2L, 1L), (2L, 3L))))
  }

  test("V2 write: overwrite mode replaces a graph file whole") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_write_ow_")
    Seq(("G1", 1L, 2L), ("G1", 2L, 1L)).toDF("graph_id", "src", "dst")
      .write.format("graft-matrix").mode("append").save(dir.toString)
    Seq(("G1", 2L, 2L)).toDF("graph_id", "src", "dst")
      .write.format("graft-matrix").mode("overwrite").save(dir.toString)
    val back = spark.read.format("graft-matrix")
      .load(dir.resolve("G1.txt").toString)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(back == Set((2L, 2L)))
  }

  test("V2 write: staged commit leaves no temp files and only final G*.txt names") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_stage_")
    Seq(("G1", 1L, 2L), ("G2", 2L, 1L)).toDF("graph_id", "src", "dst")
      .write.format("graft-matrix").mode("append").save(dir.toString)
    val names = {
      val listing = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.endsWith(".crc")).toSet
      } finally listing.close()
    }
    assert(names == Set("G1.txt", "G2.txt"),
      s"expected only final names after job commit, got $names")
    assert(!names.exists(_.startsWith("_tmp_")), s"staged temps leaked: $names")
  }

  test("V2 write: an orphan temp from a dead attempt is swept at job commit, final files untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_sweep_")
    // simulate a hard-killed attempt: a stale staged file no abort() cleaned
    java.nio.file.Files.writeString(dir.resolve("_tmp_999_G7.txt"),
      MatrixCodec.renderMatrixText(2, Seq((1L, 2L))))
    Seq(("G1", 1L, 2L)).toDF("graph_id", "src", "dst")
      .write.format("graft-matrix").mode("append").save(dir.toString)
    assert(!java.nio.file.Files.exists(dir.resolve("_tmp_999_G7.txt")),
      "orphan temp not swept by job commit")
    // the orphan never became a visible graph; the committed one did
    val back = spark.read.format("graft-matrix").load(dir.toString)
      .collect().map(_.getString(0)).toSet
    assert(back == Set("G1"))
  }

  test("V2 write: a task failing mid-write aborts the job with no truncated or ghost files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_abort_")
    // GBAD trips the writer's MaxN guard INSIDE flush() — i.e. after the
    // task has already staged other work — so this exercises the real
    // abort path: DataWriter.abort deletes the attempt's own temps,
    // BatchWrite.abort deletes every staged temp from succeeded sibling
    // tasks, and no rename ever ran (renames happen only at job commit)
    val bad = Seq(("G1", 1L, 2L), ("G1", 2L, 1L), ("GBAD", 1L, 9999L))
      .toDF("graph_id", "src", "dst").repartition(4)
    intercept[Exception] {
      bad.write.format("graft-matrix").mode("append").save(dir.toString)
    }
    val names = {
      val listing = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.endsWith(".crc")).toSet
      } finally listing.close()
    }
    assert(!names.exists(_.endsWith(".txt")),
      s"aborted job must leave no final or truncated graph files, got $names")
    assert(!names.exists(_.startsWith("_tmp_")),
      s"aborted job must clean all staged temps, got $names")
  }

  test("executor-side reads resolve filesystems from the SESSION Hadoop conf") {
    // Register a custom scheme ONLY via the session conf (the spark.hadoop.*
    // channel), with FS caching off so every resolution re-reads the conf it
    // was handed: if the scan's executor-side readFully used a fresh
    // `new Configuration()` instead of the SerializableConfiguration captured
    // from the driver, graftfs:// would fail with "No FileSystem for scheme".
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    hc.setBoolean("fs.graftfs.impl.disable.cache", true)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_conf_")
      writeGraph(dir, "G1.txt", 2, Seq((1L, 2L), (2L, 2L)))
      val out = spark.read.format("graft-matrix").load(s"graftfs://$dir")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set(("G1", 1L, 2L), ("G1", 2L, 2L)))
    } finally {
      hc.unset("fs.graftfs.impl")
      hc.unset("fs.graftfs.impl.disable.cache")
    }
  }

  /** Collect DSv2 scans, descending through any AQE wrapper (a final
    * aggregate puts an AdaptiveSparkPlanExec at the root whose children
    * are not visible to a plain collect).
    */
  private def v2Scans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.connector.read.Scan] = plan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      v2Scans(a.initialPlan)
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b.scan)
    case p => p.children.flatMap(v2Scans)
  }

  test("aggregate pushdown: groupBy(graph_id) is COMPLETE — no aggregate operator, no shuffle") {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_agg_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    writeGraph(dir, "G2.txt", 4, Seq((1L, 4L), (4L, 1L)))
    writeGraph(dir, "G3.txt", 2, Seq.empty) // all-zero matrix: no edge rows → no group
    val q = spark.read.format("graft-matrix").load(dir.toString)
      .groupBy("graph_id")
      .agg(count(lit(1)).as("n_edges"), min("src").as("min_src"),
        max("src").as("max_src"), max("dst").as("max_dst"))
    val plan = q.queryExecution.executedPlan
    // complete pushdown: the union of per-file summary rows IS the final
    // grouped result — Spark plans NO aggregate and NO exchange
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.isEmpty, s"expected no aggregate operator:\n$plan")
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"expected no shuffle:\n$plan")
    val scan = v2Scans(plan).head
    assert(scan.description().contains("PushedAggregates"), scan.description())
    // the scan ships summary columns, not edge cells
    assert(!scan.readSchema().fieldNames.sameElements(Array("graph_id", "src", "dst")),
      scan.readSchema().simpleString)
    val out = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(("G1", 4L, 1L, 3L, 3L), ("G2", 2L, 1L, 4L, 4L)))
  }

  test("runtime filtering: an In(graph_id) runtime predicate drops whole files before any read") {
    // unit-level contract of SupportsRuntimeFiltering.filter: the scan's
    // partition list shrinks to the matching files; an unsupported
    // predicate leaves it intact (pruning is never a correctness
    // dependency)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_rf_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 1L)))
    writeGraph(dir, "G2.txt", 2, Seq((1L, 2L)))
    writeGraph(dir, "G3.txt", 2, Seq((2L, 1L)))
    val df = spark.read.format("graft-matrix").load(dir.toString)
    val scan = v2Scans(df.queryExecution.executedPlan).head
    val rf = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq == Seq("graph_id"))
    assert(scan.toBatch.planInputPartitions().length == 3)
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("graph_id", Array("G2", "G3"))))
    assert(scan.toBatch.planInputPartitions().length == 2, "In must prune to 2 files")
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("graph_id", "G3")))
    assert(scan.toBatch.planInputPartitions().length == 1, "EqualTo must prune to 1 file")
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThan("src", 1L)))
    assert(scan.toBatch.planInputPartitions().length == 1,
      "an unsupported runtime predicate must be a no-op")
  }

  test("runtime filtering end-to-end: DPP join against a filtered dim opens ONLY matching files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_dpp_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 1L)))
    writeGraph(dir, "G2.txt", 2, Seq((1L, 2L)))
    writeGraph(dir, "G3.txt", 2, Seq((2L, 1L)))
    writeGraph(dir, "G4.txt", 2, Seq((1L, 2L)))
    import spark.implicits._
    val fact = spark.read.format("graft-matrix").load(dir.toString)
    // DPP's planner heuristic wants a LIKELY-SELECTIVE predicate on the
    // filtering side — and the side must be a REAL relation (a local Seq
    // constant-folds its filter into a LocalRelation, leaving nothing for
    // the heuristic to see). A parquet dim with a tag filter is exactly
    // how a real dimension arrives ("the graphs tagged for this job").
    val dimPath = s"$dir/dim.parquet"
    Seq(("G2", "keep"), ("G1", "drop"), ("G3", "drop"), ("G4", "drop"))
      .toDF("graph_id", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")
    val q = fact.join(dim, "graph_id")
    graft.sources.MatrixDataSource.FilesRead.set(0L)
    val rows = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("G2", 1L, 2L)))
    val opened = graft.sources.MatrixDataSource.FilesRead.get()
    // dynamic runtime filtering delivers the broadcast side's graph_ids
    // to the scan before planInputPartitions: only G2.txt is opened. If
    // this ever reads all 4, the runtime-filter path regressed (results
    // stay correct — pruning is an optimization).
    assert(opened == 1L, s"expected 1 file opened under runtime filtering, got $opened")
  }

  test("aggregate pushdown: global count/min/max is PARTIAL — one summary row per file, final merge on top") {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_gagg_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    writeGraph(dir, "G2.txt", 5, Seq((5L, 4L)))
    writeGraph(dir, "G3.txt", 2, Seq.empty) // empty file still contributes its 0 partial
    val q = spark.read.format("graft-matrix").load(dir.toString)
      .agg(count(lit(1)).as("n"), min("src").as("mn"), max("dst").as("mx"))
    val scan = v2Scans(q.queryExecution.executedPlan).head
    assert(scan.description().contains("PushedAggregates"), scan.description())
    assert(scan.readSchema().length == 3, scan.readSchema().simpleString)
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 1L, 4L)))
  }

  test("aggregate pushdown declines what it can't answer (avg, non-gid grouping) and falls back to the row scan") {
    import org.apache.spark.sql.functions.{avg, count, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_fb_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 3L)))
    // avg is not partial-able by this source → full row scan + real aggregate
    val q1 = spark.read.format("graft-matrix").load(dir.toString).agg(avg("src").as("a"))
    val s1 = v2Scans(q1.queryExecution.executedPlan).head
    assert(!s1.description().contains("PushedAggregates"), s1.description())
    assert(q1.collect().head.getDouble(0) == 1.5)
    // grouping by a non-graph_id column → fall back too
    val q2 = spark.read.format("graft-matrix").load(dir.toString)
      .groupBy("src").agg(count(lit(1)).as("n"))
    val s2 = v2Scans(q2.queryExecution.executedPlan).head
    assert(!s2.description().contains("PushedAggregates"), s2.description())
    assert(q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L)))
  }

  test("limit pushdown: LIMIT k stops the per-file parse at k edges (partial; Spark keeps the global limit)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_lim_")
    writeGraph(dir, "G1.txt", 4,
      Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 4L), (4L, 4L)))
    writeGraph(dir, "G2.txt", 3, Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    val q = spark.read.format("graft-matrix").load(dir.toString).limit(3)
    val scan = v2Scans(q.queryExecution.executedPlan).head
    assert(scan.description().contains("PushedLimit: [3"), scan.description())
    // partial pushdown: Spark's global limit still caps the union of the
    // two per-file heads at 3
    assert(q.count() == 3L)
    // the per-file head is the file's first k edges in cell order
    val g1Head = spark.read.format("graft-matrix").load(s"$dir/G1.txt").limit(2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(g1Head == Seq((1L, 2L), (1L, 3L)), s"cell-order head, got $g1Head")
  }

  test("top-N pushdown: ORDER BY (graph_id,) src, dst LIMIT k rides the file's cell order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_topn_")
    writeGraph(dir, "G1.txt", 4,
      Seq((1L, 4L), (2L, 1L), (3L, 2L), (4L, 1L)))
    writeGraph(dir, "G2.txt", 3, Seq((1L, 1L), (1L, 2L), (2L, 3L)))
    val q = spark.read.format("graft-matrix").load(dir.toString)
      .orderBy("graph_id", "src", "dst").limit(4)
    val scan = v2Scans(q.queryExecution.executedPlan).head
    assert(scan.description().contains("PushedTopN"), scan.description())
    // cross-file TopN correctness: Spark's retained final sort+limit
    // merges the per-file heads — all of G1 sorts before G2
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("G1", 1L, 4L), ("G1", 2L, 1L), ("G1", 3L, 2L), ("G1", 4L, 1L)))
    // (src, dst) order without graph_id pushes too
    val q2 = spark.read.format("graft-matrix").load(dir.toString)
      .orderBy("src", "dst").limit(3)
    val s2 = v2Scans(q2.queryExecution.executedPlan).head
    assert(s2.description().contains("PushedTopN"), s2.description())
    assert(q2.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L), (1L, 2L), (1L, 4L)))
  }

  test("top-N pushdown refuses orders the cell order can't serve; results stay correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_topn_fb_")
    writeGraph(dir, "G1.txt", 3, Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    // descending: refuse → Spark plans the full sort itself
    val q1 = spark.read.format("graft-matrix").load(dir.toString)
      .orderBy(col("src").desc).limit(2)
    val s1 = v2Scans(q1.queryExecution.executedPlan).head
    assert(!s1.description().contains("PushedTopN"), s1.description())
    assert(q1.collect().map(_.getLong(1)).toSeq == Seq(3L, 2L))
    // dst-leading order is not a cell-order prefix: refuse
    val q2 = spark.read.format("graft-matrix").load(dir.toString)
      .orderBy("dst", "src").limit(2)
    val s2 = v2Scans(q2.queryExecution.executedPlan).head
    assert(!s2.description().contains("PushedTopN"), s2.description())
    assert(q2.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, 1L), (1L, 2L)))
  }

  test("roundtrip: codec-written file reads back identically through the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_rt_")
    val edges = Seq((1L, 3L), (3L, 1L), (2L, 2L))
    writeGraph(dir, "G9.txt", 3, edges)
    val viaSource = spark.read.format("graft-matrix")
      .load(dir.resolve("G9.txt").toString)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCodec = MatrixCodec.readMatrixFile(spark, dir.resolve("G9.txt").toString)
      ._2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSource == edges.toSet && viaCodec == edges.toSet)
  }
}
