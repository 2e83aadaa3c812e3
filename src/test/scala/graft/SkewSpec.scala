package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SkewUtils
import SparkTestSession._

class SkewSpec extends AnyFunSuite {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    // key 1 is hot: 1000 of 1010 rows
    val big = (Seq.fill(1000)(1) ++ (2 to 11)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "tag")
    val plain = big.join(small, "k")
    val salted = SkewUtils.saltedJoin(big, small, "k", salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "tag").except(
      plain.select("k", "payload", "tag")).isEmpty)
    assert(plain.select("k", "payload", "tag").except(
      salted.select("k", "payload", "tag")).isEmpty)
  }

  test("saltedJoin: seed changes the salt stream, never the result — composed joins use distinct seeds for free") {
    // the r16 seed param's contract (r17 advice: now exercised): any two
    // seeds return the identical relation, so composition sites can (and
    // the two production sites DO — SparkEntry salted_join_agg seed 8101,
    // skew_hot_key_join seed 9202) draw uncorrelated salt streams at zero
    // semantic cost…
    val big = (Seq.fill(400)(1) ++ (2 to 9)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "tag")
    val a = SkewUtils.saltedJoin(big, small, "k", salts = 4, seed = 8101L)
      .select("k", "payload", "tag")
    val b = SkewUtils.saltedJoin(big, small, "k", salts = 4, seed = 9202L)
      .select("k", "payload", "tag")
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // …and the streams are genuinely different: the same rows land on
    // different salts under the two seeds (a shared seed would correlate
    // them row-for-row, the re-collapse scenario the param exists for)
    def saltsOf(seed: Long) = big
      .withColumn("__salt",
        (org.apache.spark.sql.functions.rand(seed) * 4).cast("int"))
      .select("payload", "__salt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sa = saltsOf(8101L)
    val sb = saltsOf(9202L)
    val differing = sa.count { case (p, s) => sb(p) != s }
    assert(differing > 100,
      s"seeds 8101/9202 produced near-identical salt streams ($differing/408 rows differ)")
  }

  test("salting spreads a hot key over multiple salt buckets") {
    val big = Seq.fill(500)(1).zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val salts = big.withColumn("__salt",
      (org.apache.spark.sql.functions.rand(42) * 4).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 4) // all 4 buckets used
    assert(salts.map(_.getLong(1)).max < 500) // no bucket holds everything
  }

  test("ngram_jaccard shingle cap bounds a hot-shingle corpus") {
    import graft.pipeline.Dedup
    // 200 docs all sharing one hot trigram ("the same header"), each with a
    // unique tail: uncapped, the hot shingle alone contributes
    // 200·199/2 = 19900 candidate pairs on ONE shuffle key.
    val docs = (0 until 200).map(i =>
      (i.toLong, s"the same header unique$i tail$i words$i here$i")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, 3)
    // the candidate-join input after the cap: no shingle key exceeds the cap
    val capped = {
      val hot = sh.groupBy("s").count().filter($"count" > 10).select("s")
      sh.join(hot, Seq("s"), "left_anti")
    }
    val maxFreq = capped.groupBy("s").count().agg(
      org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxFreq <= 10, s"cap leaked a hot shingle (max freq $maxFreq)")
    // capped pipeline output: the all-share-a-header corpus produces NO
    // high-Jaccard pairs (docs differ in their tails) and, crucially, the
    // candidate join stays bounded: at most capFreq·(capFreq-1)/2 pairs per
    // shingle key instead of n²
    val pairs = Dedup.ngramJaccardPairs(docs, w = 3, threshold = 0.5,
      maxShingleFreq = 10L)
    assert(pairs.count() == 0)
    // and with no cap the same corpus DOES generate quadratic candidates —
    // the guard is doing real work (compare candidate-join input sizes)
    val uncappedHotPairs = sh.as("a").join(sh.as("b"),
      $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id").count()
    assert(uncappedHotPairs >= 19900L)
  }

  test("AQE splits a planted hot-key join partition at runtime (skew=true)") {
    // The decision rule a 100 TB operator needs, demonstrated live:
    // AQE's skew-join handles SHUFFLE-SIZE skew in a join by splitting the
    // oversized partition into sub-tasks (replicating the matching rows of
    // the other side), so for a plain big⋈small inner join no explicit
    // salting is required — THIS test. SkewUtils.saltedJoin remains the
    // lever where AQE cannot act: aggregation skew (skew-join rewrites
    // only joins) and self-join candidate explosions where one key is n²
    // work regardless of how the partition splits (the ngram cap test
    // above). Thresholds here are shrunk only to make toy data cross the
    // same ratios a production hot key crosses at scale.
    val tuned = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      // key 1 holds ~99% of 60k payload rows — one reducer's partition is
      // MBs against a 64 KB skew threshold. The payload must derive from
      // id (a literal would be constant-folded out of the shuffle and the
      // big side would shuffle 8-byte keys only).
      val big = spark.range(60000).select(
        org.apache.spark.sql.functions.when($"id" % 100 =!= 0, 1L)
          .otherwise($"id" % 50 + 2).as("k"),
        org.apache.spark.sql.functions.expr(
          "repeat(cast(id as string), 30)").as("payload"))
      val small = spark.range(60).select(($"id" + 1).as("k"),
        org.apache.spark.sql.functions.lit("t").as("tag"))
      val joined = big.join(small, "k")
      // execute THIS queryExecution (count() would plan a separate one and
      // leave joined's adaptive plan unfinalized)
      val n = joined.toLocalIterator().asScala.size
      assert(n == 60000) // every big row matches exactly one small row
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$planStr")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("degree-ordered census orientation: a planted hub generates ZERO wedge fan-out as a source") {
    import graft.graph.GraphOps
    import org.apache.spark.sql.functions.{col, count, lit}
    // Star: hub id 0 (the adversarial case — smallest id AND highest degree)
    // with 300 leaves. Under the old ID-ordered orientation every edge
    // pointed OUT of vertex 0, so the wedge join through middle 0 fanned
    // out in(0)·out(0) ≈ C(300,2) rows on one key. Degree-ordering points
    // every edge INTO the hub: out-degree(hub) = 0, so the middle-vertex
    // wedge fan-out Σ indeg(v)·outdeg(v) is 0.
    val star = (1L to 300L).map(l => (0L, l)).toDF("a", "b")
    val o = GraphOps.orientByDegree(star, GraphOps.pairDegrees(star)).cache()
    assert(o.filter(col("u") === 0L).count() == 0L, "hub must have no out-edges")
    val outd = o.groupBy("u").agg(count(lit(1)).as("od"))
    val ind = o.groupBy("v").agg(count(lit(1)).as("id_"))
    val wedges = ind.join(outd, ind("v") === outd("u"))
      .select((col("id_") * col("od")).as("w"))
      .agg(org.apache.spark.sql.functions.sum("w")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
    assert(wedges == 0L, s"star wedge work must be zero, got $wedges")
    // and the census itself: star has no triangles or 4-cliques
    assert(GraphOps.triangleCounts(star).count() == 0L)
    assert(GraphOps.fourCliqueCounts(star).count() == 0L)
  }

  test("census counts are orientation-invariant on a hub graph with cliques; K4 cap lever subsets") {
    import graft.graph.GraphOps
    // hub 0 wired to everything, plus a K5 on {1..5} and a K4 on {6..9}:
    // {0,a,b} is a triangle for every K-clique edge (a,b); counts are
    // brute-force checkable.
    val cliq = (for { a <- 1L to 5L; b <- a + 1 to 5L } yield (a, b)) ++
      (for { a <- 6L to 9L; b <- a + 1 to 9L } yield (a, b))
    val hub = (1L to 40L).map(l => (0L, l))
    val g = (cliq ++ hub).toDF("a", "b")
    val tri = GraphOps.triangleCounts(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // vertex 1 (in K5): C(4,2)=6 within K5 + 4 through the hub = 10
    assert(tri(1L) == 10L, s"got $tri")
    // hub 0: one triangle per clique edge = 10 + 6 = 16
    assert(tri(0L) == 16L)
    val k4 = GraphOps.fourCliqueCounts(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // K5 vertices: C(4,3)=4 within K5 + hub-closed C(4,2)=6 → 10; hub sits
    // in {0,a,b,c} for every triangle within a clique: 10 + 4 = 14
    assert(k4(0L) == 14L, s"got $k4")
    assert(k4(1L) == 10L)
    // cap lever: a cap above the max degree changes nothing; a cap of 3
    // removes every clique whose third-ranked vertex exceeds it (subset)
    val uncapped = GraphOps.fourCliqueCounts(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val capBig = GraphOps.fourCliqueCounts(g, maxExtendDegree = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capBig == uncapped)
    val capped = GraphOps.fourCliqueCounts(g, maxExtendDegree = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped.values.sum <= uncapped.values.sum)
    assert(capped.keySet.subsetOf(uncapped.keySet))
  }

  test("hotKeys surfaces the dominant key first") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = SkewUtils.hotKeys(df, "k", 2).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 50)
  }
}
