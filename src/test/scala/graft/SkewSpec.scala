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

  test("hotKeys surfaces the dominant key first") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = SkewUtils.hotKeys(df, "k", 2).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 50)
  }
}
