package graft

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

  test("hotKeys surfaces the dominant key first") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = SkewUtils.hotKeys(df, "k", 2).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 50)
  }
}
