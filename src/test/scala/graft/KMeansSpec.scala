package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.KMeans
import SparkTestSession._

class KMeansSpec extends AnyFunSuite {
  import spark.implicits._

  // two well-separated blobs around (0,0) and (10,10)
  private def blobs = {
    val rng = new scala.util.Random(3)
    val a = (0L until 20L).map(i => (i, Array(rng.nextFloat(), rng.nextFloat())))
    val b = (20L until 40L).map(i => (i, Array(10f + rng.nextFloat(), 10f + rng.nextFloat())))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("Lloyd iterations separate two obvious blobs") {
    val fitted = KMeans.fit(blobs, k = 2, iters = 4).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cluster"))))
    val byCluster = fitted.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    // each blob lands wholly in one cluster
    assert(byCluster.values.toSet == Set((0L until 20L).toSet, (20L until 40L).toSet))
  }

  test("IVF search with the learned quantizer finds in-blob neighbors") {
    val out = KMeans.ivfTopK(blobs, queryId = 0L, k = 5, nlist = 2, nprobe = 1, iters = 4)
      .collect().map(_.getLong(0))
    assert(out.length == 5)
    assert(out.forall(_ < 20L)) // all neighbors from the query's own blob
  }

  test("fit is deterministic across runs") {
    val a = KMeans.fit(blobs, k = 2, iters = 3).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cluster")))).sorted.toSeq
    val b = KMeans.fit(blobs, k = 2, iters = 3).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cluster")))).sorted.toSeq
    assert(a == b)
  }

  test("silhouette: well-separated blobs score near 1, merged blobs score near 0") {
    val out = KMeans.silhouette(blobs, k = 2, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).sum == 40L && out.length == 2)
    // blob spread ~1 vs separation ~200 in squared distance → s ≈ 1
    out.foreach { case (c, _, s) => assert(s > 0.9, s"cluster $c silhouette $s") }
    // one blob split across both centroids: own-vs-other distances are
    // comparable, so every cluster scores strictly below the separated case
    val oneBlob = blobs.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val merged = KMeans.silhouette(oneBlob, k = 2, iters = 4).collect()
      .map(_.getDouble(2))
    assert(merged.max < out.map(_._3).min,
      s"split-blob silhouette ${merged.toSeq} not below separated ${out.map(_._3).toSeq}")
  }
}
