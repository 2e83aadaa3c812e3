package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the whole native-function surface at session
  * build time (the production route — `spark.sql.extensions`). The test
  * builds a sibling session over the same SparkContext with the
  * extensions applied, then restores the shared session.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-built session resolves all graft SQL functions") {
    val shared = SparkTestSession.spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT vector_cosine(array(CAST(3.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c,
          |       vector_dot(array(CAST(3.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d,
          |       vector_l2_argmin(array(CAST(1.0 AS FLOAT)),
          |                        array(array(5.0D), array(1.0D))) AS i,
          |       vector_sign_sketch(array(CAST(1.0 AS FLOAT)), 1) AS s""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 6.0)
      assert(r.getInt(2) == 1)
      // sketch aggregates resolve and produce the documented shapes
      val mh = s2.sql("SELECT minhash_agg(s, 4) AS sig FROM VALUES ('a'), ('b') AS t(s)")
        .collect()(0).getSeq[Long](0)
      assert(mh.length == 4)
      val sh = s2.sql("SELECT simhash_agg(h) AS h FROM VALUES (CAST(5 AS BIGINT)) AS t(h)").collect()(0)
      assert(sh.getLong(0) == 5L) // single-input sign-sum identity
      // count-min: 2×4 sketch over 3 occurrences of 'a' — total per row = 3
      val cm = s2.sql(
        "SELECT count_min_agg(s, 2, 4) AS sk FROM VALUES ('a'), ('a'), ('a') AS t(s)")
        .collect()(0).getSeq[Long](0)
      assert(cm.length == 8 && cm.grouped(4).forall(_.sum == 3L))
      // the injected planner strategy plans GroupTopK WITHOUT the lazy
      // experimental-strategies fallback (strip it first to prove it)
      import org.apache.spark.sql.functions.col
      s2.experimental.extraStrategies = Nil
      import s2.implicits._
      val tk = graft.plans.GroupTopK.topKPerKey(
        Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v"),
        Seq(col("k")), Seq(col("v").desc), k = 1)
      s2.experimental.extraStrategies = Nil // undo topKPerKey's re-registration
      assert(tk.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == Set(("a", 2L), ("b", 3L)))
      assert(tk.queryExecution.executedPlan.toString.contains("GroupTopKFinal"))
      // non-literal seed is a typed error, not a silent misresolve
      assertThrows[Exception] {
        s2.sql("SELECT vector_sign_sketch(array(CAST(1.0 AS FLOAT)), CAST(rand() * 4 AS INT))")
          .collect()
      }
    } finally {
      s2.catalog.clearCache()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
