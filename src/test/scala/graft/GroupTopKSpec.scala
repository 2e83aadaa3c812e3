package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupTopK
import SparkTestSession._

class GroupTopKSpec extends AnyFunSuite {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
    ("b", 5L, 5.0), ("b", 6L, 5.0), ("b", 7L, 5.0),
    ("c", 8L, 1.0)
  ).toDF("k", "id", "v").repartition(3)

  test("topKPerKey keeps the first k rows per key in the declared total order") {
    val out = GroupTopK.topKPerKey(df, Seq(col("k")),
        Seq(col("v").desc, col("id")), k = 2)
      .orderBy("k", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      ("a", 2L, 30.0), ("a", 4L, 40.0),  // top-2 by v desc = ids 4, 2
      ("b", 5L, 5.0), ("b", 6L, 5.0),    // all-tied: id tiebreak keeps 5, 6
      ("c", 8L, 1.0)))
  }

  test("plan shape: partial heap under final heap with ONE hash Exchange between") {
    val q = GroupTopK.topKPerKey(df, Seq(col("k")), Seq(col("v").desc, col("id")), 2)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopKPartial"), physical)
    assert(physical.contains("GroupTopKFinal"), physical)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges == 1, s"want exactly one hash Exchange:\n$physical")
    // partial must run BELOW the exchange (map-side), final above
    val pi = physical.indexOf("GroupTopKPartial")
    val fi = physical.indexOf("GroupTopKFinal")
    val ei = physical.indexOf("Exchange hashpartitioning")
    assert(fi < ei && ei < pi, s"final/exchange/partial order wrong:\n$physical")
  }

  test("downstream same-key window reuses the final pass's partitioning") {
    // knnJoin's shape: rank the ≤k survivors per key. The window must NOT
    // re-shuffle — GroupTopKFinal propagates its child Exchange's hash
    // partitioning, so exactly ONE hash Exchange appears in the whole plan.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = GroupTopK.topKPerKey(df, Seq(col("k")), Seq(col("v").desc, col("id")), 2)
      .withColumn("rn", row_number().over(w))
    val physical = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges == 1, s"window added a second Exchange:\n$physical")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == Set(("a", 4L, 1), ("a", 2L, 2), ("b", 5L, 1), ("b", 6L, 2),
      ("c", 8L, 1)))
  }

  test("fallback: keys far beyond the in-memory cap produce the same output") {
    // 500 distinct keys × 6 rows against a cap of 7 in-memory heaps per
    // partition: nearly every partial-pass row takes the pass-through
    // fallback, and the final clustered pass must still prune exactly.
    val n = 3000
    val big = spark.range(n).select(
      (col("id") % 500).cast("string").as("k"),
      col("id").as("id"),
      (col("id") * 37 % 101).cast("double").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val prev = spark.conf.getOption(GroupTopK.MaxKeysConfKey)
    spark.conf.set(GroupTopK.MaxKeysConfKey, "7")
    try {
      val capped = GroupTopK.topKPerKey(big, Seq(col("k")),
          Seq(col("v").desc, col("id")), k = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(capped == want)
      // plan shape unchanged under the cap
      val physical = GroupTopK.topKPerKey(big, Seq(col("k")),
        Seq(col("v").desc, col("id")), 2).queryExecution.executedPlan.toString
      assert(physical.contains("GroupTopKPartial") &&
        physical.contains("GroupTopKFinal"), physical)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(GroupTopK.MaxKeysConfKey, v)
        case None => spark.conf.unset(GroupTopK.MaxKeysConfKey)
      }
    }
  }

  test("property: equals the row_number window formulation on random data") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val rows = Gen.listOfN(40,
      Gen.zip(Gen.oneOf("x", "y", "z"), Gen.chooseNum(0L, 9L)))
    val r = check(Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(rows, Gen.chooseNum(1, 5)) { (rs, k) =>
        val d = rs.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v.toDouble) }
          .toDF("k", "id", "v").repartition(4)
        val got = GroupTopK.topKPerKey(d, Seq(col("k")),
            Seq(col("v").desc, col("id")), k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(col("v").desc, col("id"))
        val want = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        got == want
      })
    assert(r.passed, s"window parity failed: ${r.status}")
  }
}
