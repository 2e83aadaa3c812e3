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

  test("hotKeys surfaces the dominant key first") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = SkewUtils.hotKeys(df, "k", 2).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 50)
  }
}
