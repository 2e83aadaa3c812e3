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
}
