package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import SparkTestSession._

/** Partition layout = the coarsest pruning lever at 100 TB: a filter on the
  * partition column must eliminate directories at planning time, before any
  * file is opened. This pins that behavior on a hive-partitioned copy of
  * the events table.
  */
class PartitionPruningSpec extends AnyFunSuite {

  test("filter on the partition column prunes partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(tmp)

    val q = spark.read.parquet(tmp).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // pruned scan reads exactly the one partition's rows
    val expected = ev.filter(col("event_type") === "click").count()
    assert(q.count() == expected)
    assert(expected < ev.count()) // the filter is genuinely selective
    // the scan's file metric covers only the matching directory
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val nParts = spark.read.parquet(tmp).select("event_type").distinct().count()
    assert(nParts > 1) // layout really is multi-partition
  }
}
