package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named queries to per-query text files —
  * the optimization-round evidence trail (`plans/r<N>/<query>_<tag>.txt`).
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>"`.
  * Unlike [[Plans]] (the curated PLANS.md narrative), this is a raw capture
  * tool: one file per query, no commentary, any declared query name.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val tag = args(2)
    val names = args(3).split(",").toSeq
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution
        .explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt + "\n")
      System.err.println(s"[plandump] wrote $name" + s"_$tag.txt")
    }
    spark.stop()
  }
}
