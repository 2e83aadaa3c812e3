package graft

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.graph.GraphCatalog
import graft.model._

/** End-to-end lifecycle demo (SURVEY.md §3): add → read → modify → traverse
  * through the public engine API, printing reference-style responses.
  * Usage: `sbt "runMain graft.Demo"` (optional arg: catalog dir).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = args.headOption.getOrElse(
      graft.TmpDirs.create("graft_demo_").toString)
    val engine = new GraphEngine(spark, new GraphCatalog(spark, dir))

    def show(tag: String)(body: => Response): Unit =
      try {
        val r = body
        val extra = r.result.map(df =>
          " result=[" + df.collect().map(_.toSeq.mkString("@")).mkString(" ") + "]")
          .getOrElse("")
        println(s"$tag -> [${r.worker.name}] tag=${r.responseTag} ${r.message}$extra")
      } catch { case e: Exception => println(s"$tag -> ERROR: ${e.getMessage}") }

    // G3: the reference's 5-vertex star centered at 2 (FIXTURES.md §2)
    val star = Seq((1L, 2L), (2L, 3L), (2L, 4L), (2L, 5L))
    val starDF = (star ++ star.map(_.swap)).toDF("src", "dst")

    show("add G3     ") { engine.executeLine("1 1 G3.txt", GraphPayload(starDF)) }
    show("bfs G3 @2  ") { engine.executeLine("6 4 G3.txt", StartVertex(2)) }
    show("dfs G3 @3  ") { engine.executeLine("5 3 G3.txt", StartVertex(3)) }
    show("modify G3  ") { engine.executeLine("2 2 G3.txt",
      GraphPayload(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))) }
    show("bfs G3 @1  ") { engine.executeLine("7 4 G3.txt", StartVertex(1)) }
    show("bfs @0 probe") { engine.executeLine("8 4 G3.txt", StartVertex(0)) }
    show("modify GZ  ") { engine.executeLine("9 2 GZ.txt", GraphPayload(starDF)) }

    // Streaming request serving: protocol lines arrive as a stream and
    // dispatch into the same engine per microbatch.
    {
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val q = graft.streaming.StreamOps.serveRequests(mem.toDF(), engine,
        startVertexOf = _ => 2L,
        onResponse = (seq, worker, msg) =>
          println(s"stream seq=$seq -> [$worker] $msg"))
      try {
        mem.addData("11 4 G3.txt", "12 3 G3.txt", "13 4 GZ.txt", "garbage")
        q.processAllAvailable()
      } finally q.stop()
    }

    spark.stop()
  }
}
