package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.engine.{GraphEngine, GraphPayload}
import graft.graph.GraphCatalog
import graft.model.{GraphRequest, Op}
import graft.streaming.StreamOps
import SparkTestSession._

/** End-to-end streaming request serving: requests arrive as a stream of
  * protocol lines; reads dispatch into the engine per microbatch.
  */
class ServeSpec extends AnyFunSuite {

  import spark.implicits._

  test("streamed read requests are parsed, routed, executed, and answered") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_serve_").toString
    val engine = new GraphEngine(spark, new GraphCatalog(spark, tmp))
    // preload G1: the docx 5-vertex tree
    engine.execute(GraphRequest(1, Op.AddGraph, "G1.txt"),
      GraphPayload(undirected((1, 2), (2, 3), (2, 4), (4, 5))))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val responses = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = StreamOps.serveRequests(mem.toDF(), engine,
      startVertexOf = _ => 1L,
      onResponse = (seq, worker, msg) => responses.synchronized {
        responses += ((seq, worker, msg)); ()
      })
    try {
      mem.addData("6 4 G1.txt")   // BFS from 1: 5 vertices
      mem.addData("5 3 G1.txt")   // DFS leaves from 1: {3, 5}
      mem.addData("7 4 GZ.txt")   // unknown graph → error
      mem.addData("not a request")
      q.processAllAvailable()
    } finally q.stop()

    val bySeq = responses.synchronized { responses.toSeq }.groupBy(_._1)
    assert(bySeq(6L).head._2 == "secondary_1")
    assert(bySeq(6L).head._3.endsWith("rows=5"))
    assert(bySeq(5L).head._2 == "secondary_2")
    assert(bySeq(5L).head._3.endsWith("rows=2"))
    assert(bySeq(7L).head._2 == "error")
    assert(!bySeq.contains(0L)) // malformed line quarantined, never dispatched
  }
}
