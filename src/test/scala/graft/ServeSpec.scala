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

  test("full client session through the stream: add, modify, then traverse (ops 1/2/3/4)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_serve_w_").toString
    val engine = new GraphEngine(spark, new GraphCatalog(spark, tmp))
    val path3 = "3\n0 1 0\n1 0 1\n0 1 0"           // 1-2-3 path
    val star5 = "5\n0 1 1 1 1\n1 0 0 0 0\n1 0 0 0 0\n1 0 0 0 0\n1 0 0 0 0" // star at 1

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val responses = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = StreamOps.serveRequests(
      mem.toDF().toDF("value", "payload"), engine,
      startVertexOf = _ => 1L,
      onResponse = (seq, worker, msg) => responses.synchronized {
        responses += ((seq, worker, msg)); ()
      })
    try {
      // one batch, seq_no order drives replay: add → bfs
      mem.addData(("10 1 G9.txt", path3), ("11 4 G9.txt", "2"))
      q.processAllAvailable()
      // next batch: overwrite with the 5-star, then bfs + dfs-leaves
      mem.addData(("12 2 G9.txt", star5), ("13 4 G9.txt", "1"), ("14 3 G9.txt", "1"))
      q.processAllAvailable()
      // write op with no payload → typed error, stream stays alive
      mem.addData(("15 1 G8.txt", null))
      q.processAllAvailable()
    } finally q.stop()

    val bySeq = responses.synchronized { responses.toSeq }.groupBy(_._1)
    assert(bySeq(10L).head._2 == "primary")
    assert(bySeq(10L).head._3.startsWith("File successfully added"))
    assert(bySeq(11L).head._3.endsWith("rows=3")) // path BFS from 2 sees all 3
    assert(bySeq(12L).head._3.startsWith("File successfully modified"))
    assert(bySeq(13L).head._3.endsWith("rows=5")) // star BFS from 1 sees all 5
    assert(bySeq(14L).head._3.endsWith("rows=4")) // star leaves from 1: {2,3,4,5}
    assert(bySeq(15L).head._2 == "error")
    assert(bySeq(15L).head._3.contains("matrix payload"))
  }

  /** The reference's shipped client script, replayed through the STREAMING
    * serve path (not just SessionScript/the parser): three adds, a modify,
    * the DFS read, and the final out-of-range probe — `inp.txt:36-39` is
    * the `6 / 4 / G3.txt / 0` block whose start vertex 0 would index
    * `adj[-1]` in the reference (`secondary_server.c:242`); here it must
    * surface as a typed error RESPONSE on the stream, with the query alive
    * to serve the next request.
    */
  test("the reference's inp.txt replays through streaming serve; vertex-0 probe is a typed error") {
    val path = java.nio.file.Paths.get("/root/reference/inp.txt")
    assume(java.nio.file.Files.exists(path), "reference checkout not present")
    import scala.jdk.CollectionConverters._
    // reshape the interactive script (seq/op/fname lines + multi-line
    // payload) into the stream's protocol: one (line, payload) row per
    // request — the payload column is the shared-memory analogue
    val it = java.nio.file.Files.readAllLines(path).asScala
      .map(_.trim).filter(_.nonEmpty).iterator.buffered
    val reqs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) {
      val seq = it.next(); val op = it.next(); val fname = it.next()
      val payload = op match {
        case "1" | "2" =>
          val n = it.next()
          (n +: (0 until n.toInt).map(_ => it.next())).mkString("\n")
        case _ => it.next() // start vertex digits
      }
      reqs += ((s"$seq $op $fname", payload))
    }
    assert(reqs.length == 6, s"inp.txt parsed to ${reqs.length} requests, want 6")

    val tmp = java.nio.file.Files.createTempDirectory("graft_serve_inp_").toString
    val engine = new GraphEngine(spark, new GraphCatalog(spark, tmp))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val responses = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = StreamOps.serveRequests(
      mem.toDF().toDF("value", "payload"), engine,
      startVertexOf = _ => sys.error("inp.txt payloads carry every start vertex"),
      onResponse = (seq, worker, msg) => responses.synchronized {
        responses += ((seq, worker, msg)); ()
      })
    try {
      // one micro-batch per request: the reference client is serial
      reqs.foreach { r => mem.addData(r); q.processAllAvailable() }
    } finally q.stop()

    val bySeq = responses.synchronized { responses.toSeq }.groupBy(_._1)
    assert(bySeq.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // adds G1 (5-path), G2 (2-path), G3 (5-star) land on the primary
    (1L to 3L).foreach { n =>
      assert(bySeq(n).head._2 == "primary", s"request $n not routed to primary")
      assert(bySeq(n).head._3.startsWith("File successfully added"))
    }
    assert(bySeq(4L).head._3.startsWith("File successfully modified"))
    // request 5: DFS G3 from 3 → leaves {1,4,5}; odd read seq → secondary_2
    assert(bySeq(5L).head._2 == "secondary_2")
    assert(bySeq(5L).head._3.endsWith("rows=3"))
    // request 6 (inp.txt:36-39): BFS G3 from vertex 0 → typed error on the
    // response channel, naming the reference's adj[-1] hazard
    assert(bySeq(6L).head._2 == "error")
    assert(bySeq(6L).head._3.contains("start vertex 0"))
    assert(bySeq(6L).head._3.contains("adj[-1]"))
  }
}
