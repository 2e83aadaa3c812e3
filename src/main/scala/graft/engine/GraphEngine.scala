package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.graph.{GraphCatalog, GraphOps}
import graft.model._

/** Request payloads — the typed analogue of the reference's shared-memory
  * segments (`client (1).c:77-104` for matrices, `:137-155` for the start
  * vertex).
  */
sealed trait Payload
/** Full graph payload for ops 1/2 (edge list; matrix text parses to this). */
final case class GraphPayload(edges: DataFrame) extends Payload
/** 1-based start vertex for ops 3/4. */
final case class StartVertex(v: Long) extends Payload

/** Response — the reference's `mtype = seq_no + 100` message
  * (`secondary_server.c:313-329`), with an unbounded DataFrame result
  * replacing the 100-char text buffer.
  */
final case class Response(seqNo: Long, responseTag: Long, worker: Worker,
                          message: String, result: Option[DataFrame])

/** The whole request lifecycle of the reference (SURVEY.md §3) in one
  * object: parse → route → dispatch on op → result. Process hops and
  * per-request shared memory disappear; Spark's scheduler replaces
  * thread-per-request dispatch, so there is no 100-request lifetime cap.
  */
final class GraphEngine(spark: SparkSession, val catalog: GraphCatalog) {

  /** Execute one request. Ops 1/2 need a [[GraphPayload]]; ops 3/4 a
    * [[StartVertex]]. Unlike the reference, invalid start vertices fail
    * with a typed error instead of indexing `adj[-1]`
    * (`secondary_server.c:242` after the `(*shmp)--`).
    */
  def execute(req: GraphRequest, payload: Payload): Response = {
    val worker = Router.route(req)
    (req.op, payload) match {
      case (Op.AddGraph, GraphPayload(edges)) =>
        catalog.add(req.graphName, edges)
        Response(req.seqNo, req.responseTag, worker, "File successfully added", None)
      case (Op.ModifyGraph, GraphPayload(edges)) =>
        catalog.modify(req.graphName, edges)
        Response(req.seqNo, req.responseTag, worker, "File successfully modified", None)
      case (Op.DfsLeaves, StartVertex(v)) =>
        val edges = loadValidated(req.graphName, v)
        Response(req.seqNo, req.responseTag, worker, "ok",
          Some(GraphOps.dfsLeaves(edges, v)))
      case (Op.BfsLevels, StartVertex(v)) =>
        val edges = loadValidated(req.graphName, v)
        Response(req.seqNo, req.responseTag, worker, "ok",
          Some(GraphOps.bfsLevels(edges, v)))
      case (op, p) =>
        throw new IllegalArgumentException(
          s"op ${op.code} cannot take payload ${p.getClass.getSimpleName}")
    }
  }

  /** Parse a protocol line and execute (A11 front door). */
  def executeLine(line: String, payload: Payload): Response =
    execute(RequestParser.parse(line), payload)

  private def loadValidated(name: String, start: Long): DataFrame = {
    val edges = catalog.load(name) // throws GraphNotFound: add-before-read rule
    val present = edges.filter(col("src") === start || col("dst") === start).limit(1)
    if (start < 1 || present.isEmpty)
      throw new IllegalArgumentException(
        s"start vertex $start not in graph '$name' (reference would index adj[${start - 1}])")
    edges
  }
}

/** Replayer for reference-style interactive session scripts (`inp.txt`):
  * each request is `seq_no / op_no / filename` on separate lines followed by
  * its payload (n + n matrix rows for ops 1/2; a start vertex for ops 3/4).
  */
object SessionScript {

  def replay(spark: SparkSession, engine: GraphEngine,
             lines: Seq[String]): Seq[Either[Throwable, Response]] = {
    val it = lines.iterator.map(_.trim).filter(_.nonEmpty).buffered
    val out = Seq.newBuilder[Either[Throwable, Response]]
    while (it.hasNext) {
      val attempt = scala.util.Try {
        val seq = it.next().toLong
        val op = Op.fromCode(it.next().toInt)
        val fname = it.next()
        val payload = op match {
          case Op.AddGraph | Op.ModifyGraph =>
            val n = it.next().toInt
            val rows = (0 until n).map(_ => it.next())
            val text = s"$n\n${rows.mkString("\n")}"
            GraphPayload(MatrixCodec.edgesDF(spark, MatrixCodec.parseMatrixText(text)._2))
          case _ =>
            StartVertex(it.next().toLong)
        }
        engine.execute(GraphRequest(seq, op, fname), payload)
      }
      out += attempt.toEither
    }
    out.result()
  }
}
