package graft.model

/** Request model of the reference engine, re-expressed as typed Scala.
  *
  * The reference ships requests as `"<seq_no> <op_no> <filename>"` strings
  * over a System V message queue (reference `client (1).c:105,156`, parsed at
  * `load_balancer.c:61`, `primary_server.c:91`, `secondary_server.c:237`).
  * Here the same protocol surface is a case class plus a parser; the string
  * form is kept for fidelity with `inp.txt`-style session scripts.
  */
sealed abstract class Op(val code: Int, val name: String)
object Op {
  /** op 1 — create a graph (reference `primary_server.c:86-179`). */
  case object AddGraph extends Op(1, "add")
  /** op 2 — overwrite a graph wholesale (reference `primary_server.c:121-135`). */
  case object ModifyGraph extends Op(2, "modify")
  /** op 3 — leaves of the tree rooted at the start vertex
    * (reference `secondary_server.c:185-213`; see SURVEY.md A6). */
  case object DfsLeaves extends Op(3, "dfs")
  /** op 4 — level-order BFS (reference `secondary_server.c:94-140`). */
  case object BfsLevels extends Op(4, "bfs")

  val all: Seq[Op] = Seq(AddGraph, ModifyGraph, DfsLeaves, BfsLevels)

  def fromCode(code: Int): Op = all.find(_.code == code).getOrElse {
    throw new IllegalArgumentException(
      s"op_no must be in 1..4 (menu at client (1).c:26-32), got $code")
  }

  /** True for the write path (routed to the primary server). */
  def isWrite(code: Int): Boolean = code == 1 || code == 2
}

/** One request. `seqNo` is the client-chosen request id; unlike the
  * reference there is no 1..100 band limit (`load_balancer.c:49`) — any
  * positive id is accepted.
  */
final case class GraphRequest(seqNo: Long, op: Op, graphName: String) {
  /** Reference response-correlation rule: responses arrive on
    * `mtype = seq_no + 100` (`primary_server.c:173`, `secondary_server.c:324`).
    */
  def responseTag: Long = seqNo + 100
}

/** Worker identity, mirroring the reference's three servers. */
sealed abstract class Worker(val name: String)
object Worker {
  case object Primary extends Worker("primary")
  case object Secondary1 extends Worker("secondary_1")
  case object Secondary2 extends Worker("secondary_2")
}

/** The load balancer's routing rule (reference `load_balancer.c:59-70`):
  * writes (op 1/2) go to the primary; reads are parity-hashed on seq_no
  * across the two secondaries. Semantically this is static hash
  * partitioning on the request key — in the Spark engine it survives only
  * as a pure function (scheduling is Spark's job), exercised by the
  * `route_assignment` oracle query.
  */
object Router {
  def route(seqNo: Long, opCode: Int): Worker =
    if (Op.isWrite(opCode)) Worker.Primary
    else if (seqNo % 2 == 0) Worker.Secondary1
    else Worker.Secondary2

  def route(req: GraphRequest): Worker = route(req.seqNo, req.op.code)
}

object RequestParser {
  /** Parse `"<seq_no> <op_no> <filename>"` (reference `sscanf` format at
    * `load_balancer.c:61`). Unlike the reference, malformed input raises a
    * typed error instead of reading garbage.
    */
  def parse(line: String): GraphRequest = {
    val parts = line.trim.split("\\s+")
    require(parts.length == 3,
      s"request must be '<seq_no> <op_no> <filename>', got '$line'")
    val seq = parts(0).toLong
    require(seq > 0, s"seq_no must be positive, got $seq")
    GraphRequest(seq, Op.fromCode(parts(1).toInt), parts(2))
  }
}
