package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming._
import SparkTestSession._

class StreamSpec extends AnyFunSuite {
  import spark.implicits._

  test("parseRequests routes well-formed lines and quarantines garbage") {
    val df = Seq("1 1 G1.txt", "2 4 G1.txt", "5 3 G2.txt", "bogus line", "9 7 G1.txt")
      .toDF("value")
    val out = StreamOps.parseRequests(df).collect()
      .map(r => (Option(r.get(0)), r.getString(3))).toSeq
    assert(out(0) == (Some(1L), "primary"))
    assert(out(1) == (Some(2L), "secondary_1"))
    assert(out(2) == (Some(5L), "secondary_2"))
    assert(out(3)._2 == "invalid")
    assert(out(4)._2 == "invalid") // op 7 out of range
  }

  test("request stream: memory source → parse → windowed rates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val base = 1700000000000L
    mem.addData(
      (new java.sql.Timestamp(base), "1 1 G1.txt"),
      (new java.sql.Timestamp(base + 1000), "2 4 G1.txt"),
      (new java.sql.Timestamp(base + 2000), "3 3 G1.txt"),
      (new java.sql.Timestamp(base + 61000), "4 4 G1.txt"))
    val parsed = StreamOps.parseRequests(mem.toDF().toDF("ts", "value"))
    val rates = StreamOps.requestRates(parsed)
    val q = rates.writeStream.format("memory").queryName("req_rates")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT worker, n FROM req_rates ORDER BY window_start, worker")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.contains(("primary", 1L)))
      assert(rows.contains(("secondary_1", 1L)))
      assert(rows.contains(("secondary_2", 1L)))
    } finally q.stop()
  }

  test("windowed event rates over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val base = 1700000000000L
    mem.addData(
      (new java.sql.Timestamp(base), "click", 1.0),
      (new java.sql.Timestamp(base + 1000), "click", 2.0),
      (new java.sql.Timestamp(base + 2000), "view", 3.0))
    val rates = StreamOps.eventRates(mem.toDF().toDF("ts", "event_type", "value"))
    val q = rates.writeStream.format("memory").queryName("ev_rates")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM ev_rates ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions (batch-mode parity)") {
    val evs = Seq(
      UserEvent(1, 0, 1.0), UserEvent(1, 1000, 2.0),        // session 1
      UserEvent(1, 10000000, 5.0),                          // session 2 (open)
      UserEvent(2, 0, 1.0)).toDS()                          // open
    val out = StreamOps.sessionizeStream(evs).collect()
    // batch mode: only sessions closed by a later gap are emitted
    assert(out.toSeq == Seq(SessionOut(1, 0, 2, 3.0)))
  }
}
