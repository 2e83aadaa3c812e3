package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Search
import SparkTestSession._

class SearchSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bm25: rare term outranks common term; absent terms score 0") {
    // 'rare' appears in one doc, 'common' in all four — the doc holding
    // the rare term must outrank docs with only the common term
    val d = docs(
      (1L, "common rare pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad"),
      (4L, "pad pad pad pad"))
    val out = Search.bm25TopDocs(d, Seq("common", "rare"), k = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 1L, s"rare-term doc must rank first: ${out.toSeq}")
    // doc 4 has neither term: exactly 0
    assert(out.find(_._1 == 4L).get._2 == 0.0)
    // scores are non-increasing in output order
    val scores = out.map(_._2).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: equal tf, longer doc scores lower (length normalization)") {
    val d = docs(
      (1L, "term pad"),
      (2L, "term pad pad pad pad pad pad pad"))
    val out = Search.bm25TopDocs(d, Seq("term"), k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 1L && out(0)._2 > out(1)._2)
  }

  test("rrf fusion: ranks are 1-based permutations and rrf matches 1/(60+r) sum") {
    val d = docs(
      (1L, "q q q"),
      (2L, "q a b c d e"),
      (3L, "a b"))
    val out = Search.rrfFusion(d, Seq("q"), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    out.foreach { case (_, rl, rn, rrf) =>
      assert(rrf == 1.0 / (60 + rl) + 1.0 / (60 + rn))
    }
    // doc 1: best lexical rank; doc 2: best length rank
    assert(out.find(_._1 == 1L).get._2 == 1L)
    assert(out.find(_._1 == 2L).get._3 == 1L)
  }

  test("prf expansion: terms from feedback docs only, query terms excluded, idf-weighted") {
    // query 'q' hits docs 1 and 2 (the pseudo-relevant set at kDocs=2);
    // 'shared' is corpus-wide (df=4 of 4 ⇒ idf ln(1)=0), 'gold' lives
    // only in the feedback set (df=2 ⇒ positive idf), 'outside' never
    // appears in a feedback doc and must not be emitted
    val d = docs(
      (1L, "q gold shared gold"),
      (2L, "q gold shared"),
      (3L, "shared outside"),
      (4L, "shared outside pad"))
    val out = Search.prfExpansionTerms(d, Seq("q"), kDocs = 2, kTerms = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byTerm = out.map(t => t._1 -> t).toMap
    assert(!byTerm.contains("q"), "query term must be excluded")
    assert(!byTerm.contains("outside"), "non-feedback term must not appear")
    // gold: sum_tf 3 across the two feedback docs, df 2, score 3·ln(4/2)
    assert(byTerm("gold") == (("gold", 3L, 2L,
      BigDecimal(3.0 * math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // shared: everywhere ⇒ idf 0 ⇒ score 0, still listed (tf mass 2)
    assert(byTerm("shared") == (("shared", 2L, 4L, 0.0)))
    // ordering: gold (positive) before shared (zero)
    assert(out.head._1 == "gold")
  }
}
