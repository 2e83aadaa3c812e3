package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.MatrixCodec
import graft.graph.GraphOps
import SparkTestSession._

/** Regression over the reference's full golden corpus: the 13 symmetric
  * tree matrices shipped in `Trees for OS Assignment-2.docx` (sizes 4–20),
  * re-encoded as matrix text in `src/test/resources/docx_trees.txt`
  * (extraction recipe in FIXTURES.md §3). For every tree and every start
  * vertex: BFS covers all n vertices with parent/child levels off by one,
  * DFS-leaves equals the degree-1 set minus the root, and the Pregel path
  * agrees with the DataFrame loop.
  */
class DocxGoldenSpec extends AnyFunSuite {

  private val trees: Seq[(Int, Seq[(Long, Long)])] = {
    val raw = scala.io.Source.fromResource("docx_trees.txt").mkString
    raw.split("---").map(_.trim).filter(_.nonEmpty).toSeq
      .map(MatrixCodec.parseMatrixText)
  }

  test("all 13 docx trees parsed") {
    assert(trees.length == 13)
    assert(trees.map(_._1).sorted == Seq(4, 4, 4, 4, 5, 6, 7, 8, 20, 20, 20, 20, 20))
  }

  for (((n, edges), idx) <- trees.zipWithIndex) {
    test(s"docx tree #$idx (n=$n): BFS and DFS invariants from every start vertex") {
      val df = MatrixCodec.edgesDF(spark, edges)
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      // test from vertex 1, a leaf, and an internal vertex (full sweep on small n)
      val starts = if (n <= 8) (1L to n.toLong) else Seq(1L,
        deg.find(_._2 == 1).get._1, deg.maxBy(_._2)._1).distinct
      for (s <- starts) {
        val bfs = GraphOps.bfsLevels(df, s).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(bfs.size == n, s"BFS from $s missed vertices")
        assert(bfs(s) == 0L)
        // each edge spans adjacent levels
        edges.foreach { case (a, b) =>
          assert(math.abs(bfs(a) - bfs(b)) == 1, s"edge ($a,$b) levels from $s")
        }
        val leaves = GraphOps.dfsLeaves(df, s).collect().map(_.getLong(0)).toSet
        assert(leaves == (deg.filter(_._2 == 1).keySet - s),
          s"DFS leaves from $s")
      }
      // Pregel parity from vertex 1 (BFS levels and DFS leaves)
      val a = GraphOps.bfsLevels(df, 1L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = GraphOps.bfsLevelsPregel(df, 1L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b)
      val lp = GraphOps.dfsLeavesPregel(df, 1L).collect().map(_.getLong(0)).toSet
      assert(lp == (deg.filter(_._2 == 1).keySet - 1L), "Pregel DFS leaves from 1")
    }
  }
}
