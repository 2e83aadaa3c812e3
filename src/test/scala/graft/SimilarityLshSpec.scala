package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import SparkTestSession._

/** Hyperplane-LSH near-dup path: identical output to the exact
  * within-label all-pairs formulation, and real pruning at a true
  * near-dup threshold.
  */
class SimilarityLshSpec extends AnyFunSuite {
  import spark.implicits._

  test("LSH near-dup output equals the exact path on the test corpora") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.4).collect().toSeq
      val lsh = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.4).collect().toSeq
      assert(lsh == exact, s"LSH/exact divergence at $sf")
    }
  }

  /** Planted near-dups, one label (exact path = all pairs): at a true
    * near-dup threshold, wide bands (8 bits) keep full recall while
    * pruning almost every random pair — the 100 TB shape.
    */
  test("high-threshold LSH: full recall on planted dups, hard candidate pruning") {
    val rnd = new scala.util.Random(11)
    val dim = 32
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val bases = Seq.fill(100)(vec())
    val dups = bases.take(10).map(v => v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    val rows = (bases ++ dups).zipWithIndex.map { case (v, i) => (i.toLong, v, 0L) }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.95).collect().toSeq
    assert(exact.size >= 10) // the planted pairs qualify
    val lsh = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.95,
      words = 1, rowsPerBand = 8).collect().toSeq
    assert(lsh == exact, "LSH missed a planted near-dup")
    // candidate pruning: count band-collision pairs directly
    import graft.functions.VectorFunctions.vector_sign_sketch
    val sk = emb.select($"vec_id", vector_sign_sketch($"embedding", 1).as("sig"))
    val banded = sk.select($"vec_id", explode(array((0 until 8).map(b =>
      struct(lit(b).as("band"), shiftright($"sig", b * 8).bitwiseAND(lit(255L)).as("bs"))): _*)).as("bb"))
      .select($"vec_id", $"bb.band", $"bb.bs")
    val l = banded.select($"band", $"bs", $"vec_id".as("va"))
    val r = banded.select($"band", $"bs", $"vec_id".as("vb"))
    val nCand = l.join(r, Seq("band", "bs")).filter($"va" < $"vb")
      .select("va", "vb").distinct().count()
    val nPairs = 110L * 109 / 2
    assert(nCand < nPairs / 5, s"weak pruning: $nCand of $nPairs pairs are candidates")
  }

  /** The declared embedding_neardup query: planted dups (vec_id<100
    * duplicated at +1e6) at t=0.9 with 24×8-bit bands — LSH output must
    * equal the exact all-pairs on the same derived corpus.
    */
  test("declared 0.9-regime LSH query equals exact on the planted-dup corpus") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val base = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select($"vec_id", $"embedding", $"label")
      val planted = base.filter($"vec_id" < 100)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding", $"label")
      val corpus = base.unionByName(planted)
      val lsh = Similarity.cosineNearDupPairsLsh(corpus, threshold = 0.9,
        words = 3, rowsPerBand = 8).collect().toSeq
      val exact = Similarity.cosineNearDupPairs(corpus, threshold = 0.9).collect().toSeq
      assert(lsh == exact, s"LSH/exact divergence at $sf")
      assert(lsh.nonEmpty, s"degenerate planted-dup corpus at $sf")
    }
  }

  test("vector_sign_sketch is deterministic and codegen matches interpreted eval") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import graft.functions.VectorFunctions.vector_sign_sketch
    val a = emb.select($"vec_id", vector_sign_sketch($"embedding", 1).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // interpreted: route through a non-codegen context (RDD map over eval)
    val rows = emb.select($"vec_id", $"embedding").collect()
    val interp = rows.map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Float](1).toArray)
      val e = graft.functions.VectorSignSketch(
        org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)), 1)
      (r.getLong(0), e.eval(null).asInstanceOf[Long])
    }.toMap
    assert(a == interp)
  }
}
