package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import SparkTestSession._

class FunctionsSpec extends AnyFunSuite {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(3.0f, 4.0f, 0.5f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
  ).toDF("id", "a", "b")

  test("vector_cosine matches a hand computation and the HOF fold") {
    val out = vecs.select($"id", VectorFunctions.vector_cosine($"a", $"b").as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val dot = 1.0 * 3.0 + 0.0 * 4.0 + 2.0 * 0.5
    val expected = dot / (math.sqrt(5.0) * math.sqrt(25.25))
    assert(math.abs(out(1L) - expected) < 1e-12)
    assert(out(2L) == 1.0)
    // bit-parity with the interpreted fold it replaced
    val hof = vecs.select($"id", expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)" +
        " / (sqrt(aggregate(a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        " * sqrt(aggregate(b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))").as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == hof)
  }

  test("vector_dot and SQL registration") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val out = spark.sql("SELECT id, vector_dot(a, b) AS d, vector_cosine(a, b) AS c FROM vecs_t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 4.0)
    assert(out(2L) == 1.0)
  }

  test("null inputs yield null (nullIntolerant)") {
    val withNull = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(VectorFunctions.vector_cosine($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("mismatched types are rejected at analysis") {
    val bad = Seq((1L, Array(1.0), Array(1.0f))).toDF("id", "a", "b") // a is double
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorFunctions.vector_cosine($"a", $"b")).collect()
    }
  }

  test("minhash_agg matches the exploded xxhash64(s, k) formulation") {
    val docs = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"), (2L, "delta"))
      .toDF("doc_id", "s")
    val viaAgg = docs.groupBy("doc_id")
      .agg(graft.functions.Sketches.minhash_agg($"s", 8).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    val viaExplode = docs
      .select($"doc_id", explode(expr(
        "transform(sequence(0, 7), k -> struct(k AS k, xxhash64(s, k) AS h))")).as("kh"))
      .groupBy($"doc_id", $"kh.k").agg(min($"kh.h").as("mh"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(viaAgg == viaExplode)
  }

  test("simhash_agg of a single token equals the token's xxhash64") {
    val one = Seq((1L, "solo")).toDF("doc_id", "tok")
    val agg = one.groupBy("doc_id")
      .agg(graft.functions.Sketches.simhash_agg($"tok").as("sh"))
      .collect()(0).getLong(1)
    val direct = one.select(xxhash64($"tok")).collect()(0).getLong(0)
    assert(agg == direct)
  }

  test("expression participates in whole-stage codegen") {
    // must use a real source: local relations are constant-folded away
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(VectorFunctions.vector_cosine($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vector_cosine"), plan)
  }
}
