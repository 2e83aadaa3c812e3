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

  test("simhash_agg of a single hash equals that hash (sign-sum identity)") {
    // with one input, every 1-bit sums to +1 (set) and every 0-bit to -1
    // (unset), so the simhash IS the input hash
    val one = Seq((1L, 0x0123456789abcdeL)).toDF("doc_id", "th")
    val agg = one.groupBy("doc_id")
      .agg(graft.functions.Sketches.simhash_agg($"th").as("sh"))
      .collect()(0).getLong(1)
    assert(agg == 0x0123456789abcdeL)
    // and the md5-derived 60-bit token hash matches DuckDB's
    // ('0x'||substr(md5('hello world'),1,15))::BIGINT (verified value)
    val th = spark.sql(
      "SELECT CAST(conv(substr(md5(CAST('hello world' AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
      .collect()(0).getLong(0)
    assert(th == 426544247714475757L)
  }

  test("vector_l2_argmin picks the nearest centroid, ties to lower index") {
    val cents = typedlit(Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 0.0)))
    val rows = Seq(
      (1L, Array(0.9f, 0.0f)),  // nearest (1,0) -> index 1 (ties 1 vs 2 -> 1)
      (2L, Array(0.1f, 0.0f)),  // nearest (0,0) -> index 0
      (3L, Array(0.5f, 0.0f)),  // exact midpoint -> lower index 0
    ).toDF("id", "e")
    val out = rows.select($"id", VectorFunctions.vector_l2_argmin($"e", cents).as("i"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 0))
    // matches the interpreted min-of-structs fold it replaced
    val hof = rows.select($"id", expr(
      """aggregate(
        |  transform(array(array(0D,0D), array(1D,0D), array(1D,0D)),
        |    (c, ci) -> struct(
        |      aggregate(zip_with(e, c, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
        |        0D, (acc, v) -> acc + v) AS d, ci AS cl)),
        |  CAST(null AS STRUCT<d: DOUBLE, cl: INT>),
        |  (best, cand) -> CASE WHEN best IS NULL THEN cand
        |    WHEN cand.d < best.d THEN cand
        |    WHEN cand.d = best.d AND cand.cl < best.cl THEN cand
        |    ELSE best END).cl""".stripMargin).as("i"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == hof)
  }

  test("vector_l2_argmin runs inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = typedlit(Seq(Seq.fill(64)(0.0), Seq.fill(64)(0.1)))
    val plan = emb.select(VectorFunctions.vector_l2_argmin($"embedding", cents).as("i"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vector_l2_argmin"), plan)
  }

  test("word_kgrams matches the HOF transform form on every shape") {
    import graft.functions.TextFunctions.word_kgrams
    val docs = Seq("a b c d e", "a b a b a b", "x y", "", "solo", "a a a")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("t", split($"text", " "))
    val hofExpr = (k: Int) =>
      s"""CASE WHEN size(t) >= $k
         |THEN transform(sequence(1, size(t) - ${k - 1}),
         |       i -> concat_ws(' ', ${(0 until k).map(o => s"element_at(t, i + $o)").mkString(", ")}))
         |ELSE array() END""".stripMargin
    for (k <- Seq(1, 2, 3)) {
      val native = docs.select($"id", word_kgrams($"t", k, distinct = false).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      val hof = docs.select($"id", expr(hofExpr(k)).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      assert(native == hof, s"k=$k sequence-order mismatch")
      val nativeD = docs.select($"id", word_kgrams($"t", k, distinct = true).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      val hofD = docs.select($"id", expr(s"array_distinct(${hofExpr(k)})").as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      assert(nativeD == hofD, s"k=$k distinct (first-occurrence) mismatch")
    }
  }

  test("word_kgrams matches a naive sliding-window reference on seeded random inputs") {
    import graft.functions.TextFunctions.word_kgrams
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "ab", "xyz", "q")
    val cases = (1 to 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = cases.toDF("id", "t")
    for (k <- 1 to 4) {
      val got = df.select($"id", word_kgrams($"t", k, distinct = false).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      val want = cases.map { case (id, toks) =>
        id -> (if (toks.size < k) Seq.empty[String]
               else toks.sliding(k).map(_.mkString(" ")).toSeq)
      }.toMap
      assert(got == want, s"k=$k vs sliding reference")
      val gotD = df.select($"id", word_kgrams($"t", k, distinct = true).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
      assert(gotD == want.map { case (id, g) => id -> g.distinct },
        s"k=$k distinct vs first-occurrence reference")
    }
  }

  test("word_kgrams and char_entropy_stats run inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p1 = docs.select(graft.functions.TextFunctions
        .word_kgrams(split($"text", " "), 3, distinct = true).as("g"))
      .queryExecution.executedPlan.toString
    assert(p1.contains("*(1) Project [word_kgrams"), p1)
    val p2 = docs.select(graft.functions.TextFunctions
        .char_entropy_stats($"text").as("st"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("*(1) Project [char_entropy_stats"), p2)
  }

  test("expression participates in whole-stage codegen") {
    // must use a real source: local relations are constant-folded away
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(VectorFunctions.vector_cosine($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vector_cosine"), plan)
  }

  test("md5Bits60Of (driver Scala) matches md5Bits60 (Column) bit-for-bit") {
    // the bootstrap's per-replica coefficients are derived driver-side with
    // md5Bits60Of while the oracle re-derives them engine-side — any
    // divergence between the twins silently breaks that parity
    val samples = Seq("bca_0", "bca_63", "bcc_7", "", "42", "graft")
    val viaColumn = samples.toDF("s")
      .select(graft.functions.PortableHash.md5Bits60($"s"))
      .collect().map(_.getLong(0)).toSeq
    val viaScala = samples.map(graft.functions.PortableHash.md5Bits60Of)
    assert(viaColumn == viaScala)
    assert(viaScala.forall(h => h >= 0L && h < (1L << 60)))
  }
}
