package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * Why not `aggregate(zip_with(...))`: Catalyst's higher-order functions
  * (ArrayAggregate/ZipWith) are CodegenFallback — every element round-trips
  * through the interpreter and allocates a lambda frame. These expressions
  * compile to a tight primitive loop inside whole-stage codegen, which is
  * the difference between scan-speed and interpreter-speed over a 100 TB
  * embedding column.
  *
  * Semantics note: accumulation is sequential left-to-right in double, the
  * same order as the HOF fold it replaces, so results are bit-identical and
  * DuckDB-oracle-stable.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, " +
            s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }
}

/** Cosine similarity of two float vectors, computed in double. */
case class VectorCosine(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "vector_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // Every generated local goes through ctx.freshName: with a non-nullable
  // input, nullSafeCodeGen emits no wrapping if-scope, so two instances in
  // one Project would otherwise redeclare the same Java locals and janino
  // would silently push the whole stage back to interpreted eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors, computed in double. */
case class VectorDot(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two float vectors, computed in double.
  * Squared (not rooted) on purpose: argmin/argmax over distances is
  * sqrt-invariant, and skipping the root keeps the value a plain
  * sum-of-products both engines reproduce bit-for-bit.
  */
case class VectorDist2(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "vector_dist2"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index (0-based) of the nearest centroid by squared L2 distance.
  *
  * `left`: the row's embedding (`array<float>`); `right`: the centroid
  * list (`array<array<double>>`, typically a broadcast literal of k
  * vectors). Ties break to the LOWER index; callers that need cluster ids
  * keep a parallel id array sorted the same way (argmin over a
  * cluster-sorted list ≡ the old "lower cluster id wins" fold).
  *
  * This replaces an `aggregate(transform(...))` HOF fold that ran on
  * every Lloyd-iteration scan: HOFs are CodegenFallback (per-row
  * interpreter + lambda frames), while this compiles to two nested
  * primitive loops inside whole-stage codegen. Accumulation is sequential
  * left-to-right in double — identical order and values to the fold it
  * replaces. Returns -1 for an empty centroid list.
  */
case class VectorL2Argmin(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vector_l2_argmin"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<array<double>>), " +
            s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val emb = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cent = cents.getArray(c)
      val n = math.min(emb.numElements(), cent.numElements())
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = emb.getFloat(i).toDouble - cent.getDouble(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, cents) => {
      val cent = ctx.freshName("cent"); val k = ctx.freshName("k")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |int $k = $cents.numElements();
         |int $best = -1; double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $cents.getArray($c);
         |  int $n = java.lang.Math.min($emb.numElements(), $cent.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $emb.getFloat($i) - $cent.getDouble($i);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit hyperplane sign sketch of a float vector (SimHash over
  * embeddings): bit j = [dot(emb, H_j) >= 0] where H_j is a Rademacher
  * (±1) hyperplane derived deterministically from `(seed, j, dim-block)`
  * via a splitmix64 mix — no stored plane matrix, any dimension, identical
  * bits on every engine/run. Multiple seeds concatenate to longer
  * signatures for LSH banding ([[graft.pipeline.Similarity]]).
  *
  * For unit vectors, P(bit agrees) = 1 - angle/π (Goemans–Williamson), so
  * Hamming distance estimates the angle and band-equality buckets feed a
  * sub-quadratic near-dup candidate join. Codegen'd: two primitive loops,
  * one `mixWord` call per 64 dims per bit.
  */
case class VectorSignSketch(child: Expression, seed: Int) extends UnaryExpression {
  override def prettyName: String = s"vector_sign_sketch_$seed"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    var sig = 0L
    var j = 0
    while (j < 64) {
      var acc = 0.0
      var blk = 0
      while (blk * 64 < n) {
        val w = VectorSignSketch.mixWord(seed, j, blk)
        var i = blk * 64
        val end = math.min(n, blk * 64 + 64)
        while (i < end) {
          val x = emb.getFloat(i).toDouble
          acc += (if (((w >>> (i & 63)) & 1L) == 1L) x else -x)
          i += 1
        }
        blk += 1
      }
      if (acc >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  // cosineNearDupPairsLsh puts several VectorSignSketch instances in one
  // Project; fresh locals keep the generated method janino-compilable even
  // when the input is non-nullable (no per-instance if-scope).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val blk = ctx.freshName("blk"); val w = ctx.freshName("w")
      val end = ctx.freshName("end"); val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $n = $emb.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  double $acc = 0.0;
         |  for (int $blk = 0; $blk * 64 < $n; $blk++) {
         |    long $w = graft.functions.VectorSignSketch.mixWord($seed, $j, $blk);
         |    int $end = java.lang.Math.min($n, $blk * 64 + 64);
         |    for (int $i = $blk * 64; $i < $end; $i++) {
         |      double $x = (double) $emb.getFloat($i);
         |      $acc += ((($w >>> ($i & 63)) & 1L) == 1L) ? $x : -$x;
         |    }
         |  }
         |  if ($acc >= 0.0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorSignSketch {
  /** splitmix64 of the packed (seed, bit, dim-block) key; called from both
    * the interpreted eval and generated code (static forwarder).
    */
  def mixWord(seed: Int, j: Int, block: Int): Long = {
    var z = ((seed.toLong & 0xffffffffL) << 32) ^ (j.toLong << 8) ^ block.toLong
    z += 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Column-level API + SQL registration for the vector expressions. */
object VectorFunctions {
  def vector_cosine(a: Column, b: Column): Column =
    Bridge.column(VectorCosine(Bridge.expression(a), Bridge.expression(b)))

  def vector_dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  def vector_dist2(a: Column, b: Column): Column =
    Bridge.column(VectorDist2(Bridge.expression(a), Bridge.expression(b)))

  def vector_l2_argmin(emb: Column, centroids: Column): Column =
    Bridge.column(VectorL2Argmin(Bridge.expression(emb), Bridge.expression(centroids)))

  def vector_sign_sketch(emb: Column, seed: Int): Column =
    Bridge.column(VectorSignSketch(Bridge.expression(emb), seed))

  /** Idempotent SQL-name registration (`SELECT vector_cosine(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vector_cosine", es => VectorCosine(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_dot", es => VectorDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_dist2", es => VectorDist2(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_l2_argmin", es => VectorL2Argmin(es.head, es(1)), "built-in")
  }
}
