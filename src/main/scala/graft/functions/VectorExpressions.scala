package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = (double) $a.getFloat(i);
         |  double y = (double) $b.getFloat(i);
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
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
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0;
         |for (int i = 0; i < n; i++) {
         |  dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API + SQL registration for the vector expressions. */
object VectorFunctions {
  def vector_cosine(a: Column, b: Column): Column =
    Bridge.column(VectorCosine(Bridge.expression(a), Bridge.expression(b)))

  def vector_dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Idempotent SQL-name registration (`SELECT vector_cosine(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vector_cosine", es => VectorCosine(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_dot", es => VectorDot(es.head, es(1)), "built-in")
  }
}
