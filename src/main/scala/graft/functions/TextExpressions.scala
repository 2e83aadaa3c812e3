package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row text statistics.
  *
  * Why an expression and not explode+groupBy: the dataflow version of
  * character entropy shuffles one row PER CHARACTER through an Exchange —
  * linear, but a 3× row amplification for a quantity that is computable in
  * one pass over the row. This keeps the whole of TextStats at scan speed.
  */

/** Per-row character-distribution stats: code-point histogram in one pass,
  * returning `struct(n_distinct BIGINT, entropy DOUBLE)` where entropy is
  * the Shannon entropy in bits/char, computed exactly as the grouped form
  * it replaces: `-Σ f·log2 f / n + log2 n` (callers round to 4 dp, which
  * absorbs the summation-order float jitter — same convention as before).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    CharEntropyStats.compute(input.asInstanceOf[UTF8String])

  // The histogram pass lives in a static method; the generated code is one
  // call, so the expression stays inside whole-stage codegen (no
  // CodegenFallback interpreter round-trip per row).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {
  private val Ln2 = math.log(2.0)

  /** One pass over the string's code points (what `split(text, '')`
    * enumerates for the dataflow form this replaces; an empty string splits
    * to a single empty token in both engines, hence the (1, 0.0) case).
    */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    if (str.isEmpty) return new GenericInternalRow(Array[Any](1L, 0.0))
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var sumFLogF = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val f = it.next()(0).toDouble
      sumFLogF += f * (math.log(f) / Ln2)
    }
    val entropy = -sumFLogF / n + math.log(n.toDouble) / Ln2
    new GenericInternalRow(Array[Any](counts.size().toLong, entropy))
  }
}

/** Word k-grams over a token array, in sequence order, space-joined —
  * the gram builder shared by Dedup.shingles (distinct), ngramFreq
  * (duplicates kept) and winnowing (sequence order). Returns an empty
  * array below k tokens.
  *
  * Why native: the `transform(sequence(...), i -> concat_ws(...))` HOF it
  * replaces is CodegenFallback — every gram round-trips through the
  * interpreter with a lambda frame and per-element variable substitution.
  * This builds the gram array in one generated-code call; with
  * `distinctGrams` the per-row dedup happens in the same pass (no
  * separate array_distinct traversal).
  */
case class WordKGrams(child: Expression, k: Int, distinctGrams: Boolean)
  extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def prettyName: String = "word_kgrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    WordKGrams.compute(input.asInstanceOf[ArrayData], k, distinctGrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordKGrams.compute($c, $k, $distinctGrams);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordKGrams {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    // concatWs COPIES bytes into a fresh UTF8String, so grams stay valid
    // even when the input array aliases a reused row buffer
    val parts = new Array[UTF8String](k)
    if (!distinct) {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      // first-occurrence order, matching array_distinct over the HOF form
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }
}

/** Column-level API for the text expressions. */
object TextFunctions {
  def char_entropy_stats(text: Column): Column =
    Bridge.column(CharEntropyStats(Bridge.expression(text)))

  def word_kgrams(tokens: Column, k: Int, distinct: Boolean): Column =
    Bridge.column(WordKGrams(Bridge.expression(tokens), k, distinct))
}
