package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers every graft native
  * expression and sketch aggregate as a SQL function at session build
  * time — the supported way to ship a function library without touching
  * the session after construction:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions     // config, or
  * SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * The imperative [[graft.functions.VectorFunctions.register]] stays for
  * REPL/test use on an already-built session; both routes register the
  * same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the per-group top-k planner strategy
    // (sessions built without extensions get it lazily via
    // GroupTopK.topKPerKey's experimental-strategies registration)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopK.Strategy)
    ext.injectFunction((FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine of two float vectors"),
      (es: Seq[Expression]) => VectorCosine(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two float vectors"),
      (es: Seq[Expression]) => VectorDot(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("vector_l2_argmin"),
      info("vector_l2_argmin",
        "vector_l2_argmin(emb, centroids) - index of the nearest centroid by squared L2"),
      (es: Seq[Expression]) => VectorL2Argmin(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("vector_sign_sketch"),
      info("vector_sign_sketch",
        "vector_sign_sketch(emb, seed) - 64-bit hyperplane sign sketch (seed must be a literal int)"),
      (es: Seq[Expression]) => VectorSignSketch(es.head, es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"vector_sign_sketch seed must be a literal int, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("minhash_agg"),
      info("minhash_agg",
        "minhash_agg(s, k) - k-permutation MinHash signature sketch (k a literal int)"),
      (es: Seq[Expression]) => Sketches.MinHashAgg(es.head, es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_agg k must be a literal int, got $other")
      }).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("count_min_agg"),
      info("count_min_agg",
        "count_min_agg(term, depth, width) - md5-addressed count-min sketch (depth/width literal ints)"),
      (es: Seq[Expression]) => {
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"count_min_agg $what must be a literal int, got $other")
        }
        Sketches.CountMinAgg(es.head, litInt(es(1), "depth"), litInt(es(2), "width"))
          .toAggregateExpression()
      }))
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg",
        "simhash_agg(hash) - 64-bit SimHash sketch over pre-hashed BIGINT tokens"),
      (es: Seq[Expression]) => Sketches.SimHashAgg(es.head).toAggregateExpression()))
  }
}
