package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph derivations over the driver testdata (FIXTURES.md §5): both Spark
  * and the DuckDB oracle build edges from the SAME parquet tables with the
  * SAME arithmetic, so results hash-match.
  *
  * Vertex-id namespaces (disjoint by construction):
  *   region    1 + r_regionkey        (1..5)
  *   nation    10 + n_nationkey       (10..34)
  *   customer  1000 + c_custkey       (1000..)
  *   order     10_000_000 + o_orderkey
  */
object DerivedGraphs {
  val RegionBase = 1L
  val NationBase = 10L
  val CustomerBase = 1000L
  val OrderBase = 10000000L
  // far above any plausible partkey range (200k×sf parts at TPC-H sf):
  val SupplierBase = 1000000000L

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Directed rooted forest region→nation→customer→order (4 levels). */
  def treeEdges(spark: SparkSession, dir: String): DataFrame = {
    val nation = table(spark, dir, "nation")
      .select((lit(RegionBase) + col("n_regionkey")).cast("long").as("src"),
              (lit(NationBase) + col("n_nationkey")).cast("long").as("dst"))
    val cust = table(spark, dir, "customer")
      .select((lit(NationBase) + col("c_nationkey")).cast("long").as("src"),
              (lit(CustomerBase) + col("c_custkey")).cast("long").as("dst"))
    val ord = table(spark, dir, "orders")
      .select((lit(CustomerBase) + col("o_custkey")).cast("long").as("src"),
              (lit(OrderBase) + col("o_orderkey")).cast("long").as("dst"))
    nation.unionAll(cust).unionAll(ord)
  }

  /** Matching DuckDB SQL for [[treeEdges]] (used inside oracle CTEs). */
  val treeEdgesSql: String =
    """SELECT CAST(1 + n_regionkey AS BIGINT) AS src, CAST(10 + n_nationkey AS BIGINT) AS dst FROM nation
      |UNION ALL
      |SELECT CAST(10 + c_nationkey AS BIGINT), CAST(1000 + c_custkey AS BIGINT) FROM customer
      |UNION ALL
      |SELECT CAST(1000 + o_custkey AS BIGINT), CAST(10000000 + o_orderkey AS BIGINT) FROM orders""".stripMargin

  /** Bipartite part—supplier co-occurrence graph from lineitem. Suppliers
    * are offset into their own namespace: partkey and suppkey ranges overlap
    * numerically, and colliding ids would merge unrelated vertices.
    */
  def partSuppEdges(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("src"),
              (lit(SupplierBase) + col("l_suppkey")).cast("long").as("dst"))
      .distinct()

  /** Bipartite customer—order graph (undirected: both directions stored). */
  def custOrderEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val fwd = o.select((lit(CustomerBase) + col("o_custkey")).cast("long").as("src"),
                       (lit(OrderBase) + col("o_orderkey")).cast("long").as("dst"))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** All vertices of the customer—order graph, including customers with no
    * orders (isolated vertices must survive connected components).
    */
  def custOrderVertices(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
      .select((lit(CustomerBase) + col("c_custkey")).cast("long").as("vertex"))
    val o = table(spark, dir, "orders")
      .select((lit(OrderBase) + col("o_orderkey")).cast("long").as("vertex"))
    c.unionAll(o)
  }
}
