package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-group top-k as a WHOLE-OPERATOR Catalyst extension — the ladder
  * rung above custom expressions: a custom logical node, planner
  * strategy, and physical operator (SURVEY.md §7.3 option c).
  *
  * Why not `row_number() OVER (PARTITION BY key ORDER BY …) <= k`? The
  * window plan shuffles EVERY row to its key's partition and fully sorts
  * each partition, then throws all but k·|keys| rows away. This operator
  * keeps a bounded k-row heap per key on the MAP side (the top-k
  * analogue of partial aggregation), so the shuffle carries at most
  * k · |keys| · numPartitions rows — at 100 TB with k=3 that is the
  * difference between shuffling the table and shuffling a rounding
  * error. The same heap pass then runs once more on the key-clustered
  * side for the exact result.
  */
object GroupTopK {

  /** Logical node: keep the first `k` child rows per `groupKeys` value in
    * `order`. Output schema = child schema (row-preserving).
    */
  case class GroupTopKNode(groupKeys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: LogicalPlan) extends UnaryNode {
    require(k >= 1, "k must be >= 1")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(c: LogicalPlan): GroupTopKNode =
      copy(child = c)
  }

  /** Session conf capping the partial pass's in-memory key map (distinct
    * keys per input partition before fallback). Mirrors the role of
    * Spark's ObjectHashAggregate fallback threshold: hash-based pruning
    * while the working set fits, graceful degradation when it doesn't.
    */
  val MaxKeysConfKey = "spark.graft.groupTopK.maxKeysInMemory"
  val MaxKeysDefault = 262144

  /** Physical operator. `partial = true` runs map-side on whatever
    * partitioning exists (emits ≤ k rows per key per partition);
    * `partial = false` declares [[ClusteredDistribution]] on the keys, so
    * EnsureRequirements inserts exactly one hash Exchange of the partial
    * survivors, and the same bounded-heap pass is then exact.
    *
    * Memory safety: the partial pass's heap map grows with DISTINCT KEYS
    * per partition, which at 100 TB with high-cardinality keys can exceed
    * executor memory (k·|keys| buffered rows). Once the map reaches
    * `maxKeys`, rows of NEW keys fall back to PASS-THROUGH — emitted
    * unpruned, exactly as if their heap held fewer than k rows.
    * Correctness is unaffected (the final clustered pass re-applies the
    * same bounded-heap pruning exactly); only map-side reduction degrades,
    * the same contract as hash-aggregate spill fallback. The final pass
    * never caps: it must be exact, and clustering bounds its per-partition
    * key count to |keys| / numPartitions — the standard hash-agg bound.
    */
  case class GroupTopKExec(groupKeys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, partial: Boolean, maxKeys: Int,
                           child: SparkPlan)
    extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def nodeName: String =
      if (partial) "GroupTopKPartial" else "GroupTopKFinal"

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) Seq(UnspecifiedDistribution)
      else if (groupKeys.isEmpty) Seq(AllTuples)
      else Seq(ClusteredDistribution(groupKeys))

    // row-preserving per partition: downstream operators keyed on the same
    // columns (e.g. a ranking window over the ≤k survivors) reuse the
    // final pass's hash partitioning instead of re-shuffling
    override def outputPartitioning: Partitioning = child.outputPartitioning

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val keysLocal = groupKeys
      val orderLocal = order
      val childOutput = child.output
      val capLocal = if (partial) maxKeys else Int.MaxValue
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keysLocal, childOutput)
        val ord = GenerateOrdering.generate(orderLocal, childOutput)
        // head = the WORST currently-kept row (reverse ordering), so a
        // better incoming row replaces it in O(log k)
        val heaps = new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[InternalRow]]()
        val rev = new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int =
            ord.compare(b, a)
        }
        // Lazy interleaving iterator: consumes input filling the heaps;
        // overflow-key rows stream straight through (never buffered), the
        // surviving heap rows flush after input exhausts.
        new Iterator[InternalRow] {
          private var passthrough: InternalRow = _
          private var flush: java.util.Iterator[InternalRow] = _
          private def fill(): Unit = {
            while (passthrough == null && flush == null) {
              if (!it.hasNext) {
                val all = new java.util.ArrayList[InternalRow]()
                heaps.values().forEach(h => all.addAll(h))
                flush = all.iterator()
              } else {
                val row = it.next()
                val key = keyProj(row)
                var heap = heaps.get(key)
                if (heap == null && heaps.size() < capLocal) {
                  heap = new java.util.PriorityQueue[InternalRow](kLocal, rev)
                  heaps.put(key.copy(), heap)
                }
                if (heap == null) passthrough = row // cap hit: emit unpruned
                else if (heap.size < kLocal) heap.add(row.copy())
                else if (ord.compare(row, heap.peek()) < 0) {
                  heap.poll()
                  heap.add(row.copy())
                }
              }
            }
          }
          override def hasNext: Boolean = {
            if (passthrough != null) true
            else if (flush != null) flush.hasNext
            else { fill(); passthrough != null || flush.hasNext }
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty GroupTopK partition")
            if (passthrough != null) { val r = passthrough; passthrough = null; r }
            else flush.next()
          }
        }
      }
    }

    override protected def withNewChildInternal(c: SparkPlan): GroupTopKExec =
      copy(child = c)
  }

  /** Planner strategy: partial map-side pass under the exact clustered
    * pass — the partial-aggregation shape for top-k. The partial cap is
    * read from the session conf at planning time (driver side).
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupTopKNode(keys, order, k, child) =>
        val maxKeys = org.apache.spark.sql.internal.SQLConf.get
          .getConfString(MaxKeysConfKey, MaxKeysDefault.toString).toInt
        require(maxKeys >= 1, s"$MaxKeysConfKey must be >= 1")
        GroupTopKExec(keys, order, k, partial = false, Int.MaxValue,
          GroupTopKExec(keys, order, k, partial = true, maxKeys,
            planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Public API: the first `k` rows per `keys` value in `order` (e.g.
    * `Seq(col("price").desc, col("id"))`; non-SortOrder columns default
    * ascending — pass a TOTAL order or ties make output nondeterministic).
    * Registers [[Strategy]] on the session's experimental strategies on
    * first use. Row order across groups is unspecified; follow with an
    * `orderBy` for a canonical result.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    // Resolve keys and sort order through a PROBE plan: Column trees are
    // lazy ColumnNode wrappers (not catalyst, not serializable) until the
    // analyzer binds them — so let a throwaway repartition+sort carry them
    // through analysis and lift the resolved expressions out of it.
    val probe = df.repartition(1, keys: _*).sortWithinPartitions(order: _*)
    val sortNode = probe.queryExecution.analyzed.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }.getOrElse(sys.error("probe plan lost its Sort node"))
    val repNode = sortNode.child match {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      case other => sys.error(s"probe plan shape unexpected: $other")
    }
    Bridge.ofRows(spark,
      GroupTopKNode(repNode.partitionExpressions, sortNode.order, k, repNode.child))
  }
}
