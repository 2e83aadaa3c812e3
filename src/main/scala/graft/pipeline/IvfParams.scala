package graft.pipeline

/** Single source of truth for the IVF ANN configuration shared by the
  * query registrations ([[graft.SparkEntry.queries]]), the DuckDB replay
  * oracle builders ([[graft.SparkEntry.oracleSql]]), the recall artifact
  * writer ([[graft.Verify]]) and the CI recall floors
  * (PropertyOracleSpec). Any drift between those four sites silently
  * desynchronizes the oracle from the query it checks — hoisting the
  * literals here makes that impossible.
  *
  * The recall floors are CONTRACTS, not measurements: the measured
  * deterministic recall@10 on sf0.01 is recorded next to each floor and
  * in RECALL.json; the floor is set below it so ulp-level drift passes
  * but a real quality regression (quantizer or seeding change) fails CI.
  */
object IvfParams {
  /** Embedding dimensionality of the `embeddings` testdata table. */
  val Dim = 64
  /** 1-based exclusive upper bound for SQL `range(1, DimEnd)` unnests. */
  val DimEnd: Int = Dim + 1
  /** The fixed probe vector for every ANN query and recall measurement. */
  val QueryVecId = 0L
  /** Neighbors returned / recall denominator. */
  val K = 10

  /** Label-IVF (pre-assigned partition labels as the coarse quantizer). */
  object Label {
    val Nprobe = 4
    /** Measured 7/10 on sf0.01 (labels are random partitions, not
      * similarity clusters — see RECALL.json). */
    val MeasuredRecall = 7
    val RecallFloor = 6
  }

  /** K-means IVF (learned coarse quantizer, distributed Lloyd's). */
  object Kmeans {
    val Nlist = 8
    val Nprobe = 3
    val Iters = 3
    /** Measured 9/10 on sf0.01 (RECALL.json). */
    val MeasuredRecall = 9
    val RecallFloor = 8
  }

  /** Product quantization (oracle-exact integer ADC; recall is audited,
    * not floored — see Verify's recall artifact comment). */
  object Pq {
    val M = 8
    val NCentroids = 16
  }
}
