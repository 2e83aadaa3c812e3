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
    /** Measured 6/10 on sf0.1, the bench scale (RECALL.sf0.1.json). */
    val MeasuredRecallSf01 = 6
    val RecallFloorSf01 = 5
    /** Floor on the centroid-cosine gap between the Nprobe-th and
      * (Nprobe+1)-th ranked label. The DuckDB replay oracle re-derives
      * the probe set with its own FP sums, so the oracle only stays
      * hash-stable while this margin dwarfs cross-engine ulp drift
      * (~1e-12 on a 64-term double sum). Measured 0.027 (sf0.01) /
      * 0.065 (sf0.1); a testdata regeneration that collapses it below
      * this floor fails PropertyOracleSpec loudly instead of making
      * CORRECTNESS flaky.
      */
    val ProbeMarginFloor = 1e-3
  }

  /** K-means IVF (learned coarse quantizer, distributed Lloyd's). */
  object Kmeans {
    val Nlist = 8
    val Nprobe = 3
    val Iters = 3
    /** Measured 9/10 on sf0.01 (RECALL.json). */
    val MeasuredRecall = 9
    val RecallFloor = 8
    /** Measured 10/10 on sf0.1, the bench scale (RECALL.sf0.1.json) —
      * the learned quantizer IMPROVES with more data (tighter clusters),
      * unlike the random-partition label quantizer above. */
    val MeasuredRecallSf01 = 10
    val RecallFloorSf01 = 9
    /** Floor on the smallest best-vs-second L2 argmin gap across all
      * vectors and all Lloyd rounds (assignment rounds 1..Iters+1). The
      * unrolled DuckDB oracle replays every assignment with its own FP
      * sums; one flipped argmin reshapes every later round. Measured
      * min gap 6.7e-6 (sf0.01) / 1.4e-5 (sf0.1) vs ~1e-12 ulp drift.
      */
    val ArgminMarginFloor = 1e-6
    /** Floor on the query-to-centroid squared-L2 gap between the
      * Nprobe-th and (Nprobe+1)-th ranked cluster of the final
      * centroids. Measured 9.5e-3 (sf0.01).
      */
    val ProbeMarginFloor = 1e-3
  }

  /** Matryoshka truncate-then-rerank: coarse cosine over the first
    * `Dims` coordinates keeps `CoarseK` survivors, exact full-dim rerank
    * picks the final K. Oracle-exact (two-stage DuckDB replay); recall
    * vs the exact full scan is the quality contract.
    */
  object Mrl {
    val Dims = 16
    val CoarseK = 200
    /** Measured 7/10 on sf0.01 (9/10 on sf0.001): these synthetic
      * vectors are RANDOM, so a 16-dim prefix carries near-chance
      * ranking signal and only the coarse-200 containment (of 500)
      * preserves the head — a real MRL-trained embedding front-loads
      * variance and would recall far higher at the same dims.
      */
    val MeasuredRecall = 7
    val RecallFloor = 5
  }

  /** Product quantization (oracle-exact integer ADC; recall is audited,
    * not floored — see Verify's recall artifact comment). */
  object Pq {
    val M = 8
    val NCentroids = 16
  }

  /** IVFADC (probe label cells, ADC over the cells' int8 codes, exact
    * re-rank of the short head — the at-scale vector-store default).
    * Everything between the probe (Label margin floor) and the re-rank
    * is integer-exact, so the correctness oracle is a full SQL replay;
    * recall vs the exact scan is the quality contract. The generous
    * `RerankN` head recovers most of what the unclustered-random-vector
    * ADC ranking loses: recall is floored at the LABEL-IVF floor (the
    * probe step upper-bounds both paths).
    */
  object IvfAdc {
    /** Sized for the ADC ranking's weakness on THIS corpus: the vectors
      * are unclustered random, so the int8 ADC ordering carries little
      * signal and the head must be generous before the exact re-rank
      * sees the true neighbors (50 recalled 6/10 at sf0.01 but 3/10 at
      * sf0.1 — the head didn't grow with the probed cells). 200 rows is
      * still parameter-scale: the full-precision fetch is 200 vectors
      * regardless of corpus size.
      */
    val RerankN = 200
    /** Measured 7/10 on sf0.01 (probe-limited: label-IVF itself is 7). */
    val MeasuredRecall = 7
    val RecallFloor = 5
    /** Measured 6/10 on sf0.1 — EQUAL to label-IVF's 6/10 there: with
      * the 200-row head the ADC stage loses nothing and recall is purely
      * probe-limited (RECALL.sf0.1.json).
      */
    val MeasuredRecallSf01 = 6
    val RecallFloorSf01 = 4
  }

  /** ANN label-noise (k-NN vote over in-cluster candidates only). The
    * quality contract is VERDICT agreement with the exact all-pairs
    * kernel: fraction of vectors whose `suspect` flag matches.
    */
  object LabelNoise {
    /** Measured 0.856 on sf0.01 (AGREEMENT.json). The testdata labels
      * are random (near-chance k-NN majority), so this is a hard
      * regime — a real labeled corpus with cluster-correlated labels
      * agrees far higher. */
    val MeasuredAgreement = 0.856
    val AgreementFloor = 0.80
  }
}
