package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as LONG nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the dumped queries (local iteration);
    // the driver runs with it unset and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // compression_ratio replay fixture: recompute comp_len SEQUENTIALLY
    // on the driver through the SAME pinned kernel the distributed
    // operator uses (pipeline.Compression.deflateLen) — an independent
    // execution the DuckDB oracle joins against. Written BEFORE the
    // oracle dump so a fixture failure surfaces as a missing-file oracle
    // error, never a silent pass. Location: a SIBLING of outDir
    // ("<outDir>_fixtures" — unique per run, like outDir itself), never
    // inside it: the driver scans $outDir recursively for query results,
    // and any non-query artifact there surfaces as a phantom err row
    // (r12's sole non-green line was the fixture container directory).
    if (only.forall(_.contains("compression_ratio"))) try {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).collect()
      val d = pipeline.Compression.newDeflater()
      val rows = docs.toSeq.map { r =>
        (r.getLong(0),
          pipeline.Compression.deflateLen(r.getString(1).getBytes("UTF-8"), d))
      }
      d.end()
      import spark.implicits._
      rows.toDF("doc_id", "comp_len").coalesce(1).write.mode("overwrite")
        .parquet(s"${new java.io.File(outDir).getAbsolutePath}_fixtures/" +
          "compression_oracle.parquet")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] compression fixture failed: ${e.getMessage}")
    }
    // ${GRAFT_VERIFY_OUT} placeholders resolve to THIS run's absolute
    // output dir (compression_ratio's fixture join reads the
    // "${GRAFT_VERIFY_OUT}_fixtures" sibling)
    val absOut = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("${GRAFT_VERIFY_OUT}", absOut))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ANN approximation contract as an AUDITABLE ARTIFACT: the two IVF
    // searches are correctness-gated by deterministic DuckDB replay
    // oracles (probe set re-derived in SQL), but they remain APPROXIMATE
    // vs the exact scan — recall@10 against brute-force truth is the
    // quality contract, floored in PropertyOracleSpec. Re-measure it
    // whenever the IVF queries are dumped and write through to the
    // repo-root RECALL.json so the artifact can never go stale.
    if (only.forall(_.exists(_.startsWith("embedding_topk_ivf")))) try {
      import pipeline.IvfParams
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val truth = pipeline.Similarity.cosineTopK(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K)
        .collect().map(_.getLong(0)).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Int =
        df.collect().map(_.getLong(0)).toSet.intersect(truth).size
      val rLabel = recall(pipeline.Similarity.cosineTopKIvf(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K,
        nprobe = IvfParams.Label.Nprobe))
      val rKmeans = recall(pipeline.KMeans.ivfTopK(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K,
        nlist = IvfParams.Kmeans.Nlist, nprobe = IvfParams.Kmeans.Nprobe,
        iters = IvfParams.Kmeans.Iters))
      // PQ is oracle-EXACT (integer ADC), so correctness is gated by SQL;
      // this line audits its approximation QUALITY vs float cosine truth —
      // low on this unclustered random-vector testdata by construction
      // (16 random anchors, L2-vs-cosine objective), same regime as
      // label-IVF's 3/10.
      val rPq = recall(pipeline.Similarity.pqTopK(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K))
      // MRL truncate-then-rerank: oracle-exact like PQ, recall audited
      // AND floored (PropertyOracleSpec) — the prefix quality contract
      val rMrl = recall(pipeline.Similarity.cosineTopKRerank(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K,
        dims = IvfParams.Mrl.Dims, coarseK = IvfParams.Mrl.CoarseK))
      // IVFADC: probe × integer ADC × exact head re-rank — oracle-exact
      // correctness; recall audited AND floored (PropertyOracleSpec)
      val rIvfAdc = recall(pipeline.Similarity.ivfAdcTopK(emb,
        queryId = IvfParams.QueryVecId, k = IvfParams.K,
        nprobe = IvfParams.Label.Nprobe, m = IvfParams.Pq.M,
        nCentroids = IvfParams.Pq.NCentroids,
        rerankN = IvfParams.IvfAdc.RerankN))
      val recallJson =
        s"""{"k":${IvfParams.K},"query_vec_id":${IvfParams.QueryVecId},"sf_dir":"$sfDir",""" +
          s""""embedding_topk_ivf":{"recall_at_10":$rLabel,""" +
          s""""floor":${IvfParams.Label.RecallFloor},"nprobe":${IvfParams.Label.Nprobe}},""" +
          s""""embedding_topk_ivf_kmeans":{"recall_at_10":$rKmeans,""" +
          s""""floor":${IvfParams.Kmeans.RecallFloor},"nlist":${IvfParams.Kmeans.Nlist},""" +
          s""""nprobe":${IvfParams.Kmeans.Nprobe}},""" +
          s""""embedding_topk_pq":{"recall_at_10":$rPq,"oracle":"exact-sql",""" +
          s""""m":${IvfParams.Pq.M},"n_centroids":${IvfParams.Pq.NCentroids}},""" +
          s""""embedding_topk_rerank":{"recall_at_10":$rMrl,""" +
          s""""floor":${IvfParams.Mrl.RecallFloor},"dims":${IvfParams.Mrl.Dims},""" +
          s""""coarse_k":${IvfParams.Mrl.CoarseK}},""" +
          s""""embedding_topk_ivfadc":{"recall_at_10":$rIvfAdc,""" +
          s""""floor":${IvfParams.IvfAdc.RecallFloor},""" +
          s""""nprobe":${IvfParams.Label.Nprobe},""" +
          s""""rerank_n":${IvfParams.IvfAdc.RerankN}},""" +
          // the streaming code-serving twin bit-equals the batch rung by
          // construction (final compaction refit = the full-corpus fit;
          // StreamSpec asserts the equality), so its recall IS rIvfAdc
          s""""stream_ivfadc_topk":{"recall_at_10":$rIvfAdc,""" +
          s""""floor":${IvfParams.IvfAdc.RecallFloor},""" +
          s""""inherits":"embedding_topk_ivfadc — StreamSpec asserts bit-equality with the batch query"}}"""
      Files.writeString(Paths.get(s"$outDir/recall.json"), recallJson)
      // keep the committed artifact in lockstep with the measurement —
      // per SCALE: the canonical sf0.01 record (the driver's verify
      // scale) stays RECALL.json; every other scale writes its own
      // RECALL.<scale>.json (e.g. RECALL.sf0.1.json for the bench scale)
      // instead of silently skipping, so the bench scale has a recall
      // record too. The floors and measured values are scale-specific.
      // Runs from other cwds skip silently (no repo-root RECALL.json
      // present to anchor on).
      if (Files.exists(Paths.get("RECALL.json"))) {
        val scale = Paths.get(sfDir.stripSuffix("/")).getFileName.toString
        val target =
          if (scale == "sf0.01") "RECALL.json" else s"RECALL.$scale.json"
        Files.writeString(Paths.get(target), recallJson)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] recall artifact failed: ${e.getMessage}")
    }
    // ANN label-noise quality contract: verdict agreement with the exact
    // all-pairs kernel (the pruned path's analogue of IVF recall),
    // floored in PropertyOracleSpec — re-measured whenever the ANN query
    // is dumped and written through to the repo-root AGREEMENT.json so
    // the committed artifact can never go stale (RECALL.json pattern).
    if (only.forall(_.contains("label_noise_ann"))) try {
      import pipeline.IvfParams
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val exact = pipeline.Similarity.labelNoise(emb, k = 10).collect()
        .map(r => (r.getLong(0), r.getBoolean(4))).toMap
      val ann = pipeline.Similarity.labelNoiseAnn(emb, k = 10,
          nlist = IvfParams.Kmeans.Nlist, iters = IvfParams.Kmeans.Iters)
        .collect().map(r => (r.getLong(0), r.getBoolean(4)))
      val common = ann.filter { case (v, _) => exact.contains(v) }
      val agree = common.count { case (v, s) => exact(v) == s }
      val agreement = agree.toDouble / math.max(1, common.length)
      val agreementJson =
        s"""{"sf_dir":"$sfDir","k":10,"nlist":${IvfParams.Kmeans.Nlist},""" +
          s""""iters":${IvfParams.Kmeans.Iters},""" +
          s""""n_exact":${exact.size},"n_ann":${ann.length},""" +
          f""""suspect_agreement":$agreement%.4f,""" +
          s""""floor":${IvfParams.LabelNoise.AgreementFloor}}"""
      Files.writeString(Paths.get(s"$outDir/agreement.json"), agreementJson)
      if (Files.exists(Paths.get("AGREEMENT.json"))) {
        val scale = Paths.get(sfDir.stripSuffix("/")).getFileName.toString
        val target =
          if (scale == "sf0.01") "AGREEMENT.json" else s"AGREEMENT.$scale.json"
        Files.writeString(Paths.get(target), agreementJson)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] agreement artifact failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
