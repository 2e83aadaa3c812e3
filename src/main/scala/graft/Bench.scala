package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Round bench: one JSON line `{"metric":"total",...}` over all queries.
  *
  * Isolation model (round 11): the repo's own soak adjudication proved that
  * a shared-JVM bench session inflates late heavy queries up to 6x
  * (codegen/metaspace growth + cache pressure; SOAK_ADJUDICATION.json), and
  * that in-session `clearCache + unpersist + gc` is NOT enough — round-10's
  * three biggest "regressions" (betweenness_top50 +51%, wpagerank_top20
  * +42%, bootstrap_ci_mean +36%) were all on code whose plans were pinned
  * unchanged. So the bench now runs the `tools/soak_all.sh` pattern
  * in-process: the main() you invoke is an ORCHESTRATOR that forks one
  * child JVM per heavy query (>=2s at sf0.1 in round 10) and one per chunk
  * of `LightChunk` light queries, in fixed sorted order, then merges the per-child
  * part files into the same single-line artifact as before. Each child
  * repeats the old discipline (warmup, cache drop between reps, median of
  * SPARK_GRAFT_REPS). Fork works because build.sbt sets `run / fork`, so
  * java.class.path in this JVM is the real application classpath.
  *
  * SPARK_GRAFT_BENCH_INPROC=1 restores the old single-JVM path (fast local
  * iteration with SPARK_GRAFT_ONLY); the driver's default invocation gets
  * the isolated path.
  */
object Bench {
  /** Queries measured >=2s at sf0.1 in round 10 (bench_local.json @c19de9b):
    * each gets a dedicated JVM so its timing cannot be contaminated by
    * session history. Queries NOT in this set run chunked (10/JVM) — cheap
    * queries are dominated by fixed per-query overhead, not state growth,
    * and 10 queries/JVM keeps total JVM count ~60. New queries added after
    * round 10 default to the chunked path unless listed here.
    */
  private val Heavy: Set[String] = Set(
    "betweenness_top50", "wpagerank_top20", "bootstrap_ci_mean", "graph_mis",
    "katz_top20", "graph_random_walks", "scc_components", "bfs_bipartite",
    "hits_top20", "graph_matching", "subtree_sizes", "label_propagation",
    "ngram_jaccard", "leakage_safe_split", "pagerank_top20",
    "stream_interval_join", "dedup_clusters", "stream_cms_types",
    "link_prediction", "stream_kmv_users", "ppr_top20", "graph_eccentricity",
    "stream_sessions", "kcore_fixpoint", "stream_decontaminate",
    "ngram_containment", "sole_late_suppliers", "powerlaw_alpha",
    "degree_assortativity", "bfs_multi", "clustering_coeff",
    "assoc_rules_top50", "graph_centrality", "two_hop_reach",
    "triangle_counts", "simhash_pairs", "stream_funnel", "kcore_bounded",
    "sssp_bounded", "dfs_leaves", "resource_allocation_links", "rrf_fusion",
    "local_supplier_revenue", "stream_user_totals",
    // round-11 additions measured >=2s isolated:
    "stream_graph_maintain", "stream_triangle_maintain", "dup_spans", "ktruss_bounded",
    "louvain_moves", "modularity_louvain", "node2vec_walks",
    "perplexity_buckets", "dup_span_clean", "stream_neardup_ingest",
    "fourclique_counts", "rich_club", "densest_bounded", "stream_changepoint",
    "hyperball_nf", "walk_pmi", "kmeans_silhouette", "stream_merge_upsert",
    "label_noise_ann", "stream_quantiles_sampled",
    "community_conductance", "hyperball_mean_distance", "hyperball_harmonic",
    // round-13 additions measured >=2s isolated:
    "stream_embedding_topk", "stream_bm25_serving", "stream_drift_psi",
    "ppr_sweep_cut", "stream_quantiles_hist",
    // round-14 additions measured >=2s isolated:
    "stream_fourclique_maintain", "embedding_topk_ivfadc",
    "stream_assoc_rules", "stream_hll_users",
    // round-15 additions measured >=2s isolated:
    "stream_ivfadc_topk",
    // round-16 additions measured >=2s isolated:
    "pipeline_curation_e2e",
    // round-17 additions measured >=2s isolated:
    "stream_curation_e2e", "curation_funnel", "stream_media_dup",
  )
  // 20 light queries per JVM since r16 (was 10): halves the light-chunk
  // JVM startups (~15s each). The per-chunk untimed warm pass + isolate()
  // between reps are per-query, so individual light medians are
  // unaffected by chunk size — only the unit boundaries move.
  private val LightChunk = 20

  def main(args: Array[String]): Unit =
    if (sys.env.contains("SPARK_GRAFT_BENCH_PART")) child()
    else if (sys.env.get("SPARK_GRAFT_BENCH_INPROC").contains("1")) inproc()
    else parent()

  private def orderedNames(): Seq[String] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
  }

  // ---------------------------------------------------------------- parent
  private def parent(): Unit = {
    val names = orderedNames()
    // fixed sorted order → stable unit boundaries round-over-round
    val units = {
      val b = Seq.newBuilder[Seq[String]]
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      names.foreach { n =>
        if (Heavy(n)) b += Seq(n)
        else { buf += n; if (buf.size == LightChunk) { b += buf.toSeq; buf.clear() } }
      }
      if (buf.nonEmpty) b += buf.toSeq
      b.result()
    }
    // child JVM flags: replicate this JVM's --add-opens (sbt put them
    // there from build.sbt); classpath from java.class.path (real,
    // because run is forked).
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val opens = inArgs.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" => Seq(a, inArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
    }.flatten
    // Child heap is a PINNED constant, NOT inherited from the parent
    // (r16 verdict #1): the driver's sbt runs at -Xmx89g, and inheriting
    // it made the RAM clamp below collapse the 8-way pool to par=1
    // sequential local[32] children — the soft deadline then skipped 164
    // of 264 queries in BENCH_r16.json. Every committed median and both
    // calibration legs were measured at 8 g children, so the constant IS
    // the calibrated config: 8 x 8 g = 64 GiB never trips the clamp, and
    // medians stay comparable regardless of the parent's heap flag.
    val xmx = sys.env.getOrElse("SPARK_GRAFT_CHILD_XMX", "-Xmx8g")
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val partsDir = graft.TmpDirs.create("graft_bench_parts")

    // Round-14 wall-clock fix: 91+ sequential child JVMs at ~15-20s Spark
    // startup each blew the driver's bench budget in r13 (rc 124, no
    // official numbers). Units now run CONCURRENTLY, bounded by a
    // fixed-size pool, and the inherited thread budget is SPLIT
    // deterministically across the pool (each child gets
    // max(4, CPUS/par) threads → with the driver's CPUS=32 and par=4,
    // four local[8] children: the box is exactly subscribed, never
    // contended, so per-query medians are reproducible — just on fewer
    // threads than the r11-r13 sequential local[32] children). The r14
    // same-session calibration (BENCH_CALIBRATION.json: 6 heavies,
    // sequential/32-thread vs 4-way/8-thread) records the per-query
    // thread-slice ratios to apply when adjudicating r14 medians against
    // r12/r13. Units are SUBMITTED in fixed sorted order and results are
    // assembled in that same order, so unit boundaries and the artifact
    // layout are unchanged.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // The pool is DERIVED from the thread budget, never larger: each child
    // needs >=4 threads to be a meaningful Spark session, so at most
    // cpus/4 children run at once (r15 advice fix: the old independent
    // defaults gave cpus=4 -> four local[4] children = 16 threads on a
    // 4-CPU box, contradicting the exactly-subscribed claim). The env
    // override can only shrink the pool below the budget, not grow past it.
    // r16: default pool 8 (was 4). The r15 round died rc 124: the 4-way
    // pool was SATURATED (sum of unit durations 3801s / 4 ≈ 950s ≈ the
    // 970s wall, zero margin against the driver budget). Most busy time
    // is JVM startup (~96 units x ~15s) plus heavies that barely scale
    // past 8 threads (BENCH_CALIBRATION median thread-slice inflation
    // 1.089 from 32 -> 8 threads), so 8 children x local[4] overlap that
    // serial work twice as wide for a small per-query inflation —
    // re-based by the refreshed calibration legs for this config.
    val parEnv = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PAR", "8").toInt)
    val parByCpu = math.max(1, math.min(parEnv, cpus / 4))
    // The pool must FIT in physical memory or children swap/OOM into -1s
    // and silently inflated medians (r14 advice, medium). Clamp par so
    // par x child-Xmx <= 80% of physical RAM; at the pinned 8 g default
    // and par 8 that is 64 GiB on a 128 GiB box — the clamp only binds if
    // SPARK_GRAFT_CHILD_XMX is overridden upward.
    val xmxBytes: Long = {
      val m = "-Xmx(\\d+)([kKmMgGtT]?)".r
      xmx match {
        case m(n, u) =>
          val mult = u.toLowerCase match {
            case "k" => 1L << 10; case "m" => 1L << 20; case "g" => 1L << 30
            case "t" => 1L << 40
            case _ => 1L // bare byte count
          }
          n.toLong * mult
        case other =>
          // never clamp against a silent guess (r15 advice): say so when
          // the heap flag is unparseable
          System.err.println(s"[bench] unparseable child heap flag '$other'" +
            " — memory clamp assumes 8 GiB")
          8L << 30
      }
    }
    val physBytes: Long = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize
    val parByMem = math.max(1, ((physBytes * 0.8) / xmxBytes).toInt)
    val par = math.min(parByCpu, parByMem)
    if (par < parByCpu)
      System.err.println(s"[bench] pool clamped $parByCpu -> $par: " +
        s"${parByCpu}x$xmx exceeds 80% of ${physBytes >> 30} GiB physical")
    val childCpus = math.max(4, cpus / par)
    // Per-unit occupancy record (r14 verdict #1): the pool's co-scheduling
    // is timing-dependent, so each unit's median is a measurement of a
    // co-runner MIX — record exactly which units overlapped each unit's
    // window (and for how long) so any median can be adjudicated after the
    // fact instead of guessing the contention. Written as a side artifact
    // (BENCH_OCCUPANCY.json, same dir as the bench line) because the
    // one-line stdout contract stays as-is.
    // the pre-probe runs BEFORE the deadline epoch: its ~1-2 s must not
    // count against the soft deadline or the shed pace (the probe exists
    // to adjudicate the run, not to participate in it)
    noisePre = Some(NoiseProbe.full(partsDir).json)
    val epoch = System.nanoTime()
    def nowSec: Double = (System.nanoTime() - epoch) / 1e9
    // Span starts are recorded BEFORE the child launches (end = NaN while
    // running) so a unit that hangs or is killed mid-run still appears in
    // every other unit's co-runner list — understating contention was
    // exactly what the occupancy record exists to avoid (r15 advice).
    val spans = new java.util.concurrent.ConcurrentHashMap[Int, (Double, Double)]()
    // Per-unit mini noise probe (r18 verdict #6): the pre/post full
    // probes miss a contention window that opens and closes MID-run —
    // a ~100 ms probe after each unit, recorded in the occupancy
    // artifact, localizes an inflated median to its own window.
    // NoiseProbe serializes probes on a JVM lock, so two pool workers
    // never measure each other's probe; a co-running CHILD counts as
    // load by design (that is the signal).
    val unitProbes = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // Graceful degradation (r15 verdict #2; the r13/r15 rc-124 failure
    // class): per-unit results land here as units finish and the one-line
    // artifact file is REWRITTEN incrementally, so a run killed mid-pool
    // still ships per-query numbers for everything that completed, with
    // the rest in an explicit "skipped" list. A shutdown hook prints the
    // partial line to stdout for the driver's tail parser (SIGTERM
    // arrives before the timeout wrapper's SIGKILL), and an internal soft
    // deadline stops LAUNCHING new units so a slow run finishes inside
    // the budget instead of dying mid-unit with nothing.
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Map[String, Double]]()
    val deadlineSkipped = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "900").toDouble
    // Deadline-aware REP shedding (r17 verdict #1a): the r17 official run
    // kept all 81 heavies but deadline-skipped 186 lights because
    // whole-unit skipping was the only pressure valve — and the 836 s
    // best-case wall sits 7% under the 900 s deadline while same-code
    // walls span 711–960 s in the box's host-contention windows
    // (SOAK_ADJUDICATION round17 bench_host_noise). Once elapsed wall
    // passes shedFrac of the deadline, remaining HEAVY units launch at
    // 1 rep with no warm rep — each is ~half its 2-rep cost — and their
    // queries are listed in the artifact's "reps_shed" so adjudication
    // knows the basis. Shedding reps keeps every row in the artifact;
    // the unit skip below stays as the final backstop.
    val shedFrac =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHED_FRAC", "0.6").toDouble
    val repsShed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val emitLock = new Object
    // live children, killed by the shutdown hook AFTER the partial emit —
    // orphaned child JVMs would otherwise keep burning the box (and
    // contend with whatever the driver runs next) for minutes after the
    // parent is gone
    val procs = new java.util.concurrent.ConcurrentHashMap[Int, Process]()

    def writeOccupancy(): Unit = {
      import scala.jdk.CollectionConverters._
      // open spans (NaN end) take "now" as a provisional end for overlap
      // math and are flagged, so partial runs still adjudicate
      val now = nowSec
      val unitSpans = spans.asScala.toSeq.sortBy(_._1).map { case (i, (s0, s1)) =>
        (i, s0, if (s1.isNaN) now else s1, s1.isNaN)
      }
      val occ = unitSpans.map { case (i, s0, s1, open) =>
        val co = unitSpans.filter { case (j, t0a, t1a, _) =>
          j != i && math.min(s1, t1a) - math.max(s0, t0a) > 0.1
        }.map { case (j, t0a, t1a, _) =>
          val ov = math.min(s1, t1a) - math.max(s0, t0a)
          s"""{"unit":$j,"queries":"${units(j).mkString(",")}","overlap_sec":${f"$ov%.1f"}}"""
        }.mkString("[", ",", "]")
        val probe = Option(unitProbes.get(i)).getOrElse("null")
        s"""{"unit":$i,"queries":"${units(i).mkString(",")}","start_sec":${f"${s0}%.1f"},""" +
          s""""end_sec":${f"${s1}%.1f"},"open":$open,"probe":$probe,"co_ran":$co}"""
      }.mkString("[", ",", "]")
      writeAtomic(
        Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OCC", "BENCH_OCCUPANCY.json")),
        s"""{"par":$par,"child_threads":$childCpus,"child_xmx":"$xmx",""" +
          s""""note":"per-unit pool occupancy for adjudicating pooled medians (r14 verdict #1): each record lists the units co-running during its window; open=true means the unit was still running when this was written","units":$occ}""")
    }

    /** Assemble the artifact from whatever has finished: completed units
      * contribute per-query seconds (a query a finished child did not
      * report is an error, -1), unfinished units go to `skipped`.
      */
    def writeArtifacts(toStdout: Boolean): Unit = emitLock.synchronized {
      if (emitted.get()) return
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val errors = scala.collection.mutable.ArrayBuffer.empty[String]
      val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
      // deadline-skipped units are a SUBLIST of skipped: their absence is
      // a deliberate soft-deadline decision, not a mid-run kill — the
      // artifact says which (r16 advice: the set was otherwise dead state)
      val skippedDeadline = scala.collection.mutable.ArrayBuffer.empty[String]
      units.zipWithIndex.foreach { case (unit, i) =>
        Option(done.get(i)) match {
          case Some(measured) =>
            unit.foreach { n =>
              val t = measured.getOrElse(n, -1.0)
              if (t < 0) { results(n) = -1.0; errors += n }
              else results(n) = t
            }
          case None =>
            skipped ++= unit
            if (deadlineSkipped.contains(i)) skippedDeadline ++= unit
        }
      }
      writeOccupancy()
      // extra artifact fields owned by the parent path: the rep-shed tags
      // and the pre/post host-noise control (absent fields = not yet run)
      val shedList = repsShed.asScala.toSeq.sorted
        .map(n => s"\"$n\"").mkString("[", ",", "]")
      val noise = (noisePre, noisePost) match {
        case (Some(a), Some(b)) => s"""{"pre":$a,"post":$b}"""
        case (Some(a), None) => s"""{"pre":$a}"""
        case _ => "{}"
      }
      val extra = s""","reps_shed":$shedList,"noise_control":$noise"""
      emit(results.toSeq, errors.toSeq, skipped.toSeq, skippedDeadline.toSeq,
        toStdout, extra)
      if (toStdout) emitted.set(true)
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      writeArtifacts(true)
      procs.values.forEach(p => { p.destroy(); () })
    }))

    def runUnit(unit: Seq[String], i: Int): Unit = try {
      if (nowSec > deadlineSec) {
        deadlineSkipped.add(i)
        System.err.println(s"[bench] unit ${i + 1}/${units.size} SKIPPED: " +
          f"past soft deadline ($nowSec%.0f > $deadlineSec%.0f s)")
        writeArtifacts(toStdout = false)
        return
      }
      val part = partsDir.resolve(s"part_$i.txt")
      val cmd = (Seq(javaBin) ++ opens ++ Seq(xmx,
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_PART", part.toString)
      pb.environment().put("SPARK_GRAFT_ONLY", unit.mkString(","))
      pb.environment().put("SPARK_GRAFT_CPUS", childCpus.toString)
      // deadline budget at launch (r18 advice #4): the child's adaptive
      // third rep is gated on this so a high-spread heavy launched just
      // under the shed threshold cannot add an unbudgeted rep past the
      // soft deadline — the exact pressure the shed valve relieves
      pb.environment().put("SPARK_GRAFT_BENCH_BUDGET_LEFT_SEC",
        f"${math.max(0.0, deadlineSec - nowSec)}%.0f")
      // light chunks get the untimed warm pass; keyed on what the unit IS
      // (built from the light buffer), not its size — a trailing light
      // chunk of exactly one query must warm like the rest of the light
      // baseline or its median reads cold (r12 advice)
      if (!unit.exists(Heavy)) pb.environment().put("SPARK_GRAFT_BENCH_LIGHT", "1")
      else {
        // pace check against the soft deadline: shed this unit's reps?
        val shed = nowSec > deadlineSec * shedFrac
        if (shed) {
          unit.foreach(repsShed.add)
          System.err.println(s"[bench] unit ${i + 1}/${units.size} " +
            f"REPS SHED to 1 (pace: $nowSec%.0f > $shedFrac%.2f x $deadlineSec%.0f s)")
        }
        pb.environment().put("SPARK_GRAFT_REPS",
          // heavy units run 2 reps since r16 (center of 2 = their mean)
          // unless the caller pinned a count: multi-second medians are
          // stable within ~5% and the third rep was ~850s of pool-busy
          // time — the difference between fitting the driver budget with
          // margin and dying at its timeout (r15 verdict #1). Light chunks
          // keep 3 reps: sub-second queries carry the JIT/GC jitter that
          // made single-shot deltas unadjudicable in the first place.
          // Under deadline pressure (shed) the count drops to 1.
          if (shed) "1" else sys.env.getOrElse("SPARK_GRAFT_REPS", "2"))
        // Heavy stream_* replay units get one UNTIMED warm rep since r17
        // (r16 verdict #2): their cold first rep carries the streaming
        // state-store + foreachBatch codegen setup — the r17 A/B
        // (BENCH_CALIBRATION.json) measured rep1 ≈ 1.5–2x rep2/rep3 for
        // the maintain twins, so the 2-rep MEAN charged ~25–50% of pure
        // first-run setup into every center where the old median-of-3
        // discarded it. Batch heavies stay unwarmed: their rep1/rep2
        // spread is ~5% and a warm rep would re-add most of the ~850 s
        // the r16 rep cut saved. A shed unit skips the warm rep too —
        // its single rep reads cold, which the reps_shed tag discloses.
        if (!shed && unit.forall(_.startsWith("stream_")))
          pb.environment().put("SPARK_GRAFT_BENCH_WARM", "1")
      }
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      System.err.println(s"[bench] unit ${i + 1}/${units.size}: ${unit.mkString(",")}")
      val u0 = nowSec
      spans.put(i, (u0, Double.NaN))
      val proc = pb.start()
      procs.put(i, proc)
      val rc = try proc.waitFor() finally { procs.remove(i); () }
      spans.put(i, (u0, nowSec))
      // localize mid-run noise windows: ~100 ms probe per completed unit
      unitProbes.put(i, NoiseProbe.mini(partsDir).json)
      // The part file is written once, after ALL the unit's measurements:
      // its presence means the child finished measuring, so trust it even
      // if the JVM's shutdown then returned nonzero. No part file (or a
      // per-query -1 inside it) → the query errors.
      val measured: Map[String, Double] =
        if (Files.exists(part))
          Files.readAllLines(part).asScala.flatMap { line =>
            line.split("\t") match {
              case Array(n, t) => Some(n -> t.toDouble)
              case _ => None
            }
          }.toMap
        else Map.empty
      if (rc != 0) System.err.println(s"[bench] unit ${i + 1} exited rc=$rc")
      done.put(i, measured)
      writeArtifacts(toStdout = false)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] unit ${unit.mkString(",")} crashed: ${e.getMessage}")
        done.put(i, Map.empty[String, Double])
        writeArtifacts(toStdout = false)
    }
    // Two work queues drained by `par` hand-rolled workers (r17 verdict
    // #1b). Heavies stay launched ahead of lights (r16 verdict #3: a
    // deadline-degraded run must keep the adjudication-relevant heavy
    // rows), BUT one lane is RESERVED light-first when the pool has >= 2
    // lanes: the ~10 light chunks are ~150 s of busy total, so they
    // complete early in their own lane and full coverage never depends
    // on the heavy tail finishing — the r17 failure shed 186 lights
    // that the heavies' 800+ s tail starved behind the deadline. Each
    // worker falls back to the other queue when its own drains, so no
    // lane ever idles. Unit boundaries and the artifact layout are
    // UNCHANGED (writeArtifacts walks `units` in fixed sorted order);
    // only the launch order moves. Queues are filled in sorted-index
    // order, so heavies keep their sorted order among themselves, as do
    // light chunks. With par=1 the single worker is heavy-first — the
    // reserved lane only exists when there is a pool to reserve from.
    val heavyQ = new java.util.concurrent.ConcurrentLinkedQueue[(Seq[String], Int)]()
    val lightQ = new java.util.concurrent.ConcurrentLinkedQueue[(Seq[String], Int)]()
    units.zipWithIndex.foreach { case (u, i) =>
      if (u.exists(Heavy)) heavyQ.add((u, i)) else lightQ.add((u, i)); ()
    }
    def worker(lightFirst: Boolean): Thread = {
      val t = new Thread(() => {
        var more = true
        while (more) {
          val item =
            if (lightFirst) Option(lightQ.poll()).orElse(Option(heavyQ.poll()))
            else Option(heavyQ.poll()).orElse(Option(lightQ.poll()))
          item match {
            case Some((u, i)) => runUnit(u, i)
            case None => more = false
          }
        }
      })
      t.setDaemon(false)
      t
    }
    val workers = (0 until par).map(w => worker(lightFirst = par >= 2 && w == 0))
    workers.foreach(_.start())
    workers.foreach(_.join())
    noisePost = Some(NoiseProbe.full(partsDir).json)
    writeArtifacts(toStdout = true)
  }

  // Host-noise control embedded in the artifact (r17 verdict #5): the r17
  // adjudication of the box's ~15-min contention windows (same-code
  // pooled walls 711–960 s) leaned on ad-hoc same-session singleton
  // re-runs. The fixed CPU+disk probe ([[graft.NoiseProbe]], shared with
  // the soak writers since r19) runs BEFORE unit 0 and AFTER the last
  // unit, giving every future run its own inflation evidence: flat
  // pre/post probes + inflated medians = host window, not code. Since
  // r19 a ~100 ms mini probe also runs after EVERY unit (recorded in
  // BENCH_OCCUPANCY.json) so a window that opens and closes mid-run is
  // localized to the units it hit.
  @volatile private var noisePre: Option[String] = None
  @volatile private var noisePost: Option[String] = None

  // JVM start, for the child's adaptive-rep budget gate
  private val jvmStart = System.nanoTime()

  // ----------------------------------------------------------------- child
  /** One short-lived JVM: measure only SPARK_GRAFT_ONLY, write
    * name\tseconds lines (−1 on failure) to SPARK_GRAFT_BENCH_PART.
    */
  private def child(): Unit = {
    val part = Paths.get(sys.env("SPARK_GRAFT_BENCH_PART"))
    val spark = session()
    val names = orderedNames()
    val (results, _) = measure(spark, names,
      isLight = sys.env.get("SPARK_GRAFT_BENCH_LIGHT").contains("1"),
      // heavy stream_* singletons: one untimed warm rep (see parent)
      warmNames =
        if (sys.env.get("SPARK_GRAFT_BENCH_WARM").contains("1")) names
        else Seq.empty)
    Files.writeString(part,
      results.map { case (n, t) => s"$n\t$t" }.mkString("", "\n", "\n"))
    spark.stop()
  }

  /** Old single-JVM path, kept for fast local iteration. Warm pass covers
    * only the NON-heavy names (r13 advice: `isLight` on a mixed list ran
    * multi-second heavies twice, roughly doubling their wall clock here;
    * the subprocess path never mixes because heavies are singleton units).
    */
  private def inproc(): Unit = {
    val spark = session()
    val names = orderedNames()
    val (results, errors) = measure(spark, names, isLight = false,
      warmNames = names.filterNot(Heavy))
    emit(results, errors, Seq.empty, Seq.empty, toStdout = true)
    spark.stop()
  }

  // ---------------------------------------------------------------- shared
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // keep the nanos-long flavor working if the testdata reverts;
      // TsCompat handles whichever flavor surfaces
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so the first timed query doesn't
    // absorb ~3s of JIT + session start (measured: first-in-map penalty).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark
  }

  private def measure(spark: SparkSession, names: Seq[String],
                      isLight: Boolean,
                      warmNames: Seq[String] = Seq.empty)
      : (Seq[(String, Double)], Seq[String]) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Drop every cache between reps so each timing measures ONLY its own
    // query (within-JVM hygiene; cross-query isolation is the parent's
    // one-JVM-per-unit job).
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // Median of `reps` runs (default 3): single-shot timings carry JIT/GC
    // jitter that made round-over-round sub-second deltas unadjudicable.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Round-12 instrument fix (r11 task #4): a fresh 10-light-query JVM
    // never reaches the JIT steady state a long shared session had, which
    // charged sub-second queries ~0.3 s of warmup (cohort_retention
    // 0.39 → 0.72 s class) — per-query medians can't absorb it because
    // every rep runs in the same young JVM. So light chunks first run
    // the WHOLE unit once untimed: C2 + codegen + parquet reader warm on
    // exactly the shapes about to be measured, then the timed reps see a
    // warmed JVM. Heavy units (singleton) skip the pass: their
    // multi-second runtimes dwarf warmup and an extra execution would
    // double the bench's wall clock. Gated on WHAT the unit is (the
    // parent's isLight flag), not its size — a trailing light chunk of
    // exactly one query warms like the rest of the light baseline
    // (r12 advice: names.size>1 measured such a chunk cold).
    val toWarm = if (isLight) names else warmNames
    toWarm.foreach { n =>
      try { SparkEntry.queries(n)(spark, sfDir).count(); () }
      catch { case _: Throwable => () } // failures surface in the timed pass
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var rep = 0
      while (rep < reps && !failed) {
        isolate()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          times += t
          // per-rep trace: lets cold-vs-warm spreads be adjudicated from
          // a run's stderr without re-instrumenting (r16 verdict #2)
          if (t >= 1.0) System.err.println(f"[bench] $name rep${rep + 1} $t%.2fs")
        }
        catch {
          case e: Throwable =>
            failed = true
            errors += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        rep += 1
      }
      // Adaptive third rep for high-spread heavies (r17 verdict #4): this
      // box does not retain page cache between child JVMs, so a batch
      // heavy's rep1 occasionally lands 2-4x its steady state
      // (fourclique_counts: 41.5/20.8 s reps, one 89 s GC/IO stall in the
      // r17 calibration traces) and the 2-rep mean swings the official
      // total by minutes. When the 2 reps disagree by more than 1.5x, one
      // extra rep buys a median-of-3 that discards the outlier. Bounded
      // cost: only high-spread units pay it (~2-3 per run), and shed
      // (reps=1) or light units never enter here.
      if (!failed && !isLight && reps == 2 && times.size == 2 &&
          times.max / math.max(times.min, 1e-9) > 1.5) {
        // budget gate (r18 advice #4): the parent passes the deadline
        // budget that remained at launch; if this child has already
        // burned most of it, an extra rep (~times.max) would overrun the
        // soft deadline the shed valve protects — keep the 2-rep center
        val budgetLeft = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_LEFT_SEC")
          .flatMap(s => scala.util.Try(s.toDouble).toOption)
        val childElapsed = (System.nanoTime() - jvmStart) / 1e9
        val allowed = budgetLeft.forall(b => b - childElapsed > 1.5 * times.max)
        if (!allowed)
          System.err.println(f"[bench] $name adaptive rep3 SKIPPED " +
            f"(budget: ${budgetLeft.getOrElse(-1.0)}%.0fs at launch, " +
            f"$childElapsed%.0fs elapsed, rep ~${times.max}%.0fs)")
        else {
        isolate()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          times += t
          System.err.println(f"[bench] $name rep3(adaptive) $t%.2fs " +
            f"(spread ${times(0)}%.2f/${times(1)}%.2f exceeded 1.5x)")
        } catch {
          case e: Throwable =>
            // the 2 completed reps stand; an adaptive-rep failure (OOM
            // flake) must not turn a measured query into an error
            System.err.println(s"[bench] $name adaptive rep3 failed " +
              s"(keeping 2-rep center): ${e.getMessage}")
        }
        }
      }
      // true median (mean of the middle two for even rep counts — the
      // upper-middle alone would report the WORSE of 2 reps)
      name -> (if (failed) -1.0 else {
        val s = times.sorted
        (s(s.size / 2) + s((s.size - 1) / 2)) / 2
      })
    }
    (results, errors.toSeq)
  }

  /** Atomic file write: temp file in the same directory + ATOMIC_MOVE, so
    * a SIGKILL (the driver timeout's follow-up to SIGTERM) landing
    * mid-write can never leave a truncated/unparseable artifact — the
    * exact 'parsed: null' failure mode the incremental rewrite exists to
    * prevent (r16 advice).
    */
  private def writeAtomic(path: Path, content: String): Unit = {
    val abs = path.toAbsolutePath
    val tmp = Files.createTempFile(abs.getParent, abs.getFileName.toString, ".tmp")
    // a write failure (disk full) or a SIGKILL landing mid-write must not
    // strand *.tmp clutter next to the artifact across degraded runs
    // (r17 advice): delete on failure, and register deleteOnExit for the
    // kill case (a no-op after a successful move)
    tmp.toFile.deleteOnExit()
    try {
      Files.writeString(tmp, content)
      Files.move(tmp, abs, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
  }

  /** Render + land the artifact. `toStdout = false` (incremental update
    * after each unit) writes only the file; the final pass and the
    * shutdown hook print the one-line contract too. `skipped` lists
    * queries whose unit never ran (deadline/kill) — distinct from
    * `errors`, whose unit RAN and failed; `skippedDeadline` is the
    * subset of `skipped` whose unit the soft deadline declined to launch.
    */
  private def emit(results: Seq[(String, Double)], errors: Seq[String],
                   skipped: Seq[String], skippedDeadline: Seq[String],
                   toStdout: Boolean, extra: String = ""): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map(n => s"\"$n\"").mkString("[", ",", "]")
    val skip = skipped.map(n => s"\"$n\"").mkString("[", ",", "]")
    val skipDl = skippedDeadline.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Round-11 instrument change: per-unit JVM isolation (above). Numbers
    // from this round onward are NOT comparable to r<=10 totals measured in
    // one shared JVM — the shared session inflated late heavies up to 6x.
    val note = "isolation: one JVM per heavy query (every query measured " +
      ">=2s at sf0.1 joins the set as it lands), light queries chunked " +
      "per JVM (20 since r16, 10 in r11-r15), " +
      "fixed sorted order, median of reps; since r12 each light chunk runs " +
      "one UNTIMED warm pass of its own queries before timing (r11 charged " +
      "sub-second queries ~0.3s of young-JVM JIT - cohort_retention " +
      "0.39->0.72s class; r12 medians are the comparable baseline for " +
      "light queries going forward; r13 keys the warm pass on unit KIND so " +
      "a trailing single-query light chunk warms too). Heavy singleton " +
      "units are unchanged and comparable to r11. r<=10 totals (shared " +
      "JVM, fewer queries) are not comparable. r14: units now run " +
      "CONCURRENTLY (4-way pool; the inherited thread budget splits " +
      "deterministically, so 4 children x local[CPUS/4] exactly " +
      "subscribe the box) because 91+ sequential JVM startups timed out " +
      "the r13 driver budget; heavy medians therefore run on a quarter " +
      "of the r11-r13 threads - apply the per-query thread-slice ratios " +
      "in BENCH_CALIBRATION.json (same-session sequential/32-thread vs " +
      "4-way/8-thread on 6 heavies) before adjudicating r14 medians " +
      "against r12/r13. r15: BENCH_CALIBRATION.json covers EVERY heavy " +
      "unit (same-session sequential-local[32] vs 4-way-local[8]), and " +
      "the parent writes BENCH_OCCUPANCY.json - per-unit wall windows " +
      "plus every co-running unit - so each official median carries its " +
      "co-runner mix. r16: pool default 8 (children local[CPUS/8]; r15's " +
      "4-way pool saturated at ~970s wall and the driver timeout killed " +
      "the whole artifact), light chunks 20/JVM, heavy units 2 reps " +
      "(center = mean of the 2; lights keep 3 reps — sub-second queries " +
      "carry the JIT/GC jitter the rep count exists for), calibration " +
      "legs re-based for the 8-way/2-rep config; the artifact file is rewritten " +
      "incrementally after every unit and a SIGTERM hook / soft deadline " +
      "emits completed queries plus an explicit skipped list instead of " +
      "dying empty. r17: child heap PINNED to 8g (env " +
      "SPARK_GRAFT_CHILD_XMX) instead of inherited - the driver's " +
      "-Xmx89g parent made the RAM clamp collapse the r16 pool to par=1 " +
      "and skip 164 queries; 8g is the config every committed median and " +
      "calibration leg already used. Heavy units are now SUBMITTED " +
      "before light chunks (artifact order unchanged) so a degraded run " +
      "keeps the adjudication-relevant heavies; heavy stream_* replay " +
      "units get one untimed warm rep (their cold first rep carried " +
      "1.4-1.6x of state-store+codegen setup that the 2-rep mean charged " +
      "half-weight - per-rep A/B in SOAK_ADJUDICATION.json round17), so " +
      "their medians read steady-state like the light baseline. r18: " +
      "deadline pressure now sheds REPS before queries - once elapsed " +
      "wall passes SHED_FRAC (0.6) of the soft deadline, remaining heavy " +
      "units run 1 cold rep (no warm) and are listed in reps_shed; one " +
      "pool lane is reserved light-first (par>=2) so the ~10 light " +
      "chunks never starve behind the heavy tail; batch heavies whose 2 " +
      "reps disagree >1.5x get one adaptive third rep (median-of-3 " +
      "recenters fourclique-class cold-rep outliers); noise_control " +
      "embeds a fixed CPU+disk probe run before unit 0 and after the " +
      "last unit (flat probes + inflated medians = host window, not " +
      "code). r19: a ~100ms mini probe also runs after EVERY unit " +
      "(recorded per-unit in BENCH_OCCUPANCY.json) so a mid-run noise " +
      "window is localized to the units it hit; the adaptive third rep " +
      "is gated on the deadline budget the parent passes at launch " +
      "(SPARK_GRAFT_BENCH_BUDGET_LEFT_SEC), so it can never overrun the " +
      "soft deadline the shed valve protects"
    // the full DECLARED heavy set (not filtered by SPARK_GRAFT_ONLY):
    // tools/build_calibration.py asserts its leg coverage against this
    // list, so the calibration invariant ("every heavy unit has legs",
    // r15) is self-enforcing instead of relying on someone remembering
    // to extend the legs when a query joins Heavy (r17 verdict #2)
    val heavyList = SparkEntry.queries.keys.toSeq.sorted.filter(Heavy)
      .map(n => s"\"$n\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"skipped":$skip,"skipped_deadline":$skipDl,"heavy":$heavyList$extra,"note":"$note","sf":"$sfDir"}"""
    if (toStdout) println(json)
    // stdout line-length is at the mercy of whatever logger wraps the JVM
    // (sbt's clips ~3 KB, which once truncated a 98-query map) — always
    // land the full artifact in a file too
    writeAtomic(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")),
      json)
    // …and END stdout with a SHORT self-sufficient summary record: a tail
    // capture of the last few KB then always contains at least one
    // complete parseable JSON line, with the worst queries — the
    // adjudication-relevant part — inlined.
    val worst = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    if (toStdout) println(
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},""" +
        s""""n_errors":${errors.size},"n_skipped":${skipped.size},"worst5":$worst,""" +
        s""""sf":"$sfDir","full":"bench_local.json"}""")
  }
}
