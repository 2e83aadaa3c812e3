package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution => V2Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.MatrixCodec

/** DataSource V2 connector for the reference's on-disk graph format
  * (`G<gno>.txt`: first line n, then an n×n matrix — reference
  * `primary_server.c:139-152` / `secondary_server.c:272-286`), so the
  * format is a FIRST-CLASS Spark source:
  *
  * {{{ spark.read.format("graft-matrix").load(dirOrFile) }}}
  * {{{ df.write.format("graft-matrix").save(dir)       // one G<id>.txt per graph_id }}}
  *
  * Schema: (graph_id STRING, src BIGINT, dst BIGINT) — graph_id from the
  * filename stem, edges per [[MatrixCodec.parseMatrixText]] (any nonzero
  * cell, 1-based ids). A directory load takes every `G*.txt` inside (the
  * reference's database layout); each file is one [[InputPartition]], so
  * a many-graph database scans file-parallel. Column pruning is pushed
  * down ([[SupportsPushDownRequiredColumns]]); the scan materializes only
  * the requested columns. Aggregation is pushed down too
  * ([[SupportsPushDownAggregates]]): count/min/max metadata queries —
  * optionally grouped by graph_id — are answered from one streaming pass
  * per file ([[MatrixCodec.aggregateMatrixText]]) shipping ONE summary row
  * per graph instead of the cells; the per-graph grouping is COMPLETE
  * pushdown (one file = one graph), so Spark plans no aggregate operator
  * and no shuffle at all. LIMIT and ORDER BY...LIMIT push down as well
  * (`SupportsPushDownLimit` / `SupportsPushDownTopN`, partial): the
  * per-file parse stops at the k-th edge — the row-major cell order is
  * (src, dst)-ascending, so first-k IS top-k for ascending prefix
  * orders — and Spark's retained global LIMIT/TopN merges the per-file
  * heads. All file IO goes through the Hadoop FileSystem
  * API, so the source loads from any supported filesystem (`file:`,
  * `hdfs:`, object stores with their connectors on the classpath), not
  * just the driver-local disk. Files in this format are ≤ KBs by
  * construction (the reference caps n at 30), so per-file parse cost is
  * trivial — parquet edge tables remain the at-scale path.
  */
class MatrixDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-matrix"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatrixDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-matrix needs a path")
    new MatrixTable(path)
  }
}

object MatrixDataSource {
  val Schema: StructType = new StructType()
    .add("graph_id", StringType, nullable = false)
    .add("src", LongType, nullable = false)
    .add("dst", LongType, nullable = false)

  /** A file stays itself; a directory expands to its `G*.txt` members
    * (sorted — deterministic partition order). Listing runs on the driver
    * through the Hadoop FileSystem resolved from the ACTIVE session's
    * Hadoop conf, exactly how Spark's own file sources list.
    */
  private[sources] def expand(path: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory) {
      fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.matches("G.*\\.txt"))
        .map(_.getPath.toString).sorted
    } else Seq(path)
  }

  /** Read a whole (KB-sized by format construction) matrix file through
    * the Hadoop FS API — runs on the EXECUTOR against the conf captured
    * from the DRIVER session (a [[org.apache.spark.util
    * .SerializableConfiguration]] shipped in the reader factory), so
    * `spark.hadoop.*` settings — object-store credentials, custom
    * filesystems — behave identically to the driver-side listing.
    */
  private[sources] def readFully(path: String,
      conf: org.apache.hadoop.conf.Configuration): String = {
    FilesRead.incrementAndGet()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= (16L << 20), s"matrix file $path is ${len}B; format caps files at KBs")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Test observability for the runtime-filter path: files actually opened
    * by readers. Meaningful in local mode (one JVM); on a cluster the
    * count is per-executor — use Spark's scan metrics there.
    */
  private[graft] val FilesRead = new java.util.concurrent.atomic.AtomicLong

  /** Filename stem = graph_id (the database layout contract). */
  private[sources] def stemOf(path: String): String = {
    val f = new org.apache.hadoop.fs.Path(path).getName
    if (f.endsWith(".txt")) f.dropRight(4) else f
  }
}

private[sources] class MatrixTable(path: String)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-matrix($path)"
  override def schema(): StructType = MatrixDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MatrixScanBuilder(MatrixDataSource.expand(path))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MatrixWriteBuilder(path, info)
}

/** V2 write: one matrix-text file per graph_id. The format needs WHOLE
  * graphs per writer, so [[MatrixWrite]] declares
  * [[RequiresDistributionAndOrdering]] — clustered by graph_id, sorted by
  * (graph_id, src, dst) — and Spark plans the shuffle+sort; each writer
  * then streams grouped, deterministically ordered rows and flushes one
  * file per graph boundary. That is the DSv2-native way to push a sink's
  * layout requirement INTO the planner rather than documenting it at the
  * call site. Truncate is a no-op (each graph file is overwritten
  * whole-file; stale graphs from previous writes are the caller's dir
  * hygiene, as with the reference's G*.txt database directory).
  */
private[sources] class MatrixWriteBuilder(path: String, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this
  override def build(): Write = new MatrixWrite(path, info.schema())
}

private[sources] class MatrixWrite(path: String, schema: StructType)
  extends Write with RequiresDistributionAndOrdering {
  require(MatrixDataSource.Schema.fieldNames.forall(schema.fieldNames.contains),
    s"graft-matrix write needs columns (graph_id, src, dst), got ${schema.simpleString}")
  override def requiredDistribution(): V2Distribution =
    Distributions.clustered(Array(Expressions.identity("graph_id")))
  override def requiredOrdering(): Array[V2SortOrder] = Array(
    Expressions.sort(Expressions.identity("graph_id"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("src"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("dst"), SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new MatrixBatchWrite(path, schema.fieldNames)
}

/** Staged two-phase commit, the FileOutputCommitter contract re-expressed
  * for the one-file-per-graph format: tasks write ONLY attempt-unique
  * temp files (`_tmp_<taskId>_G<id>.txt` — invisible to the scan's
  * `G*.txt` filter), final `G<id>.txt` names appear atomically at JOB
  * commit via rename on the driver. So a task dying mid-write leaves no
  * truncated final file; a failed/speculative attempt's abort deletes its
  * OWN temp files only (never a sibling's output — the paths differ by
  * taskId); and Spark's commit coordinator guarantees at most one
  * attempt's message per partition reaches `commit`, so exactly one
  * rename per graph wins. Leftover temps from hard-killed attempts are
  * swept at job commit/abort (concurrent jobs into one directory are not
  * a supported layout, same as the reference's G*.txt database dir).
  */
private[sources] class MatrixBatchWrite(path: String, fields: Array[String])
  extends BatchWrite {
  private val conf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    new MatrixWriterFactory(path, fields, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case MatrixFilesStaged(staged) => staged.foreach { case (gid, tmp) =>
        val src = new org.apache.hadoop.fs.Path(tmp)
        val dst = new org.apache.hadoop.fs.Path(path, s"$gid.txt")
        if (fs.exists(dst)) fs.delete(dst, false) // overwrite semantics
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"graft-matrix commit: rename $src -> $dst failed")
      }
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }
    sweepTemps()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case MatrixFilesStaged(staged) => staged.foreach { case (_, tmp) =>
        val p = new org.apache.hadoop.fs.Path(tmp)
        if (fs.exists(p)) fs.delete(p, false)
      }
      case _ => ()
    }
    sweepTemps()
  }

  /** Remove orphan temp files (attempts that died without running their
    * abort — executor crash, JVM kill). Every live temp of THIS job has
    * already been renamed (commit) or deleted (abort) by this point.
    */
  private def sweepTemps(): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dirPath)) fs.listStatus(dirPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(MatrixDataWriter.TmpPrefix))
      .foreach(st => fs.delete(st.getPath, false))
  }
}

private[sources] class MatrixWriterFactory(dir: String, fields: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MatrixDataWriter(dir, fields, taskId, conf)
}

/** Job-commit message: (graph_id, staged temp path) per graph this task
  * wrote — the driver renames each into its final `G<id>.txt` name.
  */
private[sources] case class MatrixFilesStaged(staged: Seq[(String, String)])
  extends WriterCommitMessage

private[sources] object MatrixDataWriter {
  val TmpPrefix = "_tmp_"
}

private[sources] class MatrixDataWriter(dir: String, fields: Array[String],
    taskId: Long, conf: org.apache.spark.util.SerializableConfiguration)
  extends DataWriter[InternalRow] {
  private val gi = fields.indexOf("graph_id")
  private val si = fields.indexOf("src")
  private val di = fields.indexOf("dst")
  private var gid: String = _
  private val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
  private val staged = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  // the dense text format is quadratic in n — refuse silly graphs rather
  // than writing gigabytes (the reference caps n at 30)
  private val MaxN = 4096L

  private def flush(): Unit = if (gid != null) {
    val n = edges.iterator.flatMap(e => Iterator(e._1, e._2)).max
    require(n <= MaxN, s"graph $gid has max vertex id $n; " +
      s"matrix text is n² cells and this sink caps n at $MaxN")
    // attempt-unique temp name: taskId differs across retries/speculative
    // attempts, so attempts never touch each other's files
    val out = new org.apache.hadoop.fs.Path(dir,
      s"${MatrixDataWriter.TmpPrefix}${taskId}_$gid.txt")
    val fs = out.getFileSystem(conf.value)
    val stream = fs.create(out, true)
    try stream.write(MatrixCodec.renderMatrixText(n.toInt, edges.toSeq)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally stream.close()
    staged += ((gid, out.toString))
    edges.clear()
  }

  override def write(row: InternalRow): Unit = {
    val g = row.getUTF8String(gi).toString
    if (g != gid) { flush(); gid = g }
    edges += ((row.getLong(si), row.getLong(di)))
  }
  override def commit(): WriterCommitMessage = {
    flush()
    MatrixFilesStaged(staged.toSeq)
  }
  override def abort(): Unit = {
    staged.foreach { case (_, tmp) =>
      val hp = new org.apache.hadoop.fs.Path(tmp)
      hp.getFileSystem(conf.value).delete(hp, false)
    }
  }
  override def close(): Unit = ()
}

/** Aggregate calls the matrix scan answers per-file from one streaming
  * pass over the text ([[MatrixCodec.aggregateMatrixText]]) — no edge-row
  * materialization. `CountCall` is valid for ANY source column (all three
  * are non-nullable by schema, so count(col) ≡ count(*) over edges);
  * min/max only for the numeric endpoints.
  */
private[sources] sealed trait MatrixAggCall
private[sources] case object CountStarCall extends MatrixAggCall
private[sources] case class CountCall(col: String) extends MatrixAggCall
private[sources] case class MinCall(col: String) extends MatrixAggCall
private[sources] case class MaxCall(col: String) extends MatrixAggCall

private[sources] class MatrixScanBuilder(paths: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var required: StructType = MatrixDataSource.Schema
  private var pushed: Option[(Boolean, Seq[MatrixAggCall])] = None
  private var limit: Option[Int] = None
  private var topNOrder: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def colName(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  /** PARTIAL limit pushdown (`isPartiallyPushed = true`, so Spark keeps
    * its global LIMIT operator): each file emits at most `limit` rows —
    * the per-file parse stops at the k-th edge
    * ([[MatrixCodec.parseMatrixTextLimited]]) instead of decoding all n²
    * cells, which is the whole cost of a `scan LIMIT k` metadata probe
    * over a many-graph database dir. Not combined with a pushed
    * aggregate (the agg scan already ships one row per file).
    */
  override def pushLimit(l: Int): Boolean =
    if (pushed.isDefined || l < 0) false
    else { limit = Some(l); true }

  override def isPartiallyPushed(): Boolean = true

  /** PARTIAL top-N pushdown: the matrix text stores the adjacency
    * row-major, so the per-file parse order IS (src ASC, dst ASC) — and
    * graph_id is constant within a file — so ANY sort order that is a
    * prefix-chain of (graph_id ASC, src ASC, dst ASC) (with or without
    * the leading graph_id) is already satisfied per file, and the first
    * k parsed edges ARE that file's top k. Spark keeps the final cross-
    * file TopN (partial pushdown); the scan's job is only to never
    * decode more than k edges per file. Descending or unknown orders are
    * refused — Spark then plans the full sort itself (refusal is never a
    * correctness risk).
    */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean = {
    val names = orders.toSeq.map { o =>
      if (o.direction() != SortDirection.ASCENDING) None else colName(o.expression())
    }
    val resolved = if (names.exists(_.isEmpty)) None
      else Some(names.map(_.get))
    val ok = resolved.exists { ns =>
      val chain = if (ns.headOption.contains("graph_id"))
        Seq("graph_id", "src", "dst") else Seq("src", "dst")
      ns.nonEmpty && ns == chain.take(ns.length)
    }
    if (!ok || pushed.isDefined || l < 0) false
    else { limit = Some(l); topNOrder = resolved.map(_.mkString(", ")); true }
  }

  private def translate(f: AggregateFunc): Option[MatrixAggCall] = f match {
    case _: CountStar => Some(CountStarCall)
    case c: Count if !c.isDistinct =>
      colName(c.column)
        .filter(MatrixDataSource.Schema.fieldNames.contains(_))
        .map(CountCall)
    case m: Min =>
      colName(m.column).filter(c => c == "src" || c == "dst").map(MinCall)
    case m: Max =>
      colName(m.column).filter(c => c == "src" || c == "dst").map(MaxCall)
    case _ => None
  }

  /** (groupedByGraphId, calls) when the whole Aggregation is answerable
    * per-file; None → Spark falls back to the row scan.
    */
  private def translateAll(agg: Aggregation): Option[(Boolean, Seq[MatrixAggCall])] = {
    val gb = agg.groupByExpressions
    val byGid = gb.length == 1 && colName(gb(0)).contains("graph_id")
    if (!(gb.isEmpty || byGid)) None
    else {
      val calls = agg.aggregateExpressions.map(translate)
      if (calls.isEmpty || calls.exists(_.isEmpty)) None
      else Some((byGid, calls.map(_.get).toSeq))
    }
  }

  /** Grouping by graph_id is COMPLETE pushdown: one file = one graph (the
    * database layout — filename stems are unique in a dir), so the union
    * of per-file summary rows IS the final grouped result and Spark plans
    * NO aggregate operator and NO shuffle at all. Global aggregation is
    * PARTIAL (one summary row per file; Spark's final agg merges).
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAll(agg).exists(_._1)

  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translateAll(agg)
    t.foreach(p => pushed = Some(p))
    t.isDefined
  }

  override def build(): Scan = pushed match {
    case Some((byGid, calls)) => new MatrixAggScan(paths, byGid, calls)
    case None => new MatrixScan(paths, required, limit, topNOrder)
  }
}

/** Aggregate-pushdown scan: per file, ONE summary row — (graph_id?) ++ one
  * column per pushed call, positionally matching the Aggregation Spark
  * pushed (group-by columns first, the DSv2 contract). A file with zero
  * edges yields NO row under group-by (no edge rows → no group, matching
  * SQL semantics over the edge relation) but DOES yield its zero-count row
  * for global aggregation, so Spark's final merge over a mixed directory
  * still counts 0 + n correctly.
  */
private[sources] class MatrixAggScan(paths: Seq[String], byGid: Boolean,
                                     calls: Seq[MatrixAggCall])
  extends Scan with Batch {
  override def readSchema(): StructType = {
    val base =
      if (byGid) new StructType().add("graph_id", StringType, nullable = false)
      else new StructType()
    calls.zipWithIndex.foldLeft(base) { case (st, (c, i)) =>
      c match {
        case CountStarCall => st.add(s"agg_$i", LongType, nullable = false)
        case CountCall(_)  => st.add(s"agg_$i", LongType, nullable = false)
        case MinCall(_)    => st.add(s"agg_$i", LongType, nullable = true)
        case MaxCall(_)    => st.add(s"agg_$i", LongType, nullable = true)
      }
    }
  }
  override def description(): String = {
    val aggStr = calls.map {
      case CountStarCall => "COUNT(*)"
      case CountCall(c)  => s"COUNT($c)"
      case MinCall(c)    => s"MIN($c)"
      case MaxCall(c)    => s"MAX($c)"
    }.mkString(", ")
    val gbStr = if (byGid) "graph_id" else ""
    s"graft-matrix PushedAggregates: [$aggStr], PushedGroupBy: [$gbStr]"
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(MatrixFilePartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new MatrixAggReaderFactory(byGid, calls,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] class MatrixAggReaderFactory(byGid: Boolean,
    calls: Seq[MatrixAggCall],
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[MatrixFilePartition].path
    val a = MatrixCodec.aggregateMatrixText(
      MatrixDataSource.readFully(path, conf.value))
    val stem = {
      val f = new org.apache.hadoop.fs.Path(path).getName
      if (f.endsWith(".txt")) f.dropRight(4) else f
    }
    def endpoint(col: String, min: Boolean): Any = {
      val o = (col, min) match {
        case ("src", true)  => a.minSrc
        case ("src", false) => a.maxSrc
        case ("dst", true)  => a.minDst
        case ("dst", false) => a.maxDst
        case other => throw new IllegalArgumentException(s"bad endpoint $other")
      }
      o.map(Long.box).orNull
    }
    val row: Option[InternalRow] =
      if (byGid && a.edgeCount == 0) None
      else {
        val aggVals = calls.map {
          case CountStarCall => a.edgeCount
          case CountCall(_)  => a.edgeCount // all source columns non-null
          case MinCall(c)    => endpoint(c, min = true)
          case MaxCall(c)    => endpoint(c, min = false)
        }
        val lead = if (byGid) Seq(UTF8String.fromString(stem)) else Nil
        Some(InternalRow.fromSeq(lead ++ aggVals))
      }
    val it = row.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = it.next(); true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Row scan with RUNTIME file pruning ([[org.apache.spark.sql.connector
  * .read.SupportsRuntimeFiltering]]): `graph_id` is declared filterable,
  * so a join whose other side resolves at runtime (dynamic partition
  * pruning: the broadcast side's distinct graph_ids arrive as an
  * `In`/`EqualTo` filter before `planInputPartitions`) drops whole FILES
  * from the scan — one file = one graph, so pruning on graph_id is
  * file-exact and the dropped graphs are never opened, parsed, or
  * shuffled. An unsupported runtime predicate leaves the path list
  * intact (pruning is an optimization, never a correctness dependency).
  */
private[sources] class MatrixScan(paths: Seq[String], required: StructType,
                                  limit: Option[Int] = None,
                                  topNOrder: Option[String] = None)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  private var activePaths: Seq[String] = paths
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("graph_id"))
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    filters.foreach {
      case org.apache.spark.sql.sources.In("graph_id", vs) =>
        val keep = vs.map(String.valueOf).toSet
        activePaths = activePaths.filter(p => keep.contains(MatrixDataSource.stemOf(p)))
      case org.apache.spark.sql.sources.EqualTo("graph_id", v) =>
        activePaths = activePaths.filter(p => MatrixDataSource.stemOf(p) == String.valueOf(v))
      case _ => ()
    }
  override def readSchema(): StructType = required
  override def description(): String = {
    // surfaced in .explain so plans can pin the pushdown (PlanSpec /
    // MatrixSourceSpec pattern, like PushedAggregates above)
    val lim = limit.map(l => topNOrder match {
      case Some(o) => s", PushedTopN: [ORDER BY $o LIMIT $l (partial)]"
      case None => s", PushedLimit: [$l (partial)]"
    }).getOrElse("")
    s"graft-matrix ReadSchema: ${required.simpleString}$lim"
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    activePaths.map(MatrixFilePartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // capture the DRIVER session's Hadoop conf here (driver-side call) so
    // executor-side reads resolve filesystems with the same spark.hadoop.*
    // settings the listing used
    new MatrixReaderFactory(required.fieldNames, limit,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class MatrixFilePartition(path: String) extends InputPartition

private[sources] class MatrixReaderFactory(columns: Array[String],
    limit: Option[Int],
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[MatrixFilePartition].path
    val text = MatrixDataSource.readFully(path, conf.value)
    // pushed limit/top-N: the parse stops at the k-th edge — the file's
    // cell order is (src, dst)-ascending, so these ARE its top k
    val edges = limit match {
      case Some(l) => MatrixCodec.parseMatrixTextLimited(text, l)
      case None => MatrixCodec.parseMatrixText(text)._2
    }
    val stem = {
      val f = new org.apache.hadoop.fs.Path(path).getName
      if (f.endsWith(".txt")) f.dropRight(4) else f
    }
    val gid = UTF8String.fromString(stem)
    val it = edges.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (s, d) = it.next()
        current = InternalRow.fromSeq(columns.toSeq.map {
          case "graph_id" => gid
          case "src" => s
          case "dst" => d
          case other => throw new IllegalArgumentException(s"unknown column $other")
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
