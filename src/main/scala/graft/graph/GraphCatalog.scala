package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

final class GraphNotFoundException(name: String)
  extends IllegalStateException(
    s"graph '$name' does not exist — add (op 1) before modify/read " +
      "(add-before-read rule, reference instructions.txt:18-20)")

final class GraphAlreadyExistsException(name: String)
  extends IllegalStateException(s"graph '$name' already exists — use modify (op 2)")

/** The engine's "database": named immutable graph snapshots as parquet edge
  * tables, replacing the reference's one-text-file-per-graph store plus its
  * `gnos[]` registration array (reference `primary_server.c:68-69,118-119`).
  *
  * Concurrency model: the reference guards each graph file with
  * readers-writers semaphores (`primary_server.c:138-153`,
  * `secondary_server.c:264-294`). Here snapshots are immutable parquet
  * directories and `modify` is an atomic overwrite — readers either see the
  * old snapshot or the new one, so no locks exist (SURVEY.md A9).
  *
  * At scale the base dir is any Hadoop-compatible FS (HDFS/S3); edge tables
  * are partitioned data, never driver-resident.
  */
final class GraphCatalog(spark: SparkSession, baseDir: String) {
  private def path(name: String): String = s"$baseDir/$name"

  private def hadoopExists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** op 1 — AddGraph (reference `primary_server.c:86-179`). */
  def add(name: String, edges: DataFrame): Unit = {
    if (hadoopExists(name)) throw new GraphAlreadyExistsException(name)
    edges.select("src", "dst").write.mode("errorifexists").parquet(path(name))
  }

  /** op 2 — ModifyGraph: wholesale replace, requires prior add
    * (reference `primary_server.c:121-135`, instructions.txt:18-20).
    */
  def modify(name: String, edges: DataFrame): Unit = {
    if (!hadoopExists(name)) throw new GraphNotFoundException(name)
    edges.select("src", "dst").write.mode("overwrite").parquet(path(name))
  }

  /** GraphScan (reference `secondary_server.c:272-286`). */
  def load(name: String): DataFrame = {
    if (!hadoopExists(name)) throw new GraphNotFoundException(name)
    spark.read.parquet(path(name))
  }

  def exists(name: String): Boolean = hadoopExists(name)

  def list(): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Terminate analogue (reference `cleanup (1).c`, SURVEY.md A10): drop all
    * registered graphs. Spark's own lifecycle handles in-flight actions.
    */
  def dropAll(): Unit = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.delete(base, true)
    ()
  }
}
