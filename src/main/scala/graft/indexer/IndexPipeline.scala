package graft.indexer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.merge.Merge
import graft.model._
import graft.enrich.Closure

/** The indexing pipeline (reference run_mutiprocess.py / run_index_single
  * .py restated Spark-first, SURVEY.md §3.1):
  *
  *   files --flatMap indexFile--> events --merge--> nodes/edges/locations
  *         --enrich (D1-D4)--> snapshot
  *
  * The reference fans out a subprocess per file and serializes every write
  * through one inter-process lock (its main bottleneck, SURVEY.md §4); here
  * per-file parsing is executor-parallel (C2 = partition parallelism) and
  * the merge is two shuffles (SURVEY.md §2.A), so ingest scales with the
  * cluster, not the lock.
  */
object IndexPipeline {

  final case class SourceFile(path: String, content: String)

  /** C1 — enumerate a source tree into (path, content) rows. `binaryFile`
    * gives distributed listing + streaming reads; paths are relativized to
    * `root` (A7, reference graphDB.py:155-174 does this post-hoc). */
  def readRepo(spark: SparkSession, root: String): Dataset[SourceFile] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.py")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("content"))
      .map { r =>
        val p = r.getString(0).stripPrefix("file:")
        val rel = p.stripPrefix(root.stripSuffix("/") + "/")
        SourceFile(rel, new String(r.getAs[Array[Byte]](1), "UTF-8"))
      }
  }

  final case class Indexed(
      nodes: DataFrame, edges: DataFrame, locations: DataFrame)

  /** C2/C4/C13 — index every file and merge the event stream into graph
    * tables. One wide flatMap (no shuffle) + the Merge shuffles. */
  def indexFiles(spark: SparkSession, files: Dataset[SourceFile],
      taskId: String): Indexed = {
    import spark.implicits._
    val events = files.flatMap { f =>
      val ev = PyIndexer.indexFile(taskId, f.path, f.content)
      Seq((ev.symbols, ev.edges, ev.locations))
    }.cache()
    val symbolEvents = events.flatMap(_._1)
    val edgeEvents = events.flatMap(_._2)
    val locations = events.flatMap(_._3)
    val nodes0 = Merge.mergeNodes(symbolEvents.toDF())
    val edges = Merge.mergeEdges(edgeEvents.toDF())
    val nodes = Merge.withStubs(nodes0, edges, taskId)
    Indexed(nodes, edges, locations.toDF())
  }

  /** D1-D4 — enrichment: propagate inherited methods over the INHERITS
    * closure as new HAS_METHOD edges (ast_manage.py:79-99). Import→CONTAINS
    * (D2) is covered by the indexer's import-resolved references; the
    * closure below is the fixpoint part. */
  def enrich(ix: Indexed, taskId: String): Indexed = {
    val inherits = ix.edges.filter(col("rel_type") === Rel.Inherits)
      .select(col("src"), col("dst"))
    val hasMethod = ix.edges.filter(col("rel_type") === Rel.HasMethod)
      .select(col("src"), col("dst"))
    val newEdges = Closure.inheritedMethods(inherits, hasMethod)
      .select(col("src"), lit(Rel.HasMethod).as("rel_type"), col("dst"),
        map(lit("inherited"), lit("true")).as("props"))
    Indexed(ix.nodes, ix.edges.unionByName(newEdges), ix.locations)
  }

  /** End-to-end: repo directory → enriched snapshot. */
  def run(spark: SparkSession, root: String, taskId: String): Indexed =
    enrich(indexFiles(spark, readRepo(spark, root), taskId), taskId)
}
