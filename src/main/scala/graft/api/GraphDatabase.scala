package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.indexer.IndexPipeline
import graft.merge.Merge
import graft.model._
import graft.ops.GraphOps
import graft.store.Snapshot
import graft.store.Snapshot.GraphSnapshot

/** The reference's `GraphDatabaseHandler` surface (graphDB.py), re-shaped
  * for batch semantics: reads are DataFrame combinators over the current
  * snapshot; writes accumulate into a staged batch that `commit()` merges
  * set-oriented and persists atomically (the per-event upsert round-trip
  * was the reference's bottleneck — SURVEY.md §4 anti-pattern row).
  *
  * A reference workflow translates 1:1:
  * {{{
  *   val db = GraphDatabase.open(spark, "/data/graph")
  *   db.addNode("t1", Kind.Class, "m.C", Map("name" -> "C"))
  *   db.addEdge("t1", "m.C", Rel.HasMethod, "m.C.f")
  *   db.commit()
  *   db.nodeByKey("m.C").show()
  *   db.indexRepo("/repo", "t2")               // run_mutiprocess.run
  *   db.updateVersion("t2", "t3", changed)     // update_version.py
  *   db.clearTaskData("t1")                    // A5 DETACH DELETE
  * }}}
  */
final class GraphDatabase private (
    val spark: SparkSession, dir: Option[String]) {
  import spark.implicits._

  @volatile private var snap: GraphSnapshot = GraphSnapshot(
    spark.emptyDataset[NodeRow].toDF()
      .withColumnRenamed("fullName", "full_name")
      .withColumnRenamed("filePath", "file_path")
      .select(col("full_name"),
        lit(Kind.None_).as("kind"), col("taskIds").as("task_ids"),
        col("name"), col("file_path"), col("signature"), col("clazz"),
        col("code"), col("props")).limit(0),
    spark.emptyDataset[EdgeRow].toDF()
      .select(col("src"), col("relType").as("rel_type"), col("dst"), col("props"))
      .limit(0),
    spark.emptyDataset[LocationRow].toDF().limit(0))

  dir.filter(d => new java.io.File(s"$d/nodes").exists())
    .foreach(d => snap = Snapshot.read(spark, d))

  // Staged per-call events accumulate on the DRIVER until commit() — this
  // mirrors the reference's per-call add_node/add_edge surface 1:1 and is
  // sized for that workload (interactive sessions, ~1e6 events ≈ a few
  // hundred MB). BULK ingest must not route through addNode loops: use
  // indexRepo / Merge.mergeNodes over a Dataset, which never materializes
  // events on the driver.
  private val stagedSymbols = scala.collection.mutable.ArrayBuffer.empty[SymbolEvent]
  private val stagedEdges = scala.collection.mutable.ArrayBuffer.empty[EdgeEvent]
  private var stageSeq = 0L

  def nodes: DataFrame = snap.nodes
  def edges: DataFrame = snap.edges
  def locations: DataFrame = snap.locations

  // ------------------------------------------------------------- write path

  /** A1/A3 — stage a node upsert (merged on commit). */
  def addNode(taskId: String, kind: String, fullName: String,
      props: Map[String, String] = Map.empty): Unit = synchronized {
    stageSeq += 1
    stagedSymbols += SymbolEvent(stageSeq, taskId, kind, fullName,
      props.getOrElse("name", fullName.split("\\.").last),
      props.get("file_path"), props.get("signature"), props.get("class"),
      props.get("code"),
      props -- Seq("name", "file_path", "signature", "class", "code"))
  }

  /** A4 — stage an edge upsert; endpoints stub on commit if unknown. */
  def addEdge(taskId: String, src: String, relType: String, dst: String,
      props: Map[String, String] = Map.empty): Unit = synchronized {
    stageSeq += 1
    stagedEdges += EdgeEvent(stageSeq, taskId, src, relType, dst, props)
  }

  /** Merge the staged batch into the snapshot (set-oriented A1-A4) and
    * persist if a directory is configured. */
  def commit(): Unit = synchronized {
    if (stagedSymbols.nonEmpty || stagedEdges.nonEmpty) {
      // mergeNodes already set-unions task_ids per node from the event
      // stream, so a batch staging events from several tasks attributes
      // each node (and each stub, below) to exactly the tasks that touched
      // it — no collapse to the first task id (round-3 defect #2).
      val edgeEvents = stagedEdges.toSeq.toDF()
      val fresh = Merge.mergeNodes(stagedSymbols.toSeq.toDF())
      val freshEdges = Merge.mergeEdges(edgeEvents)
      val upserted = Merge.upsertInto(snap.nodes.drop("label"), fresh)
      // edge upsert: fresh props overwrite base props key-wise (A4)
      val allEdges = snap.edges.withColumn("prio", lit(0))
        .unionByName(freshEdges.withColumn("prio", lit(1)))
        .groupBy("src", "rel_type", "dst")
        .agg(aggregate(
          array_sort(collect_list(struct(col("prio"), col("props"))),
            (l, r) => l.getField("prio") - r.getField("prio")),
          map().cast("map<string,string>"),
          (acc, e) => map_concat(
            map_filter(acc, (k, _) => !map_contains_key(e.getField("props"), k)),
            e.getField("props"))).as("props"))
      val withStubs = Merge.withStubsByTask(upserted, edgeEvents)
      snap = GraphSnapshot(withStubs, allEdges, snap.locations)
      stagedSymbols.clear(); stagedEdges.clear()
    }
    dir.foreach(d => { Snapshot.write(snap, d); snap = Snapshot.read(spark, d) })
  }

  /** A3 — prop-only update of an EXISTING node (graphDB.py:114-119:
    * match-then-SET): a missing full_name is a NO-OP — no node is
    * created, unlike [[addNode]]'s upsert. Applied immediately, like the
    * reference's per-call write. */
  def updateNode(fullName: String, props0: Map[String, String]): Unit = synchronized {
    // the reference's writes are all immediate per-call: flush any staged
    // batch first so "addNode then updateNode" applies in call order
    // instead of silently missing the not-yet-committed node
    if (stagedSymbols.nonEmpty || stagedEdges.nonEmpty) commit()
    // accept the "class" props key exactly as addNode does (stored in the
    // clazz column)
    val props = props0.map { case (k, v) => (if (k == "class") "clazz" else k, v) }
    val fixedKeys = Seq("name", "file_path", "signature", "clazz", "code")
    val hit = col("full_name") === fullName
    var n = snap.nodes
    props.filter(p => fixedKeys.contains(p._1)).foreach { case (k, v) =>
      n = n.withColumn(k, when(hit, lit(v)).otherwise(col(k)))
    }
    val rest = props -- fixedKeys
    if (rest.nonEmpty) {
      val restMap = map(rest.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      n = n.withColumn("props",
        when(hit, map_concat(
          map_filter(col("props"), (k, _) => !k.isInCollection(rest.keys.toSeq)),
          restMap)).otherwise(col("props")))
    }
    snap = GraphSnapshot(n, snap.edges, snap.locations)
    dir.foreach(d => { Snapshot.write(snap, d); snap = Snapshot.read(spark, d) })
  }

  /** C1-C14 + D1-D4 — index a Python repo into a task snapshot
    * (run_mutiprocess.run). */
  def indexRepo(root: String, taskId: String): Unit = synchronized {
    val ix = IndexPipeline.run(spark, root, taskId)
    mergeIndexed(ix, taskId)
  }

  private def mergeIndexed(ix: IndexPipeline.Indexed, taskId: String): Unit = {
    val nodes2 =
      if (snap.nodes.isEmpty) ix.nodes
      else Merge.upsertInto(snap.nodes, ix.nodes.drop("label"))
    val edges2 = snap.edges.unionByName(ix.edges)
      .dropDuplicates("src", "rel_type", "dst")
    snap = GraphSnapshot(nodes2, edges2,
      snap.locations.unionByName(ix.locations))
    dir.foreach(d => { Snapshot.write(snap, d); snap = Snapshot.read(spark, d) })
  }

  /** A5 — DETACH DELETE of a task snapshot. */
  def clearTaskData(taskId: String): Unit = synchronized {
    val (n2, e2) = GraphOps.clearTask(snap.nodes, snap.edges, taskId)
    snap = GraphSnapshot(n2, e2, snap.locations)
    dir.foreach(d => Snapshot.write(snap, d))
  }

  /** A6 — clear everything. */
  def clearDatabase(): Unit = synchronized {
    snap = GraphSnapshot(snap.nodes.limit(0), snap.edges.limit(0),
      snap.locations.limit(0))
    dir.foreach(d => Snapshot.write(snap, d))
  }

  /** A7 — strip a root prefix off file paths. */
  def updateFilePath(root: String): Unit = synchronized {
    snap = GraphSnapshot(
      GraphOps.stripPathPrefix(snap.nodes, "file_path", root),
      snap.edges, snap.locations)
  }

  /** D5/D6 — incremental version update (update_version.py:58-73): carry
    * the new task onto unchanged nodes, re-index only changed files. */
  def updateVersion(oldTask: String, newTask: String, changedFiles: Seq[String],
      repoRoot: Option[String] = None): Unit = synchronized {
    snap = GraphSnapshot(
      GraphOps.carryForward(snap.nodes, newTask, changedFiles),
      snap.edges, snap.locations)
    repoRoot.foreach { root =>
      import IndexPipeline.SourceFile
      val changed = IndexPipeline.readRepo(spark, root)
        .filter((f: SourceFile) => changedFiles.contains(f.path))
      val ix = IndexPipeline.enrich(
        IndexPipeline.indexFiles(spark, changed, newTask), newTask)
      mergeIndexed(ix, newTask)
    }
  }

  /** D6 proper — updateVersion driven from two REAL commits, the
    * reference's own entry flow (update_version.py:80-99: get_change_list
    * then update_version). The repo working tree is expected to be checked
    * out at `commit2`, exactly as the reference assumes. */
  def updateVersionFromCommits(oldTask: String, newTask: String,
      repoRoot: String, commit1: String, commit2: String): Unit =
    updateVersion(oldTask, newTask,
      graft.indexer.GitChanges.changedFiles(repoRoot, commit1, commit2),
      Some(repoRoot))

  // -------------------------------------------------------------- read path

  def nodeByKey(fullName: String): DataFrame =
    GraphOps.nodeByKey(snap.nodes, fullName)

  def nodesByKind(kind: String, pred: Column = lit(true)): DataFrame =
    snap.nodes.filter(col("kind") === kind && pred)

  def expand(relType: String, srcPred: Column, dstPred: Column = lit(true)): DataFrame = {
    val e = snap.edges.filter(col("rel_type") === relType)
    val srcs = snap.nodes.filter(srcPred).select(col("full_name").as("src"))
    e.join(broadcast(srcs), "src")
      .join(snap.nodes.withColumnRenamed("full_name", "dst_name")
        .withColumnRenamed("kind", "dst_kind"),
        col("dst") === col("dst_name"))
      .filter(dstPred)
  }

  /** B10 — `execute_query` for the reference's observed Cypher shapes
    * (graphDB.py:106-112; full Cypher delegated to Neo4j there, subset
    * parsed natively here — SURVEY.md §7.3). */
  def executeQuery(cypher: String): DataFrame =
    CypherLite.execute(snap.nodes, snap.edges, cypher)

  /** The reference's swallow-errors query behavior (graphDB.py:106-112:
    * any failure → `''`): unparseable/failing queries yield an EMPTY
    * frame instead of throwing. Materialized eagerly (the reference
    * returns a record list), so EXECUTION-time failures are swallowed
    * too, not just parse/analysis errors. [[executeQuery]] stays the
    * throwing, library-grade surface. */
  def executeQuerySafe(cypher: String): DataFrame =
    try executeQuery(cypher).localCheckpoint(eager = true)
    catch { case _: Exception => spark.emptyDataFrame }

  /** B6 + B11 — methods of a class with hydrated code, the reference's
    * flagship demo query (graphDB.py:280-283). */
  def methodsOf(classFullName: String, files: DataFrame): DataFrame = {
    val ms = expand(Rel.HasMethod, col("full_name") === classFullName)
      .select(col("dst_name").as("full_name"), col("name"),
        col("signature"), col("code"))
    graft.hydrate.Hydrate.hydrate(ms, files, "code")
  }
}

object GraphDatabase {
  /** In-memory database (no persistence). */
  def inMemory(spark: SparkSession): GraphDatabase =
    new GraphDatabase(spark, None)

  /** Open (or create) a persistent snapshot directory. */
  def open(spark: SparkSession, dir: String): GraphDatabase =
    new GraphDatabase(spark, Some(dir))
}
