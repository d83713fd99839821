package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Read-path graph combinators — the Cypher workload the reference issues
  * (SURVEY.md §2.B, reference graphDB.py / ast_search/ast_manage.py),
  * decomposed into relational primitives. Everything here is declarative
  * DataFrame API so Catalyst does pushdown/pruning/join selection; the
  * node side of point expands is broadcast when small.
  *
  * Conventions: `nodes(full_name, label|labels, ...)`,
  * `edges(src, rel_type, dst)`.
  */
object GraphOps {

  /** B1 — point lookup by primary key (reference graphDB.py:65-70).
    * A filter on the key column: pushed to the parquet scan; on a store
    * bucketed/sorted by full_name this is a point read. */
  def nodeByKey(nodes: DataFrame, fullName: String): DataFrame =
    nodes.filter(col("full_name") === fullName)

  /** B2 — lookup by (label, property) (reference graphDB.py:269-272). */
  def nodesByLabelProp(nodes: DataFrame, label: String, prop: Column): DataFrame =
    nodes.filter(col("label") === label && prop)

  /** B3/B4/B5 — 1-hop expand along a typed edge from a source node set,
    * optional target predicate (reference ast_manage.py:24-62).
    * Shape: E ⋈ N_dst; the edge filter is pushed below the join.
    */
  def expand(
      nodes: DataFrame,
      edges: DataFrame,
      relType: String,
      srcPred: Column,
      dstPred: Column = lit(true)): DataFrame = {
    val e = edges.filter(col("rel_type") === relType)
    val srcs = nodes.filter(srcPred).select(col("full_name").as("src"))
    // source set is a point/small set → broadcast it into the edge scan
    e.join(broadcast(srcs), "src")
      .join(nodes.withColumnRenamed("full_name", "dst"), "dst")
      .filter(dstPred)
  }

  /** B7 — existence predicate scan (reference graphDB.py:158-162). */
  def existsProp(nodes: DataFrame, prop: String): DataFrame =
    nodes.filter(col(prop).isNotNull)

  /** B9 — pick the kind label out of a multi-label set
    * (reference ast_manage.py:32,42-44): higher-order filter on the array,
    * no UDF. */
  def kindOf(labels: Column, kinds: Seq[String]): Column =
    try_element_at(filter(labels, l => l.isInCollection(kinds)), lit(1))

  /** A5 — clear task data with DETACH-cascade (reference graphDB.py:94-100):
    * drop nodes in the task; edges lose any row touching a DELETED node
    * (two anti-joins against the deleted key set). Anti against the
    * deleted set, not semi against survivors: the deleted set is the
    * one task being cleared — usually a small fraction of the graph and
    * broadcastable, so the edge table never shuffles. Equivalent because
    * every edge endpoint exists in nodes (the A4 stub invariant). */
  def clearTask(nodes: DataFrame, edges: DataFrame, taskId: String)
      : (DataFrame, DataFrame) = {
    val surviving = nodes.filter(!array_contains(col("task_ids"), taskId))
    val deleted = nodes.filter(array_contains(col("task_ids"), taskId))
      .select(col("full_name"))
    val e2 = edges
      .join(deleted.withColumnRenamed("full_name", "src"), Seq("src"), "left_anti")
      .join(deleted.withColumnRenamed("full_name", "dst"), Seq("dst"), "left_anti")
    (surviving, e2)
  }

  /** A7 — strip a root prefix off file_path (reference graphDB.py:155-174).
    * Pure narrow map — no shuffle. */
  def stripPathPrefix(df: DataFrame, pathCol: String, root: String): DataFrame =
    df.withColumn(pathCol,
      when(col(pathCol).startsWith(root), expr(s"substring($pathCol, ${root.length + 1})"))
        .otherwise(col(pathCol)))

  /** D5 — version carry-forward (reference update_version.py:21-44): add the
    * new task id to every node whose file_path is NOT in the change list.
    * One conditional array-union over the table — replaces the reference's
    * per-node SET round-trips. `changes` is broadcast via isin (small). */
  def carryForward(nodes: DataFrame, newTask: String, changes: Seq[String]): DataFrame =
    nodes.withColumn("task_ids",
      when(col("file_path").isNull || !col("file_path").isin(changes: _*),
        array_union(col("task_ids"), array(lit(newTask))))
        .otherwise(col("task_ids")))

  /** D5 companion — diff two snapshot labels: classify every node by its
    * membership in (t1, t2) — 'carried' (in both), 'removed' (t1 only:
    * the re-index dropped it), 'added' (t2 only: newly indexed). A
    * narrow map over the nodes table — membership is two array_contains
    * probes on the set-valued task_ids column, which IS the version
    * index (update_version.py's multi-label membership, SURVEY §1.1);
    * no join, no shuffle. */
  def snapshotDiff(nodes: DataFrame, t1: String, t2: String): DataFrame = {
    val in1 = array_contains(col("task_ids"), t1)
    val in2 = array_contains(col("task_ids"), t2)
    nodes.filter(in1 || in2)
      .withColumn("diff_status",
        when(in1 && in2, "carried").when(in1, "removed").otherwise("added"))
  }

  /** A2 — label promotion (reference graphDB.py:82-92): REMOVE :none SET
    * :kind, guarded on the placeholder being present. */
  def promoteLabel(labels: Column, kind: Column): Column =
    when(array_contains(labels, "none") && kind =!= "none",
      array_union(array_remove(labels, "none"), array(kind)))
      .otherwise(labels)
}
