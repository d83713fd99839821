package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Graph snapshot persistence — the rebuild's storage layer (SURVEY.md
  * §1.3): columnar Parquet per table, task-partitioned nodes, atomic
  * commit-by-rename.
  *
  * The reference mutates Neo4j in place under a global file lock
  * (graphDB.py:18-33); a Spark engine instead owns immutable snapshot
  * directories and commits a whole batch at once (the analog of the
  * per-file SourcetrailDB transaction, run_index_single.py:56-58, but at
  * batch granularity).
  *
  * Scale notes:
  *  - nodes are written partitioned by `part_task` (first task id) so
  *    task-scoped scans prune partitions (the reference's label-scoped
  *    scans, SURVEY.md §4);
  *  - edges are bucketable by `src` for merge-free point expands;
  *  - commit = write to `<dir>.tmp-<nonce>` then atomic rename: readers
  *    never observe a half-written snapshot.
  */
object Snapshot {
  final case class GraphSnapshot(
      nodes: DataFrame, edges: DataFrame, locations: DataFrame)

  def write(snap: GraphSnapshot, dir: String): Unit = {
    val tmp = s"$dir.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    // sort on the point-lookup keys inside each file: parquet row-group
    // min/max stats then skip row groups on full_name/src point reads
    // (B1 lookups, expand probes) — the dir-based analog of bucketing
    // (hive-style bucketing needs a metastore table, which a snapshot
    // directory deliberately doesn't)
    // part_task leads the sort: partitionBy requires ordering on the
    // partition column, so this single sort satisfies the writer (no
    // second writer-inserted sort that could unstably reorder full_name)
    snap.nodes
      .withColumn("part_task", coalesce(element_at(col("task_ids"), 1), lit("none")))
      .sortWithinPartitions("part_task", "full_name")
      .write.mode("overwrite").partitionBy("part_task").parquet(s"$tmp/nodes")
    snap.edges.sortWithinPartitions("src", "rel_type")
      .write.mode("overwrite").parquet(s"$tmp/edges")
    snap.locations.write.mode("overwrite").parquet(s"$tmp/locations")
    val target = Paths.get(dir)
    if (Files.exists(target)) {
      val old = Paths.get(s"$dir.old-${System.nanoTime()}")
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
    } else {
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def read(spark: SparkSession, dir: String): GraphSnapshot =
    GraphSnapshot(
      spark.read.parquet(s"$dir/nodes").drop("part_task"),
      spark.read.parquet(s"$dir/edges"),
      spark.read.parquet(s"$dir/locations"))

  private[store] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
