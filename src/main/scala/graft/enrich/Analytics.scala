package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on the edge-list representation — the
  * "beyond-parity" analytics layer over the same graph tables the B and D
  * group operators use.
  *
  * Engine-portability note: every iteration rounds to 10 decimals so the
  * DuckDB oracle (which sums in a different order) lands on identical
  * doubles — float addition is non-associative, and without the rounding
  * the 1-ulp drift compounds across iterations.
  */
object Analytics {

  /** PageRank with fixed iteration count over edges(src, dst). Damping
    * 0.85, uniform init 1/N, dangling mass ignored (nodes with no
    * out-edges contribute nothing — the simple formulation, identical on
    * the oracle side). Returns (v, pagerank) rounded to 6. */
  def pageRank(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // static per-edge state (dst, out-degree share denominator) joined ONCE
    // and checkpointed hash-partitioned on the iteration join key — each
    // iteration shuffles only the rank side, never re-scans the source
    val e2 = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("cnt")), "src")
      .repartition(col("src")).localCheckpoint(eager = true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .repartition(col("v")).localCheckpoint(eager = true)
    val n = verts.count().toDouble
    var pr = verts.withColumn("pr", round(lit(1.0 / n), 10))
    for (_ <- 1 to iterations) {
      val contrib = e2.join(pr.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(round(sum(col("pr") / col("cnt")), 10).as("s"))
      pr = verts.join(contrib, Seq("v"), "left")
        .select(col("v"),
          round(lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0)), 10).as("pr"))
        .localCheckpoint(eager = true)
    }
    pr.select(col("v"), round(col("pr"), 6).as("pagerank"))
  }

  /** Connected components via iterated label propagation (min-id wins),
    * on the UNDIRECTED view of edges(src, dst). Deterministic; converges
    * in O(diameter) iterations. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(eager = true)
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
    var changed = 1L
    var i = 0
    while (i < maxIter && changed > 0) {
      val prop = und.join(labels.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("component")).as("neighbor_min"))
      val next = labels.join(prop, Seq("v"), "left")
        .select(col("v"),
          least(col("component"), coalesce(col("neighbor_min"), col("component")))
            .as("component"))
        .localCheckpoint(eager = true)
      changed = next.as("n").join(labels.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      i += 1
    }
    labels
  }
}
