package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph closure — the reference's transitive enrichment passes
  * (ast_search/ast_manage.py:79-99: inherited-method propagation;
  * update_version + reachability shapes), generalized.
  *
  * Spark has no recursive-CTE operator, so fixpoint iteration is a driver
  * loop over DataFrame joins. Hygiene for scale:
  *  - `localCheckpoint` each delta to cut lineage (otherwise plan depth
  *    grows linearly with iterations and planning time explodes);
  *  - dedup (`except`) against the accumulated set for termination on
  *    cycles — the reference's `processed_relations` set does the same;
  *  - the per-iteration join shuffles only the DELTA, not the full
  *    accumulated closure.
  */
object Closure {

  /** All (descendant, ancestor) pairs reachable along child→parent `edges`
    * (columns src, dst). Depth-bounded only by the data (DAG assumed for
    * termination without dedup; dedup makes cycles safe too). */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // checkpointed hash-partitioned on src — the probe key of every
    // iteration's extension join, so only the delta side shuffles
    val base = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(eager = true)
    var acc = base
    var delta = base
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      // extend frontier one hop: delta(src,mid) ⋈ base(mid,dst)
      val next = delta.as("d")
        .join(base.as("b"), col("d.dst") === col("b.src"))
        .select(col("d.src").as("src"), col("b.dst").as("dst"))
        .distinct()
      // only the delta needs an eager checkpoint (it both terminates the
      // loop and feeds the next join); acc stays a shallow union tree of
      // already-checkpointed deltas, so its lineage never deepens.
      // anti-join ≡ except here (next is distinct, keys non-null) without
      // re-distincting the whole accumulated closure every iteration
      delta = next.join(acc, Seq("src", "dst"), "left_anti")
        .localCheckpoint(eager = true)
      acc = acc.union(delta)
      i += 1
    }
    acc
  }

  /** D4 proper — inherited-method propagation (ast_manage.py:79-99): for
    * every (class, ancestor) pair in the INHERITS closure, copy the
    * ancestor's HAS_METHOD edges onto the class, skipping `__init__`
    * (ast_manage.py:92-93) and edges the class already has. Returns the
    * NEW HAS_METHOD edges only. */
  def inheritedMethods(inherits: DataFrame, hasMethod: DataFrame): DataFrame = {
    val closure = transitiveClosure(inherits) // (class, ancestor)
    val inherited = closure.as("c")
      .join(hasMethod.as("m"), col("c.dst") === col("m.src"))
      // reference: `'__init__' in method` — a SUBSTRING test
      // (ast_manage.py:92-93), not a suffix test; matched exactly
      .filter(!col("m.dst").contains("__init__"))
      .select(col("c.src").as("src"), col("m.dst").as("dst"))
      .distinct()
    inherited.except(hasMethod.select(col("src"), col("dst")))
  }

  /** [[transitiveClosure]] carrying the MINIMUM hop count per pair:
    * (descendant, ancestor, depth). The frontier loop reaches each pair
    * first at its shortest distance (BFS invariant), so the anti-join
    * that admits only NEW pairs is also the min-depth selector. */
  def transitiveClosureDepth(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val base = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(eager = true)
    var acc = base.withColumn("depth", lit(1L))
    var delta = acc
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      val next = delta.as("d")
        .join(base.as("b"), col("d.dst") === col("b.src"))
        .select(col("d.src").as("src"), col("b.dst").as("dst"),
          (col("d.depth") + 1).as("depth"))
        .groupBy(col("src"), col("dst")).agg(min(col("depth")).as("depth"))
      delta = next.join(acc.select(col("src"), col("dst")),
          Seq("src", "dst"), "left_anti")
        .localCheckpoint(eager = true)
      acc = acc.union(delta)
      i += 1
    }
    acc
  }

  /** C11 — override detection (reference deep mode,
    * indexer_visitor.py:125-157: `goto(follow_override=True)` per
    * funcdef, emitted to Sourcetrail only): a method DEFINED on a class
    * overrides the same-named method of its NEAREST INHERITS-closure
    * ancestor that defines one — jedi's goto resolves the single method
    * the child actually shadows, not every same-named method up the
    * chain (C.run with B.run and A.run above it overrides B.run only;
    * B.run separately overrides A.run). Equal-depth ties (two direct
    * bases both defining the name) keep both rows: base ORDER — what
    * Python's MRO would consult — is not modeled in the INHERITS edges,
    * so the tie is surfaced rather than guessed. Returns
    * (src=overriding method, dst=overridden ancestor method).
    * `hasMethod` must be the defined set (inherited copies excluded by
    * the caller). */
  def overrides(inherits: DataFrame, hasMethod: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val closure = transitiveClosureDepth(inherits) // (class, ancestor, depth)
    def withName(df: DataFrame) = df
      .withColumn("_m", element_at(split(col("dst"), "\\."), -1))
    val cand = withName(hasMethod).as("c")
      .join(closure.as("h"), col("c.src") === col("h.src"))
      .join(withName(hasMethod).as("a"),
        col("h.dst") === col("a.src") && col("c._m") === col("a._m"))
      .select(col("c.dst").as("src"), col("a.dst").as("dst"),
        col("h.depth").as("depth"))
      .distinct()
    // per overriding method: keep only the closest defining ancestor(s)
    cand.withColumn("_best",
        min(col("depth")).over(Window.partitionBy(col("src"))))
      .filter(col("depth") === col("_best"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** GraphX variant of the reachability closure for the analytics story:
    * Pregel propagating reachable-ancestor sets. Same interface; used when
    * the closure is deep/wide enough that per-iteration DataFrame job
    * setup dominates. Keys are hashed to Long vertex ids. */
  def transitiveClosureGraphX(spark: SparkSession, edges: DataFrame): DataFrame = {
    import org.apache.spark.graphx._
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).distinct()
      .select(xxhash64(col("src")).as("sid"), col("src"),
        xxhash64(col("dst")).as("did"), col("dst"))
      .cache()
    val names = e.select(col("sid").as("id"), col("src").as("name"))
      .union(e.select(col("did"), col("dst"))).distinct()
    val vertices = names.as[(Long, String)].rdd
    val edgeRdd = e.select(col("sid"), col("did")).as[(Long, Long)].rdd
      .map { case (s, d) => Edge(s, d, ()) }
    // propagate ancestor-id sets AGAINST edge direction (child accumulates
    // its parents' reachable sets)
    val g = Graph(vertices.map { case (id, _) => (id, Set.empty[Long]) }, edgeRdd)
    val res = g.pregel(Set.empty[Long], maxIterations = 50,
      activeDirection = EdgeDirection.In)(
      (_, have, msg) => have ++ msg,
      triplet => {
        val reach = triplet.dstAttr + triplet.dstId
        if (!reach.subsetOf(triplet.srcAttr)) Iterator((triplet.srcId, reach))
        else Iterator.empty
      },
      (a, b) => a ++ b)
    val pairs = res.vertices.flatMap { case (id, anc) => anc.map(a => (id, a)) }
      .toDF("sid", "did")
    val byName = names.withColumnRenamed("id", "sid").withColumnRenamed("name", "src")
    pairs.join(byName, "sid")
      .join(names.withColumnRenamed("id", "did").withColumnRenamed("name", "dst"), "did")
      .select("src", "dst")
  }
}
