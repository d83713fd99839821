package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CosineSim, GraftExpressions}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a full scan of the corpus; one shuffle for the per-query
  * top-k. Scale path: LSH bucketing by random-hyperplane sign bits —
  * corpus is hashed once, queries probe only their bucket, so the pairwise
  * work drops from O(nq·n) to O(nq·n/2^bits) at some recall cost.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Rounded to 4 decimals so ranking ties are resolved identically
    * across engines (the oracle recomputes the same quantity).
    * Evaluated by the codegen'd [[graft.functions.CosineSim]] kernel —
    * bit-identical to the HOF spelling [[cosineSpec]]. */
  def cosine(a: Column, b: Column): Column =
    round(GraftExpressions.col(
      CosineSim(GraftExpressions.expr(a), GraftExpressions.expr(b))), 4)

  /** Portable HOF spelling of [[cosine]] — the executable spec the native
    * kernel is property-tested against. */
  def cosineSpec(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    round(dot / (na * nb), 4)
  }

  /** Brute-force top-k: for each query vector (vec_id ∈ queryIds), the k
    * nearest corpus vectors by cosine (excluding self), ties broken by
    * vec_id. Query side is broadcast — the corpus scan never shuffles
    * until the final per-query top-k. */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component j of
    * plane i is derived from the rolling arithmetic (i*dim+j) — a fixed,
    * engine-portable pattern standing in for a seeded Gaussian (the sign
    * structure, bucketing, and probe logic are what matter). */
  def planeComponent(i: Int, j: Int): Double =
    (((i.toLong * 64 + j) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  /** Sign-LSH bucket id: one bit per hyperplane = sign of dot(v, plane). */
  def lshBucket(v: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { i =>
      val dot = aggregate(
        zip_with(v,
          array((0 until dim).map(j => lit(planeComponent(i, j))): _*),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: corpus hashed once; each query only scores
    * vectors in its own bucket. Recall < 1 by design; the bucket count
    * (2^numPlanes) tunes the work/recall tradeoff. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), numPlanes, dim).as("bucket"))
    val q = hashed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket"))
    val scored = hashed.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** IVF-style ANN: a deterministic coarse quantizer (every `centroidEvery`-th
    * vector is a centroid) partitions the corpus into cells; a query scores
    * only vectors in its `nprobe` nearest cells. The classic scale path:
    * centroids are broadcast (small), the corpus is assigned in one
    * codegen'd pass, and per-query work drops from O(n) to
    * O(nprobe·n/#cells). Recall < 1 by design; deterministic so the oracle
    * replays the identical quantization. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      centroidEvery: Int = 50, nprobe: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = emb.filter(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // cell assignment: nearest centroid by cosine (ties -> lowest cid)
    val byCell = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cid").asc)
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cv")).as("csim"))
      .withColumn("crank", row_number().over(byCell))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    // query cells: nprobe nearest centroids per query vector
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cid"),
        cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("prank", row_number().over(byQuery))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    // score candidates within probed cells only
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    // each vector lives in exactly one cell and probe cells are distinct
    // per query, so (query, vec) pairs are already unique
    assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** Embedding near-duplicate pairs: all (a,b), a<b, cosine ≥ threshold,
    * restricted to same-LSH-bucket candidates to stay sub-quadratic. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
      numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val hashed = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), numPlanes, dim).as("bucket"))
    // forced shuffle join so the bucketing pipeline runs once (reused
    // exchange); the hashed corpus is join-side-symmetric and at scale
    // never broadcastable
    hashed.as("x").hint("SHUFFLE_MERGE")
      .join(hashed.as("y").hint("SHUFFLE_MERGE"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
