package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}

/** VERIFY-HARNESS ONLY — the driver-paced micro-batch replay behind the
  * `st_*` oracle gates.
  *
  * The streaming OPERATORS under test live in [[graft.streaming.Streams]]
  * and hold watermark-bounded O(sketch) state; what needs driver-side
  * orchestration is only the REPLAY: the oracle compares against a
  * deterministic batch answer, so the harness must feed the events in a
  * fixed event-time order, in a fixed number of micro-batches, and drain
  * each batch (`processAllAvailable`) before the next — which means the
  * input rows are collected AT THE DRIVER first. That collect is bounded
  * by the verify scale (sf0.01, ≤60k rows), the `st_*` queries are
  * excluded from Bench (Bench.scala filters them), and nothing in the
  * production surface calls this object: a deployment runs the same
  * Streams operators from `readStream` sources with real checkpoints
  * (see StreamsSpec's restart-recovery case).
  */
object StreamReplay {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay `rows` through `xform(stream)` in `batches` ordered
    * micro-batches into a memory sink; `tail` rows (e.g. a
    * watermark-advancing sentinel) arrive as one final extra batch.
    * Returns the sink's table. */
  def replay[T: Encoder](s: SparkSession, rows: Seq[T], label: String,
      mode: String, batches: Int = 3, tail: Seq[T] = Nil)
      (xform: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
    val name = s"${label}_out_${sinkSeq.incrementAndGet()}"
    val q = xform(mem.toDS().toDF()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      rows.grouped(math.max(1, rows.length / batches + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      if (tail.nonEmpty) {
        mem.addData(tail: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    s.table(name)
  }
}
