package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val media = Seq(
    Media(1L, "image", Array[Byte](1, 2, 3, 4), 64, 64),
    Media(2L, "image", Array[Byte](1, 2, 3, 4), 64, 64),   // same payload as 1
    Media(3L, "image", Array[Byte](9, 9, 9, 9), 32, 32)
  ).toDS()

  test("extractFeatures: deterministic, fixed-dim, identical payloads agree") {
    val out = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(out.forall(_.feature.length === 16))
    val byId = out.map(f => f.doc_id -> f.feature).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(1L) !== byId(3L))
    // re-run -> identical (stub codec is content-seeded, not random)
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.doc_id -> f.feature).toMap
    assert(byId === again)
  }

  test("sampleFrames explodes video duration into frame rows") {
    val rows = Seq(
      (10L, "video", null: Array[Byte], Row(0, 0, 0, 3500L)),
      (11L, "image", null: Array[Byte], Row(64, 64, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4))),
      Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(df, everyMs = 1000L)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 0L), (10L, 1L), (10L, 2L))) // 3.5s -> frames 0..2
  }

  test("mediaNearDups finds identical payloads via the embedding pipeline") {
    val out = Multimodal.mediaNearDups(spark, media, threshold = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
  }
}
