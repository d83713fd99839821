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

  test("sniffFormat: magic bytes route payloads, no codec needed") {
    val rows = Seq(
      (1L, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a).map(_.toByte)),
      (2L, Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)),
      (3L, "RIFF1234WAVE".getBytes),
      (4L, Array(0x00, 0x00, 0x00, 0x18) .map(_.toByte) ++ "ftypmp42".getBytes),
      (5L, "plain text".getBytes),
      (6L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.sniffFormat(col("payload")).as("fmt"))
      .as[(Long, String)].collect().toMap
    assert(rows === Map(1L -> "png", 2L -> "jpeg", 3L -> "riff",
      4L -> "mp4", 5L -> "unknown", 6L -> null))
  }

  test("withByteEntropy: uniform bytes -> 8 bits, constant -> 0") {
    val rows = Seq(
      (1L, Array.tabulate(256)(_.toByte)),          // uniform: all 256 values
      (2L, Array.fill(100)(7.toByte)),              // constant
      (3L, Array[Byte]()))                          // empty
      .toDF("doc_id", "payload")
    val out = Multimodal.withByteEntropy(rows)
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 8.0) < 1e-9)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
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

  test("withHeaderMeta parses REAL png/gif/bmp header dimensions") {
    // hand-assembled container headers, exactly per spec
    val png = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',                                   // IHDR
      0, 0, 1, 0,   // width 256 (big-endian)
      0, 0, 0, 200, // height 200
      8, 6, 0, 0, 0).map(_.toByte)
    val gif = ("GIF89a".getBytes.toSeq ++ Seq(
      0x40, 0x01, // width 320 (little-endian)
      0xf0, 0x00, // height 240
      0x91, 0x00, 0x00).map(_.toByte)).toArray
    val bmp = (Seq('B'.toInt, 'M'.toInt) ++ Seq.fill(16)(0) ++ Seq(
      0x80, 0x02, 0x00, 0x00, // width 640 (little-endian)
      0xe0, 0x01, 0x00, 0x00, // height 480
      0x01, 0x00)).map(_.toByte).toArray
    val rows = Seq((1L, png), (2L, gif), (3L, bmp),
      (4L, "not an image".getBytes), (5L, null: Array[Byte]))
      .toDF("doc_id", "payload")
    val out = Multimodal.withHeaderMeta(rows)
      .select(col("doc_id"), col("header_meta.format"),
        col("header_meta.width"), col("header_meta.height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === (("png", Some(256), Some(200))))
    assert(out(2L) === (("gif", Some(320), Some(240))))
    assert(out(3L) === (("bmp", Some(640), Some(480))))
    assert(out(4L) === (("unknown", None, None)))
    assert(out(5L) === (("missing", None, None)))
    // top-down BMP: biHeight is stored negative; the magnitude is the height
    val bmpTopDown = (Seq('B'.toInt, 'M'.toInt) ++ Seq.fill(16)(0) ++ Seq(
      0x80, 0x02, 0x00, 0x00,  // width 640
      0x20, 0xfe, 0xff, 0xff,  // height -480 two's complement
      0x01, 0x00)).map(_.toByte).toArray
    val td = Multimodal.withHeaderMeta(Seq((9L, bmpTopDown)).toDF("doc_id", "payload"))
      .select(col("header_meta.width"), col("header_meta.height")).collect()(0)
    assert((td.getInt(0), td.getInt(1)) === ((640, 480)))
  }

  test("withHeaderMeta walks JPEG segments to the SOF frame header") {
    // SOI, APP0 (16-byte JFIF stanza), DQT (typical pre-SOF segment),
    // then SOF0 with height 300 / width 450 big-endian — the walk must
    // skip the variable-length segments and read the first real SOFn
    val app0 = Seq(0xff, 0xe0, 0x00, 0x10) ++ "JFIF".getBytes.map(_.toInt) ++
      Seq.fill(10)(0)
    val dqt = Seq(0xff, 0xdb, 0x00, 0x05) ++ Seq.fill(3)(1)
    val sof0 = Seq(0xff, 0xc0, 0x00, 0x11, 8,
      0x01, 0x2c,  // height 300
      0x01, 0xc2,  // width 450
      3) ++ Seq.fill(10)(0)
    val jpeg = (Seq(0xff, 0xd8) ++ app0 ++ dqt ++ sof0).map(_.toByte).toArray
    // progressive JPEG: SOF2 carries the dimensions the same way
    val sof2 = Seq(0xff, 0xc2, 0x00, 0x11, 8, 0x00, 0x64, 0x00, 0xc8, 3) ++
      Seq.fill(10)(0)
    val jpegProg = (Seq(0xff, 0xd8) ++ app0 ++ sof2).map(_.toByte).toArray
    // truncated JPEG (cut before any SOF): format sniffs, dims stay null
    val jpegTrunc = (Seq(0xff, 0xd8) ++ app0.take(6)).map(_.toByte).toArray
    val out = Multimodal.withHeaderMeta(
      Seq((1L, jpeg), (2L, jpegProg), (3L, jpegTrunc)).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("header_meta.format"),
        col("header_meta.width"), col("header_meta.height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === (("jpeg", Some(450), Some(300))))
    assert(out(2L) === (("jpeg", Some(200), Some(100))))
    assert(out(3L) === (("jpeg", None, None)))
  }
}
