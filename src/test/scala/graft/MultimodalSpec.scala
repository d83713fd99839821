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
    // RIFF form types route to their own decoders since round 6
    assert(rows === Map(1L -> "png", 2L -> "jpeg", 3L -> "wav",
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

  test("withExifMeta: APP1 walk past decoys, both byte orders, degrades") {
    // little-endian TIFF: orientation 6, DateTime "2021:03:04 05:06:07"
    val dt = "2021:03:04 05:06:07"
    def le16(v: Int) = Seq(v & 0xff, v >> 8)
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24)
    def be16(v: Int) = Seq(v >> 8, v & 0xff)
    def be32(v: Int) = Seq(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    val tiffLe = Seq('I'.toInt, 'I'.toInt, 0x2a, 0x00) ++ le32(8) ++ le16(2) ++
      (le16(274) ++ le16(3) ++ le32(1) ++ le16(6) ++ le16(0)) ++
      (le16(306) ++ le16(2) ++ le32(20) ++ le32(38)) ++ le32(0) ++
      dt.getBytes.map(_.toInt) :+ 0
    val tiffBe = Seq('M'.toInt, 'M'.toInt, 0x00, 0x2a) ++ be32(8) ++ be16(2) ++
      (be16(274) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0)) ++
      (be16(306) ++ be16(2) ++ be32(20) ++ be32(38)) ++ be32(0) ++
      dt.getBytes.map(_.toInt) :+ 0
    // a bad-offset variant: DateTime's value offset points past the block
    val tiffBad = Seq('I'.toInt, 'I'.toInt, 0x2a, 0x00) ++ le32(8) ++ le16(2) ++
      (le16(274) ++ le16(3) ++ le32(1) ++ le16(6) ++ le16(0)) ++
      (le16(306) ++ le16(2) ++ le32(20) ++ le32(9999)) ++ le32(0) ++
      dt.getBytes.map(_.toInt) :+ 0
    def app1(tiff: Seq[Int]) =
      Seq(0xff, 0xe1) ++ be16(2 + 6 + tiff.size) ++
        "Exif".getBytes.map(_.toInt) ++ Seq(0, 0) ++ tiff
    // an XMP APP1 (same marker, different payload) the walk must skip
    val xmp = {
      val body = "http://ns.adobe.com/xap/1.0/".getBytes.map(_.toInt).toSeq :+ 0
      Seq(0xff, 0xe1) ++ be16(2 + body.size) ++ body
    }
    val app0 = Seq(0xff, 0xe0, 0x00, 0x10) ++ "JFIF".getBytes.map(_.toInt) ++
      Seq.fill(10)(0)
    val eoi = Seq(0xff, 0xd9)
    def jpeg(segs: Seq[Int]*) =
      (Seq(0xff, 0xd8) ++ segs.flatten ++ eoi).map(_.toByte).toArray
    val rows = Seq(
      (1L, jpeg(app0, xmp, app1(tiffLe))),   // LE behind two decoys
      (2L, jpeg(app1(tiffBe))),              // BE, APP1 first
      (3L, jpeg(app0)),                      // no exif at all
      (4L, jpeg(app0, xmp, app1(tiffLe)).take(20)), // truncated mid-walk
      (5L, jpeg(app1(tiffBad))))             // orientation ok, bad dt offset
    val out = Multimodal.withExifMeta(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("exif_meta.orientation"),
        col("exif_meta.captured_at"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === ((Some(6), Some(dt))))
    assert(out(2L) === ((Some(6), Some(dt))))
    assert(out(3L) === ((None, None)))
    assert(out(4L) === ((None, None)))
    assert(out(5L) === ((Some(6), None)))
  }

  test("withAviMeta: chunk walk past decoys with odd-length padding") {
    def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def avih(usf: Long, frames: Long, w: Long, h: Long) =
      "avih".getBytes.map(_.toInt).toSeq ++ le32(56) ++ le32(usf) ++
        le32(0) ++ le32(0) ++ le32(16) ++ le32(frames) ++ le32(0) ++
        le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
        Seq.fill(4)(le32(0)).flatten
    def hdrl(body: Seq[Int]) =
      "LIST".getBytes.map(_.toInt).toSeq ++ le32(4 + body.size) ++
        "hdrl".getBytes.map(_.toInt) ++ body
    def riff(form: String, body: Seq[Int]) =
      ("RIFF".getBytes.map(_.toInt).toSeq ++ le32(4 + body.size) ++
        form.getBytes.map(_.toInt) ++ body).map(_.toByte).toArray
    val junk = "JUNK".getBytes.map(_.toInt).toSeq ++ le32(3) ++
      Seq(1, 2, 3, 0) // odd length pads to even
    val good = riff("AVI ", junk ++ hdrl(avih(40000, 250, 640, 480)))
    val wav = riff("WAVE", Seq.empty)
    val trunc = good.take(30)
    val out = Multimodal.withAviMeta(
      Seq((1L, good), (2L, wav), (3L, trunc)).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("avi_meta.format"), col("avi_meta.width"),
        col("avi_meta.height"), col("avi_meta.total_frames"),
        col("avi_meta.duration_ms"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5))))).toMap
    assert(out(1L) === (("avi", Some(640), Some(480), Some(250L),
      Some(10000L))))
    assert(out(2L)._1 === "not_avi" && out(2L)._2.isEmpty)
    assert(out(3L)._1 === "not_avi")
  }

  test("withOggMeta: BOS page walk, segment-table offset, degradations") {
    def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def page(ptype: Int, nSegs: Int = 1, version: Int = 0,
        vorbisVer: Long = 0L): Array[Byte] = {
      val packet = Seq(ptype) ++ "vorbis".getBytes.map(_.toInt) ++
        le32(vorbisVer) ++ Seq(2) ++ le32(44100)
      ("OggS".getBytes.map(_.toInt).toSeq ++ Seq(version, 0x02) ++
        le32(123456L) ++ le32(0) ++ le32(7) ++ le32(0) ++ le32(0) ++
        Seq(nSegs) ++ Seq(16) ++ Seq.fill(nSegs - 1)(0) ++
        packet).map(_.toByte).toArray
    }
    val rows = Seq(
      (1L, page(1)),                       // well-formed ID header
      (2L, page(3)),                       // comment header first: degrade
      (3L, page(1, nSegs = 3)),            // longer segment table honored
      (4L, page(1).take(30)),              // truncated mid-packet
      (5L, page(1, version = 1)),          // unknown structure version
      (6L, page(1, vorbisVer = 7L)))       // bad vorbis version
    val out = Multimodal.withOggMeta(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("ogg_meta.format"),
        col("ogg_meta.channels"), col("ogg_meta.sample_rate"),
        col("ogg_meta.granule"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4))))).toMap
    assert(out(1L) === (("ogg", Some(2), Some(44100), Some(123456L))))
    assert(out(2L)._1 === "not_ogg" && out(2L)._2.isEmpty)
    assert(out(3L) === (("ogg", Some(2), Some(44100), Some(123456L))))
    assert(out(4L)._1 === "not_ogg")
    assert(out(5L)._1 === "not_ogg")
    assert(out(6L)._1 === "not_ogg")
  }

  test("withMkvMeta: EBML varint walk, unknown-size Segment, degradations") {
    def el(idBytes: Seq[Int], body: Seq[Int]): Seq[Int] =
      idBytes ++ Seq(0x80 | body.size) ++ body
    def head(dt: String, ver: Int): Seq[Int] =
      el(Seq(0x1A, 0x45, 0xDF, 0xA3),
        el(Seq(0x42, 0x86), Seq(1)) ++          // EBMLVersion
        el(Seq(0xEC), Seq(0, 0)) ++             // Void decoy
        el(Seq(0x42, 0x82), dt.getBytes.map(_.toInt).toSeq) ++
        el(Seq(0x42, 0x87), Seq(ver)))
    def info(ts: Long): Seq[Int] =
      el(Seq(0x15, 0x49, 0xA9, 0x66),
        el(Seq(0x2A, 0xD7, 0xB1),
          Seq(((ts >> 16) & 0xff).toInt, ((ts >> 8) & 0xff).toInt,
            (ts & 0xff).toInt)))
    val seek = el(Seq(0x11, 0x4D, 0x9B, 0x74), Seq(9, 9, 9))
    def seg(body: Seq[Int], unknown: Boolean = true): Seq[Int] =
      Seq(0x18, 0x53, 0x80, 0x67) ++
        (if (unknown) Seq(0xFF) else Seq(0x80 | body.size)) ++ body
    def bytes(xs: Seq[Int]) = xs.map(_.toByte).toArray
    val good = bytes(head("matroska", 4) ++ seg(seek ++ info(1000000L)))
    val webm = bytes(head("webm", 2) ++ seg(seek ++ info(500000L),
      unknown = false)) // known-size segment honored too
    val noInfo = bytes(head("matroska", 1) ++ seg(seek))
    val badDt = bytes(head("quicktime", 1) ++ seg(seek ++ info(1L)))
    val trunc = good.take(9)
    val rows = Seq((1L, good), (2L, webm), (3L, noInfo), (4L, badDt),
      (5L, trunc), (6L, "RIFF1234WAVE".getBytes))
    val out = Multimodal.withMkvMeta(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("mkv_meta.format"),
        col("mkv_meta.doc_type_version"), col("mkv_meta.timestamp_scale"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === (("mkv", Some(4), Some(1000000L))))
    assert(out(2L) === (("webm", Some(2), Some(500000L))))
    assert(out(3L) === (("mkv", Some(1), None)))
    assert(out(4L)._1 === "not_mkv" && out(4L)._2.isEmpty)
    assert(out(5L)._1 === "not_mkv")
    assert(out(6L)._1 === "not_mkv")
  }

  test("withGzipMeta: FLG-driven optional-field walk to the trailer") {
    def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def gz(flg: Int, extra: Seq[Int] = Nil, name: String = null,
        comment: String = null, hcrc: Boolean = false,
        isize: Long = 777L): Array[Byte] = {
      val opt = (if (extra.nonEmpty)
          Seq(extra.size & 0xff, extra.size >> 8) ++ extra else Nil) ++
        (if (name != null) name.getBytes.map(_.toInt).toSeq :+ 0 else Nil) ++
        (if (comment != null)
          comment.getBytes.map(_.toInt).toSeq :+ 0 else Nil) ++
        (if (hcrc) Seq(0x12, 0x34) else Nil)
      (Seq(0x1f, 0x8b, 8, flg) ++ le32(99L) ++ Seq(0, 3) ++ opt ++
        Seq(1, 2, 3) ++ le32(0xAABBCCDDL) ++ le32(isize))
        .map(_.toByte).toArray
    }
    val rows = Seq(
      (1L, gz(0)),                                       // no optionals
      (2L, gz(8, name = "a.txt")),                       // FNAME
      (3L, gz(4 | 8 | 16 | 2, extra = Seq(7, 7, 7),      // all four
        name = "b.bin", comment = "c", hcrc = true, isize = 123456L)),
      (4L, gz(8, name = "abcdefghijklmnop").take(20)),   // unterminated name
      (5L, gz(0).take(12)),                              // before trailer
      (6L, (Seq(0x78, 0x9c) ++ Seq.fill(20)(1)).map(_.toByte).toArray))
    val out = Multimodal.withGzipMeta(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("gzip_meta.format"), col("gzip_meta.mtime"),
        col("gzip_meta.os"), col("gzip_meta.fname"), col("gzip_meta.isize"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5))))).toMap
    assert(out(1L) === (("gzip", Some(99L), Some(3), None, Some(777L))))
    assert(out(2L) === (("gzip", Some(99L), Some(3), Some("a.txt"),
      Some(777L))))
    assert(out(3L) === (("gzip", Some(99L), Some(3), Some("b.bin"),
      Some(123456L))))
    assert(out(4L)._1 === "not_gzip")
    assert(out(5L)._1 === "not_gzip")
    assert(out(6L)._1 === "not_gzip")
  }

  test("withWavStats: reads PCM samples for peak/sumsq/rms") {
    def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def fmtChunk(channels: Int, bits: Int) =
      "fmt ".getBytes.map(_.toInt).toSeq ++ le32(16) ++ le16(1) ++
        le16(channels) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(bits)
    def wav(samples: Seq[Int], channels: Int = 1, bits: Int = 16,
        declared: Option[Long] = None): Array[Byte] = {
      val data = "data".getBytes.map(_.toInt).toSeq ++
        le32(declared.getOrElse(2L * samples.size)) ++
        samples.flatMap(s => le16(s & 0xffff))
      ("RIFF".getBytes.map(_.toInt).toSeq ++ le32(4 + 24 + data.size) ++
        "WAVE".getBytes.map(_.toInt).toSeq ++ fmtChunk(channels, bits) ++
        data).map(_.toByte).toArray
    }
    val rows = Seq(
      (1L, wav(Seq(3, -4, 0, 5))),          // sumsq 9+16+0+25=50
      (2L, wav(Seq(-32768))),               // most-negative sample
      (3L, wav(Seq(1, 2), channels = 2)),   // stereo: degrade
      (4L, wav(Seq(1, 2), bits = 8)),       // 8-bit: degrade
      (5L, wav(Seq(1, 2), declared = Some(64L))), // truncated: degrade
      (6L, wav(Seq.empty)))                 // empty data: degrade
    val out = Multimodal.withWavStats(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("wav_stats.format"),
        col("wav_stats.n_samples"), col("wav_stats.peak"),
        col("wav_stats.sumsq"), col("wav_stats.rms"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5))))).toMap
    assert(out(1L) === (("wav", Some(4L), Some(5), Some(50L),
      Some(3.5355)))) // sqrt(12.5) round-4
    assert(out(2L) === (("wav", Some(1L), Some(32768), Some(1073741824L),
      Some(32768.0))))
    Seq(3L, 4L, 5L, 6L).foreach(i =>
      assert(out(i)._1 === "not_wav" && out(i)._2.isEmpty))
  }

  test("withZipMeta: backward EOCD scan past a trailing comment") {
    def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def lfh(name: String) = Seq(0x50, 0x4b, 0x03, 0x04) ++
      Seq.fill(22)(0) ++ le16(name.length) ++ le16(0) ++
      name.getBytes.map(_.toInt).toSeq ++ Seq(9, 9)
    def cde(name: String) = Seq(0x50, 0x4b, 0x01, 0x02) ++
      Seq.fill(24)(0) ++ le16(name.length) ++ Seq.fill(16)(0) ++
      name.getBytes.map(_.toInt).toSeq
    def zip(names: Seq[String], comment: String = ""): Array[Byte] = {
      val locals = names.flatMap(lfh)
      val cd = names.flatMap(cde)
      (locals ++ cd ++ Seq(0x50, 0x4b, 0x05, 0x06) ++ Seq.fill(4)(0) ++
        le16(names.size) ++ le16(names.size) ++ le32(cd.size) ++
        le32(locals.size) ++ le16(comment.length) ++
        comment.getBytes.map(_.toInt).toSeq).map(_.toByte).toArray
    }
    val rows = Seq(
      (1L, zip(Seq("a.txt", "b.bin"))),
      (2L, zip(Seq("only.dat"), comment = "made by graft")),
      (3L, zip(Seq("x")).dropRight(5)),            // truncated EOCD
      (4L, (Seq(0x1f, 0x8b, 8) ++ Seq.fill(30)(0)).map(_.toByte).toArray))
    val out = Multimodal.withZipMeta(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("zip_meta.format"),
        col("zip_meta.n_entries"), col("zip_meta.cd_size"),
        col("zip_meta.cd_offset"), col("zip_meta.first_name"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5))))).toMap
    val l2 = 2 * (30 + 5 + 2)                       // two 5-char names
    assert(out(1L) === (("zip", Some(2), Some(2L * 51), Some(l2.toLong),
      Some("a.txt"))))
    assert(out(2L)._1 === "zip" && out(2L)._5 === Some("only.dat"))
    assert(out(3L)._1 === "not_zip")
    assert(out(4L)._1 === "not_zip")
  }

  test("withHeaderMeta parses all three WebP bitstream flavors") {
    def riff(chunk: Seq[Int]): Array[Byte] =
      ("RIFF".getBytes.map(_.toInt).toSeq ++ Seq(0, 0, 0, 0) ++
        "WEBP".getBytes.map(_.toInt).toSeq ++ chunk).map(_.toByte).toArray
    // VP8 lossy: 3-byte frame tag, start code 9d 01 2a, then 14-bit LE dims
    val vp8 = riff("VP8 ".getBytes.map(_.toInt).toSeq ++ Seq(0, 0, 0, 0) ++
      Seq(0x00, 0x00, 0x00, 0x9d, 0x01, 0x2a,
        0x40, 0x01,   // width 320
        0xf0, 0x00))  // height 240
    // VP8L lossless: sig 2f, then LSB-first 14-bit width-1 / height-1
    // width 256, height 64: v = 255 | (63 << 14)
    val v = 255 | (63 << 14)
    val vp8l = riff("VP8L".getBytes.map(_.toInt).toSeq ++ Seq(6, 0, 0, 0) ++
      Seq(0x2f, v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff,
        0))
    // VP8X extended: flags + reserved, then 24-bit LE canvas dims - 1
    val vp8x = riff("VP8X".getBytes.map(_.toInt).toSeq ++ Seq(10, 0, 0, 0) ++
      Seq(0x02, 0x00, 0x00, 0x00,
        0xff, 0x03, 0x00,   // width 1024
        0xff, 0x01, 0x00))  // height 512
    val out = Multimodal.withHeaderMeta(
      Seq((1L, vp8), (2L, vp8l), (3L, vp8x)).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("header_meta.format"),
        col("header_meta.width"), col("header_meta.height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === (("webp", Some(320), Some(240))))
    assert(out(2L) === (("webp", Some(256), Some(64))))
    assert(out(3L) === (("webp", Some(1024), Some(512))))
    // sniffFormat splits RIFF flavors by form type
    val sniffed = Seq((1L, vp8)).toDF("doc_id", "payload")
      .select(Multimodal.sniffFormat(col("payload"))).head().getString(0)
    assert(sniffed === "webp")
  }

  test("withAudioMeta walks WAV chunks for fmt and data") {
    def le16(x: Int) = Seq(x & 0xff, (x >> 8) & 0xff)
    def le32(x: Int) = Seq(x & 0xff, (x >> 8) & 0xff, (x >> 16) & 0xff, (x >> 24) & 0xff)
    // 16kHz mono 16-bit: byteRate 32000; 64000 data bytes = 2000 ms.
    // A LIST chunk with an ODD length sits in front, so the walk must pad
    val fmt = "fmt ".getBytes.map(_.toInt).toSeq ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(16000) ++ le32(32000) ++ le16(2) ++ le16(16)
    val list = "LIST".getBytes.map(_.toInt).toSeq ++ le32(3) ++ Seq(1, 2, 3, 0)
    val data = "data".getBytes.map(_.toInt).toSeq ++ le32(64000)
    val wav = ("RIFF".getBytes.map(_.toInt).toSeq ++ le32(0) ++
      "WAVE".getBytes.map(_.toInt).toSeq ++ list ++ fmt ++ data)
      .map(_.toByte).toArray
    val out = Multimodal.withAudioMeta(
      Seq((1L, wav), (2L, "RIFFxxxxAVI something".getBytes)).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("audio_meta.format"), col("audio_meta.channels"),
        col("audio_meta.sample_rate"), col("audio_meta.bits_per_sample"),
        col("audio_meta.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5))))).toMap
    assert(out(1L) === (("wav", Some(1), Some(16000), Some(16), Some(2000L))))
    assert(out(2L) === (("not_wav", None, None, None, None)))
  }

  test("withMp3Meta: syncsafe ID3 skip, bare frames, layer/version tables") {
    def mp3(b1: Int, b2: Int, b3: Int, tag: Int = -1): Array[Byte] = {
      val frame = Seq(0xff, b1, b2, b3)
      val bytes =
        if (tag < 0) frame
        else "ID3".getBytes.map(_.toInt).toSeq ++
          Seq(4, 0, 0, 0, 0, tag >> 7, tag & 0x7f) ++
          Seq.fill(tag)(0) ++ frame
      bytes.map(_.toByte).toArray
    }
    val rows = Seq(
      // ID3v2.4, 130-byte tag (syncsafe spans two bytes), V1 L3 128k
      // 44.1kHz joint stereo
      (1L, mp3(0xfb, 0x90, 0x40, tag = 130)),
      // bare frame, no tag: MPEG2 L3 -> the V2 bitrate table (idx 9=80)
      (2L, mp3(0xf3, 0x94, 0x00)),
      // V1 Layer II: version/rate parse, bitrate table out of scope
      (3L, mp3(0xfd, 0x90, 0xc0)),
      // reserved version bits -> not_mp3
      (4L, mp3(0xeb, 0x90, 0x00)),
      // reserved sample-rate index -> not_mp3
      (5L, mp3(0xfb, 0x9c, 0x00)),
      (6L, "MThd not audio at all".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.withMp3Meta(rows)
      .select(col("doc_id"), col("mp3_meta.format"),
        col("mp3_meta.id3_version"), col("mp3_meta.tag_size"),
        col("mp3_meta.mpeg_version"), col("mp3_meta.layer"),
        col("mp3_meta.bitrate_kbps"), col("mp3_meta.sample_rate"),
        col("mp3_meta.channel_mode"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          Option(r.get(7)), Option(r.get(8))))).toMap
    assert(out(1L) === (("mp3", Some(4), Some(130), Some("1"), Some(3),
      Some(128), Some(44100), Some("joint_stereo"))))
    assert(out(2L) === (("mp3", None, Some(0), Some("2"), Some(3),
      Some(80), Some(24000), Some("stereo"))))
    assert(out(3L) === (("mp3", None, Some(0), Some("1"), Some(2),
      None, Some(44100), Some("mono"))))
    assert(out(4L) === (("not_mp3", None, None, None, None, None, None, None)))
    assert(out(5L) === (("not_mp3", None, None, None, None, None, None, None)))
    assert(out(6L) === (("not_mp3", None, None, None, None, None, None, None)))
  }

  test("withVideoMeta walks MP4 boxes for ftyp brand and mvhd duration") {
    def be32(v: Long): Seq[Int] = Seq((v >> 24).toInt & 0xff,
      (v >> 16).toInt & 0xff, (v >> 8).toInt & 0xff, v.toInt & 0xff)
    def fourcc(s: String): Seq[Int] = s.getBytes.map(_.toInt).toSeq
    // ftyp: major brand isom, minor version, one compatible brand
    val ftyp = be32(20) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32(0) ++
      fourcc("mp41")
    // mvhd v0: version+flags, ctime, mtime, timescale=1000, duration=5000
    val mvhdBody = Seq(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(1000) ++
      be32(5000) ++ Seq.fill(80)(0) // rate/volume/matrix/next_track padding
    val mvhd = be32(8L + mvhdBody.length) ++ fourcc("mvhd") ++ mvhdBody
    val moov = be32(8L + mvhd.length) ++ fourcc("moov") ++ mvhd
    // a free box between ftyp and moov exercises the skip path
    val free = be32(16) ++ fourcc("free") ++ Seq.fill(8)(0)
    val mp4 = (ftyp ++ free ++ moov).map(_.toByte).toArray
    val out = Multimodal.withVideoMeta(
      Seq((1L, mp4), (2L, "not a video".getBytes)).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("video_meta.format"),
        col("video_meta.major_brand"), col("video_meta.timescale"),
        col("video_meta.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out(1L) === (("mp4", Some("isom"), Some(1000L), Some(5000L))))
    assert(out(2L) === (("not_mp4", None, None, None)))
    // format sniffing routes the same payload
    val sniffed = Seq((1L, mp4)).toDF("doc_id", "payload")
      .select(Multimodal.sniffFormat(col("payload"))).head.getString(0)
    assert(sniffed === "mp4")
  }

  test("dHash64: known grid, unsigned bytes, truncation nulls") {
    // row r filled with ascending pixels -> every comparison left<right
    // -> all 64 bits set -> hash == -1 (two's complement all-ones)
    val ascending = Array.tabulate(72)(n => (n % 9 * 20).toByte)
    // descending rows -> no bit set
    val descending = Array.tabulate(72)(n => ((8 - n % 9) * 20).toByte)
    // unsigned compare: 0x7f (127) < 0x80 (128) even though signed says otherwise
    val signedEdge = Array.tabulate(72)(n => if (n % 9 % 2 == 0) 0x7f.toByte else 0x80.toByte)
    val rows = Seq((1L, ascending), (2L, descending), (3L, signedEdge),
      (4L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.dHash64(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L) === Some(-1L))
    assert(rows(2L) === Some(0L))
    // alternating 127,128,127,... -> bits set exactly where left==127
    val kernelEdge = org.apache.spark.sql.graft.DHash64.hash(signedEdge)
    assert(rows(3L) === Some(kernelEdge) && kernelEdge != 0L)
    assert(rows(4L) === None)
  }

  test("phashNearDup: band keys mask, not mod — mixed-sign hashes pair") {
    // build a grid realizing an exact dHash bit pattern: each row walks
    // ±1 from 100 so comparison c of row r is exactly bit r*8+c
    def gridOf(hash: Long): Array[Byte] = {
      val g = new Array[Byte](72)
      for (r <- 0 until 8) {
        var p = 100
        g(r * 9) = p.toByte
        for (c <- 0 until 8) {
          p = if (((hash >>> (r * 8 + c)) & 1L) == 1L) p + 1 else p - 1
          g(r * 9 + c + 1) = p.toByte
        }
      }
      g
    }
    // A has bit 63 set (negative hash); B positive; they differ in bits
    // 63/47/31 (one per band 1-3) and agree on the low 16 — so band 0
    // is the ONLY collision chance, and a signed % key (the fixed bug)
    // would put them in different buckets and lose the Hamming-3 pair
    val a = 0x8000800080000005L
    val b = 0x0000000000000005L
    assert(org.apache.spark.sql.graft.DHash64.hash(gridOf(a)) === a)
    assert(org.apache.spark.sql.graft.DHash64.hash(gridOf(b)) === b)
    val out = Multimodal.phashNearDup(
      Seq((1L, gridOf(a)), (2L, gridOf(b))).toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 3)))
  }

  test("r13 withPdfMeta: version/count/trailer parse; decoys, nulls, " +
      "truncations and count-less PDFs all degrade") {
    val good = "%PDF-1.7\n1 0 obj <</Type /Pages /Kids [] /Count 12>> " +
      "endobj\ntrailer\n%%EOF"
    val noEof = "%PDF-1.4\n1 0 obj <</Type /Pages /Count 3>> endobj\n"
    val noCount = "%PDF-2.0\nsome body\n%%EOF"
    val rows = Seq(
      (1L, good.getBytes("UTF-8")),
      (2L, noEof.getBytes("UTF-8")),
      (3L, noCount.getBytes("UTF-8")),
      (4L, Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)), // png magic
      (5L, null.asInstanceOf[Array[Byte]]),
      (6L, "%PDF".getBytes("UTF-8"))                    // cut mid-magic
    ).toDF("doc_id", "payload")
    val out = Multimodal.withPdfMeta(rows)
      .select("doc_id", "is_pdf", "pdf_version", "pdf_pages", "pdf_eof_ok")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          r.getBoolean(4)))).toMap
    assert(out(1L) === ((true, Some("1.7"), Some(12), true)))
    assert(out(2L) === ((true, Some("1.4"), Some(3), false)))
    assert(out(3L) === ((true, Some("2.0"), None, true)))
    assert(out(4L) === ((false, None, None, false)))
    assert(out(5L) === ((false, None, None, false)))
    assert(out(6L) === ((false, None, None, false)))
    // the sniffer routes pdf alongside the image formats
    val fmt = Multimodal
      .withPdfMeta(rows)
      .select(col("doc_id"), Multimodal.sniffFormat(col("payload")))
      .as[(Long, String)].collect().toMap
    assert(fmt(1L) === "pdf" && fmt(4L) === "png")
  }

  test("r13 withSrtMeta: cue count + cued milliseconds; hour/minute " +
      "rollover exact; prose, malformed arrows and nulls degrade") {
    val real = "1\n00:59:58,750 --> 01:00:01,250\nhello\n\n" +
      "2\n01:00:02,000 --> 01:00:03,000\nworld\n"
    val rows = Seq(
      (1L, real.getBytes("UTF-8")),
      (2L, "just some prose".getBytes("UTF-8")),
      (3L, "1\n00:00:00,000 ==> 00:00:01,000\nbad arrow\n".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "payload")
    val out = Multimodal.withSrtMeta(rows)
      .select("doc_id", "is_srt", "n_cues", "cued_ms")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getLong(3)))).toMap
    // cue 1 crosses the hour boundary: 3600.0+1.25 − 3598.75 = 2500 ms
    assert(out(1L) === ((true, 2, 3500L)), s"got ${out(1L)}")
    assert(out(2L) === ((false, 0, 0L)))
    assert(out(3L) === ((false, 0, 0L)))
    assert(out(4L) === ((false, 0, 0L)))
  }

  test("r14 withTarMeta: USTAR walk — checksum verify, block hop, " +
      "terminator stop; prose, truncation and bad checksums degrade") {
    val good = Multimodal.buildUstar(Seq(("a.txt", 5L), ("b/c.txt", 700L)))
    // cut mid-payload of the second member (drop terminator + 100)
    val cut = good.dropRight(1024 + 100)
    // corrupt the FIRST header's checksum field
    val badck = good.clone(); badck(150) = '9'.toByte
    // corrupt the SECOND header's checksum (first member spans 1024)
    val badck2 = good.clone(); badck2(1024 + 150) = '9'.toByte
    // garbage after a valid member (magic gone at the second header)
    val garb = good.take(1024) ++ Array.fill(512)('q'.toByte)
    val rows = Seq(
      (1L, good), (2L, cut), (3L, badck), (4L, badck2), (5L, garb),
      (6L, "plain prose, not an archive".getBytes("US-ASCII")),
      (7L, null.asInstanceOf[Array[Byte]]),
      (8L, Multimodal.buildUstar(Nil)) // empty archive: just terminator
    ).toDF("doc_id", "payload")
    val out = Multimodal.withTarMeta(rows)
      .select(col("doc_id"), col("tar_meta.*"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) === ((true, 2, 705L, true, false)))
    // member 2's header is intact but its payload span runs out
    assert(out(2L) === ((true, 1, 5L, true, true)))
    assert(out(3L) === ((false, 0, 0L, false, false)))
    assert(out(4L) === ((true, 1, 5L, false, false)))
    assert(out(5L) === ((true, 1, 5L, true, true)))
    assert(out(6L) === ((false, 0, 0L, false, false)))
    assert(out(7L) === ((false, 0, 0L, false, false)))
    assert(out(8L) === ((false, 0, 0L, false, false)))
    // the builder's blocks are real USTAR: 512-aligned, magic at 257
    assert(good.length === 512 + 512 + 512 + 1024 + 1024)
    assert(new String(good.slice(257, 262), "US-ASCII") === "ustar")
  }

  test("r14 withWarcMeta: record hop by declared length; overruns, " +
      "missing separators and header damage degrade, never throw") {
    def rec(ver: String, typ: String, body: String,
        declared: Option[Long] = None, lenField: String = "Content-Length")
        : String =
      s"WARC/$ver\r\n$lenField: ${declared.getOrElse(body.length.toLong)}" +
        s"\r\nWARC-Type: $typ\r\n\r\n$body\r\n\r\n"
    val good = rec("1.0", "response", "hello WARC/1.0 inside") +
      rec("1.0", "request", "q=1") + rec("1.0", "response", "x" * 40)
    // declared overrun on the LAST record (interrupted download)
    val overrun = rec("1.1", "response", "abc") +
      rec("1.1", "response", "abcdef", declared = Some(99L))
    // separator missing: content flows into the next record's magic
    val nosep = rec("1.0", "response", "abc").dropRight(2) +
      rec("1.0", "response", "def")
    // header field case-insensitivity (spec: field names are)
    val lower = rec("1.0", "response", "abcd", lenField = "content-length")
    // no Content-Length at all: unwalkable
    val nolen = "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    // garbage between records
    val garb = rec("1.0", "response", "abc") + "JUNK" +
      rec("1.0", "response", "def")
    val rows = Seq(
      (1L, good.getBytes("US-ASCII")),
      (2L, overrun.getBytes("US-ASCII")),
      (3L, nosep.getBytes("US-ASCII")),
      (4L, lower.getBytes("US-ASCII")),
      (5L, nolen.getBytes("US-ASCII")),
      (6L, garb.getBytes("US-ASCII")),
      (7L, "plain prose".getBytes("US-ASCII")),
      (8L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "payload")
    val out = Multimodal.withWarcMeta(rows)
      .select(col("doc_id"), col("warc_meta.*"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)), r.getInt(3),
          r.getInt(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(1L) === ((true, Some("1.0"), 3, 2, 64L, false)))
    assert(out(2L) === ((true, Some("1.1"), 1, 1, 3L, true)))
    // the missing separator lands mid-"WARC/..." → overrun detected
    assert(out(3L)._6 === true && out(3L)._3 === 0)
    assert(out(4L) === ((true, Some("1.0"), 1, 1, 4L, false)))
    assert(out(5L) === ((true, Some("1.0"), 0, 0, 0L, true)))
    assert(out(6L) === ((true, Some("1.0"), 1, 1, 3L, true)))
    assert(out(7L) === ((false, None, 0, 0, 0L, false)))
    assert(out(8L) === ((false, None, 0, 0, 0L, false)))
  }

  test("r15 warc.gz: member-per-record and whole-file gzip walk " +
      "identically to the plaintext walk; damaged gzip degrades to " +
      "truncated") {
    def rec(typ: String, body: String): String =
      s"WARC/1.0\r\nContent-Length: ${body.length}\r\nWARC-Type: $typ" +
        s"\r\n\r\n$body\r\n\r\n"
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val recs = Seq(rec("response", "hello page"), rec("request", "q=1"),
      rec("response", "x" * 40))
    val plain = recs.mkString.getBytes("US-ASCII")
    // the Common Crawl wild format: ONE gzip member PER RECORD
    val perRecord = recs.map(r => gz(r.getBytes("US-ASCII")))
      .reduce(_ ++ _)
    // whole-file single member
    val whole = gz(plain)
    // damaged: truncate the gzip stream mid-member
    val cut = whole.dropRight(25)
    // gzip of NON-WARC prose: inflates fine, is_warc false
    val prose = gz("just some prose".getBytes("US-ASCII"))
    val rows = Seq((1L, plain), (2L, perRecord), (3L, whole),
      (4L, cut), (5L, prose)).toDF("doc_id", "payload")
    val out = Multimodal.withWarcMeta(rows)
      .select(col("doc_id"), col("warc_meta.*"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)), r.getInt(3),
          r.getInt(4), r.getLong(5), r.getBoolean(6)))).toMap
    val expect = (true, Some("1.0"), 3, 2, 53L, false)
    assert(out(1L) === expect)
    assert(out(2L) === expect) // gz walks ≡ the plaintext walk
    assert(out(3L) === expect)
    assert(out(4L)._1 === true && out(4L)._6 === true) // damaged → truncated
    assert(out(5L) === ((false, None, 0, 0, 0L, false)))
    // responses extract identically through the gz path
    val resp = Multimodal.warcResponses(rows.filter(col("doc_id") <= 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(resp === Set(
      (1L, 1, "hello page"), (1L, 3, "x" * 40),
      (2L, 1, "hello page"), (2L, 3, "x" * 40),
      (3L, 1, "hello page"), (3L, 3, "x" * 40)))
  }

  test("r15 withGzipInflated: round-trip byte counts, ISIZE check, " +
      "multi-member None, damage degrades") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val body = ("payload " * 40).getBytes("US-ASCII")
    val single = gz(body)
    val multi = gz(body) ++ gz("tail".getBytes("US-ASCII"))
    val cut = single.dropRight(6)
    val rows = Seq((1L, single), (2L, multi), (3L, cut),
      (4L, "prose".getBytes("US-ASCII")),
      (5L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.withGzipInflated(rows)
      .select(col("doc_id"), col("gzip_inflated.*"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Boolean]),
          r.getBoolean(4)))).toMap
    assert(out(1L) === (("gzip", body.length.toLong, Some(true), false)))
    assert(out(2L) === (("gzip", body.length.toLong + 4L, None, false)))
    assert(out(3L)._1 === "gzip" && out(3L)._4 === true)
    assert(out(4L) === (("not_gzip", 0L, None, false)))
    assert(out(5L) === (("not_gzip", 0L, None, false)))
  }

  test("r15 withWarcMeta: hostile declared lengths (negative, " +
      "Long.MaxValue overflow) degrade to truncated, never throw") {
    def rec(typ: String, body: String, declared: Long): String =
      s"WARC/1.0\r\nContent-Length: $declared\r\nWARC-Type: $typ" +
        s"\r\n\r\n$body\r\n\r\n"
    // a negative length whose content starts with CRLF would previously
    // reach new String(p, cStart, -2) and throw; now: truncated
    val neg = rec("response", "ok", 2L) + rec("response", "\r\nxyz", -2L)
    // a length near Long.MaxValue overflows recEnd + 4 past the bounds
    // check so p(recEnd.toInt) would previously throw AIOOBE
    val huge = rec("response", "ok", 2L) +
      rec("response", "abc", Long.MaxValue - 2L)
    val rows = Seq(
      (1L, neg.getBytes("US-ASCII")),
      (2L, huge.getBytes("US-ASCII"))).toDF("doc_id", "payload")
    val out = Multimodal.withWarcMeta(rows)
      .select(col("doc_id"), col("warc_meta.*"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(3), r.getInt(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    // both: the one intact leading record counts, the hostile tail is
    // the truncated arm — identical to the interrupted-download shape
    assert(out(1L) === ((true, 1, 1, 2L, true)))
    assert(out(2L) === ((true, 1, 1, 2L, true)))
  }

  test("r14 warcResponses: responses only, 1-based record indices, " +
      "UTF-8 decode, damaged tails contribute nothing") {
    def rec(typ: String, body: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $typ\r\nContent-Length: ${body.length}" +
        "\r\n\r\n").getBytes("US-ASCII") ++ body ++
        "\r\n\r\n".getBytes("US-ASCII")
    val utf8 = "café 中文".getBytes("UTF-8")
    val good = rec("request", "q=1".getBytes) ++
      rec("response", utf8) ++ rec("response", "plain".getBytes)
    // a declared overrun after one good response: the tail vanishes
    val cut = rec("response", "ok".getBytes) ++
      ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nabc")
        .getBytes("US-ASCII")
    val rows = Seq(
      (1L, good), (2L, cut),
      (3L, "prose".getBytes("US-ASCII")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.warcResponses(rows)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(out === Set(
      (1L, 2, "café 中文"),  // request at idx 1 skipped
      (1L, 3, "plain"),
      (2L, 1, "ok")))                     // the overrun tail is gone
  }

  test("phashNearDup: planted pair found, perturbed grid within Hamming 3") {
    def grid(seed: Long) =
      Array.tabulate(72)(n => ((seed * 1000003L + n * 2654435761L) % 251).toByte)
    val nearA = grid(10)
    val nearB = grid(10).clone(); nearB(40) = (nearB(40) + 2).toByte
    val rows = Seq((1L, grid(1)), (2L, grid(2)), (10L, nearA), (11L, nearB),
      (5L, Array[Byte](9, 9))).toDF("doc_id", "payload")
    val out = Multimodal.phashNearDup(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.map(p => (p._1, p._2)).toSet === Set((10L, 11L)))
    assert(out.head._3 <= 2)
  }
}
