package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hydrate.Hydrate

class HydrateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val files = Seq(
    ("m.py", "line1\nline2\nline3\nline4\nline5")
  ).toDF("file_path", "content")

  test("hydrating a frame that itself has file_path/content columns works") {
    // node frames carry file_path (and may carry content) — the files
    // join must not make those references ambiguous (round-4 regression)
    val results = Seq(
      ("n1", "m.py", "own content", """<CODE>{"S":1,"E":2,"F":"m.py"}</CODE>"""))
      .toDF("full_name", "file_path", "content", "ref")
    val out = Hydrate.processString(results, files, "ref", outCol = "code")
      .collect()(0)
    assert(out.getAs[String]("code") === "line1\nline2")
    assert(out.getAs[String]("file_path") === "m.py")     // untouched
    assert(out.getAs[String]("content") === "own content") // untouched
  }

  test("parsePointer extracts the <CODE> JSON pointer (B11)") {
    val out = Seq("""prefix <CODE>{"S":2,"E":4,"F":"m.py"}</CODE> suffix""")
      .toDF("s").select(Hydrate.parsePointer(col("s")).as("p"))
      .select("p.S", "p.E", "p.F").collect()(0)
    assert((out.getInt(0), out.getInt(1), out.getString(2)) === ((2, 4, "m.py")))
  }

  test("sliceLines takes 1-based inclusive line ranges (C14)") {
    val out = files.select(
      Hydrate.sliceLines(col("content"), lit(2), lit(4)).as("s"))
      .as[String].collect()(0)
    assert(out === "line2\nline3\nline4")
  }

  test("fold truncates with ellipsis beyond foldedLen") {
    val out = Seq("abcdefghij").toDF("s")
      .select(Hydrate.fold(col("s"), 4).as("f")).as[String].collect()(0)
    assert(out === "abcd...")
    val short = Seq("abc").toDF("s")
      .select(Hydrate.fold(col("s"), 4).as("f")).as[String].collect()(0)
    assert(short === "abc")
  }

  test("hydrate replaces pointers in place; pointer-free rows pass through") {
    val results = Seq(
      ("m.C", """<CODE>{"S":1,"E":2,"F":"m.py"}</CODE>"""),
      ("m.D", "no pointer here")
    ).toDF("full_name", "ref")
    val out = Hydrate.hydrate(results, files, "ref", foldedLen = 100)
      .select("full_name", "code").as[(String, String)].collect().toMap
    assert(out("m.C") === "line1\nline2")
    assert(out("m.D") === "no pointer here")
  }

  test("processString hydrates ALL pointers, folding only when >1 snippet" +
      " and len > foldedLen (graphDB.py:237-257, byte-for-byte)") {
    val results = Seq((1L,
      """A <CODE>{"S":1,"E":3,"F":"m.py"}</CODE> B <CODE>{"S":4,"E":5,"F":"m.py"}</CODE>"""
    )).toDF("id", "s")
    val out = Hydrate.processString(results, files, "s", foldedLen = 10)
      .select("code").as[String].collect()(0)
    // snippet1 = "line1\nline2\nline3" (17 chars) -> strip[:10] + suffix;
    // snippet2 = "line4\nline5" (11 chars) -> folded too — matches the
    // reference's process_string("A <CODE>…</CODE> B <CODE>…</CODE>")
    assert(out === "A line1\nline...(code folded) B line4\nline...(code folded)")
  }

  test("processString: single long snippet is NEVER folded (len(matches)==1)") {
    val results = Seq((1L, """<CODE>{"S":1,"E":5,"F":"m.py"}</CODE>""")).toDF("id", "s")
    val out = Hydrate.processString(results, files, "s", foldedLen = 10)
      .select("code").as[String].collect()(0)
    assert(out === "line1\nline2\nline3\nline4\nline5")
  }

  test("processString: multi-pointer record folds only the long snippet") {
    val results = Seq((1L,
      """<CODE>{"S":1,"E":1,"F":"m.py"}</CODE>|<CODE>{"S":2,"E":5,"F":"m.py"}</CODE>"""
    )).toDF("id", "s")
    val out = Hydrate.processString(results, files, "s", foldedLen = 10)
      .select("code").as[String].collect()(0)
    // "line1" (5 chars <= 10) stays whole; lines 2-5 (23 chars) fold
    assert(out === "line1|line2\nline...(code folded)")
  }

  test("processString: missing file hydrates to '' (graphDB.py:216-217)") {
    val results = Seq((1L, """x<CODE>{"S":1,"E":2,"F":"gone.py"}</CODE>y"""))
      .toDF("id", "s")
    val out = Hydrate.processString(results, files, "s", foldedLen = 10)
      .select("code").as[String].collect()(0)
    assert(out === "xy")
  }

  test("processString: start line clamps to 1, inverted range yields ''") {
    val results = Seq(
      (1L, """<CODE>{"S":0,"E":2,"F":"m.py"}</CODE>"""),
      (2L, """<CODE>{"S":4,"E":2,"F":"m.py"}</CODE>""")
    ).toDF("id", "s")
    val out = Hydrate.processString(results, files, "s", foldedLen = 100)
      .orderBy("id").select("code").as[String].collect()
    assert(out(0) === "line1\nline2")
    assert(out(1) === "")
  }
}
