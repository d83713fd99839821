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

  test("hydrate joins pointers against file contents and folds") {
    val results = Seq(
      ("m.C", """<CODE>{"S":1,"E":2,"F":"m.py"}</CODE>"""),
      ("m.D", "no pointer here")
    ).toDF("full_name", "ref")
    val out = Hydrate.hydrate(results, files, "ref", foldedLen = 100)
      .select("full_name", "code").as[(String, Option[String])].collect().toMap
    assert(out("m.C") === Some("line1\nline2"))
    assert(out("m.D") === None)
  }
}
