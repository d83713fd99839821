package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val nodes = Seq(
    ("m.A", "CLASS", Seq("t1"), Some("m.py"), 10.0),
    ("m.B", "CLASS", Seq("t1", "t2"), Some("m.py"), 20.0),
    ("m.f", "FUNCTION", Seq("t2"), Some("m.py"), 5.0),
    ("ext.X", "none", Seq("t1"), None, 0.0)
  ).toDF("full_name", "label", "task_ids", "file_path", "prop_num")

  private val edges = Seq(
    ("m.A", "HAS_METHOD", "m.A.go"),
    ("m.A", "INHERITS", "m.B"),
    ("m.f", "CALL", "ext.X")
  ).toDF("src", "rel_type", "dst")

  test("nodeByKey: point lookup (B1)") {
    assert(GraphOps.nodeByKey(nodes, "m.A").count() === 1)
    assert(GraphOps.nodeByKey(nodes, "nope").count() === 0)
  }

  test("nodesByLabelProp filters label and predicate (B2)") {
    val out = GraphOps.nodesByLabelProp(nodes, "CLASS", col("prop_num") > 15).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("m.B"))
  }

  test("expand follows typed edges from a source set (B3-B5)") {
    val out = GraphOps.expand(nodes, edges, "INHERITS", col("full_name") === "m.A")
    assert(out.select("dst").as[String].collect().toSeq === Seq("m.B"))
  }

  test("clearTask removes task nodes and cascades to incident edges (A5)") {
    val (n2, e2) = GraphOps.clearTask(nodes, edges, "t1")
    // only m.f survives (t2-only); m.B survives (t1 AND t2? no: filter is
    // NOT array_contains(t1) -> m.B is dropped because it carries t1)
    assert(n2.select("full_name").as[String].collect().toSet === Set("m.f"))
    assert(e2.count() === 0) // every edge touched a dropped node
  }

  test("stripPathPrefix strips only matching prefixes (A7)") {
    val df = Seq("/repo/a.py", "/other/b.py").toDF("file_path")
    val out = GraphOps.stripPathPrefix(df, "file_path", "/repo/")
      .as[String].collect().toSeq
    assert(out === Seq("a.py", "/other/b.py"))
  }

  test("carryForward adds new task except for changed files (D5)") {
    val out = GraphOps.carryForward(nodes, "t3", Seq("m.py"))
      .select("full_name", "task_ids").as[(String, Seq[String])].collect().toMap
    assert(out("m.A") === Seq("t1"))          // m.py changed -> not carried
    assert(out("ext.X") === Seq("t1", "t3"))  // no file -> carried
  }

  test("promoteLabel replaces the placeholder only when a kind arrives (A2)") {
    val df = Seq(
      (Seq("none"), "CLASS"),
      (Seq("none"), "none"),
      (Seq("t", "CLASS"), "FUNCTION")
    ).toDF("labels", "kind")
      .select(GraphOps.promoteLabel(col("labels"), col("kind")).as("out"))
      .as[Seq[String]].collect()
    assert(df(0) === Seq("CLASS"))
    assert(df(1) === Seq("none"))
    assert(df(2) === Seq("t", "CLASS")) // no placeholder -> untouched
  }

  test("kindOf picks the kind out of a multi-label set (B9)") {
    val out = Seq(Seq("t1", "CLASS"), Seq("t1", "none"))
      .toDF("labels")
      .select(GraphOps.kindOf(col("labels"), Seq("CLASS", "FUNCTION")).as("k"))
      .as[Option[String]].collect()
    assert(out(0) === Some("CLASS"))
    assert(out(1) === None)
  }
}
