package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.Analytics

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pageRank: sinks accumulate rank, values deterministic across runs") {
    // star into "hub": a,b,c -> hub ; chain hub -> top
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "top"))
      .toDF("src", "dst")
    val pr = Analytics.pageRank(edges, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(pr("top") > pr("hub"))
    assert(pr("hub") > pr("a"))
    assert(pr("a") === pr("b"))
    val again = Analytics.pageRank(edges, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(pr === again)
  }

  test("connectedComponents: min-id label per undirected component") {
    val edges = Seq(("b", "a"), ("c", "b"), ("y", "z"), ("x", "y"))
      .toDF("src", "dst")
    val cc = Analytics.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(cc("a") === "a" && cc("b") === "a" && cc("c") === "a")
    assert(cc("x") === "x" && cc("y") === "x" && cc("z") === "x")
  }
}
