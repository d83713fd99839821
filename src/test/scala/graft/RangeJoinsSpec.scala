package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoins

class RangeJoinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("slidingCount counts same-key rows in [ts-w, ts], zero-match kept") {
    val us = 1000000L
    val probe = Seq(
      ("u1", 1L, 100 * us), // u1 views at 50s, 95s, 100s are in [40s, 100s]
      ("u1", 2L, 400 * us), // nothing within [340s, 400s]
      ("u2", 3L, 50 * us)   // other key: only u2's view at 50s counts
    ).toDF("key", "id", "ts_us")
    val build = Seq(
      ("u1", 95 * us), ("u1", 100 * us), // boundary: ts itself included
      ("u1", 39 * us),                   // just outside probe 1's window
      ("u2", 50 * us), ("u1", 50 * us)
    ).toDF("key", "ts_us")
    val out = RangeJoins.slidingCount(probe, build, windowSec = 60)
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("slidingCount band fan-out never double-counts a build row") {
    val us = 1000000L
    // build row at 65s sits in bucket 1 (60s bands); probe at 70s fans
    // out to buckets 0 and 1 — the build row must count exactly once
    val probe = Seq(("k", 1L, 70 * us)).toDF("key", "id", "ts_us")
    val build = Seq(("k", 65 * us), ("k", 15 * us)).toDF("key", "ts_us")
    val out = RangeJoins.slidingCount(probe, build, windowSec = 60)
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L)) // 65s in-window, 15s in-window (70-60=10)
  }
}
