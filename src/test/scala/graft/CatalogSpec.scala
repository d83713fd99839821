package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QueryCatalog

/** Contract guards on the declared-query catalog itself — the driver's
  * correctness gate only checks queries that carry an oracle, so a
  * query/oracle key mismatch would silently WEAKEN the gate (rows-only
  * check) rather than fail it. */
class CatalogSpec extends AnyFunSuite {

  test("every declared query carries an oracle, and vice versa") {
    val q = QueryCatalog.queries.keySet
    val o = QueryCatalog.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL strings are non-degenerate") {
    QueryCatalog.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name has an empty oracle")
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
      // the strict-val init-order hazard: a val referencing a later val
      // interpolates the string "null" (the normSql lesson, memory #4)
      assert(!sql.contains(" null AS") && !sql.startsWith("null"),
        s"$name oracle interpolated a null (val init order): $sql")
      // an unexpanded scala interpolation looks like $name or ${...};
      // a bare `$.` is a legitimate JSON path
      assert(!"""\$[A-Za-z{]""".r.findFirstIn(sql).isDefined,
        s"$name oracle has an unexpanded interpolation")
    }
  }

  test("SparkEntry exposes the catalog unchanged") {
    assert(SparkEntry.queries.keySet === QueryCatalog.queries.keySet)
    assert(SparkEntry.oracleSql === QueryCatalog.oracleSql)
  }
}
