package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.store.SqliteFile
import graft.store.SqliteFile._

/** The minimal SQLite file writer/reader: varint and record codecs,
  * multi-page b-trees, overflow chains, and full-file round-trips. The
  * reader is an independent page-walk, so a green round-trip checks the
  * writer's page layout cell by cell. */
class SqliteFileSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempFile("graft-sqlite", ".db").toString

  test("varint codec round-trips boundary values") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 31) - 1,
      1L << 31, (1L << 56) - 1, 1L << 56, Long.MaxValue, -1L, Long.MinValue)
    vals.foreach { v =>
      val b = SqliteFile.varint(v)
      val (got, n) = SqliteFile.readVarint(b, 0)
      assert(got === v, s"varint($v)")
      assert(n === b.length)
    }
  }

  test("record codec round-trips ints, text, null, unicode") {
    val rows = Seq(
      Seq(SqlInt(0), SqlInt(1), SqlInt(-1), SqlNull),
      Seq(SqlInt(Long.MaxValue), SqlInt(Long.MinValue), SqlInt(42)),
      Seq(SqlText(""), SqlText("héllo wörld ✓"), SqlInt(1L << 40)),
      Seq(SqlText("a" * 500), SqlNull, SqlInt(-123456789L)))
    rows.foreach { r =>
      assert(SqliteFile.decodeRecord(SqliteFile.record(r)) === r)
    }
  }

  test("file round-trip: small tables, empty table, rowid order") {
    val t1 = Table("alpha", "CREATE TABLE alpha(id INTEGER, name TEXT)",
      Seq(Seq(SqlInt(7), SqlText("x")), Seq(SqlInt(-9), SqlNull)))
    val t2 = Table("empty", "CREATE TABLE empty(a TEXT)", Seq.empty)
    val p = tmp()
    SqliteFile.write(p, Seq(t1, t2))
    val got = SqliteFile.read(p)
    assert(got.keySet === Set("alpha", "empty"))
    assert(got("alpha") === t1.rows)
    assert(got("empty").isEmpty)
  }

  test("file round-trip: multi-page tree (interior pages) keeps order") {
    // ~4000 rows × ~40 bytes ≫ one 4096-byte leaf → several leaves + an
    // interior level; reader must return rowid order exactly
    val rows = (1 to 4000).map(i =>
      Seq(SqlInt(i.toLong), SqlText(s"row-$i-" + "pad" * 5)))
    val p = tmp()
    SqliteFile.write(p, Seq(Table("big", "CREATE TABLE big(id INTEGER, t TEXT)", rows)))
    assert(SqliteFile.read(p)("big") === rows)
  }

  test("file round-trip: oversized record spills to an overflow chain") {
    // 3 pages' worth of text in one record, plus neighbours on both sides
    val big = SqlText("lorem-" * 2500) // 15000 bytes
    val rows = Seq(
      Seq(SqlInt(1), SqlText("before")),
      Seq(SqlInt(2), big),
      Seq(SqlInt(3), SqlText("after")))
    val p = tmp()
    SqliteFile.write(p, Seq(Table("ovfl", "CREATE TABLE ovfl(id INTEGER, t TEXT)", rows)))
    assert(SqliteFile.read(p)("ovfl") === rows)
  }

  test("header carries magic, page size, page count") {
    val p = tmp()
    SqliteFile.write(p,
      Seq(Table("t", "CREATE TABLE t(a INTEGER)", Seq(Seq(SqlInt(5))))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(new String(bytes, 0, 15, "UTF-8") === "SQLite format 3")
    assert((((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)) === 4096)
    val pages = ((bytes(28) & 0xff) << 24) | ((bytes(29) & 0xff) << 16) |
      ((bytes(30) & 0xff) << 8) | (bytes(31) & 0xff)
    assert(pages.toLong * 4096 === bytes.length.toLong)
  }

  // ---------------------------------------------------------------------
  // Independent-implementation gate: every page layout the writer can
  // emit is opened by a REAL SQLite (python3's stdlib sqlite3, a thin
  // binding over the canonical C library) — not just by the repo's own
  // reader, which could share a misreading of the file-format spec.
  // Asserts: PRAGMA integrity_check == ok, sqlite_master enumerates the
  // tables, and every row round-trips value-for-value in rowid order.
  // ---------------------------------------------------------------------

  /** Dump `db` via real SQLite into one tagged line per row (base64 for
    * text so delimiters/unicode can't collide), tables sorted by name. */
  private def realSqliteDump(db: String): String = {
    val script =
      """import sys, sqlite3, base64, json
        |con = sqlite3.connect(sys.argv[1])
        |ic = con.execute('PRAGMA integrity_check').fetchall()
        |print('INTEGRITY\t' + ';'.join(r[0] for r in ic))
        |tables = sorted(r[0] for r in con.execute(
        |    "SELECT name FROM sqlite_master WHERE type='table'"))
        |for t in tables:
        |    print('TABLE\t' + t)
        |    for row in con.execute(f'SELECT rowid, * FROM "{t}" ORDER BY rowid'):
        |        cells = []
        |        for v in row[1:]:
        |            if v is None: cells.append('N')
        |            elif isinstance(v, int): cells.append('I:%d' % v)
        |            else: cells.append('T:' + base64.b64encode(v.encode()).decode())
        |        print('ROW\t' + '\t'.join(cells))
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("sqldump", ".py")
    java.nio.file.Files.writeString(f, script)
    val pb = new ProcessBuilder("python3", f.toString, db)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    assert(rc === 0, s"python3 sqlite3 failed (rc=$rc):\n$out")
    out
  }

  private def tag(v: SqlVal): String = v match {
    case SqlNull => "N"
    case SqlInt(i) => s"I:$i"
    case SqlText(t) => "T:" + java.util.Base64.getEncoder
      .encodeToString(t.getBytes("UTF-8"))
  }

  private def expectedDump(tables: Seq[Table]): String = {
    val sb = new StringBuilder("INTEGRITY\tok\n")
    tables.sortBy(_.name).foreach { t =>
      sb.append("TABLE\t").append(t.name).append('\n')
      t.rows.foreach(r => sb.append("ROW\t")
        .append(r.map(tag).mkString("\t")).append('\n'))
    }
    sb.toString
  }

  test("real SQLite opens the file: integrity ok, rows match (all layouts)") {
    assume(new ProcessBuilder("python3", "-c", "import sqlite3")
      .start().waitFor() == 0, "python3+sqlite3 unavailable")
    // one database exercising every writer code path: a multi-page tree
    // (interior level), an overflow-chain record, an empty table, and a
    // small table with unicode / negative ints / nulls
    val big = Table("big", "CREATE TABLE big(id INTEGER, t TEXT)",
      (1 to 4000).map(i => Seq(SqlInt(i.toLong), SqlText(s"row-$i-" + "pad" * 5))))
    val ovfl = Table("ovfl", "CREATE TABLE ovfl(id INTEGER, t TEXT)",
      Seq(Seq(SqlInt(1), SqlText("before")),
        Seq(SqlInt(2), SqlText("lorem-" * 2500)),
        Seq(SqlInt(3), SqlText("after"))))
    val small = Table("small", "CREATE TABLE small(id INTEGER, name TEXT)",
      Seq(Seq(SqlInt(-9), SqlText("héllo ✓")), Seq(SqlInt(Long.MaxValue), SqlNull),
        Seq(SqlInt(Long.MinValue), SqlText(""))))
    val none = Table("none_t", "CREATE TABLE none_t(a TEXT)", Seq.empty)
    val tables = Seq(big, ovfl, small, none)
    val p = tmp()
    SqliteFile.write(p, tables)
    assert(realSqliteDump(p) === expectedDump(tables))
  }
}
