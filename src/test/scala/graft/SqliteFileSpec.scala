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
}
