package graft.store

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** A minimal, dependency-free SQLite 3 database FILE writer and reader —
  * just enough of the public file format (sqlite.org/fileformat2.html)
  * to materialize the reference's `.srctrldb` artifact: table b-trees
  * with INTEGER / TEXT / NULL columns, multi-page trees built bottom-up,
  * and overflow-page chains for records larger than a page. No indexes,
  * no freelist, no WAL — a freshly-written read-only database, exactly
  * what the reference's SourcetrailDB writer leaves behind after its
  * open → beginTransaction → record* → commitTransaction → close bracket
  * (reference sourcetraildb.py:161-236, run_index_single.py:42-65).
  *
  * The writer exists because the container ships no SQLite JDBC driver
  * and the build adds no dependencies; the write surface needed here
  * (header + table b-trees + records) is small and fully public. The
  * reader exists so the round-trip is spec-checkable in pure JVM, and
  * doubles as an independent well-formedness check of every page the
  * writer emits.
  *
  * Scope: single-file batch write of a complete database. This is an
  * EXPORT utility — a `.srctrldb` is inherently a single-writer embedded
  * file, so materializing one is a driver-side act by nature; the
  * 100 TB query path stays on the parquet tables
  * ([[SrctrlSink.write]]). */
object SqliteFile {

  sealed trait SqlVal
  final case class SqlInt(v: Long) extends SqlVal
  final case class SqlText(v: String) extends SqlVal
  case object SqlNull extends SqlVal

  /** One table to write. `rowids` (strictly ascending, same length as
    * `rows`) assigns explicit rowids — required for faithful
    * `INTEGER PRIMARY KEY` (rowid-alias) tables, where real SQLite
    * stores NULL in the aliased record column and the key in the rowid;
    * omitted, rows get 1..n in order. `autoIndexes` materialize the
    * automatic indexes a table-constraint PRIMARY KEY/UNIQUE implies
    * (SQLite's `sqlite_autoindex_<tbl>_<n>` — integrity_check demands
    * their b-trees exist and agree with the table). */
  final case class Table(name: String, createSql: String,
      rows: Seq[Seq[SqlVal]], rowids: Option[Seq[Long]] = None,
      autoIndexes: Seq[AutoIndex] = Seq.empty)

  /** One automatic index: `entries` are the full index records — the
    * indexed columns followed by the row's rowid as the last column —
    * pre-sorted in index key order. Registered in sqlite_master with a
    * NULL sql text, exactly as SQLite records its own autoindexes. */
  final case class AutoIndex(name: String, entries: Seq[Seq[SqlVal]])

  private val PageSize = 4096
  private val Usable = PageSize // no reserved bytes per page
  // table-leaf overflow thresholds (the format's standard formulas)
  private val MaxLeaf = Usable - 35
  private val MinLeaf = (Usable - 12) * 32 / 255 - 23
  // interior fanout: cell ≤ 4 (child) + 9 (varint key) + 2 (pointer)
  // bytes → 250 children stay well under a 4084-byte content area
  private val InteriorFanout = 250

  // ------------------------------------------------------------- varints

  /** SQLite varint: 1–9 bytes, big-endian 7-bit groups, 9th byte all 8. */
  private[graft] def varint(v: Long): Array[Byte] =
    if (v >= 0 && v <= 127) Array(v.toByte)
    else if (v < 0 || v > 0x00ffffffffffffffL) {
      val b = new Array[Byte](9)
      b(8) = (v & 0xff).toByte
      var r = v >>> 8
      var i = 7
      while (i >= 0) { b(i) = (0x80 | (r & 0x7f)).toByte; r >>>= 7; i -= 1 }
      b
    } else {
      val chunks = new ArrayBuffer[Long](8)
      var r = v
      while (r != 0) { chunks += (r & 0x7f); r >>= 7 }
      val b = new Array[Byte](chunks.size)
      var i = 0
      while (i < chunks.size) {
        val c = chunks(chunks.size - 1 - i)
        b(i) = (if (i == chunks.size - 1) c else c | 0x80).toByte
        i += 1
      }
      b
    }

  private[graft] def readVarint(a: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = a(off + i) & 0xff
      if ((b & 0x80) == 0) return (v << 7 | b, i + 1)
      v = v << 7 | (b & 0x7f)
      i += 1
    }
    (v << 8 | (a(off + 8) & 0xff), 9)
  }

  // ------------------------------------------------------------- records

  /** Serialize one row as an SQLite record (header + body). */
  private[graft] def record(row: Seq[SqlVal]): Array[Byte] = {
    val body = new ArrayBuffer[Byte](64)
    val serials = row.map {
      case SqlNull => 0L
      case SqlInt(0) => 8L
      case SqlInt(1) => 9L
      case SqlInt(v) =>
        val (n, st) =
          if (v >= Byte.MinValue && v <= Byte.MaxValue) (1, 1L)
          else if (v >= Short.MinValue && v <= Short.MaxValue) (2, 2L)
          else if (v >= -(1L << 23) && v < (1L << 23)) (3, 3L)
          else if (v >= Int.MinValue && v <= Int.MaxValue) (4, 4L)
          else if (v >= -(1L << 47) && v < (1L << 47)) (6, 5L)
          else (8, 6L)
        var i = n - 1
        while (i >= 0) { body += ((v >> (8 * i)) & 0xff).toByte; i -= 1 }
        st
      case SqlText(s) =>
        val b = s.getBytes("UTF-8")
        body ++= b
        13L + 2L * b.length
    }
    val serialBytes = serials.toArray.flatMap(varint)
    // header length varint INCLUDES itself — fixpoint over its own width
    var hlen = serialBytes.length + 1
    while (hlen != serialBytes.length + varint(hlen.toLong).length)
      hlen = serialBytes.length + varint(hlen.toLong).length
    val out = new ArrayBuffer[Byte](hlen + body.size)
    out ++= varint(hlen.toLong)
    out ++= serialBytes
    out ++= body
    out.toArray
  }

  private[graft] def decodeRecord(payload: Array[Byte]): Seq[SqlVal] = {
    val (hlen, n0) = readVarint(payload, 0)
    var off = n0
    val serials = new ArrayBuffer[Long]()
    while (off < hlen) {
      val (s, n) = readVarint(payload, off)
      serials += s
      off += n
    }
    var body = hlen.toInt
    serials.map {
      case 0 => SqlNull
      case 8 => SqlInt(0)
      case 9 => SqlInt(1)
      case st if st >= 1 && st <= 6 =>
        val n = Seq(1, 2, 3, 4, 6, 8)(st.toInt - 1)
        var v = if ((payload(body) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < n) { v = v << 8 | (payload(body + i) & 0xff); i += 1 }
        body += n
        SqlInt(v)
      case st if st >= 13 && st % 2 == 1 =>
        val n = ((st - 13) / 2).toInt
        val v = new String(payload, body, n, "UTF-8")
        body += n
        SqlText(v)
      case st =>
        throw new IllegalArgumentException(s"unsupported serial type $st")
    }.toSeq
  }

  // ----------------------------------------------------------- page model

  /** The file as a growable list of pages; numbers are 1-based. */
  private final class PageFile {
    val pages = new ArrayBuffer[Array[Byte]]()
    def alloc(): Int = { pages += new Array[Byte](PageSize); pages.size }
    def page(n: Int): Array[Byte] = pages(n - 1)
  }

  private def putU16(p: Array[Byte], off: Int, v: Int): Unit = {
    p(off) = ((v >> 8) & 0xff).toByte; p(off + 1) = (v & 0xff).toByte
  }
  private def putU32(p: Array[Byte], off: Int, v: Long): Unit = {
    p(off) = ((v >> 24) & 0xff).toByte; p(off + 1) = ((v >> 16) & 0xff).toByte
    p(off + 2) = ((v >> 8) & 0xff).toByte; p(off + 3) = (v & 0xff).toByte
  }
  private def u16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
  private def u32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  private final case class Cell(bytes: Array[Byte], rowid: Long)

  /** Payload split per the table-leaf overflow rule. */
  private def splitPayload(payload: Array[Byte]): (Array[Byte], Array[Byte]) =
    if (payload.length <= MaxLeaf) (payload, Array.emptyByteArray)
    else {
      val k = MinLeaf + (payload.length - MinLeaf) % (Usable - 4)
      val local = if (k <= MaxLeaf) k else MinLeaf
      (payload.take(local), payload.drop(local))
    }

  /** Write an overflow chain; returns the first overflow page number. */
  private def writeOverflow(pf: PageFile, rest: Array[Byte]): Int = {
    val chunks = rest.grouped(Usable - 4).toSeq
    val pageNos = chunks.map(_ => pf.alloc())
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val p = pf.page(pageNos(i))
      putU32(p, 0, if (i + 1 < pageNos.size) pageNos(i + 1).toLong else 0L)
      System.arraycopy(chunk, 0, p, 4, chunk.length)
    }
    pageNos.head
  }

  /** Leaf cell: varint(payload-len) varint(rowid) local-payload
    * [4-byte first-overflow-page]. */
  private def leafCell(pf: PageFile, rowid: Long, rec: Array[Byte]): Cell = {
    val (local, rest) = splitPayload(rec)
    val out = new ArrayBuffer[Byte](local.length + 16)
    out ++= varint(rec.length.toLong)
    out ++= varint(rowid)
    out ++= local
    if (rest.nonEmpty) {
      val ovfl = writeOverflow(pf, rest)
      val tail = new Array[Byte](4)
      putU32(tail, 0, ovfl.toLong)
      out ++= tail
    }
    Cell(out.toArray, rowid)
  }

  /** Format one table-leaf page (type 0x0d) holding `take`. `base` is
    * 100 on page 1 (under the file header), 0 elsewhere. */
  private def formatLeaf(p: Array[Byte], base: Int, take: Seq[Cell]): Unit = {
    p(base) = 0x0d
    putU16(p, base + 1, 0)
    putU16(p, base + 3, take.size)
    var content = Usable
    val ptrs = new ArrayBuffer[Int]()
    take.foreach { c =>
      content -= c.bytes.length
      System.arraycopy(c.bytes, 0, p, content, c.bytes.length)
      ptrs += content
    }
    require(content >= base + 8 + 2 * take.size, "leaf page overpacked")
    putU16(p, base + 5, content)
    p(base + 7) = 0
    ptrs.zipWithIndex.foreach { case (off, j) => putU16(p, base + 8 + 2 * j, off) }
  }

  /** Pack pre-sorted index entries into an INDEX b-tree (leaf 0x0a,
    * interior 0x02); returns the root page. Unlike a table tree, an
    * index interior cell carries a REAL entry (the separator between
    * its child subtrees) — entries are partitioned leaf-run /
    * separator / leaf-run …, never duplicated. Entries must each fit a
    * page (no index-overflow support — keys here are small). */
  private def buildIndexTree(pf: PageFile, payloads: Seq[Array[Byte]]): Int = {
    def formatIndexLeaf(p: Array[Byte], take: Seq[Array[Byte]]): Unit = {
      p(0) = 0x0a
      putU16(p, 1, 0)
      putU16(p, 3, take.size)
      var content = Usable
      val ptrs = new ArrayBuffer[Int]()
      take.foreach { pay =>
        val lv = varint(pay.length.toLong)
        content -= lv.length + pay.length
        System.arraycopy(lv, 0, p, content, lv.length)
        System.arraycopy(pay, 0, p, content + lv.length, pay.length)
        ptrs += content
      }
      require(content >= 8 + 2 * take.size, "index leaf overpacked")
      putU16(p, 5, content)
      p(7) = 0
      ptrs.zipWithIndex.foreach { case (off, j) => putU16(p, 8 + 2 * j, off) }
    }
    if (payloads.isEmpty) {
      val pno = pf.alloc()
      formatIndexLeaf(pf.page(pno), Seq.empty)
      return pno
    }
    payloads.foreach(p =>
      require(p.length + 9 <= Usable - 35, "index entry too large"))
    // ---- leaves, reserving one entry BETWEEN runs as the separator
    val leaves = new ArrayBuffer[Int]()
    val seps = new ArrayBuffer[Array[Byte]]()
    var idx = 0
    while (idx < payloads.size) {
      val take = new ArrayBuffer[Array[Byte]]()
      var used = 0
      var fits = true
      while (idx < payloads.size && fits) {
        val pay = payloads(idx)
        if (take.isEmpty ||
            used + pay.length + 9 + 2 * (take.size + 1) <= Usable - 8) {
          take += pay; used += pay.length + 9; idx += 1
        } else fits = false
      }
      val pno = pf.alloc()
      formatIndexLeaf(pf.page(pno), take.toSeq)
      leaves += pno
      if (idx < payloads.size) { seps += payloads(idx); idx += 1 }
    }
    // ---- interior levels: children c0..cn with separators s0..s(n-1);
    // group children, consuming the separator between groups upward
    var children: Seq[Int] = leaves.toSeq
    var betweens: Seq[Array[Byte]] = seps.toSeq
    while (children.size > 1) {
      val parents = new ArrayBuffer[Int]()
      val upSeps = new ArrayBuffer[Array[Byte]]()
      var ci = 0
      while (ci < children.size) {
        val n = math.min(InteriorFanout, children.size - ci)
        // no singleton group (an interior page needs ≥1 cell + rightmost)
        val take = if (children.size - ci - n == 1) n - 1 else n
        val group = children.slice(ci, ci + take)
        val groupSeps = betweens.slice(ci, ci + take - 1)
        val pno = pf.alloc()
        val p = pf.page(pno)
        p(0) = 0x02
        putU16(p, 1, 0)
        putU16(p, 3, group.size - 1)
        putU32(p, 8, group.last.toLong)
        var content = Usable
        val ptrs = new ArrayBuffer[Int]()
        group.dropRight(1).zip(groupSeps).foreach { case (child, pay) =>
          val lv = varint(pay.length.toLong)
          content -= 4 + lv.length + pay.length
          putU32(p, content, child.toLong)
          System.arraycopy(lv, 0, p, content + 4, lv.length)
          System.arraycopy(pay, 0, p, content + 4 + lv.length, pay.length)
          ptrs += content
        }
        putU16(p, 5, content)
        p(7) = 0
        ptrs.zipWithIndex.foreach { case (off, j) => putU16(p, 12 + 2 * j, off) }
        parents += pno
        ci += take
        if (ci < children.size) {
          // the separator between this group and the next moves up
          upSeps += betweens(ci - 1)
        }
      }
      children = parents.toSeq
      betweens = upSeps.toSeq
    }
    children.head
  }

  /** Pack cells into a table b-tree bottom-up; returns the root page. */
  private def buildTree(pf: PageFile, cells: Seq[Cell]): Int = {
    val cs = cells.toIndexedSeq
    // ---- leaves (an empty table is one empty leaf)
    val leaves = new ArrayBuffer[(Int, Long)]() // (page, max rowid)
    if (cs.isEmpty) {
      val pno = pf.alloc()
      formatLeaf(pf.page(pno), 0, Seq.empty)
      return pno
    }
    var idx = 0
    while (idx < cs.size) {
      val take = new ArrayBuffer[Cell]()
      var used = 0
      var fits = true
      while (idx < cs.size && fits) {
        val c = cs(idx)
        // first cell always goes (overflow split bounds any cell to
        // ≤ MaxLeaf + 22 bytes, which fits an empty page)
        if (take.isEmpty ||
            used + c.bytes.length + 2 * (take.size + 1) <= Usable - 8) {
          take += c
          used += c.bytes.length
          idx += 1
        } else fits = false
      }
      val pno = pf.alloc()
      formatLeaf(pf.page(pno), 0, take.toSeq)
      leaves += ((pno, take.last.rowid))
    }
    // ---- interior levels: fixed fanout, no singleton last group (a
    // trailing 1-child group borrows one from its left neighbour)
    var level: Seq[(Int, Long)] = leaves.toSeq
    while (level.size > 1) {
      val sizes = {
        val n = level.size
        val full = n / InteriorFanout
        val rem = n % InteriorFanout
        if (rem == 0) Seq.fill(full)(InteriorFanout)
        else if (rem == 1 && full > 0)
          Seq.fill(full - 1)(InteriorFanout) ++ Seq(InteriorFanout - 1, 2)
        else Seq.fill(full)(InteriorFanout) :+ rem
      }
      val parents = new ArrayBuffer[(Int, Long)]()
      var rest = level
      sizes.foreach { sz =>
        val group = rest.take(sz)
        rest = rest.drop(sz)
        val pno = pf.alloc()
        val p = pf.page(pno)
        p(0) = 0x05
        putU16(p, 1, 0)
        val cellsHere = group.dropRight(1)
        putU16(p, 3, cellsHere.size)
        putU32(p, 8, group.last._1.toLong) // right-most child
        var content = Usable
        val ptrs = new ArrayBuffer[Int]()
        cellsHere.foreach { case (child, maxRowid) =>
          val kb = varint(maxRowid)
          content -= 4 + kb.length
          putU32(p, content, child.toLong)
          System.arraycopy(kb, 0, p, content + 4, kb.length)
          ptrs += content
        }
        putU16(p, 5, content)
        p(7) = 0
        ptrs.zipWithIndex.foreach { case (off, j) => putU16(p, 12 + 2 * j, off) }
        parents += ((pno, group.last._2))
      }
      level = parents.toSeq
    }
    level.head._1
  }

  // --------------------------------------------------------------- writer

  /** Write a complete database file: the given tables plus their
    * sqlite_master catalog rows on page 1. Rows get rowids 1..n in the
    * given order. */
  def write(path: String, tables: Seq[Table]): Unit = {
    val pf = new PageFile
    require(pf.alloc() == 1) // page 1: sqlite_master root, filled below
    // (master type, name, tbl_name, root, sql-or-null)
    val masterRows = tables.flatMap { t =>
      val ids = t.rowids.getOrElse(t.rows.indices.map(_ + 1L))
      require(ids.size == t.rows.size,
        s"${t.name}: ${ids.size} rowids for ${t.rows.size} rows")
      require(ids.zip(ids.drop(1)).forall { case (a, b) => a < b },
        s"${t.name}: rowids must be strictly ascending (b-tree key order)")
      val cells = t.rows.zip(ids).map { case (row, rid) =>
        leafCell(pf, rid, record(row))
      }
      val tRow = ("table", t.name, t.name, buildTree(pf, cells),
        SqlText(t.createSql): SqlVal)
      val iRows = t.autoIndexes.map { ix =>
        ("index", ix.name, t.name,
          buildIndexTree(pf, ix.entries.map(record)), SqlNull: SqlVal)
      }
      tRow +: iRows
    }
    // sqlite_master: (type, name, tbl_name, rootpage, sql) — autoindex
    // rows carry a NULL sql, exactly as SQLite records its own
    val masterCells = masterRows.zipWithIndex.map {
      case ((typ, name, tbl, root, sql), i) =>
        leafCell(pf, i + 1L, record(Seq(
          SqlText(typ), SqlText(name), SqlText(tbl),
          SqlInt(root.toLong), sql)))
    }
    formatLeaf(pf.page(1), 100, masterCells)
    // ---- the 100-byte file header
    val p1 = pf.page(1)
    val magic = "SQLite format 3".getBytes("UTF-8") :+ 0.toByte
    System.arraycopy(magic, 0, p1, 0, 16)
    putU16(p1, 16, PageSize)
    p1(18) = 1; p1(19) = 1 // rollback-journal read/write versions
    p1(20) = 0 // reserved space per page
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // fixed payload fractions
    putU32(p1, 24, 1L) // change counter
    putU32(p1, 28, pf.pages.size.toLong)
    putU32(p1, 32, 0L); putU32(p1, 36, 0L) // no freelist
    putU32(p1, 40, 1L) // schema cookie
    putU32(p1, 44, 1L) // schema format 1 (most widely readable)
    putU32(p1, 56, 1L) // UTF-8
    putU32(p1, 92, 1L) // version-valid-for = change counter
    putU32(p1, 96, 3045000L) // sqlite version stamp
    val out = Files.newOutputStream(Paths.get(path))
    try pf.pages.foreach(out.write) finally out.close()
  }

  // --------------------------------------------------------------- reader

  /** Read every table back: name → rows in rowid order. Walks the
    * sqlite_master b-tree on page 1, then each table's tree. */
  def read(path: String): Map[String, Seq[Seq[SqlVal]]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(new String(bytes, 0, 15, "UTF-8") == "SQLite format 3",
      "not an SQLite database")
    val pageSize = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    require(pageSize == PageSize, s"unsupported page size $pageSize")
    def page(n: Int): Array[Byte] = {
      val a = new Array[Byte](pageSize)
      System.arraycopy(bytes, (n - 1) * pageSize, a, 0, pageSize)
      a
    }
    def payloadOf(p: Array[Byte], cellOff: Int): Array[Byte] = {
      val (total, n1) = readVarint(p, cellOff)
      val (_, n2) = readVarint(p, cellOff + n1)
      val start = cellOff + n1 + n2
      val local =
        if (total <= MaxLeaf) total.toInt
        else {
          val k = MinLeaf + (total.toInt - MinLeaf) % (Usable - 4)
          if (k <= MaxLeaf) k else MinLeaf
        }
      val out = new ArrayBuffer[Byte](total.toInt)
      out ++= p.slice(start, start + local)
      var next = if (local < total) u32(p, start + local).toInt else 0
      while (next != 0 && out.size < total) {
        val op = page(next)
        val want = math.min(Usable - 4, total.toInt - out.size)
        out ++= op.slice(4, 4 + want)
        next = u32(op, 0).toInt
      }
      require(out.size == total, "short payload")
      out.toArray
    }
    def walk(pno: Int, base: Int): Seq[Seq[SqlVal]] = {
      val p = page(pno)
      (p(base) & 0xff) match {
        case 0x0d =>
          val n = u16(p, base + 3)
          (0 until n).map(j => decodeRecord(payloadOf(p, u16(p, base + 8 + 2 * j))))
        case 0x05 =>
          val n = u16(p, base + 3)
          val kids = (0 until n).map { j =>
            u32(p, u16(p, base + 12 + 2 * j)).toInt
          } :+ u32(p, base + 8).toInt
          kids.flatMap(walk(_, 0))
        case t =>
          throw new IllegalArgumentException(s"unexpected page type $t")
      }
    }
    walk(1, 100)
      .filter(_.head == SqlText("table")) // autoindex rows are not tables
      .map { row =>
        val name = row(1).asInstanceOf[SqlText].v
        val root = row(3).asInstanceOf[SqlInt].v.toInt
        name -> walk(root, 0)
      }.toMap
  }
}
