package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.indexer.IndexPipeline
import graft.indexer.IndexPipeline.SourceFile
import graft.store.{Snapshot, SrctrlSink}

/** The Sourcetrail-shaped export (sourcetraildb.py analog): relational
  * integrity of the four tables plus atomic re-export. */
class SrctrlSinkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val snap = {
    val files = Seq(
      SourceFile("pkg/a.py",
        "class A:\n    def run(self):\n        return GLOBAL\n\nGLOBAL = 1\n"),
      SourceFile("pkg/b.py",
        "from pkg.a import A\n\nclass B(A):\n    def run(self):\n        return 2\n\n    def go(self):\n        a = A()\n        return a.run()\n"))
      .toDS()
    val ix = IndexPipeline.enrich(
      IndexPipeline.indexFiles(spark, files, "t1"), "t1")
    Snapshot.GraphSnapshot(ix.nodes, ix.edges, ix.locations)
  }

  test("export tables: referential integrity on hash ids") {
    val t = SrctrlSink.tables(snap)
    val symbolIds = t("symbols").select("id").as[Long].collect().toSet
    val fileIds = t("files").select("id").as[Long].collect().toSet
    // every reference endpoint is a known symbol (A4 stub invariant)
    val refs = t("references")
      .select("context_symbol_id", "referenced_symbol_id", "kind")
      .as[(Long, Long, String)].collect()
    assert(refs.nonEmpty)
    refs.foreach { case (c, r, k) =>
      assert(symbolIds.contains(c) && symbolIds.contains(r), s"dangling ref $k")
      assert(Set("REFERENCE_CALL", "REFERENCE_USAGE",
        "REFERENCE_INHERITANCE", "REFERENCE_OVERRIDE").contains(k))
    }
    // INHERITS surfaced as a reference, members stay hierarchy-implied
    assert(refs.exists(_._3 == "REFERENCE_INHERITANCE"))
    // C11: B.run overrides A.run — derived at export, like the
    // reference's deep mode emitting overrides to Sourcetrail only
    val symByName = t("symbols").select("serialized_name", "id")
      .as[(String, Long)].collect().toMap
    assert(refs.exists(r => r._3 == "REFERENCE_OVERRIDE" &&
      r._1 == symByName("pkg.b.B.run") && r._2 == symByName("pkg.a.A.run")))
    // every location's file id is a known file
    val locFiles = t("source_locations").select("file_id").as[Long].collect()
    locFiles.foreach(f => assert(fileIds.contains(f)))
  }

  test("r13 (r12 verdict #7): a dropped nonexistent-member edge leaves " +
      "NO source_location or occurrence behind in the sink") {
    val files = Seq(
      SourceFile("lib.py",
        "class Conn:\n    def execute(self):\n        return 1\n"),
      SourceFile("app.py",
        "from lib import Conn\n\ndef bad():\n    c = Conn()\n" +
          "    return c.no_such_member()\n\ndef good():\n    c = Conn()\n" +
          "    return c.execute()\n")).toDS()
    val ix = IndexPipeline.enrich(
      IndexPipeline.indexFiles(spark, files, "tv"), "tv")
    val s2 = Snapshot.GraphSnapshot(ix.nodes, ix.edges, ix.locations)
    // the relational export has no location row citing the dropped take
    val t = SrctrlSink.tables(s2)
    val locNames = t("source_locations").join(t("symbols"),
        t("source_locations")("element_id") === t("symbols")("id"))
      .select("serialized_name").as[String].collect()
    assert(!locNames.exists(_.contains("no_such_member")),
      s"dropped edge must leave no location; got ${locNames.toSeq}")
    // the REAL SQLite catalog: no node, no edge, no occurrence for it —
    // and the kept member's REFERENCE occurrence is still there
    assume(new ProcessBuilder("python3", "-c", "import sqlite3")
      .start().waitFor() == 0, "python3+sqlite3 unavailable")
    val path = java.nio.file.Files
      .createTempDirectory("srctrl-drop").resolve("g.srctrldb").toString
    SrctrlSink.writeSourcetrailDb(s2, path)
    val script =
      """import sys, sqlite3
        |c = sqlite3.connect(sys.argv[1])
        |names = [r[0] for r in c.execute('SELECT serialized_name FROM node JOIN element ON element.id = node.id')]
        |assert not any('no_such_member' in n for n in names), names
        |occ = c.execute('SELECT count(*) FROM occurrence').fetchone()[0]
        |assert occ > 0
        |print('OK')
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("chk", ".py")
    java.nio.file.Files.write(f, script.getBytes)
    val proc = new ProcessBuilder("python3", f.toString, path)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0 && out.contains("OK"), out)
  }

  test("LOCAL symbol rows flow into source_locations (A9 srctrl parity)") {
    val t = SrctrlSink.tables(snap)
    val locals = t("source_locations").filter(col("kind") === "LOCAL")
    // pkg.b.B.go binds `a = A()` then uses it in `return a.run()` —
    // exactly two rows keyed by the local-symbol name hash
    val aId = spark.range(1)
      .select(xxhash64(lit("pkg.b.B.go<a>"))).as[Long].head()
    val aRows = locals.filter(col("element_id") === aId)
      .select("start_line", "start_col").as[(Int, Int)].collect().toSet
    assert(aRows === Set((8, 9), (9, 16)))
    // every method's self param is a local too
    val selfId = spark.range(1)
      .select(xxhash64(lit("pkg.b.B.run<self>"))).as[Long].head()
    assert(locals.filter(col("element_id") === selfId).count() === 1)
  }

  test("write is atomic and re-export overwrites in place") {
    val dir = java.nio.file.Files.createTempDirectory("srctrl").toString + "/export"
    SrctrlSink.write(snap, dir)
    val once = SrctrlSink.read(spark, dir)("symbols").count()
    SrctrlSink.write(snap, dir) // re-export over existing target
    val twice = SrctrlSink.read(spark, dir)("symbols").count()
    assert(once === twice && once > 0)
    // ids are stable across exports (hash-based, no serial sequence)
    assert(SrctrlSink.read(spark, dir)("symbols")
      .select("id", "serialized_name").collect().toSet ===
      SrctrlSink.tables(snap)("symbols")
        .select("id", "serialized_name").collect().toSet)
  }

  test("writeSrctrldb emits a real SQLite file matching the tables row-for-row") {
    import graft.store.SqliteFile
    import graft.store.SqliteFile.{SqlInt, SqlNull, SqlText, SqlVal}
    val path = java.nio.file.Files.createTempDirectory("srctrldb").toString +
      "/index.srctrldb"
    SrctrlSink.writeSrctrldb(snap, path)
    val db = SqliteFile.read(path)
    assert(db.keySet ===
      Set("files", "symbols", "references", "source_locations"))
    // every table matches the parquet-side relational model row-for-row
    def norm(v: Any): SqlVal = v match {
      case null => SqlNull
      case l: Long => SqlInt(l)
      case i: Int => SqlInt(i.toLong)
      case s: String => SqlText(s)
      case o => SqlText(o.toString)
    }
    val t = SrctrlSink.tables(snap)
    db.foreach { case (name, rows) =>
      val expect = t(name).collect()
        .map(r => (0 until r.length).map(i => norm(r.get(i))))
      assert(rows.toSet === expect.toSet, s"table $name")
      assert(rows.size === expect.length, s"table $name row count")
    }
    // byte-stable re-export (sorted rows, no timestamps)
    val path2 = path + ".again"
    SrctrlSink.writeSrctrldb(snap, path2)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))))
  }

  test("writeSourcetrailDb emits the REAL Sourcetrail catalog, verified " +
    "by an actual SQLite with full referential integrity") {
    assume(new ProcessBuilder("python3", "-c", "import sqlite3")
      .start().waitFor() == 0, "python3+sqlite3 unavailable")
    val path = java.nio.file.Files.createTempDirectory("stdb").toString +
      "/real.srctrldb"
    SrctrlSink.writeSourcetrailDb(snap, path)
    val script =
      """import sys, sqlite3, json
        |c = sqlite3.connect(sys.argv[1])
        |def one(q): return c.execute(q).fetchone()[0]
        |out = {}
        |out['integrity'] = one('PRAGMA integrity_check')
        |out['fk'] = c.execute('PRAGMA foreign_key_check').fetchall()
        |out['tables'] = sorted(r[0] for r in c.execute(
        |    "SELECT name FROM sqlite_master WHERE type='table'"))
        |out['version'] = one("SELECT value FROM meta WHERE key='storage_version'")
        |out['dangling_edges'] = one('''SELECT count(*) FROM edge e
        |    WHERE e.source_node_id NOT IN (SELECT id FROM node)
        |       OR e.target_node_id NOT IN (SELECT id FROM node)''')
        |out['dangling_occ'] = one('''SELECT count(*) FROM occurrence o
        |    WHERE o.element_id NOT IN (SELECT id FROM element)
        |       OR o.source_location_id NOT IN (SELECT id FROM source_location)''')
        |out['symbol_not_node'] = one('''SELECT count(*) FROM symbol
        |    WHERE id NOT IN (SELECT id FROM node)''')
        |out['file_not_filenode'] = one('''SELECT count(*) FROM file
        |    WHERE id NOT IN (SELECT id FROM node WHERE type = 262144)''')
        |out['loc_bad_file'] = one('''SELECT count(*) FROM source_location
        |    WHERE file_node_id NOT IN (SELECT id FROM node WHERE type = 262144)''')
        |def nid(serialized):
        |    r = c.execute('SELECT id FROM node WHERE serialized_name=?',
        |                  (serialized,)).fetchone()
        |    return r[0] if r else None
        |def ser(name):
        |    return '.' + '\tm' + '\tn'.join(p + '\ts\tp' for p in name.split('.'))
        |out['clsA_type'] = c.execute(
        |    'SELECT type FROM node WHERE serialized_name=?',
        |    (ser('pkg.a.A'),)).fetchone()[0]
        |def edge_between(t, a, b):
        |    return c.execute('SELECT count(*) FROM edge WHERE type=? AND '
        |        'source_node_id=? AND target_node_id=?',
        |        (t, nid(ser(a)), nid(ser(b)))).fetchone()[0]
        |out['member'] = edge_between(1, 'pkg.a', 'pkg.a.A')
        |out['call'] = edge_between(8, 'pkg.b.B.go', 'pkg.a.A.run')
        |out['inherit'] = edge_between(16, 'pkg.b.B', 'pkg.a.A')
        |out['override'] = edge_between(32, 'pkg.b.B.run', 'pkg.a.A.run')
        |out['local'] = one("SELECT count(*) FROM local_symbol WHERE name='pkg.b.B.go<a>'")
        |out['occ_total'] = one('SELECT count(*) FROM occurrence')
        |print(json.dumps(out))
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("stcheck", ".py")
    java.nio.file.Files.writeString(f, script)
    val pb = new ProcessBuilder("python3", f.toString, path)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outRaw = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() === 0, s"sqlite3 check failed:\n$outRaw")
    val out = outRaw.trim.linesIterator.toSeq.last
    def field(k: String): String = {
      val m = ("\"" + k + "\":\\s*(\\[[^\\]]*\\]|\"[^\"]*\"|\\d+)").r
        .findFirstMatchIn(out)
      assert(m.isDefined, s"missing $k in $out"); m.get.group(1)
    }
    assert(field("integrity") === "\"ok\"")
    assert(field("fk") === "[]", "foreign_key_check must be clean")
    assert(field("tables") ===
      Seq("edge", "element", "element_component", "error", "file",
        "filecontent", "local_symbol", "meta", "node", "occurrence",
        "source_location", "symbol")
        .mkString("[\"", "\", \"", "\"]"))
    assert(field("version") === "\"25\"")
    Seq("dangling_edges", "dangling_occ", "symbol_not_node",
      "file_not_filenode", "loc_bad_file").foreach(k =>
      assert(field(k) === "0", s"$k must be 0"))
    assert(field("clsA_type") === "128") // NODE_CLASS
    // nesting-derived MEMBER + true references with Sourcetrail type ints
    Seq("member", "call", "inherit", "override", "local").foreach(k =>
      assert(field(k) === "1", s"$k edge/row missing"))
    assert(field("occ_total").toInt > 0)
  }
}
