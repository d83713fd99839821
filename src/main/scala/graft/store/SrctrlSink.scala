package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Rel

/** Sourcetrail-shaped export sink — the Spark-native analog of the
  * reference's secondary SourcetrailDB SQLite writer
  * (sourcetraildb.py:120-239, driven per file by run_index_single.py's
  * open/beginTransaction/…/commitTransaction/close bracket).
  *
  * The reference's sink is a single-writer embedded SQLite file; at the
  * 100 TB posture the faithful analog is a columnar export in the SAME
  * relational model, written once per snapshot with the commit-by-rename
  * bracket standing in for the SQLite transaction:
  *
  *  - `files(id, file_path, language)`            — recordFile/-Language
  *  - `symbols(id, serialized_name, kind, definition_kind)` — recordSymbol
  *    + recordSymbolKind + recordSymbolDefinitionKind
  *  - `references(id, context_symbol_id, referenced_symbol_id, kind)` —
  *    recordReference; true cross-symbol references (CALL, USES,
  *    INHERITS) plus derived OVERRIDE rows (C11) — member containment
  *    (CONTAINS/HAS_METHOD/HAS_FIELD) is hierarchy-implied in
  *    Sourcetrail's model, encoded by the serialized name's nesting,
  *    exactly as the SWIG writer derives it
  *  - `source_locations(element_id, file_id, kind, start_line, start_col,
  *    end_line, end_col)` — record*Location/AtomicSourceRange/Error rows
  *
  * Ids are deterministic 64-bit hashes of the natural keys instead of the
  * SQLite writer's serial ints: id assignment is embarrassingly parallel
  * (no global sequence — a row_number over the whole snapshot would be a
  * single-partition bottleneck) and stable across re-exports. */
object SrctrlSink {

  private val referenceKind = Map(
    Rel.Call -> "REFERENCE_CALL",
    Rel.Uses -> "REFERENCE_USAGE",
    Rel.Inherits -> "REFERENCE_INHERITANCE")

  /** True cross-symbol reference edges (src, rel_type, dst): the
    * snapshot's CALL/USES/INHERITS plus derived OVERRIDE rows (C11) —
    * an EXPORT-side derivation, exactly like the reference, whose deep
    * mode records REFERENCE_OVERRIDE to Sourcetrail only
    * (indexer_visitor.py:125-157; never to Neo4j): defined methods
    * (inherited copies excluded) resolved along the C3 MRO. */
  private def referenceEdges(snap: Snapshot.GraphSnapshot): DataFrame = {
    val definedMethods = snap.edges
      .filter(col("rel_type") === Rel.HasMethod &&
        coalesce(element_at(col("props"), "inherited"), lit("false")) =!= "true")
      .select(col("src"), col("dst"))
    val overrideEdges = graft.enrich.Closure.overrides(
      snap.edges.filter(col("rel_type") === Rel.Inherits)
        // base order (the indexer's `ord` edge prop) feeds the C3/MRO
        // resolution; legacy edges without it tie-break on base name
        .select(col("src"), col("dst"),
          element_at(col("props"), "ord").cast("int").as("ord")),
      definedMethods)
      .select(col("src"), lit("OVERRIDE").as("rel_type"), col("dst"))
    snap.edges
      .filter(col("rel_type").isin(referenceKind.keys.toSeq: _*))
      .select(col("src"), col("rel_type"), col("dst"))
      .unionByName(overrideEdges)
  }

  /** Build the four export tables from a snapshot (pure — no IO). */
  def tables(snap: Snapshot.GraphSnapshot)
      : Map[String, DataFrame] = {
    val files = snap.nodes.select(col("file_path"))
      .filter(col("file_path").isNotNull)
      .union(snap.locations.select(col("filePath")))
      .distinct()
      .select(xxhash64(col("file_path")).as("id"), col("file_path"),
        lit("python").as("language"))
    val symbols = snap.nodes.select(
      xxhash64(col("full_name")).as("id"),
      col("full_name").as("serialized_name"),
      col("kind"),
      // unsolved placeholders are implicit definitions in srctrl terms
      when(col("kind") === graft.model.Kind.None_, lit("DEFINITION_IMPLICIT"))
        .otherwise(lit("DEFINITION_EXPLICIT")).as("definition_kind"))
    val references = referenceEdges(snap)
      .select(
        // NUL separator: cannot occur in a symbol name, so the composite
        // id never collides across components
        xxhash64(concat_ws("\u0000", col("src"), col("rel_type"), col("dst")))
          .as("id"),
        xxhash64(col("src")).as("context_symbol_id"),
        xxhash64(col("dst")).as("referenced_symbol_id"),
        element_at(
          map((referenceKind + ("OVERRIDE" -> "REFERENCE_OVERRIDE"))
            .toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          col("rel_type")).as("kind"))
    val sourceLocations = snap.locations.select(
      xxhash64(col("symbolFullName")).as("element_id"),
      xxhash64(col("filePath")).as("file_id"),
      col("kind"),
      col("startLine").as("start_line"), col("startCol").as("start_col"),
      col("endLine").as("end_line"), col("endCol").as("end_col"))
    Map("files" -> files, "symbols" -> symbols,
      "references" -> references, "source_locations" -> sourceLocations)
  }

  /** Export a snapshot to `<dir>/{files,symbols,references,
    * source_locations}` parquet, atomically (write to a tmp dir, rename —
    * the batch analog of the SQLite transaction bracket). */
  def write(snap: Snapshot.GraphSnapshot, dir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = s"$dir.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    tables(snap).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$name")
    }
    val target = Paths.get(dir)
    if (Files.exists(target)) {
      val old = Paths.get(s"$dir.old-${System.nanoTime()}")
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      Snapshot.deleteRecursively(old)
    } else Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
  }

  def read(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Seq("files", "symbols", "references", "source_locations")
      .map(n => n -> spark.read.parquet(s"$dir/$n")).toMap

  /** The export tables' column lists and CREATE statements — the
    * `.srctrldb` schema ([[writeSrctrldb]]). */
  private val ddl: Seq[(String, Seq[String], String)] = Seq(
    ("files", Seq("id", "file_path", "language"),
      "CREATE TABLE files(id INTEGER, file_path TEXT, language TEXT)"),
    ("symbols", Seq("id", "serialized_name", "kind", "definition_kind"),
      "CREATE TABLE symbols(id INTEGER, serialized_name TEXT, kind TEXT, " +
        "definition_kind TEXT)"),
    ("references", Seq("id", "context_symbol_id", "referenced_symbol_id",
      "kind"),
      "CREATE TABLE \"references\"(id INTEGER, context_symbol_id INTEGER, " +
        "referenced_symbol_id INTEGER, kind TEXT)"),
    ("source_locations", Seq("element_id", "file_id", "kind", "start_line",
      "start_col", "end_line", "end_col"),
      "CREATE TABLE source_locations(element_id INTEGER, file_id INTEGER, " +
        "kind TEXT, start_line INTEGER, start_col INTEGER, " +
        "end_line INTEGER, end_col INTEGER)"))

  /** Materialize the snapshot's Sourcetrail export as a REAL `.srctrldb`
    * SQLite database file ([[SqliteFile]]) — the reference's second-sink
    * ARTIFACT itself (a file a SQLite client opens), not just its
    * relational model. Bounded driver-side collect BY DESIGN: an
    * embedded SQLite database is a single-writer object — the reference
    * funnels every record through one SWIG writer exactly the same way —
    * so this is an export utility for one snapshot; the distributed
    * query path stays on [[write]]'s parquet tables. Rows are sorted on
    * every column so re-exports of the same snapshot are byte-stable. */
  // ------------------------------------------------------------------
  // The REAL Sourcetrail catalog (storage_version 25) — table set,
  // DDL, integer vocabularies and name encoding per the public
  // SourcetrailDB / Sourcetrail storage layer
  // (github.com/CoatiSoftware/SourcetrailDB: DatabaseStorage table
  // setup; NameHierarchy::serialize; NodeKind/EdgeKind/LocationKind/
  // DefinitionKind enums). The reference writes the same catalog
  // through the SWIG binary (sourcetraildb.py:161-236).
  // ------------------------------------------------------------------

  private val NodeSymbol = 1        // unknown / hierarchy-implied parent
  private val NodeFile = 262144
  private val nodeKindInt: Map[String, Int] = Map(
    graft.model.Kind.Module -> 8, graft.model.Kind.Class -> 128,
    graft.model.Kind.GlobalVariable -> 1024, graft.model.Kind.Field -> 2048,
    graft.model.Kind.Function -> 4096, graft.model.Kind.Method -> 8192,
    graft.model.Kind.None_ -> NodeSymbol)
  private val EdgeMember = 1
  private val edgeKindInt: Map[String, Int] = Map(
    "MEMBER" -> EdgeMember, Rel.Uses -> 4, Rel.Call -> 8,
    Rel.Inherits -> 16, "OVERRIDE" -> 32)
  // LocationKind: TOKEN 0, SCOPE 1, QUALIFIER 2, LOCAL_SYMBOL 3,
  // SIGNATURE 4, COMMENT 5, ERROR 6, FULLTEXT 7, SCREEN 8, ATOMIC 9.
  // A REFERENCE location anchors as a TOKEN occurrence of the
  // referenced node (the writer keys it on the reference id; the
  // relational model stores the referenced symbol — the token is the
  // same source range either way).
  private val locTypeInt: Map[String, Int] = Map(
    "SYMBOL" -> 0, "REFERENCE" -> 0, "SCOPE" -> 1, "QUALIFIER" -> 2,
    "LOCAL" -> 3, "SIGNATURE" -> 4, "ERROR" -> 6, "ATOMIC_RANGE" -> 9)
  private val DefImplicit = 1
  private val DefExplicit = 2

  /** Sourcetrail's internal serialized name: `<delim>\tm` then elements
    * joined by `\tn`, each `name\ts<prefix>\tp<postfix>` (prefix and
    * postfix empty for Python names — the reference's NameElement
    * defaults, index_utils.py:117-121). */
  private[graft] def serializedDotted(fullName: String): String =
    "." + "\tm" + fullName.split("\\.").map(_ + "\ts\tp").mkString("\tn")
  private[graft] def serializedFile(path: String): String =
    "/" + "\tm" + path + "\ts\tp"

  /** Materialize the snapshot as a Sourcetrail-catalog SQLite database —
    * the ACTUAL `element`/`node`/`edge`/`symbol`/`file`/
    * `source_location`/`occurrence` schema Sourcetrail reads, not just
    * this sink's relational model ([[writeSrctrldb]] keeps that simpler
    * export). Member containment is re-derived from name nesting
    * (MEMBER edges between every parent/child pair), exactly how the
    * SourcetrailDB writer's addNodeHierarchy materializes it; ids are
    * serial ints in rowid order, with `INTEGER PRIMARY KEY` columns
    * stored as real rowid aliases (NULL record cell + explicit rowid),
    * byte-faithful to what SQLite itself writes. Bounded driver-side
    * collect BY DESIGN — same single-writer-artifact argument as
    * [[writeSrctrldb]]. */
  def writeSourcetrailDb(snap: Snapshot.GraphSnapshot, path: String): Unit = {
    import SqliteFile._
    // ---- collect (sorted → deterministic ids and byte-stable files)
    val nodeRows = snap.nodes.select(col("full_name"), col("kind"))
      .orderBy("full_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val kindOf = nodeRows.toMap
    val refs = referenceEdges(snap)
      .orderBy("rel_type", "src", "dst").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
    val locRows = snap.locations
      .orderBy("filePath", "startLine", "startCol", "endLine", "endCol",
        "kind", "symbolFullName")
      .collect().map(r => graft.model.LocationRow(r.getString(0),
        r.getString(1), r.getString(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6))).toSeq
    val filePaths = (snap.nodes.select(col("file_path"))
      .filter(col("file_path").isNotNull).distinct()
      .collect().map(_.getString(0)) ++ locRows.map(_.filePath))
      .distinct.sorted.toSeq

    // ---- name universe: snapshot nodes + edge endpoints + every dotted
    // prefix (the hierarchy parents addNodeHierarchy would create)
    def prefixes(n: String): Seq[String] = {
      val parts = n.split("\\.")
      (1 until parts.length).map(parts.take(_).mkString("."))
    }
    val allNames = (nodeRows.map(_._1) ++
      refs.flatMap(e => Seq(e._1, e._3)))
      .flatMap(n => n +: prefixes(n)).distinct.sorted

    // ---- serial element-id allocation (ascending per table)
    var nextId = 0L
    def alloc(): Long = { nextId += 1; nextId }
    val nodeId = allNames.map(n => n -> alloc()).toMap
    val fileNodeId = filePaths.map(p => p -> alloc()).toMap
    val memberEdges = allNames.filter(_.contains("."))
      .map(n => (n.split("\\.").dropRight(1).mkString("."), "MEMBER", n))
    val allEdges = (memberEdges ++ refs).distinct
    val edgeId = allEdges.map(e => e -> alloc()).toMap
    val localNames = locRows.filter(_.kind == "LOCAL")
      .map(_.symbolFullName).distinct.sorted
    val localId = localNames.map(n => n -> alloc()).toMap
    val errorLocs = locRows.filter(_.kind == "ERROR")
    val errorIds = errorLocs.map(_ => alloc())

    // ---- rows
    val metaRows = Seq(
      Seq(SqlNull, SqlText("storage_version"), SqlText("25")),
      Seq(SqlNull, SqlText("project_settings"), SqlText("")))
    val elementIds = (1L to nextId).toSeq
    def aliasRow(rest: SqlVal*): Seq[SqlVal] = SqlNull +: rest.toSeq

    val nodeTbl =
      allNames.map(n => (nodeId(n), aliasRow(
        SqlInt(kindOf.get(n).map(nodeKindInt).getOrElse(NodeSymbol).toLong),
        SqlText(serializedDotted(n))))) ++
      filePaths.map(p => (fileNodeId(p), aliasRow(
        SqlInt(NodeFile.toLong), SqlText(serializedFile(p)))))
    val symbolTbl = nodeRows.map { case (n, k) =>
      (nodeId(n), aliasRow(SqlInt(
        if (k == graft.model.Kind.None_) DefImplicit.toLong
        else DefExplicit.toLong)))
    }
    val lineCount: Map[String, Int] = locRows.groupBy(_.filePath)
      .map { case (p, ls) => p -> ls.map(_.endLine).max }
    val fileTbl = filePaths.map(p => (fileNodeId(p), aliasRow(
      SqlText(p), SqlText("python"), SqlNull, SqlInt(1), SqlInt(1),
      SqlInt(lineCount.getOrElse(p, 0).toLong))))
    val edgeTbl = allEdges.map(e => (edgeId(e), aliasRow(
      SqlInt(edgeKindInt(e._2).toLong),
      SqlInt(nodeId(e._1)), SqlInt(nodeId(e._3)))))
    val localTbl = localNames.map(n =>
      (localId(n), aliasRow(SqlText(n))))
    val errorTbl = errorIds.zip(errorLocs).map { case (id, l) =>
      (id, aliasRow(SqlText(s"indexing error in ${l.filePath}"),
        SqlInt(0), SqlInt(1), SqlText(l.filePath)))
    }
    // source_location ids live in their own serial space (the writer's
    // AUTOINCREMENT); occurrence pairs (element, location)
    val errIdOf = errorLocs.zip(errorIds).toMap
    val locTbl = locRows.zipWithIndex.map { case (l, i) =>
      (i + 1L, aliasRow(SqlInt(fileNodeId(l.filePath)),
        SqlInt(l.startLine.toLong), SqlInt(l.startCol.toLong),
        SqlInt(l.endLine.toLong), SqlInt(l.endCol.toLong),
        SqlInt(locTypeInt(l.kind).toLong)))
    }
    val occTbl = locRows.zipWithIndex.flatMap { case (l, i) =>
      val elem: Option[Long] = l.kind match {
        case "SYMBOL" | "SCOPE" | "SIGNATURE" => nodeId.get(l.symbolFullName)
        case "REFERENCE" => nodeId.get(l.symbolFullName)
        case "LOCAL" => localId.get(l.symbolFullName)
        case "ERROR" => errIdOf.get(l)
        case _ => None // ATOMIC_RANGE: location only, no occurrence
      }
      elem.map(e => Seq(SqlInt(e), SqlInt(i + 1L)))
    }

    def t(name: String, sql: String, rows: Seq[(Long, Seq[SqlVal])]) =
      Table(name, sql, rows.map(_._2), Some(rows.map(_._1)))
    SqliteFile.write(path, Seq(
      Table("meta", "CREATE TABLE meta(id INTEGER, key TEXT, value TEXT, " +
        "PRIMARY KEY(id))", metaRows),
      Table("element", "CREATE TABLE element(id INTEGER, PRIMARY KEY(id))",
        elementIds.map(_ => Seq(SqlNull)), Some(elementIds)),
      Table("element_component", "CREATE TABLE element_component(id INTEGER, " +
        "element_id INTEGER, type INTEGER, data TEXT, PRIMARY KEY(id), " +
        "FOREIGN KEY(element_id) REFERENCES element(id) ON DELETE CASCADE)",
        Seq.empty),
      t("edge", "CREATE TABLE edge(id INTEGER NOT NULL, type INTEGER NOT NULL, " +
        "source_node_id INTEGER NOT NULL, target_node_id INTEGER NOT NULL, " +
        "PRIMARY KEY(id), FOREIGN KEY(id) REFERENCES element(id) ON DELETE CASCADE, " +
        "FOREIGN KEY(source_node_id) REFERENCES node(id) ON DELETE CASCADE, " +
        "FOREIGN KEY(target_node_id) REFERENCES node(id) ON DELETE CASCADE)",
        edgeTbl.sortBy(_._1)),
      t("node", "CREATE TABLE node(id INTEGER NOT NULL, type INTEGER NOT NULL, " +
        "serialized_name TEXT, PRIMARY KEY(id), " +
        "FOREIGN KEY(id) REFERENCES element(id) ON DELETE CASCADE)",
        nodeTbl.sortBy(_._1)),
      t("symbol", "CREATE TABLE symbol(id INTEGER NOT NULL, " +
        "definition_kind INTEGER NOT NULL, PRIMARY KEY(id), " +
        "FOREIGN KEY(id) REFERENCES node(id) ON DELETE CASCADE)",
        symbolTbl.sortBy(_._1)),
      t("file", "CREATE TABLE file(id INTEGER NOT NULL, path TEXT, " +
        "language TEXT, modification_time TEXT, indexed INTEGER, " +
        "complete INTEGER, line_count INTEGER, PRIMARY KEY(id), " +
        "FOREIGN KEY(id) REFERENCES node(id) ON DELETE CASCADE)",
        fileTbl.sortBy(_._1)),
      Table("filecontent", "CREATE TABLE filecontent(id INTEGER, content TEXT, " +
        "PRIMARY KEY(id), FOREIGN KEY(id) REFERENCES file(id) ON DELETE CASCADE)",
        Seq.empty),
      t("local_symbol", "CREATE TABLE local_symbol(id INTEGER NOT NULL, " +
        "name TEXT, PRIMARY KEY(id), " +
        "FOREIGN KEY(id) REFERENCES element(id) ON DELETE CASCADE)",
        localTbl.sortBy(_._1)),
      t("source_location", "CREATE TABLE source_location(id INTEGER NOT NULL, " +
        "file_node_id INTEGER, start_line INTEGER, start_column INTEGER, " +
        "end_line INTEGER, end_column INTEGER, type INTEGER, " +
        "PRIMARY KEY(id), " +
        "FOREIGN KEY(file_node_id) REFERENCES node(id) ON DELETE CASCADE)",
        locTbl),
      Table("occurrence", "CREATE TABLE occurrence(element_id INTEGER NOT NULL, " +
        "source_location_id INTEGER NOT NULL, " +
        "PRIMARY KEY(element_id, source_location_id), " +
        "FOREIGN KEY(element_id) REFERENCES element(id) ON DELETE CASCADE, " +
        "FOREIGN KEY(source_location_id) REFERENCES source_location(id) " +
        "ON DELETE CASCADE)", occTbl,
        // the composite PK's automatic index: (key cols, rowid) sorted
        // by key — integrity_check verifies it against the table
        autoIndexes = Seq(AutoIndex("sqlite_autoindex_occurrence_1",
          occTbl.zipWithIndex
            .map { case (row, i) =>
              (row.head.asInstanceOf[SqlInt].v,
                row(1).asInstanceOf[SqlInt].v, i + 1L)
            }
            .sortBy { case (e, l, _) => (e, l) }
            .map { case (e, l, rid) =>
              Seq(SqlInt(e), SqlInt(l), SqlInt(rid))
            }))),
      t("error", "CREATE TABLE error(id INTEGER NOT NULL, message TEXT, " +
        "fatal INTEGER, indexed INTEGER, translation_unit TEXT, " +
        "PRIMARY KEY(id), FOREIGN KEY(id) REFERENCES element(id) " +
        "ON DELETE CASCADE)", errorTbl.sortBy(_._1))))
  }

  def writeSrctrldb(snap: Snapshot.GraphSnapshot, path: String): Unit = {
    import SqliteFile._
    val ts = tables(snap)
    val out = ddl.map { case (name, cols, sql) =>
      val rows = ts(name)
        .orderBy(cols.map(col): _*)
        .collect().toSeq
        .map(r => cols.indices.map(i => r.get(i) match {
          case null => SqlNull
          case v: Long => SqlInt(v)
          case v: Int => SqlInt(v.toLong)
          case v: String => SqlText(v)
          case v => SqlText(v.toString)
        }).toSeq)
      Table(name, sql, rows)
    }
    SqliteFile.write(path, out)
  }
}
