package graft.indexer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.merge.Merge
import graft.model._
import graft.enrich.Closure

/** The indexing pipeline (reference run_mutiprocess.py / run_index_single
  * .py restated Spark-first, SURVEY.md §3.1):
  *
  *   files --flatMap indexFile--> events --merge--> nodes/edges/locations
  *         --enrich (D1-D4)--> snapshot
  *
  * The reference fans out a subprocess per file and serializes every write
  * through one inter-process lock (its main bottleneck, SURVEY.md §4); here
  * per-file parsing is executor-parallel (C2 = partition parallelism) and
  * the merge is two shuffles (SURVEY.md §2.A), so ingest scales with the
  * cluster, not the lock.
  */
object IndexPipeline {

  final case class SourceFile(path: String, content: String)

  /** C1 — enumerate a source tree into (path, content) rows,
    * EXECUTOR-side: the driver lists only the repo root's immediate
    * children (O(1) driver memory at any repo size); each executor task
    * walks its own subtree, and the resulting path set is rebalanced
    * before the content reads (subtree sizes are skewed). A Spark file
    * source (`binaryFile`) is deliberately NOT used here: the Hadoop
    * hidden-file convention silently skips `_`-/`.`-prefixed names like
    * `__init__.py` — load-bearing files for a Python indexer (they carry
    * the re-exports D2 chases). Assumes a shared filesystem, the same
    * posture the per-partition content reads already had. Paths are
    * relativized to `root` (A7, reference graphDB.py:155-174 does this
    * post-hoc). */
  def readRepo(spark: SparkSession, root: String): Dataset[SourceFile] = {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val rootPath = Paths.get(root)
    val topStream = Files.list(rootPath)
    val top =
      try topStream.iterator().asScala
        .map(p => rootPath.relativize(p).toString).toSeq.sorted
      finally topStream.close()
    spark.createDataset(top)
      .repartition(math.max(1, math.min(top.size, 64)))
      .flatMap { rel =>
        val p = Paths.get(root, rel)
        if (Files.isRegularFile(p)) {
          if (rel.endsWith(".py")) Iterator.single(rel) else Iterator.empty
        } else if (Files.isDirectory(p)) {
          val s = Files.walk(p)
          try s.iterator().asScala
            .filter(q => Files.isRegularFile(q) && q.toString.endsWith(".py"))
            .map(q => Paths.get(root).relativize(q).toString)
            .toVector.iterator
          finally s.close()
        } else Iterator.empty
      }
      .repartition(64)
      .map { rel =>
        val bytes = Files.readAllBytes(Paths.get(root, rel))
        SourceFile(rel, decodeSource(bytes))
      }
  }

  /** Encoding auto-derivation (the reference tries UTF-8 then lets the
    * codecs layer "derive encoding automatically",
    * shallow_indexer.py:79-86). For PYTHON sources the principled
    * derivation is what `tokenize.detect_encoding` does — and what we
    * implement, executor-side and allocation-light:
    *
    *  1. BOM sniff: UTF-8 / UTF-16LE/BE / UTF-32LE/BE (32 before 16 —
    *     a UTF-32LE BOM starts with the UTF-16LE one);
    *  2. PEP 263 coding cookie on line 1 or 2
    *     (`# -*- coding: latin-1 -*-`), charset resolved through Java's
    *     alias table (latin-1, cp1252, …) with unknown names ignored;
    *  3. strict UTF-8 (the Python-3 default);
    *  4. permissive total ISO-8859-1 (every byte maps) rather than
    *     scattering U+FFFD through the text — keeps un-decodable files
    *     indexable with their ASCII structure intact. */
  private[graft] def decodeSource(bytes: Array[Byte]): String = {
    import java.nio.charset.{Charset, StandardCharsets}
    def at(i: Int): Int = bytes(i) & 0xff
    def decode(cs: Charset, offset: Int): String =
      new String(bytes, offset, bytes.length - offset, cs)
    // 1 — BOM
    if (bytes.length >= 4 && at(0) == 0xff && at(1) == 0xfe &&
        at(2) == 0x00 && at(3) == 0x00)
      return decode(Charset.forName("UTF-32LE"), 4)
    if (bytes.length >= 4 && at(0) == 0x00 && at(1) == 0x00 &&
        at(2) == 0xfe && at(3) == 0xff)
      return decode(Charset.forName("UTF-32BE"), 4)
    if (bytes.length >= 2 && at(0) == 0xff && at(1) == 0xfe)
      return decode(StandardCharsets.UTF_16LE, 2)
    if (bytes.length >= 2 && at(0) == 0xfe && at(1) == 0xff)
      return decode(StandardCharsets.UTF_16BE, 2)
    if (bytes.length >= 3 && at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf)
      return decode(StandardCharsets.UTF_8, 3)
    // 2 — PEP 263 cookie within the first two lines (read them as
    // latin-1: the cookie is ASCII and every byte maps)
    locally {
      val headLen = math.min(bytes.length, 256)
      val head = new String(bytes, 0, headLen, StandardCharsets.ISO_8859_1)
      val cookie = """coding[:=]\s*([-\w.]+)""".r
      head.split("\n", 3).take(2).foreach { ln =>
        if (ln.trim.startsWith("#"))
          cookie.findFirstMatchIn(ln).foreach { m =>
            try return new String(bytes, Charset.forName(m.group(1)))
            catch { case _: Exception => /* unknown codec name: fall on */ }
          }
      }
    }
    // 3 — strict UTF-8, 4 — total fallback
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(bytes, StandardCharsets.ISO_8859_1)
    }
  }

  final case class Indexed(
      nodes: DataFrame, edges: DataFrame, locations: DataFrame,
      imports: DataFrame)

  /** C2/C4/C13 — index every file and merge the event stream into graph
    * tables. One wide flatMap (no shuffle) + the Merge shuffles. Files the
    * parser chokes on degrade to an ERROR location row (never abort). */
  def indexFiles(spark: SparkSession, files: Dataset[SourceFile],
      taskId: String): Indexed = {
    import spark.implicits._
    // r14 slice 62 pre-scan: one cheap executor pass collects each
    // module's top-level binding set (bounded: names per repo, the model
    // jedi holds in memory for the whole project anyway); broadcast so
    // the deep pass can DISPROVE imported decorator names cross-module
    val ctx = PyIndexer.corpusContext(
      files.map { f =>
        val s = PyIndexer.moduleBindings(f.path, f.content)
        (s.mod, s.names.toSeq.sorted, s.open, s.classes.toSeq.sorted,
          s.returns.toSeq.sorted, s.fields.toSeq.sorted,
          s.vars.toSeq.sorted, s.imports.toSeq.sorted,
          s.modImports.toSeq.sorted, s.bases.toSeq.sortBy(_._1),
          s.returnElems.toSeq.sorted, s.starImports, s.allList)
      }.collect().toSeq
        .map(t => PyIndexer.ModuleScan(t._1, t._2.toSet, t._3,
          t._4.toSet, t._5.toMap, t._6.toMap, t._7.toMap, t._8.toMap,
          t._9.toMap, t._10.toMap, t._11.toMap, t._12, t._13)))
    val ctxB = spark.sparkContext.broadcast(ctx)
    val events = files.flatMap { f =>
      val ev = PyIndexer.indexFileSafe(taskId, f.path, f.content,
        Some(ctxB.value))
      Seq((ev.symbols, ev.edges, ev.locations, ev.imports))
    }.cache()
    val symbolEvents = events.flatMap(_._1)
    val edgeEvents = events.flatMap(_._2)
    val locations = events.flatMap(_._3)
    val imports = events.flatMap(_._4)
    val nodes0 = Merge.mergeNodes(symbolEvents.toDF())
    val edges = Merge.mergeEdges(edgeEvents.toDF())
      .localCheckpoint(eager = true)
    val nodes = Merge.withStubs(nodes0, edges, taskId)
      .localCheckpoint(eager = true)
    // lineage cut at the phase boundary: the enrichment stage chains
    // enough joins that carrying the merge plan underneath it pushes
    // task binaries past the MiB warning threshold — and this is a
    // write pipeline, so materializing the merged tables is the normal
    // posture (the reference persists here too)
    Indexed(nodes, edges, locations.toDF(), imports.toDF())
  }

  /** D2 — re-export chasing: an edge/import target `pkg.name` where `pkg`
    * is a module that merely re-imports `name` (from .x import name in
    * __init__.py) is rewritten to the definition's full_name. Applied
    * `hops` times for chains (reference retries recursively,
    * ast_manage.py:128-152). */
  private def chaseReexports(targets: DataFrame, targetCol: String,
      imports: DataFrame, definedKeys: DataFrame, hops: Int): DataFrame = {
    val named = imports.filter(col("kind") === "name")
      .select(concat(col("module"), lit("."), col("alias")).as("_alias_fqn"),
        col("target").as("_reexport_target"))
    (1 to hops).foldLeft(targets) { (df, _) =>
      df
        // only rewrite targets that are NOT actually defined symbols
        .join(definedKeys.withColumnRenamed("full_name", targetCol)
          .withColumn("_defined", lit(true)), Seq(targetCol), "left")
        .join(named, col(targetCol) === col("_alias_fqn"), "left")
        .withColumn(targetCol,
          when(col("_defined").isNull && col("_reexport_target").isNotNull,
            col("_reexport_target")).otherwise(col(targetCol)))
        .drop("_alias_fqn", "_reexport_target", "_defined")
    }
  }

  /** D1-D4 — enrichment:
    *  1. re-export chasing (D2) rewrites edge targets through package
    *     __init__ re-imports;
    *  2. import containment (D1/D2): CONTAINS(importing module → imported
    *     symbol), wildcard `import *` expanding to every top-level member
    *     of the source module (B4 join shape, ast_manage.py:154-160);
    *  3. inherited-method closure (D4, ast_manage.py:79-99);
    *  4. stub reconciliation for the rewritten edge set.
    */
  def enrich(ix: Indexed, taskId: String): Indexed = {
    val defined = ix.nodes.filter(col("kind") =!= Kind.None_)
      .select(col("full_name"))
    val edges1 = chaseReexports(ix.edges, "dst", ix.imports, defined, hops = 2)

    // named import containment (only targets that exist as defined symbols)
    val importContains = chaseReexports(
      ix.imports.filter(col("kind") === "name")
        .select(col("module").as("src"), col("target").as("dst")),
      "dst", ix.imports, defined, hops = 2)
      .join(defined.withColumnRenamed("full_name", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), lit(Rel.Contains).as("rel_type"), col("dst"),
        map(lit("association_type"), lit("IMPORT")).as("props"))
    // wildcard: importing module CONTAINS every top-level member of target
    // (expanded over the post-import-containment edge set, so a package's
    // re-exported members — CONTAINS edges created just above — count)
    val contains1 = edges1.unionByName(importContains)
    val wildcardContains = ix.imports.filter(col("kind") === "wildcard")
      .select(col("module").as("_importer"), col("target").as("_srcmod"))
      .join(contains1.filter(col("rel_type") === Rel.Contains)
        .select(col("src").as("_srcmod"), col("dst")), "_srcmod")
      .select(col("_importer").as("src"), lit(Rel.Contains).as("rel_type"),
        col("dst"), map(lit("association_type"), lit("IMPORT")).as("props"))

    val withImports = contains1.unionByName(wildcardContains)
      .dropDuplicates("src", "rel_type", "dst")
      // second lineage cut: the closure + call-rebinding joins below
      // would otherwise re-serialize the whole re-export/wildcard chain
      // in every downstream stage
      .localCheckpoint(eager = true)

    val inherits = withImports.filter(col("rel_type") === Rel.Inherits)
      .select(col("src"), col("dst"))
    val hasMethod = withImports.filter(col("rel_type") === Rel.HasMethod)
      .select(col("src"), col("dst"))
    val newEdges = Closure.inheritedMethods(inherits, hasMethod)
      .select(col("src"), lit(Rel.HasMethod).as("rel_type"), col("dst"),
        map(lit("inherited"), lit("true")).as("props"))
    val withInherited0 = withImports.unionByName(newEdges)

    // C3 slice 16: `super().m()` sentinel call edges
    // (`<cls>.__super__.<m>`, PyIndexer) rewrite to the first definition
    // of m along the class's C3 MRO after the class itself
    // (Closure.superResolve — Python's zero-argument super() binding);
    // unresolved sentinels DROP, the shallow posture. The sentinel set
    // is tiny (one row per distinct super-call pair), so these joins
    // never touch the main edge volume.
    val superSent = ".__super__."
    val isSuperCall = col("rel_type") === Rel.Call &&
      col("dst").contains(superSent)
    val superRaw = withInherited0.filter(isSuperCall)
    val withInherited =
      if (superRaw.isEmpty) withInherited0
      else {
        val pairs = superRaw.select(
          substring_index(col("dst"), superSent, 1).as("cls"),
          substring_index(col("dst"), superSent, -1).as("meth")).distinct()
        val inheritsOrd = withImports
          .filter(col("rel_type") === Rel.Inherits)
          .select(col("src"), col("dst"),
            element_at(col("props"), "ord").cast("int").as("ord"))
        val resolved = Closure.superResolve(inheritsOrd, hasMethod, pairs)
        val rewritten = superRaw
          .withColumn("cls", substring_index(col("dst"), superSent, 1))
          .withColumn("meth", substring_index(col("dst"), superSent, -1))
          .join(resolved, Seq("cls", "meth"))
          .withColumn("dst", col("target"))
          .drop("cls", "meth", "target")
        withInherited0.filter(!isSuperCall).unionByName(rewritten)
          .dropDuplicates("src", "rel_type", "dst")
      }

    // C11 approximation: a CALL to an inherited method (`self.m()` bound
    // syntactically to Class.m, which is not defined) re-points to the
    // ancestor's definition discovered by the closure
    val inheritedDefs = newEdges
      .select(col("src").as("_cls"),
        element_at(split(col("dst"), "\\."), -1).as("_meth"),
        col("dst").as("_def"))
    // r12 (r11 verdict #4): cross-module member-take VERIFICATION — the
    // chaseFields convention takes the final member of a cross-module
    // chain blindly, which can emit CALL edges to members that don't
    // exist. Here the whole-corpus tables exist, so the blind take joins
    // against the indexed defs: a CALL whose dst parses as
    // <cls>.<member> where <cls> IS an indexed CLASS node but nothing
    // defines <member> — not the class's own defs (incl. FIELD nodes),
    // not the inherited-method closure — resolves to NOTHING, jedi's
    // behavior (indexer_visitor.py:183-241): the edge DROPS instead of
    // fabricating a stub. Receivers outside the indexed corpus keep the
    // take (nothing to disprove — the shallow posture).
    val classDefs = ix.nodes.filter(col("kind") === Kind.Class)
      .select(col("full_name").as("_clsdef")).distinct()
    // r13 (advisor finding): 'not in the def table' is weaker evidence
    // than 'does not exist' for classes that build members DYNAMICALLY.
    // A class that defines or inherits __getattr__/__getattribute__ can
    // answer any member take at runtime, so its absent members keep the
    // conservative stub instead of dropping — the drop applies only to
    // classes the indexer can model completely. (setattr()-built members
    // stay out of reach: a bare builtin call emits no edge to key on.)
    val dynCls = defined
      .filter(col("full_name").endsWith(".__getattr__") ||
        col("full_name").endsWith(".__getattribute__"))
      .select(expr("substring(full_name, 1, length(full_name) - " +
        "length(element_at(split(full_name, '\\\\.'), -1)) - 1)")
        .as("_dyncls"))
      .unionByName(inheritedDefs
        .filter(col("_meth").isin("__getattr__", "__getattribute__"))
        .select(col("_cls").as("_dyncls")))
      .distinct()
      .withColumn("_dyn", lit(true))
    val flagged = withInherited
      .join(defined.withColumn("_dstdef", lit(true))
        .withColumnRenamed("full_name", "dst"), Seq("dst"), "left")
      .withColumn("_cls2", expr("substring(dst, 1, length(dst) - length(element_at(split(dst, '\\\\.'), -1)) - 1)"))
      .join(inheritedDefs,
        col("rel_type") === Rel.Call && col("_dstdef").isNull &&
          col("_cls2") === col("_cls") &&
          element_at(split(col("dst"), "\\."), -1) === col("_meth"),
        "left")
      .join(classDefs, col("_cls2") === col("_clsdef"), "left")
      .join(dynCls, col("_cls2") === col("_dyncls"), "left")
      .withColumn("_dropme",
        col("rel_type") === Rel.Call && col("_dstdef").isNull &&
          col("_def").isNull && col("_clsdef").isNotNull && col("_dyn").isNull)
    val finalEdges = flagged
      .filter(!col("_dropme"))
      .withColumn("dst", coalesce(col("_def"), col("dst")))
      .drop("_dstdef", "_cls2", "_cls", "_meth", "_def", "_clsdef",
        "_dyncls", "_dyn", "_dropme")
      .dropDuplicates("src", "rel_type", "dst")
    // r13 (r12 verdict #7): a dropped nonexistent-member edge must also
    // drop its srctrl REFERENCE occurrence rows — the SQLite sink keys
    // occurrences by symbolFullName, and a location citing a name no
    // edge carries would either dangle or (if the name re-appears as a
    // hierarchy prefix) cite a dropped reference. Symbol/scope/local
    // locations are untouched: only the REFERENCE anchor of the dropped
    // take goes.
    val droppedDsts = flagged.filter(col("_dropme"))
      .select(col("dst").as("symbolFullName")).distinct()
      .withColumn("_gone", lit(true))
    val locations2 = ix.locations
      .join(droppedDsts, Seq("symbolFullName"), "left")
      .filter(!(col("kind") === "REFERENCE" && col("_gone").isNotNull))
      .drop("_gone")

    // stub reconciliation: real + still-referenced stubs for the new edges
    val realNodes = ix.nodes.filter(col("kind") =!= Kind.None_)
    val nodes2 = graft.merge.Merge.withStubs(realNodes, finalEdges, taskId)
    Indexed(nodes2, finalEdges, locations2, ix.imports)
  }

  /** End-to-end: repo directory → enriched snapshot. */
  def run(spark: SparkSession, root: String, taskId: String): Indexed =
    enrich(indexFiles(spark, readRepo(spark, root), taskId), taskId)
}
