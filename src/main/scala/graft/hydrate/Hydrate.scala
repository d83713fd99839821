package graft.hydrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result hydration — the reference's `<CODE>{"S":…,"E":…,"F":…}</CODE>`
  * lazy pointers (graphDB.py:208-257): a query result carries JSON
  * pointers into source files; hydration replaces EVERY pointer with the
  * line slice [S-1:E] of its file, folding a snippet only when the record
  * has more than one pointer AND the snippet exceeds `foldedLen` chars
  * (suffix `...(code folded)`, graphDB.py:249-252).
  *
  * Spark-native restatement: no scalar UDF — pointers are extracted with
  * `regexp_extract_all` + `from_json`, exploded, equi-joined against a
  * files(file_path, content) DataFrame (no forced broadcast: AQE picks
  * the join strategy from the files side's actual size), and folded
  * replacements are stitched back per record with an `aggregate` over the
  * ordered pointer list.
  */
object Hydrate {
  val pointerSchema: StructType = StructType(Seq(
    StructField("S", IntegerType), // start line, 1-based
    StructField("E", IntegerType), // end line, inclusive
    StructField("F", StringType))) // file path

  /** Extract the first <CODE>…</CODE> pointer from a string column. */
  def parsePointer(c: Column): Column =
    from_json(regexp_extract(c, "<CODE>(\\{.*?\\})</CODE>", 1), pointerSchema)

  /** All <CODE>…</CODE> pointer payloads of a string column, in order. */
  def parsePointers(c: Column): Column =
    regexp_extract_all(c, lit("<CODE>(\\{.*?\\})</CODE>"), lit(1))

  /** Slice lines [start, end] (1-based, inclusive) out of a text column. */
  def sliceLines(text: Column, start: Column, end: Column): Column =
    array_join(slice(split(text, "\n"), start, end - start + 1), "\n")

  /** De-indent: strip the first line's leading-WHITESPACE count from every
    * line — reference graphDB.py:219-223 (`len(line) - len(line.lstrip())`,
    * Python lstrip = any Unicode whitespace incl. tabs, hence `(?U)\s`,
    * not space-only ltrim). Lines shorter than the indent become ''
    * (substr past the end), matching the reference's else-'' branch. */
  def deindent(snippet: Column): Column = {
    val lines = split(snippet, "\n")
    val first = element_at(lines, 1)
    val ind = length(first) - length(regexp_replace(first, "(?U)^\\s+", ""))
    array_join(transform(lines, l => l.substr(ind + lit(1), length(l))), "\n")
  }

  /** Fold a snippet to at most `foldedLen` chars, appending an ellipsis —
    * the C14 eager-slice folding. */
  def fold(snippet: Column, foldedLen: Int): Column =
    when(length(snippet) > foldedLen,
      concat(substring(snippet, 1, foldedLen), lit("..."))).otherwise(snippet)

  /** Python str.strip(): all leading/trailing whitespace (Spark's trim
    * only strips spaces). `(?U)` matches Python's Unicode notion of
    * whitespace ( ,  , …), not just ASCII \s. */
  private def pyStrip(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?U)^\\s+", ""), "(?U)\\s+$", "")

  /** The reference's multi-snippet fold rule (graphDB.py:249-252): fold
    * ONLY when the record carries >1 pointer AND this snippet exceeds
    * foldedLen; the folded form is strip()[:foldedLen] + suffix. */
  private def foldMulti(snippet: Column, nPtrs: Column, foldedLen: Int): Column =
    when(nPtrs > 1 && length(snippet) > foldedLen,
      concat(substring(pyStrip(snippet), 1, foldedLen), lit("...(code folded)")))
      .otherwise(snippet)

  /** `process_string` (graphDB.py:228-257): replace every <CODE> pointer
    * inside `strCol` with its (possibly folded) snippet, in place. Adds
    * column `outCol` with the hydrated string; rows without pointers pass
    * through unchanged. Missing files hydrate to '' (graphDB.py:216-217).
    * `isIndent` mirrors the reference's default of preserving indentation
    * in the query path. */
  def processString(results: DataFrame, files: DataFrame, strCol: String,
      outCol: String = "code", foldedLen: Int = 10,
      isIndent: Boolean = false): DataFrame = {
    val inCols = results.columns.toSeq
    // ONE linear plan: the row id is minted once and only flows DOWNSTREAM
    // (explode → file join → group-back). The previous shape joined the
    // grouped replacements back against a SECOND evaluation of the
    // nondeterministic monotonically_increasing_id — plan-dependent silent
    // corruption at scale (round-3 ADVICE, medium). Here the original row
    // is carried through the explode and re-assembled by first() in the
    // same aggregation, so no self-join exists to disagree with itself.
    val exploded = results
      .withColumn("_hid", monotonically_increasing_id())
      .withColumn("_ptrs", parsePointers(col(strCol)))
      .withColumn("_n", size(col("_ptrs")))
      .select(col("*"), posexplode_outer(col("_ptrs")).as(Seq("_pos", "_ptr")))
      .withColumn("_p", from_json(col("_ptr"), pointerSchema))
    // files side: plain equi-join, strategy left to Catalyst/AQE — a
    // forced broadcast would OOM on a large repo (round-2 finding #1).
    // The files columns are renamed to reserved names first: `results`
    // may itself carry file_path/content columns (node frames do), and
    // an unqualified reference after the join would be ambiguous.
    val f = files.select(col("file_path").as("_hyd_path"),
      col("content").as("_hyd_content"))
    val joined = exploded.join(f, exploded("_p.F") === f("_hyd_path"), "left")
    val start = greatest(col("_p.S"), lit(1)) // reference clamps start_line < 1
    val raw = when(col("_p.E") >= start,
      array_join(slice(split(col("_hyd_content"), "\n"), start, col("_p.E") - start + 1), "\n"))
      .otherwise(lit(""))
    val snip = coalesce(if (isIndent) deindent(raw) else raw, lit("")) // missing file -> ''
    joined
      .withColumn("_repl", foldMulti(snip, col("_n"), foldedLen))
      .groupBy("_hid")
      .agg(first(col(strCol)).as("_str"),
        // collect_list drops nulls: pointer-less rows (posexplode_outer's
        // null row) contribute an empty replacement list, not a null entry
        (array_sort(collect_list(when(col("_ptr").isNotNull,
          struct(col("_pos"), col("_ptr"), col("_repl"))))).as("_repls") +:
          inCols.filter(_ != strCol).map(c => first(col(c)).as(c))): _*)
      .withColumn(strCol, col("_str"))
      .withColumn(outCol,
        aggregate(col("_repls"), col(strCol),
          (acc, r) => replace(acc,
            concat(lit("<CODE>"), r.getField("_ptr"), lit("</CODE>")),
            r.getField("_repl"))))
      .select((if (inCols.contains(outCol)) inCols
               else inCols :+ outCol).map(col): _*)
  }

  /** Hydrate a result column containing <CODE> pointers against a
    * files(file_path, content) DataFrame. Adds a `code` column holding
    * the fully hydrated string (all pointers replaced per the reference's
    * process_string rule). Default foldedLen=10 matches the reference's
    * process_string signature (graphDB.py:228-229), which the B6/B11
    * methodsOf demo path (graphDB.py:280-283) inherits. */
  def hydrate(results: DataFrame, files: DataFrame, pointerCol: String,
      foldedLen: Int = 10): DataFrame =
    processString(results, files, pointerCol, outCol = "code",
      foldedLen = foldedLen)
}
