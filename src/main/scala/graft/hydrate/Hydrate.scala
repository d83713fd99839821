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

  /** De-indent: strip the first line's leading-space count from every
    * line — reference graphDB.py:220-223. */
  def deindent(snippet: Column): Column = {
    val lines = split(snippet, "\n")
    val first = element_at(lines, 1)
    val ind = length(first) - length(ltrim(first))
    array_join(transform(lines, l => l.substr(ind + lit(1), length(l))), "\n")
  }

  /** Fold a snippet to at most `foldedLen` chars, appending an ellipsis —
    * the C14 eager-slice folding. */
  def fold(snippet: Column, foldedLen: Int): Column =
    when(length(snippet) > foldedLen,
      concat(substring(snippet, 1, foldedLen), lit("..."))).otherwise(snippet)

  /** Python str.strip(): all leading/trailing whitespace (Spark's trim
    * only strips spaces). */
  private def pyStrip(c: Column): Column =
    regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+$", "")

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
    val withId = results
      .withColumn("_hid", monotonically_increasing_id())
      .withColumn("_ptrs", parsePointers(col(strCol)))
    val exploded = withId
      .select(col("_hid"), size(col("_ptrs")).as("_n"),
        posexplode(col("_ptrs")).as(Seq("_pos", "_ptr")))
      .withColumn("_p", from_json(col("_ptr"), pointerSchema))
    // files side: plain equi-join, strategy left to Catalyst/AQE — a
    // forced broadcast would OOM on a large repo (round-2 finding #1)
    val joined = exploded.join(files, exploded("_p.F") === files("file_path"), "left")
    val start = greatest(col("_p.S"), lit(1)) // reference clamps start_line < 1
    val raw = when(col("_p.E") >= start,
      array_join(slice(split(col("content"), "\n"), start, col("_p.E") - start + 1), "\n"))
      .otherwise(lit(""))
    val snip = coalesce(if (isIndent) deindent(raw) else raw, lit("")) // missing file -> ''
    val repls = joined
      .select(col("_hid"), col("_pos"), col("_ptr"),
        foldMulti(snip, col("_n"), foldedLen).as("_repl"))
      .groupBy("_hid")
      .agg(array_sort(collect_list(struct(col("_pos"), col("_ptr"), col("_repl"))))
        .as("_repls"))
    withId.join(repls, Seq("_hid"), "left")
      .withColumn(outCol,
        aggregate(
          coalesce(col("_repls"),
            array().cast("array<struct<_pos:int,_ptr:string,_repl:string>>")),
          col(strCol),
          (acc, r) => replace(acc,
            concat(lit("<CODE>"), r.getField("_ptr"), lit("</CODE>")),
            r.getField("_repl"))))
      .select((if (inCols.contains(outCol)) inCols
               else inCols :+ outCol).map(col): _*)
  }

  /** Hydrate a result column containing <CODE> pointers against a
    * files(file_path, content) DataFrame. Adds a `code` column holding
    * the fully hydrated string (all pointers replaced per the reference's
    * process_string rule). */
  def hydrate(results: DataFrame, files: DataFrame, pointerCol: String,
      foldedLen: Int = 200): DataFrame =
    processString(results, files, pointerCol, outCol = "code",
      foldedLen = foldedLen)
}
