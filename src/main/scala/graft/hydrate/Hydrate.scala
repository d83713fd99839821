package graft.hydrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result hydration — the reference's `<CODE>{"S":…,"E":…,"F":…}</CODE>`
  * lazy pointers (graphDB.py:208-257): a query result carries a JSON
  * pointer into a source file; hydration slices lines [S-1:E], de-indents,
  * and folds snippets longer than `foldedLen`.
  *
  * Spark-native restatement: no scalar UDF — the pointer parse is
  * `from_json`, the line slice is split/slice/array_join, all codegen'd
  * builtins; the file text arrives via an equi-join against a
  * files(file_path, content) DataFrame (broadcast when the repo is small).
  */
object Hydrate {
  val pointerSchema: StructType = StructType(Seq(
    StructField("S", IntegerType), // start line, 1-based
    StructField("E", IntegerType), // end line, inclusive
    StructField("F", StringType))) // file path

  /** Extract the first <CODE>…</CODE> pointer from a string column. */
  def parsePointer(c: Column): Column =
    from_json(regexp_extract(c, "<CODE>(\\{.*?\\})</CODE>", 1), pointerSchema)

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
    * reference graphDB.py:249-252. */
  def fold(snippet: Column, foldedLen: Int): Column =
    when(length(snippet) > foldedLen,
      concat(substring(snippet, 1, foldedLen), lit("..."))).otherwise(snippet)

  /** Hydrate a result column containing <CODE> pointers against a
    * files(file_path, content) DataFrame. Adds a `code` column. */
  def hydrate(results: DataFrame, files: DataFrame, pointerCol: String,
      foldedLen: Int = 200): DataFrame = {
    val withPtr = results.withColumn("_ptr", parsePointer(col(pointerCol)))
    withPtr
      .join(broadcast(files), withPtr("_ptr.F") === files("file_path"), "left")
      .withColumn("code",
        fold(deindent(sliceLines(col("content"), col("_ptr.S"), col("_ptr.E"))),
          foldedLen))
      .drop("_ptr", "file_path", "content")
  }
}
