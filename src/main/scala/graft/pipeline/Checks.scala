package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY checks — the Deequ/dbt-test/expectations
  * guardrail a training pipeline runs before any corpus ships:
  * completeness, uniqueness, accepted values, range and consistency
  * rules, each reported as (table, check, metric, passed).
  *
  * Shape: ONE wide aggregate per table (every rule a conditional count
  * inside the same partial-agg scan — adding a rule adds a column, not
  * a pass), unpivoted to rows via stack. Metrics are integer ppm
  * (`10⁶·ok div n` — bit-portable, no float ratios) and pass/fail is
  * the exact integer comparison `ok == n`, so a verdict can never
  * 1-ulp-flip between engines. Exact `count_distinct` backs the
  * uniqueness rules; at 100 TB the KMV sketch is the drop-in switch
  * (the t_colstats note).
  */
object Checks {

  def qualityChecks(documents: DataFrame, events: DataFrame): DataFrame = {
    val d = documents.agg(
      count(lit(1)).as("n"),
      count_distinct(col("doc_id")).as("ids"),
      sum(when(col("text").isNotNull && length(col("text")) > 0, 1L)
        .otherwise(0L)).as("complete"),
      sum(when(col("n_chars") === length(col("text")), 1L).otherwise(0L))
        .as("consistent"),
      sum(when(col("lang").isin("en", "de", "es", "fr", "zh"), 1L)
        .otherwise(0L)).as("langok"),
      sum(when(length(col("text")) >= 100, 1L).otherwise(0L)).as("len100"))
    val e = events.agg(
      count(lit(1)).as("n"),
      count_distinct(col("event_id")).as("ids"),
      sum(when(col("value") >= 0 && col("value") <= 100, 1L).otherwise(0L))
        .as("vrange"),
      sum(when(col("event_type").isin("view", "click", "signup",
        "purchase"), 1L).otherwise(0L)).as("typeok"))
    val dRows = d.select(lit("documents").as("tbl"), col("n"),
      expr("""stack(5,
        'doc_id_unique', ids,
        'text_complete', complete,
        'n_chars_consistent', consistent,
        'lang_accepted', langok,
        'text_min_len_100', len100) AS (check_name, ok)"""))
    val eRows = e.select(lit("events").as("tbl"), col("n"),
      expr("""stack(3,
        'event_id_unique', ids,
        'value_in_range', vrange,
        'type_accepted', typeok) AS (check_name, ok)"""))
    dRows.unionByName(eRows)
      .select(col("tbl"), col("check_name"),
        expr("CAST((1000000 * ok) DIV n AS BIGINT)").as("metric_ppm"),
        (col("ok") === col("n")).cast("int").as("passed"))
  }
}
