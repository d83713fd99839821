package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B10 — `execute_query(cypher)` for the eight Cypher shapes the reference
  * actually issues (SURVEY.md §2.B; graphDB.py:106-112 delegates arbitrary
  * Cypher to Neo4j — full Cypher is out of scope by design, §7.3):
  *
  *   B1/B2  MATCH (n:L1:L2 {k:'v', …}) RETURN <proj>
  *   B3-B6  MATCH (a:L {k:'v'})-[:REL]->(b:L2 {k2:'v2'}) RETURN <proj>
  *   B7     MATCH (n:L) WHERE exists(n.prop) RETURN <proj>
  *   B8     MATCH (n:L) RETURN n
  *
  * Projections: `x` (all columns of x, prefixed), `x.prop`,
  * `labels(x)` (task_ids + kind array). Labels match the node's `kind` or
  * one of its `task_ids` (the reference's multi-label set, §1.1).
  *
  * The parse result is a plain DataFrame expression — Catalyst plans it
  * like any hand-written combinator query (broadcast point expands,
  * pushdown, etc.).
  */
object CypherLite {

  private val nodePat =
    """\(\s*(\w+)\s*((?::\w+)*)\s*(\{[^}]*\})?\s*\)""".r
  private val matchEdge =
    ("""(?s)MATCH\s*""" + nodePat.regex +
      """\s*-\[\s*:(\w+)\s*\]->\s*""" + nodePat.regex +
      """\s*RETURN\s+(.+)""").r
  private val matchNodeWhere =
    ("""(?s)MATCH\s*""" + nodePat.regex +
      """\s*WHERE\s+exists\(\s*(\w+)\.(\w+)\s*\)\s*RETURN\s+(.+)""").r
  private val matchNode =
    ("""(?s)MATCH\s*""" + nodePat.regex + """\s*RETURN\s+(.+)""").r

  private def parseProps(s: String): Map[String, String] =
    if (s == null || s.trim.isEmpty) Map.empty
    else s.stripPrefix("{").stripSuffix("}").split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim -> v.trim.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
      }.toMap

  private def parseLabels(s: String): Seq[String] =
    if (s == null) Seq.empty
    else s.split(":").map(_.trim).filter(_.nonEmpty).toSeq

  /** Node-pattern predicate over the engine's nodes schema: each label
    * must equal `kind` or be a member of `task_ids`; each prop literal is
    * an equality on the column (full_name/name/…) or the props map. */
  private def nodePred(nodes: DataFrame, labels: Seq[String],
      props: Map[String, String]): Column = {
    val fixed = Set("full_name", "kind", "name", "file_path", "signature",
      "clazz", "code")
    val labelConds = labels.map(l =>
      col("kind") === l || array_contains(col("task_ids"), l))
    val propConds = props.map { case (k, v) =>
      if (fixed(k)) col(k) === v else element_at(col("props"), k) === v
    }
    (labelConds ++ propConds).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** vars: cypher variable -> DataFrame alias. */
  private def projections(spec: String, vars: Map[String, String])
      : Seq[Column] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap {
      case p if p.startsWith("labels(") =>
        val v = p.stripPrefix("labels(").stripSuffix(")")
        val a = vars(v)
        Seq(array_union(col(s"$a.task_ids"), array(col(s"$a.kind")))
          .as(s"labels($v)"))
      case p if p.contains(".") =>
        val Array(v, prop) = p.split("\\.", 2)
        Seq(col(s"${vars(v)}.$prop").as(s"$v.$prop"))
      case v =>
        // whole-variable projection: fixed columns, prefixed
        Seq("full_name", "kind", "name", "file_path", "signature")
          .map(c => col(s"${vars(v)}.$c").as(s"$v.$c"))
    }

  /** Execute one of the supported shapes against (nodes, edges). */
  def execute(nodes: DataFrame, edges: DataFrame, query: String): DataFrame = {
    val q = query.trim
    q match {
      case matchEdge(v1, l1, p1, rel, v2, l2, p2, ret) =>
        val left = nodes.filter(nodePred(nodes, parseLabels(l1), parseProps(p1)))
        val right = nodes.filter(nodePred(nodes, parseLabels(l2), parseProps(p2)))
        val e = edges.filter(col("rel_type") === rel)
        val joined = left.alias("l")
          .join(e.alias("e"), col("l.full_name") === col("e.src"))
          .join(right.alias("r"), col("e.dst") === col("r.full_name"))
        joined.select(projections(ret, Map(v1 -> "l", v2 -> "r")): _*)
      case matchNodeWhere(v, l, p, wv, wprop, ret) =>
        require(wv == v, s"unknown variable $wv in WHERE")
        val base = nodes
          .filter(nodePred(nodes, parseLabels(l), parseProps(p)))
          .filter(col(wprop).isNotNull)
        base.alias("n").select(projections(ret, Map(v -> "n")): _*)
      case matchNode(v, l, p, ret) =>
        val base = nodes.filter(nodePred(nodes, parseLabels(l), parseProps(p)))
        base.alias("n").select(projections(ret, Map(v -> "n")): _*)
      case _ =>
        throw new IllegalArgumentException(
          s"unsupported Cypher shape (B1-B8 subset only): $q")
    }
  }
}
