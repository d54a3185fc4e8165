package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Basic-graph-pattern (BGP) matching over the constructed KG — the
 * SPARQL conjunctive-query core: a list of (subj, pred, obj) patterns
 * whose terms are either variables (`?name`) or constants, evaluated as
 * the natural join of the per-pattern triple selections, returning the
 * DISTINCT variable bindings (set semantics, like `SELECT DISTINCT` in
 * SPARQL). The reference constructs a graph but offers no way to QUERY
 * it conjunctively (its consumers drop to Cypher in the external store,
 * cs562_sdpg `DataLoader.scala:23`); this closes that loop natively so
 * a KG built by [[graft.pipeline.KGPipeline]] is queryable in the same
 * session without an export hop.
 *
 * 100 TB shape: each pattern compiles to a FILTERED PROJECTION of the
 * triple table — constant terms become `=` predicates that Catalyst
 * pushes into the scan (pred-constant patterns prune to one predicate's
 * row group / partition when triples are stored pred-partitioned, the
 * standard vertical-partitioning layout) — and every pattern-to-pattern
 * combination is an EQUI join on the shared variables (AQE broadcasts
 * the small filtered sides; no theta joins, so never a nested-loop
 * plan; plan-pinned in PlanSpec). Patterns are joined in the caller's
 * order, smallest-selectivity-first ordering is the caller's lever the
 * same way join order is in SQL. A pattern sharing NO variable with the
 * accumulated prefix is a deliberate cross join (SPARQL cartesian
 * semantics) — allowed but documented, since the result set, not the
 * corpus, is what explodes.
 */
object Bgp {

  /** A term is a variable iff it starts with `?`; the binding column is
    * named after the variable without the marker. */
  private def isVar(t: String): Boolean = t.startsWith("?")
  private def varName(t: String): String = t.stripPrefix("?")

  /**
   * Evaluate a BGP over a triple table with columns `subj`, `pred`,
   * `obj`. Each pattern needs >= 1 variable (a fully-constant pattern is
   * an ASK, not a SELECT — rejected). Null slots never bind (SPARQL has
   * no null term): rows with a null in a matched slot are filtered out
   * per pattern. A variable repeated WITHIN a pattern (e.g.
   * `(?x, knows, ?x)`) becomes an equality filter on that pattern's
   * selection.
   *
   * @return DISTINCT bindings, one column per variable, ordered by
   *         first appearance across the pattern list.
   */
  def matchPatterns(triples: DataFrame,
                    patterns: Seq[(String, String, String)]): DataFrame = {
    require(patterns.nonEmpty, "BGP needs at least one pattern")
    val varOrder = scala.collection.mutable.LinkedHashSet.empty[String]

    val selections = patterns.zipWithIndex.map { case ((s, p, o), i) =>
      val terms = Seq("subj" -> s, "pred" -> p, "obj" -> o)
      require(terms.exists(t => isVar(t._2)),
        s"pattern $i ($s, $p, $o) has no variable; fully-constant " +
          "patterns (ASK semantics) are not supported")
      // constants filter; variables demand a bindable (non-null) slot
      val filtered = terms.foldLeft(triples.select("subj", "pred", "obj")) {
        case (df, (slot, term)) =>
          if (isVar(term)) df.filter(col(slot).isNotNull)
          else df.filter(col(slot) === lit(term))
      }
      // a variable on several slots of the SAME pattern = equality filter
      val bySlotVar = terms.filter(t => isVar(t._2))
      val dupFiltered = bySlotVar.groupBy(t => varName(t._2)).values
        .filter(_.size > 1)
        .foldLeft(filtered) { case (df, slots) =>
          slots.tail.foldLeft(df) { case (d, (slot, _)) =>
            d.filter(col(slot) === col(slots.head._1))
          }
        }
      val proj = bySlotVar.groupBy(t => varName(t._2)).map {
        case (v, slots) => col(slots.head._1).as(v)
      }.toSeq
      bySlotVar.foreach(t => varOrder += varName(t._2))
      // no per-pattern distinct: the canonical triple set is already
      // duplicate-free ([[graft.pipeline.KGPipeline]] contract), so an
      // exchange per pattern would buy nothing; the terminal distinct
      // alone carries the set semantics
      dupFiltered.select(proj: _*)
    }

    val joined = selections.reduceLeft { (acc, sel) =>
      val shared = acc.columns.toSeq.intersect(sel.columns.toSeq)
      if (shared.nonEmpty) acc.join(sel, shared)
      else acc.crossJoin(sel) // SPARQL cartesian semantics, caller-visible
    }
    joined.select(varOrder.toSeq.map(col): _*).distinct()
  }
}
