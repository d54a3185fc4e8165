package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-node triangle counting + local clustering coefficient over the
 * materialized entity graph — the standard KG-quality / community
 * signal (a canonicalization that merges unrelated entities shows up as
 * implausibly dense neighborhoods). The reference materializes its
 * graph back to Neo4j and leaves analytics to the store
 * (`Main.scala:186-199`); a Spark-resident KG needs the op in the
 * engine, like [[PageRank]] and [[ConnectedComponents]].
 *
 * Semantics: triangles of the UNDIRECTED SIMPLE graph induced by the
 * edge list — direction dropped, parallel edges collapsed, self-loops
 * ignored. Output per node: degree, triangle count, and the local
 * clustering coefficient 2T/(deg·(deg−1)) (6dp, 0.0 for deg < 2).
 * Deterministic — a pure function of the edge SET.
 *
 * 100 TB shape — the MapReduce degree-orientation algorithm (Suri &
 * Vassilvitskii, WWW 2011; Cohen, CiSE 2009): orient every edge from
 * its lower-(degree, id) endpoint to the higher one, build wedges only
 * from each node's OUT-neighbors, and close them against oriented
 * edges. Orientation bounds out-degree by O(√m) on any graph, so the
 * wedge self-join — the step that explodes on power-law graphs when
 * done naively from raw adjacency — generates at most O(m^1.5) rows
 * total and no single key fans out on a hub node. Every triangle is
 * emitted exactly once (at its lowest-rank corner, with ranked wedge
 * ends), so no /3 correction or distinct is needed. Plan: one degree
 * partial agg, two annotation joins, the u-keyed wedge self-join, one
 * (x,y)-keyed closing join, and one per-node count — all shuffles
 * keyed on node/edge ids, AQE-skew-splittable.
 */
object Triangles {

  /** Per-node report: (node, degree, triangles, clustering). Input
    * `edges` needs `src`/`dst` columns; nulls are dropped. */
  def perNode(edges: DataFrame): DataFrame = {
    // localCheckpoint (lazy): und feeds the degree agg AND both
    // annotation joins, o feeds the wedge self-join twice plus the
    // closing join — without a lineage cut every reference recomputes
    // the whole upstream plan (measured 16.6 s -> the full KG pipeline
    // ~6x on the kg10 bench query; cut, the recompute disappears)
    val und = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val dA = deg.select(col("node").as("a"), col("degree").as("da"))
    val dB = deg.select(col("node").as("b"), col("degree").as("db"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented: u = lower (degree, id) endpoint, dv = degree of the head
    // (carried so the wedge join can rank its two ends without another
    // degree lookup)
    val o = und.join(dA, "a").join(dB, "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint(false)
    val o1 = o.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val o2 = o.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = o1.join(o2, Seq("u"))
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
    // the closing edge x->y is itself oriented low-rank -> high-rank,
    // matching the wedge's end ordering
    val tri = wedges.join(o.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    val cnt = tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(cnt, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          round(coalesce(col("triangles"), lit(0L)) * 2.0 /
            (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
