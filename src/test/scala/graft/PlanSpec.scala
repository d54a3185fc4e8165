package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan properties: pushdown, pruning, broadcast, codegen.
  * These are the scale guarantees — a plan that reads all columns or
  * shuffles a broadcastable dim is wrong at 100 TB even if the rows match. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: parquet scan prunes to the aggregated columns only") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, dir))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("q2: small dims join as broadcast hash joins") {
    val p = plan(SparkEntry.queries("q2_join_broadcast")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("q4: anti-join filter pushed to the orders scan") {
    val p = plan(SparkEntry.queries("q4_anti_join")(spark, dir))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan(o_totalprice"),
      s"filter not pushed: $pushed")
  }

  test("extraction plan stays inside whole-stage codegen (no UDFs)") {
    val tr = graft.fixtures.TranscriptGen.transcripts(spark, 10)
    val p = plan(graft.extract.Extraction.triplesRaw(tr))
    // formatted mode marks codegen'd nodes with a leading '*'
    assert(p.linesIterator.exists(_.trim.startsWith("* Project")), "codegen projections")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"))
  }

  test("stableTurns plans as a per-group top-1 limit, not a full window sort") {
    val tr = graft.fixtures.TranscriptGen.transcripts(spark, 10)
    val p = plan(graft.ingest.Transcripts.stableTurns(tr))
    assert(p.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit (streaming top-1 per group); got:\n${p.take(800)}")
  }

  test("mm3: feature extraction is exchange-free (per-row transform, no shuffle)") {
    val p = plan(SparkEntry.queries("mm3_features")(spark, dir))
    assert(!p.contains("Exchange"),
      s"extractFeatures must not shuffle payload bytes; got:\n${p.take(1200)}")
  }

  test("ann1: query side broadcast, corpus never shuffled for the join") {
    val p = plan(SparkEntry.queries("ann1_brute_topk")(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query set must broadcast")
  }

  test("GraftExtensions: spark.sql.extensions registers the native functions") {
    // a derived session over the shared SparkContext, built THROUGH the
    // extensions hook (the spark-submit deployment path). getOrCreate
    // returns the existing default session untouched unless it is cleared
    // first — restore it after, or every later suite inherits this one.
    import org.apache.spark.sql.SparkSession
    val base = spark // force lazy init before clearing
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT cosine_fast(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |       l2_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS d,
          |       normalize_text('  A  b!!C ') AS t,
          |       hyperplane_sig(array(1.0D, 2.0D), 8, 0) AS h,
          |       euclidean_sig(array(1.0D, 2.0D), 4, 0, 1.0D) AS e""".stripMargin)
        .collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
      assert(r.getString(2) == "a bc")
      // parity with the Column-API construction of the same expressions
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graftfns.VectorExpressions
      val viaColumn = s2.range(1).select(
        VectorExpressions.hyperplane_sig(array(lit(1.0), lit(2.0)), 8, 0).as("h"),
        VectorExpressions.euclidean_sig(array(lit(1.0), lit(2.0)), 4, 0, 1.0).as("e"))
        .collect()(0)
      assert(r.getLong(3) == viaColumn.getLong(0))
      assert(r.getLong(4) == viaColumn.getLong(1))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
