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
}
