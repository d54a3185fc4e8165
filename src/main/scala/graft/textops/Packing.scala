package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sequence packing — the "fill each training sequence to the
 * token budget" step of an LLM data pipeline (beyond the reference's own
 * surface, like the rest of graft.textops). Documents are assigned to
 * fixed-token-budget packs by a quota rule over a deterministic order, so
 * the packing is a PROPERTY OF THE DATA (same lineage argument as
 * [[Sampling.hashSample]]): identical across runs, partitionings, retries,
 * and engines — an independent DuckDB oracle reproduces every pack id.
 *
 * Construction, per shard:
 *   1. order docs by the md5 decision key of (seed, id) — the portable
 *      seeded shuffle [[Sampling]] uses;
 *   2. running token total `cum` over that order;
 *   3. `pack_id = floor((cum - tokens) / budget)` — quota packing on the
 *      EXCLUSIVE prefix sum, so a doc starts a new pack exactly when the
 *      budget boundary falls at or before its first token.
 *
 * Every pack except a shard's last holds >= budget - (min doc) and
 * overflows the budget by at most one document (the standard greedy-pack
 * bound); oversized single documents get a pack of their own rather than
 * being dropped (truncation is the caller's policy, applied downstream).
 *
 * 100 TB shape: `shardCol` bounds the window — packing runs independently
 * and in parallel per shard (one Exchange on the shard key; within a
 * shard one sort). Shards are the unit a trainer consumes (a worker
 * streams whole shards), so per-shard packing is the semantics you want,
 * not a compromise. Pick shard cardinality >> executor count; the window
 * itself never sees more than one shard.
 */
object Packing {

  /**
   * Assign each row a `(shard, pack_id, pack_pos)` under `budgetTokens`.
   * `tokenCol` must be a non-negative numeric column (e.g.
   * [[TextAnalysis.tokenCountWs]] of the text). Keeps all input columns.
   */
  def packDocuments(df: DataFrame, idCol: String, tokenCol: Column,
                    budgetTokens: Long, shardCol: Column,
                    seed: String = "graft"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val wCum = Window.partitionBy(col("shard")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df
      .withColumn("shard", shardCol.cast("long"))
      .withColumn("_tok", tokenCol.cast("long"))
      .withColumn("_cum", sum(col("_tok")).over(wCum))
      .withColumn("pack_id",
        floor((col("_cum") - col("_tok")) / lit(budgetTokens.toDouble)))
    val wPos = Window.partitionBy(col("shard"), col("pack_id")).orderBy(key)
    withCum
      .withColumn("pack_pos", row_number().over(wPos))
      .drop("_tok", "_cum")
  }

  /** Per-pack totals — the audit view (docs per pack, token fill level). */
  def packStats(packed: DataFrame, tokenCol: Column): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCol.cast("long")).as("pack_tokens"))
}
