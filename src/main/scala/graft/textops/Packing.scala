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

  /**
   * Sliding word-window chunking — the context-window splitter of RAG
   * indexing and long-document pretraining prep: overlapping windows of
   * `chunkTokens` whitespace tokens starting every `strideTokens`
   * (`strideTokens == chunkTokens` = disjoint chunks; smaller = overlap).
   *
   * Window rule (the tokenizer `return_overflowing_tokens` convention):
   * window k starts at k·stride; a document of n tokens yields
   * `1 + max(0, ceil((n - chunk) / stride))` chunks, so the final window
   * always reaches the last token and no window starts past it. Empty
   * documents yield no chunks. Emits `(…, chunk_idx, n_tokens,
   * chunk_text)`; `n_tokens < chunkTokens` only on a short final window.
   *
   * 100 TB shape: a pure per-row projection + Generate (explode) — zero
   * shuffles, embarrassingly parallel, repartition/retry-invariant by
   * construction. The output-size multiplier is chunk/stride; callers
   * control amplification through the stride.
   */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens $chunkTokens")
    require(strideTokens >= 1, s"strideTokens $strideTokens")
    val ws = filter(split(col(textCol), " +"), w => length(w) > 0)
    val n = size(ws)
    val nChunks = when(n === 0, lit(0)).otherwise(
      lit(1) + greatest(lit(0),
        ceil((n - lit(chunkTokens)).cast("double") / lit(strideTokens.toDouble))
          .cast("int")))
    df.select(col(idCol), ws.as("_ws"), n.as("_n"), nChunks.as("_m"))
      .filter(col("_m") > 0)
      .select(col(idCol), col("_ws"), col("_n"),
        explode(sequence(lit(0), col("_m") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkTokens), col("_n") - col("chunk_idx") * strideTokens)
          .as("n_tokens"),
        array_join(slice(col("_ws"),
          col("chunk_idx") * strideTokens + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /**
   * Content-defined chunking — the storage-level dedup splitter (LBFS,
   * Muthitacharoen et al. SOSP 2001; gear hash per FastCDC, Xia et al.
   * ATC 2016): chunk boundaries are placed where a rolling hash of the
   * CONTENT hits a mask, so an insertion or deletion shifts only the
   * chunks within ~64 bytes of the edit and every chunk after it keeps
   * its identity — exactly what fixed-size chunking loses, and the
   * property chunk-level dedup across document versions depends on.
   * Output: (id, chunk_idx, start, len, chunk_hash) with byte-offset
   * `start`, expected `len` ≈ avg in [min, max] (final chunk may run
   * short), and `chunk_hash` = xxhash64 of the chunk text for
   * cross-corpus chunk dedup (groupBy chunk_hash).
   *
   * Deterministic: boundaries come from the native codegen'd
   * [[org.apache.spark.sql.graftfns.TextExpressions.CdcBounds]]
   * expression over a fixed splitmix64-seeded gear table — a pure
   * projection + one Generate, zero shuffle, repartition/retry/
   * engine-invariant. Like BPE training, the rolling-hash recurrence is
   * not SQL-expressible, so this family is TEST-PINNED against an
   * independent single-threaded reference instead of a DuckDB oracle.
   * Note: offsets are byte offsets; the chunk_text slice assumes
   * 1-byte-per-char content (ASCII) — binary payloads should consume
   * (start, len) directly.
   */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                minBytes: Int = 64, avgBytes: Int = 256,
                maxBytes: Int = 1024): DataFrame = {
    val b = org.apache.spark.sql.graftfns.TextExpressions
      .cdc_bounds(col(textCol), minBytes, avgBytes, maxBytes)
    df.select(col(idCol), col(textCol).as("_t"), b.as("_b"))
      .filter(size(col("_b")) > 0)
      .select(col(idCol), col("_t"), col("_b"),
        posexplode(col("_b")).as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start"),
        (when(col("chunk_idx") + 2 <= size(col("_b")),
          element_at(col("_b"), col("chunk_idx") + 2))
          .otherwise(length(col("_t"))) - col("start")).as("len"),
        col("_t"))
      .select(col(idCol), col("chunk_idx"), col("start"), col("len"),
        xxhash64(expr("substring(_t, start + 1, len)")).as("chunk_hash"))
  }
}
