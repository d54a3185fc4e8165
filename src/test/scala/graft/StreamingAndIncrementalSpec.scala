package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.pipeline.{Incremental, KGPipeline}
import graft.streaming.StreamingIngest

class StreamingAndIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("streaming extraction: AvailableNow over parquet == batch extraction") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val tr = TranscriptGen.transcripts(spark, 100)
    tr.write.mode("overwrite").parquet(in)
    val q = StreamingIngest.startExtraction(spark, in, sink, ckpt)
    q.awaitTermination()
    val streamed = spark.read.parquet(sink)
    val batch = graft.extract.Extraction.triplesRaw(tr)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // resume: restarting with the same checkpoint must NOT duplicate rows
    val q2 = StreamingIngest.startExtraction(spark, in, sink, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(sink).count() == batch.count(), "exactly-once")
    // new file arrives -> only the delta is appended
    TranscriptGen.transcripts(spark, 120).filter(col("conv_id") >= "conv_00000100")
      .write.mode("append").parquet(in)
    val q3 = StreamingIngest.startExtraction(spark, in, sink, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(sink).count() > batch.count())
  }

  test("windowed turn-rate aggregation runs with watermark") {
    val base = Files.createTempDirectory("graft_stream2").toString
    val in = s"$base/in"
    TranscriptGen.transcripts(spark, 50).write.mode("overwrite").parquet(in)
    val q = StreamingIngest.turnRates(spark, in).writeStream
      .format("memory").queryName("rates")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append-mode windows only emit once the watermark passes; with a single
    // AvailableNow batch the aggregation must at least run cleanly
    assert(spark.table("rates").columns.toSeq ==
      Seq("window_start", "role", "n_turns"))
  }

  test("streaming dedup: bounded-state dropDuplicatesWithinWatermark == batch exact dedup") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    val in = s"$base/in"
    val tr = TranscriptGen.transcripts(spark, 80)
    // duplicate every turn under a shifted conv_id: same text, same ts
    tr.unionByName(tr.withColumn("conv_id", concat(lit("dup_"), col("conv_id"))))
      .write.mode("overwrite").parquet(in)
    val q = StreamingIngest.dedupStream(spark, in).writeStream
      .format("memory").queryName("sdedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sdedup").count()
    val expected = tr.select(sha2(lower(trim(col("text"))), 256)).distinct().count()
    assert(got == expected,
      s"streamed dedup kept $got rows, batch-distinct digests = $expected")
  }

  test("mapGroupsWithState conversation accumulator matches batch per-conv stats") {
    val base = Files.createTempDirectory("graft_state").toString
    val in = s"$base/in"
    val tr = TranscriptGen.transcripts(spark, 60).cache()
    tr.write.mode("overwrite").parquet(in)
    val q = StreamingIngest.conversationStates(spark, in).writeStream
      .format("memory").queryName("convstates")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode + possibly several micro-batches: keep the LAST update per
    // conversation (highest n_turns — the accumulator is monotone)
    val got = spark.table("convstates")
      .groupBy("conv_id")
      .agg(max(col("n_turns")).as("n_turns"), max(col("max_turn_idx")).as("max_turn_idx"))
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = tr.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), max(col("turn_idx")).as("mx"))
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected, "stateful accumulator equals batch groupBy")
  }

  test("conversationStates survives groups whose events all have null ts") {
    // regression (round-3 ADVICE): with last == 0 the eviction timeout could
    // land below the current watermark, which makes Spark throw
    // IllegalArgumentException and fail the whole query — the timeout is now
    // clamped to max(last, watermark) + gap
    val base = Files.createTempDirectory("graft_nullts").toString
    val in = s"$base/in"
    import org.apache.spark.sql.types._
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("cA", 0, "user", "hi", null, null),
        org.apache.spark.sql.Row("cA", 1, "assistant", "yo", null, null),
        org.apache.spark.sql.Row("cB", 0, "user", "hey", null,
          java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))),
      StreamingIngest.transcriptSchema)
    rows.write.mode("overwrite").parquet(in)
    val q = StreamingIngest.conversationStates(spark, in).writeStream
      .format("memory").queryName("convstates_nullts")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination() // would rethrow the state-store IllegalArgumentException
    val got = spark.table("convstates_nullts")
      .groupBy("conv_id").agg(max(col("n_turns")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("cA") == 2L && got("cB") == 1L)
  }

  test("streaming anaphora resolution == batch; focus carries across micro-batch boundaries") {
    val base = Files.createTempDirectory("graft_coref").toString
    val in = s"$base/in"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    def tdf(rows: Seq[(String, Int, String)]) =
      rows.map { case (c, i, t) => (c, i, "user", t, null: String) }
        .toDF("conv_id", "turn_idx", "role", "text", "tool")
        .withColumn("ts", lit(null).cast("timestamp"))
    // file 1: antecedents; file 2: pronouns that must resolve against
    // state established by file 1 (a window over one batch cannot do this)
    val f1 = Seq(
      ("c1", 0, "user 1 works at org 2."),
      ("c1", 1, "He lives in city 3."),
      ("c2", 0, "She works at org 9."), // unresolvable forever
      ("c2", 1, "org 4 is based in city 1."))
    val f2 = Seq(
      ("c1", 2, "They works at org 7."), // -> user 1 via file-1 state
      ("c2", 2, "It reports to user 5."), // -> org 4 via file-1 state
      ("c2", 3, "user 6 lives in city 2."))
    def run(): Unit = {
      val q = StreamingIngest.resolvedTriplesStream(spark, in).writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    tdf(f1).write.mode("append").parquet(in); run()
    tdf(f2).write.mode("append").parquet(in); run()
    val streamed = spark.read.parquet(sink)
      .as[(String, Int, String, String, String, String, String, Int)]
      .collect().toSet
    val batch = graft.extract.Discourse.resolveAnaphora(tdf(f1 ++ f2))
      .as[(String, Int, String, String, String, String, String, Int)]
      .collect().toSet
    assert(streamed == batch && streamed.exists(_._8 == 1),
      s"streamed=$streamed\nbatch=$batch")
    // the cross-batch resolutions specifically
    assert(streamed.contains(("c1", 2, "user 1", "person", "works_at", "org 7", "org", 1)))
    assert(streamed.contains(("c2", 2, "org 4", "org", "reports_to", "user 5", "person", 1)))
  }

  test("streaming foreachBatch merge == batch mergeIncrement state, resume-safe") {
    val base = Files.createTempDirectory("graft_smerge").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"
    val streamState = s"$base/stream_state"; val batchState = s"$base/batch_state"
    val all = TranscriptGen.transcripts(spark, 120).cache()
    val inc1 = all.filter(col("conv_id") < "conv_00000070")
    val inc2 = all.filter(col("conv_id") >= "conv_00000050") // overlaps inc1
    inc1.write.mode("overwrite").parquet(in)
    // streaming path: foreachBatch -> mergeIncrement into stream_state
    StreamingIngest.startMergeIngest(spark, in, streamState, ckpt).awaitTermination()
    // batch path over the SAME increments
    Incremental.ingest(spark, batchState, inc1)
    val s1 = graft.checkpoint.Checkpoint.readMerged(spark, streamState, "inc_triples")
    val b1 = graft.checkpoint.Checkpoint.readMerged(spark, batchState, "inc_triples")
    assert(s1.count() == b1.count())
    assert(s1.exceptAll(b1).isEmpty && b1.exceptAll(s1).isEmpty,
      "streaming-ingested state must equal batch mergeIncrement state")
    // the second (overlapping) increment arrives as a new file; only the
    // delta files are streamed, and the merge dedups the overlap
    inc2.write.mode("append").parquet(in)
    StreamingIngest.startMergeIngest(spark, in, streamState, ckpt).awaitTermination()
    Incremental.ingest(spark, batchState, inc2)
    val s2 = graft.checkpoint.Checkpoint.readMerged(spark, streamState, "inc_triples")
    val b2 = graft.checkpoint.Checkpoint.readMerged(spark, batchState, "inc_triples")
    assert(s2.count() == b2.count())
    assert(s2.exceptAll(b2).isEmpty && b2.exceptAll(s2).isEmpty)
    // restart with nothing new: state unchanged (exactly-once composition)
    StreamingIngest.startMergeIngest(spark, in, streamState, ckpt).awaitTermination()
    assert(graft.checkpoint.Checkpoint.readMerged(spark, streamState, "inc_triples")
      .count() == s2.count(), "replayed/empty stream restart is a no-op")
    // and the downstream pipeline runs identically over streaming state
    val g1 = Incremental.finalizeGraph(spark, streamState)
    val g2 = Incremental.finalizeGraph(spark, batchState)
    val pr = graft.eval.Metrics.setMatchPR(
      g1.tripleSet, g2.tripleSet, Seq("subj", "pred", "obj"))
    assert(pr.f1 == 1.0, s"P=${pr.precision} R=${pr.recall}")
  }

  test("incremental ingest: overlapping increments merge idempotently and " +
    "finalize == single batch run") {
    val stateDir = Files.createTempDirectory("graft_inc").toString
    val all = TranscriptGen.transcripts(spark, 150).cache()
    val inc1 = all.filter(col("conv_id") < "conv_00000080")
    val inc2 = all.filter(col("conv_id") >= "conv_00000060") // overlaps inc1
    Incremental.ingest(spark, stateDir, inc1)
    Incremental.ingest(spark, stateDir, inc2)
    // replay an increment entirely: state must not change
    val before = Incremental.ingest(spark, stateDir, inc2).count()
    val after = Incremental.ingest(spark, stateDir, inc2).count()
    assert(before == after, "replayed increment is a no-op")

    val incResult = Incremental.finalizeGraph(spark, stateDir)
    val batchResult = KGPipeline.run(spark, all)
    val pr = graft.eval.Metrics.setMatchPR(
      incResult.tripleSet, batchResult.tripleSet, Seq("subj", "pred", "obj"))
    assert(pr.f1 == 1.0, s"incremental == batch, got P=${pr.precision} R=${pr.recall}")
  }
}
