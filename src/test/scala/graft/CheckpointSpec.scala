package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.checkpoint.Checkpoint
import graft.fixtures.TranscriptGen
import graft.pipeline.KGPipeline

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_ckpt").toString

  test("stage: computed once, resumed from parquet with metrics sidecar") {
    val dir = tmpDir()
    var computions = 0
    def compute() = { computions += 1; spark.range(100).withColumn("x", col("id") * 2) }
    val first = Checkpoint.stage(spark, dir, "s1")(compute().toDF())
    assert(first.count() == 100 && computions == 1)
    val second = Checkpoint.stage(spark, dir, "s1")(compute().toDF())
    assert(second.count() == 100 && computions == 1, "resume must not recompute")
    assert(Checkpoint.recordedRows(dir, "s1").contains(100L))
  }

  test("mergeIncrement: idempotent value-dedup merge (E1 semantics)") {
    val dir = tmpDir()
    val inc1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val inc2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc1, Seq("k", "v")).count() == 2)
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc2, Seq("k", "v")).count() == 3)
    // replaying an increment is a no-op
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc2, Seq("k", "v")).count() == 3)
    assert(Checkpoint.recordedRows(dir, "m").contains(3L))
  }

  test("kill-and-resume: pipeline restarted mid-way reuses completed stages") {
    val dir = tmpDir()
    val tr = TranscriptGen.transcripts(spark, 50)
    val cfg = KGPipeline.Config(checkpointDir = Some(dir))
    val r1 = KGPipeline.run(spark, tr, cfg)
    // materialize before deleting checkpoint files (r1 reads lazily)
    val triples1 = r1.tripleSet.collect().map(_.toSeq).toSet
    val n1 = triples1.size
    // simulate a crash after 'mentions': delete everything downstream
    Seq("pairs", "entities", "canonical_triples", "nodes", "edges",
      "node_schema", "edge_schema", "triple_set").foreach { s =>
      val p = java.nio.file.Paths.get(Checkpoint.stagePath(dir, s))
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
    }
    assert(Checkpoint.isComplete(dir, "mentions"))
    assert(!Checkpoint.isComplete(dir, "pairs"))
    val r2 = KGPipeline.run(spark, tr, cfg)
    val triples2 = r2.tripleSet.collect().map(_.toSeq).toSet
    assert(triples2 == triples1, "resumed output identical")
    assert(triples2.size == n1)
  }
}
