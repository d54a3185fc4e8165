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
    assert(Checkpoint.recordedRows(spark, dir, "s1").contains(100L))
  }

  test("stage works against an explicit Hadoop file: URI (FileSystem API, not java.nio)") {
    val dir = "file:" + tmpDir()
    val df = Checkpoint.stage(spark, dir, "s_fs")(spark.range(7).toDF())
    assert(df.count() == 7)
    assert(Checkpoint.isComplete(spark, dir, "s_fs"))
    assert(Checkpoint.recordedRows(spark, dir, "s_fs").contains(7L))
  }

  test("mergeIncrement: idempotent value-dedup merge (E1 semantics)") {
    val dir = tmpDir()
    val inc1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val inc2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc1, Seq("k", "v")).count() == 2)
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc2, Seq("k", "v")).count() == 3)
    // replaying an increment is a no-op
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc2, Seq("k", "v")).count() == 3)
    assert(Checkpoint.recordedRows(spark, dir, "m").contains(3L))
    assert(Checkpoint.readMerged(spark, dir, "m").count() == 3)
  }

  test("mergeIncrement: crash windows never lose committed state") {
    val dir = tmpDir()
    val root = new org.apache.hadoop.fs.Path(Checkpoint.stagePath(dir, "m"))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    Checkpoint.mergeIncrement(spark, dir, "m", Seq((1L, "a")).toDF("k", "v"), Seq("k", "v"))
    Checkpoint.mergeIncrement(spark, dir, "m", Seq((2L, "b")).toDF("k", "v"), Seq("k", "v"))

    // crash DURING the next version's data write: a half-written v_00003
    // (no _SUCCESS) must be ignored and the committed state still readable
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v_00003"))
    assert(Checkpoint.readMerged(spark, dir, "m").count() == 2)

    // crash BETWEEN pointer delete and rename: _current missing — recovery
    // must pick the highest COMMITTED version, not the half-written one
    fs.delete(new org.apache.hadoop.fs.Path(root, "_current"), false)
    assert(Checkpoint.readMerged(spark, dir, "m").count() == 2)
    fs.delete(new org.apache.hadoop.fs.Path(root, "v_00003"), true)

    // and the next merge after recovery proceeds normally
    val merged = Checkpoint.mergeIncrement(
      spark, dir, "m", Seq((3L, "c")).toDF("k", "v"), Seq("k", "v"))
    assert(merged.count() == 3)
  }

  test("mergeIncrement: an increment touching 1 of 16 buckets rewrites ONLY that bucket") {
    val dir = tmpDir()
    val root = new org.apache.hadoop.fs.Path(Checkpoint.stagePath(dir, "m"))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def bucketDirs(version: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(root, version)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    // seed: 400 keys spread across all 16 buckets
    val seed = (0 until 400).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Checkpoint.mergeIncrement(spark, dir, "m", seed, Seq("k", "v"))
    val seeded = bucketDirs("v_00001")
    assert(seeded.size == 16, s"seed spans all 16 buckets, got ${seeded.size}")

    // single-key increment: the new version must contain exactly ONE bucket
    val inc = Seq((9999L, "new")).toDF("k", "v")
    val merged = Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v"))
    assert(merged.count() == 401)
    val rewritten = bucketDirs("v_00002")
    assert(rewritten.size == 1, s"only the touched bucket is rewritten, got $rewritten")
    // untouched buckets still live in (and are read from) v_00001
    val paths = Checkpoint.committedBucketPaths(spark, dir, "m")
    assert(paths.count(_.contains("v_00001")) == 15)
    assert(paths.count(_.contains("v_00002")) == 1)
    // per-file lineage sidecar spans both versions and records the full state
    val metrics = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"${Checkpoint.stagePath(dir, "m")}/_metrics.json"))
    assert(metrics.contains("v_00001/") && metrics.contains("v_00002/"))
    assert(Checkpoint.recordedRows(spark, dir, "m").contains(401L))
    // replay of the same increment is a no-op on row count
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v")).count() == 401)
  }

  test("mergeIncrement: merge into an oversized bucket splits it, rewriting ONLY that bucket") {
    val dir = tmpDir()
    val root = new org.apache.hadoop.fs.Path(Checkpoint.stagePath(dir, "m"))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def bucketDirs(version: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(root, version)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    // seed 2000 keys across 4 base buckets, no splitting (huge threshold)
    val seed = (0 until 2000).map(i => (i.toLong, s"payload_$i")).toDF("k", "v")
    Checkpoint.mergeIncrement(spark, dir, "m", seed, Seq("k", "v"),
      numBuckets = 4, maxBucketBytes = Long.MaxValue)
    assert(bucketDirs("v_00001").size == 4)

    // single-key merge with a tiny threshold: the touched bucket (~500 rows)
    // is over budget -> it must SPLIT into children at the doubled modulus,
    // and v2 must contain ONLY that bucket's children
    val inc = Seq((999999L, "new")).toDF("k", "v")
    val merged = Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v"),
      maxBucketBytes = 4096)
    assert(merged.count() == 2001)
    val v2 = bucketDirs("v_00002")
    assert(v2.nonEmpty && v2.forall(!_.startsWith("_bucket=4x")),
      s"touched bucket must be rewritten as children of a doubled modulus, got $v2")
    val childModuli = v2.map(_.stripPrefix("_bucket=").takeWhile(_ != 'x').toInt)
    assert(childModuli.forall(m => m >= 8 && m % 4 == 0), s"moduli double from base 4: $v2")
    // the three untouched base buckets still live in (and are read from) v1
    val paths = Checkpoint.committedBucketPaths(spark, dir, "m")
    assert(paths.count(_.contains("v_00001")) == 3, s"untouched buckets stay: $paths")
    assert(Checkpoint.readMerged(spark, dir, "m").count() == 2001)
    // replay of the same increment is a no-op (routes through the split cover)
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v"),
      maxBucketBytes = Long.MaxValue).count() == 2001)
    // a later merge keyed into the split range lands in a CHILD bucket —
    // the split parent never resurrects at the base modulus
    Checkpoint.mergeIncrement(spark, dir, "m", Seq((1000003L, "z")).toDF("k", "v"),
      Seq("k", "v"), maxBucketBytes = Long.MaxValue)
    val after = Checkpoint.committedBucketPaths(spark, dir, "m")
    assert(!after.exists(_.matches(".*_bucket=4x\\d+$")) ||
      after.count(_.matches(".*_bucket=4x\\d+$")) <= 3,
      s"split parent must not reappear: $after")
    assert(Checkpoint.readMerged(spark, dir, "m").count() == 2002)
  }

  test("mergeIncrement: a still-oversized child splits again (chained extendible splits)") {
    val dir = tmpDir()
    val root = new org.apache.hadoop.fs.Path(Checkpoint.stagePath(dir, "m"))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // concentrate the seed in the SAME base bucket the increment routes to,
    // so the split chain is deterministic: compute each candidate's bucket
    // with the merge's own routing hash (xxhash64 over the key cols, mod 4)
    val inc = Seq((999999L, "new")).toDF("k", "v")
    val target = inc.select(pmod(xxhash64(col("k"), col("v")), lit(4L))).head().getLong(0)
    val seed = (0 until 40000).map(i => (i.toLong, s"payload_$i")).toDF("k", "v")
      .filter(pmod(xxhash64(col("k"), col("v")), lit(4L)) === target)
      .orderBy("k").limit(4000)
    Checkpoint.mergeIncrement(spark, dir, "m", seed, Seq("k", "v"),
      numBuckets = 4, maxBucketBytes = Long.MaxValue)
    val seeded = Checkpoint.readMerged(spark, dir, "m").count()
    val parentDir = new org.apache.hadoop.fs.Path(root, s"v_00001/_bucket=4x$target")
    assert(fs.exists(parentDir), s"seed must land in bucket 4x$target")
    val bytes = fs.getContentSummary(parentDir).getLength
    // threshold S/3: parent (S) splits, each half (~S/2) still exceeds it,
    // each quarter (~S/4) does not -> exactly two split levels, 4 -> 8 -> 16
    Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v"),
      maxBucketBytes = bytes / 3)
    val paths = Checkpoint.committedBucketPaths(spark, dir, "m")
    val moduli = paths.map(_.split("_bucket=").last.takeWhile(_ != 'x').toInt)
    assert(moduli.max >= 16, s"expected a chained split past one doubling: $paths")
    assert(Checkpoint.readMerged(spark, dir, "m").count() == seeded + 1)
    // replay through the two-level split cover stays a no-op
    assert(Checkpoint.mergeIncrement(spark, dir, "m", inc, Seq("k", "v"),
      maxBucketBytes = Long.MaxValue).count() == seeded + 1)
  }

  test("extendible routing property: bucketKeyExpr == brute-force modulus chain over 100 random split sets") {
    // the chained-split merge test covers ONE topology; the addressing
    // itself gets the union-find treatment CC got: randomized split covers,
    // an independent brute-force oracle, and the liveness + refinement
    // invariants that make replay through any cover a no-op
    val base = 16
    val rnd = new scala.util.Random(562L)
    def randomCover(): Set[String] = {
      var live = (0 until base).map(b => (base, b)).toSet
      var splits = Set.empty[String]
      for (_ <- 0 until rnd.nextInt(13)) {
        val (m, b) = live.toSeq.sorted.apply(rnd.nextInt(live.size))
        splits += s"${m}x$b"
        live = live - ((m, b)) + ((2 * m, b)) + ((2 * m, b + m))
      }
      splits
    }
    val covers = Vector.fill(100)(randomCover())
    // independent oracle: walk the modulus chain directly from the hash
    def route(h: Long, splits: Set[String]): String = {
      var m = base
      var b = java.lang.Math.floorMod(h, m.toLong)
      while (splits.contains(s"${m}x$b")) { m *= 2; b = java.lang.Math.floorMod(h, m.toLong) }
      s"${m}x$b"
    }
    // oracle-level refinement invariant (what makes split replay a no-op):
    // adding one more split only re-routes rows OF the split bucket
    for (s <- covers.take(25); h <- -1000L to 1000L by 37L) {
      val before = route(h, s)
      assert(route(h, s + before) != before,
        "splitting the routed bucket must re-route its rows")
      val unrelated = s"${base * 32}x999999"
      assert(route(h, s + unrelated) == before, "unrelated split must not re-route")
    }
    // expr == oracle on every cover, evaluated in ONE Spark job per batch
    // of 20 covers (21 columns each: the hash + 20 routings)
    val keys = spark.range(0, 200).select(
      concat(lit("k"), col("id")).as("k1"), (col("id") % 7).cast("string").as("k2"))
    covers.grouped(20).zipWithIndex.foreach { case (batch, bi) =>
      val cols = col("k1") +: xxhash64(col("k1"), col("k2")).as("_h") +:
        batch.zipWithIndex.map { case (s, i) =>
          Checkpoint.bucketKeyExpr(Seq("k1", "k2"), base, s).as(s"r$i") }
      val rows = keys.select(cols: _*).collect()
      batch.zipWithIndex.foreach { case (s, i) =>
        rows.foreach { r =>
          val got = r.getString(2 + i)
          val want = route(r.getLong(1), s)
          assert(got == want, s"cover#${bi * 20 + i} splits=$s key=${r.getString(0)}: expr=$got oracle=$want")
          assert(!s.contains(got), s"routed into a SPLIT (dead) bucket $got")
        }
      }
    }
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
    assert(Checkpoint.isComplete(spark, dir, "mentions"))
    assert(!Checkpoint.isComplete(spark, dir, "pairs"))
    val r2 = KGPipeline.run(spark, tr, cfg)
    val triples2 = r2.tripleSet.collect().map(_.toSeq).toSet
    assert(triples2 == triples1, "resumed output identical")
    assert(triples2.size == n1)
  }
}
