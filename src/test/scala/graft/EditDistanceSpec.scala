package graft

import graft.textops.EditDistance

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], maxDist: Int,
      maxBlock: Int = Int.MaxValue): Seq[(Long, Long, Int)] =
    EditDistance.similarPairs(rows.toDF("id", "s"), "id", "s", maxDist, maxBlock)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq

  // single-threaded reference: full-DP Levenshtein over all pairs
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def ref(rows: Seq[(Long, String)], maxDist: Int): Seq[(Long, Long, Int)] =
    (for {
      i <- rows.indices; j <- rows.indices
      if rows(i)._1 < rows(j)._1
      d = lev(rows(i)._2, rows(j)._2) if d <= maxDist
    } yield (rows(i)._1, rows(j)._1, d)).sortBy(r => (r._1, r._2))

  test("hand-computed: substitution, indel, exact dup, above-threshold excluded") {
    val rows = Seq(1L -> "jon smith", 2L -> "john smith", 3L -> "jon smith",
      4L -> "jane smythe", 5L -> "jon smit")
    val got = run(rows, maxDist = 1)
    assert(got == Seq((1L, 2L, 1), (1L, 3L, 0), (1L, 5L, 1), (2L, 3L, 1), (3L, 5L, 1)))
    assert(got == ref(rows, 1))
  }

  test("cross-bucket pairs: lengths differing by exactly maxDist are found") {
    // W = maxDist = 2: "abcd" (len 4, blk 2) vs "abcdef" (len 6, blk 3)
    val rows = Seq(1L -> "abcd", 2L -> "abcdef", 3L -> "zzzzzzzzzz")
    assert(run(rows, maxDist = 2) == Seq((1L, 2L, 2)))
  }

  test("maxDist = 0 degenerates to exact-duplicate pairing") {
    val rows = Seq(1L -> "alpha", 2L -> "alpha", 3L -> "beta", 4L -> "alpha")
    assert(run(rows, 0) == Seq((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)))
  }

  test("matches brute-force reference on a seeded mutated corpus") {
    val rnd = new scala.util.Random(41)
    val bases = Seq("customer record", "supplier entry", "order line item")
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    def mutate(s: String): String = (0 until rnd.nextInt(4)).foldLeft(s) { (t, _) =>
      rnd.nextInt(3) match {
        case 0 if t.nonEmpty => // substitute
          val i = rnd.nextInt(t.length); t.updated(i, alpha(rnd.nextInt(alpha.length)))
        case 1 => // insert
          val i = rnd.nextInt(t.length + 1)
          t.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + t.substring(i)
        case _ if t.length > 1 => // delete
          val i = rnd.nextInt(t.length); t.substring(0, i) + t.substring(i + 1)
        case _ => t
      }
    }
    val rows = (1L to 120L).map(i => i -> mutate(bases(rnd.nextInt(bases.size))))
    for (k <- Seq(1, 2, 3)) assert(run(rows, k) == ref(rows, k), s"maxDist=$k")
  }

  test("maxBlock cap drops pairs from oversized key buckets only") {
    // 20 exact copies (every deletion-variant key bucket has occupancy 20)
    // + an isolated cold pair sharing only a 2-member variant bucket
    val hot = (1L to 20L).map(i => i -> "same name")
    val cold = Seq(100L -> "xy", 101L -> "xz")
    val uncapped = run(hot ++ cold, 1)
    assert(uncapped.contains((100L, 101L, 1)))
    assert(uncapped.contains((1L, 2L, 0)))
    val capped = run(hot ++ cold, 1, maxBlock = 4)
    assert(capped == Seq((100L, 101L, 1)))
  }

  test("uniform-width corpus (the dd10 shape): deletion keys stay selective") {
    // fixed-width names, every third truncated by one char — all strings
    // land in 1-2 LENGTH buckets (the degenerate case that collapsed the
    // length-blocked first cut to all-pairs), but deletion-variant keys
    // block on content; result must still equal brute force
    val rows = (1L to 150L).map { i =>
      val full = f"Customer#$i%09d"
      i -> (if (i % 3 == 0) full.substring(0, full.length - 1) else full)
    }
    assert(run(rows, 1) == ref(rows, 1))
  }

  test("repartition-invariant; null strings dropped") {
    val rnd = new scala.util.Random(43)
    val rows = (1L to 80L).map(i => i -> s"rec ${rnd.nextInt(40)}")
    val a = run(rows, 2)
    val b = EditDistance.similarPairs(
      rows.toDF("id", "s").repartition(13), "id", "s", 2)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b && a == ref(rows, 2))
    val withNull = rows.toDF("id", "s")
      .unionByName(Seq((999L, null.asInstanceOf[String])).toDF("id", "s"))
    val c = EditDistance.similarPairs(withNull, "id", "s", 2)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(c == a)
  }
}
