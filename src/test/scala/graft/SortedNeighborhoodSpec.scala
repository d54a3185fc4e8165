package graft

import org.apache.spark.sql.functions._
import graft.link.SortedNeighborhood

/** Sorted-neighborhood blocking vs a driver-side brute-force replay of
  * the definition (sort within bucket, pair with the next w-1 rows). */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], prefix: Int, bucket: Int,
                    w: Int): Set[(Long, Long)] = {
    rows.map { case (id, t) => (id, t.toLowerCase.take(prefix)) }
      .groupBy(_._2.take(bucket))
      .values.flatMap { grp =>
        val sorted = grp.sortBy { case (id, k) => (k, id) }.map(_._1)
        for {
          i <- sorted.indices
          j <- (i + 1) until math.min(i + w, sorted.size)
        } yield (math.min(sorted(i), sorted(j)), math.max(sorted(i), sorted(j)))
      }.toSet
  }

  private def run(rows: Seq[(Long, String)], prefix: Int, bucket: Int,
                  w: Int): Set[(Long, Long)] = {
    val key = substring(lower(col("text")), 1, prefix)
    SortedNeighborhood.pairs(rows.toDF("id", "text"), "id",
        sortKey = key, bucketKey = substring(key, 1, bucket), windowSize = w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("pairs equal the brute-force definition, typo'd variants included") {
    val rows = Seq(
      1L -> "alpha corporation annual report",
      2L -> "alpha corporation annual reprot", // late typo: same prefix
      3L -> "alpha corpration annual report",  // early typo: same 2-char bucket
      4L -> "beta industries quarterly",
      5L -> "beta industries quarterly",       // exact dup
      6L -> "zeta isolated")
    val got = run(rows, prefix = 24, bucket = 2, w = 3)
    assert(got == brute(rows, 24, 2, 3))
    // the near-identical alpha variants and the exact beta dup must pair
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)), got)
  }

  test("randomized inputs match brute force across window sizes") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("acme", "acne", "apex", "brio", "brie", "ceto")
    for (w <- Seq(2, 4)) {
      val rows = (1L to 40L).map(i =>
        i -> s"${vocab(rnd.nextInt(vocab.size))} ${vocab(rnd.nextInt(vocab.size))} $i")
      assert(run(rows, 8, 1, w) == brute(rows, 8, 1, w), s"w=$w")
    }
  }

  test("per-record pair budget is structural: at most w-1 pairs per id") {
    val rows = (1L to 30L).map(i => i -> "identical text everywhere")
    val got = run(rows, 24, 2, 4)
    val perId = got.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size)
    // a record appears in at most (w-1) pairs as the left member and
    // (w-1) as the right member
    assert(perId.values.max <= 6, perId.toMap)
    assert(got.size == 30 * 3 - (3 + 2 + 1), got.size) // (n-i) capped at w-1
  }
}
