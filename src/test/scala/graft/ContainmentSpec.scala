package graft

import graft.textops.Dedup

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], t: Double)
      : Seq[(Long, Long, Double)] =
    Dedup.containmentJoinExact(rows.toDF("id", "text"), "id", "text", t)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  // single-threaded reference over the same distinct word-3-gram shingles
  private def shingles(s: String): Set[String] = {
    val w = s.split(" ", -1)
    (0 to math.max(w.length - 3, 0)).map(i => w.slice(i, i + 3).mkString(" ")).toSet
  }

  private def ref(rows: Seq[(Long, String)], t: Double): Seq[(Long, Long, Double)] = {
    val sh = rows.map { case (id, s) => id -> shingles(s) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia != ib
      c = (sa intersect sb).size.toDouble / sa.size if c >= t
    } yield (ia, ib, c)).sortBy(r => (r._1, r._2))
  }

  private val words = "the quick brown fox jumps over a lazy dog near riverbank stones".split(" ")
  private def doc(rnd: scala.util.Random, len: Int): String =
    Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" ")

  test("planted quote-inclusion: containment 1.0 where Jaccard is blind") {
    val rnd = new scala.util.Random(67)
    val quote = doc(rnd, 12)
    val container = doc(rnd, 120) + " " + quote + " " + doc(rnd, 120)
    val other = doc(rnd, 60)
    val rows = Seq(1L -> quote, 2L -> container, 3L -> other)
    val got = run(rows, 0.9)
    // the quote is fully inside the container (every shingle of 1 in 2,
    // modulo boundary shingles: we planted with spaces, so all 10 shingles
    // of the quote appear verbatim in the container)
    assert(got.exists { case (a, b, c) => a == 1L && b == 2L && c == 1.0 })
    // the reverse direction is nowhere near the threshold
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L })
    assert(got == ref(rows, 0.9))
    // and Jaccard misses the pair entirely at any usable threshold
    val j = Dedup.jaccardJoinExact(rows.toDF("id", "text"), "id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!j.exists(r => Set(r._1, r._2) == Set(1L, 2L)))
  }

  test("exact duplicates contain each other in both directions") {
    val rnd = new scala.util.Random(71)
    val d = doc(rnd, 30)
    val got = run(Seq(1L -> d, 2L -> d, 3L -> doc(rnd, 30)), 0.99)
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L), (2L, 1L)))
    assert(got.forall(_._3 == 1.0))
  }

  test("matches brute-force reference on a seeded random corpus") {
    val rnd = new scala.util.Random(73)
    val base = (1L to 25L).map(i => i -> doc(rnd, 15 + rnd.nextInt(40)))
    // plant: prefixes of existing docs (high containment one way) + copies
    val planted = Seq(
      101L -> base(2)._2.split(" ").take(9).mkString(" "),
      102L -> base(5)._2,
      103L -> (base(7)._2 + " " + doc(rnd, 80)))
    val rows = base ++ planted
    for (t <- Seq(0.6, 0.9)) assert(run(rows, t) == ref(rows, t), s"t=$t")
  }

  test("repartition-invariant") {
    val rnd = new scala.util.Random(79)
    val rows = (1L to 30L).map(i => i -> doc(rnd, 10 + rnd.nextInt(30)))
    val a = run(rows, 0.7)
    val b = Dedup.containmentJoinExact(
      rows.toDF("id", "text").repartition(13), "id", "text", 0.7)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b && a == ref(rows, 0.7))
  }
}
