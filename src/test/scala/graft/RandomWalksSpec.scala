package graft

import graft.graph.RandomWalks

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side reference walker: same decision keys. */
  private def brute(edges: Seq[(String, String)], walksPerNode: Int,
                    length: Int, salt: String): Set[(String, Int, Int, String)] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val nodes = und.map(_._1).distinct
    (for {
      start <- nodes; w <- 0 until walksPerNode
    } yield {
      var node = start
      (start, w, 0, node) +: (1 to length).map { step =>
        node = adj(node).minBy(d => md5hex(s"$salt|$start|$w|$step|$node|$d"))
        (start, w, step, node)
      }
    }).flatten.toSet
  }

  test("walks on a small graph equal the reference walker; exact row count") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val got = RandomWalks.walks(edges.toDF("src", "dst"), 1.0,
      walksPerNode = 2, length = 3, salt = "w")
      .as[(String, Int, Int, String)].collect()
    assert(got.length == 4 * 2 * 4) // nodes x walks x (length+1)
    assert(got.toSet == brute(edges, 2, 3, "w"))
  }

  test("randomized graphs equal the reference walker; walks never die") {
    val rnd = new scala.util.Random(39)
    for (trial <- 1 to 3) {
      val nodes = (0 until 12).map(i => s"n$i")
      val edges = Seq.fill(40)((nodes(rnd.nextInt(12)), nodes(rnd.nextInt(12))))
        .filter(e => e._1 != e._2)
      val got = RandomWalks.walks(edges.toDF("src", "dst"), 1.0,
        walksPerNode = 2, length = 4, salt = s"w$trial")
        .as[(String, Int, Int, String)].collect()
      assert(got.toSet == brute(edges, 2, 4, s"w$trial"), s"trial $trial")
      // every walk reaches full length
      got.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (0 to 4))
      }
    }
  }

  test("skipGrams: windowed ordered pairs with counts, never across walks") {
    // two walks: (a b c d) and (x y x)
    val walks = Seq(
      ("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"), ("a", 0, 3, "d"),
      ("x", 0, 0, "x"), ("x", 0, 1, "y"), ("x", 0, 2, "x"))
      .toDF("start", "walk_idx", "step", "node")
    val got = RandomWalks.skipGrams(walks, window = 2)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "a", 1L), ("c", "b", 1L), ("c", "d", 1L),
      ("d", "b", 1L), ("d", "c", 1L),
      // x-walk: x@0 sees y@1, x@2; y@1 sees both x's; x@2 sees y@1, x@0
      ("x", "y", 2L), ("y", "x", 2L), ("x", "x", 2L))
    assert(got == expected)
  }

  test("repartition-invariant and walk_idx-decorrelated") {
    val edges = (0 until 20).map(i => (s"n$i", s"n${(i + 3) % 20}"))
    val a = RandomWalks.walks(edges.toDF("src", "dst"), 1.0, 2, 3, "s")
      .as[(String, Int, Int, String)].collect().toSet
    val b = RandomWalks.walks(edges.toDF("src", "dst").repartition(7), 1.0, 2, 3, "s")
      .as[(String, Int, Int, String)].collect().toSet
    assert(a == b)
    // at least one start's two walks diverge (decision keys decorrelate)
    val byWalk = a.groupBy(r => (r._1, r._2)).view
      .mapValues(_.toSeq.sortBy(_._3).map(_._4)).toMap
    assert(byWalk.keys.map(_._1).exists(s => byWalk((s, 0)) != byWalk((s, 1))))
  }
}
