package graft

import graft.graph.EgoNets

class EgoNetsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference sampler: same decision keys, driver-side. */
  private def brute(edges: Seq[(String, String)], fanouts: Seq[Int],
                    salt: String): Set[(String, Int, String, String)] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val nodes = und.map(_._1).distinct
    var res = Set.empty[(String, Int, String, String)]
    for (seed <- nodes) {
      var frontier = Seq(seed)
      fanouts.zipWithIndex.foreach { case (f, i) =>
        val picked = frontier.distinct.flatMap { n =>
          adj.getOrElse(n, Seq.empty)
            .sortBy(d => md5hex(s"$salt|$seed|$n|$d")).take(f)
            .map(d => (seed, i + 1, n, d))
        }
        res ++= picked
        frontier = picked.map(_._4)
      }
    }
    res
  }

  test("2-hop sampling on a path graph equals the reference sampler") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val got = EgoNets.sample(edges.toDF("src", "dst"), 1.0, Seq(2, 1), "t")
      .as[(String, Int, String, String)].collect().toSet
    assert(got == brute(edges, Seq(2, 1), "t"))
    // sanity: hop-1 out of 'b' keeps both neighbors (degree 2 <= fanout 2)
    assert(got.count { case (s, h, src, _) => s == "b" && h == 1 && src == "b" } == 2)
  }

  test("randomized graphs equal the reference sampler; fanout caps bind") {
    val rnd = new scala.util.Random(38)
    for (trial <- 1 to 3) {
      val nodes = (0 until 15).map(i => s"n$i")
      val edges = Seq.fill(60)((nodes(rnd.nextInt(15)), nodes(rnd.nextInt(15))))
      val got = EgoNets.sample(edges.toDF("src", "dst"), 1.0, Seq(3, 2), s"t$trial")
        .as[(String, Int, String, String)].collect()
      assert(got.size == got.toSet.size, s"trial $trial: duplicate rows")
      assert(got.toSet == brute(edges, Seq(3, 2), s"t$trial"), s"trial $trial")
      // caps: never more than 3 hop-1 rows per (seed, src)
      got.filter(_._2 == 1).groupBy(r => (r._1, r._3)).foreach { case (_, rs) =>
        assert(rs.size <= 3)
      }
    }
  }

  test("seedFraction thins egos deterministically") {
    val edges = (0 until 30).map(i => (s"n$i", s"n${(i + 1) % 30}"))
    val all = EgoNets.sample(edges.toDF("src", "dst"), 1.0, Seq(2), "s")
      .select("seed").distinct().as[String].collect().toSet
    val some = EgoNets.sample(edges.toDF("src", "dst"), 0.4, Seq(2), "s")
      .select("seed").distinct().as[String].collect().toSet
    val again = EgoNets.sample(edges.toDF("src", "dst"), 0.4, Seq(2), "s")
      .select("seed").distinct().as[String].collect().toSet
    assert(some.subsetOf(all) && some.size < all.size && some.nonEmpty)
    assert(some == again)
  }
}
