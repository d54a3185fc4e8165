package graft

import graft.graph.NegativeSampling

/** Filtered negative sampling vs a single-threaded reference
  * implementation of the same md5-rank corruption, plus the TransE
  * contract guarantees (type-compatible domain, no false negatives,
  * determinism under repartitioning). */
class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val triples = Seq(
    ("alice", "works_at", "acme"),
    ("bob", "works_at", "globex"),
    ("carol", "works_at", "initech"),
    ("dave", "works_at", "acme"),
    ("alice", "lives_in", "paris"),
    ("bob", "lives_in", "oslo"),
    ("carol", "lives_in", "lima")
  ).toDF("subj", "pred", "obj")

  private def md5Rank(subj: String, pred: String, obj: String, j: Int,
                      nDom: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$subj|$pred|$obj|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % nDom
  }

  /** Brute-force reference: same corruption regime, computed in plain
    * Scala with no Spark in the loop. */
  private def reference(ts: Seq[(String, String, String)], k: Int) = {
    val byPred = ts.map(t => t._2 -> t._3).distinct
      .groupBy(_._1).map { case (p, os) => p -> os.map(_._2).sorted.toIndexedSeq }
    val truth = ts.toSet
    for {
      (s, p, o) <- ts
      j <- 0 until k
      dom = byPred(p)
      cand = dom(md5Rank(s, p, o, j, dom.size.toLong).toInt)
      if cand != o && !truth.contains((s, p, cand))
    } yield (s, p, o, j, cand)
  }

  test("corruptObjects == single-threaded reference, row for row") {
    val got = NegativeSampling.corruptObjects(triples, k = 3)
      .as[(String, String, String, Int, String)].collect().toSet
    val want = reference(
      triples.as[(String, String, String)].collect().toSeq, 3).toSet
    assert(want.nonEmpty, "degenerate fixture: no negatives survive")
    assert(got == want)
  }

  test("contract: type-compatible domain, no false negatives, no self") {
    val ts = triples.as[(String, String, String)].collect().toSet
    val domains = ts.toSeq.map(t => t._2 -> t._3).distinct
      .groupBy(_._1).map { case (p, os) => p -> os.map(_._2).toSet }
    val rows = NegativeSampling.corruptObjects(triples, k = 4)
      .as[(String, String, String, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, p, o, j, neg) =>
      assert(j >= 0 && j < 4)
      assert(neg != o, "self-corruption leaked")
      assert(domains(p).contains(neg), s"$neg outside domain of $p")
      assert(!ts.contains((s, p, neg)), s"false negative ($s,$p,$neg)")
    }
  }

  test("property: equals the reference on a seeded random triple set") {
    val rnd = new scala.util.Random(562)
    val ents = (0 until 40).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2")
    val ts = Seq.fill(200)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    val df = ts.toDF("subj", "pred", "obj")
    for (k <- Seq(1, 5)) {
      val got = NegativeSampling.corruptObjects(df, k)
        .as[(String, String, String, Int, String)].collect().toSet
      assert(got == reference(ts, k).toSet, s"mismatch at k=$k")
    }
  }

  test("deterministic and repartition-invariant") {
    val a = NegativeSampling.corruptObjects(triples, k = 3)
      .as[(String, String, String, Int, String)].collect().toSet
    val b = NegativeSampling.corruptObjects(triples.repartition(7), k = 3)
      .as[(String, String, String, Int, String)].collect().toSet
    assert(a == b)
  }
}
