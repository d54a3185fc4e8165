package graft

import org.apache.spark.sql.functions._
import graft.link.{ConnectedComponents, MinHashBlocking}

class LinkSpec extends SparkSpec {
  import spark.implicits._

  test("LSH sizing formula matches reference semantics (Clustering.scala:13-28,39-54)") {
    // base = ceil(ln(1-0.9)/ln(1-0.8)) = ceil(2.302/1.609) = 2
    assert(MinHashBlocking.numHashTables(0.8, 0.9) == 2)
    // scaled by log10(size), floored at base
    assert(MinHashBlocking.numHashTables(0.8, 0.9, 1000000L) == 12)
    assert(MinHashBlocking.numHashTables(0.8, 0.9, 1L) >= 2)
  }

  test("shingles: char n-grams, distinct, no truncation, short-string pad") {
    val df = Seq("abcd", "ab", "aaaa").toDF("s")
      .select(MinHashBlocking.shingles(col("s"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("abc", "bcd"))
    assert(got(1) == Seq("ab#"))
    assert(got(2) == Seq("aaa")) // distinct
  }

  test("candidate pairs: aliases pair up, distinct entities do not") {
    val mentions = Seq(
      (1L, "alice johnson", "person"),
      (2L, "alice johnsonn", "person"), // typo alias
      (3L, "bob smith", "person"),
      (4L, "acme corp", "org"),
      (5L, "acme corpp", "org") // typo alias
    ).toDF("id", "norm", "mtype")
      .withColumn("shingles", MinHashBlocking.shingles(col("norm"), 3))
    val pairs = MinHashBlocking.candidatePairs(
      mentions, "id", "shingles", threshold = 0.6, extraKey = Seq("mtype"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((4L, 5L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 3L) || Set(a, b) == Set(2L, 3L) })
    // cross-type never pairs even if similar
    assert(!pairs.exists { case (a, b) => (a <= 3) != (b <= 3) })
  }

  test("connected components: chain, separate component, isolated vertex") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val cc = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val comp = ConnectedComponents.components(verts, "id", edges)
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(comp(99L) == 99L) // isolated -> own singleton
    assert(comp(4L) == 1L)
  }

  test("connected components: star and cycle converge") {
    val star = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    val ccStar = ConnectedComponents.run(star).as[(Long, Long)].collect()
    assert(ccStar.forall(_._2 == 1L))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (7L, 7L)).toDF("src", "dst")
    val ccCycle = ConnectedComponents.run(cycle).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(ccCycle(_) == 1L))
  }
}
