package graft

import graft.graph.Dictionary

class DictionarySpec extends SparkSpec {
  import spark.implicits._

  test("build: ids are the 0-based lexicographic rank across range partitions") {
    val vals = Seq("pear", "apple", "fig", "apple", "zebra", "mango", "kiwi",
      "banana", "fig", "date").toDF("v")
    val got = Dictionary.build(vals, "v", partitions = 3).as[(String, Long)]
      .collect().sortBy(_._2)
    val expected = Seq("apple", "banana", "date", "fig", "kiwi", "mango",
      "pear", "zebra").zipWithIndex.map { case (v, i) => (v, i.toLong) }
    assert(got.toSeq == expected)
  }

  test("build: nulls drop, single value gets id 0") {
    val vals = Seq(Some("only"), None, Some("only")).toDF("v")
    val got = Dictionary.build(vals, "v").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("only", 0L)))
  }

  test("encodeTriples: ids decode back to the original strings, preds dense") {
    val triples = Seq(
      ("alice", "works_at", "acme"),
      ("bob", "works_at", "acme"),
      ("alice", "lives_in", "zurich"),
      ("acme", "based_in", "zurich")).toDF("subj", "pred", "obj")
    val (dict, pdict, enc) = Dictionary.encodeTriples(triples, "subj", "pred", "obj")
    val d = dict.as[(String, Long)].collect().toMap
    val p = pdict.as[(String, Long)].collect().toMap
    assert(d.keySet == Set("alice", "bob", "acme", "zurich"))
    assert(d.values.toSeq.sorted == Seq(0L, 1L, 2L, 3L))
    assert(p == Map("based_in" -> 0L, "lives_in" -> 1L, "works_at" -> 2L))
    val inv = d.map(_.swap)
    val pinv = p.map(_.swap)
    val decoded = enc.select("s_id", "p_id", "o_id").as[(Long, Long, Long)]
      .collect().map { case (s, pr, o) => (inv(s), pinv(pr), inv(o)) }.toSet
    assert(decoded == triples.as[(String, String, String)].collect().toSet)
    assert(enc.count() == 4)
  }

  test("randomized: build equals brute-force global rank") {
    val rnd = new scala.util.Random(34)
    for (trial <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val vals = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val got = Dictionary.build(vals.toDF("v"), "v", partitions = 1 + rnd.nextInt(7))
        .as[(String, Long)].collect().toMap
      val expected = vals.distinct.sorted.zipWithIndex
        .map { case (v, i) => (v, i.toLong) }.toMap
      assert(got == expected, s"trial $trial")
    }
  }
}
