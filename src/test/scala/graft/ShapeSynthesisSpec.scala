package graft

import graft.schemadisc.ShapeSynthesis

class ShapeSynthesisSpec extends SparkSpec {
  import spark.implicits._

  test("shapes: required/optional, functional/multi-valued, polymorphic range") {
    // person: alice + bob. works_at required (both have it), alice is
    // functional there but bob asserts two orgs -> max_count 2;
    // lives_in optional (alice only). org: one entity, based_in has a
    // polymorphic range (city + region).
    val td = Seq(
      ("alice", "works_at", "acme", "person", "org"),
      ("alice", "works_at", "acme", "person", "org"), // dup collapses
      ("bob", "works_at", "acme", "person", "org"),
      ("bob", "works_at", "globex", "person", "org"),
      ("alice", "lives_in", "zurich", "person", "city"),
      ("acme", "based_in", "zurich", "org", "city"),
      ("acme", "based_in", "europe", "org", "region")
    ).toDF("subj", "pred", "obj", "subj_type", "obj_type")
    val got = ShapeSynthesis.shapes(td)
      .as[(String, String, String, Long, Long, Long, Int, Long)]
      .collect().toSet
    assert(got == Set(
      ("person", "works_at", "org", 1L, 2L, 2L, 1, 2L),
      ("person", "lives_in", "city", 1L, 2L, 1L, 0, 1L),
      ("org", "based_in", "city", 2L, 1L, 1L, 1, 2L)))
  }

  test("randomized: shapes equal brute force on a seeded typed KG") {
    val rnd = new scala.util.Random(36)
    for (trial <- 1 to 3) {
      val types = Seq("person", "org", "city")
      val preds = Seq("p0", "p1", "p2", "p3")
      val raw = Seq.fill(200)((s"e${rnd.nextInt(15)}", preds(rnd.nextInt(4)),
        s"v${rnd.nextInt(10)}", types(rnd.nextInt(3)), types(rnd.nextInt(3))))
      val td = raw.distinct
      val want = td.groupBy(r => (r._4, r._2)).map { case ((label, pred), rows) =>
        val nWith = rows.map(_._1).distinct.size.toLong
        val maxCount = rows.groupBy(_._1).values.map(_.size).max.toLong
        val classes = rows.map(_._5).distinct
        val nEnt = td.filter(_._4 == label).map(_._1).distinct.size.toLong
        (label, pred, classes.min, classes.size.toLong, nEnt, nWith,
          if (nWith == nEnt) 1 else 0, maxCount)
      }.toSet
      val got = ShapeSynthesis.shapes(
        raw.toDF("subj", "pred", "obj", "subj_type", "obj_type"))
        .as[(String, String, String, Long, Long, Long, Int, Long)]
        .collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("shapes: null-typed and null-object rows drop") {
    val td = Seq(
      ("a", "p", "b", "t", "u"),
      ("a", "p", null, "t", "u"),
      ("c", "p", "d", null, "u")
    ).toDF("subj", "pred", "obj", "subj_type", "obj_type")
    val got = ShapeSynthesis.shapes(td)
      .as[(String, String, String, Long, Long, Long, Int, Long)]
      .collect().toSet
    assert(got == Set(("t", "p", "u", 1L, 1L, 1L, 1, 1L)))
  }
}
