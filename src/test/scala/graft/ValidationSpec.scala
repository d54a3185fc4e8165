package graft

import graft.schemadisc.Validation

class ValidationSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed violations: object-only entity fails subject requirements") {
    val triples = Seq(
      ("alice", "works_at", "acme"), ("alice", "lives_in", "paris"),
      ("bob", "works_at", "acme")   // bob lacks lives_in
    ).toDF("subj", "pred", "obj")
    val types = Seq(
      ("alice", "person"), ("bob", "person"),
      ("carol", "person"),          // typed but NO subject triples at all
      ("acme", "org"), ("paris", "city")
    ).toDF("entity", "assigned_type")
    val schema = Seq(
      ("person", "works_at", true), ("person", "lives_in", true),
      ("person", "hobby", false),   // not required -> never a violation
      ("org", "based_in", true)
    ).toDF("label", "predicate", "required")
    val got = Validation.requiredViolations(triples, types, schema)
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("bob", "person", "lives_in"),
      ("carol", "person", "works_at"), ("carol", "person", "lives_in"),
      ("acme", "org", "based_in")))
  }

  test("self-describing batch validates clean; label without schema row is unconstrained") {
    val triples = Seq(("a", "p", "b"), ("c", "p", "d")).toDF("subj", "pred", "obj")
    val types = Seq(("a", "t"), ("c", "t"), ("b", "untyped_label"))
      .toDF("entity", "assigned_type")
    val schema = Seq(("t", "p", true)).toDF("label", "predicate", "required")
    assert(Validation.requiredViolations(triples, types, schema).count() == 0)
  }
}
