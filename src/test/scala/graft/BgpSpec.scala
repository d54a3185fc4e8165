package graft

import org.apache.spark.sql.functions._
import graft.graph.Bgp

class BgpSpec extends SparkSpec {

  import spark.implicits._

  private def kg = Seq(
    ("alice", "works_at", "acme"), ("acme", "based_in", "paris"),
    ("alice", "lives_in", "paris"),
    ("bob", "works_at", "acme"), ("bob", "lives_in", "oslo"), // org city mismatch
    ("carol", "works_at", "globex"), ("globex", "based_in", "oslo"),
    ("carol", "lives_in", "oslo"),
    ("dave", "reports_to", "dave"), // self-loop
    ("erin", "reports_to", "alice"),
    (null, "works_at", "nowhere"), ("ghost", null, "x") // null slots never bind
  ).toDF("subj", "pred", "obj")

  test("single pattern with constant pred: all bindings, nulls excluded") {
    val got = Bgp.matchPatterns(kg, Seq(("?p", "works_at", "?o")))
      .as[(String, String)].collect().toSet
    assert(got == Set(("alice", "acme"), ("bob", "acme"), ("carol", "globex")))
  }

  test("shared-variable triangle: works_at + based_in + lives_in") {
    val got = Bgp.matchPatterns(kg, Seq(
      ("?person", "works_at", "?org"),
      ("?org", "based_in", "?city"),
      ("?person", "lives_in", "?city")))
      .as[(String, String, String)].collect().toSet
    // bob works at acme (paris) but lives in oslo -> excluded
    assert(got == Set(("alice", "acme", "paris"), ("carol", "globex", "oslo")))
    // column order = first appearance
    assert(Bgp.matchPatterns(kg, Seq(
      ("?person", "works_at", "?org"), ("?org", "based_in", "?city")))
      .columns.toSeq == Seq("person", "org", "city"))
  }

  test("repeated variable within one pattern = equality filter (self-loops)") {
    val got = Bgp.matchPatterns(kg, Seq(("?x", "reports_to", "?x")))
      .as[String].collect().toSet
    assert(got == Set("dave"))
  }

  test("variable over pred slot; constant subj and obj") {
    val got = Bgp.matchPatterns(kg, Seq(("alice", "?rel", "?tail")))
      .as[(String, String)].collect().toSet
    assert(got == Set(("works_at", "acme"), ("lives_in", "paris")))
    val rel = Bgp.matchPatterns(kg, Seq(("erin", "?rel", "alice")))
      .as[String].collect().toSet
    assert(rel == Set("reports_to"))
  }

  test("disconnected patterns cross-join (SPARQL cartesian semantics)") {
    val got = Bgp.matchPatterns(kg, Seq(
      ("?x", "reports_to", "?x"), ("?org", "based_in", "?city")))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("dave", "acme", "paris"), ("dave", "globex", "oslo")))
  }

  test("set semantics: duplicate triples do not duplicate bindings") {
    val dup = kg.unionAll(kg)
    val got = Bgp.matchPatterns(dup, Seq(("?p", "works_at", "?o"))).collect()
    assert(got.length == 3)
  }

  test("fully-constant pattern rejected; empty pattern list rejected") {
    intercept[IllegalArgumentException] {
      Bgp.matchPatterns(kg, Seq(("alice", "works_at", "acme")))
    }
    intercept[IllegalArgumentException] { Bgp.matchPatterns(kg, Seq.empty) }
  }

  test("repartition invariance") {
    val pats = Seq(
      ("?person", "works_at", "?org"), ("?org", "based_in", "?city"))
    val a = Bgp.matchPatterns(kg, pats)
      .as[(String, String, String)].collect().toSet
    val b = Bgp.matchPatterns(kg.repartition(7), pats)
      .as[(String, String, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("equals brute force on a seeded random KG") {
    val rnd = new scala.util.Random(562)
    val ents = (0 until 15).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2")
    val ts = Seq.fill(150)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    val tset = ts
    // ?a p0 ?b / ?b p1 ?c with the middle shared
    val want = (for {
      (a, p, b) <- tset if p == "p0"
      (b2, q, c) <- tset if q == "p1" && b2 == b
    } yield (a, b, c)).toSet
    val got = Bgp.matchPatterns(ts.toDF("subj", "pred", "obj"),
      Seq(("?a", "p0", "?b"), ("?b", "p1", "?c")))
      .as[(String, String, String)].collect().toSet
    assert(got == want)
  }
}
