package graft

import graft.graph.KGDelta

class KGDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def t(rows: (String, String, String)*) =
    rows.toSeq.toDF("subj", "pred", "obj")

  test("added / removed / kept partition the union of both snapshots") {
    val old = t(("a", "p", "x"), ("b", "p", "y"), ("c", "q", "z"))
    val nw = t(("b", "p", "y"), ("c", "q", "w"), ("d", "p", "x"))
    val got = KGDelta.diff(old, nw)
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("a", "p", "x", "removed"),
      ("c", "q", "z", "removed"),
      ("b", "p", "y", "kept"),
      ("c", "q", "w", "added"),
      ("d", "p", "x", "added")))
  }

  test("set semantics: within-snapshot duplicates collapse") {
    val old = t(("a", "p", "x"), ("a", "p", "x"), ("a", "p", "x"))
    val nw = t(("a", "p", "x"), ("a", "p", "x"))
    val got = KGDelta.diff(old, nw)
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(("a", "p", "x", "kept")))
  }

  test("empty snapshots: everything added / everything removed") {
    val empty = t()
    val some = t(("a", "p", "x"))
    assert(KGDelta.diff(empty, some)
      .as[(String, String, String, String)].collect().toSeq ==
      Seq(("a", "p", "x", "added")))
    assert(KGDelta.diff(some, empty)
      .as[(String, String, String, String)].collect().toSeq ==
      Seq(("a", "p", "x", "removed")))
    assert(KGDelta.diff(empty, empty).count() == 0)
  }

  test("repartition-invariant") {
    val mk = (lo: Int, hi: Int) => (lo until hi).map { i =>
      (s"s${i % 17}", s"p${i % 3}", s"o${(i * 7) % 13}")
    }
    val old = t(mk(0, 60): _*)
    val nw = t(mk(30, 90): _*)  // overlapping window -> kept + added + removed
    val a = KGDelta.diff(old, nw)
      .as[(String, String, String, String)].collect().toSet
    val b = KGDelta.diff(old.repartition(7), nw.repartition(3))
      .as[(String, String, String, String)].collect().toSet
    assert(a == b && a.exists(_._4 == "kept") && a.exists(_._4 == "added"))
  }
}
