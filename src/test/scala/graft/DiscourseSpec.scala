package graft

import graft.extract.Discourse
import org.apache.spark.sql.functions._

class DiscourseSpec extends SparkSpec {
  import spark.implicits._

  private def tdf(rows: Seq[(String, Int, String)]) =
    rows.map { case (c, i, t) => (c, i, "user", t, null: String) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool")

  private def run(rows: Seq[(String, Int, String)]) =
    Discourse.focusTrack(tdf(rows))
      .as[(String, Int, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(r => (r._1, r._2))

  test("focus carries the last mentioned subject across chatter turns") {
    val rows = Seq(
      ("c1", 0, "Please summarize the previous discussion."),
      ("c1", 1, "user 7 works at org 3."),
      ("c1", 2, "Please summarize the previous discussion."),
      ("c1", 3, "org 3 is based in city 1."),
      ("c1", 4, "Please summarize the previous discussion."),
      ("c2", 0, "Please summarize the previous discussion."))
    assert(run(rows).toSeq == Seq(
      ("c1", 0, None, None, None),
      ("c1", 1, Some("user 7"), Some(1), Some(0)),
      ("c1", 2, Some("user 7"), Some(1), Some(1)),
      ("c1", 3, Some("org 3"), Some(3), Some(0)),
      ("c1", 4, Some("org 3"), Some(3), Some(1)),
      ("c2", 0, None, None, None)))
  }

  test("rule precedence on multi-infix garbage: first rule in order wins") {
    // both 'works at' and 'lives in' fire; works_at is first in
    // Extraction.rules, so the focus subject is its split
    val rows = Seq(("c1", 0, "a works at b lives in c."))
    assert(run(rows).head._3.contains("a"))
    val rows2 = Seq(("c1", 0, "a lives in b works at c."))
    // works_at still wins precedence; its subject is the text before the
    // FIRST ' works at ' occurrence
    assert(run(rows2).head._3.contains("a lives in b"))
  }

  test("repartition-invariant and equal to a brute-force scan") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      c <- 0 until 8; t <- 0 until 30
    } yield (s"c$c", t, rnd.nextInt(3) match {
      case 0 => s"user ${rnd.nextInt(5)} works at org ${rnd.nextInt(4)}."
      case 1 => s"org ${rnd.nextInt(4)} is based in city ${rnd.nextInt(3)}."
      case _ => "Please summarize the previous discussion."
    })
    val got = run(rows)
    val gotRep = Discourse.focusTrack(tdf(rows).repartition(7))
      .as[(String, Int, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == gotRep.toSeq)
    // brute force: walk each conversation in order, remember last subject
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (c, ts) =>
      var focus: Option[(String, Int)] = None
      ts.sortBy(_._2).map { case (_, t, text) =>
        val subj =
          if (text.contains(" works at ")) Some(text.split(" works at ")(0))
          else if (text.contains(" is based in ")) Some(text.split(" is based in ")(0))
          else None
        subj.foreach(s => focus = Some((s, t)))
        (c, t, focus.map(_._1), focus.map(_._2), focus.map(f => t - f._2))
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == ref)
  }

  private def runCoref(rows: Seq[(String, Int, String)]) =
    Discourse.resolveAnaphora(tdf(rows))
      .as[(String, Int, String, String, String, String, String, Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("anaphora: pronoun subjects resolve to the last non-pronoun antecedent") {
    val rows = Seq(
      ("c1", 0, "user 7 works at org 3."),
      ("c1", 1, "He lives in city 2."),
      ("c1", 2, "org 3 is based in city 1."),
      ("c1", 3, "It works at org 9."),         // resolves to org 3, type org
      ("c1", 4, "Please summarize the previous discussion."),
      ("c1", 5, "They reports to user 8."))    // focus unchanged by turns 3-4
    assert(runCoref(rows) == Seq(
      ("c1", 0, "user 7", "person", "works_at", "org 3", "org", 0),
      ("c1", 1, "user 7", "person", "lives_in", "city 2", "city", 1),
      ("c1", 2, "org 3", "org", "based_in", "city 1", "city", 0),
      ("c1", 3, "org 3", "org", "works_at", "org 9", "org", 1),
      ("c1", 5, "org 3", "org", "reports_to", "user 8", "person", 1)))
  }

  test("anaphora: pronouns without an antecedent are dropped; focus never crosses conversations") {
    val rows = Seq(
      ("c1", 0, "She works at org 1."),        // no antecedent -> dropped
      ("c1", 1, "user 2 works at org 1."),
      ("c2", 0, "He works at org 5."))         // c1's focus must not leak
    assert(runCoref(rows) == Seq(
      ("c1", 1, "user 2", "person", "works_at", "org 1", "org", 0)))
  }

  test("anaphora: a pronoun turn does not move the focus (next pronoun sees the same antecedent)") {
    val rows = Seq(
      ("c1", 0, "user 1 works at org 2."),
      ("c1", 1, "He works at org 3."),
      ("c1", 2, "He works at org 4."))
    val got = runCoref(rows)
    assert(got.map(_._3) == Seq("user 1", "user 1", "user 1"))
    assert(got.map(_._8) == Seq(0, 1, 1))
  }

  test("anaphora: repartition-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = for { c <- 0 until 6; t <- 0 until 40 } yield
      (s"c$c", t, rnd.nextInt(4) match {
        case 0 => s"user ${rnd.nextInt(5)} works at org ${rnd.nextInt(4)}."
        case 1 => s"org ${rnd.nextInt(4)} is based in city ${rnd.nextInt(3)}."
        case 2 => s"${Seq("He", "She", "It", "They")(rnd.nextInt(4))} lives in city ${rnd.nextInt(3)}."
        case _ => "Please summarize the previous discussion."
      })
    val got = runCoref(rows)
    val gotRep = Discourse.resolveAnaphora(tdf(rows).repartition(7))
      .as[(String, Int, String, String, String, String, String, Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == gotRep && got.nonEmpty)
  }

  test("toolAffinity: tool calls attribute to the focus entity; pre-mention calls drop") {
    val rows = Seq(
      ("c1", 0, "user", "Please summarize the previous discussion.", "db_query"),   // no focus yet -> dropped
      ("c1", 1, "user", "user 7 works at org 3.", null),
      ("c1", 2, "tool", "Please summarize the previous discussion.", "db_query"),   // -> user 7
      ("c1", 3, "tool", "org 3 is based in city 1.", "web_search"),                 // own mention -> org 3
      ("c1", 4, "tool", "Please summarize the previous discussion.", "db_query"),   // -> org 3
      ("c2", 0, "tool", "user 9 lives in city 2.", "db_query"))                     // own mention -> user 9
      .map { case (c, i, r, t, tool) => (c, i, r, t, tool) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
    // row 0 has role=user so it is not a tool call anyway; make it one
    val withToolRole = rows.withColumn("role",
      when(col("conv_id") === "c1" && col("turn_idx") === 0, "tool")
        .otherwise(col("role")))
    val got = Discourse.toolAffinity(withToolRole)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(
      ("user 7", "person", "db_query", 1L),
      ("org 3", "org", "web_search", 1L),
      ("org 3", "org", "db_query", 1L),
      ("user 9", "person", "db_query", 1L)))
  }

  test("null text and empty conversations are safe") {
    val rows = Seq(("c1", 0, null: String), ("c1", 1, "user 1 works at org 2."))
    val got = Discourse.focusTrack(tdf(rows))
      .as[(String, Int, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(_._2)
    assert(got.toSeq == Seq(
      ("c1", 0, None, None, None),
      ("c1", 1, Some("user 1"), Some(1), Some(0))))
  }
}
