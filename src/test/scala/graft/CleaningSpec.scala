package graft

import org.apache.spark.sql.functions._
import graft.textops.{Boilerplate, Pii}

/** Corpus-cleaning ops: boilerplate (line-level) removal + PII redaction. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; "subscribe now" appears in 3/4 (>60%), everything else is rare.
  // doc 40 is ALL boilerplate and must vanish from the output.
  private val docs = Seq(
    (10L, "alpha prose here\nsubscribe now\nmore alpha"),
    (20L, "subscribe now\nbeta body text"),
    (30L, "gamma unique line"),
    (40L, "subscribe now")
  ).toDF("doc_id", "text")

  test("boilerplate: hot lines removed, order kept, empty docs dropped") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", "\n", 0.6)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(10L, 20L, 30L), s"doc 40 must drop: ${out.keySet}")
    assert(out(10L) == (("alpha prose here\nmore alpha", 2L, 1L)))
    assert(out(20L) == (("beta body text", 1L, 1L)))
    assert(out(30L) == (("gamma unique line", 1L, 0L)))
  }

  test("boilerplate: threshold is document frequency, not occurrence count") {
    // "dup line" occurs TWICE in one doc (df=1 of 4 = 25% <= 60%) -> kept
    val d = Seq(
      (1L, "dup line\ndup line\nown text"),
      (2L, "other a"), (3L, "other b"), (4L, "other c")
    ).toDF("doc_id", "text")
    val row = Boilerplate.removeBoilerplate(d, "doc_id", "text", "\n", 0.6)
      .filter(col("doc_id") === 1L).head()
    assert(row.getString(1) == "dup line\ndup line\nown text")
    assert(row.getLong(2) == 3L && row.getLong(3) == 0L)
  }

  test("boilerplate: repartition-invariant") {
    val a = Boilerplate.removeBoilerplate(docs, "doc_id", "text", "\n", 0.6)
      .collect().map(_.toSeq).toSet
    val b = Boilerplate.removeBoilerplate(docs.repartition(7), "doc_id", "text", "\n", 0.6)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("boilerplate: literal delimiter (regex metachars are not patterns)") {
    val d = Seq((1L, "a.b.a"), (2L, "a.c"), (3L, "a.d")).toDF("doc_id", "text")
    // '.' must split literally: "a" has df 3/3 > 0.6 -> dropped everywhere
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text", ".", 0.6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "b", 2L -> "c", 3L -> "d"))
  }

  private val pii = Seq(
    (1L, "mail me at jane.doe+x@corp.example.org today", "en"),
    (2L, "call 415-555-0142 or 415.555.0143 now", "en"),
    (3L, "ssn 123-45-6789 on file", "de"),
    (4L, "nothing sensitive here", "es")
  ).toDF("doc_id", "text", "lang")

  test("pii: emails, phones, ssn redacted with per-rule counts") {
    val out = Pii.redact(pii, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_email"),
          r.getAs[Int]("n_ssn"), r.getAs[Int]("n_phone")))).toMap
    assert(out(1L) == (("mail me at [EMAIL] today", 1, 0, 0)))
    assert(out(2L) == (("call [PHONE] or [PHONE] now", 0, 0, 2)))
    assert(out(3L) == (("ssn [ID] on file", 0, 1, 0)))
    assert(out(4L) == (("nothing sensitive here", 0, 0, 0)))
  }

  test("pii: ssn matched by the ssn rule, not mangled by the phone rule") {
    val out = Pii.redact(Seq((1L, "id 321-54-9876 tel 650-555-1234", "x"))
        .toDF("doc_id", "text", "lang"), "doc_id", "text").head()
    assert(out.getAs[String]("clean_text") == "id [ID] tel [PHONE]")
    assert(out.getAs[Int]("n_ssn") == 1 && out.getAs[Int]("n_phone") == 1)
  }

  test("pii: non-text columns pass through") {
    val cols = Pii.redact(pii, "doc_id", "text").columns.toSeq
    assert(cols == Seq("doc_id", "lang", "clean_text", "n_email", "n_ssn", "n_phone"))
  }

  test("pii: zero-shuffle projection (no Exchange in the plan)") {
    val p = Pii.redact(pii, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"redaction must not shuffle:\n$p")
  }
}
