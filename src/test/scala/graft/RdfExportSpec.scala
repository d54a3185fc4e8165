package graft

import org.apache.spark.sql.functions._
import graft.graph.RdfExport

class RdfExportSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_rdf").toString

  test("entity-object round trip, hostile local names") {
    val t = Seq(
      ("alice", "works_at", "acme"),
      ("a b", "p/q", "c<d>e"),          // space, slash, angle brackets
      ("quote\"x", "p", "näïve 中"),     // quote + non-ASCII
      ("tab\there", "p", "nl\nline"),   // control chars in names
      (null, "p", "x"), ("s", null, "x") // nulls dropped
    ).toDF("subj", "pred", "obj")
    val dir = tmp()
    RdfExport.write(t, dir)
    val back = RdfExport.read(spark, dir)
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    val want = Seq(
      ("alice", "works_at", "acme"), ("a b", "p/q", "c<d>e"),
      ("quote\"x", "p", "näïve 中"), ("tab\there", "p", "nl\nline")).toSet
    assert(back == want)
  }

  test("lines are legal N-Triples: IRI refs contain no forbidden chars") {
    val t = Seq(("a b", "p<q", "c\"d\\e\nf")).toDF("subj", "pred", "obj")
    val dir = tmp()
    RdfExport.write(t, dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.length == 1)
    val line = lines.head
    assert(line.matches("""^<\S+> <\S+> <\S+> \.$"""), s"bad line: $line")
    // nothing between the angle brackets may be a space, quote, <, >, or raw backslash
    "<([^>]*)>".r.findAllMatchIn(line).foreach { m =>
      assert(!m.group(1).exists(ch => ch <= ' ' || "<>\"\\".contains(ch)),
        s"forbidden char inside IRI: ${m.group(1)}")
    }
  }

  test("literal objects: spec escapes, empty literal, escaped-backslash-n pitfall") {
    val t = Seq(
      ("s1", "name", "plain value", true),
      ("s2", "bio", "line1\nline2\ttabbed \"quoted\" back\\slash", true),
      ("s3", "note", "", true),                       // empty literal
      ("s4", "tricky", "ends with backslash-n: \\n", true), // \\n vs \n
      ("s5", "knows", "s1", false)                    // mixed: entity link
    ).toDF("subj", "pred", "obj", "is_lit")
    val dir = tmp()
    RdfExport.write(t, dir, literalObjFlag = Some("is_lit"))
    val lines = spark.read.text(dir).as[String].collect()
    // on-disk form is single-line, escaped
    assert(lines.forall(l => !l.contains("\n") && l.endsWith(" .")))
    assert(lines.exists(_.contains("\"line1\\nline2\\ttabbed \\\"quoted\\\" back\\\\slash\"")))
    val back = RdfExport.read(spark, dir)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(back == Set(
      ("s1", "name", "plain value", true),
      ("s2", "bio", "line1\nline2\ttabbed \"quoted\" back\\slash", true),
      ("s3", "note", "", true),
      ("s4", "tricky", "ends with backslash-n: \\n", true),
      ("s5", "knows", "s1", false)))
  }

  test("distributed parts: one file per partition, union equals input") {
    val t = spark.range(0, 1000, 1, 8).select(
      concat(lit("e"), col("id")).as("subj"), lit("p").as("pred"),
      concat(lit("o"), col("id")).as("obj"))
    val dir = tmp()
    RdfExport.write(t, dir)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 8, s"expected 8 distributed parts, got $parts")
    assert(RdfExport.read(spark, dir).count() == 1000)
  }

  test("illegal baseIri rejected") {
    intercept[IllegalArgumentException] {
      RdfExport.write(Seq(("a", "b", "c")).toDF("subj", "pred", "obj"),
        tmp(), baseIri = "urn:has space:")
    }
  }

  test("KG pipeline triples export + re-import preserves the triple set") {
    val tr = graft.fixtures.TranscriptGen.transcripts(spark, 50)
    val ts = graft.pipeline.KGPipeline.run(spark, tr,
      graft.pipeline.KGPipeline.Config.fromSession(spark)).tripleSet
      .select("subj", "pred", "obj")
    val dir = tmp()
    RdfExport.write(ts, dir)
    val back = RdfExport.read(spark, dir).select("subj", "pred", "obj")
    val a = ts.filter(col("subj").isNotNull && col("pred").isNotNull &&
      col("obj").isNotNull).as[(String, String, String)].collect().toSet
    val b = back.as[(String, String, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
