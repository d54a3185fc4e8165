package graft

import org.apache.spark.sql.functions._
import graft.noise.Noise
import graft.schemadisc.PatternExtraction

/** Generalized schemaless pattern extraction vs the reference semantics
  * (cs562_sdpg DataToPattern.scala:11-79): header-dictionary label beats
  * value scan, value scan walks columns in order / dictionary in order,
  * properties are the non-null non-edge columns, edges are the label-named
  * columns regardless of value. */
class PatternExtractionSpec extends SparkSpec {
  import spark.implicits._

  test("header label wins over value labels; edges from header names") {
    val df = Seq(
      ("1", "big city here", "x"),
      ("2", "nothing", null))
      .toDF("rec_id", "note", "friend_person")
    val got = PatternExtraction.rowPatterns(df)
      .select("id", "label", "properties", "edges")
      .as[(String, String, Seq[String], Seq[String])].collect().sortBy(_._1)
    // header 'friend_person' contains 'person' -> every row Person, even
    // though row 1's VALUE mentions City
    assert(got.forall(_._2 == "Person"))
    assert(got.forall(_._4 == Seq("friend_person")), "edge column regardless of value")
    assert(got(0)._3 == Seq("note"), "note non-null; friend_person is an edge, not a property")
    assert(got(1)._3 == Seq("note"))
  }

  test("value scan: first column in order, first label in dictionary order") {
    val df = Seq(
      ("1", "visited a city and country", "product x"), // col2 matches first; City before Country in dict
      ("2", "zzz", "the Product"),                      // col2 no match -> col3 Product
      ("3", "zzz", "yyy"))                              // nothing -> Unknown
      .toDF("rec_id", "c2", "c3")
    val got = PatternExtraction.rowPatterns(df)
      .select("id", "label").as[(String, String)].collect().toMap
    assert(got("1") == "City")
    assert(got("2") == "Product")
    assert(got("3") == PatternExtraction.unknownLabel)
  }

  test("uri minted as graft://<label>/<sha256(id)>; null values drop properties") {
    val df = Seq(("k1", "a Person", null: String, "v")).toDF("rec_id", "who", "p1", "p2")
    val row = PatternExtraction.rowPatterns(df)
      .select("uri", "label", "properties").as[(String, String, Seq[String])].head()
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("k1".getBytes).map("%02x".format(_)).mkString
    assert(row._1 == s"graft://Person/$sha")
    assert(row._3 == Seq("p2", "who"), "null p1 excluded, sorted")
  }

  test("census at 30% noise: label stability under header labeling, optionality shows up") {
    // mirror the reference's noise experiment (Main.scala:268-295): corrupt
    // 30% of non-id cells, re-extract, compare the pattern census
    val n = 1000
    val base = spark.range(n).select(
      col("id").cast("string").as("rec_id"),
      concat(lit("title "), col("id")).as("title"),
      (col("id") % 100).as("score"),
      concat(lit("u"), col("id") % 7).as("owner_person"))
    val clean = PatternExtraction.census(PatternExtraction.rowPatterns(base))
      .as[(String, String, String, Long)].collect()
    assert(clean.map(_._1).distinct.toSeq == Seq("Person"))
    assert(clean.length == 1, "clean input: one pattern (all properties present)")

    val noisy30 = PatternExtraction.census(
      PatternExtraction.rowPatterns(Noise.addNoise(base, 0.3, seed = 7L)))
      .as[(String, String, String, Long)].collect()
    assert(noisy30.forall(_._1 == "Person"), "header label immune to value noise")
    assert(noisy30.length > clean.length,
      "nulled cells split the census into patterns with missing properties")
    val full = noisy30.find(_._2 == "score,title").map(_._4).getOrElse(0L)
    assert(full > n * 0.3, s"~49% of rows keep both properties at p=0.3, got $full")
  }

  test("high-noise regime: 60-100% noise degrades gracefully, labels never invented") {
    val base = spark.range(500).select(
      col("id").cast("string").as("rec_id"),
      when(col("id") % 2 === 0, lit("a Person entry")).otherwise(lit("plain")).as("kind"),
      (col("id") % 10).as("v"))
    for (p <- Seq(0.6, 0.8, 1.0)) {
      val got = PatternExtraction.census(
        PatternExtraction.rowPatterns(Noise.addNoise(base, p, seed = 11L)))
        .as[(String, String, String, Long)].collect()
      val labels = got.map(_._1).toSet
      assert(labels.subsetOf(Set("Person", PatternExtraction.unknownLabel)),
        s"p=$p: labels $labels")
      assert(got.map(_._4).sum == 500, s"p=$p: census partitions all rows")
      if (p == 1.0)
        assert(got.forall(r => r._2 == "" && r._1 == PatternExtraction.unknownLabel),
          "100% noise: every value nulled -> no properties, no value labels")
    }
  }
}
