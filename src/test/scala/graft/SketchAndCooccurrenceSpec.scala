package graft

import org.apache.spark.sql.functions._
import graft.textops.Sketches
import graft.graph.Cooccurrence

class SketchAndCooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: exact below capacity (sketch IS the count when distinct < k)") {
    val df = (1 to 40).map(i => ("g", s"tok$i")).toDF("grp", "v")
      .unionByName(Seq.fill(100)(("g", "tok1")).toDF("grp", "v")) // dups collapse
    val r = Sketches.kmvDistinct(df, Seq("grp"), col("v"), k = 64)
      .as[(String, Long, Double)].head()
    assert(r == (("g", 40L, 40.0)))
  }

  test("kmv: estimate within 25% on 5000 distinct values at k=256") {
    val df = (1 to 5000).map(i => ("g", s"value_$i")).toDF("grp", "v")
    val est = Sketches.kmvDistinct(df, Seq("grp"), col("v"), k = 256)
      .select("distinct_est").as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est $est")
  }

  test("kmv: deterministic and repartition-invariant") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"v$i")).toDF("grp", "v")
    val a = Sketches.kmvDistinct(df, Seq("grp"), col("v"), 64)
      .collect().map(_.toSeq).toSet
    val b = Sketches.kmvDistinct(df.repartition(13), Seq("grp"), col("v"), 64)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3)
  }

  test("kmv: window plans as WindowGroupLimit (map-side partial top-k)") {
    val df = (1 to 100).map(i => ("g", s"v$i")).toDF("grp", "v")
    val plan = Sketches.kmvDistinct(df, Seq("grp"), col("v"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("pmi: hand-computed on 4 contexts") {
    // ctx1 {a,b}, ctx2 {a,b}, ctx3 {a,c}, ctx4 {b} => N=4,
    // n_a=3 n_b=3 n_c=1, n_ab=2 n_ac=1
    val m = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (4L, "b") // dup collapses
    ).toDF("ctx", "ent")
    val got = Cooccurrence.pmi(m, "ctx", "ent")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def p(nab: Long, na: Long, nb: Long) =
      BigDecimal(math.log(nab.toDouble * 4.0 / (na.toDouble * nb.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      ("a", "b") -> ((2L, p(2, 3, 3))),
      ("a", "c") -> ((1L, p(1, 3, 1)))))
  }

  test("pmi: maxPerContext drops oversized contexts entirely") {
    val big = (1 to 50).map(i => (9L, s"e$i"))
    val small = Seq((1L, "a"), (1L, "b"))
    val m = (big ++ small).toDF("ctx", "ent")
    val got = Cooccurrence.pmi(m, "ctx", "ent", maxPerContext = 10)
      .select("ent_a", "ent_b").as[(String, String)].collect().toSet
    assert(got == Set("a" -> "b"))
  }
}
