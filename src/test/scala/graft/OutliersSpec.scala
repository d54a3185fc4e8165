package graft

import graft.eval.Outliers

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, java.lang.Double)], cutoff: Double = 3.0)
      : Seq[(Long, String, Double, Double, Double, Option[Double])] =
    Outliers.robustOutliers(rows.toDF("id", "grp", "value"), "id", "grp", "value", cutoff)
      .as[(Long, String, Double, Double, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq

  // single-threaded reference with the same type-1 lower-median convention
  private def ref(rows: Seq[(Long, String, java.lang.Double)], cutoff: Double = 3.0)
      : Seq[(Long, String, Double, Double, Double, Option[Double])] = {
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s((math.floor((s.size - 1) * 0.5)).toInt)
    }
    rows.filter(r => r._3 != null && r._2 != null).groupBy(_._2).toSeq.flatMap {
      case (g, rs) =>
        val vals = rs.map(_._3.doubleValue)
        val med = lowerMedian(vals)
        val mad = lowerMedian(vals.map(v => math.abs(v - med)))
        rs.collect {
          case (id, _, v) if math.abs(v - med) > cutoff * mad =>
            val z = if (mad > 0)
              Some(BigDecimal(math.abs(v - med) / mad)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            else None
            (id, g, v.doubleValue, med, mad, z)
        }
    }.sortBy(_._1)
  }

  private def D(x: Double): java.lang.Double = java.lang.Double.valueOf(x)

  test("hand-computed: spike flags, inliers don't, MAD is robust to the spike") {
    // grp a sorted values: 9,10,10,11,12,100 -> n=6, lower median = 10
    // devs: 1,0,0,1,2,90 sorted 0,0,1,1,2,90 -> MAD = 1; cutoff 3 -> only 100
    val rows = Seq((1L, "a", D(10)), (2L, "a", D(11)), (3L, "a", D(9)),
      (4L, "a", D(12)), (5L, "a", D(100)), (6L, "a", D(10)))
    val got = run(rows)
    assert(got.map(_._1) == Seq(5L))
    val r = got.head
    assert(r._4 == 10.0 && r._5 == 1.0 && r._6 == Some(90.0))
    assert(got == ref(rows))
  }

  test("MAD = 0 (constant majority): any deviation flags with null z") {
    val rows = Seq((1L, "a", D(5)), (2L, "a", D(5)), (3L, "a", D(5)), (4L, "a", D(7)))
    val got = run(rows)
    assert(got == Seq((4L, "a", 7.0, 5.0, 0.0, None)))
    assert(got == ref(rows))
  }

  test("per-group isolation; nulls dropped; singleton group never flags") {
    val rows = Seq((1L, "a", D(1)), (2L, "a", D(1)), (3L, "a", D(50)),
      (10L, "b", D(50)), (11L, "b", D(50)), (12L, "b", D(50.5)),
      (20L, "c", D(999)), (30L, null.asInstanceOf[String], D(1)),
      (31L, "a", null.asInstanceOf[java.lang.Double]))
    val got = run(rows)
    // a: med 1, mad 0 -> 50 flags; b: med 50, mad 0 -> 50.5 flags; c singleton
    assert(got.map(_._1) == Seq(3L, 12L))
    assert(got == ref(rows))
  }

  test("matches brute-force reference on a seeded heavy-tailed corpus") {
    val rnd = new scala.util.Random(53)
    val rows = (1L to 400L).map { i =>
      val g = s"g${i % 5}"
      val v = if (rnd.nextDouble() < 0.05) 200.0 + rnd.nextInt(300)
              else 20.0 + rnd.nextGaussian() * 5
      (i, g, D(math.rint(v * 100) / 100))
    }
    for (c <- Seq(2.5, 3.0, 5.0)) assert(run(rows, c) == ref(rows, c), s"cutoff=$c")
  }

  test("even/odd n use the lower (type-1) median; repartition-invariant") {
    // even n: values 1,2,3,4 -> lower median 2 (not 2.5)
    val even = Seq((1L, "a", D(1)), (2L, "a", D(2)), (3L, "a", D(3)), (4L, "a", D(4)))
    assert(run(even, cutoff = 0.99).map(_._4).distinct == Seq(2.0))
    val rnd = new scala.util.Random(59)
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}", D(rnd.nextInt(100))))
    val a = run(rows)
    val b = Outliers.robustOutliers(
      rows.toDF("id", "grp", "value").repartition(13), "id", "grp", "value")
      .as[(Long, String, Double, Double, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
