package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("output equals the plain inner join, hot key included") {
    val rnd = new scala.util.Random(41)
    // one hot key ("hot" on 200 left rows) + a long tail
    val left = (Seq.tabulate(200)(i => ("hot", s"l$i")) ++
      Seq.fill(100)((s"k${rnd.nextInt(30)}", s"l${rnd.nextInt(1000)}")))
      .toDF("k", "lval")
    val right = (Seq.tabulate(5)(i => ("hot", s"r$i")) ++
      Seq.fill(50)((s"k${rnd.nextInt(30)}", s"r${rnd.nextInt(1000)}")))
      .toDF("k", "rval")
    val plain = left.join(right, Seq("k"))
      .as[(String, String, String)].collect().sorted.toSeq
    for (s <- Seq(1, 4, 16)) {
      val salted = SaltedJoin.inner(left, right, Seq("k"), s)
        .as[(String, String, String)].collect().sorted.toSeq
      assert(salted == plain, s"saltFactor $s")
    }
  }

  test("the hot key's output spreads across partitions structurally") {
    // AQE's partition coalescing re-merges the tiny test shuffle; turn it
    // off so the assertion sees the structural reducer assignment (at
    // scale the hot key's salted partitions are far above the coalesce
    // target and stay split)
    val conf = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(conf, "true")
    try {
      spark.conf.set(conf, "false")
      val left = Seq.tabulate(400)(i => ("hot", s"l$i")).toDF("k", "lval")
      val right = Seq.tabulate(3)(i => ("hot", s"r$i")).toDF("k", "rval")
      // plain join: one key -> one reducer partition
      val plainParts = left.join(right.hint("merge"), Seq("k"))
        .select(spark_partition_id()).distinct().count()
      assert(plainParts == 1L)
      val saltedParts = SaltedJoin.inner(left, right.hint("merge"), Seq("k"), 8)
        .select(spark_partition_id()).distinct().count()
      assert(saltedParts > 1L,
        s"salted hot key must land on several reducers, got $saltedParts")
    } finally spark.conf.set(conf, prev)
  }

  test("duplicate rows and multi-column keys survive exactly") {
    val left = Seq(("a", 1, "x"), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z"))
      .toDF("k1", "k2", "lval")
    val right = Seq(("a", 1, "r1"), ("a", 1, "r2"), ("b", 1, "r3"))
      .toDF("k1", "k2", "rval")
    val plain = left.join(right, Seq("k1", "k2"))
      .as[(String, Int, String, String)].collect().sorted.toSeq
    val salted = SaltedJoin.inner(left, right, Seq("k1", "k2"), 5)
      .as[(String, Int, String, String)].collect().sorted.toSeq
    assert(salted == plain && plain.size == 5)
  }
}
