package graft

import org.apache.spark.sql.functions._
import graft.textops.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // ---- single-threaded reference trainer: the SAME arithmetic contract
  // (micro-tf BIGINT features, exact integer dot products, exact BigInt
  // gradient/preconditioner sums, HALF_UP scalar rounds) on plain arrays ----

  private val B = Classifier.tableSize(2) - 1 // 256 hash buckets, bias at 256

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def roundHalfUp(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  private def words(t: String): Seq[String] =
    t.toLowerCase.split(" +").filter(_.nonEmpty).toSeq

  /** (doc features incl. bias, label) in micro units; bucket = int. */
  private def refFeatures(docs: Seq[(Long, String, Int)])
  : Seq[(Seq[(Int, Long)], Int)] =
    docs.map { case (_, text, y) =>
      val ws = words(text)
      val n = ws.size
      val f = ws.groupBy(w => Integer.parseInt(md5hex(w).take(2), 16))
        .toSeq.map { case (b, g) =>
          (b, roundHalfUp(g.size.toDouble / n * 1e6))
        }.filter(_._2 > 0)
      (f :+ ((B, 1000000L)), y)
    }

  private def refTrain(docs: Seq[(Long, String, Int)], iters: Int,
                       lr: Double): Array[Long] = {
    val feats = refFeatures(docs)
    val w = Array.fill(B + 1)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(B + 1)(BigInt(0))
      val h = Array.fill(B + 1)(BigInt(0))
      feats.foreach { case (f, y) =>
        val z = f.map { case (b, x) => w(b) * x }.sum
        val r = roundHalfUp((z - y * 1000000000000L).toDouble / 1e6)
        f.foreach { case (b, x) =>
          g(b) += BigInt(r) * BigInt(x); h(b) += BigInt(x) * BigInt(x)
        }
      }
      for (b <- 0 to B if h(b) != 0)
        w(b) -= roundHalfUp(lr * g(b).toDouble / h(b).toDouble * 1e6)
    }
    w
  }

  // ---- fixtures: seeded corpus, label = contains the word "alpha" ----

  private def corpus(nDocs: Int, seed: Long): Seq[(Long, String, Int)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 40).map(i => s"w$i") :+ "alpha"
    (0 until nDocs).map { d =>
      val text = Seq.fill(20 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (d.toLong, text, if (text.split(" ").contains("alpha")) 1 else 0)
    }
  }

  private def df(c: Seq[(Long, String, Int)]) =
    c.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")

  private val fix = corpus(200, 42)
  private val labelExpr = array_contains(split(col("text"), " "), "alpha")

  test("distributed trainer == single-threaded reference, weight for weight") {
    val got = Classifier.train(df(fix), "doc_id", "text", labelExpr,
      iters = 4, lr = 0.0625)
    val want = refTrain(fix, iters = 4, lr = 0.0625)
    assert(got.toSeq == want.toSeq,
      s"diff at ${got.indices.filter(i => got(i) != want(i)).take(5)}")
  }

  test("trainer is repartition-invariant (exact-integer aggregation)") {
    val a = Classifier.train(df(fix), "doc_id", "text", labelExpr, iters = 3)
    val b = Classifier.train(df(fix).repartition(7), "doc_id", "text", labelExpr, iters = 3)
    assert(a.toSeq == b.toSeq)
  }

  test("the model learns: accuracy beats the base rate by >= 10 points") {
    val scored = Classifier.classifyReport(df(fix), "doc_id", "text", labelExpr)
      .select("doc_id", "pred").as[(Long, Int)].collect().toMap
    val y = fix.map { case (id, _, l) => id -> l }.toMap
    val acc = fix.count { case (id, _, l) => scored(id) == l }.toDouble / fix.size
    val base = math.max(y.values.sum.toDouble / y.size, 1 - y.values.sum.toDouble / y.size)
    assert(acc >= base + 0.10, s"acc=$acc base=$base")
  }

  test("all-positive label drives every score above threshold") {
    val scored = Classifier.classifyReport(df(fix), "doc_id", "text", lit(true))
      .select("pred").as[Int].collect()
    assert(scored.forall(_ == 1))
  }

  test("pred is exactly [score >= 0.5] and score is 6dp-bounded") {
    val rows = Classifier.classifyReport(df(fix), "doc_id", "text", labelExpr)
      .select("score", "pred").as[(Double, Int)].collect()
    rows.foreach { case (s, p) =>
      // pred thresholds the EXACT pico margin; the 6dp-rounded score can
      // disagree only within half an ulp of 0.5
      if ((s - 0.5).abs > 1e-5) assert((p == 1) == (s >= 0.5), s"score=$s pred=$p")
      assert((s * 1e6).round.toDouble / 1e6 == s)
    }
  }
}
