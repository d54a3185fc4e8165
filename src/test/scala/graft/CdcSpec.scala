package graft

import org.apache.spark.sql.functions._
import graft.textops.Packing

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent single-threaded reference: same published recipe
  // (splitmix64 gear table, h = (h<<1) + G[b], min/mask/max rule) ----

  private def sm64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private val gear = Array.tabulate(256)(i => sm64(i.toLong))

  private def refBounds(s: String, min: Int, avg: Int, max: Int): Seq[Int] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return Seq.empty
    var bits = 0
    while ((1 << (bits + 1)) <= math.max(avg - min, 1)) bits += 1
    val mask = (1L << bits) - 1
    val out = scala.collection.mutable.ArrayBuffer(0)
    var h = 0L; var start = 0
    for (i <- bytes.indices) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if (i < bytes.length - 1 && ((len >= min && (h & mask) == 0L) || len >= max)) {
        out += (i + 1); start = i + 1; h = 0L
      }
    }
    out.toSeq
  }

  private def randDoc(len: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }

  private def run(docs: Seq[(Long, String)], min: Int = 32, avg: Int = 64,
                  max: Int = 256): Seq[(Long, Long, Int, Int, Long)] =
    Packing.cdcChunks(docs.toDF("id", "text"), "id", "text", min, avg, max)
      .as[(Long, Long, Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq

  test("boundaries == independent reference, chunks tile the doc, lengths bounded") {
    val docs = (1L to 20L).map(i => i -> randDoc(2000 + i.toInt * 137, i))
    val got = run(docs)
    for ((id, text) <- docs) {
      val mine = got.filter(_._1 == id)
      assert(mine.map(_._3) == refBounds(text, 32, 64, 256), s"doc $id bounds")
      // tiling: contiguous starts, lens sum to the doc, all within [1, max]
      assert(mine.head._3 == 0)
      mine.sliding(2).foreach { case Seq(a, b) =>
        assert(b._3 == a._3 + a._4, s"gap in doc $id")
      case _ => }
      assert(mine.map(_._4).sum == text.length)
      assert(mine.forall(c => c._4 >= 1 && c._4 <= 256))
      // every non-final chunk respects min
      assert(mine.init.forall(_._4 >= 32), s"short non-final chunk in doc $id")
    }
  }

  test("edit resilience: prepended bytes re-sync — nearly all chunk hashes survive") {
    val text = randDoc(16000, 99)
    val orig = run(Seq(1L -> text)).map(_._5).toSet
    val edited = run(Seq(1L -> ("JUNKPREFIX" + text))).map(_._5).toSet
    val lost = orig -- edited
    assert(orig.size > 150, s"fixture too small: ${orig.size}")
    assert(lost.size <= 3,
      s"expected <=3 disturbed chunks near the edit, lost ${lost.size} of ${orig.size}")
  }

  test("edges: empty doc drops, short doc is one chunk; repartition-invariant") {
    assert(run(Seq(1L -> "")).isEmpty)
    val one = run(Seq(2L -> "tiny"))
    assert(one == Seq((2L, 0L, 0, 4, one.head._5)))
    val docs = (1L to 10L).map(i => i -> randDoc(3000, i + 50))
    val a = run(docs)
    val b = Packing.cdcChunks(docs.toDF("id", "text").repartition(7),
        "id", "text", 32, 64, 256)
      .as[(Long, Long, Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }

  test("chunk-level dedup: shared content across docs yields shared chunk hashes") {
    val shared = randDoc(4000, 7)
    val d1 = randDoc(500, 8) + shared
    val d2 = randDoc(900, 9) + shared
    val h1 = run(Seq(1L -> d1)).map(_._5).toSet
    val h2 = run(Seq(2L -> d2)).map(_._5).toSet
    // the shared 4k span holds ~60 avg-64 chunks; all but the edge-adjacent
    // few re-sync to identical content chunks in both docs
    assert((h1 & h2).size >= 40, s"shared=${(h1 & h2).size}")
  }
}
