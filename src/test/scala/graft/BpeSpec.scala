package graft

import org.apache.spark.sql.functions._
import graft.textops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- single-threaded reference BPE (Sennrich et al. 2016), the oracle ----

  private def refSymbolize(w: String): Vector[String] =
    w.map(_.toString).toVector :+ "</w>"

  private def refApply(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    s.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) { out.remove(out.size - 1); out += (l + r) }
      else out += x
    }
    out.toVector
  }

  private def refTrain(wc: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var syms: Seq[(Vector[String], Long)] = wc.toSeq.map { case (w, n) => (refSymbolize(w), n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      syms.foreach { case (s, n) =>
        s.sliding(2).foreach { p => if (p.size == 2) counts((p(0), p(1))) += n }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        syms = syms.map { case (s, n) => (refApply(s, best._1, best._2), n) }
      }
    }
    out.toSeq
  }

  private def corpus(wc: Map[String, Long]) = {
    // one word occurrence per row, shuffled deterministically into docs
    val occurrences = wc.toSeq.sortBy(_._1).flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    occurrences.zipWithIndex
      .groupBy(_._2 % 7).toSeq.sortBy(_._1)
      .map { case (d, ws) => (d.toLong, ws.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private val sennrich = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainMerges == reference BPE on the classic corpus, rank for rank") {
    val got = Bpe.trainMerges(corpus(sennrich), "text", 10)
    val want = refTrain(sennrich, 10).zipWithIndex.map { case ((l, r), t) => (t, l, r) }
    assert(got == want, s"got=$got want=$want")
    // sanity on the known head of the merge sequence: 'es' dominates
    assert((got.head._2, got.head._3) == ("e", "s"))
  }

  test("trainMerges == reference BPE on a randomized corpus (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val wc = (0 until 40).map { _ =>
      val w = (0 until (2 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      w -> (1L + rnd.nextInt(9))
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val got = Bpe.trainMerges(corpus(wc), "text", 15)
    val want = refTrain(wc, 15).zipWithIndex.map { case ((l, r), t) => (t, l, r) }
    assert(got == want, s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("early stop: merges end when every word is one symbol; repartition-invariant") {
    val tiny = Map("ab" -> 3L, "cd" -> 2L)
    // ab needs (a,b)+(ab,</w>), cd needs (c,d)+(cd,</w>) -> exactly 4 merges possible
    val got = Bpe.trainMerges(corpus(tiny), "text", 100)
    assert(got.size == 4, s"got ${got.size}: $got")
    val reparted = Bpe.trainMerges(corpus(tiny).repartition(13), "text", 100)
    assert(got == reparted)
  }

  test("vocabCap trains on the top-K word forms only") {
    // cap=1 keeps only 'newest' (n=6): merges never touch 'low'/'widest' chars
    val got = Bpe.trainMerges(corpus(sennrich), "text", 8, vocabCap = 1)
    val want = refTrain(Map("newest" -> 6L), 8).zipWithIndex.map { case ((l, r), t) => (t, l, r) }
    assert(got == want)
  }

  test("tokenCounts: segmentation matches reference; empty doc counts 0") {
    val merges = Bpe.trainMerges(corpus(sennrich), "text", 6)
    val refMerges = merges.map(m => (m._2, m._3))
    def refCount(text: String): Long =
      text.toLowerCase.split(" +").filter(_.nonEmpty).map { w =>
        refMerges.foldLeft(refSymbolize(w)) { case (s, (l, r)) => refApply(s, l, r) }.size.toLong
      }.sum
    val docs = Seq((1L, "low lower newest"), (2L, "widest newest newest"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> refCount("low lower newest"),
      2L -> refCount("widest newest newest"), 3L -> 0L))
    // with the full merge table every trained word collapses to one token
    val full = Bpe.trainMerges(corpus(sennrich), "text", 100)
    val got2 = Bpe.tokenCounts(docs.filter($"doc_id" === 1L), "doc_id", "text", full)
      .as[(Long, Long)].collect().toMap
    assert(got2(1L) == 3L)
  }

  test("segmentWords checkpoints keep the fold correct across the boundary") {
    val merges = Bpe.trainMerges(corpus(sennrich), "text", 10)
    val seg = Bpe.segmentWords(Seq("newest", "lowest").toDF("word"), "word",
      merges, checkpointEvery = 3)
      .select($"word", $"bpe").as[(String, Seq[String])].collect().toMap
    val refMerges = merges.map(m => (m._2, m._3))
    def refSeg(w: String) = refMerges.foldLeft(refSymbolize(w)) {
      case (s, (l, r)) => refApply(s, l, r)
    }
    assert(seg("newest") == refSeg("newest"))
    assert(seg("lowest") == refSeg("lowest"))
  }
}
