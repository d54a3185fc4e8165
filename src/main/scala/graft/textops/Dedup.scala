package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.link.{ConnectedComponents, MinHashBlocking}

/**
 * Document deduplication family for large-scale training-data pipelines.
 *
 * Scale design: every variant is (map-side featurize) -> (one bounded
 * shuffle) -> (verify within candidate groups). Nothing ever materializes
 * the O(n^2) pair space: exact dedup is a hash groupBy; near-dup variants
 * go through banded LSH (MinHash / SimHash / hyperplane) so the self-join
 * key is a bucket, and bucket sizes are capped.
 */
object Dedup {

  /** Word n-gram shingles (distinct) — the unit of Jaccard similarity for
    * document-level near-dup. */
  def wordShingles(textCol: Column, n: Int = 3): Column = {
    val words = split(textCol, " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => array_join(slice(words, i + 1, lit(n)), " ")))
  }

  /**
   * Exact deduplication: survivor = min id per normalized text. One hash
   * aggregation; at 100 TB this is the classic first pass (hash-partitioned
   * on a text digest so the shuffle carries a 32-byte key, not the text).
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol), col(textCol),
        sha2(trim(lower(col(textCol))), 256).as("_digest"))
      .groupBy("_digest")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
  }

  /** MinHash+LSH near-duplicate pairs at `threshold` Jaccard over word
    * n-gram shingles (shingle->minhash->band->bucket-join->exact verify). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, shingleWords: Int = 3): DataFrame = {
    val withSh = df.select(col(idCol), wordShingles(col(textCol), shingleWords).as("_shingles"))
    MinHashBlocking.candidatePairs(withSh, idCol, "_shingles", threshold)
  }

  /** Near-dup clusters: LSH pairs -> connected components -> survivor =
    * min id per cluster. Returns (id, keep_id). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold)
    ConnectedComponents.components(
      df.select(col(idCol)), idCol,
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col(idCol), col("component").as("keep_id"))
  }

  /**
   * 64-bit SimHash over word tokens: bit_i = sign of the sum over tokens of
   * (+1 / -1) by bit i of xxhash64(token). Pure column expressions —
   * explode + one groupBy with 64 conditional sums (partial-agg friendly),
   * bits reassembled with shiftleft/bitwise-or.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol), explode(split(col(textCol), " ")).as("_tok"))
      .withColumn("_h", xxhash64(col("_tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("_h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"_b$i")
    }
    val agged = tokens.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"_b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agged.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * bands (any exact band match -> candidate; Hamming-verify <= maxHamming).
    * By pigeonhole, any pair within Hamming distance 3 shares a band. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val banded = sh.select(col(idCol).as("_id"), col("simhash"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
        }: _*)).as("bk"))
      .select(col("_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("_id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /**
   * Exact n-gram Jaccard for candidate pairs within a blocking key (here:
   * all-pairs within small groups — use ONLY behind blocking; the public
   * near-dup path is [[minhashPairs]]). Kept for verification/audit of the
   * LSH path on bounded buckets.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, threshold: Double, n: Int = 3): DataFrame = {
    val withSh = df.select(col(blockCol).as("_blk"), col(idCol),
      wordShingles(col(textCol), n).as("_sh"))
    val a = withSh.select(col("_blk"), col(idCol).as("id_a"), col("_sh").as("_sh_a"))
    val b = withSh.select(col("_blk"), col(idCol).as("id_b"), col("_sh").as("_sh_b"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      // a pair may co-occur in several blocks (e.g. adjacent-bucket probes)
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
          size(array_union(col("_sh_a"), col("_sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets then
    * exact cosine verify within buckets (see [[graft.ann.Similarity]]). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     minCosine: Double, planes: Int = 16): DataFrame = {
    val sig = graft.ann.Similarity.hyperplaneSignature(col(vecCol), planes)
    val withSig = df.select(col(idCol), col(vecCol), sig.as("_sig"))
    val a = withSig.select(col("_sig"), col(idCol).as("id_a"), col(vecCol).as("_v_a"))
    val b = withSig.select(col("_sig"), col(idCol).as("id_b"), col(vecCol).as("_v_b"))
    a.join(b, Seq("_sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.ann.Similarity.cosine(col("_v_a"), col("_v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
