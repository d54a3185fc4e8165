package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit skew-salted inner equi-join — the hand salting the brief's
 * 100 TB posture calls for when AQE's skew split can't help: AQE only
 * splits SORT-MERGE partitions post-shuffle, so a single hot key that
 * hashes to one reducer still sorts and joins on one task when the
 * join is a broadcast, when the skew is in an aggregate feeding the
 * join, or when runtime stats under-estimate the hot key. Salting makes
 * the split STRUCTURAL: the left side gets a deterministic per-row salt
 * (xxhash64 of the whole row — retry-stable, no RNG), the right side
 * replicates `saltFactor` ways, and the join key becomes
 * (keys, salt) — the hot key's rows spread across `saltFactor` reducers
 * by construction, whatever the planner thinks.
 *
 * Output is ROW-IDENTICAL to `left.join(right, keys)`: each left row
 * carries exactly one salt and meets each matching right row at exactly
 * that replica, so no pair is lost or duplicated. Cost: right side
 * shuffles `saltFactor`× its size — use on joins whose right side is the
 * smaller/bounded one (dimension tables, same-table self-join halves).
 *
 * Salting an aggregation instead: group by (keys, salt) partially, then
 * re-aggregate by keys — already the shape Spark's partial aggregates
 * produce, which is why only JOINS need the manual treatment.
 */
object SaltedJoin {

  /**
   * @param left       probe side (hot keys live here). CAVEAT: the salt
   *                    is xxhash64 of the whole left row, so left rows
   *                    that are EXACT duplicates all draw the same salt
   *                    and still land on one reducer — deduplicate first,
   *                    or add a per-row disambiguator column (an id) so
   *                    the hash spreads; callers here (kg21's witness
   *                    side) pass distinct rows by construction.
   * @param right      build side, replicated `saltFactor`×
   * @param keys       equi-join column names (present on both sides)
   * @param saltFactor number of splits for each hot key
   * @return inner join of left and right on `keys`, salt column dropped;
   *         column layout matches `left.join(right, keys)`
   */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor $saltFactor")
    require(keys.nonEmpty, "need join keys")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs must not already carry a _salt column")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
