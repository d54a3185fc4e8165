package graft.noise

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Seeded, column-expression noise injection for robustness testing.
 *
 * Reference analog: cs562_sdpg `src2/main/scala/Noise.scala:6-22` — a
 * `Dataset.map` with `RowEncoder` using **unseeded** `scala.util.Random`
 * (non-reproducible, a defect per SURVEY.md appendix), exempting `*id*`
 * columns (`Noise.scala:15`). Rebuild: `when(rand(seed) < p, null)` columns —
 * deterministic per seed, codegen'd, no encoder round-trip.
 */
object Noise {

  /** Null out each cell of `cols` with probability `p` (seeded). Columns
    * whose lowercase name contains "id" are exempt, mirroring the reference
    * exemption. */
  def addNoise(df: DataFrame, p: Double, seed: Long = 42L): DataFrame = {
    df.columns.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      if (c.toLowerCase.contains("id")) acc
      else acc.withColumn(c,
        when(rand(seed + i) < p, lit(null)).otherwise(col(c)))
    }
  }

  /** Typo injection for string columns: with probability `p`, double the
    * last character (a deterministic corruption the linker must absorb). */
  def addTypos(df: DataFrame, cols: Seq[String], p: Double, seed: Long = 43L): DataFrame = {
    cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      acc.withColumn(c,
        when(rand(seed + i) < p && col(c).isNotNull && length(col(c)) > 3,
          concat(col(c), substring(col(c), -1, 1)))
          .otherwise(col(c)))
    }
  }
}
