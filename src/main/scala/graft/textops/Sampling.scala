package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. At 100 TB, sampling
 * must be a PROPERTY OF THE DATA, not of the execution: `df.sample()` draws
 * from per-partition RNG streams, so the chosen set changes with partition
 * count, task retries, and engine version — useless for lineage ("which
 * docs trained this model?") and for cross-engine audits. Hash sampling
 * fixes the set: a row's fate is a pure function of (seed, id).
 *
 * Portability: the decision hash is the md5 HEX STRING of `seed:id`
 * compared lexicographically — the same construction dd3/mm3 use — so an
 * independent DuckDB oracle derives the exact keep set (sm1/sm2 queries).
 * md5-vs-xxhash64 cost is irrelevant here: one hash per row on a filter
 * (not per token), dwarfed by the scan.
 */
object Sampling {

  /** Decision key: md5 hex of `seed:id` — uniform over the 16^32 hex space,
    * reproducible anywhere md5 exists. */
  private def decisionKey(idCol: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), idCol.cast("string")))

  /**
   * Seeded uniform sample keeping ~`fraction` of rows. A pure FILTER —
   * no shuffle, no RNG state, pushes down to the scan like any predicate —
   * and stable under repartitioning/retries. Threshold granularity is the
   * first 8 hex digits (2^-32; bias < 1 row per 4 billion).
   */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    if (fraction >= 1.0) df
    else df.filter(hashSamplePredicate(col(idCol), fraction, seed))
  }

  /** The keep-decision of [[hashSample]] as a standalone boolean Column —
    * usable inside arbitrary expressions and registered as the SQL function
    * `hash_sample(id, fraction, seed)`. `fraction >= 1.0` is `true`. */
  def hashSamplePredicate(id: Column, fraction: Double, seed: String): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    if (fraction >= 1.0) lit(true)
    else {
      // e.g. 0.25 -> "40000000" + 24 zeros: hex strings below it are
      // exactly the bottom quarter of the space (lexicographic == numeric
      // for fixed-width lowercase hex). Clamp to 0xFFFFFFFF: a fraction
      // within ~1 ulp of 1.0 otherwise rounds to exactly 2^32, whose %08x
      // is the 9-digit "100000000" and the 33-char threshold silently keeps
      // only ~1/16 of rows.
      val thr = f"${math.min((fraction * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x" + "0" * 24
      decisionKey(id, seed) < lit(thr)
    }
  }

  /**
   * Exactly `k` rows per stratum (fewer iff the stratum is smaller),
   * chosen by deterministic hashed order — a seeded shuffle-then-take-k
   * that every engine reproduces. One exchange, on the strata key
   * (`row_number` window; Spark plans the rank filter as WindowGroupLimit,
   * so partial top-k runs map-side before the shuffle).
   *
   * 100 TB posture: when strata are huge and `k` small, pre-thin with
   * [[hashSample]] at a safety factor (e.g. 10k/|stratum|) BEFORE the
   * window so the exchange carries candidates, not the corpus — the two
   * compose exactly (both order by the same decision key) as long as the
   * prefilter keeps ≥ k rows per stratum.
   */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       k: Int, seed: String = "graft"): DataFrame = {
    require(k > 0 && strataCols.nonEmpty)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(decisionKey(col(idCol), seed))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /**
   * Domain-mixture downsampling: the LARGEST subset whose per-domain row
   * counts sit in the exact ratio of `weights` (floor-rounded), chosen
   * deterministically by hashed order — "rebalance the corpus to 50% web /
   * 30% code / 20% books" as a pure function of the data.
   *
   * Take counts n_d per weighted domain, scale c = min_d(n_d / w_d) (the
   * binding domain keeps ~all its rows), target k_d = floor(c * w_d), then
   * keep each domain's first k_d rows by the [[hashSample]] decision key.
   * `weights` scale-invariant — only ratios matter (exactly so for
   * power-of-two rescalings, which are FP-exact; an arbitrary rescaling
   * can move a floor boundary by one row-per-domain at the ulp level);
   * domains outside `weights` are dropped; a weighted domain ABSENT from
   * the corpus makes the mixture infeasible → empty result (documented,
   * not an error).
   *
   * 100 TB shape: one tiny count agg (≤ |weights| rows collected — same
   * "tiny by construction" rule as the IVF centroid table), then ONE
   * exchange on the domain key for the per-domain top-k window (plans as
   * WindowGroupLimit: map-side partial top-k before the shuffle). For huge
   * domains, pre-thin with [[hashSample]] first — the same composition
   * contract as [[stratifiedSample]].
   *
   * Float contract (oracle-portability): c and k_d are IEEE-double
   * `n_d / w_d`, `min`, `c * w_d`, `floor` IN THAT ORDER, so an engine
   * recomputing the same sequence (DuckDB oracle sm4) lands on bit-equal
   * targets.
   */
  def mixtureSample(df: DataFrame, domainCol: String,
                    weights: Map[String, Double], idCol: String,
                    seed: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0), s"weights $weights")
    val inWeights = col(domainCol).isin(weights.keySet.toSeq: _*)
    val counts = df.filter(inWeights)
      .groupBy(domainCol).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = weights.map { case (d, w) => counts.getOrElse(d, 0L) / w }.min
    val ks = weights.map { case (d, w) => d -> math.floor(c * w).toLong }
    val kExpr = ks.foldLeft(lit(0L)) { case (acc, (d, k)) =>
      when(col(domainCol) === d, lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy(col(domainCol))
      .orderBy(decisionKey(col(idCol), seed))
    df.filter(inWeights)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= kExpr)
      .drop("_rn")
  }

  /**
   * Weighted sampling without replacement, deterministic — Efraimidis &
   * Spirakis 2006 ("Weighted random sampling with a reservoir", A-ES):
   * each row draws key ln(u)/w with u uniform in (0,1) and w > 0 its
   * weight; the k LARGEST keys are a without-replacement sample with
   * inclusion probability proportional to weight. The uniform is
   * hash-derived, u = (first-8-hex(md5(seed:id)) + 0.5) / 2³², so the
   * chosen set is a pure function of (seed, id, weight) — the same
   * lineage contract as [[hashSample]] — and (u + 0.5)/2³² is exactly
   * representable, so every engine computes the identical u.
   *
   * 100 TB shape: a pure projection (one md5 per ROW, not per token) +
   * TakeOrdered top-k — per-partition heaps, driver merge of k rows,
   * never a full sort, zero exchange before the take. Rows with
   * non-positive weight are excluded (A-ES precondition).
   *
   * Last-ulp caveat: ln() may differ across libms in the final ulp; that
   * reorders two rows only when their keys agree to ~2⁻⁵², which the
   * 2⁻³²-quantized u makes vanishingly unlikely off exact (u, w) ties —
   * and exact ties break on the id.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String = "graft"): DataFrame = {
    require(k > 0, s"k $k")
    val u = (conv(substring(decisionKey(col(idCol), seed), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    df.filter(col(weightCol) > 0)
      .withColumn("_aes", log(u) / col(weightCol).cast("double"))
      .orderBy(col("_aes").desc, col(idCol).asc)
      .limit(k)
      .drop("_aes")
  }

  /**
   * Temperature-scaled group rebalancing — the multilingual-pretraining
   * recipe (exponentiated sampling in mT5, Xue et al. 2021 §3.1, and
   * XLM-R, Conneau et al. 2020 §3): resample so group shares follow
   * p^alpha instead of p (alpha < 1 flattens head languages toward the
   * tail). This is the deterministic DOWNSAMPLING variant: target
   * weights w_g = n_g^alpha are derived from the observed counts, and
   * the result is the LARGEST subset hitting those ratios exactly —
   * [[mixtureSample]] with data-derived weights, so it inherits the
   * md5-decision-key lineage contract and the one-exchange
   * WindowGroupLimit plan.
   *
   * Determinism: the default alpha = 0.5 evaluates through sqrt
   * (correctly rounded in IEEE 754 — bit-portable across engines, which
   * pow(x, alpha) is not); other alphas go through pow and carry a
   * last-ulp caveat at floor boundaries. The count table collected to
   * compute weights is ≤ |groups| rows — tiny by construction.
   */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(groupCol).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = counts.map { case (g, n) =>
      g -> (if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha))
    }
    if (weights.isEmpty) df.limit(0)
    else mixtureSample(df, groupCol, weights, idCol, seed)
  }

  /**
   * Deterministic train/val/test splitting — every corpus ships with one:
   * each row is assigned the split whose half-open hash-range contains
   * its decision key, with ranges laid out in the caller's insertion
   * order and sized by the (normalized) weights. A pure PROJECTION of
   * (seed, id) — zero shuffle, pushdown-able when filtered to one split,
   * repartition/retry/engine-invariant, and membership never changes
   * when rows are added or removed (the property random splits lose and
   * the reason eval sets silently contaminate training runs). Fractions
   * are proportional in expectation (2⁻³² threshold granularity), not
   * exact-count — exact-count needs a rank (see [[shardShuffle]]); at
   * corpus scale the distinction is noise, and stability under
   * append/delete is worth far more.
   */
  def assignSplits(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                   seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0), s"splits $splits")
    val total = splits.map(_._2).sum
    // cumulative upper thresholds in the 2^32 key space; final boundary
    // pinned to the space's end so rounding never drops the last sliver
    val uppers = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val bounds = uppers.init.map(u =>
      f"${math.min((u * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x" + "0" * 24)
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val expr = splits.init.zip(bounds).reverse.foldLeft(
      lit(splits.last._1): Column) { case (acc, ((name, _), b)) =>
      when(key < lit(b), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /**
   * Deterministic corpus shuffle + sharding — the final stage of every
   * pretraining data pipeline ("globally shuffle the corpus, write N
   * shards"). Each row gets `shard` in [0, numShards) and `pos`, its
   * 0-based position within the shard; reading shards in order and rows by
   * `pos` yields a seeded pseudo-random permutation of the corpus that is
   * a pure function of (seed, id) — reproducible across engines, partition
   * counts, and retries, so the training-example order is auditable
   * lineage, never an execution accident (a naive `ORDER BY rand()` is
   * neither stable nor resumable).
   *
   * Shard = first-8-hex of the decision key mod numShards (uniform, so
   * shards balance to ~|corpus|/numShards ± sqrt); intra-shard order is
   * the full 32-hex key (id tiebreak). Shard and position both derive from
   * the SAME md5, so one hash per row total.
   *
   * 100 TB shape: ONE exchange (hash on `shard`) + an external sort per
   * shard for the position window — never a global sort (a global
   * `ORDER BY` range-partitions and resorts the entire corpus; this sorts
   * each shard independently). `numShards` is the parallelism/size knob:
   * at 100 TB pick shards of a few GB (tens of thousands of shards), so
   * each per-shard sort is small and the downstream
   * `write.partitionBy("shard")` emits bounded files. numShards >= the
   * cluster's cores keeps every executor busy.
   */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int,
                   seed: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards $numShards")
    val key = decisionKey(col(idCol), seed)
    // first 8 hex digits < 2^32, so the cast is non-negative and % == pmod
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long")
      % numShards).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(key.asc, col(idCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }
}
