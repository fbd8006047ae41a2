package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch as a relational construction: a `depth × width`
  * counter table built with ONE hash-bucket aggregation, answering
  * point frequency queries with `est = min over rows of
  * counter[row][bucket(key, row)]` — always an over-estimate, error
  * ≤ ε·N with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉
  * (Cormode & Muthukrishnan 2005).
  *
  * Scale posture: the sketch build is a single `groupBy(row, bucket)`
  * count — map-side combine collapses each task's contribution to at
  * most `depth·width` cells before the shuffle, so the exchanged
  * volume is O(tasks · depth · width), independent of corpus size.
  * That is the whole point at 100 TB: token/key frequency estimation
  * whose shuffle does not grow with the data. Because cell counts are
  * sums, the sketch is merge-order-independent — fully deterministic
  * under any partitioning (unlike Misra–Gries style summaries, whose
  * contents depend on merge order).
  *
  * Hashing: h1 = first 8 md5 hex chars of the key (engine-portable,
  * same parse the minhash family uses — `Dedup` mixes), then
  * `bucket_i = ((h1·A_i + B_i) mod 2³¹) mod width` per sketch row.
  */
object Sketches {

  /** 31-bit base hash of a string column (engine-portable md5 parse). */
  def baseHash(key: Column): Column =
    conv(substring(md5(encode(key, "UTF-8")), 1, 8), 16, 10)
      .cast("long") % Dedup.mixM

  /** Bucket of `h1` in sketch row `row` (affine mix mod width). */
  def bucket(h1: Column, row: Int, width: Int): Column =
    (h1 * Dedup.mixA(row) + Dedup.mixB(row)) % Dedup.mixM % width

  /** Build the sketch over a string key column: one row per non-empty
    * counter cell, `(cms_row, cms_bucket, cnt)`. */
  def countMin(items: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val h1 = baseHash(col(keyCol))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("cms_row"), bucket(h1, r, width).as("cms_bucket"))): _*)
    items
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.cms_row").as("cms_row"),
        col("cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Affine mix of a NON-NEGATIVE integer key into [0, m): the
    * integer-key twin of [[bucket]] (no md5 parse when the key is
    * already a bounded integer — e.g. an order/doc id). The key is
    * reduced mod 2³¹ first so the multiply stays < 2⁶² (same
    * engine-portability guard as `Deterministic.hrand`). */
  def intBucket(key: Column, row: Int, m: Long): Column =
    (key % Dedup.mixM * Dedup.mixA(row) + Dedup.mixB(row)) % Dedup.mixM % m

  /** SQL rendering of [[intBucket]] — `m` is a SQL expression so the
    * oracle can size the filter from the same metadata-level count the
    * engine uses (scalar subquery), not a baked-in literal. */
  def intBucketSql(key: String, row: Int, m: String): String =
    s"((($key % ${Dedup.mixM}) * ${Dedup.mixA(row)} + ${Dedup.mixB(row)}) % ${Dedup.mixM}) % ($m)"

  /** Bloom filter as a relational bit set: the DISTINCT positions
    * (`bloom_bit`) set by `numHashes` affine mixes of every build-side
    * key. Row count ≤ min(numHashes·|keys|, numBits) — a runtime
    * filter is only worth building from a selective (dimension-sized)
    * side, so the set broadcasts by construction. `numBits` should be
    * sized from metadata-level counts (c·|build| for c ≈ 8–16 bits
    * per key) so the filter does not saturate as the build side grows.
    */
  def bloomBits(keys: DataFrame, keyCol: String, numBits: Long,
      numHashes: Int): DataFrame = {
    val positions = array((0 until numHashes).map(r =>
      intBucket(col(keyCol), r, numBits)): _*)
    keys.select(explode(positions).as("bloom_bit")).distinct()
  }

  /** Runtime-filter prune — the engine-level analog of Spark's own
    * row-level runtime filtering: keep fact rows whose key COULD be in
    * the build set, i.e. all `numHashes` positions present in `bits`.
    * One broadcast LEFT SEMI join per hash row, so the fact side is
    * never shuffled and never row-amplified; no false negatives are
    * possible, and the hash-collision false positives this over-keeps
    * are exactly what the downstream real join removes (audited by
    * `sketch_bloom_prune`). At 100 TB this is the difference between
    * shuffling the full fact table into a join and shuffling only the
    * ~selectivity fraction that can match. */
  def bloomPrune(facts: DataFrame, keyCol: String, bits: DataFrame,
      numBits: Long, numHashes: Int): DataFrame =
    (0 until numHashes).foldLeft(facts) { (f, r) =>
      f.join(broadcast(bits),
        intBucket(f(keyCol), r, numBits) === bits("bloom_bit"), "left_semi")
    }

  /** [[countMin]] over a NON-NEGATIVE integer key column: the affine
    * [[intBucket]] mixes replace the md5 parse (cheaper, and exactly
    * SQL-replayable via [[intBucketSql]]). Same one-aggregation build,
    * same O(tasks · depth · width) shuffle bound. */
  def countMinInt(items: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("cms_row"),
        intBucket(col(keyCol), r, width).as("cms_bucket"))): _*)
    items
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.cms_row").as("cms_row"),
        col("cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join-size estimate from two count–min sketches (built with the
    * SAME depth/width/hash family): the equi-join cardinality
    * |A ⋈ B on key| = Σ_k f_A(k)·f_B(k) is estimated as
    * `min over rows of Σ_bucket cntA·cntB` — the AMS/CMS inner-product
    * estimator (always ≥ the true size; collision inflation ≤ N_A·N_B /
    * width per row, driven to the true value as width passes the
    * distinct-key count). Passing the same sketch twice estimates a
    * self-join size (F₂) — the classic skew statistic. The whole
    * estimate touches only `depth·width` cells — THE way to size a
    * 100 TB join (shuffle width, skew strategy, broadcast viability)
    * without scanning either input a second time. Returns one row:
    * `n_est`. A sketch row with NO overlapping buckets has inner
    * product 0 — it simply produces no join rows — so fewer than
    * `depth` surviving rows means the true estimate is 0 (also covers
    * an empty input side). */
  def joinSizeEstimate(cmsA: DataFrame, cmsB: DataFrame, depth: Int): DataFrame = {
    val b = cmsB.select(col("cms_row"), col("cms_bucket"), col("cnt").as("cnt_b"))
    cmsA.join(b, Seq("cms_row", "cms_bucket"))
      .groupBy("cms_row")
      .agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(min(col("ip")).as("mn"), count(lit(1)).as("nr"))
      .select(when(col("nr") < depth, lit(0L)).otherwise(col("mn"))
        .cast("long").as("n_est"))
  }

  /** HyperLogLog distinct-count per group (Flajolet et al. 2007):
    * 2^b registers, register j keeps the max "rank" (leading-zero count
    * + 1 of the hash suffix) of any key landing in it; the harmonic-
    * mean estimate `α·m²/Σ2^(−M_j)` reads distinct counts from O(m)
    * integers per group — the constant-state complement of the KMV
    * sketch (KMV: exact under k, ~1/√k error, mergeable by sorted
    * merge; HLL: fixed 2^b bytes, ~1.04/√m error, mergeable by
    * register-wise max). Linear counting takes over below 2.5·m when
    * empty registers remain (the standard small-range correction).
    *
    * Hashing: the md5-based [[baseHash]] over the STRINGIFIED key —
    * leading-zero statistics need uniform low bits, which the affine
    * [[intBucket]] mix family does NOT provide (measured: LCG low-bit
    * structure biases the estimate +35%; md5 lands on the theoretical
    * ~1.04/√m). Rank arithmetic is all-integer (an unrolled bit-length
    * CASE, no log2), and Σ2^(−M_j) is a sum of ≤ m dyadic rationals —
    * EXACT in a double in any order — so the estimate is deterministic
    * across engines and partitionings.
    *
    * Scale shape: one groupBy(group, register) max — map-side combine
    * caps the shuffle at O(tasks · m) rows per group family — then an
    * m-row-per-group roll-up. Output: (groupCol, hll_est DOUBLE,
    * un-rounded). */
  /** HLL bias-correction constant α_m: the canonical small-m constants
    * from Flajolet et al. (0.673 / 0.697 / 0.709 for m = 16/32/64) and
    * the asymptotic formula 0.7213/(1 + 1.079/m) for m ≥ 128 — the
    * formula alone under-reads ~0.5% at m = 64. Shared by the operator
    * and the QScale SQL leg so both engines estimate identically. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  def hyperLogLog(items: DataFrame, groupCol: String, keyCol: String,
      b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"hyperLogLog needs 4 <= b <= 16, got $b")
    val m = 1 << b
    val wBits = 31 - b
    val bitsCase = "CASE " + (wBits - 1 to 0 by -1)
      .map(k => s"WHEN w >= ${1L << k} THEN ${k + 1}").mkString(" ") + " ELSE 0 END"
    val amm = hllAlpha(m) * m * m
    val estCase =
      s"CASE WHEN CAST($amm AS DOUBLE) / denom <= 2.5 * $m AND v0 > 0 " +
        s"THEN $m * ln(CAST($m AS DOUBLE) / v0) " +
        s"ELSE CAST($amm AS DOUBLE) / denom END"
    val rk = items
      .select(col(groupCol), baseHash(col(keyCol).cast("string")).as("hv"))
      .select(col(groupCol), expr(s"hv div ${1L << wBits}").as("reg"),
        expr(s"hv % ${1L << wBits}").as("w"))
      .groupBy(groupCol, "reg")
      .agg(max(expr(s"${wBits + 1} - ($bitsCase)")).as("mr"))
    val grid = rk.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(expr(s"sequence(0, ${m - 1})")).as("reg"))
    grid.join(rk, Seq(groupCol, "reg"), "left")
      .select(col(groupCol), coalesce(col("mr"), lit(0)).as("mr"))
      .groupBy(groupCol)
      .agg(sum(expr("pow(2.0, -mr)")).as("denom"),
        sum(when(col("mr") === 0, 1L).otherwise(0L)).as("v0"))
      .select(col(groupCol), expr(estCase).as("hll_est"))
  }

  /** Estimate each probe key's frequency from a built sketch: the probe
    * frame gains `n_est = min over rows of the probed cells`. The join
    * is probes×depth against depth·width cells — broadcast-sized on
    * the sketch side by construction. LEFT join + coalesce(0): a cell
    * no key hashed into is absent from the counter table but counts as
    * zero, so a never-seen probe key correctly estimates 0 instead of
    * minimizing over only its collided cells. */
  def estimate(cms: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val h1 = baseHash(col(keyCol))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("cms_row"), bucket(h1, r, width).as("cms_bucket"))): _*)
    val probed = probes
      .withColumn("cell", explode(cells))
      .select(probes.columns.map(col) :+ col("cell.cms_row").as("cms_row")
        :+ col("cell.cms_bucket").as("cms_bucket"): _*)
    probed
      .join(broadcast(cms), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
