package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches over unbounded key domains — the
  * Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications").
  *
  * The sketch is a depth×width counter matrix; each row d hashes every key
  * through an independent hash and increments one counter. A point
  * estimate for key k is min over rows of counter[d][h_d(k)] — always ≥
  * the true count (one-sided error), within εN with probability 1−δ for
  * width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
  *
  * 100 TB shape: relationally a CMS is ONE hash aggregate over
  * (row, bucket) — depth×width cells regardless of corpus size — so it
  * rides Spark's map-side partial aggregation: every partition builds its
  * local sketch and the shuffle merges depth×width rows, not the key
  * domain. That counter-matrix aggregate IS the sketch-merge operation
  * (CMS merge = cell-wise sum), which is what makes it deployable as a
  * streaming accumulator or a per-shard heavy-hitter pre-filter.
  *
  * Hashing is the repo's cross-engine idiom: md5 of a salted key with the
  * hex PREFIX as the bucket id (strings, never parsed to ints — identical
  * UTF-8 md5 both engines), so the DuckDB twin recomputes the exact same
  * sketch cell-for-cell and the whole estimate is hash-gated, not just
  * its shape.
  */
object Sketches {

  /** Bucket id for sketch row `d`: `hexChars` hex chars of
    * md5("cm<d>:<key>") — width = 16^hexChars buckets. */
  private def bucket(d: Column, key: Column, hexChars: Int): Column =
    substring(md5(concat(lit("cm"), d.cast("string"), lit(":"),
      key.cast("string")).cast("binary")), 1, hexChars)

  /** The counter matrix: one row per (d, bucket) cell with its count.
    * One hash aggregate over rows×depth — map-side combined, cell-count
    * output. */
  def countMinCounters(df: DataFrame, keyCol: String, depth: Int,
                       hexChars: Int): DataFrame =
    df.select(col(keyCol).as("__key"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(col("d"), bucket(col("d"), col("__key"), hexChars).as("b"))
      .agg(count(lit(1)).as("c"))

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    * Beyer et al. 2007's unbiased (k−1)/U_(k) estimator): keep the k
    * lexicographically smallest md5 hashes of the distinct keys; the kth
    * smallest, read as a uniform fraction of the hash space, estimates
    * the distinct count. Unlike HLL the sketch is EXACTLY mergeable by
    * construction — the k smallest of a union is the k smallest of the
    * per-part k-smallest — and exactly deterministic (same md5 idiom as
    * the Count-Min twin, so DuckDB reproduces the estimate bit-for-bit,
    * where `approx_count_distinct`'s HLL could never be gated).
    *
    * `kmvMins` is one distinct + one top-k: TakeOrdered ships k hashes
    * per partition to the driver — k rows total out, never the key
    * domain. Pass `shards` > 1 to force the per-shard partial → merged
    * union shape (one window per shard side, identical result — the gate
    * runs this form so mergeability itself is hash-pinned against the
    * twin's direct form). */
  def kmvMins(df: DataFrame, keyCol: String, k: Int,
              shards: Int = 1): DataFrame = {
    val hs = df.select(
      md5(col(keyCol).cast("string").cast("binary")).as("h")).distinct()
    val pooled = if (shards <= 1) hs
    else {
      // per-shard k-min via one window pass, then pool the ≤ k·shards
      // survivors — the mergeable-accumulator path a 100 TB scan or a
      // streaming fold uses (k·shards rows cross the merge, never keys)
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(abs(hash(col("h"))) % shards)
        .orderBy(col("h"))
      hs.withColumn("r", row_number().over(w)).filter(col("r") <= k)
        .select(col("h"))
    }
    pooled.orderBy(col("h")).limit(k)
  }

  /** The estimate from a k-min set: (m−1) / U_(m) with U the kth-smallest
    * hash's leading-12-hex-digit fraction of the hash space — every
    * arithmetic step exact or correctly rounded identically in DuckDB
    * (16^12 = 2^48 and (m−1)·2^48 are exact doubles). When fewer than k
    * distinct hashes exist the sketch IS the distinct set and the answer
    * is exact. */
  def kmvEstimate(mins: DataFrame, k: Int): DataFrame =
    mins
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth"))
      .select(col("k_used"),
        round(
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(
              ((col("k_used") - 1L).cast("double") * lit(math.pow(16, 12))) /
                conv(substring(col("kth"), 1, 12), 16, 10).cast("double")),
          6).as("est_distinct"))

  /** Point estimates for the keys in `probes` (a SMALL frame with
    * `keyCol`): min over depth rows of the matching cell. The counter
    * matrix is depth×width rows — always broadcast. LEFT join + zero
    * fill: a probe key hashing to a cell no data touched must estimate
    * that row as 0 (the CMS answer for unseen keys), not silently drop
    * the row and over-estimate from the surviving cells (review
    * finding — latent while callers only probe keys drawn from the
    * sketched data). */
  def countMinEstimate(counters: DataFrame, probes: DataFrame,
                       keyCol: String, depth: Int, hexChars: Int): DataFrame = {
    val probed = probes.select(col("*"),
      explode(sequence(lit(0), lit(depth - 1))).as("d"))
    probed
      .join(broadcast(counters),
        probed("d") === counters("d") &&
          bucket(probed("d"), probed(keyCol), hexChars) === counters("b"),
        "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
  }
}
