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
