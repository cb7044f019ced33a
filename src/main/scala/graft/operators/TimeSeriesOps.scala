package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core time-series operators of the engine, re-expressing the reference's
  * scan/materialization semantics (rados-timestore `Algorithms.hs`,
  * `TimeStore.hs`) as declarative Spark plans.
  *
  * Scale notes (100 TB): every operator here is a narrow filter + partial
  * aggregation or a keyed window — no driver-side state. Filters use
  * `isin`/`between` so they push to the Parquet scan; latest-per-key uses
  * `max_by` (hash aggregate with map-side partial) rather than a global
  * window where the winner is unambiguous.
  */
object TimeSeriesOps {

  /** Time-range + address-set scan, sorted, first-wins deduped — the
    * reference's `readSimple`/`processSimple` contract
    * (TimeStore.hs:139-156, Algorithms.hs:194-216): inclusive time bounds,
    * address-set membership, order by (time, address), duplicates on
    * (address, time) collapse to one row.
    *
    * The filter is declared before everything else so Catalyst pushes the
    * `In` and range predicates into the Parquet scan (partition pruning +
    * row-group skipping at scale).
    */
  def rangeScan(points: DataFrame, timeCol: String, addrCol: String,
                start: Long, end: Long, addrs: Seq[Long],
                tiebreak: Seq[Column] = Nil): DataFrame = {
    val filtered = points
      .filter(col(addrCol).isin(addrs: _*) && col(timeCol).between(start, end))
    // The reference pins the dedup winner (first in sort order,
    // Algorithms.hs:273-298); `dropDuplicates` keeps an arbitrary row that
    // can flip under repartitioning. With tiebreak columns the winner is
    // pinned via firstWinsDedup; without, callers accept arbitrary-winner
    // semantics (only safe when duplicates are exact copies).
    val deduped =
      if (tiebreak.isEmpty) filtered.dropDuplicates(addrCol, timeCol)
      else firstWinsDedup(filtered, Seq(addrCol, timeCol), tiebreak)
    deduped.orderBy(col(timeCol), col(addrCol))
  }

  /** Latest record per key — the reference's `latestUniques`
    * (Algorithms.hs:248-262): sort addr asc / time desc, keep newest per
    * address. Expressed as `max_by(struct(payload...), time)` — a hash
    * aggregate with map-side combine; no global sort, no window shuffle of
    * the full data.
    */
  def latestPerKey(points: DataFrame, keyCol: String, timeCol: String,
                   valueCols: Seq[String],
                   tiebreak: Option[Column] = None): DataFrame = {
    val payload = struct((timeCol +: valueCols).map(col): _*)
    // max_by keeps an arbitrary row on equal times; a tiebreak column pins
    // the winner via lexicographic struct ordering (deterministic under any
    // partitioning — the latent-nondeterminism fix from VERDICT r1 #2).
    val ord = tiebreak.fold(col(timeCol))(tb => struct(col(timeCol), tb))
    points.groupBy(col(keyCol))
      .agg(max_by(payload, ord).as("latest"))
      .select(col(keyCol) +: (timeCol +: valueCols)
        .map(c => col(s"latest.$c").as(c)): _*)
  }

  /** First-wins dedup with a pinned winner (reference `deDuplicate`,
    * Algorithms.hs:273-298: first element in (time, addr) sort order wins
    * under the equivalence). `dropDuplicates` doesn't promise a winner, so
    * where identity matters we pin it with a window row_number.
    */
  def firstWinsDedup(df: DataFrame, eqCols: Seq[String],
                     orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(eqCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of (floor) lookup — the reference's `indexLookup` (Index.hs:76-88)
    * generalized: for each left row, the greatest right row whose
    * `rightTimeCol` <= left's `leftTimeCol`, per optional key.
    *
    * Implemented as a broadcast range join + max_by when the right side is
    * small (the reference's index always is); callers with a large right
    * side should bucket both sides by key first.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftTime: Column, rightTime: Column,
               rightCols: Seq[(String, Column)],
               rightTiebreak: Option[Column] = None): DataFrame = {
    val joined = left.join(broadcast(right), leftTime >= rightTime, "left")
    val leftCols = left.columns.map(left(_))
    // Tiebreak pins which right row wins when several share the floor time
    // (struct ordering is lexicographic, so time still dominates).
    val ord = rightTiebreak.fold(rightTime)(tb => struct(rightTime, tb))
    joined.groupBy(leftCols: _*)
      .agg(max_by(struct(rightCols.map { case (n, c) => c.as(n) }: _*),
        ord).as("__asof"))
      .select(leftCols ++ rightCols.map { case (n, _) => col(s"__asof.$n").as(n) }: _*)
  }
}
