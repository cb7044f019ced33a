package graft.core

/** Epoch → bucket-count index: the reference's `Index`
  * (`lib/TimeStore/Index.hs:37`), one per point kind per namespace. Each
  * entry `(epoch, buckets)` says: from time `epoch` onward the namespace has
  * `buckets` hash buckets.
  *
  * Lookup semantics (`Index.hs:76-88`): the epoch for time `t` is the
  * greatest entry strictly earlier than `t`; if none exists (or `t` equals
  * the leftmost entry) the first entry applies. Note the strictness — a
  * point at exactly an epoch boundary belongs to the *previous* epoch, which
  * is what makes rollover at `latest_time` safe (`StoreHelpers.hs:227-231`:
  * every point seen so far is ≤ latest, so lands strictly before the new
  * epoch).
  *
  * All times/epochs are unsigned Word64 in signed Longs.
  */
final case class EpochIndex(entries: Vector[(Long, Int)]) {
  require(entries.nonEmpty, "index must have at least one entry")
  require(entries.map(_._1).sliding(2).forall(
    p => p.length < 2 || java.lang.Long.compareUnsigned(p(0), p(1)) < 0),
    "index entries must be strictly increasing by epoch")

  /** Greatest entry with epoch strictly < t; first entry if none. */
  def epochFor(t: Long): (Long, Int) = {
    val earlier = entries.takeWhile(e => ltU(e._1, t))
    if (earlier.isEmpty) entries.head else earlier.last
  }

  /** Entries whose buckets can hold points in `[start, end]`: from the
    * floor entry of `start` through the floor entry of `end`. Unlike the
    * reference's `rangeLookup` (`Index.hs:90-95`) this includes an entry at
    * exactly `start` — a point at `start+1` routes there, so excluding it
    * would skip live buckets. */
  def rangeEntries(start: Long, end: Long): Vector[(Long, Int)] = {
    val floor = epochFor(start)._1
    entries.filter(e => !ltU(e._1, floor) && ltU(e._1, end) || e._1 == floor)
  }

  /** The entry in force now (`indexLookup maxBound`). */
  def latestEntry: (Long, Int) = entries.last

  def append(epoch: Long, buckets: Int): EpochIndex =
    if (entries.exists(_._1 == epoch)) this
    else EpochIndex(entries :+ (epoch, buckets))

  private def ltU(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0
}

object EpochIndex {
  /** Hash placement (`Core.hs:272-276`): clear address bit 0 (so an extended
    * point and its pointer colocate and the kind flag doesn't perturb the
    * hash), then unsigned mod the bucket count. */
  def placeBucket(maxBuckets: Int, address: Long): Int =
    java.lang.Long.remainderUnsigned(address & ~1L, maxBuckets.toLong).toInt

  /** Route a point to its (epoch, bucket) (`Index.hs:70-74`). */
  def locate(idx: EpochIndex, time: Long, address: Long): (Long, Int) = {
    val (epoch, buckets) = idx.epochFor(time)
    (epoch, placeBucket(buckets, address))
  }

  def seed(buckets: Int): EpochIndex = EpochIndex(Vector((0L, buckets)))
}
