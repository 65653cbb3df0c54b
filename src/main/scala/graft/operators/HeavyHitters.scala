package graft.operators

import scala.collection.mutable

/** Misra-Gries frequent-items summaries — the mergeable deterministic
  * heavy-hitter sketch a 100 TB term-frequency pass runs INSTEAD of a
  * full-vocabulary shuffle.
  *
  * Contract (the classic MG guarantee): a summary of width `k` built
  * over a stream of `n` items undercounts any item by at most
  * `n / (k + 1)`, and therefore CONTAINS every item whose true
  * frequency exceeds `n / (k + 1)`. Summaries over disjoint partitions
  * are combined by per-key count addition; because the per-partition
  * slack terms `n_p / (k + 1)` sum to `n / (k + 1)`, the UNION of
  * per-partition summaries still contains every globally-heavy item —
  * an item heavier than `n / (k + 1)` overall must be heavier than
  * `n_p / (k + 1)` in at least one partition. That superset property is
  * what makes the two-pass plan in `ns_sketch_heavy_hitters`
  * DETERMINISTIC even though each partition's summary depends on input
  * order: pass 1 produces a (possibly partition-dependent) candidate
  * superset of bounded size <= k * numPartitions, pass 2 recounts ONLY
  * the candidates exactly and applies the exact threshold, so
  * spurious candidates are filtered and true heavies are never missed.
  *
  * Reference analog: the reference's cache layer keeps hot-key counts in
  * Redis (`/root/reference/src/processor.ts:69`); this is the bounded-
  * memory distributed analog of that hot-key census.
  */
object HeavyHitters {

  /** One partition's Misra-Gries pass: at most `k` counters survive.
    * On an insert that would exceed `k` keys, every counter decrements
    * by one (zeros evicted) — the standard MG step. Returned counts are
    * LOWER bounds on the partition-local frequency (undercount at most
    * `n_p / (k + 1)`).
    */
  def mgPartition(k: Int)(it: Iterator[String]): Iterator[(String, Long)] =
    mgFold(k, Map.empty, it).iterator

  /** The MG step as a RESUMABLE fold: seed with carried counters, fold
    * the new segment, return the updated summary. Seeding with a prior
    * segment's counters makes the combined run EQUAL to one continuous
    * MG pass over the concatenation, so a streaming monitor that carries
    * the map in state keeps the classic guarantee over the whole stream
    * regardless of how micro-batches cut it.
    */
  def mgFold(k: Int, init: Map[String, Long],
      it: Iterator[String]): Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long] ++= init
    while (it.hasNext) {
      val t = it.next()
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement-all: amortized O(1) per input because each
          // decrement pays back a previous increment
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1L)
          }
          dead.foreach(m.remove)
      }
    }
    m.toMap
  }
}
