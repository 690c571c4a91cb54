package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed custom aggregate
  * (SURVEY.md §2.10 "custom aggregate" extension point) — the scale
  * path for "top terms over the corpus" (t5): a bounded-memory,
  * MERGEABLE summary, so Spark's partial aggregation ships one
  * `capacity`-entry map per partition through the shuffle instead of
  * one row per token occurrence.
  *
  * Sketch state: at most `capacity` (term -> counter) entries.
  *  - reduce: increment the term's counter; if absent and the map is
  *    full, decrement ALL counters by 1 and drop zeros (the classic
  *    Misra–Gries step — each decrement "cancels" capacity+1 distinct
  *    occurrences, which bounds undercount by N/(capacity+1)).
  *  - merge: sum counters pairwise; if the union exceeds capacity,
  *    subtract the (capacity+1)-th largest counter from every entry
  *    and keep the strictly-positive ones (Agarwal et al., "Mergeable
  *    Summaries", PODS'12 — preserves the same error bound).
  *
  * Guarantees (N = total occurrences seen):
  *  - estimate <= true count, undercount <= N/(capacity+1);
  *  - every term with true count > N/(capacity+1) is present;
  *  - EXACT (estimate == true count, all terms present) whenever the
  *    number of distinct terms never exceeds `capacity` — no decrement
  *    ever fires. The oracle gate runs in that regime; the lossy
  *    regime is spec-tested against the bounds above.
  *
  * Reference analog: the engine's "top terms" views (irstats2
  * `View/Table.pm:37-90` order-by-sum-desc over the full group-by);
  * the sketch gives the same heavy hitters without materializing the
  * full term dictionary when the dictionary itself is shuffle-scale.
  */
class FrequentItems(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive: $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] = {
    if (term == null) return b
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1L)
      case None if b.size < capacity => b.updated(term, 1L)
      case None =>
        // decrement-all: term's implicit +1 and one unit of every
        // stored counter cancel; zeros leave the sketch
        b.iterator.map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L).toMap
    }
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val (small, large) = if (x.size < y.size) (x, y) else (y, x)
    val summed = small.foldLeft(large) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest counter from everything;
      // exactly the entries above it survive
      val cut = summed.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      summed.iterator.map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
