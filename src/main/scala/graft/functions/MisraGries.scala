package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory Misra-Gries frequent-items summary + the stream length.
  * `items` holds at most k-1 (candidate, residual-count) entries; `total`
  * is the exact number of items consumed — the quantity the caller needs
  * to certify the summary's coverage guarantee (see [[MisraGries]]).
  */
case class MgSummary(items: Map[String, Long], total: Long)

private[graft] case class MgBuf(var m: Map[String, Long], var n: Long)

/** Misra-Gries heavy-hitter sketch (Misra & Gries 1982) as a typed
  * `Aggregator` — the bounded-memory first pass of corpus-scale frequent-
  * item mining (boilerplate n-gram discovery at 100 TB): each executor
  * summarizes its partitions in at most k-1 counters, partial summaries
  * merge associatively (Agarwal et al. 2012, "Mergeable Summaries" §3:
  * pointwise sum, then subtract the k-th largest count and drop ≤ 0), so
  * the whole corpus reduces map-side like any declarative aggregate and
  * the driver receives ONE ≤ (k-1)-entry summary however large the input.
  *
  * Guarantees (exactly the mergeable-summary bounds):
  *  - estimate ≤ true count ≤ estimate + total/k  (undercount only);
  *  - every item with true count > total/k is PRESENT in the summary —
  *    so for a threshold T with k·T > total, the summary's key set is a
  *    superset of the true ≥ T heavy hitters (what
  *    `TextAnalysis.ngramHeavyHitters` recounts exactly in pass 2).
  *
  * NOT on any oracle hash surface itself: residual counts depend on merge
  * order. Only the candidate KEY SET is consumed downstream, and the
  * pass-2 exact recount makes the operator's output order-independent.
  */
class MisraGries(k: Int)
    extends Aggregator[String, MgBuf, MgSummary] with Serializable {
  require(k >= 2, "Misra-Gries needs k >= 2 counters")

  override def zero: MgBuf = MgBuf(Map.empty, 0L)

  override def reduce(b: MgBuf, x: String): MgBuf = {
    b.n += 1
    val m = b.m
    m.get(x) match {
      case Some(c) => b.m = m.updated(x, c + 1)
      case None if m.size < k - 1 => b.m = m.updated(x, 1L)
      case None =>
        // decrement-all: removes k counts (this item's + k-1 stored) —
        // amortized O(1) per item since each stored unit dies at most once
        b.m = m.iterator
          .collect { case (w, c) if c > 1 => (w, c - 1) }.toMap
    }
    b
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    var m = a.m
    b.m.foreach { case (w, c) => m = m.updated(w, m.getOrElse(w, 0L) + c) }
    if (m.size > k - 1) {
      // subtract the k-th largest count from every counter, drop ≤ 0:
      // at most k-1 survive and the ≤ total/k undercount bound is kept
      val d = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k - 1)
      m = m.iterator.collect { case (w, c) if c > d => (w, c - d) }.toMap
    }
    a.m = m
    a.n += b.n
    a
  }

  override def finish(b: MgBuf): MgSummary = MgSummary(b.m, b.n)

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
