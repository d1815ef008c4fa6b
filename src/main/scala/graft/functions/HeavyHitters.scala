package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Misra-Gries heavy-hitters sketch as a typed Aggregator (SURVEY §2.5
  * UDAF surface): k counters of constant size, mergeable partials.
  *
  * Guarantees (public results — Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *   - every item with true frequency > n/(k+1) is present in the sketch;
  *   - estimates UNDERcount: est ≤ true ≤ est + n/(k+1) — and the bound
  *     holds under ANY merge tree, so Spark's partial-aggregation order
  *     never breaks it (the per-counter values may differ run to run,
  *     which is why the sketch itself is benched, not oracle-gated —
  *     the q_hll_only device).
  *
  * The buffer is a plain MapType (catalyst-serializable, no kryo), so the
  * shuffled state per group is ≤ k entries at any input size.
  */
object HeavyHitters {

  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      // NULL tokens carry no frequency information and a null Map key is
      // unrepresentable in Catalyst MapType (buffer serialization would
      // throw) — skip them, exactly like COUNT(col) skips nulls
      if (a == null) b
      else if (b.contains(a)) b.updated(a, b(a) + 1L)
      else if (b.size < k) b.updated(a, 1L)
      // buffer full and the item is new: the MG step — decrement every
      // counter, dropping zeros (charges 1 to k+1 distinct items at once)
      else b.collect { case (t, c) if c > 1L => t -> (c - 1L) }

    override def merge(l: Map[String, Long],
        r: Map[String, Long]): Map[String, Long] = {
      val sum = (l.keySet ++ r.keySet).iterator
        .map(t => t -> (l.getOrElse(t, 0L) + r.getOrElse(t, 0L))).toMap
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everyone (Agarwal et
        // al. merge) — at most k survivors, error adds sub-linearly
        val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
  }

  /** Column form: Misra-Gries sketch of `tok` with k counters. */
  def misraGries(tok: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(tok)

  /** Re-aggregates FINISHED Misra-Gries sketches (Map columns) into one —
    * the rollup path: per-cell sketches persist, any coarser grain merges
    * them without rescanning tokens. Same Agarwal et al. merge as the
    * partial tree, so the merged summary keeps the mergeable-summaries
    * bound: est ≤ true ≤ est + n_total/(k+1) for the COMBINED stream.
    */
  class MergeMG(k: Int)
      extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    private val inner = new MisraGries(k)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long],
        a: Map[String, Long]): Map[String, Long] =
      if (a == null) b else inner.merge(b, a)
    override def merge(l: Map[String, Long],
        r: Map[String, Long]): Map[String, Long] = inner.merge(l, r)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
  }

  /** Column form: merge a column of finished MG sketches into one. */
  def mergeSketches(sketch: Column, k: Int): Column =
    udaf(new MergeMG(k)).apply(sketch)
}
