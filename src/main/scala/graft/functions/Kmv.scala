package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** K-minimum-values (KMV / bottom-k theta) sketch as a typed Aggregator —
  * the streaming-state form of the TopKPerKey-built sketches behind
  * q_theta_sketch (Beyer et al. 2007, the DataSketches theta family;
  * public results).
  *
  * State is the sorted DISTINCT array of the k smallest values seen —
  * ≤ k longs per group at ANY input size. The merge is set-union-keep-k,
  * which is commutative, associative AND idempotent (min-like, not
  * sum-like), so:
  *   - Spark's partial-aggregation tree can combine partitions in any
  *     order and the finished sketch is BIT-IDENTICAL;
  *   - a Structured Streaming groupBy holds one ≤k-long buffer per key
  *     whose content after any series of micro-batches equals the batch
  *     sketch over the same rows exactly (StreamingSpec pins this) —
  *     duplicate re-arrivals are no-ops, so replays don't distort it;
  *   - per-shard sketches roll up without rescan (q_theta_rollup's law).
  *
  * The estimator contract (evaluated by the CALLER from the finished
  * array): if the sketch holds fewer than k values it IS the whole
  * distinct set — the count is exact; otherwise distinct ≈ (k−1)·P/θ
  * with θ = the kth (largest retained) value of a hash uniform on [0, P).
  */
object Kmv {

  class Sketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, s"bottom-k needs k > 0, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, a)
      if (i >= 0) b // distinct-set semantics: re-arrival is a no-op
      else {
        val ins = -i - 1
        if (b.length < k) {
          val nb = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, nb, 0, ins)
          nb(ins) = a
          System.arraycopy(b, ins, nb, ins + 1, b.length - ins)
          nb
        } else if (ins < k) { // displaces the current kth value
          val nb = new Array[Long](k)
          System.arraycopy(b, 0, nb, 0, ins)
          nb(ins) = a
          System.arraycopy(b, ins, nb, ins + 1, k - ins - 1)
          nb
        } else b
      }
    }

    override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
      // two-pointer sorted-union keeping the k smallest, duplicates once
      val cap = math.min(k, l.length + r.length)
      val buf = new Array[Long](cap)
      var i = 0; var j = 0; var n = 0
      while (n < cap && (i < l.length || j < r.length)) {
        buf(n) =
          if (j >= r.length) { val x = l(i); i += 1; x }
          else if (i >= l.length) { val x = r(j); j += 1; x }
          else if (l(i) < r(j)) { val x = l(i); i += 1; x }
          else if (l(i) > r(j)) { val x = r(j); j += 1; x }
          else { val x = l(i); i += 1; j += 1; x } // equal: once
        n += 1
      }
      if (n == cap) buf else java.util.Arrays.copyOf(buf, n)
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column form: sorted distinct bottom-k of `v` (a LongType column). */
  def bottomK(v: Column, k: Int): Column =
    udaf(new Sketch(k)).apply(v)
}
