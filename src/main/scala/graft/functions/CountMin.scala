package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftx.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, Encoder}

/** Count-Min sketch as a typed Aggregator (SURVEY §2.5 UDAF surface) —
  * the point-frequency complement of [[HeavyHitters]]: where Misra-Gries
  * keeps the identity of the heavy items, Count-Min answers "how often
  * did THIS token occur" for any token, from d·w counters regardless of
  * vocabulary size (Cormode & Muthukrishnan 2005, public result).
  *
  * Guarantees carried into the oracle gate:
  *   - estimates OVERcount: true ≤ est (always, deterministically — a
  *     counter only ever receives additions);
  *   - est ≤ true + εN with probability 1−δ where ε = e/w, δ = e^(−d)
  *     — probabilistic over the hash choice, but the hashes here are
  *     FIXED (murmur3 with row-indexed seeds), so for a given dataset
  *     the estimate is one deterministic number.
  *
  * Merge is element-wise integer addition — commutative and associative,
  * so Spark's partial-aggregation tree can combine partitions in ANY
  * order and the final sketch is bit-identical. That makes the estimate
  * itself gateable (unlike Misra-Gries, whose per-counter values are
  * merge-tree-dependent), and it is exactly the property that lets a
  * 100 TB corpus keep one 16 KB sketch per partition and re-aggregate
  * without a second scan.
  *
  * The buffer is a flat Array[Long] of d rows × w columns (row-major).
  * With the defaults d=4, w=512 that is 16 KB of shuffled state per
  * group at ANY input size.
  */
object CountMin {

  /** Row-i counter index for a token: murmur3(token, seed=i) mod w.
    * MurmurHash3.stringHash is pure JVM arithmetic over the UTF-16 chars
    * — platform-independent and stable across Spark versions, unlike
    * String.hashCode-based schemes that differ in sign handling. */
  def slot(tok: String, row: Int, w: Int): Int = {
    val h = MurmurHash3.stringHash(tok, row * 0x9e3779b9 + 1)
    ((h % w) + w) % w
  }

  class Sketch(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(d > 0 && w > 0, s"count-min needs positive dims, got d=$d w=$w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], a: String): Array[Long] = {
      // nulls carry no frequency information — skip like COUNT(col)
      if (a != null) {
        var i = 0
        while (i < d) { b(i * w + slot(a, i, w)) += 1L; i += 1 }
      }
      b
    }

    override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
      var i = 0
      while (i < l.length) { l(i) += r(i); i += 1 }
      l
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Point query against a finished sketch: min over the d row counters
    * — the standard CM estimate. Pure function of (sketch, token), so it
    * runs executor-side against a broadcast 1-row sketch frame; the
    * sketch never needs to come back to the driver. */
  def estimate(sketch: Seq[Long], tok: String, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = sketch(i * w + slot(tok, i, w))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Column form: Count-Min sketch of `tok` with d rows × w columns. */
  def countMin(tok: Column, d: Int, w: Int): Column =
    udaf(new Sketch(d, w)).apply(tok)

  /** Column form of [[estimate]] as a native expression — keeps the probe
    * side inside Catalyst (the repo's only remaining scalar UDF outside the
    * reference-mandated ST_* pair lived here).
    */
  def cmsEstimate(sketch: Column, tok: Column, d: Int, w: Int): Column =
    column(CmsEstimate(expression(sketch), expression(tok), d, w))
}

/** Native point-query twin of [[CountMin.estimate]]: min over the d
  * row counters of a finished sketch for one token. Same arithmetic
  * ([[CountMin.slot]] — murmur3 with row-indexed seeds), one tight loop
  * per row instead of a boxed Scala udf call. Deterministic pure function
  * of (sketch, token): retry/AQE-safe.
  */
case class CmsEstimate(left: Expression, right: Expression, d: Int, w: Int)
    extends BinaryKernelCodegen {
  require(d > 0 && w > 0, s"count-min needs positive dims, got d=$d w=$w")
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, tok: Any): Any =
    kernel(sketch.asInstanceOf[ArrayData],
      tok.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def kernel(arr: ArrayData, tok: org.apache.spark.unsafe.types.UTF8String): Long = {
    // dims are caller-supplied and independent of the sketch column: a d/w
    // whose product disagrees with the sketch's construction would
    // otherwise read out of bounds mid-task. (A transposed pair with the
    // SAME product still passes — indistinguishable from the data alone —
    // and returns wrong estimates; only the caller knows the layout.)
    require(arr.numElements() == d * w,
      s"count-min sketch has ${arr.numElements()} counters, expected d*w = ${d * w} (d=$d, w=$w)")
    val t = tok.toString
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = arr.getLong(i * w + CountMin.slot(t, i, w))
      if (c < best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
