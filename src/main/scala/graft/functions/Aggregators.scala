package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, when}

/** Typed custom aggregators (SURVEY §2.5: the reference has no UDAF surface;
  * this is the Spark-native extension point for one). An Aggregator's
  * reduce/merge run map-side before the shuffle — the same partial/final
  * split Spark's built-ins get, so a custom aggregate costs one shuffle of
  * |groups| rows at any scale.
  */
object Aggregators {

  /** Weighted mean: sum(x*w)/sum(w). The buffer is a pair of doubles, so the
    * shuffled state per group is 16 bytes regardless of input size. Merge is
    * associative+commutative — safe under any partial-aggregation order
    * (values are rounded at output like every double aggregate here).
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(l: (Double, Double), r: (Double, Double)): (Double, Double) =
      (l._1 + r._1, l._2 + r._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: weighted mean of `x` with weight `w`. Rows where either
    * side is NULL are SKIPPED (mapped to the (0, 0) no-op pair — a weight
    * of zero contributes to neither sum), matching SQL aggregate
    * semantics: the primitive (Double, Double) input encoder cannot
    * represent null, so an unguarded null column would fail
    * deserialization instead of being ignored.
    */
  def weightedMean(x: Column, w: Column): Column = {
    val (xd, wd) = (x.cast("double"), w.cast("double"))
    val ok = xd.isNotNull && wd.isNotNull
    udaf(WeightedMean).apply(
      when(ok, xd).otherwise(lit(0.0)), when(ok, wd).otherwise(lit(0.0)))
  }
}
