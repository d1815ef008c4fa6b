package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming surface over the `orders` table shape — the
  * survival-analysis spine as live state.
  *
  * The Kaplan-Meier / log-rank queries reduce the order stream to one
  * per-customer (first-order, last-order) row before anything else
  * touches it; min/max are associative+commutative partials, so that
  * state streams exactly (complete-mode aggregation, micro-batch cuts
  * cannot move it). The life TABLE itself — duration census, at-risk
  * pool, Ŝ(t) — recomputes census-sized from the state on demand
  * (Sessions.kmFromLife), which is the production shape: state scales
  * with customers (sharded by key across executors), the survival curve
  * is a ≤100-row read model. StreamingSpec proves streamed-state ==
  * batch and kmFromLife(state) == the gated q_kaplan_meier bit-for-bit.
  */
object OrdersStream {

  /** Per-customer life bounds as streaming state: same aggregation as
    * the batch spine (Sessions.custLife).
    */
  def custLife(orders: DataFrame): DataFrame =
    graft.queries.Sessions.custLife(orders)

  /** Daily order counts as streaming state — COUNT partials are integer
    * and associative, so streamed == batch BIT-exactly under any
    * micro-batch cuts; q_dispersion's read model
    * (TimeSeriesOps.dispersionFromDaily) runs over this state unchanged.
    */
  def dailyCounts(orders: DataFrame): DataFrame =
    graft.queries.TimeSeriesOps.dailyCounts(orders)

  /** The two columns the survival spine consumes (o_orderdate is
    * timezone-less TIMESTAMP on disk — NTZ, exactly as the batch
    * Tables() view serves it).
    */
  def readOrdersStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("o_custkey BIGINT, o_orderdate TIMESTAMP_NTZ")
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: the
      // spec's cut-invariance claim is only exercised with real cuts
      .parquet(dir)
}
