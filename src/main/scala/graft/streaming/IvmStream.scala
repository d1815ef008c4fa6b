package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming incremental view maintenance — the `foreachBatch` twin of the
  * batch q_ivm_rollup (PipelineOps), closing the last
  * incremental-maintenance op without a streaming form (its sibling
  * q_cdc_merge gained [[CdcStream]] in round 10).
  *
  * The maintained view is the per-customer revenue rollup; each micro-batch
  * of order changes is folded to per-key (d_rev, d_n) deltas by the SAME
  * delta expression as the batch query, then merged into the rollup with
  * one full-outer join on the fine customer key — the base table is never
  * rescanned. At 100 TB each commit touches |changes| keys, not |base|
  * rows, and the join broadcasts the typically-tiny aggregated delta side
  * under AQE.
  *
  * EXACTLY-ONCE CONTRACT: deltas are ADDITIVE, so a replayed micro-batch
  * is the worst case — it would silently double-count revenue, not just
  * rewrite the same value. The snapshot is therefore version-gated exactly
  * like [[CdcStream.CdcSnapshot]]: the highest committed batchId is
  * recorded, a replayed id is a no-op, and the commit (localCheckpoint,
  * standing in for a lakehouse table-version write) lands before the id
  * advances. StreamingSpec proves replay-is-a-no-op and that the same data
  * under a fresh id DOES move the total (the negative control).
  *
  * SCOPE: with no checkpoint path the batchId high-water mark and the
  * snapshot live in driver memory only — exactly-once holds within one
  * driver lifetime (the MemoryStream spec shape). A real deployment passes
  * `checkpointLocation` so the engine's offset log survives restarts and
  * replays resume from the last uncommitted batch.
  */
object IvmStream {

  /** One changed order row — raw, not pre-diffed: the delta expression
    * below derives (d_rev, d_n) from it exactly as the batch twin does
    * (key%10==3 delete, ==7 reprice +100, ==8 insert at price+100). */
  case class OrderChange(o_orderkey: Long, o_custkey: Long,
      o_totalprice: Double)

  /** The batch query's delta expression verbatim: change rows → per-key
    * (d_rev, d_n), map-side-combined on the fine customer key. */
  def deltas(ch: DataFrame): DataFrame = ch
    .select(col("o_custkey"),
      when(col("o_orderkey") % 10 === 3, -col("o_totalprice"))
        .when(col("o_orderkey") % 10 === 7, lit(100.0)) // (p+100)−p
        .otherwise(col("o_totalprice") + 100.0).as("d_rev"),
      when(col("o_orderkey") % 10 === 3, -1L)
        .when(col("o_orderkey") % 10 === 7, 0L)
        .otherwise(1L).as("d_n"))
    .groupBy(col("o_custkey"))
    .agg(sum(col("d_rev")).as("d_rev"), sum(col("d_n")).as("d_n"))

  /** The maintained rollup, version-gated.
    *
    * @param initialRollup base rollup (o_custkey, rev, n) — the batch
    *                      twin's oldRoll shape
    */
  final class RollupSnapshot(initialRollup: DataFrame) {
    @volatile private var roll: DataFrame = initialRollup
      .select(col("o_custkey"), col("rev").as("rev_raw"),
        col("n").as("n_orders"))
      .localCheckpoint(true)
    @volatile private var lastCommitted: Long = -1L

    def current: DataFrame = roll
    def committedThrough: Long = lastCommitted

    /** Merge one micro-batch of deltas in. A batchId at or below the
      * committed high-water mark is a replay whose commit already landed —
      * additive deltas make re-applying it double-count, so it is a no-op.
      * Keys whose order count reaches zero leave the rollup (the batch
      * twin's n_orders > 0 filter), which also sheds any FP dust their
      * revenue accumulated. */
    def applyBatch(changes: Dataset[OrderChange], batchId: Long): Unit =
      synchronized {
        if (batchId <= lastCommitted) return
        val d = deltas(changes.toDF())
        val merged = roll.join(d, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("rev_raw"), lit(0.0)) +
              coalesce(col("d_rev"), lit(0.0))).as("rev_raw"),
            (coalesce(col("n_orders"), lit(0L)) +
              coalesce(col("d_n"), lit(0L))).as("n_orders"))
          .filter(col("n_orders") > 0)
        // commit = materialize the new version, THEN advance the id: a
        // crash between the two replays the batch, and the gate absorbs it
        roll = merged.localCheckpoint(true)
        lastCommitted = batchId
      }
  }

  /** Wire a change stream into the maintained rollup: every micro-batch
    * folds to deltas and MERGEs in through the version gate. Returns the
    * started query; the caller owns stop(). Pass `checkpointLocation` in
    * any deployment that must survive driver restarts (see the scope note
    * in the object scaladoc). */
  def maintain(changeStream: Dataset[OrderChange], snapshot: RollupSnapshot,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = changeStream.writeStream
      .foreachBatch { (batch: Dataset[OrderChange], id: Long) =>
        snapshot.applyBatch(batch, id)
      }
      .outputMode("update")
    checkpointLocation.fold(w)(p => w.option("checkpointLocation", p)).start()
  }
}
