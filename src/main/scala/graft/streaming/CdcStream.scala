package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming CDC upsert — the `foreachBatch` twin of the batch
  * q_cdc_merge (PipelineOps), completing the batch/streaming symmetry the
  * dedup/sketch/funnel/session families already have: the same MERGE
  * semantics (keyed updates, deletes, inserts onto a snapshot) applied
  * continuously, one micro-batch at a time.
  *
  * Spark-native shape: a change stream has no built-in MERGE sink, so the
  * canonical pattern is `writeStream.foreachBatch` + a deterministic
  * batch-side merge of each micro-batch into the maintained snapshot. The
  * merge itself is the q_cdc_merge plan verbatim — ONE full-outer shuffle
  * join on the fine key (or an AQE broadcast of the typically-tiny change
  * batch); at 100 TB the snapshot is a bucketed lakehouse table co-located
  * on the key and each commit writes a new table version.
  *
  * EXACTLY-ONCE CONTRACT: `foreachBatch` is at-least-once — after a
  * failure the engine replays the last uncommitted micro-batch with the
  * SAME batchId. [[CdcSnapshot.applyBatch]] is therefore version-gated the
  * way a lakehouse transaction log is: the snapshot records the highest
  * committed batchId, a replayed id is a NO-OP, and the commit itself
  * (localCheckpoint, standing in for the table-version write) happens
  * before the id advances. Re-running a failed micro-batch cannot
  * double-apply — StreamingSpec proves it by re-applying a batch and
  * asserting the snapshot is bit-identical.
  */
object CdcStream {

  /** One keyed change: op ∈ D (delete), U (absolute price update),
    * I (insert), A (ADDITIVE price adjustment — new_price is a delta).
    * D/U/I are the batch q_cdc_merge vocabulary; A exists because absolute
    * assignment is naturally idempotent and would mask a broken replay
    * gate — an additive op is the canary that makes double-apply
    * OBSERVABLE (the exactly-once spec leans on it). */
  case class Change(o_orderkey: Long, ch_custkey: Long, op: String,
      new_price: Double)

  /** Mutable snapshot under CDC, the state the stream maintains.
    *
    * @param initial base table rows (o_orderkey, o_custkey, price); all
    *                start with action "kept", exactly like the batch twin
    */
  final class CdcSnapshot(initial: DataFrame) {
    // committed state: materialized (localCheckpoint severs lineage so N
    // batches never stack N joins into one plan — the CC-loop device) and
    // the highest batchId folded into it
    @volatile private var snap: DataFrame = initial
      .select(col("o_orderkey"), col("o_custkey"), col("price"),
        lit("kept").as("action"))
      .localCheckpoint(true)
    @volatile private var lastCommitted: Long = -1L

    def current: DataFrame = snap
    def committedThrough: Long = lastCommitted

    /** MERGE one micro-batch in: the q_cdc_merge full-outer shape. A
      * batchId at or below the committed high-water mark is a replay of a
      * batch whose commit already landed — applying it again would
      * double-apply (a second +100 reprice), so it is a no-op. */
    def applyBatch(changes: Dataset[Change], batchId: Long): Unit =
      synchronized {
        if (batchId <= lastCommitted) return
        val ch = changes.toDF()
        // SQL MERGE semantics: at most ONE source change per key per
        // batch. Two same-key changes would fan out the full-outer join
        // and commit duplicate snapshot rows that double on every later
        // touch — reject the batch loudly (the change batch is the tiny
        // side; this census is one broadcast-scale job) instead of
        // corrupting silently.
        val dup = ch.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .limit(1).collect()
        require(dup.isEmpty,
          s"micro-batch $batchId carries ${dup.head.getLong(1)} changes " +
            s"for key ${dup.head.getLong(0)}: MERGE requires at most one " +
            "change per key per batch (pre-aggregate the change log first)")
        val merged = snap.join(ch, Seq("o_orderkey"), "full_outer")
          .filter(coalesce(col("op"), lit("K")) =!= "D")
          .select(col("o_orderkey"),
            coalesce(col("o_custkey"), col("ch_custkey")).as("o_custkey"),
            when(col("op").isNull, col("price"))
              .when(col("op") === "A",
                coalesce(col("price"), lit(0.0)) + col("new_price"))
              .otherwise(col("new_price")).as("price"),
            when(col("op").isNull, col("action"))
              .when(col("op") === "U", "updated")
              .when(col("op") === "A", "adjusted")
              .otherwise("inserted").as("action"))
        // commit = materialize the new version, THEN advance the id: a
        // crash between the two replays the batch, and the gate absorbs it
        snap = merged.localCheckpoint(true)
        lastCommitted = batchId
      }
  }

  /** Wire a change stream into a snapshot: every micro-batch MERGEs in
    * through the version gate. Returns the started query; the caller owns
    * stop().
    *
    * SCOPE: with no checkpoint path the batchId high-water mark and the
    * snapshot live in driver memory only — the exactly-once guarantee
    * holds within one driver lifetime (the MemoryStream spec shape). A
    * real deployment passes `checkpointLocation` so the engine's offset
    * log survives restarts and the replayed batch arrives with its
    * original id for the gate to absorb; the snapshot side then needs a
    * durable table (the lakehouse version log localCheckpoint stands in
    * for) rather than driver memory. */
  def upsert(changeStream: Dataset[Change], snapshot: CdcSnapshot,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = changeStream.writeStream
      .foreachBatch { (batch: Dataset[Change], id: Long) =>
        snapshot.applyBatch(batch, id)
      }
      .outputMode("update")
    checkpointLocation.fold(w)(p => w.option("checkpointLocation", p)).start()
  }
}
