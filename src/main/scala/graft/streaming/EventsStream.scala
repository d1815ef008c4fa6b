package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming layer (SURVEY §2.5: "none anywhere") — this
  * is beyond-reference capability expressed the Spark-native way: the same
  * transformations work on a batch DataFrame and a readStream DataFrame, and
  * the stateful path uses flatMapGroupsWithState, which at cluster scale
  * shards state by key across executors with checkpointed state stores.
  */
object EventsStream {

  /** Tumbling-window event-time aggregation with a 10-minute watermark:
    * late events beyond the watermark are dropped, state for closed windows
    * is reclaimed — the canonical streaming aggregation shape.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window event-time aggregation (1 h windows every 15 min) with
    * a 10-minute watermark. Each event lands in length/slide = 4 windows;
    * the state store holds one row per OPEN (window, type) group and the
    * watermark retires windows as their end passes — state is bounded by
    * the watermark horizon × |event types|, not by stream length.
    * q_events_sliding is the oracle-checked batch twin.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("start_s"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming KMV/theta distinct-user sketch per event type — the
    * [[graft.functions.Kmv]] bottom-k as a running aggregate. The merge
    * is set-union-keep-k: commutative, associative and IDEMPOTENT, so
    * the streamed ≤k-long state after any series of micro-batches is
    * BIT-IDENTICAL to the batch sketch over the same rows, and a
    * replayed event cannot distort it (StreamingSpec pins both). A
    * 100 TB ingest answers "distinct users per type so far" — and,
    * because theta sketches retain samples, cross-type overlap — at
    * every trigger from k longs per type, no rescan. The hash is the
    * repo's LCG mod the prime P (a bijection on ids), so the batch twin
    * q_theta_users gates the exact same arithmetic against DuckDB.
    */
  def thetaDistinct(events: DataFrame, k: Int): DataFrame = {
    val P = 2147483647L
    events.select(col("event_type"),
        pmod(pmod(col("user_id"), lit(P)) * lit(1103515245L) + lit(12345L),
          lit(P)).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.functions.Kmv.bottomK(col("h"), k).as("sk"))
  }

  /** Streaming model-eval census: the (integer-cents score → pos/neg)
    * state behind a LIVE AUC readout. Works unchanged on a streaming
    * frame because the census is pure sum/count partials — associative
    * merges make it bit-equal to the batch census at any micro-batch
    * cut (StreamingSpec three-way: streamed census == batch census, and
    * the AUC reduced from the streamed state == q_auc_rank). State is
    * value-domain-bounded per key, never event-volume-sized.
    */
  def scoreCensus(events: DataFrame): DataFrame =
    graft.queries.MLOps.scoreCensus(events)

  /** Streaming experiment monitor: the per-day (arm trials, arm
    * conversions) census behind q_sequential_ab as micro-batch state —
    * pure sum/count partials, so the streamed census is bit-equal to
    * batch at any cut and the live z-path reads straight off the state
    * (StreamingSpec three-way). State is horizon-days-sized.
    */
  def abDailyCensus(events: DataFrame): DataFrame =
    graft.queries.TemporalOps.abDailyCensus(events)

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, start_s: Long, end_s: Long,
      n_events: Int, total_value: Double)

  private case class SessionState(start: Long, end: Long, n: Int, total: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: events for a user
    * belong to one session while consecutive gaps stay under `gapMinutes`.
    * In streaming mode state times out on event-time; in batch mode each key
    * sees all its events at once and every session is emitted. Deterministic:
    * events are sorted by (ts, event_id) within the group.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end <= gapMs =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                out += Session(userId, s.start / 1000, s.end / 1000, s.n,
                  math.round(s.total * 100) / 100.0)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          // batch mode: no timeouts fire, so flush the open session
          cur.foreach { s =>
            out += Session(userId, s.start / 1000, s.end / 1000, s.n,
              math.round(s.total * 100) / 100.0)
          }
          state.remove()
          out.iterator
      }
  }

  case class FunnelStage(user_id: Long, stage: Int)

  private case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Streaming funnel tracker (view → click → purchase, each stage within
    * `windowSecs` of the previous): per-user state is three timestamps —
    * O(1) per key however long the stream runs, the state-machine twin of
    * the batch q_funnel joins. Events process in (ts, event_id) order
    * within each micro-batch group; a stage fills with the FIRST
    * qualifying event, which equals the batch side's min() because the
    * scan is in time order. Batch mode sees each key's full history at
    * once and emits the final stage per user; StreamingSpec checks the
    * census against the oracle-gated q_funnel.
    */
  def funnel(events: Dataset[Event], windowSecs: Long = 86400L): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelStage](GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime / 1000
            e.event_type match {
              case "view" if s.t1 == 0L =>
                s = s.copy(t1 = t)
              case "click" if s.t1 != 0L && s.t2 == 0L &&
                  t > s.t1 && t <= s.t1 + windowSecs =>
                s = s.copy(t2 = t)
              case "purchase" if s.t2 != 0L && s.t3 == 0L &&
                  t > s.t2 && t <= s.t2 + windowSecs =>
                s = s.copy(t3 = t)
              case _ => ()
            }
          }
          state.update(s)
          FunnelStage(userId,
            if (s.t3 != 0L) 3 else if (s.t2 != 0L) 2 else if (s.t1 != 0L) 1 else 0)
      }
  }

  case class DayCount(event_type: String, day: Long, n: Long)
  case class Anomaly(event_type: String, day: Long, n: Long,
      mean7: Double, sd7: Double, is_anomaly: Int)

  // state is ≤7 (day, count) slots packed into one string ("d:n,d:n,…").
  // PUBLIC by necessity: the streaming state-store serializer generates
  // janino code that invokes the accessors reflectively-by-source, and a
  // private class is invisible to it (batch-mode mapGroups never
  // serializes state, which is why the private siblings above get away
  // with it)
  case class RingState(packed: String)

  /** Rolling 3σ anomaly detection as a keyed state machine: per event
    * type the state is the trailing ≤7 (day, count) slots — O(7) memory
    * per key at any stream length, evicted by day arithmetic, no window
    * sort anywhere. Mean/σ come from exact integer Σn, Σn² (the
    * q_rolling_anomaly formulas), verdicts only after 4 warmup days.
    * The SAME function runs on a batch Dataset (each key sees all its
    * days at once) and on a stream fed in event-time order — StreamingSpec
    * holds all three (batch fn, streamed fn, oracle-gated query) equal.
    */
  def rollingAnomaly(daily: Dataset[DayCount]): Dataset[Anomaly] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RingState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (typ: String, it: Iterator[DayCount], state: GroupState[RingState]) =>
          var ring: List[(Long, Long)] = state.getOption
            .filter(_.packed.nonEmpty)
            .map(_.packed.split(',').toList.map { s =>
              val Array(d, n) = s.split(':')
              (d.toLong, n.toLong)
            }).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          it.toSeq.sortBy(_.day).foreach { dc =>
            ring = ((dc.day, dc.n) :: ring).filter(_._1 > dc.day - 7)
            val k = ring.size
            if (k >= 4) {
              val sn = ring.map(_._2).sum
              val snn = ring.map(t => t._2 * t._2).sum
              val mean = sn.toDouble / k
              val sd = math.sqrt((k * snn - sn * sn).toDouble / (k * k))
              out += Anomaly(typ, dc.day, dc.n, mean, sd,
                if (dc.n > mean + 3.0 * sd) 1 else 0)
            }
          }
          state.update(RingState(
            ring.map(t => s"${t._1}:${t._2}").mkString(",")))
          out.iterator
      }
  }

  case class LateEvent(event_id: Long, event_type: String, secs: Long)
  // public for the janino state-store serializer (the RingState caveat)
  case class LatenessState(hwm: Long, n: Long, l1: Long, l5: Long,
      lh: Long, mx: Long, lastId: Long, reord: Long)
  case class LatenessCensus(event_type: String, n_events: Long,
      late_1m: Long, late_5m: Long, late_1h: Long, max_late_s: Long,
      n_reordered: Long)

  /** Streaming watermark-lateness census — the state-machine twin of the
    * batch q_lateness_census (which measures from history what
    * `withWatermark` horizon would have dropped how much). Per event type
    * the state is SIX longs — the running event-time high-water mark and
    * five counters — O(1) per key at any stream length, no window sort:
    * the batch side's running-max window becomes a fold over arrival
    * order. Events process in event_id (ingest) order within each
    * micro-batch group; equivalence with the batch query holds when
    * micro-batch cuts respect ingest order per key (true for a replayed
    * log, pinned by StreamingSpec with controlled MemoryStream chunks).
    * That ordering assumption is OBSERVABLE, not silent: the state carries
    * the last-processed event_id across micro-batches, and any arrival
    * with a lower id (a cut that did not respect ingest order per key)
    * increments `n_reordered` in the census — a nonzero value tells the
    * operator the fold's high-water mark may diverge from the batch twin.
    * Emits the census-so-far per key each trigger (update mode) — exactly
    * the live number an ingest dashboard sizes its watermark from.
    */
  def latenessCensus(events: Dataset[LateEvent]): Dataset[LatenessCensus] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[LatenessState, LatenessCensus](
        GroupStateTimeout.NoTimeout) {
        (typ: String, it: Iterator[LateEvent], state: GroupState[LatenessState]) =>
          var s = state.getOption
            .getOrElse(LatenessState(Long.MinValue, 0L, 0L, 0L, 0L, 0L,
              Long.MinValue, 0L))
          it.toSeq.sortBy(_.event_id).foreach { e =>
            val hwm = math.max(s.hwm, e.secs)
            val late = hwm - e.secs
            s = LatenessState(hwm, s.n + 1,
              s.l1 + (if (late > 60) 1L else 0L),
              s.l5 + (if (late > 300) 1L else 0L),
              s.lh + (if (late > 3600) 1L else 0L),
              math.max(s.mx, late),
              math.max(s.lastId, e.event_id),
              s.reord + (if (e.event_id < s.lastId) 1L else 0L))
          }
          state.update(s)
          LatenessCensus(typ, s.n, s.l1, s.l5, s.lh, s.mx, s.reord)
      }
  }

  case class GapEvent(user_id: Long, event_id: Long, secs: Long)
  // public for the janino state-store serializer (the RingState caveat)
  case class LastSeen(secs: Long)
  case class GapObs(bucket: Int, gap_s: Long)

  /** Streaming inter-event gap observer — the stateful half of the batch
    * q_gap_histogram: per user the state is ONE long (the last-seen
    * event time), each arrival emits its gap's ladder bucket, and the
    * downstream bucket census is an ordinary streaming aggregation over
    * the emitted observations (6 groups — state bounded by the ladder,
    * not the stream). Events process in (secs, event_id) order within
    * each micro-batch group; equivalence with the batch window
    * formulation holds when micro-batch cuts respect time order per user
    * (the latenessCensus contract; StreamingSpec pins it with ordered
    * MemoryStream chunks). The same function runs on a batch Dataset —
    * each key sees its full history at once.
    */
  def gapObservations(events: Dataset[GapEvent]): Dataset[GapObs] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, GapObs](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[GapEvent], state: GroupState[LastSeen]) =>
          var last = state.getOption.map(_.secs).getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer.empty[GapObs]
          it.toSeq.sortBy(e => (e.secs, e.event_id)).foreach { e =>
            if (last != Long.MinValue) {
              val g = e.secs - last
              val b =
                if (g <= 60) 0 else if (g <= 300) 1 else if (g <= 1800) 2
                else if (g <= 7200) 3 else if (g <= 86400) 4 else 5
              out += GapObs(b, g)
            }
            last = e.secs
          }
          state.update(LastSeen(last))
          out.iterator
      }
  }

  /** Bucket census over [[gapObservations]] — q_gap_histogram's
    * (bucket, n_gaps, max_gap_s) core as a live stream. */
  def gapHistogram(events: Dataset[GapEvent]): DataFrame =
    gapObservations(events)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"), max(col("gap_s")).as("max_gap_s"))

  /** Stream-stream interval join (attribution): purchases joined to every
    * same-user click in the preceding `windowMinutes`. Both sides carry
    * event-time watermarks and the join condition bounds click_ts relative
    * to purchase_ts, so each side's state store retains only one watermark
    * window of rows — bounded state at any corpus rate. The SAME function
    * runs on batch frames (watermarks are a no-op there); q_interval_join
    * is the oracle-checked batch twin.
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    p.join(c, expr(
        s"""user_id = p_user AND
           |click_ts BETWEEN purchase_ts - INTERVAL $windowMinutes MINUTES
           |             AND purchase_ts""".stripMargin))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("gap_s"))
  }

  /** Load the events table as a STREAM from a parquet directory. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
}
