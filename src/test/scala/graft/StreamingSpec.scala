package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Structured Streaming checks: the streaming pipeline over a file source
  * must agree with its batch twin, and stateful sessionization must agree
  * with the gaps-and-islands SQL formulation.
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private lazy val streamDir = {
    // materialize events (ts normalized to micros) where readStream can see
    // a plain TimestampType schema
    val dir = "target/stream_events"
    Tables(spark, sf, "events").write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly aggregation matches the batch twin") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.hourly(stream).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .select(col("hour_ts").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventsStream.hourly(Tables(spark, sf, "events"))
      .select(col("hour_ts").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming sliding-window aggregation matches batch twin and oracle query") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.sliding(stream).writeStream
      .format("memory").queryName("sliding_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("start_s"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
    val streamed = spark.table("sliding_out").collect().map(key).toSet
    val batch = EventsStream.sliding(Tables(spark, sf, "events"))
      .collect().map(key).toSet
    val oracleQ = SparkEntry.queries("q_events_sliding")(spark, sf)
      .collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch, s"stream vs batch: ${(streamed diff batch).take(3)}")
    assert(batch == oracleQ, s"twin vs oracle query: ${(batch diff oracleQ).take(3)}")
  }

  test("flatMapGroupsWithState sessionization matches gaps-and-islands SQL") {
    import spark.implicits._
    val ds = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val fmgws = EventsStream.sessionize(ds, gapMinutes = 30).collect()
      .map(s => (s.user_id, s.start_s, s.end_s, s.n_events) -> s.total_value).toMap
    val sql = SparkEntry.queries("q_sessionize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"),
        r.getAs[Long]("end_s"), r.getAs[Long]("n_events").toInt) ->
        r.getAs[Double]("total_value")).toMap
    assert(fmgws.keySet == sql.keySet,
      s"missing=${(sql.keySet -- fmgws.keySet).take(3)} extra=${(fmgws.keySet -- sql.keySet).take(3)}")
    fmgws.foreach { case (k, v) =>
      assert(math.abs(v - sql(k)) < 0.05, s"session $k total")
    }
  }

  test("funnel state machine matches the batch join formulation") {
    import spark.implicits._
    val ds = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStream.Event]
    val stages = EventsStream.funnel(ds).collect()
    val census = (stages.length.toLong,
      stages.count(_.stage >= 1).toLong,
      stages.count(_.stage >= 2).toLong,
      stages.count(_.stage >= 3).toLong)
    val q = SparkEntry.queries("q_funnel")(spark, sf).collect().head
    val oracle = (q.getAs[Long]("n_users"), q.getAs[Long]("n_view"),
      q.getAs[Long]("n_view_click"), q.getAs[Long]("n_full_funnel"))
    assert(census == oracle, s"state machine $census vs batch joins $oracle")
    assert(census._2 > 0)
  }

  test("rolling-anomaly state machine: batch fn == streamed fn == oracle query") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val daily = Tables(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .as[EventsStream.DayCount]
    def key(a: EventsStream.Anomaly) = (a.event_type, a.day)
    val batchOut = EventsStream.rollingAnomaly(daily).collect()
      .map(a => key(a) -> a).toMap
    // vs the oracle-gated query: exact flags, moments to output rounding
    val oracle = SparkEntry.queries("q_rolling_anomaly")(spark, sf).collect()
    assert(oracle.nonEmpty && batchOut.nonEmpty)
    assert(oracle.length == batchOut.size)
    oracle.foreach { r =>
      val a = batchOut((r.getAs[String]("event_type"), r.getAs[Long]("day")))
      assert(a.n == r.getAs[Long]("n"))
      assert(a.is_anomaly == r.getAs[Int]("is_anomaly"),
        s"flag mismatch at ${a.event_type}/${a.day}")
      assert(math.abs(a.mean7 - r.getAs[Double]("mean7")) < 1.1e-4)
      assert(math.abs(a.sd7 - r.getAs[Double]("sd7")) < 1.1e-4)
    }
    // vs the streamed run: two event-time-ordered microbatches must land
    // on the identical verdict set (state carries the ring across batches)
    val rows = daily.collect().sortBy(r => (r.day, r.event_type))
    val cut = rows(rows.length / 2).day
    val ms = MemoryStream[EventsStream.DayCount](spark)
    val sq = EventsStream.rollingAnomaly(ms.toDS()).writeStream
      .format("memory").queryName("anom_out").outputMode("append").start()
    try {
      ms.addData(rows.filter(_.day <= cut).toSeq)
      sq.processAllAvailable()
      ms.addData(rows.filter(_.day > cut).toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("anom_out").as[EventsStream.Anomaly]
      .collect().map(a => key(a) -> a).toMap
    assert(streamed.keySet == batchOut.keySet,
      s"missing=${(batchOut.keySet -- streamed.keySet).take(3)}")
    streamed.foreach { case (k, a) =>
      val b = batchOut(k)
      assert(a.n == b.n && a.is_anomaly == b.is_anomaly &&
        a.mean7 == b.mean7 && a.sd7 == b.sd7, s"stream/batch diverge at $k")
    }
  }

  test("lateness-census state machine: batch fn == streamed fn == oracle query") {
    // the watermark-sizing measure as a live stream: running high-water
    // mark + five counters per event type, fed in ingest (event_id) order
    // across two micro-batches; the final update per key must equal the
    // batch window formulation exactly (all-integer state)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("secs"))
      .as[EventsStream.LateEvent]
    val batchOut = EventsStream.latenessCensus(evs).collect()
      .map(c => c.event_type -> c).toMap
    val oracle = SparkEntry.queries("q_lateness_census")(spark, sf).collect()
    assert(oracle.nonEmpty && oracle.length == batchOut.size)
    oracle.foreach { r =>
      val c = batchOut(r.getAs[String]("event_type"))
      assert(c.n_events == r.getAs[Long]("n_events") &&
        c.late_1m == r.getAs[Long]("late_1m") &&
        c.late_5m == r.getAs[Long]("late_5m") &&
        c.late_1h == r.getAs[Long]("late_1h") &&
        c.max_late_s == r.getAs[Long]("max_late_s"),
        s"batch fn vs query diverge at ${c.event_type}")
    }
    val rows = evs.collect().sortBy(_.event_id)
    val cut = rows(rows.length / 2).event_id
    val ms = MemoryStream[EventsStream.LateEvent](spark)
    val sq = EventsStream.latenessCensus(ms.toDS()).writeStream
      .format("memory").queryName("late_out").outputMode("update").start()
    try {
      ms.addData(rows.filter(_.event_id <= cut).toSeq)
      sq.processAllAvailable()
      ms.addData(rows.filter(_.event_id > cut).toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    // update mode re-emits per trigger; the LAST row per key (max n_events)
    // is the final census
    val streamed = spark.table("late_out").as[EventsStream.LatenessCensus]
      .collect().groupBy(_.event_type)
      .map { case (k, cs) => k -> cs.maxBy(_.n_events) }
    assert(streamed == batchOut,
      s"stream vs batch: ${(streamed.toSet diff batchOut.toSet).take(3)}")
    // ingest-ordered cuts → the ordering assumption held and the census
    // says so
    assert(streamed.values.forall(_.n_reordered == 0L))
  }

  test("gap histogram state machine: batch fn == streamed fn == oracle query") {
    // one long of state per user, a 6-group census downstream; two
    // time-ordered micro-batches must land on the batch window
    // formulation's exact (bucket, n_gaps, max_gap_s) rows
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("secs"))
      .as[EventsStream.GapEvent]
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batchOut = toMap(EventsStream.gapHistogram(evs).collect())
    val oracle = SparkEntry.queries("q_gap_histogram")(spark, sf).collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("max_gap_s"))).toMap
    assert(batchOut.nonEmpty && batchOut == oracle,
      s"batch fn vs query: ${(batchOut.toSet diff oracle.toSet).take(3)}")
    val rows = evs.collect().sortBy(e => (e.secs, e.event_id))
    val cut = rows(rows.length / 2).secs
    val ms = MemoryStream[EventsStream.GapEvent](spark)
    val sq = EventsStream.gapHistogram(ms.toDS()).writeStream
      .format("memory").queryName("gap_out").outputMode("complete").start()
    try {
      ms.addData(rows.filter(_.secs <= cut).toSeq)
      sq.processAllAvailable()
      ms.addData(rows.filter(_.secs > cut).toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = toMap(spark.table("gap_out").collect())
    assert(streamed == batchOut,
      s"stream vs batch: ${(streamed.toSet diff batchOut.toSet).take(3)}")
  }

  test("lateness census flags micro-batch cuts that violate ingest order") {
    // feed the HIGH half of the event_id range first, then the low half:
    // every low-half arrival has an id below the carried high-water id, so
    // the fold's documented assumption is violated — n_reordered must say
    // so instead of the census silently diverging from the batch twin
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("secs"))
      .as[EventsStream.LateEvent]
    val rows = evs.collect().sortBy(_.event_id)
    val cut = rows(rows.length / 2).event_id
    val ms = MemoryStream[EventsStream.LateEvent](spark)
    val sq = EventsStream.latenessCensus(ms.toDS()).writeStream
      .format("memory").queryName("late_ooo_out").outputMode("update").start()
    try {
      ms.addData(rows.filter(_.event_id > cut).toSeq)
      sq.processAllAvailable()
      ms.addData(rows.filter(_.event_id <= cut).toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    val finalCensus = spark.table("late_ooo_out")
      .as[EventsStream.LatenessCensus]
      .collect().groupBy(_.event_type)
      .map { case (k, cs) => k -> cs.maxBy(_.n_events) }
    // every event in the second batch arrived below the carried id
    val lowHalfCounts = rows.filter(_.event_id <= cut)
      .groupBy(_.event_type).view.mapValues(_.length.toLong).toMap
    finalCensus.foreach { case (typ, c) =>
      assert(c.n_reordered == lowHalfCounts.getOrElse(typ, 0L),
        s"$typ: expected ${lowHalfCounts.getOrElse(typ, 0L)} reordered, " +
          s"census says ${c.n_reordered}")
    }
    assert(finalCensus.values.map(_.n_reordered).sum > 0L)
  }

  test("streaming CDC upsert: foreachBatch merge == batch MERGE == oracle query") {
    // the one lakehouse op that had no streaming twin: the same change
    // batch fed as three micro-batches through the foreachBatch upsert
    // must land on the exact snapshot the batch q_cdc_merge (oracle-gated)
    // computes in one shot — key, custkey, price, and action, row for row
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CdcStream
    val o = Tables(spark, sf, "orders")
    val base = o.filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"))
    val changes = o.filter((col("o_orderkey") % 10).isin(3, 7, 8))
      .select(col("o_orderkey"), col("o_custkey").as("ch_custkey"),
        when(col("o_orderkey") % 10 === 3, "D")
          .when(col("o_orderkey") % 10 === 7, "U")
          .otherwise("I").as("op"),
        (col("o_totalprice") + 100.0).as("new_price"))
      .as[CdcStream.Change].collect().sortBy(_.o_orderkey)
    assert(changes.nonEmpty)
    val snapshot = new CdcStream.CdcSnapshot(base)
    val ms = MemoryStream[CdcStream.Change](spark)
    val sq = CdcStream.upsert(ms.toDS(), snapshot)
    try {
      val third = changes.length / 3
      ms.addData(changes.take(third).toSeq); sq.processAllAvailable()
      ms.addData(changes.slice(third, 2 * third).toSeq); sq.processAllAvailable()
      ms.addData(changes.drop(2 * third).toSeq); sq.processAllAvailable()
    } finally sq.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1)
    val streamed = rows(snapshot.current)
    val batch = rows(q("q_cdc_merge")) // the oracle-gated query IS the twin
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream vs batch merge: ${streamed.zip(batch).find(p => p._1 != p._2)}")
  }

  test("streaming IVM rollup: foreachBatch delta-merge == batch q_ivm_rollup == oracle") {
    // the last incremental-maintenance op without a streaming form: the
    // same change set fed as three micro-batches through the foreachBatch
    // delta-merge must land on the rollup the (oracle-gated) batch
    // q_ivm_rollup computes in one shot. n_orders exactly; revenue within
    // FP tolerance — the batch sums base+deltas in one expression, the
    // stream accumulates across three commits, so association differs.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IvmStream
    val o = Tables(spark, sf, "orders")
    val oldRoll = o.filter(col("o_orderkey") % 10 < 8)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    val changes = o.filter((col("o_orderkey") % 10).isin(3, 7, 8))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[IvmStream.OrderChange].collect().sortBy(_.o_orderkey)
    assert(changes.nonEmpty)
    val snapshot = new IvmStream.RollupSnapshot(oldRoll)
    val ms = MemoryStream[IvmStream.OrderChange](spark)
    val sq = IvmStream.maintain(ms.toDS(), snapshot)
    try {
      val third = changes.length / 3
      ms.addData(changes.take(third).toSeq); sq.processAllAvailable()
      ms.addData(changes.slice(third, 2 * third).toSeq); sq.processAllAvailable()
      ms.addData(changes.drop(2 * third).toSeq); sq.processAllAvailable()
    } finally sq.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val streamed = rows(snapshot.current.select(col("o_custkey"),
      col("rev_raw"), col("n_orders")))
    val batch = rows(q("q_ivm_rollup").select(col("o_custkey"),
      col("revenue").cast("double"), col("n_orders")))
    assert(streamed.length == batch.length,
      s"key sets differ: ${streamed.length} streamed vs ${batch.length} batch")
    streamed.zip(batch).foreach { case ((sk, sr, sn), (bk, br, bn)) =>
      assert(sk == bk && sn == bn, s"key/count mismatch: ($sk,$sn) vs ($bk,$bn)")
      assert(math.abs(sr - br) < 1e-4, s"revenue drift at key $sk: $sr vs $br")
    }
    // exactly-once canary: deltas are additive, so a replayed batchId
    // must be a no-op while the same data under a FRESH id must move the
    // total (proving the no-op came from the gate, not value idempotence)
    val lastBatch = spark.createDataset(changes.drop(2 * changes.length / 3).toSeq)
    def total(): Double = snapshot.current.agg(sum(col("rev_raw"))).head.getDouble(0)
    val committed = snapshot.current
    val t0 = total()
    snapshot.applyBatch(lastBatch, snapshot.committedThrough) // replay
    assert(snapshot.current eq committed, "replayed batch produced a new version")
    assert(math.abs(total() - t0) < 1e-6, "replayed IVM batch double-applied")
    snapshot.applyBatch(lastBatch, snapshot.committedThrough + 1) // fresh id
    assert(math.abs(total() - t0) > 1.0,
      "fresh-id apply should have moved the rollup (canary is broken)")
  }

  test("CDC upsert is exactly-once: a replayed micro-batch cannot double-apply") {
    // foreachBatch is at-least-once — after a failure the engine re-runs
    // the last micro-batch with the SAME batchId. The snapshot's version
    // gate must absorb that. Absolute U/I ops are naturally idempotent and
    // would mask a broken gate, so the canary is an ADDITIVE adjustment:
    // apply +100 to every key, replay the same batchId (must be a no-op,
    // same committed version object, same values), then apply the same
    // data under a FRESH id (the negative control: it MUST double-apply,
    // proving the no-op came from the gate, not from value idempotence)
    import spark.implicits._
    import graft.streaming.CdcStream
    val base = Tables(spark, sf, "orders").filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price")).limit(100)
    val snapshot = new CdcStream.CdcSnapshot(base)
    val adj = snapshot.current.select(col("o_orderkey"), col("o_custkey"))
      .collect()
      .map(r => CdcStream.Change(r.getLong(0), r.getLong(1), "A", 100.0))
      .toSeq
    val adjDs = spark.createDataset(adj)
    def total(): Double = snapshot.current.agg(sum(col("price")))
      .head.getDouble(0)
    val t0 = total()
    snapshot.applyBatch(adjDs, 0L)
    val t1 = total()
    assert(math.abs(t1 - (t0 + 100.0 * adj.length)) < 1e-6)
    val committedVersion = snapshot.current
    // replay of batchId 0 — the failure-recovery path
    snapshot.applyBatch(adjDs, 0L)
    assert(snapshot.current eq committedVersion,
      "replayed batch produced a new snapshot version")
    assert(snapshot.committedThrough == 0L)
    assert(math.abs(total() - t1) < 1e-6, "replayed batch double-applied")
    // negative control: same data, fresh id — WITHOUT the gate this is
    // what every replay would have done to the prices
    snapshot.applyBatch(adjDs, 1L)
    assert(math.abs(total() - (t1 + 100.0 * adj.length)) < 1e-6,
      "fresh-id apply should have moved the total (canary is broken)")
  }

  test("CDC upsert rejects a micro-batch with two changes for one key") {
    // SQL MERGE errors on duplicate source keys; the full-outer merge
    // would otherwise fan out and commit duplicate snapshot rows that
    // double on every later touch — the gate must refuse, not corrupt
    import spark.implicits._
    import graft.streaming.CdcStream
    val base = Tables(spark, sf, "orders").filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price")).limit(10)
    val snapshot = new CdcStream.CdcSnapshot(base)
    val k = snapshot.current.select(min(col("o_orderkey"))).head.getLong(0)
    val dup = spark.createDataset(Seq(
      CdcStream.Change(k, 1L, "U", 500.0),
      CdcStream.Change(k, 1L, "A", 100.0)))
    val before = snapshot.current.count()
    val e = intercept[IllegalArgumentException](snapshot.applyBatch(dup, 0L))
    assert(e.getMessage.contains("at most one"))
    assert(snapshot.committedThrough == -1L, "rejected batch advanced the id")
    assert(snapshot.current.count() == before, "rejected batch mutated the snapshot")
  }

  test("streaming dedup (dropDuplicates + watermark) matches batch distinct") {
    // content-keyed streaming dedup: the state store holds one entry per key
    // until the watermark passes — the streaming form of exact dedup
    val stream = EventsStream.readEventsStream(spark, streamDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type")).count()
    val q = stream.writeStream
      .format("memory").queryName("dedup_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables(spark, sf, "events")
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join matches the batch twin and the oracle query") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.attribution(
        stream.filter(col("event_type") === "click"),
        stream.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Long]("click_id"), r.getAs[Long]("gap_s"))
    val streamed = spark.table("attr_out").collect().map(key).toSet
    val batchEv = Tables(spark, sf, "events")
    val batch = EventsStream.attribution(
        batchEv.filter(col("event_type") === "click"),
        batchEv.filter(col("event_type") === "purchase"))
      .collect().map(key).toSet
    val oracleQ = SparkEntry.queries("q_interval_join")(spark, sf)
      .collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch, s"stream vs batch: ${(streamed diff batch).take(3)}")
    assert(batch == oracleQ, s"twin vs oracle query: ${(batch diff oracleQ).take(3)}")
  }

  test("streaming session_window matches the batch twin and the oracle query") {
    // the native session-window aggregation runs UNCHANGED on a stream —
    // complete mode re-emits merged sessions as gaps close; state is one
    // row per open (user, session) and the watermarkless complete form is
    // the test harness shape (production appends with a watermark)
    val stream = EventsStream.readEventsStream(spark, streamDir)
      .withColumn("ts_sec", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(col("user_id"), session_window(col("ts_sec"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        unix_timestamp(col("session_window.end")).as("end_s"),
        col("n_events"), col("total_value"))
    val q = stream.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"), r.getAs[Long]("end_s"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))
    val streamed = spark.table("sess_out").collect().map(key).toSet
    val batch = SparkEntry.queries("q_session_window")(spark, sf).collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch, s"stream vs batch: ${(streamed diff batch).take(3)}")
  }

  test("streaming incremental dedup matches the batch twin and the oracle query") {
    // the new crawl batch (doc_id % 10 == 9, as in q_dedup_incremental)
    // arrives as a stream; the historical fingerprint set is static. The
    // fixture deliberately contains INTRA-BATCH duplicate texts (five
    // docs re-crawled under shifted ids): which representative survives a
    // duplicate group is mode-specific — first-arrival in the stream's
    // state store, deterministic min(doc_id) in the batch twin — so
    // cross-mode equivalence is on fingerprint SETS, which both modes
    // determine identically, while determinism of the batch keep is
    // pinned separately below
    import graft.streaming.DocsStream
    val docsDir = "target/stream_docs"
    val base = Tables(spark, sf, "documents").filter(col("doc_id") % 10 === 9)
    val recrawled = base.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val newBatch = base.unionByName(recrawled)
    newBatch.write.mode("overwrite").parquet(docsDir)
    val hist = Tables(spark, sf, "documents").filter(col("doc_id") % 10 =!= 9)
      .select(md5(col("text")).as("fp")).distinct()
    val q = DocsStream.incrementalDedup(DocsStream.readDocsStream(spark, docsDir), hist)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamedFps = spark.table("incdedup_out").collect()
      .map(_.getString(1)).toSet
    val batch = DocsStream.incrementalDedup(newBatch, hist).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batchFps = batch.map(_._2).toSet
    val oracleFps = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().map(_.getString(1)).toSet
    assert(batch.nonEmpty)
    // the stream emits each surviving fingerprint exactly once
    assert(spark.table("incdedup_out").count() == streamedFps.size,
      "stream emitted a fingerprint twice")
    assert(streamedFps == batchFps,
      s"stream vs batch fps: ${(streamedFps diff batchFps).take(3)}")
    // the re-crawls add no NEW content, so the query over the raw table
    // sees the same surviving fingerprint set
    assert(batchFps == oracleFps,
      s"twin vs oracle query fps: ${(batchFps diff oracleFps).take(3)}")
    // deterministic keep: min doc_id per group means the shifted re-crawl
    // ids (+1e6) can never be the survivor of their duplicate group
    assert(batch.forall(_._1 < 1000000L),
      s"nondeterministic keep chose a re-crawl id: ${batch.filter(_._1 >= 1000000L).take(3)}")
  }

  test("streaming winnow near-dup flags match batch twin and set arithmetic") {
    // the set-similarity family's streaming twin: new docs stream in, the
    // history winnow-fingerprint set is static, and a doc is flagged when
    // ≥3 of its fingerprints are already in the corpus. Stream == batch
    // twin == an independent Scala set computation, on the flagged-doc set
    import graft.streaming.DocsStream
    import graft.functions.TextExprs
    val dir = "target/stream_docs_winnow"
    val newDocs = Tables(spark, sf, "documents").filter(col("doc_id") % 10 === 9)
    newDocs.repartition(2).write.mode("overwrite").parquet(dir)
    val hist = Tables(spark, sf, "documents").filter(col("doc_id") % 10 =!= 9)
      .select(explode(TextExprs.winnowHashes(col("text"), 3, 4)).as("fp"))
      .distinct().persist()
    val q = DocsStream.winnowNearDups(
        DocsStream.readDocsStream(spark, dir, filesPerTrigger = 1), hist)
      .writeStream.format("memory").queryName("winnow_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("winnow_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = DocsStream.winnowNearDups(newDocs, hist).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent set arithmetic on driver-collected fingerprint sets
    val histSet = hist.collect().map(_.getLong(0)).toSet
    val expected = newDocs
      .select(col("doc_id"), TextExprs.winnowHashes(col("text"), 3, 4).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet.count(histSet))
      .filter(_._2 >= 3).toMap.map { case (k, v) => k -> v.toLong }
    hist.unpersist()
    assert(expected.nonEmpty, "degenerate fixture: nothing shares 3 fps")
    assert(batch == expected,
      s"batch twin vs set arithmetic: ${(batch.toSet diff expected.toSet).take(3)}")
    assert(streamed == batch,
      s"stream vs batch twin: ${(streamed.toSet diff batch.toSet).take(3)}")
  }

  test("winnow near-dup update mode: watermark evicts closed-window state") {
    // the docstring's bounded-state claim, actually exercised: two
    // micro-batches ~28 hours apart in synthetic ingest time (ingest_ts =
    // 1.7e9 + doc_id, so +100000 ids = +100000 s) advance the watermark
    // past every batch-1 window; a third batch triggers the eviction.
    // Output must still be the set-arithmetic truth AND the state store's
    // final numRowsTotal must have dropped batch-1's groups.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DocsStream
    import graft.functions.TextExprs
    val texts = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 9).select(col("text"))
      .limit(30).collect().map(_.getString(0))
    val hist = Tables(spark, sf, "documents").filter(col("doc_id") % 10 =!= 9)
      .select(explode(TextExprs.winnowHashes(col("text"), 3, 4)).as("fp"))
      .distinct().persist()
    val histSet = hist.collect().map(_.getLong(0)).toSet
    // batch 1: ids 1..30 (one open hour window); batch 2: the same texts at
    // ids 100001..100030 — far past batch 1's window; batch 3: one dummy doc
    // whose only purpose is a trigger AFTER the watermark passed batch 2's
    // ingest times, so eviction of batch-1 (and batch-2) state is observable
    val b1 = texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
    val b2 = texts.zipWithIndex.map { case (t, i) => (i + 100001L, t) }
    val b3 = Seq((200000L, "zzz dummy text with no winnow overlap qqq"))
    val ms = MemoryStream[(Long, String)](spark)
    val docs = ms.toDS().toDF("doc_id", "text")
    val q = DocsStream.winnowNearDups(docs, hist)
      .writeStream.format("memory").queryName("winnow_upd_out")
      .outputMode("update").start()
    val totalRows =
      try {
        ms.addData(b1); q.processAllAvailable()
        ms.addData(b2); q.processAllAvailable()
        ms.addData(b3); q.processAllAvailable()
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).last
      } finally q.stop()
    // correctness: the last emission per doc_id equals set arithmetic on
    // both id ranges (texts repeat, so flags repeat shifted by 100000)
    val sharedPerText: Seq[Long] = texts.toSeq.toDF("text")
      .select(TextExprs.winnowHashes(col("text"), 3, 4).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet.count(histSet).toLong).toSeq
    def flagged(ids: Seq[Long]): Map[Long, Long] = ids.zip(sharedPerText)
      .collect { case (id, n) if n >= 3 => id -> n }.toMap
    val expected = flagged(b1.map(_._1)) ++ flagged(b2.map(_._1))
    val streamed = spark.table("winnow_upd_out").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).max }
    hist.unpersist()
    assert(expected.nonEmpty, "degenerate fixture: nothing shares 3 fps")
    assert(streamed == expected,
      s"update-mode flags diverge: ${(streamed.toSet diff expected.toSet).take(3)}")
    // bounded state: batch-1 groups (docs sharing >=1 fp, one state row
    // each) must be gone. At the final trigger the watermark sits 1 h
    // behind batch 2's max ingest time, so only batch-2 windows may remain
    // open — state holds at most batch-2's joined groups (+1 for the dummy
    // if it joined), strictly fewer than both batches' groups combined.
    val groupsPerBatch = sharedPerText.count(_ >= 1)
    assert(groupsPerBatch > 0)
    assert(totalRows <= groupsPerBatch + 1,
      s"state not evicted: $totalRows rows for $groupsPerBatch open-window groups")
  }

  test("streaming stratified sample: stream == batch fn == native-operator query") {
    // deterministic hash priorities make the exact-k sample a pure
    // function of the row SET: arrival order and micro-batch cuts cannot
    // change it, so all three formulations agree row for row. Union of
    // all update-mode emissions reduced to the k smallest per stratum
    // equals the final state (an evicted row is strictly worse than the
    // final k, an unevicted one was emitted)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DocsStream
    val docsDf = Tables(spark, sf, "documents").select(col("lang"), col("doc_id"))
    def reduceK(rows: Seq[(String, Long, Long)]): Map[String, Seq[(Long, Long)]] =
      rows.groupBy(_._1).map { case (l, rs) =>
        l -> rs.map(r => (r._3, r._2)).distinct.sorted.take(5)
      }
    val batchOut = reduceK(DocsStream.stratifiedSample(docsDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    val queryOut = reduceK(SparkEntry.queries("q_stratified_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    assert(batchOut == queryOut, "batch fn vs native-operator query diverge")
    val rows = docsDf.collect().map(r => (r.getString(0), r.getLong(1)))
    val cut = rows.length / 2
    val ms = MemoryStream[(String, Long)](spark)
    val sq = DocsStream.stratifiedSample(ms.toDS().toDF("lang", "doc_id"))
      .writeStream.format("memory").queryName("strat_out")
      .outputMode("update").start()
    try {
      ms.addData(rows.take(cut).toSeq)
      sq.processAllAvailable()
      ms.addData(rows.drop(cut).toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = reduceK(spark.table("strat_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    assert(streamed == batchOut,
      s"stream vs batch: ${(streamed.toSet diff batchOut.toSet).take(2)}")
  }

  test("streaming heavy hitters: MG bounds hold across micro-batch state") {
    // the corpus arrives as 3 micro-batches (maxFilesPerTrigger=1 over a
    // 3-file directory); the state store carries one ≤k-entry Misra-Gries
    // buffer per source across batches. The MG guarantee is merge-order
    // independent, so it must hold for the streamed sketch exactly as it
    // does for the batch one — that invariance is what makes the sketch
    // streamable at all
    import graft.streaming.DocsStream
    val dir = "target/stream_docs_hh"
    Tables(spark, sf, "documents").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val k = 20
    val q = DocsStream.heavyHitters(
        DocsStream.readDocsStream(spark, dir, filesPerTrigger = 1), k)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hh_out").collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Long](1).toMap).toMap
    val truth = Tables(spark, sf, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").count().collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    assert(streamed.keySet == truth.keySet, "a source lost its sketch")
    streamed.foreach { case (src, sketch) =>
      val exact = truth(src)
      val n = exact.values.sum
      assert(sketch.size <= k, s"$src sketch exceeded k")
      // every supra-threshold token present; estimates undercount ≤ n/(k+1)
      exact.filter(_._2 > n / (k + 1)).keys.foreach(t =>
        assert(sketch.contains(t), s"$src: guaranteed hitter $t evicted"))
      sketch.foreach { case (t, est) =>
        assert(est <= exact(t), s"$src/$t overcounted")
        assert(exact(t) - est <= n / (k + 1) + 1, s"$src/$t bound broken")
      }
    }
  }

  test("streaming Count-Min sketch is bit-identical to the batch sketch") {
    // CM merge is element-wise addition, so micro-batch cut points cannot
    // change the final counters — a strictly stronger claim than the MG
    // bounds above, and the reason a 100 TB ingest can answer
    // point-frequency queries mid-stream with no rescan
    import graft.streaming.DocsStream
    val dir = "target/stream_docs_cms"
    Tables(spark, sf, "documents").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val (d, w) = (4, 256)
    val q = DocsStream.tokenFrequencies(
        DocsStream.readDocsStream(spark, dir, filesPerTrigger = 1), d, w)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cms_out").collect()(0).getSeq[Long](0)
    val batch = DocsStream.tokenFrequencies(
      Tables(spark, sf, "documents"), d, w).collect()(0).getSeq[Long](0)
    assert(streamed == batch, "streamed sketch differs from batch sketch")
    assert(batch.sum > 0, "degenerate fixture: empty token stream")
  }

  test("streaming MinHash rollup is bit-identical to the batch rollup") {
    // element-wise MIN is commutative, associative AND idempotent, so the
    // per-source signature state is exact at every micro-batch cut — live
    // source-similarity estimates mid-ingest with no re-shingling
    import graft.streaming.DocsStream
    val dir = "target/stream_docs_minhash"
    Tables(spark, sf, "documents").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val q = DocsStream.minhashRollup(
        DocsStream.readDocsStream(spark, dir, filesPerTrigger = 1))
      .writeStream.format("memory").queryName("minhash_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1)) -> r.getLong(2)
    val streamed = spark.table("minhash_out").collect().map(key).toMap
    val batch = DocsStream.minhashRollup(Tables(spark, sf, "documents"))
      .collect().map(key).toMap
    assert(streamed == batch, "streamed signatures differ from batch")
    assert(batch.keySet.map(_._1).size > 1, "degenerate fixture: 1 source")
  }

  test("streaming corpus checksum is bit-identical to the batch checksum") {
    // modular sums commute, so the integrity fingerprint is exact at
    // every micro-batch cut — an ingest can certify content per trigger
    import graft.streaming.DocsStream
    val dir = "target/stream_docs_cksum"
    Tables(spark, sf, "documents").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val sq = DocsStream.corpusChecksum(
        DocsStream.readDocsStream(spark, dir, filesPerTrigger = 1))
      .writeStream.format("memory").queryName("cksum_out")
      .outputMode("complete").start()
    try sq.processAllAvailable() finally sq.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("checksum"),
          r.getAs[Long]("checksum2"), r.getAs[Long]("total_chars"))).toMap
    val streamed = keyed(spark.table("cksum_out").collect())
    val batch = keyed(q("q_corpus_checksum").collect())
    assert(streamed == batch, "streamed checksum state differs from batch")
    assert(batch.nonEmpty)
  }

  test("streaming theta sketch is bit-identical to the batch sketch") {
    // Kmv's set-union-keep-k merge is idempotent, so micro-batch cut
    // points and replayed rows cannot change the bottom-k state — live
    // distinct-user estimates per type from ≤k longs of state per key
    val dir = "target/stream_events_theta"
    Tables(spark, sf, "events").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = EventsStream.thetaDistinct(stream, 64).writeStream
      .format("memory").queryName("theta_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val streamed = keyed(spark.table("theta_out").collect())
    val batch = keyed(EventsStream.thetaDistinct(
      Tables(spark, sf, "events"), 64).collect())
    assert(streamed == batch, "streamed theta state differs from batch")
    assert(batch.values.forall(a => a == a.sorted && a.toSet.size == a.size),
      "sketch not sorted-distinct")
    assert(batch.nonEmpty)
  }

  test("streaming AUC census is bit-identical to batch; AUC matches q_auc_rank") {
    // sum/count partials merge associatively, so micro-batch cuts cannot
    // move the census; the AUC reduction over the streamed state must
    // then reproduce the gated batch value exactly
    val dir = "target/stream_events_auc"
    Tables(spark, sf, "events").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val qs = graft.streaming.EventsStream.scoreCensus(stream).writeStream
      .format("memory").queryName("auc_census").outputMode("complete").start()
    try qs.processAllAvailable() finally qs.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val streamed = keyed(spark.table("auc_census").collect())
    val batch = keyed(graft.queries.MLOps.scoreCensus(
      Tables(spark, sf, "events")).collect())
    assert(streamed == batch, "streamed score census differs from batch")
    val liveAuc = graft.queries.MLOps.aucFromCensus(spark.table("auc_census"))
      .collect()(0)
    val gated = q("q_auc_rank").collect()(0)
    assert(liveAuc.getAs[Long]("wins2") == gated.getAs[Long]("wins2"))
    assert(liveAuc.getAs[Double]("auc") == gated.getAs[Double]("auc"))
  }

  test("streaming A/B day census is bit-identical to batch") {
    val dir = "target/stream_events_ab"
    Tables(spark, sf, "events").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val qs = graft.streaming.EventsStream.abDailyCensus(stream).writeStream
      .format("memory").queryName("ab_census").outputMode("complete").start()
    try qs.processAllAvailable() finally qs.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val streamed = keyed(spark.table("ab_census").collect())
    val batch = keyed(graft.queries.TemporalOps.abDailyCensus(
      Tables(spark, sf, "events")).collect())
    assert(streamed == batch, "streamed A/B census differs from batch")
    assert(batch.nonEmpty)
  }

  test("streaming customer-life state reproduces the gated KM life table") {
    // min/max partials merge associatively, so micro-batch cuts cannot
    // move the per-customer (fd, ld) state; the census-sized KM tail
    // over the streamed state must then equal the gated batch query
    val dir = "target/stream_orders_km"
    Tables(spark, sf, "orders").select("o_custkey", "o_orderdate")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.OrdersStream.readOrdersStream(spark, dir)
    val qs = graft.streaming.OrdersStream.custLife(stream).writeStream
      .format("memory").queryName("km_life").outputMode("complete").start()
    try qs.processAllAvailable() finally qs.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.get(0) -> (r.get(1), r.get(2))).toMap
    val streamed = keyed(spark.table("km_life").collect())
    val batch = keyed(graft.queries.Sessions.custLife(
      Tables(spark, sf, "orders")).collect())
    assert(streamed == batch, "streamed life state differs from batch")
    val liveKm = graft.queries.Sessions.kmFromLife(spark.table("km_life"))
      .collect().map(_.toSeq).toSeq
    val gated = q("q_kaplan_meier").collect().map(_.toSeq).toSeq
    assert(liveKm == gated, "KM over streamed state differs from gated query")
    assert(gated.nonEmpty)
  }

  test("streaming daily-count state reproduces the gated dispersion row") {
    // COUNT partials are integer and associative — the one state shape
    // where streamed == batch is BIT-exact by construction (a double
    // revenue sum would re-associate across micro-batch cuts)
    val dir = "target/stream_orders_disp"
    Tables(spark, sf, "orders").select("o_custkey", "o_orderdate")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.OrdersStream.readOrdersStream(spark, dir)
    val qs = graft.streaming.OrdersStream.dailyCounts(stream).writeStream
      .format("memory").queryName("daily_counts").outputMode("complete")
      .start()
    try qs.processAllAvailable() finally qs.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.get(0).toString -> r.getLong(1)).toMap
    val streamed = keyed(spark.table("daily_counts").collect())
    val batch = keyed(graft.queries.TimeSeriesOps.dailyCounts(
      Tables(spark, sf, "orders")).collect())
    assert(streamed == batch, "streamed day census differs from batch")
    val live = graft.queries.TimeSeriesOps
      .dispersionFromDaily(spark.table("daily_counts"))
      .collect().map(_.toSeq).toSeq
    val gated = q("q_dispersion").collect().map(_.toSeq).toSeq
    assert(live == gated, "dispersion over streamed state differs from gated")
    assert(gated.nonEmpty)
  }

  test("sessions partition each user's events") {
    val nEvents = Tables(spark, sf, "events").count()
    val sessions = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == nEvents)
    sessions.foreach { r =>
      assert(r.getAs[Long]("start_s") <= r.getAs[Long]("end_s"))
    }
  }
}
