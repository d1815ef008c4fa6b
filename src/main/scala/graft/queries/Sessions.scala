package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics with batch oracles: gap-based sessionization
  * expressed with window functions (gaps-and-islands), and event-time
  * tumbling windows via the `window()` function. The streaming equivalents
  * (watermark + flatMapGroupsWithState) live in graft.streaming and are
  * checked against these in StreamingSpec.
  */
object Sessions {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String) = Tables(s, d, "events")

  /** Per-customer life bounds — fd = first, ld = last order date. min/max
    * are associative+commutative partials, so this exact aggregation also
    * runs as a Structured Streaming complete-mode state
    * (OrdersStream.custLife); StreamingSpec proves streamed == batch and
    * that [[kmFromLife]] over the streamed state reproduces the gated
    * q_kaplan_meier life table bit-for-bit.
    */
  private[graft] def custLife(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("fd"),
        max(col("o_orderdate")).as("ld"))

  /** Kaplan-Meier life table from the (o_custkey, fd, ld) state — the
    * batch tail shared by the gated query and the streaming twin. All
    * windows run over the duration census (≤100 rows); horizon and total
    * ride as 1-row broadcasts.
    */
  private[graft] def kmFromLife(life: DataFrame): DataFrame = {
    val horizon = life.agg(max(col("ld")).as("hz"))
    val durs = life.crossJoin(broadcast(horizon))
      .select(expr("datediff(ld, fd) div 30").as("t"),
        (datediff(col("hz"), col("ld")) > 365).cast("long").as("ev"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_exit"), sum(col("ev")).as("d"))
    val total = durs.agg(sum(col("n_exit")).as("n_total"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    durs.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_total") -
        coalesce(sum(col("n_exit")).over(wPrev), lit(0L)))
      .withColumn("term", when(col("d") < col("n_risk"),
        log((col("n_risk") - col("d")).cast("double") / col("n_risk"))))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .select(col("t"), col("n_risk"), col("d"),
        (col("n_exit") - col("d")).as("censored"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("term")).over(wCum)), 6))
          .as("s_hat"))
      .orderBy("t")
  }

  val queries: Map[String, Q] = Map(
    // ---- interval join (attribution): every click within the 30 minutes
    //      before a same-user purchase. One shuffle on user_id with the
    //      time range as a join-level filter — never a cross join; the
    //      stream-stream twin (watermarked, state-bounded) is
    //      EventsStream.attribution, equivalence-checked in StreamingSpec ----
    "q_interval_join" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_timestamp(col("ts")).as("secs"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("secs").as("click_s"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("secs").as("purchase_s"))
      p.join(c, Seq("user_id"))
        .filter(col("click_s") <= col("purchase_s") &&
          col("click_s") >= col("purchase_s") - 1800)
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          (col("purchase_s") - col("click_s")).as("gap_s"))
        .orderBy("user_id", "purchase_id", "click_id")
    }),

    // ---- multi-touch attribution over the 24 h lookback: first-touch,
    //      last-touch and LINEAR credit per channel for every purchase.
    //      Builds on the q_interval_join shape (one user_id shuffle, time
    //      range as a join filter) but resolves each purchase's touch set
    //      with min_by/max_by over (ts, touch_id) structs — map-side
    //      partial aggregation, NO per-purchase window sort. Credit
    //      arithmetic is all-integer: revenue in cents, linear credit in
    //      basis points via floor division (k·10000 div n) — deterministic
    //      under any merge order, value-exact vs the oracle ----
    "q_attribution" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_timestamp(col("ts")).as("secs"), col("value"))
      val t = e.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("event_type").as("channel"), col("secs").as("touch_s"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("secs").as("purchase_s"),
          ExactMoney.centsL(col("value")).as("cents"))
      val j = p.join(t, Seq("user_id"))
        .filter(col("touch_s") <= col("purchase_s") &&
          col("touch_s") >= col("purchase_s") - 86400)
        .select(col("purchase_id"), col("cents"), col("channel"),
          col("touch_s"), col("touch_id")).persistTracked()
      val per = j.groupBy(col("purchase_id"))
        .agg(min_by(col("channel"),
            struct(col("touch_s"), col("touch_id"))).as("first_ch"),
          max_by(col("channel"),
            struct(col("touch_s"), col("touch_id"))).as("last_ch"),
          count(lit(1)).as("n_touch"), min(col("cents")).as("cents"))
      val firsts = per.groupBy(col("first_ch").as("channel"))
        .agg(count(lit(1)).as("first_touch"))
      val lasts = per.groupBy(col("last_ch").as("channel"))
        .agg(count(lit(1)).as("last_touch"),
          sum(col("cents")).as("last_rev_cents"))
      val lin = j.groupBy(col("purchase_id"), col("channel"))
        .agg(count(lit(1)).as("k"))
        .join(per.select(col("purchase_id"), col("n_touch")), "purchase_id")
        .groupBy(col("channel"))
        .agg(sum(expr("k * 10000 div n_touch")).as("linear_bp"))
      lin.join(broadcast(firsts), Seq("channel"), "left")
        .join(broadcast(lasts), Seq("channel"), "left")
        .select(col("channel"),
          coalesce(col("first_touch"), lit(0L)).as("first_touch"),
          coalesce(col("last_touch"), lit(0L)).as("last_touch"),
          col("linear_bp"),
          coalesce(col("last_rev_cents"), lit(0L)).as("last_rev_cents"))
        .orderBy("channel")
    }),

    // ---- EXACT Shapley-value channel attribution (new in r14) —
    //      q_attribution's game-theoretic sibling. Players = the three
    //      touch channels; coalition value v(S) = purchases reached by
    //      at least one channel in S (within the same 24 h lookback).
    //      The corpus reduces to the ≤7-row touched-set census, v rides
    //      an 8-row subset spine, and the Shapley weights |S|!(n−|S|−1)!
    //      are held ×3! = ×6 so EVERYTHING is integer — φ_c×6 is exact,
    //      Σφ×6 = 6·v(N) by efficiency (spec-asserted). Bit tests are
    //      pure arithmetic ((m div 2^i) % 2), portable to both engines.
    //      One fine-key purchases⋈touches shuffle; every census join
    //      is ≤ 8×7 rows regardless of corpus size ----
    "q_shapley_attrib" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_timestamp(col("ts")).as("secs"))
      val t = e.filter(col("event_type").isin("click", "signup", "view"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("secs").as("touch_s"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("secs").as("purchase_s"))
      val perP = p.join(t, Seq("user_id"))
        .filter(col("touch_s") <= col("purchase_s") &&
          col("touch_s") >= col("purchase_s") - 86400)
        .groupBy(col("purchase_id"))
        .agg(max(when(col("channel") === "click", 1L).otherwise(0L))
            .as("b0"),
          max(when(col("channel") === "signup", 1L).otherwise(0L)).as("b1"),
          max(when(col("channel") === "view", 1L).otherwise(0L)).as("b2"))
        .select((col("b0") + col("b1") * 2 + col("b2") * 4).as("tmask"))
      val tcen = perP.groupBy(col("tmask")).agg(count(lit(1)).as("cnt"))
      val spine = s.range(0, 8).select(col("id").as("smask"))
      val v = spine.join(broadcast(tcen),
          expr("(smask % 2) * (tmask % 2) + " +
            "((smask div 2) % 2) * ((tmask div 2) % 2) + " +
            "((smask div 4) % 2) * ((tmask div 4) % 2) > 0"), "left")
        .groupBy(col("smask"))
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
        .persistTracked()
      val ch = s.range(0, 3).select(
        expr("CASE id WHEN 0 THEN 'click' WHEN 1 THEN 'signup' " +
          "ELSE 'view' END").as("channel"),
        expr("CASE id WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END").as("bv"))
      val vn = v.filter(col("smask") === 7).select(col("v").as("v_all"))
      ch.join(broadcast(v.select(col("smask"), col("v").as("v_s"))),
          expr("(smask div bv) % 2 = 0"))
        .join(broadcast(v.select(col("smask").as("smask2"),
          col("v").as("v_sc"))), expr("smask2 = smask + bv"))
        .select(col("channel"),
          expr("CASE (smask % 2) + (smask div 2) % 2 + (smask div 4) % 2 " +
            "WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END * (v_sc - v_s)")
            .as("contrib"))
        .groupBy(col("channel"))
        .agg(sum(col("contrib")).as("phi_x6"))
        .crossJoin(broadcast(vn))
        .select(col("channel"), col("phi_x6"),
          expr("phi_x6 * 10000 div (6 * v_all)").as("share_bp"),
          col("v_all").as("converted"))
        .orderBy("channel")
    }),

    // ---- gaps-and-islands sessionization (30-minute inactivity gap) ----
    // ---- inter-event gap histogram — the number the 30-minute session
    //      gap (and the streaming state timeout built on it) should be
    //      CHOSEN from, the way q_watermark_sizing chooses the watermark:
    //      per-user consecutive gaps bucketed on a fixed ladder (≤1m, ≤5m,
    //      ≤30m, ≤2h, ≤1d, >1d), with each bucket's share in bp and the
    //      cumulative share — the session cut should sit where the curve
    //      flattens. One user_id shuffle (the lag window), then a 6-row
    //      map-side-combined census; all-integer ----
    "q_gap_histogram" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("secs"), col("event_id"))
      val gaps = events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("secs"))
        .withColumn("gap_s", col("secs") - lag(col("secs"), 1).over(w))
        .filter(col("gap_s").isNotNull)
        .select(expr(
          """CASE WHEN gap_s <= 60 THEN 0 WHEN gap_s <= 300 THEN 1
            |     WHEN gap_s <= 1800 THEN 2 WHEN gap_s <= 7200 THEN 3
            |     WHEN gap_s <= 86400 THEN 4 ELSE 5 END""".stripMargin)
          .as("bucket"), col("gap_s"))
        .persistTracked()
      val tot = gaps.agg(count(lit(1)).as("n_total"))
      gaps.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"), max(col("gap_s")).as("max_gap_s"))
        .crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("(n_gaps * 10000) div n_total"))
        .withColumn("cum_bp", expr(
          """(sum(n_gaps) OVER (ORDER BY bucket
            |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |   * 10000) div n_total""".stripMargin))
        .select(col("bucket"), col("n_gaps"), col("max_gap_s"),
          col("share_bp"), col("cum_bp"))
        .orderBy("bucket")
    }),

    "q_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("secs").asc, col("event_id").asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        // whole seconds on both sides: sub-second precision differs between
        // the micros pipeline here and the oracle's ns timestamps
        .select(col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("secs"))
        .withColumn("brk",
          when(col("secs") - lag(col("secs"), 1).over(byUser) > 1800, 1).otherwise(0))
        .withColumn("sess_id", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("secs")).as("start_s"), max(col("secs")).as("end_s"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("user_id", "sess_id")
    }),

    // ---- RANGE window frame: per-user trailing-hour activity. Unlike a
    //      ROWS frame, the frame is VALUE-bounded (all events within 3600s,
    //      peers at equal timestamps included) — the standard rolling-metric
    //      shape; one shuffle on user_id ----
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("secs"))
        .rangeBetween(-3600, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("secs"), col("value"))
        .select(col("user_id"), col("event_id"), col("secs"),
          count(lit(1)).over(w).as("n_hour"),
          round(sum(col("value")).over(w), 2).as("val_hour"))
        .orderBy("event_id")
    }),

    // ---- native session_window(): Spark's built-in gap-session operator
    //      (the declarative alternative to the manual gaps-and-islands
    //      above; at scale it is one shuffle on user_id with session-merge
    //      in the aggregation). Timestamps truncated to whole seconds
    //      first so the gap boundary is exactly replicable in the oracle
    //      (which mirrors Spark's INCLUSIVE boundary: an event at exactly
    //      last + gap merges — see the oracle comment) ----
    "q_session_window" -> ((s, d) =>
      events(s, d)
        .withColumn("ts_sec", timestamp_seconds(unix_timestamp(col("ts"))))
        .groupBy(col("user_id"), session_window(col("ts_sec"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("start_s"),
          unix_timestamp(col("session_window.end")).as("end_s"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "start_s")),

    // ---- event-time tumbling window via window() (batch twin of the
    //      streaming watermark aggregation) ----
    "q_events_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").cast("string").as("hour_ts"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_ts", "event_type")),

    // ---- SLIDING event-time windows (1 h length, 15 min slide): each event
    //      lands in exactly length/slide = 4 overlapping windows; window()
    //      expands them and the aggregation is an ordinary map-side-combined
    //      groupBy on (window, type) — the 4× row expansion happens BEFORE
    //      the partial agg, so the shuffle still moves only group rows.
    //      Start keys are integer epoch seconds (grid-aligned), so the
    //      oracle replicates the assignment with pure integer arithmetic ----
    "q_events_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("start_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("start_s", "event_type")),

    // ---- ordered funnel (view → click → purchase): stage k's entry time
    //      is the user's earliest qualifying event STRICTLY AFTER stage
    //      k−1 AND within a 24-hour conversion window of it — the sequence-
    //      plus-deadline constraint product analytics means by "funnel",
    //      not three independent existence checks. Each stage is a
    //      per-user min over a filtered slice joined back on user_id
    //      (fine key, shuffle join; per-user state is one timestamp).
    //      Census output: total users and survivors per stage ----
    "q_funnel" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("secs")).persistTracked()
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("secs")).as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("secs") > col("t1") && col("secs") <= col("t1") + 86400)
        .groupBy(col("user_id")).agg(min(col("secs")).as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("secs") > col("t2") && col("secs") <= col("t2") + 86400)
        .groupBy(col("user_id")).agg(min(col("secs")).as("t3"))
      val total = e.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      total.crossJoin(broadcast(v.agg(count(lit(1)).as("n_view"))))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_full_funnel"))))
    }),

    // ---- cohort retention: users grouped by first-seen week (cohort),
    //      counted in each later week they were active — the
    //      (cohort_week, offset) retention triangle. Active weeks dedup on
    //      the fine (user, week) key; the cohort label joins back on
    //      user_id. All-integer week arithmetic against a fixed epoch ----
    // ---- cohort LTV curves — q_retention_cohorts' revenue sibling: per
    //      signup-week cohort, cumulative purchase revenue by week of
    //      life and per-user LTV. Revenue rides as BIGINT cents (round at
    //      ingest, never re-round a float sum); the running sum is a
    //      window over the (cohort × offset) CENSUS — bounded rows at any
    //      event volume — and per-user LTV is one integer floor division
    //      at output. Two fine-key shuffles (user cohort, census), the
    //      same spine as the retention triangle so the two reports can
    //      never disagree on cohort definitions ----
    "q_cohort_ltv" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        expr("(unix_timestamp(ts) - 1704067200) div 604800").as("wk"),
        col("value"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
        .persistTracked()
      val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("n_users"))
      val rev = e.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .groupBy(col("cw"), (col("wk") - col("cw")).as("offset_weeks"))
        .agg(sum(ExactMoney.centsL(col("value"))).as("rev_cents"))
      val wcum = Window.partitionBy(col("cw")).orderBy(col("offset_weeks"))
        .rowsBetween(Window.unboundedPreceding, 0)
      rev
        .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wcum))
        .join(sizes, "cw")
        .select(col("cw").as("cohort_week"), col("offset_weeks"),
          col("n_users"), col("rev_cents"), col("cum_rev_cents"),
          expr("cum_rev_cents div n_users").as("ltv_cents_per_user"))
        .orderBy("cohort_week", "offset_weeks")
    }),

    "q_retention_cohorts" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("(unix_timestamp(ts) - 1704067200) div 604800").as("wk"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      e.distinct().join(cohort, "user_id")
        .groupBy(col("cw").as("cohort_week"),
          (col("wk") - col("cw")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    }),

    // ---- Kaplan-Meier survival over customer lifetimes — the churn
    //      curve behind every retention model. A customer's lifetime is
    //      30-day periods between first and last order; one quiet for
    //      the final 365 days of the horizon is a CHURN EVENT, one still
    //      ordering is CENSORED (the estimator's whole point: censored
    //      customers leave the at-risk pool without counting as deaths).
    //      Life table per distinct duration t: n_risk (alive entering
    //      t), d (churns at t), Ŝ(t) = Π_{t'≤t} (1 − d/n_risk).
    //      Scale: one fine-key shuffle (custkey), then ALL windows run
    //      over the duration CENSUS (≤ horizon-months rows at any order
    //      volume); the horizon and total ride as 1-row broadcasts, the
    //      repo's no-driver-action convention. Determinism: counts are
    //      integer; Ŝ evaluates as exp(Σ ln((n−d)/n)) over the ≤100-term
    //      census — each term one IEEE division + libm ln, summed in
    //      census order on both engines, 6-dp rounding absorbing ulps
    //      (the q_calibration device). d = n_risk (pool dies) would hit
    //      ln(0): both engines pin Ŝ to 0 from that row on via an
    //      integer prefix flag, no libm edge case in the output ----
    "q_kaplan_meier" -> ((s, d) =>
      kmFromLife(custLife(Tables(s, d, "orders")).persistTracked())),

    // ---- Nelson-Aalen cumulative hazard — [[q_kaplan_meier]]'s other
    //      estimator (new in r14): H(t) = Σ_{t'≤t} d/n_risk with the
    //      plug-in survival exp(−H) and the Aalen variance Σ d/n².
    //      Same spine as KM — one custkey shuffle, duration census,
    //      ordered folds ONLY over the ≤100-row census. Each term is one
    //      IEEE division of exact integers (identical left-assoc shape
    //      both engines); 6-dp output rounding absorbs fold-order ulps
    //      (DuckDB windowed SUM accumulates pairwise) ----
    "q_nelson_aalen" -> ((s, d) => {
      val life = custLife(Tables(s, d, "orders")).persistTracked()
      val horizon = life.agg(max(col("ld")).as("hz"))
      val durs = life.crossJoin(broadcast(horizon))
        .select(expr("datediff(ld, fd) div 30").as("t"),
          (datediff(col("hz"), col("ld")) > 365).cast("long").as("ev"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_exit"), sum(col("ev")).as("d"))
      val total = durs.agg(sum(col("n_exit")).as("n_total"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      durs.crossJoin(broadcast(total))
        .withColumn("n_risk", col("n_total") -
          coalesce(sum(col("n_exit")).over(wPrev), lit(0L)))
        .withColumn("h_term", col("d").cast("double") / col("n_risk"))
        .withColumn("v_term",
          col("d") / (col("n_risk").cast("double") * col("n_risk")))
        .select(col("t"), col("n_risk"), col("d"),
          round(sum(col("h_term")).over(wCum), 6).as("cum_hazard"),
          round(exp(-sum(col("h_term")).over(wCum)), 6).as("s_na"),
          round(sum(col("v_term")).over(wCum), 6).as("var_na"))
        .orderBy("t")
    }),

    // ---- log-rank test — [[q_kaplan_meier]]'s inferential companion:
    //      do BUILDING-segment customers churn on a different clock than
    //      the rest? At each event time the observed group-1 churns are
    //      compared to the hypergeometric expectation d·n₁/n given the
    //      at-risk split; χ² = (Σ(O−E))²/ΣV. Same spine as the KM query
    //      (one custkey shuffle + duration census); the two cumulative
    //      sums run as ORDERED window folds over the census. Note the
    //      cross-engine agreement relies on the 4-dp/6-dp output rounding
    //      absorbing accumulation-order ulps, NOT on bit-identical sums:
    //      DuckDB evaluates windowed SUM with a segment-tree (pairwise)
    //      accumulation, so the ~100-term double folds are only
    //      ulp-close, not order-identical. Each per-term expression IS
    //      written in the same left-associative shape on both sides,
    //      which keeps the terms themselves bit-equal ----
    "q_logrank" -> ((s, d) => {
      val grp = Tables(s, d, "customer")
        .select(col("c_custkey"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("g1"))
      val life = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("fd"),
          max(col("o_orderdate")).as("ld"))
        .join(grp, col("o_custkey") === col("c_custkey"))
        .persistTracked()
      val horizon = life.agg(max(col("ld")).as("hz"))
      val durs = life.crossJoin(broadcast(horizon))
        .select(expr("datediff(ld, fd) div 30").as("t"),
          (datediff(col("hz"), col("ld")) > 365).cast("long").as("ev"),
          col("g1"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_exit"), sum(col("ev")).as("dd"),
          sum(col("g1")).as("n1_exit"),
          sum(col("ev") * col("g1")).as("d1"))
      val total = durs.agg(sum(col("n_exit")).as("n_tot"),
        sum(col("n1_exit")).as("n1_tot"),
        sum(col("dd")).as("d_tot"), sum(col("d1")).as("d1_tot"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      durs.crossJoin(broadcast(total))
        .withColumn("n_at", col("n_tot") -
          coalesce(sum(col("n_exit")).over(wPrev), lit(0L)))
        .withColumn("n1_at", col("n1_tot") -
          coalesce(sum(col("n1_exit")).over(wPrev), lit(0L)))
        .withColumn("oe", col("d1") -
          col("dd").cast("double") * col("n1_at") / col("n_at"))
        .withColumn("v", when(col("n_at") > 1,
          col("dd").cast("double") * col("n1_at") / col("n_at") *
            (lit(1.0) - col("n1_at").cast("double") / col("n_at")) *
            (col("n_at") - col("dd")) / (col("n_at") - 1))
          .otherwise(lit(0.0)))
        .withColumn("cum_oe", sum(col("oe")).over(wCum))
        .withColumn("cum_v", sum(col("v")).over(wCum))
        .orderBy(col("t").desc).limit(1)
        .select(col("n1_tot").as("n1"),
          (col("n_tot") - col("n1_tot")).as("n2"),
          col("d1_tot").as("d1"), (col("d_tot") - col("d1_tot")).as("d2"),
          round(col("cum_oe"), 6).as("o_minus_e"),
          round(col("cum_v"), 6).as("variance"),
          round(col("cum_oe") * col("cum_oe") / col("cum_v"), 4).as("chi2"))
    }),

    // ---- frequent event sequences (behavioral trigram mining): each
    //      user's event stream yields its consecutive type trigrams via
    //      two lead() calls over ONE (user_id)-partitioned sort — no
    //      self-join explosion; the trigram alphabet is types³ so the
    //      count aggregation is census-bounded. Ranking by integer count;
    //      top-15 via TakeOrderedAndProject heap ----
    "q_event_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("secs").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("secs"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("seq"))
        .groupBy(col("seq")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("seq").asc)
        .limit(15)
    }),

    // ---- cumulative distinct users by day WITHOUT a distinct-in-window:
    //      each user collapses to a first-seen day (one fine-key groupBy),
    //      then a running sum over the per-day census. The window is over
    //      DAYS (census-size rows — 30 here, bounded by calendar at any
    //      corpus size), never over users ----
    "q_cumulative_users" -> ((s, d) => {
      val firstDay = events(s, d)
        .select(col("user_id"),
          expr("(unix_timestamp(ts) - 1704067200) div 86400").as("day"))
        .groupBy(col("user_id")).agg(min(col("day")).as("fd"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstDay.groupBy(col("fd").as("day"))
        .agg(count(lit(1)).as("n_new"))
        .withColumn("cum_users", sum(col("n_new")).over(w))
        .orderBy("day")
    }),

    // ---- audience overlap matrix: Jaccard between the user sets of every
    //      event-type pair — which audiences are the same people, which
    //      are disjoint (the targeting/segmentation census). Shape: ONE
    //      distinct (type, user) census on the fine user key, self-joined
    //      on user_id — per-user fanout is bounded by the type alphabet
    //      (≤5², never quadratic in users), and the ≤5-row per-type totals
    //      ride back as a broadcast. Jaccard in basis points by integer
    //      floor division. At 100 TB the census distinct is the only
    //      corpus-sized shuffle ----
    "q_audience_overlap" -> ((s, d) => {
      val au = events(s, d)
        .select(col("event_type").as("et"), col("user_id")).distinct()
      val sizes = au.groupBy(col("et")).agg(count(lit(1)).as("n"))
      val both = au.as("a").join(au.as("b"), "user_id")
        .filter(col("a.et") < col("b.et"))
        .groupBy(col("a.et").as("et_a"), col("b.et").as("et_b"))
        .agg(count(lit(1)).as("n_both"))
      both
        .join(broadcast(sizes.select(col("et").as("et_a"), col("n").as("n_a"))),
          "et_a")
        .join(broadcast(sizes.select(col("et").as("et_b"), col("n").as("n_b"))),
          "et_b")
        .select(col("et_a"), col("et_b"), col("n_a"), col("n_b"), col("n_both"),
          expr("(n_both * 10000) div (n_a + n_b - n_both)").as("jaccard_bp"))
        .orderBy("et_a", "et_b")
    }),

    // ---- conversion lag histogram: days from first signup to first
    //      subsequent purchase, with never-converted as the -1 bucket —
    //      the funnel's TIME dimension (q_funnel counts who, this counts
    //      how long). Three fine-key user aggregations and one user-keyed
    //      join; the histogram reduction is alphabet-sized. All-integer
    //      day arithmetic ----
    "q_conversion_lag" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("secs"))
      val sg = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("secs")).as("s0"))
      val conv = e.filter(col("event_type") === "purchase")
        .join(sg, "user_id")
        .filter(col("secs") >= col("s0"))
        .groupBy(col("user_id")).agg(min(col("secs")).as("p0"))
      sg.join(conv, Seq("user_id"), "left")
        .select(col("user_id"), col("s0"),
          when(col("p0").isNull, lit(-1L))
            .otherwise(expr("(p0 - s0) div 86400")).as("lag_days"))
        .groupBy(col("lag_days")).agg(count(lit(1)).as("n_users"))
        .orderBy("lag_days")
    }),

    // ---- RFM segmentation census: per purchasing user, Recency (days
    //      since last purchase, against the corpus max-ts anchor),
    //      Frequency (purchase count) and Monetary (cents) — bucketed by
    //      FIXED integer thresholds (quantile buckets would make every
    //      bucket edge an FP tie across engines), then the
    //      (r, f, m)-bucket census. One fine-key user aggregation, the
    //      1-row anchor broadcast, an alphabet-sized reduction ----
    "q_rfm_segments" -> ((s, d) => {
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("secs"),
          col("value"))
      val anchor = p.agg(max(col("secs")).as("t_max"))
      val rfm = p.groupBy(col("user_id"))
        .agg(max(col("secs")).as("last_s"),
          count(lit(1)).as("f"),
          sum(ExactMoney.centsL(col("value"))).as("m_cents"))
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          least(expr("((t_max - last_s) div 86400) div 2"), lit(5L))
            .as("r_bucket"),
          least(expr("f div 5"), lit(5L)).as("f_bucket"),
          least(expr("m_cents div 30000"), lit(5L)).as("m_bucket"),
          col("m_cents"))
      rfm.groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("m_cents")).as("segment_cents"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    // same ladder, same integer shares; the running sum is CAST back to
    // BIGINT so pandas keeps the integer dtype class
    "q_gap_histogram" ->
      """WITH e AS MATERIALIZED (
        |  SELECT user_id, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events),
        |g AS MATERIALIZED (
        |  SELECT secs - lag(secs) OVER (PARTITION BY user_id
        |           ORDER BY secs, event_id) AS gap_s
        |  FROM e),
        |b AS MATERIALIZED (
        |  SELECT CASE WHEN gap_s <= 60 THEN 0 WHEN gap_s <= 300 THEN 1
        |              WHEN gap_s <= 1800 THEN 2 WHEN gap_s <= 7200 THEN 3
        |              WHEN gap_s <= 86400 THEN 4 ELSE 5 END AS bucket,
        |         gap_s
        |  FROM g WHERE gap_s IS NOT NULL),
        |t AS (SELECT count(*) AS n_total FROM b),
        |c AS (SELECT bucket, count(*) AS n_gaps, max(gap_s) AS max_gap_s
        |      FROM b GROUP BY bucket)
        |SELECT bucket, n_gaps, max_gap_s,
        |       (n_gaps * 10000) // n_total AS share_bp,
        |       (CAST(sum(n_gaps) OVER (ORDER BY bucket
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) * 10000) // n_total AS cum_bp
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,

    "q_event_sequences" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events),
        |t AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER w AS s2,
        |         lead(event_type, 2) OVER w AS s3
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY secs ASC, event_id ASC))
        |SELECT s1 || '>' || s2 || '>' || s3 AS seq, count(*) AS n
        |FROM t WHERE s3 IS NOT NULL
        |GROUP BY s1 || '>' || s2 || '>' || s3
        |ORDER BY n DESC, seq ASC LIMIT 15""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events),
        |v AS (SELECT user_id, min(secs) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.secs) AS t2
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click'
        |        AND e.secs > v.t1 AND e.secs <= v.t1 + 86400
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.secs) AS t3
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase'
        |        AND e.secs > c.t2 AND e.secs <= c.t2 + 86400
        |      GROUP BY e.user_id)
        |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
        |       (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin,

    // same cents-at-ingest, same census-level running sum
    "q_cohort_ltv" ->
      """WITH e AS MATERIALIZED (
        |  SELECT user_id, event_type,
        |         (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 604800
        |           AS wk,
        |         value
        |  FROM events),
        |cohort AS MATERIALIZED (
        |  SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
        |sizes AS (SELECT cw, count(*) AS n_users FROM cohort GROUP BY cw),
        |rev AS MATERIALIZED (
        |  SELECT c.cw, e.wk - c.cw AS offset_weeks,
        |         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |           AS rev_cents
        |  FROM e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY c.cw, e.wk - c.cw)
        |SELECT rev.cw AS cohort_week, offset_weeks, n_users, rev_cents,
        |       CAST(sum(rev_cents) OVER (PARTITION BY rev.cw
        |         ORDER BY offset_weeks
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_rev_cents,
        |       CAST(sum(rev_cents) OVER (PARTITION BY rev.cw
        |         ORDER BY offset_weeks
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) // n_users AS ltv_cents_per_user
        |FROM rev JOIN sizes ON rev.cw = sizes.cw
        |ORDER BY cohort_week, offset_weeks""".stripMargin,

    // same life table: ln/exp product with the identical census
    // ordering; the prefix max(z) pins Ŝ to 0 past a pool-death row
    "q_kaplan_meier" ->
      """WITH life AS MATERIALIZED (
        |  SELECT o_custkey, min(o_orderdate) AS fd, max(o_orderdate) AS ld
        |  FROM orders GROUP BY o_custkey),
        |h AS (SELECT max(ld) AS hz FROM life),
        |durs AS (
        |  SELECT CAST(datediff('day', fd, ld) // 30 AS BIGINT) AS t,
        |         count(*) AS n_exit,
        |         CAST(sum(CASE WHEN datediff('day', ld, hz) > 365
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM life, h GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_exit) AS BIGINT) AS n_total FROM durs),
        |km AS (
        |  SELECT t, n_exit, d,
        |         n_total - CAST(COALESCE(sum(n_exit) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_risk
        |  FROM durs, tot),
        |km2 AS (
        |  SELECT t, n_risk, d, n_exit - d AS censored,
        |         CASE WHEN d < n_risk
        |              THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk) END
        |           AS term,
        |         CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM km)
        |SELECT t, n_risk, d, censored,
        |       CASE WHEN max(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |                 PRECEDING AND CURRENT ROW) = 1 THEN 0.0
        |            ELSE round(exp(sum(term) OVER (ORDER BY t ROWS BETWEEN
        |                 UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END
        |         AS s_hat
        |FROM km2 ORDER BY t""".stripMargin,

    // identical life/duration census; per-term divisions written in the
    // same left-assoc shape; cumulative folds ulp-close, rounded at 6 dp
    "q_nelson_aalen" ->
      """WITH life AS MATERIALIZED (
        |  SELECT o_custkey, min(o_orderdate) AS fd, max(o_orderdate) AS ld
        |  FROM orders GROUP BY o_custkey),
        |h AS (SELECT max(ld) AS hz FROM life),
        |durs AS (
        |  SELECT CAST(datediff('day', fd, ld) // 30 AS BIGINT) AS t,
        |         count(*) AS n_exit,
        |         CAST(sum(CASE WHEN datediff('day', ld, hz) > 365
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM life, h GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_exit) AS BIGINT) AS n_total FROM durs),
        |na AS (
        |  SELECT t, d,
        |         n_total - CAST(COALESCE(sum(n_exit) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_risk
        |  FROM durs, tot),
        |na2 AS (
        |  SELECT t, n_risk, d,
        |         CAST(d AS DOUBLE) / n_risk AS h_term,
        |         d / (CAST(n_risk AS DOUBLE) * n_risk) AS v_term
        |  FROM na)
        |SELECT t, n_risk, d,
        |       round(sum(h_term) OVER wc, 6) AS cum_hazard,
        |       round(exp(-sum(h_term) OVER wc), 6) AS s_na,
        |       round(sum(v_term) OVER wc, 6) AS var_na
        |FROM na2
        |WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND CURRENT ROW)
        |ORDER BY t""".stripMargin,

    // identical census, expectation/variance expressions in the same
    // left-associative order; cumulative sums are ulp-close (DuckDB's
    // windowed SUM is a pairwise segment tree), absorbed by the rounding
    "q_logrank" ->
      """WITH life AS MATERIALIZED (
        |  SELECT l.o_custkey, l.fd, l.ld,
        |         CAST(c.c_mktsegment = 'BUILDING' AS BIGINT) AS g1
        |  FROM (SELECT o_custkey, min(o_orderdate) AS fd,
        |               max(o_orderdate) AS ld
        |        FROM orders GROUP BY o_custkey) l
        |  JOIN customer c ON l.o_custkey = c.c_custkey),
        |h AS (SELECT max(ld) AS hz FROM life),
        |durs AS (
        |  SELECT CAST(datediff('day', fd, ld) // 30 AS BIGINT) AS t,
        |         count(*) AS n_exit,
        |         CAST(sum(CASE WHEN datediff('day', ld, hz) > 365
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        |         CAST(sum(g1) AS BIGINT) AS n1_exit,
        |         CAST(sum(CASE WHEN datediff('day', ld, hz) > 365
        |                       THEN g1 ELSE 0 END) AS BIGINT) AS d1
        |  FROM life, h GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_exit) AS BIGINT) AS n_tot,
        |               CAST(sum(n1_exit) AS BIGINT) AS n1_tot,
        |               CAST(sum(dd) AS BIGINT) AS d_tot,
        |               CAST(sum(d1) AS BIGINT) AS d1_tot FROM durs),
        |at AS (
        |  SELECT t, n_exit, dd, d1, n_tot, n1_tot, d_tot, d1_tot,
        |         n_tot - CAST(COALESCE(sum(n_exit) OVER wp, 0) AS BIGINT)
        |           AS n_at,
        |         n1_tot - CAST(COALESCE(sum(n1_exit) OVER wp, 0) AS BIGINT)
        |           AS n1_at
        |  FROM durs, tot
        |  WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND 1 PRECEDING)),
        |terms AS (
        |  SELECT t, n_tot, n1_tot, d_tot, d1_tot,
        |         d1 - CAST(dd AS DOUBLE) * n1_at / n_at AS oe,
        |         CASE WHEN n_at > 1
        |              THEN CAST(dd AS DOUBLE) * n1_at / n_at *
        |                   (1.0 - CAST(n1_at AS DOUBLE) / n_at) *
        |                   (n_at - dd) / (n_at - 1)
        |              ELSE 0.0 END AS v
        |  FROM at),
        |cum AS (
        |  SELECT t, n_tot, n1_tot, d_tot, d1_tot,
        |         sum(oe) OVER wc AS cum_oe, sum(v) OVER wc AS cum_v
        |  FROM terms
        |  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND CURRENT ROW))
        |SELECT n1_tot AS n1, n_tot - n1_tot AS n2,
        |       d1_tot AS d1, d_tot - d1_tot AS d2,
        |       round(cum_oe, 6) AS o_minus_e,
        |       round(cum_v, 6) AS variance,
        |       round(cum_oe * cum_oe / cum_v, 4) AS chi2
        |FROM cum ORDER BY t DESC LIMIT 1""".stripMargin,

    "q_retention_cohorts" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |         (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 604800 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id)
        |SELECT c.cw AS cohort_week, e.wk - c.cw AS offset_weeks,
        |       count(*) AS n_users
        |FROM e JOIN cohort c ON e.user_id = c.user_id
        |GROUP BY c.cw, e.wk - c.cw
        |ORDER BY cohort_week, offset_weeks""".stripMargin,

    "q_cumulative_users" ->
      """WITH fd AS (
        |  SELECT user_id,
        |         min((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 86400)
        |           AS fd
        |  FROM events GROUP BY user_id),
        |daily AS (SELECT fd AS day, count(*) AS n_new FROM fd GROUP BY fd)
        |SELECT day, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_users
        |FROM daily ORDER BY day""".stripMargin,

    // row_number in the oracle == min_by/max_by over (ts, id) structs in
    // the engine: touch_id is unique, so both induce the same total order
    "q_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS secs, value
        |           FROM events),
        |t AS (SELECT user_id, event_id AS touch_id, event_type AS channel,
        |             secs AS touch_s
        |      FROM e WHERE event_type IN ('click', 'view', 'signup')),
        |p AS (SELECT user_id, event_id AS purchase_id, secs AS purchase_s,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM e WHERE event_type = 'purchase'),
        |j AS (SELECT purchase_id, cents, channel, touch_s, touch_id
        |      FROM p JOIN t ON p.user_id = t.user_id
        |       AND touch_s <= purchase_s AND touch_s >= purchase_s - 86400),
        |rk AS (SELECT purchase_id, cents, channel,
        |         row_number() OVER (PARTITION BY purchase_id
        |                            ORDER BY touch_s ASC, touch_id ASC) AS rf,
        |         row_number() OVER (PARTITION BY purchase_id
        |                            ORDER BY touch_s DESC, touch_id DESC) AS rl
        |       FROM j),
        |firsts AS (SELECT channel, count(*) AS first_touch
        |           FROM rk WHERE rf = 1 GROUP BY channel),
        |lasts AS (SELECT channel, count(*) AS last_touch,
        |                 CAST(sum(cents) AS BIGINT) AS last_rev_cents
        |          FROM rk WHERE rl = 1 GROUP BY channel),
        |nn AS (SELECT purchase_id, count(*) AS n FROM j GROUP BY purchase_id),
        |kk AS (SELECT purchase_id, channel, count(*) AS k
        |       FROM j GROUP BY purchase_id, channel),
        |lin AS (SELECT channel, CAST(sum((k * 10000) // n) AS BIGINT) AS linear_bp
        |        FROM kk JOIN nn USING (purchase_id) GROUP BY channel)
        |SELECT l.channel,
        |       coalesce(f.first_touch, 0) AS first_touch,
        |       coalesce(s.last_touch, 0) AS last_touch,
        |       l.linear_bp,
        |       coalesce(s.last_rev_cents, 0) AS last_rev_cents
        |FROM lin l LEFT JOIN firsts f USING (channel)
        |           LEFT JOIN lasts s USING (channel)
        |ORDER BY l.channel""".stripMargin,

    // identical touched-set census, identical arithmetic bit tests and
    // ×6 integer Shapley weights — all-integer, hash-exact
    "q_shapley_attrib" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |           FROM events),
        |t AS (SELECT user_id, event_type AS channel, secs AS touch_s
        |      FROM e WHERE event_type IN ('click', 'signup', 'view')),
        |p AS (SELECT user_id, event_id AS purchase_id, secs AS purchase_s
        |      FROM e WHERE event_type = 'purchase'),
        |perp AS (
        |  SELECT purchase_id,
        |         max(CASE WHEN channel = 'click' THEN 1 ELSE 0 END)
        |       + max(CASE WHEN channel = 'signup' THEN 1 ELSE 0 END) * 2
        |       + max(CASE WHEN channel = 'view' THEN 1 ELSE 0 END) * 4
        |           AS tmask
        |  FROM p JOIN t ON p.user_id = t.user_id
        |   AND touch_s <= purchase_s AND touch_s >= purchase_s - 86400
        |  GROUP BY purchase_id),
        |tcen AS (SELECT tmask, count(*) AS cnt FROM perp GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 8)) AS smask),
        |v AS (SELECT smask, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS v
        |      FROM spine LEFT JOIN tcen
        |        ON (smask % 2) * (tmask % 2)
        |         + ((smask // 2) % 2) * ((tmask // 2) % 2)
        |         + ((smask // 4) % 2) * ((tmask // 4) % 2) > 0
        |      GROUP BY smask),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('signup', 2),
        |                             ('view', 4)) AS cc(channel, bv)),
        |pairs AS (
        |  SELECT channel,
        |         (CASE (v1.smask % 2) + (v1.smask // 2) % 2
        |               + (v1.smask // 4) % 2
        |          WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
        |           * (v2.v - v1.v) AS contrib
        |  FROM ch JOIN v v1 ON (v1.smask // bv) % 2 = 0
        |          JOIN v v2 ON v2.smask = v1.smask + bv),
        |phi AS (SELECT channel, CAST(sum(contrib) AS BIGINT) AS phi_x6
        |        FROM pairs GROUP BY 1),
        |vn AS (SELECT v AS v_all FROM v WHERE smask = 7)
        |SELECT channel, phi_x6,
        |       CAST(phi_x6 * 10000 // (6 * v_all) AS BIGINT) AS share_bp,
        |       v_all AS converted
        |FROM phi, vn ORDER BY channel""".stripMargin,

    "q_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |           FROM events),
        |c AS (SELECT user_id, event_id AS click_id, secs AS click_s
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, secs AS purchase_s
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, purchase_id, click_id,
        |       purchase_s - click_s AS gap_s
        |FROM p JOIN c ON p.user_id = c.user_id
        | AND click_s <= purchase_s AND click_s >= purchase_s - 1800
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN secs - lag(secs) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY secs ASC, event_id ASC)),
        |s AS (
        |  SELECT *, CAST(sum(brk) OVER (
        |      PARTITION BY user_id ORDER BY secs ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM b)
        |SELECT user_id, sess_id, min(secs) AS start_s, max(secs) AS end_s,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    "q_window_range" ->
      """SELECT user_id, event_id, secs,
        |       count(*) OVER w AS n_hour,
        |       round(sum(value) OVER w, 2) AS val_hour
        |FROM (SELECT user_id, event_id, value,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY secs
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // session_window semantics (matched to Spark's native operator,
    // verified on data with a gap of exactly 1800 s — sf0.1 user 511):
    // an event at EXACTLY last + gap still MERGES (inclusive boundary,
    // same as the manual q_sessionize's > 1800 break); only a strictly
    // greater gap starts a new session; session end = last event + gap
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN secs - lag(secs) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY secs ASC)),
        |s AS (
        |  SELECT *, CAST(sum(brk) OVER (
        |      PARTITION BY user_id ORDER BY secs ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM b)
        |SELECT user_id, min(secs) AS start_s, max(secs) + 1800 AS end_s,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, start_s""".stripMargin,

    "q_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // window(ts, 1h, 15m) assignment: the last window containing ts starts
    // at floor(epoch/900)*900; the 4 containing windows start k*900 earlier
    "q_events_sliding" ->
      """SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - k.range * 900
        |         AS start_s,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events, range(0, 4) k
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same distinct census, same alphabet-bounded self-join, integer bp
    "q_audience_overlap" ->
      """WITH au AS MATERIALIZED (
        |  SELECT DISTINCT event_type AS et, user_id FROM events),
        |sz AS (SELECT et, count(*) AS n FROM au GROUP BY et),
        |b AS (SELECT a.et AS et_a, bb.et AS et_b, count(*) AS n_both
        |      FROM au a JOIN au bb
        |        ON a.user_id = bb.user_id AND a.et < bb.et
        |      GROUP BY 1, 2)
        |SELECT et_a, et_b, CAST(sa.n AS BIGINT) AS n_a,
        |       CAST(sb.n AS BIGINT) AS n_b, CAST(n_both AS BIGINT) AS n_both,
        |       (CAST(n_both AS BIGINT) * 10000)
        |         // (sa.n + sb.n - n_both) AS jaccard_bp
        |FROM b JOIN sz sa ON b.et_a = sa.et JOIN sz sb ON b.et_b = sb.et
        |ORDER BY et_a, et_b""".stripMargin,

    // same first-signup / first-subsequent-purchase aggregation, -1 bucket
    // for the never-converted
    "q_conversion_lag" ->
      """WITH e AS MATERIALIZED (
        |  SELECT user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events),
        |sg AS MATERIALIZED (
        |  SELECT user_id, min(secs) AS s0 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, min(secs) AS p0
        |  FROM e JOIN sg ON e.user_id = sg.user_id
        |  WHERE event_type = 'purchase' AND secs >= s0
        |  GROUP BY e.user_id)
        |SELECT CASE WHEN p0 IS NULL THEN CAST(-1 AS BIGINT)
        |            ELSE (p0 - s0) // 86400 END AS lag_days,
        |       count(*) AS n_users
        |FROM sg LEFT JOIN conv ON sg.user_id = conv.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same cents-at-ingest, same fixed-threshold buckets
    "q_rfm_segments" ->
      """WITH p AS MATERIALIZED (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT max(secs) AS t_max FROM p),
        |rfm AS (
        |  SELECT user_id,
        |         least(((t_max - max(secs)) // 86400) // 2,
        |               CAST(5 AS BIGINT)) AS r_bucket,
        |         least(count(*) // 5, CAST(5 AS BIGINT)) AS f_bucket,
        |         least(CAST(sum(cents) AS BIGINT) // 30000,
        |               CAST(5 AS BIGINT)) AS m_bucket,
        |         CAST(sum(cents) AS BIGINT) AS m_cents
        |  FROM p CROSS JOIN a GROUP BY user_id, t_max)
        |SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_users,
        |       CAST(sum(m_cents) AS BIGINT) AS segment_cents
        |FROM rfm GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  )
}
