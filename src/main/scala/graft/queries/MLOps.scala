package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-engine model training and evaluation: logistic regression by
  * full-batch gradient descent with its calibration (reliability)
  * diagram, and a multinomial Naive Bayes classifier — the "can the
  * engine train a model" primitives (feature pipelines end in exactly
  * these shapes before a GPU ever gets involved).
  *
  * Reference analog: repeated aggregate passes over the scan pipeline
  * (/root/reference/src/execution/aggregate.rs) — the recurrence itself is
  * textbook GD.
  *
  * Scale notes: each step is ONE broadcast of the 3-value weight row and
  * one map-side-combined global sum of per-row gradients — the data never
  * shuffles, state is weight-sized, and the step count is fixed, so the
  * whole training run is a declarative plan chain (localCheckpoint per
  * step, the PageRank device). Cross-engine determinism: features are
  * exact rationals of integers, z evaluates in one fixed expression
  * order, libm exp() lives only inside the gradient sums whose
  * association-order ulps are absorbed by the 9-dp weight rounding each
  * step; the accuracy census compares z > 0 — sign-exact, no libm.
  */
object MLOps {
  type Q = (SparkSession, String) => DataFrame

  /** label: is the event a purchase; features: value/100 and
    * fraction-of-day. Shared spine of the GD queries.
    */
  private def lrData(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")
      .select((col("event_type") === "purchase").cast("double").as("y"),
        (col("value") / 100.0).as("x1"),
        ((unix_timestamp(col("ts")) % 86400) / lit(3600) / 24.0).as("x2"))

  /** 3 full-batch GD steps from w = 0, 9-dp weight rounding per step. */
  private def lrTrain(s: SparkSession, data: DataFrame): DataFrame = {
    val nRow = data.agg(count(lit(1)).as("n"))
    var w = s.range(1).select(lit(0.0).as("w0"), lit(0.0).as("w1"),
      lit(0.0).as("w2"))
    for (_ <- 1 to 3) {
      w = data.crossJoin(broadcast(w)).crossJoin(broadcast(nRow))
        .withColumn("p", lit(1.0) / (lit(1.0) +
          exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))))
        .withColumn("r", col("p") - col("y"))
        .agg(
          round(first(col("w0")) - sum(col("r")) / first(col("n")), 9)
            .as("w0"),
          round(first(col("w1")) - sum(col("r") * col("x1")) /
            first(col("n")), 9).as("w1"),
          round(first(col("w2")) - sum(col("r") * col("x2")) /
            first(col("n")), 9).as("w2"))
        // lazy: the next step's broadcast build materializes-and-caches
        // this 1-row frame — the eager form paid an extra scheduled job
        // per GD step at construction time (r17, the GraphOps device)
        .localCheckpoint(false)
    }
    w
  }

  /** Score census for AUC: (integer-cents score → positive/negative
    * counts). Sum/count partials merge associatively, so the census is
    * exactly incremental under ANY micro-batch cut — the streaming twin
    * (EventsStream.scoreCensus, StreamingSpec three-way) maintains it as
    * ≤|score-domain| rows of state and stays bit-equal to this batch form.
    */
  def scoreCensus(events: DataFrame): DataFrame =
    events.select(ExactMoney.centsL(col("value")).as("score"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .groupBy(col("score"))
      .agg(sum(col("y")).as("np"),
        (count(lit(1)) - sum(col("y"))).as("nn"))

  /** Tie-corrected Mann-Whitney reduction over a score census: wins×2 =
    * Σ 2·pos·negBelow + pos·neg, AUC = wins2/(2·P·N). All-integer until
    * one final IEEE division; the window runs over the census only.
    */
  def aucFromCensus(cen: DataFrame): DataFrame = {
    val tot = cen.agg(sum(col("np")).as("n_pos"),
      sum(col("nn")).as("n_neg"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("score")).rowsBetween(Long.MinValue, -1)
    cen
      .withColumn("cneg", coalesce(sum(col("nn")).over(wPrev), lit(0L)))
      .select((col("np") * col("cneg") * 2 + col("np") * col("nn"))
        .as("w2"))
      .agg(sum(col("w2")).as("wins2"))
      .crossJoin(broadcast(tot))
      .select(col("n_pos"), col("n_neg"), col("wins2"),
        round(col("wins2").cast("double") /
          (col("n_pos") * col("n_neg") * 2.0), 6).as("auc"))
  }

  /** Ascending score-decile census from [[scoreCensus]] — the
    * q_isotonic_fit assignment verbatim (a score group straddling a
    * boundary lands wholly in the decile where its cumulative count
    * STARTS — deterministic, no per-row global rank). Returns ≤10 rows
    * (decile, pos, neg).
    */
  private def scoreDeciles(cen: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val tot = cen.agg(sum(col("np") + col("nn")).as("n_tot"))
    val wPrev = W.orderBy(col("score")).rowsBetween(Long.MinValue, -1)
    cen.crossJoin(broadcast(tot))
      .withColumn("cum_before",
        coalesce(sum(col("np") + col("nn")).over(wPrev), lit(0L)))
      .withColumn("decile", expr("cum_before * 10 div n_tot"))
      .groupBy(col("decile"))
      .agg(sum(col("np")).as("pos"), sum(col("nn")).as("neg"))
  }

  val queries: Map[String, Q] = Map(
    "q_logreg" -> ((s, d) => {
      val data = lrData(s, d).persistTracked()
      val w = lrTrain(s, data)
      // accuracy: predict purchase ⇔ z > 0 (sign-exact, libm-free)
      data.crossJoin(broadcast(w))
        .withColumn("hit",
          ((col("w0") + col("w1") * col("x1") + col("w2") * col("x2")
            > 0.0).cast("double") === col("y")).cast("long"))
        .agg(count(lit(1)).as("n"),
          first(col("w0")).as("w0_r"), first(col("w1")).as("w1_r"),
          first(col("w2")).as("w2_r"), sum(col("hit")).as("n_correct"))
        .select(col("n"), round(col("w0_r"), 6).as("w0"),
          round(col("w1_r"), 6).as("w1"), round(col("w2_r"), 6).as("w2"),
          col("n_correct"),
          round(col("n_correct").cast("double") / col("n"), 4).as("accuracy"))
    }),

    // ---- reliability diagram for the trained model (model-quality
    //      monitoring): decile buckets of predicted probability vs the
    //      observed positive rate. Bucket membership floors p·10 — p is a
    //      continuous sigmoid value, so a cross-engine ulp landing
    //      exactly on a bucket edge is measure-zero; counts are integer,
    //      rates one IEEE division, avg_p rounds away summation order.
    //      Same iterate-broadcast scale shape as training ----
    "q_calibration" -> ((s, d) => {
      val data = lrData(s, d).persistTracked()
      val w = lrTrain(s, data)
      data.crossJoin(broadcast(w))
        .withColumn("p", lit(1.0) / (lit(1.0) +
          exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))))
        .withColumn("bucket",
          least(floor(col("p") * 10).cast("int"), lit(9)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast("bigint").as("n_pos"),
          round(sum(col("y")) / count(lit(1)), 4).as("observed_rate"),
          round(avg(col("p")), 4).as("avg_predicted"))
        .orderBy("bucket")
    }),

    // ---- exact AUC by rank statistic (Mann-Whitney U, tie-corrected):
    //      how well does transaction value separate purchases from the
    //      rest. NO per-row global ranking — the classic formulation
    //      sorts the corpus once through a single-partition window; here
    //      the statistic reduces over the distinct-SCORE CENSUS (scores
    //      are integer cents, so the census is value-domain-bounded at
    //      any event volume): wins×2 = Σ_s 2·pos_s·negBelow_s +
    //      pos_s·neg_s (ties at half weight), AUC = wins2/(2·P·N). One
    //      fine-key shuffle on score; all-integer until ONE final IEEE
    //      division, bit-identical across engines ----
    "q_auc_rank" -> ((s, d) =>
      aucFromCensus(scoreCensus(Tables(s, d, "events")))),

    // ---- cumulative gains / lift table over score deciles — the
    //      "how deep must the campaign dial" report. Same census device
    //      as q_auc_rank: deciles derive from the cents-score census'
    //      running count (a score group straddling a boundary lands
    //      wholly in the decile where it STARTS — deterministic, no
    //      per-row global rank); gain and lift are integer basis points
    //      by floor division. Windows only ever run over the score
    //      census and the 10-row decile table ----
    "q_lift_gain" -> ((s, d) => {
      val cen = Tables(s, d, "events")
        .select(ExactMoney.centsL(col("value")).as("score"),
          (col("event_type") === "purchase").cast("long").as("y"))
        .groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
      val tot = cen.agg(sum(col("n")).as("n_tot"),
        sum(col("np")).as("pos_tot"))
      val W = org.apache.spark.sql.expressions.Window
      val wPrev = W.orderBy(col("score").desc).rowsBetween(Long.MinValue, -1)
      val wDec = W.orderBy(col("decile")).rowsBetween(Long.MinValue, 0)
      cen.crossJoin(broadcast(tot))
        .withColumn("cum_before",
          coalesce(sum(col("n")).over(wPrev), lit(0L)))
        .withColumn("decile", expr("cum_before * 10 div n_tot"))
        .groupBy(col("decile"))
        .agg(sum(col("n")).as("n"), sum(col("np")).as("n_pos"))
        .crossJoin(broadcast(tot))
        .withColumn("cum_n", sum(col("n")).over(wDec))
        .withColumn("cum_pos", sum(col("n_pos")).over(wDec))
        .select(col("decile"), col("n"), col("n_pos"), col("cum_n"),
          col("cum_pos"),
          expr("cum_pos * 10000 div pos_tot").as("gain_bp"),
          // decimal(38,0) on both factors: cum_pos·n_tot·10000 (and
          // cum_n·pos_tot) wrap int64 past ~9.2e18 — at warehouse scale
          // (1e6 positives over 1e9 events) Spark would silently wrap
          // while DuckDB errors. Same device as q_gini / q_cuped.
          expr("CAST(cum_pos AS DECIMAL(38,0)) * n_tot * 10000 div " +
            "(CAST(cum_n AS DECIMAL(38,0)) * pos_tot)")
            .as("lift_bp"))
        .orderBy("decile")
    }),

    // ---- isotonic calibration (PAV), declaratively: fit a monotone
    //      conversion-rate curve over ascending score deciles WITHOUT
    //      the sequential pool-adjacent-violators loop — by the minimax
    //      identity iso(k) = max_{i≤k} min_{j≥k} mean(i..j), which is
    //      pure relational algebra: interval means from prefix sums of
    //      the 10-row decile census (each ONE IEEE division of exact
    //      integers), then a min-then-max aggregation over the ≤10·55
    //      (k, interval) pairs. Every stage is census-sized at any
    //      event volume; EvalOpsSpec proves equality with a textbook
    //      weighted PAV fold ----
    "q_isotonic_fit" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val cen = scoreCensus(Tables(s, d, "events"))
      val tot = cen.agg(sum(col("np") + col("nn")).as("n_tot"))
      val wPrev = W.orderBy(col("score")).rowsBetween(Long.MinValue, -1)
      val dec = cen.crossJoin(broadcast(tot))
        .withColumn("cum_before",
          coalesce(sum(col("np") + col("nn")).over(wPrev), lit(0L)))
        .withColumn("decile", expr("cum_before * 10 div n_tot"))
        .groupBy(col("decile"))
        .agg(sum(col("np") + col("nn")).as("n"), sum(col("np")).as("pos"))
        .persistTracked()
      val wCum = W.orderBy(col("decile")).rowsBetween(Long.MinValue, 0)
      val pre = dec
        .withColumn("cn", sum(col("n")).over(wCum))
        .withColumn("cp", sum(col("pos")).over(wCum))
      val lo = pre.select(col("decile").as("i"),
        (col("cn") - col("n")).as("cn0"), (col("cp") - col("pos")).as("cp0"))
      val hi = pre.select(col("decile").as("j"),
        col("cn").as("cnj"), col("cp").as("cpj"))
      val iv = lo.crossJoin(hi).filter(col("i") <= col("j"))
        .select(col("i"), col("j"),
          ((col("cpj") - col("cp0")).cast("double") /
            (col("cnj") - col("cn0"))).as("m"))
      dec.select(col("decile").as("k"), col("n"), col("pos"))
        .join(iv, col("i") <= col("k") && col("j") >= col("k"))
        .groupBy(col("k"), col("n"), col("pos"), col("i"))
        .agg(min(col("m")).as("mn"))
        .groupBy(col("k"), col("n"), col("pos"))
        .agg(max(col("mn")).as("iso"))
        .select(col("k").as("decile"), col("n"), col("pos"),
          round(col("pos").cast("double") / col("n"), 6).as("raw_rate"),
          round(col("iso"), 6).as("iso_rate"))
        .orderBy("decile")
    }),

    // ---- weight of evidence / information value over score deciles —
    //      the credit-scoring feature-power report (new in r14). Rides
    //      the same ascending decile census as q_isotonic_fit: WOE_d =
    //      ln((pos_d/P)/(neg_d/N)) evaluated in ONE fixed shape —
    //      (CAST(pos AS DOUBLE)·N) / (CAST(neg AS DOUBLE)·P) then a
    //      single ln — and the IV accumulates as a census-ORDERED window
    //      fold (10 terms), 6-dp rounding absorbing fold ulps. Integer
    //      share terms; empty cells → NULL WOE, 0 IV contribution ----
    "q_woe_iv" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val dec = scoreDeciles(scoreCensus(Tables(s, d, "events")))
      val tot = dec.agg(sum(col("pos")).as("p_tot"),
        sum(col("neg")).as("n_tot"))
      val wCum = W.orderBy(col("decile")).rowsBetween(Long.MinValue, 0)
      dec.crossJoin(broadcast(tot))
        .withColumn("woe_raw",
          when(col("pos") > 0 && col("neg") > 0,
            log((col("pos").cast("double") * col("n_tot")) /
              (col("neg").cast("double") * col("p_tot")))))
        .withColumn("iv_term",
          when(col("woe_raw").isNotNull,
            (col("pos").cast("double") / col("p_tot") -
              col("neg").cast("double") / col("n_tot")) * col("woe_raw"))
            .otherwise(lit(0.0)))
        .select(col("decile"), col("pos"), col("neg"),
          round(col("woe_raw"), 6).as("woe"),
          round(col("iv_term"), 6).as("iv_term"),
          round(sum(col("iv_term")).over(wCum), 6).as("cum_iv"))
        .orderBy("decile")
    }),

    // ---- per-decile uplift (two-arm conversion delta) — the campaign
    //      targeting report joining the A/B layer to the score-decile
    //      device (new in r14). Arms split on user_id parity (the
    //      q_sequential_ab convention); deciles come from the COMBINED
    //      score census so both arms share boundaries. All counts
    //      integer, rates in basis points by integer div — hash-exact
    //      at any volume; one fine-key shuffle on score, windows only
    //      over the census ----
    "q_uplift_deciles" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = Tables(s, d, "events")
        .select(ExactMoney.centsL(col("value")).as("score"),
          (col("user_id") % 2 === 0).cast("long").as("a"),
          (col("event_type") === "purchase").cast("long").as("y"))
      val cen = ev.groupBy(col("score"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).as("na"), sum(col("a") * col("y")).as("xa"),
          (count(lit(1)) - sum(col("a"))).as("nb"),
          sum((lit(1) - col("a")) * col("y")).as("xb"))
      val tot = cen.agg(sum(col("n")).as("n_tot"))
      val wPrev = W.orderBy(col("score")).rowsBetween(Long.MinValue, -1)
      cen.crossJoin(broadcast(tot))
        .withColumn("cum_before",
          coalesce(sum(col("n")).over(wPrev), lit(0L)))
        .withColumn("decile", expr("cum_before * 10 div n_tot"))
        .groupBy(col("decile"))
        .agg(sum(col("na")).as("n_a"), sum(col("xa")).as("x_a"),
          sum(col("nb")).as("n_b"), sum(col("xb")).as("x_b"))
        .select(col("decile"), col("n_a"), col("x_a"), col("n_b"),
          col("x_b"),
          when(col("n_a") > 0, expr("x_a * 10000 div n_a")).as("rate_a_bp"),
          when(col("n_b") > 0, expr("x_b * 10000 div n_b")).as("rate_b_bp"),
          when(col("n_a") > 0 && col("n_b") > 0,
            expr("x_a * 10000 div n_a - x_b * 10000 div n_b"))
            .as("uplift_bp"))
        .orderBy("decile")
    }),

    // ---- smoothed target encoding (new in r14) — the category→number
    //      feature transform every tabular pipeline ships: encode a
    //      supplier's nation by its return rate, shrunk toward the
    //      global prior with pseudo-count m=100 (empirical-Bayes mean):
    //      enc = (r + m·R/N)/(n + m) = (r·N + m·R)/((n+m)·N), held in
    //      basis points by integer division so the gate is hash-exact.
    //      Products ride decimal(38,0)/HUGEINT (the q_gini device —
    //      r·N wraps int64 at warehouse scale). One fine-key shuffle
    //      join lineitem⋈supplier, 25-row nation census, nation dim
    //      broadcast; no windows at all ----
    "q_target_encode" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_suppkey"),
          (col("l_returnflag") === "R").cast("long").as("y"))
      val sup = Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      // the 25-row census persists so the prior's re-aggregation reads
      // it back instead of re-scanning lineitem (plan census: 3 scans)
      val per = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
        .persistTracked()
      val tot = per.agg(sum(col("n")).as("n_tot"), sum(col("r")).as("r_tot"))
      val nat = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      per.crossJoin(broadcast(tot))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n"), col("r"),
          expr("r * 10000 div n").as("raw_bp"),
          expr("(CAST(r AS DECIMAL(38,0)) * n_tot + 100 * r_tot) * 10000" +
            " div (CAST(n + 100 AS DECIMAL(38,0)) * n_tot)").as("enc_bp"))
        .orderBy("nation")
    }),

    // ---- multinomial Naive Bayes language classifier, trained and
    //      evaluated in-engine (resubstitution): add-one-smoothed token
    //      likelihoods per language. The likelihood table is
    //      (langs × vocab)-sized — language-bounded, built DENSE (so
    //      unseen (lang, token) pairs score ln(1/(total+V)) instead of
    //      dropping out) and broadcast; scoring joins each doc token
    //      against it and reduces per (doc, lang). Counts are all
    //      integer; ln lives in the score sums, and the argmax compares
    //      9-dp-rounded scores with a language tie-break — the PageRank
    //      bridging device ----
    "q_naive_bayes" -> ((s, d) =>
      nbConfusion(s, d).orderBy("true_lang", "pred_lang")),

    // ---- per-class precision/recall/F1 from the same confusion census —
    //      the report a model gate actually reads. Derivation is pure
    //      integer census algebra (row/column marginals of the ≤langs²
    //      confusion, metrics in basis points by floor division); the
    //      full outer marginal join keeps classes that appear only as
    //      predictions or only as truth ----
    "q_f1_scores" -> ((s, d) => {
      val c = nbConfusion(s, d).persistTracked()
      val byTrue = c.groupBy(col("true_lang").as("lang"))
        .agg(sum(col("n")).as("n_true"),
          sum(when(col("true_lang") === col("pred_lang"), col("n"))
            .otherwise(0L)).as("tp0"))
      val byPred = c.groupBy(col("pred_lang").as("lang"))
        .agg(sum(col("n")).as("n_pred"))
      byTrue.join(byPred, Seq("lang"), "full")
        .select(col("lang"),
          coalesce(col("tp0"), lit(0L)).as("tp"),
          (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
            .as("fp"),
          (coalesce(col("n_true"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
            .as("fn"))
        .withColumn("precision_bp", when(col("tp") + col("fp") > 0,
          expr("tp * 10000 div (tp + fp)")).otherwise(0L))
        .withColumn("recall_bp", when(col("tp") + col("fn") > 0,
          expr("tp * 10000 div (tp + fn)")).otherwise(0L))
        .withColumn("f1_bp", when(col("precision_bp") + col("recall_bp") > 0,
          expr("2 * precision_bp * recall_bp div (precision_bp + recall_bp)"))
          .otherwise(0L))
        .orderBy("lang")
    }),

    // ---- odds ratio with Wald CI (new in r14) — the epidemiologist's
    //      2×2 effect size for the A/B layer: exposure = user_id parity
    //      (the q_sequential_ab arm convention), outcome = the user-day
    //      purchased (user-DAY grain — at the per-user grain a heavy
    //      synthetic user always converts and b·c degenerates to 0).
    //      One per-user-day reduction, then the 2×2 census;
    //      OR = ad/bc exact in basis points by decimal integer division;
    //      ln(OR) ± z·√(1/a+1/b+1/c+1/d) in one fixed shape with the
    //      q_ab_power z literal. a·d wraps int64 past ~3G users each →
    //      decimal(38,0)/HUGEINT (the q_gini device). A zero cell
    //      degrades to NULL identically on both engines (NULLIF on the
    //      bp divisor, CASE guard on the logs) instead of crashing
    //      DuckDB's ln/division on a degenerate split ----
    "q_odds_ratio" -> ((s, d) => {
      val u = Tables(s, d, "events")
        .groupBy(col("user_id"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("y"))
        .select((col("user_id") % 2 === 0).cast("long").as("e"), col("y"))
      u.agg(sum(expr("e * y")).as("a"),
          sum(expr("e * (1 - y)")).as("b"),
          sum(expr("(1 - e) * y")).as("c"),
          sum(expr("(1 - e) * (1 - y)")).as("dd"))
        .select(col("a"), col("b"), col("c"), col("dd").as("d"),
          expr("cast(a as decimal(38,0)) * dd * 10000 div " +
            "nullif(cast(b as decimal(38,0)) * c, 0)").as("or_bp"),
          round(expr(OrLog), 6).as("log_or"),
          round(expr(s"($OrLog) - $OrZ * ($OrSe)"), 6).as("ci_lo"),
          round(expr(s"($OrLog) + $OrZ * ($OrSe)"), 6).as("ci_hi"))
    }),

    // ---- sample-ratio-mismatch guardrail (new in r14) — the FIRST
    //      check every experimentation platform runs before reading an
    //      A/B result: did the 50/50 user split actually land 50/50?
    //      For an even split, χ²(1) collapses to (na−nb)²/n exactly;
    //      the 95% critical value is a Scala-style literal. One distinct
    //      + one count — all integer until a single division ----
    "q_ab_srm" -> ((s, d) => {
      val u = Tables(s, d, "events")
        .select(col("user_id")).distinct()
        .select((col("user_id") % 2 === 0).cast("long").as("e"))
      u.agg(count(lit(1)).as("n"), sum(col("e")).as("na"))
        .select(col("n").as("n_users"), col("na"),
          (col("n") - col("na")).as("nb"),
          expr("na * 10000 div n").as("ratio_bp"),
          round(expr("cast((na - (n - na)) * (na - (n - na)) as double)" +
            " / n"), 6).as("chi2"),
          expr("cast((na - (n - na)) * (na - (n - na)) as double) / n" +
            " > 3.841458820694124").as("srm_flag"))
    }),

    // ---- intraclass correlation + design effect (new in r14) — the
    //      number that decides whether a USER-randomized experiment can
    //      be read at event grain: one-way random-effects components
    //      over user clusters. Per-cluster moments are exact decimals;
    //      the between-cluster sum Σs²ᵢ/nᵢ folds EXACTLY: each term is
    //      one fixed IEEE shape (s²ᵢ/nᵢ — bit-identical per row on both
    //      engines), scaled ×1e4 and rounded to an integer that rides
    //      decimal(38,0), so the corpus-scaled sum is order-free under
    //      any partial-agg tree (a plain double sum here reassociates
    //      with user count against the absolute 4-dp rounding of
    //      msb_d2/msw_d2 — the q_heaps_law bug class; a census-ORDERED
    //      window would fix it too but costs a single-partition sort of
    //      ALL users at 100 TB). The ×1e4 grain puts per-term rounding
    //      at ≤5e-9 dollars² after /(k−1)/1e4 — below the 4-dp gate
    //      grain by 4 orders. ANOVA estimator n₀ handles unequal
    //      cluster sizes; deff uses the mean cluster size.
    //      deff ≈ 1 + (m̄−1)·ICC is the variance inflation an
    //      event-grain z-test silently ignores ----
    "q_icc" -> ((s, d) => {
      // r17: the per-user moment agg is the corpus-sized stage (a
      // fine-key groupBy over EVERY event row) — the cents conversion
      // rides floor (ExactMoney.centsL: round() on a double is a per-row
      // java BigDecimal; floor(x·100+0.5) is value-identical on the 2-dp
      // grid events.value sits on) and the two moments ride SumCents'
      // all-long buffers, which keep this many-group HashAggregate on its
      // generated fast hash map (a decimal buffer field disqualifies it —
      // measured r16). Same exact integers: x ≤ ~2¹⁷ cents, x·x < 2³⁴,
      // both far inside SumCents' domain; si/qi reach the census-sized
      // outer agg as the same decimal(38,0) values as before.
      val cen = Tables(s, d, "events")
        .select(col("user_id"),
          graft.queries.ExactMoney.centsL(col("value")).as("x"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("ni"),
          graft.functions.SumCents.sum(col("x")).as("si"),
          graft.functions.SumCents.sum(expr("x * x")).as("qi"))
      cen.agg(count(lit(1)).as("k"), sum(col("ni")).as("n"),
          sum(col("si")).as("ss"), sum(col("qi")).as("qq"),
          sum(expr("cast(ni as decimal(38,0)) * ni")).as("nsq"),
          sum(expr("cast(round(cast(si as double) * cast(si as double)" +
            " / ni * 10000, 0) as decimal(38,0))")).as("t4"))
        .withColumn("tfold", expr("cast(t4 as double) / 10000.0"))
        .select(col("k"), col("n").cast("long").as("n"),
          round(expr(s"($IccMsb) / 10000.0"), 4).as("msb_d2"),
          round(expr(s"($IccMsw) / 10000.0"), 4).as("msw_d2"),
          round(expr(IccExpr), 6).as("icc"),
          round(expr(s"1.0 + (cast(n as double) / k - 1.0) * ($IccExpr)"),
            4).as("deff"))
    }),

    // ---- Hosmer–Lemeshow calibration χ² (new in r14) — the
    //      goodness-of-fit scalar on top of q_calibration's reliability
    //      diagram: over the same LR score deciles, term = (O−E)² /
    //      (E·(1−E/n_b)) with O integer and E the bucket's summed
    //      predicted probability (the q_calibration avg(p) acceptance),
    //      χ² folding bucket-ORDERED over the ≤10-row census (terms ≥ 0
    //      → max(cum) is the ordered total, reported per row as the
    //      running cum). Reuses the lrData/lrTrain spine verbatim ----
    "q_hosmer_lemeshow" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val data = lrData(s, d).persistTracked()
      val w = lrTrain(s, data)
      val binned = data.crossJoin(broadcast(w))
        .withColumn("p", lit(1.0) / (lit(1.0) +
          exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))))
        .withColumn("bucket",
          least(floor(col("p") * 10).cast("int"), lit(9)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("nb"), sum(col("y")).cast("bigint").as("o"),
          sum(col("p")).as("e"))
      val wCum = W.orderBy(col("bucket")).rowsBetween(Long.MinValue, 0)
      binned
        .withColumn("term",
          expr("(o - e) * (o - e) / (e * (1.0 - e / nb))"))
        .select(col("bucket"), col("nb"), col("o"),
          round(col("e"), 4).as("e_pred"),
          round(col("term"), 6).as("hl_term"),
          round(sum(col("term")).over(wCum), 4).as("cum_hl"))
        .orderBy("bucket")
    }),

    // ---- Brier score (new in r14) — the proper scoring rule that
    //      completes the LR evaluation trio (q_calibration reliability,
    //      q_hosmer_lemeshow GOF, this sharpness+calibration scalar):
    //      mean (p−y)² on the same lrData/lrTrain spine, reported beside
    //      the base-rate reference r(1−r) a skill-less predictor scores
    //      — Brier below the reference is actual skill ----
    "q_brier_score" -> ((s, d) => {
      val data = lrData(s, d).persistTracked()
      val w = lrTrain(s, data)
      data.crossJoin(broadcast(w))
        .withColumn("p", lit(1.0) / (lit(1.0) +
          exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast("bigint").as("n_pos"),
          sum((col("p") - col("y")) * (col("p") - col("y"))).as("bs"))
        .select(col("n"), col("n_pos"),
          expr("n_pos * 10000 div n").as("base_rate_bp"),
          round(expr("bs / n"), 6).as("brier"),
          round(expr("(cast(n_pos as double) / n) * " +
            "(1.0 - cast(n_pos as double) / n)"), 6).as("brier_ref"))
    })
  )

  /** q_icc shapes shared verbatim with the oracle (columns k, n, ss, qq,
    * nsq, tfold in scope). n₀ is the unequal-cluster-size ANOVA constant.
    */
  private val IccMsb =
    "(tfold - cast(ss as double) * cast(ss as double) / n) / (k - 1)"
  private val IccMsw = "(cast(qq as double) - tfold) / (n - k)"
  private val IccN0 = "(n - cast(nsq as double) / n) / (k - 1)"
  private val IccExpr =
    s"(($IccMsb) - ($IccMsw)) / (($IccMsb) + (($IccN0) - 1.0) * ($IccMsw))"

  /** q_odds_ratio shapes shared verbatim with the oracle (columns
    * a, b, c, dd in scope); z is the q_ab_power 97.5% normal quantile.
    * A zero 2×2 cell degrades to NULL identically on BOTH engines: the
    * CASE guard keeps DuckDB's ln(0)/ln(inf) out-of-range error (Spark
    * would return NULL) from crashing the oracle on a degenerate split,
    * and 1/0 inside the SE is double division → NULL on both. CASE is
    * lazily evaluated per-row in both engines, so the guarded branch
    * never raises.
    */
  private val OrZ: Double = 1.959963984540054
  private val OrLog =
    "CASE WHEN a = 0 OR b = 0 OR c = 0 OR dd = 0 THEN NULL " +
      "ELSE ln((CAST(a AS DOUBLE) * dd) / (CAST(b AS DOUBLE) * c)) END"
  private val OrSe =
    "sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)"

  /** Resubstitution confusion census of the Naive Bayes classifier —
    * shared spine of q_naive_bayes (the raw census) and q_f1_scores
    * (derived per-class metrics), so the two reports can never disagree
    * on the classifier.
    */
  def nbConfusion(s: SparkSession, d: String): DataFrame = {
      val tok = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .filter(col("t") =!= "").persistTracked()
      val counts = tok.groupBy(col("lang").as("l"), col("t").as("tt"))
        .agg(count(lit(1)).as("c"))
      val langTot = tok.groupBy(col("lang").as("l"))
        .agg(count(lit(1)).as("tot"))
      val vocab = tok.select(col("t").as("tt")).distinct()
      val vSize = vocab.agg(count(lit(1)).as("v"))
      val docsPerLang = tok.select(col("doc_id"), col("lang")).distinct()
        .groupBy(col("lang").as("l")).agg(count(lit(1)).as("nd"))
      val nDocs = Tables(s, d, "documents").agg(count(lit(1)).as("ndocs"))
      // dense likelihoods: every (lang, token) cell exists
      val like = langTot.crossJoin(vocab)
        .join(counts, Seq("l", "tt"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(vSize))
        .select(col("l"), col("tt"),
          log((col("c") + 1).cast("double") / (col("tot") + col("v")))
            .as("ll"))
      val prior = docsPerLang.crossJoin(broadcast(nDocs))
        .select(col("l"), log(col("nd").cast("double") / col("ndocs"))
          .as("lp"))
      val scores = tok
        .join(broadcast(like), col("t") === col("tt"))
        .groupBy(col("doc_id"), col("lang"), col("l"))
        .agg(sum(col("ll")).as("sll"))
        .join(broadcast(prior), "l")
        .select(col("doc_id"), col("lang"),
          col("l"), round(col("lp") + col("sll"), 9).as("score"))
      val best = scores
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("l").asc)))
        .filter(col("rn") === 1)
      best.groupBy(col("lang").as("true_lang"), col("l").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
  }

  /** the NB classifier through its confusion census as shared oracle
    * CTEs — the bit-exact DuckDB twin of [[nbConfusion]]. Ends with the
    * `conf` CTE (true_lang, pred_lang, n).
    */
  private val nbCtes: String =
    """tok AS (
      |  SELECT doc_id, lang, t.t
      |  FROM documents,
      |       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(t)
      |  WHERE t.t <> ''),
      |counts AS (SELECT lang AS l, t AS tt, count(*) AS c
      |           FROM tok GROUP BY 1, 2),
      |langtot AS (SELECT lang AS l, count(*) AS tot FROM tok GROUP BY 1),
      |vocab AS (SELECT DISTINCT t AS tt FROM tok),
      |vs AS (SELECT count(*) AS v FROM vocab),
      |dpl AS (SELECT lang AS l, count(DISTINCT doc_id) AS nd
      |        FROM tok GROUP BY 1),
      |nd AS (SELECT count(*) AS ndocs FROM documents),
      |lk AS (
      |  SELECT langtot.l, vocab.tt,
      |         ln((coalesce(c, 0) + 1) / CAST(tot + v AS DOUBLE)) AS ll
      |  FROM langtot CROSS JOIN vocab
      |       LEFT JOIN counts ON counts.l = langtot.l
      |                       AND counts.tt = vocab.tt
      |       CROSS JOIN vs),
      |prior AS (
      |  SELECT l, ln(nd / CAST(ndocs AS DOUBLE)) AS lp
      |  FROM dpl CROSS JOIN nd),
      |scores AS (
      |  SELECT doc_id, lang, lk.l,
      |         round(lp + sum(ll), 9) AS score
      |  FROM tok JOIN lk ON tok.t = lk.tt
      |       JOIN prior ON lk.l = prior.l
      |  GROUP BY doc_id, lang, lk.l, lp),
      |best AS (
      |  SELECT doc_id, lang, l FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, l ASC) AS rn FROM scores)
      |  WHERE rn = 1),
      |conf AS (
      |  SELECT lang AS true_lang, l AS pred_lang, count(*) AS n
      |  FROM best GROUP BY 1, 2)""".stripMargin

  /** the GD recurrence as shared oracle CTEs — identical per-step
    * expressions and 9-dp weight rounding to [[lrTrain]].
    */
  private val gdCtes: String =
    """data AS (
      |  SELECT CAST(event_type = 'purchase' AS DOUBLE) AS y,
      |         value / 100.0 AS x1,
      |         (CAST(floor(epoch(ts)) AS BIGINT) % 86400) / 3600 / 24.0
      |           AS x2
      |  FROM events),
      |nn AS (SELECT count(*) AS n FROM data),
      |w0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
      |              CAST(0 AS DOUBLE) AS w2),
      |s1 AS (
      |  SELECT round(w0 - sum(p - y) / n, 9) AS w0,
      |         round(w1 - sum((p - y) * x1) / n, 9) AS w1,
      |         round(w2 - sum((p - y) * x2) / n, 9) AS w2
      |  FROM (SELECT y, x1, x2, w0, w1, w2, n,
      |          1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
      |        FROM data CROSS JOIN w0 CROSS JOIN nn)
      |  GROUP BY w0, w1, w2, n),
      |s2 AS (
      |  SELECT round(w0 - sum(p - y) / n, 9) AS w0,
      |         round(w1 - sum((p - y) * x1) / n, 9) AS w1,
      |         round(w2 - sum((p - y) * x2) / n, 9) AS w2
      |  FROM (SELECT y, x1, x2, w0, w1, w2, n,
      |          1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
      |        FROM data CROSS JOIN s1 CROSS JOIN nn)
      |  GROUP BY w0, w1, w2, n),
      |s3 AS (
      |  SELECT round(w0 - sum(p - y) / n, 9) AS w0,
      |         round(w1 - sum((p - y) * x1) / n, 9) AS w1,
      |         round(w2 - sum((p - y) * x2) / n, 9) AS w2
      |  FROM (SELECT y, x1, x2, w0, w1, w2, n,
      |          1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
      |        FROM data CROSS JOIN s2 CROSS JOIN nn)
      |  GROUP BY w0, w1, w2, n)""".stripMargin

  // (oracles below)
  val oracles: Map[String, String] = Map(
    // identical score census + tie-corrected rank statistic
    "q_auc_rank" ->
      """WITH sc AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
        |         CAST(event_type = 'purchase' AS BIGINT) AS y
        |  FROM events),
        |cen AS (
        |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
        |         count(*) - CAST(sum(y) AS BIGINT) AS nn
        |  FROM sc GROUP BY score),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |               CAST(sum(nn) AS BIGINT) AS n_neg FROM cen),
        |run AS (
        |  SELECT np, nn,
        |         COALESCE(sum(nn) OVER (ORDER BY score ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
        |  FROM cen)
        |SELECT n_pos, n_neg,
        |       CAST(sum(np * cneg * 2 + np * nn) AS BIGINT) AS wins2,
        |       round(CAST(sum(np * cneg * 2 + np * nn) AS DOUBLE) /
        |             (n_pos * n_neg * 2.0), 6) AS auc
        |FROM run, tot GROUP BY n_pos, n_neg""".stripMargin,

    // identical census-decile assignment and integer bp arithmetic
    "q_lift_gain" ->
      """WITH sc AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
        |         CAST(event_type = 'purchase' AS BIGINT) AS y
        |  FROM events),
        |cen AS (
        |  SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS np
        |  FROM sc GROUP BY score),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
        |               CAST(sum(np) AS BIGINT) AS pos_tot FROM cen),
        |dec AS (
        |  SELECT CAST((COALESCE(sum(n) OVER (ORDER BY score DESC ROWS BETWEEN
        |            UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10) // n_tot
        |           AS BIGINT) AS decile,
        |         n, np
        |  FROM cen, tot),
        |dt AS (
        |  SELECT decile, CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(np) AS BIGINT) AS n_pos
        |  FROM dec GROUP BY decile)
        |SELECT decile, n, n_pos,
        |       CAST(sum(n) OVER wc AS BIGINT) AS cum_n,
        |       CAST(sum(n_pos) OVER wc AS BIGINT) AS cum_pos,
        |       (CAST(sum(n_pos) OVER wc AS BIGINT) * 10000) // pos_tot
        |         AS gain_bp,
        |       CAST((CAST(sum(n_pos) OVER wc AS HUGEINT) * n_tot * 10000) //
        |         (CAST(sum(n) OVER wc AS HUGEINT) * pos_tot) AS BIGINT)
        |         AS lift_bp
        |FROM dt, tot
        |WINDOW wc AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND CURRENT ROW)
        |ORDER BY decile""".stripMargin,

    // identical ascending-decile census; WOE evaluated in the one fixed
    // shape (CAST(pos)·N)/(CAST(neg)·P) then ln; IV as the ordered fold
    "q_woe_iv" ->
      """WITH sc AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
        |         CAST(event_type = 'purchase' AS BIGINT) AS y
        |  FROM events),
        |cen AS (
        |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
        |         CAST(count(*) - sum(y) AS BIGINT) AS nn
        |  FROM sc GROUP BY score),
        |t0 AS (SELECT CAST(sum(np + nn) AS BIGINT) AS n_all FROM cen),
        |dec AS (
        |  SELECT CAST((COALESCE(sum(np + nn) OVER (ORDER BY score ROWS
        |           BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10)
        |           // n_all AS BIGINT) AS decile,
        |         np, nn
        |  FROM cen, t0),
        |dt AS (SELECT decile, CAST(sum(np) AS BIGINT) AS pos,
        |              CAST(sum(nn) AS BIGINT) AS neg
        |       FROM dec GROUP BY decile),
        |t2 AS (SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
        |              CAST(sum(neg) AS BIGINT) AS n_tot FROM dt),
        |w AS (
        |  SELECT decile, pos, neg,
        |         CASE WHEN pos > 0 AND neg > 0
        |              THEN ln((CAST(pos AS DOUBLE) * n_tot) /
        |                      (CAST(neg AS DOUBLE) * p_tot)) END AS woe_raw,
        |         p_tot, n_tot
        |  FROM dt, t2),
        |w2 AS (
        |  SELECT decile, pos, neg, woe_raw,
        |         CASE WHEN woe_raw IS NOT NULL
        |              THEN (CAST(pos AS DOUBLE) / p_tot -
        |                    CAST(neg AS DOUBLE) / n_tot) * woe_raw
        |              ELSE 0.0 END AS iv_term
        |  FROM w)
        |SELECT decile, pos, neg, round(woe_raw, 6) AS woe,
        |       round(iv_term, 6) AS iv_term,
        |       round(sum(iv_term) OVER (ORDER BY decile ROWS BETWEEN
        |             UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_iv
        |FROM w2 ORDER BY decile""".stripMargin,

    // identical combined-census decile boundaries; all-integer rates
    "q_uplift_deciles" ->
      """WITH sc AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
        |         CAST(user_id % 2 = 0 AS BIGINT) AS a,
        |         CAST(event_type = 'purchase' AS BIGINT) AS y
        |  FROM events),
        |cen AS (
        |  SELECT score, count(*) AS n,
        |         CAST(sum(a) AS BIGINT) AS na,
        |         CAST(sum(a * y) AS BIGINT) AS xa,
        |         CAST(count(*) - sum(a) AS BIGINT) AS nb,
        |         CAST(sum((1 - a) * y) AS BIGINT) AS xb
        |  FROM sc GROUP BY score),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cen),
        |dec AS (
        |  SELECT CAST((COALESCE(sum(n) OVER (ORDER BY score ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10) // n_tot
        |           AS BIGINT) AS decile,
        |         na, xa, nb, xb
        |  FROM cen, tot),
        |dt AS (
        |  SELECT decile, CAST(sum(na) AS BIGINT) AS n_a,
        |         CAST(sum(xa) AS BIGINT) AS x_a,
        |         CAST(sum(nb) AS BIGINT) AS n_b,
        |         CAST(sum(xb) AS BIGINT) AS x_b
        |  FROM dec GROUP BY decile)
        |SELECT decile, n_a, x_a, n_b, x_b,
        |       CASE WHEN n_a > 0 THEN (x_a * 10000) // n_a END AS rate_a_bp,
        |       CASE WHEN n_b > 0 THEN (x_b * 10000) // n_b END AS rate_b_bp,
        |       CASE WHEN n_a > 0 AND n_b > 0
        |            THEN (x_a * 10000) // n_a - (x_b * 10000) // n_b
        |       END AS uplift_bp
        |FROM dt ORDER BY decile""".stripMargin,

    // identical smoothing algebra on HUGEINT; nation join replicated
    "q_target_encode" ->
      """WITH per AS (
        |  SELECT s.s_nationkey,
        |         count(*) AS n,
        |         CAST(sum(CAST(l.l_returnflag = 'R' AS BIGINT)) AS BIGINT)
        |           AS r
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY s.s_nationkey),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
        |               CAST(sum(r) AS BIGINT) AS r_tot FROM per)
        |SELECT nt.n_name AS nation, per.n, per.r,
        |       (per.r * 10000) // per.n AS raw_bp,
        |       CAST((CAST(per.r AS HUGEINT) * n_tot + 100 * r_tot) * 10000
        |         // (CAST(per.n + 100 AS HUGEINT) * n_tot) AS BIGINT)
        |         AS enc_bp
        |FROM per JOIN nation nt ON per.s_nationkey = nt.n_nationkey, tot
        |ORDER BY nation""".stripMargin,

    "q_calibration" ->
      s"""WITH $gdCtes
         |SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |       round(sum(y) / count(*), 4) AS observed_rate,
         |       round(avg(p), 4) AS avg_predicted
         |FROM (SELECT y, least(CAST(floor(p * 10) AS INTEGER), 9) AS bucket,
         |             p
         |      FROM (SELECT y,
         |              1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
         |            FROM data CROSS JOIN s3))
         |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_naive_bayes" ->
      s"""WITH $nbCtes
         |SELECT true_lang, pred_lang, n
         |FROM conf ORDER BY true_lang, pred_lang""".stripMargin,

    // same census deciles, interval means from prefix sums, and the
    // minimax identity as min-then-max aggregation
    "q_isotonic_fit" ->
      """WITH sc AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
        |         CAST(event_type = 'purchase' AS BIGINT) AS y
        |  FROM events),
        |cen AS (
        |  SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS np
        |  FROM sc GROUP BY score),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cen),
        |dec AS (
        |  SELECT CAST((COALESCE(sum(n) OVER (ORDER BY score ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10) // n_tot
        |           AS BIGINT) AS decile,
        |         n, np
        |  FROM cen, tot),
        |dt AS (
        |  SELECT decile, CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(np) AS BIGINT) AS pos
        |  FROM dec GROUP BY decile),
        |pre AS (
        |  SELECT decile, n, pos,
        |         CAST(sum(n) OVER wc AS BIGINT) AS cn,
        |         CAST(sum(pos) OVER wc AS BIGINT) AS cp
        |  FROM dt
        |  WINDOW wc AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND CURRENT ROW)),
        |iv AS (
        |  SELECT a.decile AS i, b.decile AS j,
        |         CAST(b.cp - (a.cp - a.pos) AS DOUBLE) /
        |           (b.cn - (a.cn - a.n)) AS m
        |  FROM pre a JOIN pre b ON a.decile <= b.decile),
        |mn AS (
        |  SELECT d.decile AS k, d.n, d.pos, iv.i, min(iv.m) AS mn
        |  FROM dt d JOIN iv ON iv.i <= d.decile AND iv.j >= d.decile
        |  GROUP BY d.decile, d.n, d.pos, iv.i)
        |SELECT k AS decile, n, pos,
        |       round(CAST(pos AS DOUBLE) / n, 6) AS raw_rate,
        |       round(max(mn), 6) AS iso_rate
        |FROM mn GROUP BY k, n, pos ORDER BY decile""".stripMargin,

    // same confusion CTEs; marginal algebra and bp metrics all-integer
    "q_f1_scores" ->
      s"""WITH $nbCtes,
         |bt AS (SELECT true_lang AS lang, CAST(sum(n) AS BIGINT) AS n_true,
         |              CAST(sum(CASE WHEN true_lang = pred_lang
         |                            THEN n ELSE 0 END) AS BIGINT) AS tp0
         |       FROM conf GROUP BY 1),
         |bp AS (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS n_pred
         |       FROM conf GROUP BY 1),
         |m AS (SELECT COALESCE(bt.lang, bp.lang) AS lang,
         |             COALESCE(tp0, 0) AS tp,
         |             COALESCE(n_pred, 0) - COALESCE(tp0, 0) AS fp,
         |             COALESCE(n_true, 0) - COALESCE(tp0, 0) AS fn
         |      FROM bt FULL JOIN bp ON bt.lang = bp.lang),
         |mm AS (SELECT lang, tp, fp, fn,
         |              CASE WHEN tp + fp > 0
         |                   THEN tp * 10000 // (tp + fp) ELSE 0 END
         |                AS precision_bp,
         |              CASE WHEN tp + fn > 0
         |                   THEN tp * 10000 // (tp + fn) ELSE 0 END
         |                AS recall_bp
         |       FROM m)
         |SELECT lang, tp, fp, fn, precision_bp, recall_bp,
         |       CASE WHEN precision_bp + recall_bp > 0
         |            THEN 2 * precision_bp * recall_bp //
         |                 (precision_bp + recall_bp)
         |            ELSE 0 END AS f1_bp
         |FROM mm ORDER BY lang""".stripMargin,
    // identical recurrence, unrolled; gradients divide by n BEFORE the
    // subtraction exactly as the Spark expression does
    "q_logreg" ->
      s"""WITH $gdCtes
        |SELECT count(*) AS n, round(max(w0), 6) AS w0,
        |       round(max(w1), 6) AS w1, round(max(w2), 6) AS w2,
        |       CAST(sum(CASE WHEN
        |         CAST(w0 + w1 * x1 + w2 * x2 > 0.0 AS DOUBLE) = y
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |       round(CAST(sum(CASE WHEN
        |         CAST(w0 + w1 * x1 + w2 * x2 > 0.0 AS DOUBLE) = y
        |         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS accuracy
        |FROM data CROSS JOIN s3""".stripMargin,

    // identical per-user reduction and 2×2 census; the SAME shared
    // ln/se expression text and z literal
    "q_odds_ratio" ->
      s"""WITH u AS (
         |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e,
         |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS y
         |  FROM events
         |  GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400),
         |cen AS (SELECT CAST(sum(e * y) AS BIGINT) AS a,
         |               CAST(sum(e * (1 - y)) AS BIGINT) AS b,
         |               CAST(sum((1 - e) * y) AS BIGINT) AS c,
         |               CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS dd
         |        FROM u)
         |SELECT a, b, c, dd AS d,
         |       CAST(CAST(a AS HUGEINT) * dd * 10000 //
         |            NULLIF(CAST(b AS HUGEINT) * c, 0) AS BIGINT) AS or_bp,
         |       round($OrLog, 6) AS log_or,
         |       round(($OrLog) - $OrZ * ($OrSe), 6) AS ci_lo,
         |       round(($OrLog) + $OrZ * ($OrSe), 6) AS ci_hi
         |FROM cen""".stripMargin,

    // identical distinct-user census and collapsed even-split χ² shape
    "q_ab_srm" ->
      """WITH u AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |cen AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(e) AS BIGINT) AS na FROM u)
        |SELECT n AS n_users, na, n - na AS nb,
        |       CAST(na * 10000 // n AS BIGINT) AS ratio_bp,
        |       round(CAST((na - (n - na)) * (na - (n - na)) AS DOUBLE)
        |             / n, 6) AS chi2,
        |       CAST((na - (n - na)) * (na - (n - na)) AS DOUBLE) / n
        |         > 3.841458820694124 AS srm_flag
        |FROM cen""".stripMargin,

    // identical exact per-cluster moments; the SAME shared MSB/MSW/n0
    // expression text; Σs²/n as the same ×1e4-rounded integer terms on
    // HUGEINT — order-free on both engines
    "q_icc" ->
      s"""WITH cen AS (
         |  SELECT user_id, count(*) AS ni,
         |         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
         |           AS si,
         |         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
         |             * CAST(round(value * 100) AS BIGINT)) AS qi
         |  FROM events GROUP BY 1),
         |mom0 AS (SELECT count(*) AS k, sum(ni) AS n, sum(si) AS ss,
         |               sum(qi) AS qq,
         |               sum(CAST(ni AS HUGEINT) * ni) AS nsq,
         |               sum(CAST(round(cast(si as double) *
         |                   cast(si as double) / ni * 10000, 0)
         |                   AS HUGEINT)) AS t4
         |        FROM cen),
         |mom AS (SELECT k, n, ss, qq, nsq,
         |               CAST(t4 AS DOUBLE) / 10000.0 AS tfold FROM mom0)
         |SELECT k, CAST(n AS BIGINT) AS n,
         |       round(($IccMsb) / 10000.0, 4) AS msb_d2,
         |       round(($IccMsw) / 10000.0, 4) AS msw_d2,
         |       round($IccExpr, 6) AS icc,
         |       round(1.0 + (cast(n as double) / k - 1.0) * ($IccExpr), 4)
         |         AS deff
         |FROM mom""".stripMargin,

    // the q_calibration spine verbatim; identical per-bucket HL term
    // and bucket-ordered fold
    "q_hosmer_lemeshow" ->
      s"""WITH $gdCtes,
         |binned AS (
         |  SELECT bucket, count(*) AS nb, CAST(sum(y) AS BIGINT) AS o,
         |         sum(p) AS e
         |  FROM (SELECT y,
         |               least(CAST(floor(p * 10) AS INTEGER), 9) AS bucket,
         |               p
         |        FROM (SELECT y,
         |                1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
         |              FROM data CROSS JOIN s3))
         |  GROUP BY bucket)
         |SELECT bucket, nb, o, round(e, 4) AS e_pred,
         |       round((o - e) * (o - e) / (e * (1.0 - e / nb)), 6)
         |         AS hl_term,
         |       round(sum((o - e) * (o - e) / (e * (1.0 - e / nb)))
         |             OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
         |             PRECEDING AND CURRENT ROW), 4) AS cum_hl
         |FROM binned ORDER BY bucket""".stripMargin,

    // the same spine; mean (p−y)² beside the base-rate reference
    "q_brier_score" ->
      s"""WITH $gdCtes,
         |sc AS (SELECT y,
         |              1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p
         |       FROM data CROSS JOIN s3),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(y) AS BIGINT) AS n_pos,
         |               sum((p - y) * (p - y)) AS bs FROM sc)
         |SELECT n, n_pos,
         |       CAST(n_pos * 10000 // n AS BIGINT) AS base_rate_bp,
         |       round(bs / n, 6) AS brier,
         |       round((cast(n_pos as double) / n) *
         |             (1.0 - cast(n_pos as double) / n), 6) AS brier_ref
         |FROM agg""".stripMargin
  )
}
