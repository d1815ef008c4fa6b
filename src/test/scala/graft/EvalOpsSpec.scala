package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-13/14 evaluation/selection operators —
  * each is value-exact vs the DuckDB oracle; these assert what the oracle
  * can't see: independent brute-force recomputation in plain Scala,
  * conservation laws, and the estimators' analytic bounds.
  */
class EvalOpsSpec extends AnyFunSuite with SparkSpec {

  test("Kaplan-Meier life table matches a plain-Scala estimator") {
    // recompute survival from raw orders with a sequential fold — no
    // windows, no SQL — and require the engine's census plan to agree
    val life = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("fd"), max(col("o_orderdate")).as("ld"))
      .select(expr("datediff(ld, fd) div 30").as("t"), col("ld"))
      .collect()
    def day(r: org.apache.spark.sql.Row): java.time.LocalDate = r.get(1) match {
      case d: java.sql.Date              => d.toLocalDate
      case d: java.time.LocalDate        => d
      case t: java.time.LocalDateTime    => t.toLocalDate
      case t: java.sql.Timestamp         => t.toLocalDateTime.toLocalDate
    }
    val hz = life.map(day).maxBy(_.toEpochDay)
    val durs = life.map { r =>
      (r.getAs[Long]("t"), java.time.temporal.ChronoUnit.DAYS.between(day(r), hz) > 365)
    }
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durs.length.toLong
    var s = 1.0
    val expected = byT.map { case (t, xs) =>
      val d = xs.count(_._2).toLong
      val row = (t, atRisk, d, xs.length - d)
      s = if (d == atRisk) 0.0 else s * (atRisk - d).toDouble / atRisk
      atRisk -= xs.length
      (row, s)
    }
    val got = q("q_kaplan_meier").collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, ((t, n, d, c), sv)) =>
      assert(r.getAs[Long]("t") == t && r.getAs[Long]("n_risk") == n &&
        r.getAs[Long]("d") == d && r.getAs[Long]("censored") == c,
        s"life-table row mismatch at t=$t: $r")
      assert(math.abs(r.getAs[Double]("s_hat") - sv) < 1e-5,
        s"t=$t survival ${r.getAs[Double]("s_hat")} vs scala $sv")
    }
    // the estimator's shape: Ŝ starts ≤ 1 and never increases
    val ss = got.map(_.getAs[Double]("s_hat"))
    assert(ss.head <= 1.0 + 1e-9 && ss.zip(ss.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("census AUC equals the all-pairs Mann-Whitney statistic") {
    val rows = Tables(spark, sf, "events")
      .select(round(col("value") * 100).cast("long").as("score"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1) == 1L))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var wins2 = 0L
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val r = q("q_auc_rank").collect()(0)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    assert(r.getAs[Long]("wins2") == wins2,
      s"census wins2 ${r.getAs[Long]("wins2")} vs brute $wins2")
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("lift table conserves the corpus and ends at 10000 bp gain") {
    val rows = q("q_lift_gain").collect()
    val nTot = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nTot)
    assert(rows.forall(r => r.getAs[Long]("decile") >= 0 &&
      r.getAs[Long]("decile") <= 9))
    val last = rows.maxBy(_.getAs[Long]("decile"))
    assert(last.getAs[Long]("gain_bp") == 10000L)
    assert(last.getAs[Long]("cum_n") == nTot)
    // cumulative gain never decreases as deciles deepen
    val ordered = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("gain_bp"))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a })
  }

  test("banded band join equals the quadratic definition") {
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
    for (a <- o; b <- o if a._2 == b._2 && a._1 < b._1) {
      val gap = math.abs(a._3 - b._3)
      if (gap <= 2500) {
        val (n, mn, mx, sm) = brute.getOrElse(a._2, (0L, Long.MaxValue, 0L, 0L))
        brute(a._2) = (n + 1, math.min(mn, gap), math.max(mx, gap), sm + gap)
      }
    }
    val got = q("q_band_join").collect()
    assert(got.length == brute.size)
    got.foreach { r =>
      val (n, mn, mx, sm) = brute(r.getAs[String]("prio"))
      assert(r.getAs[Long]("n_pairs") == n && r.getAs[Long]("min_gap_cents") == mn &&
        r.getAs[Long]("max_gap_cents") == mx && r.getAs[Long]("sum_gap_cents") == sm,
        s"band census mismatch for ${r.getAs[String]("prio")}")
    }
  }

  test("random walks follow real edges with the brute-force argmin hop") {
    val P = 2147483647L
    val pairs = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    pairs.foreach { case (p, sKey) =>
      adj(p * 2) = (sKey * 2 + 1) :: adj(p * 2)
      adj(sKey * 2 + 1) = (p * 2) :: adj(sKey * 2 + 1)
    }
    val walks = q("q_random_walk").collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("step"), r.getAs[Long]("node")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(walks.nonEmpty && walks.keys.forall(_ <= 10))
    walks.foreach { case (seed, path) =>
      assert(path.head == seed && path.length == 5)
      path.zip(path.tail).zipWithIndex.foreach { case ((cur, nxt), i) =>
        val st = i + 1
        val best = adj(cur).distinct
          .map(dst => (((cur % P) * 1103515245L + dst * 69069L + st * 12345L) % P, dst))
          .minBy(identity)._2
        assert(nxt == best, s"seed=$seed step=$st: engine hop $nxt vs brute $best")
      }
    }
  }

  test("dim-ablation recall at d=8 equals a plain-Scala reranking") {
    val all = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(d, math.min(a.length, b.length))
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def top5(pid: Long, pv: Array[Float], d: Int): Set[Long] =
      all.filter(_._1 != pid)
        .map { case (id, v) =>
          (BigDecimal(cos(pv, v, d)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
    val expected = all.filter(_._1 < 10).map { case (pid, pv) =>
      pid -> (top5(pid, pv, 64) intersect top5(pid, pv, 8)).size.toLong
    }.toMap
    val got = q("q_dim_ablation").collect()
      .filter(_.getAs[Long]("dim") == 8L)
    assert(got.length == expected.size)
    got.foreach { r =>
      val pid = r.getAs[Long]("probe_id")
      assert(r.getAs[Long]("k") == 5L)
      assert(r.getAs[Long]("n_hit") == expected(pid),
        s"probe $pid: engine ${r.getAs[Long]("n_hit")} vs brute ${expected(pid)}")
    }
  }

  test("k-center picks match greedy farthest-first and radii never grow") {
    val all = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val byId = all.toMap
    var centers = List(0L)
    var picks = List((0L, 0L, 0.0))
    for (st <- 1 to 5) {
      val (id, dd) = all.map { case (id, v) =>
        (id, centers.map(c => d2(v, byId(c))).min)
      }.maxBy { case (id, dd) => (dd, -id) }
      centers = id :: centers
      picks = (st.toLong, id, dd) :: picks
    }
    val expected = picks.reverse
    val got = q("q_coreset_kcenter").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("center_id"), r.getAs[Double]("dist2")))
    assert(got.length == 6)
    got.zip(expected).foreach { case ((s1, c1, dd1), (s2, c2, dd2)) =>
      assert(s1 == s2 && c1 == c2, s"step $s2: engine center $c1 vs brute $c2")
      assert(math.abs(dd1 - dd2) < 1e-5)
    }
    // farthest-first radius is non-increasing (the 2-approx invariant)
    val radii = got.sortBy(_._1).map(_._3).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("bottom-k sample: merged sketch equals the direct global sample") {
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def est(sample: Seq[Long], q10: Int): Long = {
      val s = sample.sorted
      s(((s.length - 1) * q10 / 10).toInt)
    }
    val perSrc = docs.groupBy(_._1).view.mapValues(
      _.sortBy(_._3).take(32).map(_._2).toSeq).toMap
    // min-k closure: global bottom-32 == bottom-32 of per-source sketches
    val direct = docs.sortBy(_._3).take(32).map(_._2).toSeq
    val got = q("q_bottomk_sample").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("k"), r.getAs[Long]("est_p50"), r.getAs[Long]("est_p90")))
      .toMap
    assert(got("ALL") == ((32L, est(direct, 5), est(direct, 9))),
      s"merged sketch ${got("ALL")} vs direct-global recompute")
    perSrc.foreach { case (src, sample) =>
      assert(got(src) == ((sample.length.toLong, est(sample, 5), est(sample, 9))),
        s"source $src sketch mismatch")
    }
  }

  test("MMR picks are distinct, lead with pure relevance, and scores never rise") {
    val rows = q("q_mmr_diverse").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // pick 1 is the relevance argmax: its mmr_score is 0.5·rel exactly
    assert(rows.head.getAs[Double]("mmr_score") ==
      0.5 * rows.head.getAs[Double]("rel"))
    assert(rows.forall(r => r.getAs[Double]("rel") <=
      rows.head.getAs[Double]("rel") + 1e-12))
    // the best available marginal gain shrinks as the selected set grows —
    // from rank 2 on (rank 1's penalty is defined 0 over the empty set,
    // while rank 2's max-sim can be NEGATIVE cosine, legally raising the
    // score across that one boundary)
    val scores = rows.drop(1).map(_.getAs[Double]("mmr_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("log-rank statistic matches a plain-Scala fold over the life table") {
    val grp = Tables(spark, sf, "customer")
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute churn against the horizon in Scala from raw durations
    val raw = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(expr("datediff(max(o_orderdate), min(o_orderdate)) div 30").as("t"),
        max(col("o_orderdate")).cast("date").as("ld"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Date]("ld").toLocalDate))
    val hz = raw.map(_._3).maxBy(_.toEpochDay)
    val durs = raw.map { case (ck, t, ld) =>
      (t, java.time.temporal.ChronoUnit.DAYS.between(ld, hz) > 365, grp(ck)) }
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
    var nAt = durs.length.toLong
    var n1At = durs.map(_._3).sum
    var cumOe = 0.0; var cumV = 0.0
    byT.foreach { case (_, xs) =>
      val dd = xs.count(_._2).toLong
      val d1 = xs.filter(_._2).map(_._3).sum
      cumOe += d1 - dd.toDouble * n1At / nAt
      if (nAt > 1)
        cumV += dd.toDouble * n1At / nAt * (1.0 - n1At.toDouble / nAt) *
          (nAt - dd) / (nAt - 1)
      nAt -= xs.length
      n1At -= xs.map(_._3).sum
    }
    val r = q("q_logrank").collect()(0)
    assert(r.getAs[Long]("n1") == durs.map(_._3).sum)
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == durs.length.toLong)
    assert(math.abs(r.getAs[Double]("o_minus_e") - cumOe) < 1e-4,
      s"O-E ${r.getAs[Double]("o_minus_e")} vs scala $cumOe")
    assert(math.abs(r.getAs[Double]("variance") - cumV) < 1e-4)
    assert(math.abs(r.getAs[Double]("chi2") - cumOe * cumOe / cumV) < 1e-3)
    assert(r.getAs[Double]("variance") > 0)
  }

  test("NDCG@10 and MRR match a plain-Scala reranking") {
    val all = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos6(a: Array[Float], b: Array[Float]): BigDecimal = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val coef = (1 to 10).map(i => 1.0 / (math.log(i + 1) / math.log(2)))
    val got = q("q_ndcg").collect()
    assert(got.length == all.count(_._1 < 10))
    got.foreach { r =>
      val pid = r.getAs[Long]("probe_id")
      val (_, pv, pl) = all.find(_._1 == pid).get
      val ranked = all.filter(_._1 != pid)
        .map { case (id, v, l) => (cos6(pv, v), id, l) }
        .sortBy { case (c, id, _) => (-c, id) }.take(10)
      val gains = ranked.map(t => if (t._3 == pl) 1L else 0L)
      var dcg = 0.0
      gains.zipWithIndex.foreach { case (g, i) => dcg += g * coef(i) }
      val rTotal = all.count(t => t._1 != pid && t._3 == pl).toLong
      val idcg = coef.take(math.min(10L, rTotal).toInt).sum
      val mrr = gains.indexOf(1L) match {
        case -1 => 0.0
        case i  => 1.0 / (i + 1)
      }
      assert(r.getAs[Long]("n_rel") == gains.sum, s"probe $pid n_rel")
      assert(r.getAs[Long]("r_total") == rTotal, s"probe $pid r_total")
      assert(math.abs(r.getAs[Double]("dcg") - dcg) < 1e-5, s"probe $pid dcg")
      assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-5,
        s"probe $pid ndcg")
      assert(math.abs(r.getAs[Double]("mrr") - mrr) < 1e-5, s"probe $pid mrr")
    }
  }

  test("F1 census marginals reconcile with the confusion matrix") {
    val conf = q("q_naive_bayes").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val f1 = q("q_f1_scores").collect()
    val total = conf.values.sum
    assert(f1.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum == total)
    assert(f1.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp")).sum == total)
    f1.foreach { r =>
      val lang = r.getAs[String]("lang")
      val tp = conf.getOrElse((lang, lang), 0L)
      assert(r.getAs[Long]("tp") == tp, s"$lang tp")
      val fn = conf.collect { case ((t, p), n) if t == lang && p != lang => n }.sum
      val fp = conf.collect { case ((t, p), n) if p == lang && t != lang => n }.sum
      assert(r.getAs[Long]("fn") == fn && r.getAs[Long]("fp") == fp, s"$lang fp/fn")
      Seq("precision_bp", "recall_bp", "f1_bp").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 10000, s"$lang $c=$v")
      }
    }
  }

  test("Nelson-Aalen hazard matches a plain-Scala sequential fold") {
    val life = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("fd"), max(col("o_orderdate")).as("ld"))
      .select(expr("datediff(ld, fd) div 30").as("t"), col("ld"))
      .collect()
    def day(r: org.apache.spark.sql.Row): java.time.LocalDate = r.get(1) match {
      case d: java.sql.Date              => d.toLocalDate
      case d: java.time.LocalDate        => d
      case t: java.time.LocalDateTime    => t.toLocalDate
      case t: java.sql.Timestamp         => t.toLocalDateTime.toLocalDate
    }
    val hz = life.map(day).maxBy(_.toEpochDay)
    val durs = life.map { r =>
      (r.getAs[Long]("t"),
        java.time.temporal.ChronoUnit.DAYS.between(day(r), hz) > 365)
    }
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durs.length.toLong
    var h = 0.0; var v = 0.0
    val expected = byT.map { case (t, xs) =>
      val d = xs.count(_._2).toLong
      h += d.toDouble / atRisk
      v += d / (atRisk.toDouble * atRisk)
      val row = (t, atRisk, d, h, math.exp(-h), v)
      atRisk -= xs.length
      row
    }
    val got = q("q_nelson_aalen").collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (t, n, d, eh, es, ev)) =>
      assert(r.getAs[Long]("t") == t && r.getAs[Long]("n_risk") == n &&
        r.getAs[Long]("d") == d, s"census row mismatch at t=$t")
      assert(math.abs(r.getAs[Double]("cum_hazard") - eh) < 1e-6, s"H($t)")
      assert(math.abs(r.getAs[Double]("s_na") - es) < 1e-6, s"S($t)")
      assert(math.abs(r.getAs[Double]("var_na") - ev) < 1e-6, s"V($t)")
    }
    // NA survival dominates KM survival everywhere (exp(-x) >= 1-x)
    val km = q("q_kaplan_meier").collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("s_hat")).toMap
    got.foreach { r =>
      assert(r.getAs[Double]("s_na") >= km(r.getAs[Long]("t")) - 1e-9)
    }
  }

  /** Brute-force ascending score deciles: (decile → rows), replicating
    * the census assignment (a score group lands wholly in the decile
    * where its cumulative count starts).
    */
  private def scalaDeciles[T](rows: Seq[(Long, T)]): Map[Long, Seq[T]] = {
    val byScore = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val nTot = rows.size.toLong
    var cumBefore = 0L
    val out = scala.collection.mutable.Map.empty[Long, Vector[T]]
      .withDefaultValue(Vector.empty)
    byScore.foreach { case (_, xs) =>
      val dec = cumBefore * 10 / nTot
      out(dec) = out(dec) ++ xs.map(_._2)
      cumBefore += xs.size
    }
    out.toMap
  }

  test("WOE/IV matches a plain-Scala recompute over brute-force deciles") {
    val rows = Tables(spark, sf, "events")
      .select(round(col("value") * 100).cast("long").as("score"),
        (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val dec = scalaDeciles(rows)
    val pTot = rows.count(_._2).toLong
    val nTot = rows.size.toLong - pTot
    val got = q("q_woe_iv").collect()
    assert(got.map(_.getAs[Long]("pos")).sum == pTot)
    assert(got.map(_.getAs[Long]("neg")).sum == nTot)
    var cumIv = 0.0
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      val pos = dec(d).count(identity).toLong
      val neg = dec(d).size - pos
      assert(r.getAs[Long]("pos") == pos && r.getAs[Long]("neg") == neg,
        s"decile $d cell counts")
      if (pos > 0 && neg > 0) {
        val woe = math.log((pos.toDouble * nTot) / (neg.toDouble * pTot))
        assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-6, s"woe($d)")
        cumIv += (pos.toDouble / pTot - neg.toDouble / nTot) * woe
      } else assert(r.isNullAt(r.fieldIndex("woe")), s"empty cell woe($d)")
      assert(math.abs(r.getAs[Double]("cum_iv") - cumIv) < 1e-6, s"iv($d)")
    }
  }

  test("uplift deciles conserve both arms and match brute-force rates") {
    val rows = Tables(spark, sf, "events")
      .select(round(col("value") * 100).cast("long").as("score"),
        (col("user_id") % 2 === 0).as("a"),
        (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getLong(0), (r.getBoolean(1), r.getBoolean(2))))
      .toSeq
    val dec = scalaDeciles(rows)
    val got = q("q_uplift_deciles").collect()
    assert(got.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
      == rows.size.toLong, "arms conserve the corpus")
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      val cell = dec(d)
      val (na, xa) = (cell.count(_._1).toLong,
        cell.count(t => t._1 && t._2).toLong)
      val (nb, xb) = (cell.count(!_._1).toLong,
        cell.count(t => !t._1 && t._2).toLong)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("x_a") == xa &&
        r.getAs[Long]("n_b") == nb && r.getAs[Long]("x_b") == xb,
        s"decile $d cells")
      if (na > 0 && nb > 0)
        assert(r.getAs[Long]("uplift_bp") ==
          xa * 10000 / na - xb * 10000 / nb, s"decile $d uplift")
    }
  }

  test("target encoding shrinks toward the prior and matches exact BigInt") {
    val li = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"),
        (col("l_returnflag") === "R").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val byNat = li.groupBy(_._1)
    val nTot = BigInt(li.length)
    val rTot = BigInt(li.count(_._2))
    val got = q("q_target_encode").collect()
    assert(got.length == byNat.size)
    val globalBp = rTot * 10000 / nTot
    got.foreach { r =>
      val n = BigInt(r.getAs[Long]("n")); val rr = BigInt(r.getAs[Long]("r"))
      val rawBp = rr * 10000 / n
      val encBp = (rr * nTot + 100 * rTot) * 10000 / ((n + 100) * nTot)
      assert(r.getAs[Long]("raw_bp") == rawBp, s"${r.getString(0)} raw")
      assert(r.getAs[Long]("enc_bp") == encBp, s"${r.getString(0)} enc")
      // shrinkage: enc sits within [min, max] of raw rate and prior
      val lo = rawBp.min(globalBp) - 1; val hi = rawBp.max(globalBp) + 1
      assert(encBp >= lo && encBp <= hi, s"${r.getString(0)} shrinkage")
    }
  }

  test("Benford audit matches a plain-Scala digit census and chi2 fold") {
    val digits = Tables(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(_.getLong(0).toString.head.asDigit.toLong)
    val byD = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = digits.length.toLong
    val got = q("q_benford_audit").collect()
    assert(got.length == 9)
    var chi2 = 0.0
    got.foreach { r =>
      val d = r.getAs[Long]("digit")
      val n = byD.getOrElse(d, 0L)
      assert(r.getAs[Long]("n") == n, s"digit $d count")
      assert(r.getAs[Long]("share_bp") == n * 10000 / nTot, s"digit $d share")
      val p = math.log10(1.0 + 1.0 / d)
      assert(r.getAs[Long]("expected_bp") == math.round(p * 10000))
      val e = nTot * p
      chi2 += (n - e) * (n - e) / e
      assert(math.abs(r.getAs[Double]("cum_chi2") - chi2) < 1e-4,
        s"digit $d cum chi2")
    }
  }

  test("t-closeness EMD matches an exact BigInt recompute") {
    val rows = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val buckets = rows.map(_._2).distinct.sorted
    val nTot = BigInt(rows.length)
    val globCum = buckets.map(b =>
      b -> BigInt(rows.count(_._2 <= b))).toMap
    val got = q("q_tcloseness").collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val key = (r.getAs[Number]("c_nationkey").longValue,
        r.getAs[String]("c_mktsegment"))
      val cell = rows.filter(_._1 == key).map(_._2)
      val nCls = BigInt(cell.length)
      assert(r.getAs[Long]("n") == cell.length.toLong)
      val devSum = buckets.map { b =>
        (BigInt(cell.count(_ <= b)) * nTot - globCum(b) * nCls).abs
      }.sum
      val expected =
        if (buckets.length > 1)
          devSum * 10000 / (nCls * nTot * (buckets.length - 1))
        else BigInt(0)
      assert(BigInt(r.getAs[Long]("emd_bp")) == expected, s"$key emd")
      assert(r.getAs[Long]("emd_bp") >= 0 &&
        r.getAs[Long]("emd_bp") <= 10000, s"$key emd range")
      assert(r.getAs[Boolean]("close") == (expected <= 2000), s"$key close")
    }
  }

  test("STL-lite seasonality matches a plain-Scala moving-average fold") {
    val daily = Tables(spark, sf, "events")
      .select(expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val got = q("q_stl_lite").collect()
    assert(got.map(_.getAs[Long]("n_days")).sum == daily.length.toLong)
    val byDow = daily.indices.map { i =>
      val lo = math.max(0, i - 3); val hi = math.min(daily.length - 1, i + 3)
      val win = (lo to hi).map(j => daily(j)._2)
      val (day, n) = daily(i)
      val cnt7 = win.length.toLong
      val dev420 = (n * cnt7 - win.sum) * (420 / cnt7)
      ((day + 4) % 7, dev420)
    }.groupBy(_._1)
    got.foreach { r =>
      val dow = r.getAs[Long]("dow")
      val devs = byDow(dow).map(_._2)
      val expected = devs.map(BigInt(_)).sum.toDouble / (devs.size * 420.0)
      assert(math.abs(r.getAs[Double]("seasonal") - expected) < 1e-6,
        s"dow $dow seasonal")
    }
    // the seasonal deviations must roughly cancel across the week (the
    // trend absorbed the level): the n_days-weighted sum is edge-only
    val wsum = got.map(r =>
      r.getAs[Double]("seasonal") * r.getAs[Long]("n_days")).sum
    val scale = daily.map(_._2).max.toDouble
    assert(math.abs(wsum) < 7 * scale, "weighted seasonal sum not edge-sized")
  }

  /** Textbook list-based BPE trainer: greedy left-to-right merge walk on
    * token lists — the semantics witness for the engine's wrapped-form
    * string-replace trick. Returns (round, x, y, pair_n, n_symbols).
    */
  private def scalaBpe(words: Map[String, Long]): Seq[(Long, String, String, Long, Long)] = {
    var seqs: Map[String, List[String]] =
      words.keys.map(w => w -> w.map(_.toString).toList).toMap
    (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      seqs.foreach { case (w, ts) =>
        ts.zip(ts.tail).foreach(p => counts(p) += words(w))
      }
      val ((x, y), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      seqs = seqs.map { case (w, ts) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == x && ts(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += ts(i); i += 1 }
        }
        w -> out.toList
      }
      val nSym = seqs.map { case (w, ts) => words(w) * ts.length }.sum
      (r.toLong, x, y, cnt, nSym)
    }
  }

  private def bpeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("x"),
        r.getAs[String]("y"), r.getAs[Long]("pair_n"),
        r.getAs[Long]("n_symbols")))
      .sortBy(_._1).toSeq

  test("BPE training loop matches a plain-Scala list-based trainer") {
    // the engine merges via wrapped-form string replace; this twin works
    // on token LISTS with the textbook greedy left-to-right walk — if the
    // two agree, the replace trick implements real BPE merge semantics
    val words = Tables(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = scalaBpe(words)
    val got = bpeRows(q("q_bpe_train"))
    assert(got == expected, s"engine $got vs scala $expected")
    // merges strictly shrink the symbol stream
    val syms = got.map(_._5)
    assert(syms.zip(syms.tail).forall { case (a, b) => b < a })
  }

  test("BPE trainer survives corpus words containing a literal '|'") {
    // '|' was the wrapped-form delimiter before the U+0001 switch; a word
    // containing it used to corrupt segmentation invisibly to the oracle
    // (both engines shared the encoding). This corpus makes '|' a high-
    // frequency symbol so any wrapper collision would change the argmax.
    import spark.implicits._
    val corpus = Seq(
      "foo|bar foo|bar foo|bar baz||qux",
      "|| || a|b a|b quux",
      "pipe||pipe pipe||pipe zzz zzz zzz zzz zzz"
    ).toDF("text")
    val words = corpus
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(words.keys.exists(_.contains("|")), "corpus must stress '|'")
    val got = bpeRows(graft.queries.TextOps.bpeTrain(corpus))
    assert(got == scalaBpe(words), s"pipe corpus: $got vs ${scalaBpe(words)}")
  }

  test("forecast backtest matches a plain-Scala Holt fold per cutoff") {
    val daily = Tables(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    def holt(series: Seq[(Long, Long)]): (Double, Double) =
      series.sortBy(_._1).map(_._2.toDouble)
        .foldLeft((Double.NaN, 0.0)) { case ((l, b), y) =>
          if (l.isNaN) (y, 0.0)
          else {
            val l2 = 0.5 * y + 0.5 * (l + b)
            (l2, 0.5 * (l2 - l) + 0.5 * b)
          }
        }
    val got = q("q_forecast_backtest").collect()
    assert(got.length == byType.size * 3)
    got.foreach { r =>
      val (et, age) = (r.getAs[String]("event_type"), r.getAs[Long]("cutoff_age"))
      val series = byType(et).map(t => (t._2, t._3))
      val dmax = series.map(_._1).max
      val cut = series.filter(_._1 <= dmax - age)
      val (l, b) = holt(cut)
      val fc = l + 7.0 * b
      val actual = series.find(_._1 == dmax - age + 7).map(_._2).getOrElse(0L)
      assert(r.getAs[Long]("n_days") == cut.length.toLong, s"$et/$age n_days")
      assert(math.abs(r.getAs[Double]("forecast_7") - fc) < 1e-3,
        s"$et/$age forecast ${r.getAs[Double]("forecast_7")} vs $fc")
      assert(r.getAs[Long]("actual") == actual, s"$et/$age actual")
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(fc - actual)) < 1e-3)
    }
  }

  test("sequential A/B z-path matches a plain-Scala cumulative fold") {
    val rows = Tables(spark, sf, "events")
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        (col("user_id") % 2 === 0).as("a"),
        (col("event_type") === "purchase").as("x"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val days = rows.map(_._1).distinct.sorted
    var (na, xa, nb, xb) = (0L, 0L, 0L, 0L)
    var firstCross: Option[Long] = None
    var crossed = 0L
    var zLast = 0.0
    days.foreach { d =>
      val todays = rows.filter(_._1 == d)
      na += todays.count(_._2); xa += todays.count(t => t._2 && t._3)
      nb += todays.count(!_._2); xb += todays.count(t => !t._2 && t._3)
      val p = (xa + xb).toDouble / (na + nb)
      val z = if (p > 0 && p < 1 && na > 0 && nb > 0)
        (xa.toDouble / na - xb.toDouble / nb) /
          math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
      else 0.0
      if (math.abs(z) >= 1.96) {
        crossed += 1
        if (firstCross.isEmpty) firstCross = Some(d)
      }
      zLast = z
    }
    val r = q("q_sequential_ab").collect()(0)
    assert(r.getAs[Long]("na") == na && r.getAs[Long]("xa") == xa &&
      r.getAs[Long]("nb") == nb && r.getAs[Long]("xb") == xb)
    assert(math.abs(r.getAs[Double]("z_final") - zLast) < 1e-3)
    assert(Option(r.getAs[java.lang.Long]("first_cross_day")).map(_.toLong)
      == firstCross, "first crossing day")
    assert(r.getAs[Long]("n_days_crossed") == crossed)
  }

  test("stratified k-fold census conserves the corpus and its deviations") {
    val rows = q("q_stratified_kfold").collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("fold")).distinct.sorted.toSeq == (0L to 4L))
    // per-fold shares are a partition of each fold (floor-division slack < langs)
    rows.groupBy(_.getAs[Long]("fold")).foreach { case (f, rs) =>
      val bp = rs.map(_.getAs[Long]("share_bp")).sum
      assert(bp > 10000 - rs.length && bp <= 10000, s"fold $f shares sum $bp")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") ==
        math.abs(r.getAs[Long]("share_bp") - r.getAs[Long]("global_bp")))
    }
  }

  test("minimax isotonic fit equals a textbook weighted PAV fold") {
    val rows = q("q_isotonic_fit").collect()
      .sortBy(_.getAs[Long]("decile"))
    val (ns, ps) = (rows.map(_.getAs[Long]("n")), rows.map(_.getAs[Long]("pos")))
    // weighted pool-adjacent-violators: pools of (sumPos, sumN); merge
    // while the last pool's mean is <= its predecessor's
    val pools = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    ns.indices.foreach { i =>
      pools += ((ps(i), ns(i)))
      while (pools.length >= 2 && {
        val (p2, n2) = pools(pools.length - 1)
        val (p1, n1) = pools(pools.length - 2)
        p2.toDouble / n2 <= p1.toDouble / n1
      }) {
        val (p2, n2) = pools.remove(pools.length - 1)
        val (p1, n1) = pools.remove(pools.length - 1)
        pools += ((p1 + p2, n1 + n2))
      }
    }
    // expand pool means to per-decile fits
    val fits = scala.collection.mutable.ArrayBuffer.empty[Double]
    var idx = 0
    pools.foreach { case (p, n) =>
      var w = 0L
      while (w < n) { fits += p.toDouble / n; w += ns(idx); idx += 1 }
    }
    assert(fits.length == rows.length)
    rows.zip(fits).foreach { case (r, f) =>
      assert(math.abs(r.getAs[Double]("iso_rate") - f) < 1e-5,
        s"decile ${r.getAs[Long]("decile")}: minimax ${r.getAs[Double]("iso_rate")} vs PAV $f")
    }
    // the fit is monotone non-decreasing
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-12 })
  }

  test("CUPED adjustment matches a plain-Scala exact-moment recompute") {
    val rows = Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d0 = rows.map(_._2).min
    val per = rows.groupBy(_._1).map { case (u, es) =>
      val x = es.filter(_._2 < d0 + 15).map(_._4).sum
      val y = es.filter(e => e._2 >= d0 + 15 && e._3 == "purchase").map(_._4).sum
      (u, x, y)
    }.toSeq
    val n = per.length.toLong
    val (sx, sy) = (per.map(_._2).map(BigInt(_)).sum, per.map(_._3).map(BigInt(_)).sum)
    val sxy = per.map(t => BigInt(t._2) * t._3).sum
    val sxx = per.map(t => BigInt(t._2) * t._2).sum
    val syy = per.map(t => BigInt(t._3) * t._3).sum
    val aSide = per.filter(_._1 % 2 == 0)
    val (na, sxa, sya) = (aSide.length.toLong,
      aSide.map(_._2).map(BigInt(_)).sum, aSide.map(_._3).map(BigInt(_)).sum)
    val theta = (BigInt(n) * sxy - sx * sy).toDouble / (BigInt(n) * sxx - sx * sx).toDouble
    val dy = sya.toDouble / na - (sy - sya).toDouble / (n - na)
    val dx = sxa.toDouble / na - (sx - sxa).toDouble / (n - na)
    val r2num = (BigInt(n) * sxy - sx * sy).toDouble
    val r2 = r2num * r2num /
      ((BigInt(n) * sxx - sx * sx).toDouble * (BigInt(n) * syy - sy * sy).toDouble)
    val r = q("q_cuped").collect()(0)
    assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == n - na)
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-4)
    assert(math.abs(r.getAs[Double]("diff_raw") - dy) < 1e-2)
    assert(math.abs(r.getAs[Double]("diff_cuped") - (dy - theta * dx)) < 1e-2)
    assert(math.abs(r.getAs[Double]("rho2") - r2) < 1e-4)
    assert(r.getAs[Double]("rho2") >= 0 && r.getAs[Double]("rho2") <= 1)
  }

  test("A/B power sizing follows the closed form and shrinks with n") {
    val r = q("q_ab_power").collect()(0)
    val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
    val p = r.getAs[Double]("p")
    val zsum = 1.959963984540054 + 0.8416212335729143
    val mde = zsum * math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-5)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / p) < 1e-4)
    assert(mde > 0 && p > 0 && p < 1)
  }

  test("census Gini equals the sorted-rank definition") {
    val xs = Tables(spark, sf, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq.sorted
    val n = xs.length.toLong
    val t = xs.map(BigInt(_)).sum
    val sRank = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(2) * sRank - BigInt(n + 1) * t).toDouble / (BigInt(n) * t).toDouble
    val r = q("q_gini").collect()(0)
    assert(r.getAs[Long]("n") == n)
    assert(BigInt(r.getAs[Long]("total_cents")) == t)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5,
      s"census ${r.getAs[Double]("gini")} vs sorted-rank $gini")
    assert(gini >= 0 && gini < 1)
  }

  test("l-diversity census partitions the customer table") {
    val rows = q("q_ldiversity").collect()
    val nCust = Tables(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nCust)
    rows.foreach { r =>
      val (n, l) = (r.getAs[Long]("n"), r.getAs[Long]("l_div"))
      assert(l >= 1 && l <= n, s"l_div out of range: $r")
      assert(r.getAs[Boolean]("diverse") == (l >= 3))
    }
  }

  /** Shared brute-force fixture: (segment, acctbal cents) pairs. */
  private def segCents: Array[(String, Long)] =
    Tables(spark, sf, "customer")
      .select(col("c_mktsegment"), round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Textbook one-way F over grouped values (BigInt moments). */
  private def bruteF(groups: Map[String, Seq[Long]]): Double = {
    val k = groups.size
    val n = groups.values.map(_.size).sum
    val s = groups.values.flatten.map(BigInt(_)).sum
    val qq = groups.values.flatten.map(x => BigInt(x) * x).sum
    val tFold = groups.values.map { g =>
      val sg = g.map(BigInt(_)).sum
      sg.toDouble * sg.toDouble / g.size
    }.sum
    val grand = s.toDouble * s.toDouble / n.toDouble
    ((tFold - grand) / (k - 1)) / ((qq.toDouble - tFold) / (n - k))
  }

  test("one-way ANOVA F matches the plain-Scala textbook computation") {
    val groups = segCents.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toSeq
    }
    val r = q("q_anova").collect()(0)
    assert(r.getAs[Long]("k") == groups.size.toLong)
    assert(r.getAs[Long]("n") == segCents.length.toLong)
    assert(math.abs(r.getAs[Double]("f_stat") - bruteF(groups)) < 1e-3,
      s"engine ${r.getAs[Double]("f_stat")} vs scala ${bruteF(groups)}")
    // SSB + SSW = SStot conservation at the output rounding
    assert(r.getAs[Double]("ssb_d2") >= 0 && r.getAs[Double]("ssw_d2") > 0)
  }

  test("Brown-Forsythe F matches brute medians and deviations") {
    val groups = segCents.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val med2 = sorted((n - 1) / 2) + sorted(n / 2)
      g -> xs.map(x => math.abs(2 * x._2 - med2)).toSeq
    }
    val r = q("q_levene").collect()(0)
    assert(r.getAs[Long]("k") == groups.size.toLong)
    val expected = bruteF(groups)
    assert(math.abs(r.getAs[Double]("f_bf") - expected) < 1e-3,
      s"engine ${r.getAs[Double]("f_bf")} vs scala $expected")
  }

  /** Monthly (orders, revenue-cents) census — the engine's own reduction
    * (sum-then-round; a per-order round-then-sum brute could differ by a
    * cent), collected once; the STATISTICS on top are brute-forced. */
  private def monthCensus: Seq[(Int, Long, Long)] =
    Tables(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("m"))
      .agg(count(lit(1)).as("x"),
        expr("cast(round(round(sum(o_totalprice), 2) * 100) as bigint)")
          .as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("Kendall tau-b pair counts match the O(n^2) definition") {
    val cen = monthCensus
    var (cc, dd, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- cen.indices; j <- (i + 1) until cen.length) {
      val (_, xa, ya) = cen(i); val (_, xb, yb) = cen(j)
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) cc += 1
      else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) dd += 1
    }
    val r = q("q_kendall_tau").collect()(0)
    assert(r.getAs[Long]("n_months") == cen.length.toLong)
    assert(r.getAs[Long]("concordant") == cc &&
      r.getAs[Long]("discordant") == dd &&
      r.getAs[Long]("ties_x") == tx && r.getAs[Long]("ties_y") == ty,
      s"pair counts: $r vs ($cc, $dd, $tx, $ty)")
    val n0 = cen.length.toLong * (cen.length - 1) / 2
    val tau = (cc - dd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(math.abs(r.getAs[Double]("tau_b") - tau) < 1e-5)
    assert(tau >= -1 && tau <= 1)
  }

  test("Theil-Sen slope is the median of brute pairwise slopes") {
    val cen = monthCensus
    val slopes = (for {
      i <- cen.indices; j <- (i + 1) until cen.length
    } yield (cen(j)._3 - cen(i)._3).toDouble / (cen(j)._1 - cen(i)._1))
      .sorted
    val n = slopes.length
    val med =
      if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
    val r = q("q_theilsen").collect()(0)
    assert(r.getAs[Long]("n_pairs") == n.toLong)
    assert(r.getAs[Long]("n_months") == cen.length.toLong)
    assert(math.abs(r.getAs[Double]("slope_per_month") - med / 100.0) < 1e-3,
      s"engine ${r.getAs[Double]("slope_per_month")} vs brute ${med / 100.0}")
  }

  test("runs test counts match a sequential fold over the day census") {
    val daily = Tables(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(expr("cast(round(round(sum(o_totalprice), 2) * 100) as bigint)")
        .as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val signs = daily.zip(daily.tail).collect {
      case ((_, a), (_, b)) if a != b => b > a
    }
    val nUp = signs.count(identity).toLong
    val nDn = signs.length - nUp
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val r = q("q_runs_test").collect()(0)
    assert(r.getAs[Long]("n_up") == nUp && r.getAs[Long]("n_down") == nDn &&
      r.getAs[Long]("runs") == runs, s"engine $r vs ($nUp, $nDn, $runs)")
    val n = (nUp + nDn).toDouble
    val mu = 1.0 + 2.0 * nUp * nDn / n
    val v = (2.0 * nUp * nDn * (2.0 * nUp * nDn - n)) / (n * n * (n - 1))
    assert(math.abs(r.getAs[Double]("z") -
      (runs - mu) / math.sqrt(v)) < 1e-4)
  }

  test("Gumbel fit reproduces method-of-moments over brute block maxima") {
    val mx = Tables(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("m"),
        to_date(col("o_orderdate")).as("day"))
      .agg(expr("cast(round(round(sum(o_totalprice), 2) * 100) as bigint)")
        .as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
      .groupBy(_._1).values.map(_.map(_._2).max).toSeq
    val n = mx.length
    val mean = mx.map(BigInt(_)).sum.toDouble / n
    val varc = (mx.map(x => BigInt(x) * x).sum.toDouble -
      mx.map(BigInt(_)).sum.toDouble * mx.map(BigInt(_)).sum.toDouble / n) /
      (n - 1)
    val beta = math.sqrt(varc) * (math.sqrt(6.0) / math.Pi)
    val mu = mean - 0.5772156649015329 * beta
    val r = q("q_evt_gumbel").collect()(0)
    assert(r.getAs[Long]("n_blocks") == n.toLong)
    assert(math.abs(r.getAs[Double]("mu") - mu / 100.0) < 0.02)
    assert(math.abs(r.getAs[Double]("beta") - beta / 100.0) < 0.02)
    // return levels grow with horizon and sit above the location param
    assert(r.getAs[Double]("ret100") > r.getAs[Double]("ret10"))
    assert(r.getAs[Double]("ret10") > r.getAs[Double]("mu"))
  }

  test("Shapley attribution: efficiency, symmetry of the permutation game") {
    // brute: average marginal contribution over all 3! channel orders,
    // from the raw per-purchase touched-sets
    val e = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("secs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val touches = e.filter(x => Set("click", "signup", "view")(x._3))
    val masks = e.filter(_._3 == "purchase").map { p =>
      touches.filter(t => t._1 == p._1 && t._4 <= p._4 &&
        t._4 >= p._4 - 86400)
        .map(t => Map("click" -> 1, "signup" -> 2, "view" -> 4)(t._3))
        .distinct.sum
    }.filter(_ > 0)
    def v(smask: Int): Long = masks.count(t => (t & smask) != 0).toLong
    val chans = Seq("click" -> 1, "signup" -> 2, "view" -> 4)
    val phi6 = chans.map { case (name, bv) =>
      name -> chans.map(_._2).permutations.map { perm =>
        val before = perm.takeWhile(_ != bv).sum
        v(before | bv) - v(before)
      }.sum
    }.toMap
    val rows = q("q_shapley_attrib").collect()
    assert(rows.map(_.getAs[Long]("phi_x6")).sum == 6L * v(7),
      "efficiency: sum of Shapley values must equal v(N) x 3!")
    rows.foreach { r =>
      val name = r.getAs[String]("channel")
      assert(r.getAs[Long]("phi_x6") == phi6(name),
        s"$name: engine ${r.getAs[Long]("phi_x6")} vs brute ${phi6(name)}")
      assert(r.getAs[Long]("converted") == v(7))
    }
  }

  test("Spearman rho equals Pearson over brute tie-averaged ranks") {
    val cen = monthCensus
    def ranks(vs: Seq[Long]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = ranks(cen.map(_._2))
    val ry = ranks(cen.map(_._3))
    val n = cen.length.toDouble
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val rho = cov / math.sqrt(vx * vy)
    val r = q("q_spearman").collect()(0)
    assert(r.getAs[Long]("n_months") == cen.length.toLong)
    assert(math.abs(r.getAs[Double]("rho_s") - rho) < 1e-5,
      s"engine ${r.getAs[Double]("rho_s")} vs brute $rho")
  }

  test("Cook's distance: leverages trace to p=2, D matches brute OLS") {
    val cen = monthCensus.map(c => (c._1.toLong, c._3))
    val n = cen.length.toDouble
    val sx = cen.map(_._1).sum.toDouble
    val sy = cen.map(c => BigInt(c._2)).sum.toDouble
    val sxy = cen.map(c => BigInt(c._1) * c._2).sum.toDouble
    val sxx = cen.map(c => BigInt(c._1) * c._1).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val es = cen.map { case (m, y) => (m, y.toDouble - (a + b * m)) }
    val rss = es.map(e => e._2 * e._2).sum
    val rows = q("q_cooks_distance").collect()
    assert(rows.length == cen.length)
    // hat-matrix trace: sum of leverages == number of params (2)
    assert(math.abs(rows.map(_.getAs[Double]("leverage")).sum - 2.0) < 1e-3)
    rows.foreach { r =>
      val m = r.getAs[Long]("m")
      val e = es.find(_._1 == m).get._2
      assert(math.abs(r.getAs[Double]("resid") - e / 100.0) < 0.02,
        s"resid at m=$m: ${r.getAs[Double]("resid")} vs ${e / 100.0}")
      val h = 1.0 / n + (m - sx / n) * (m - sx / n) / (sxx - sx * sx / n)
      assert(math.abs(r.getAs[Double]("leverage") - h) < 1e-5)
      val dExp = e * e * h / (2.0 * (rss / (n - 2)) * (1.0 - h) * (1.0 - h))
      assert(math.abs(r.getAs[Double]("cooks_d") - dExp) < 1e-3,
        s"cooks_d at m=$m: ${r.getAs[Double]("cooks_d")} vs $dExp")
    }
  }

  test("McNemar cells partition the corpus and chi2 follows the formula") {
    val docs = Tables(spark, sf, "documents")
      .select(col("n_chars"), size(split(trim(col("text")), "\\s+")))
      .collect().map(r => (r.getLong(0) >= 250, r.getInt(1) >= 40))
    val n11 = docs.count(x => x._1 && x._2).toLong
    val n10 = docs.count(x => x._1 && !x._2).toLong
    val n01 = docs.count(x => !x._1 && x._2).toLong
    val n00 = docs.count(x => !x._1 && !x._2).toLong
    val r = q("q_mcnemar").collect()(0)
    assert(r.getAs[Long]("n11") == n11 && r.getAs[Long]("n10") == n10 &&
      r.getAs[Long]("n01") == n01 && r.getAs[Long]("n00") == n00)
    val chi2 = (n10 - n01).toDouble * (n10 - n01) / (n10 + n01)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
    assert(r.getAs[Double]("chi2_cc") <= r.getAs[Double]("chi2") + 1e-12)
  }

  test("Cohen's kappa matches the brute confusion census") {
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), lower(col("text"))).collect()
      .map(r => (r.getString(0), " " + r.getString(1) + " "))
    def guess(t: String): String =
      if (t.contains(" the ") || t.contains(" a ")) "en"
      else if (t.contains(" der ") || t.contains(" und ")) "de"
      else if (t.contains(" le ") || t.contains(" et ")) "fr"
      else if (t.contains(" el ") || t.contains(" y ")) "es"
      else "other"
    val pairs = docs.map { case (r, t) => (r, guess(t)) }
    val n = pairs.length.toLong
    val diag = pairs.count(p => p._1 == p._2).toLong
    val ri = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ci = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val src = ri.keys.toSeq.intersect(ci.keys.toSeq)
      .map(k => BigInt(ri(k)) * ci(k)).sum
    val kappa = (BigInt(n) * diag - src).toDouble /
      (BigInt(n) * n - src).toDouble
    val r = q("q_cohen_kappa").collect()(0)
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("po_bp") == diag * 10000 / n)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-5,
      s"engine ${r.getAs[Double]("kappa")} vs brute $kappa")
    assert(kappa <= 1.0)
  }

  test("odds ratio 2x2 cells are exact and the Wald CI brackets log OR") {
    val ud = Tables(spark, sf, "events")
      .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400"))
      .agg(max((col("event_type") === "purchase").cast("long")).as("y"))
      .collect().map(r => (r.getLong(0) % 2 == 0, r.getLong(2) == 1L))
    val a = ud.count(x => x._1 && x._2).toLong
    val b = ud.count(x => x._1 && !x._2).toLong
    val c = ud.count(x => !x._1 && x._2).toLong
    val dd = ud.count(x => !x._1 && !x._2).toLong
    val r = q("q_odds_ratio").collect()(0)
    assert(r.getAs[Long]("a") == a && r.getAs[Long]("b") == b &&
      r.getAs[Long]("c") == c && r.getAs[Long]("d") == dd)
    val lnOr = math.log(a.toDouble * dd / (b.toDouble * c))
    assert(math.abs(r.getAs[Double]("log_or") - lnOr) < 1e-5)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("log_or") &&
      r.getAs[Double]("log_or") < r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("or_bp") ==
      (BigInt(a) * dd * 10000 / (BigInt(b) * c)).toLong)
  }

  /** Daily order-count census (integer, so brute == engine exactly). */
  private def dayCounts: Seq[Long] =
    Tables(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .orderBy("day").collect().map(_.getLong(1)).toSeq

  test("dispersion index matches exact moments over the day census") {
    val ys = dayCounts
    val n = ys.length.toDouble
    val ss = ys.sum.toDouble
    val qq = ys.map(y => y.toDouble * y).sum
    val mean = ss / n
    val varc = (qq - ss * ss / n) / (n - 1)
    val r = q("q_dispersion").collect()(0)
    assert(r.getAs[Long]("n_days") == ys.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_per_day") - mean) < 1e-3)
    assert(math.abs(r.getAs[Double]("var_per_day") - varc) < 1e-3)
    assert(math.abs(r.getAs[Double]("dispersion") - varc / mean) < 1e-4)
  }

  test("Hurst R/S blocks match a plain-Scala fold and H stays in (0,1)") {
    val ys = dayCounts
    def rsAvg(b: Int): (Long, Double) = {
      val blocks = ys.grouped(b).filter(_.length == b).toSeq
      val rss = blocks.flatMap { blk =>
        val s = blk.sum
        val qq = blk.map(y => BigInt(y) * y).sum
        val denom2 = BigInt(b) * qq - BigInt(s) * s
        if (denom2 <= 0) None
        else {
          val devs = blk.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
            case (cum, i) => b * cum - (i + 1) * s
          }
          val r = (devs.max - devs.min).toDouble
          Some(r / math.sqrt(denom2.toDouble))
        }
      }
      (rss.length.toLong, rss.sum / rss.length)
    }
    val (nb16, rs16) = rsAvg(16)
    val (nb64, rs64) = rsAvg(64)
    val r = q("q_hurst").collect()(0)
    assert(r.getAs[Long]("nb16") == nb16 && r.getAs[Long]("nb64") == nb64)
    assert(math.abs(r.getAs[Double]("rs16") - rs16) < 1e-4,
      s"rs16 ${r.getAs[Double]("rs16")} vs brute $rs16")
    assert(math.abs(r.getAs[Double]("rs64") - rs64) < 1e-4)
    val h = (math.log(rs64) - math.log(rs16)) / (2.0 * math.log(2.0))
    assert(math.abs(r.getAs[Double]("hurst") - h) < 1e-3)
    assert(r.getAs[Double]("hurst") > 0.0 && r.getAs[Double]("hurst") < 1.0)
  }

  test("Hill tail estimator matches brute top order statistics") {
    val xs = Tables(spark, sf, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(_.getLong(0)).sorted.reverse.take(101)
    val xk1 = xs.min
    val terms = xs.filter(_ > xk1).map(x => math.log(x.toDouble / xk1))
    val alpha = terms.length / terms.sum
    val r = q("q_hill_tail").collect()(0)
    assert(r.getAs[Long]("k_used") == terms.length.toLong)
    assert(math.abs(r.getAs[Double]("x_k1") - xk1 / 100.0) < 0.01)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-4,
      s"alpha ${r.getAs[Double]("alpha")} vs brute $alpha")
    assert(math.abs(r.getAs[Double]("xi") - 1.0 / alpha) < 1e-4)
  }

  test("SRM chi2 matches the collapsed even-split form on exact counts") {
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val na = users.count(_ % 2 == 0).toLong
    val nb = users.length - na
    val n = users.length.toLong
    val r = q("q_ab_srm").collect()(0)
    assert(r.getAs[Long]("n_users") == n && r.getAs[Long]("na") == na &&
      r.getAs[Long]("nb") == nb)
    val chi2 = (na - nb).toDouble * (na - nb) / n
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-6)
    assert(r.getAs[Boolean]("srm_flag") == (chi2 > 3.841458820694124))
  }

  test("grid DBSCAN clusters equal a brute union-find over dense cells") {
    val pts = Tables(spark, sf, "part")
      .select(expr("cast(floor(p_retailprice / 200.0) as bigint)"),
        expr("cast((p_size - 1) div 5 as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dense = pts.groupBy(identity).collect {
      case (cell, xs) if xs.length >= 3 => cell -> xs.length.toLong
    }.toMap
    val cells = dense.keys.toSeq
    def cellId(c: (Long, Long)): Long = c._1 * 100000 + c._2
    val parent = scala.collection.mutable.Map(
      cells.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c
      else { val r = find(parent(c)); parent(c) = r; r }
    for {
      a <- cells; b <- cells
      if a != b && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (cellId(ra) < cellId(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val expected = cells.map { c =>
      // min cell id within the component is the canonical label
      val root = find(c)
      val members = cells.filter(find(_) == root)
      cellId(c) -> members.map(cellId).min
    }.toMap
    val rows = q("q_dbscan_grid").collect()
    assert(rows.length == cells.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("cx") * 100000 + r.getAs[Long]("cy")
      assert(r.getAs[Long]("n_pts") == dense((r.getAs[Long]("cx"),
        r.getAs[Long]("cy"))))
      assert(r.getAs[Long]("cluster_id") == expected(id),
        s"cell $id: engine ${r.getAs[Long]("cluster_id")} vs brute " +
          s"${expected(id)}")
    }
  }

  test("Heaps-law checkpoints match brute prefix vocab counts") {
    val toks = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mx = toks.map(_._1).max
    val rows = q("q_heaps_law").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val thr = (mx + 1) * r.getAs[Long]("decile") / 10
      val pre = toks.filter(_._1 < thr)
      assert(r.getAs[Long]("tokens_cum") == pre.length.toLong)
      assert(r.getAs[Long]("vocab_cum") == pre.map(_._2).distinct.length)
    }
    // growth curve is monotone and beta is a sublinear exponent
    val vs = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("vocab_cum"))
    assert(vs.zip(vs.tail).forall { case (a, b) => b >= a })
    // the tiny synthetic vocab saturates within the first decile, so a
    // flat V(N) (beta == 0) is legitimate here; sublinearity still holds
    val beta = rows.head.getAs[Double]("beta")
    assert(beta >= 0.0 && beta < 1.0, s"beta $beta outside [0,1)")
    // the r14 gate red: on this constant-vocab fixture the true slope is
    // exactly 0 and a plain-double-sum fit emitted -0.0 or 0.0 depending
    // on partial-agg order. The exact-decimal moments must emit POSITIVE
    // zero regardless of parallelism — pin the sign bit, not just == 0.0
    Seq("beta", "ln_k").foreach { c =>
      val v = rows.head.getAs[Double](c)
      assert(java.lang.Double.doubleToRawLongBits(v) >= 0L,
        s"$c carries a negative sign bit ($v) — signed-zero leak")
    }
  }

  test("Heaps-law beta recovers the exponent on a growing-vocab corpus") {
    // the sf fixtures' 31-token vocab saturates instantly (beta == 0), so
    // the fit is only exercised degenerately there. Build a corpus whose
    // vocabulary genuinely grows: token at global position p is
    // "t<floor(sqrt(p))>", so V(N) = floor(sqrt(N)) ~ N^0.5 — the fit must
    // recover beta ~ 0.5 within the log-log-over-deciles discretization
    val perDoc = 20
    val docsRows = (1 to 200).map { i =>
      val toks = (1 to perDoc).map { j =>
        val p = (i - 1) * perDoc + j
        "t" + math.sqrt(p.toDouble).toLong
      }
      (i.toLong, toks.mkString(" "), "synth")
    }
    val dir = java.nio.file.Files.createTempDirectory("heaps_synth").toString
    import spark.implicits._
    docsRows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_heaps_law")(spark, dir).collect()
    assert(rows.length == 10)
    val beta = rows.head.getAs[Double]("beta")
    assert(beta > 0.3 && beta < 0.9,
      s"beta $beta outside (0.3, 0.9) on a sqrt-growth corpus")
    val vs = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("vocab_cum"))
    assert(vs.last > vs.head, "vocabulary failed to grow across deciles")
  }

  test("boilerplate shares conserve windows and match brute df cut") {
    val docs = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .filter(_._3.length >= 4)
    val wins = docs.flatMap { case (id, src, w) =>
      w.sliding(4).map(g => (id, src, g.mkString(" ")))
    }
    val df = wins.map(x => (x._1, x._3)).distinct.groupBy(_._2)
      .collect { case (g, xs) if xs.length >= 3 => g }.toSet
    val bySrc = wins.groupBy(_._2)
    val rows = q("q_boilerplate").collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ws = bySrc.getOrElse(src, Array.empty)
      assert(r.getAs[Long]("n_windows") == ws.length.toLong)
      assert(r.getAs[Long]("n_boiler") == ws.count(x => df(x._3)).toLong,
        s"$src boiler: ${r.getAs[Long]("n_boiler")} vs " +
          s"${ws.count(x => df(x._3))}")
    }
    assert(rows.map(_.getAs[Long]("n_windows")).sum == wins.length.toLong)
  }

  test("Wilcoxon signed-rank matches a brute ranked fold over YoY diffs") {
    val cen = monthCensus.map(c => (c._1, c._3)).toMap
    val diffs = cen.keys.toSeq.sorted.flatMap { m =>
      cen.get(m + 12).map(_ - cen(m)).filter(_ != 0L)
    }
    val sorted = diffs.map(math.abs).sorted
    def rank2(ad: Long): Long =
      (sorted.indexOf(ad) + 1).toLong + (sorted.lastIndexOf(ad) + 1)
    val w2p = diffs.filter(_ > 0).map(d => rank2(math.abs(d))).sum
    val n = diffs.length.toLong
    val tt = diffs.map(math.abs).groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val r = q("q_wilcoxon_sr").collect()(0)
    assert(r.getAs[Long]("n_pairs") == n)
    assert(r.getAs[Long]("w2_plus") == w2p,
      s"w2+ ${r.getAs[Long]("w2_plus")} vs brute $w2p")
    val z = (w2p - n * (n + 1) / 2).toDouble /
      math.sqrt((2 * n * (n + 1) * (2 * n + 1) - tt).toDouble / 12.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
  }

  test("ICC components match a brute one-way random-effects fit") {
    val rows = Tables(spark, sf, "events")
      .select(col("user_id"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byU = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = byU.size.toDouble
    val n = rows.length.toDouble
    val ss = rows.map(x => BigInt(x._2)).sum.toDouble
    val qq = rows.map(x => BigInt(x._2) * x._2).sum.toDouble
    val tfold = byU.map { g =>
      val s = g.map(BigInt(_)).sum; s.toDouble * s.toDouble / g.size
    }.sum
    val msb = (tfold - ss * ss / n) / (k - 1)
    val msw = (qq - tfold) / (n - k)
    val nsq = byU.map(g => BigInt(g.size) * g.size).sum.toDouble
    val n0 = (n - nsq / n) / (k - 1)
    val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    val r = q("q_icc").collect()(0)
    assert(r.getAs[Long]("k") == byU.size.toLong)
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("icc") - icc) < 1e-4,
      s"icc ${r.getAs[Double]("icc")} vs brute $icc")
    val deff = 1.0 + (n / k - 1.0) * icc
    assert(math.abs(r.getAs[Double]("deff") - deff) < 1e-3)
  }

  test("per-source KL matches a brute recompute over the top-100 census") {
    val toks = Tables(spark, sf, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val gn = toks.length.toDouble
    val gc = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length }
    val top = gc.toSeq.sortBy { case (t, c) => (-c, t) }.take(100).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val rows = q("q_kl_source").collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = toks.filter(_._1 == src)
      val sn = mine.length.toDouble
      val cnt = mine.filter(x => top.contains(x._2)).groupBy(_._2)
        .map { case (t, xs) => t -> xs.length }
      val kl = cnt.map { case (t, sc) =>
        (sc / sn) * log2((sc * gn) / (sn * gc(t)))
      }.sum
      assert(r.getAs[Long]("n_tok") == mine.length.toLong)
      assert(r.getAs[Long]("n_top") == cnt.size.toLong)
      assert(math.abs(r.getAs[Double]("kl_bits") - kl) < 1e-4,
        s"$src kl ${r.getAs[Double]("kl_bits")} vs brute $kl")
    }
    assert(rows.nonEmpty)
  }

  test("Mahalanobis outlier census matches a brute 2x2 inverse") {
    val oc = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("x2"))
    val base = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("x1"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), col("x1"),
        coalesce(col("x2"), lit(0L)).as("x2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val thr = -2.0 * math.log(0.001)
    val rows = q("q_mahalanobis").collect()
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val g = base.filter(_._1 == seg)
      val n = g.length.toDouble
      val (s1, s2) = (g.map(_._2).sum.toDouble, g.map(_._3).sum.toDouble)
      val v11 = (g.map(x => x._2.toDouble * x._2).sum - s1 * s1 / n) / (n - 1)
      val v22 = (g.map(x => x._3.toDouble * x._3).sum - s2 * s2 / n) / (n - 1)
      val v12 = (g.map(x => x._2.toDouble * x._3).sum - s1 * s2 / n) / (n - 1)
      val det = v11 * v22 - v12 * v12
      val out = g.count { x =>
        val dx1 = x._2 - s1 / n; val dx2 = x._3 - s2 / n
        (v22 * dx1 * dx1 - 2.0 * v12 * dx1 * dx2 + v11 * dx2 * dx2) /
          det > thr
      }
      assert(r.getAs[Long]("n_cust") == g.length.toLong)
      assert(r.getAs[Long]("outliers") == out.toLong,
        s"$seg outliers ${r.getAs[Long]("outliers")} vs brute $out")
      val corr = v12 / math.sqrt(v11 * v22)
      assert(math.abs(r.getAs[Double]("corr") - corr) < 1e-4)
    }
    assert(rows.map(_.getAs[Long]("n_cust")).sum == base.length.toLong)
  }

  test("pairwise contrasts reuse ANOVA MSW and cover every segment pair") {
    val groups = segCents.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toSeq
    }
    val k = groups.size
    val n = segCents.length
    val qq = groups.values.flatten.map(x => BigInt(x) * x).sum.toDouble
    val tfold = groups.values.map { g =>
      val s = g.map(BigInt(_)).sum; s.toDouble * s.toDouble / g.size
    }.sum
    val msw = (qq - tfold) / (n - k)
    val rows = q("q_tukey_pairs").collect()
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"))
      assert(a < b)
      val (ga, gb) = (groups(a), groups(b))
      val diff = (ga.map(BigInt(_)).sum.toDouble / ga.size -
        gb.map(BigInt(_)).sum.toDouble / gb.size) / 100.0
      val se = math.sqrt(msw * (1.0 / ga.size + 1.0 / gb.size)) / 100.0
      assert(math.abs(r.getAs[Double]("mean_diff") - diff) < 1e-3)
      assert(math.abs(r.getAs[Double]("se") - se) < 1e-3)
      assert(math.abs(r.getAs[Double]("t_stat") - diff / se) < 1e-3)
    }
  }

  test("Granger F matches a brute two-regressor OLS on the lagged census") {
    val daily = Tables(spark, sf, "events")
      .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val trip = daily.zip(daily.tail).map { case ((xp, yp), (_, y)) =>
      (y.toDouble, yp.toDouble, xp.toDouble)
    }
    val n = trip.length.toDouble
    def c(f: ((Double, Double, Double)) => Double,
          g: ((Double, Double, Double)) => Double): Double =
      trip.map(t => f(t) * g(t)).sum - trip.map(f).sum * trip.map(g).sum / n
    val (cyy, c11, cxx) = (c(_._1, _._1), c(_._2, _._2), c(_._3, _._3))
    val (c1y, cxy, c1x) = (c(_._1, _._2), c(_._1, _._3), c(_._2, _._3))
    val det = c11 * cxx - c1x * c1x
    val b1 = (c1y * cxx - cxy * c1x) / det
    val b2 = (cxy * c11 - c1y * c1x) / det
    val rssR = cyy - (c1y / c11) * c1y
    val rssU = cyy - b1 * c1y - b2 * cxy
    val f = (rssR - rssU) / (rssU / (n - 3))
    val r = q("q_granger_lite").collect()(0)
    assert(r.getAs[Long]("n_days") == trip.length.toLong)
    assert(math.abs(r.getAs[Double]("b_clicks") - b2) < 1e-4)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-2,
      s"F ${r.getAs[Double]("f_stat")} vs brute $f")
    // adding a regressor can only reduce RSS
    assert(r.getAs[Double]("rss_unrestricted") <=
      r.getAs[Double]("rss_restricted") + 1e-9)
  }

  test("Hosmer-Lemeshow bins conserve the corpus and terms follow O/E") {
    val rows = q("q_hosmer_lemeshow").collect()
    val nEvents = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("nb")).sum == nEvents)
    var prev = 0.0
    rows.sortBy(_.getAs[Int]("bucket")).foreach { r =>
      val (o, e, nb) = (r.getAs[Long]("o").toDouble,
        r.getAs[Double]("e_pred"), r.getAs[Long]("nb").toDouble)
      val term = (o - e) * (o - e) / (e * (1.0 - e / nb))
      // e_pred is rounded at 4dp, so the recomputed term carries that
      assert(math.abs(r.getAs[Double]("hl_term") - term) <
        math.max(1e-2, math.abs(term) * 1e-3),
        s"bucket ${r.getAs[Int]("bucket")}: $term vs ${r.getAs[Double]("hl_term")}")
      assert(r.getAs[Double]("cum_hl") >= prev - 1e-9)
      prev = r.getAs[Double]("cum_hl")
    }
  }

  test("Ljung-Box Q matches a brute ACF fold over the day census") {
    val ys = dayCounts
    val n = ys.length
    val mean = ys.sum.toDouble / n
    val denom = ys.map(y => (y - mean) * (y - mean)).sum
    def rho(k: Int): Double =
      ys.drop(k).zip(ys).map { case (yt, ytk) =>
        (yt - mean) * (ytk - mean)
      }.sum / denom
    val qExp = n.toDouble * (n + 2) *
      (1 to 7).map(k => rho(k) * rho(k) / (n - k)).sum
    val r = q("q_ljung_box").collect()(0)
    assert(r.getAs[Long]("n_days") == n.toLong)
    Seq(1, 4, 7).foreach { k =>
      assert(math.abs(r.getAs[Double](s"rho$k") - rho(k)) < 1e-4,
        s"rho$k ${r.getAs[Double](s"rho$k")} vs brute ${rho(k)}")
    }
    assert(math.abs(r.getAs[Double]("q_lb") - qExp) < 0.05,
      s"Q ${r.getAs[Double]("q_lb")} vs brute $qExp")
  }

  test("Page-Hinkley alerts match a plain-Scala sequential monitor") {
    val ys = dayCounts
    var cum = 0L
    var m = 0.0
    var mx = Double.NegativeInfinity
    var alerts = 0
    var maxGap = 0.0
    ys.zipWithIndex.foreach { case (y, i) =>
      cum += y
      m += y.toDouble - cum.toDouble / (i + 1) - 0.5
      mx = math.max(mx, m)
      val gap = mx - m
      if (gap > 30.0) alerts += 1
      maxGap = math.max(maxGap, gap)
    }
    val r = q("q_page_hinkley").collect()(0)
    assert(r.getAs[Long]("n_days") == ys.length.toLong)
    assert(r.getAs[Long]("n_alerts") == alerts.toLong,
      s"alerts ${r.getAs[Long]("n_alerts")} vs brute $alerts")
    assert(math.abs(r.getAs[Double]("max_gap") - maxGap) < 1e-3)
  }

  test("Durbin-Watson matches a brute residual fold and sits in [0,4]") {
    val cen = monthCensus.map(c => (c._1.toLong, c._3))
    val n = cen.length.toDouble
    val sx = cen.map(_._1).sum.toDouble
    val sy = cen.map(c => BigInt(c._2)).sum.toDouble
    val sxy = cen.map(c => BigInt(c._1) * c._2).sum.toDouble
    val sxx = cen.map(c => BigInt(c._1) * c._1).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val es = cen.sortBy(_._1).map { case (m, y) => y.toDouble - (a + b * m) }
    val num = es.zip(es.tail).map { case (p, c) => (c - p) * (c - p) }.sum
    val den = es.map(e => e * e).sum
    val r = q("q_durbin_watson").collect()(0)
    assert(r.getAs[Long]("n_months") == cen.length.toLong)
    assert(math.abs(r.getAs[Double]("dw") - num / den) < 1e-3,
      s"dw ${r.getAs[Double]("dw")} vs brute ${num / den}")
    assert(r.getAs[Double]("dw") >= 0.0 && r.getAs[Double]("dw") <= 4.0)
  }

  test("Brier score beats or ties its base-rate reference on this fit") {
    val r = q("q_brier_score").collect()(0)
    val n = r.getAs[Long]("n")
    assert(n == Tables(spark, sf, "events").count())
    val rate = r.getAs[Long]("n_pos").toDouble / n
    assert(math.abs(r.getAs[Double]("brier_ref") - rate * (1.0 - rate))
      < 1e-5)
    assert(r.getAs[Double]("brier") >= 0.0 &&
      r.getAs[Double]("brier") <= 0.25 + 1e-9)
  }

  test("JSD drift: per-token contributions nonneg, total within [0,1] bit") {
    val rows = q("q_jsd_drift").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      assert(r.getAs[Double]("jsd_term") >= -1e-12,
        s"JS contribution negative at $r")
    }
    val cum = rows.map(_.getAs[Double]("cum_jsd")).max
    assert(cum >= 0 && cum <= 1.0 + 1e-9)
    // brute-force twin on the token census
    val cen = Tables(spark, sf, "documents")
      .select(expr("CAST(substring(source, 4) AS BIGINT) % 2").as("arm"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ta = cen.count(_._1 == 0).toDouble
    val tb = cen.count(_._1 == 1).toDouble
    val byTok = cen.groupBy(_._2)
    val top = byTok.toSeq
      .sortBy { case (t, xs) => (-xs.length.toLong, t) }.take(100)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    top.foreach { case (t, xs) =>
      val na = xs.count(_._1 == 0).toDouble
      val nb = xs.count(_._1 == 1).toDouble
      val (p, qd) = (na / ta, nb / tb)
      val expect =
        (if (na > 0) 0.5 * p * log2(2.0 * p / (p + qd)) else 0.0) +
          (if (nb > 0) 0.5 * qd * log2(2.0 * qd / (p + qd)) else 0.0)
      val got = rows.find(_.getAs[String]("token") == t).get
        .getAs[Double]("jsd_term")
      assert(math.abs(got - expect) < 1e-6, s"token $t: $got vs $expect")
    }
  }
}
