package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-13 evaluation/selection operators —
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
}
