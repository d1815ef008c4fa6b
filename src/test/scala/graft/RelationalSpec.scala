package graft

import org.scalatest.funsuite.AnyFunSuite

/** Correctness + plan-shape checks for the core relational inventory.
  * Value-level parity with DuckDB is covered by the driver's oracle gate and
  * tools/oracle_check.py; here we assert the PLANS are the ones we want at
  * scale (pushdown, broadcast, top-k) plus sanity invariants.
  */
class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    // every query — including the LSH/sketch/stub-decode pipelines (mod-P
    // hashing, literal hyperplane weights, float32 stub decode) and the HLL
    // rows (exact counts value-checked, estimates reduced to their 5%
    // bound) — replicates bit-exactly in DuckDB. Raw-sketch outputs (Spark
    // HLL++ ≠ DuckDB's HLL) live in benchOnly, disjoint from the gate.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
    val overlap = SparkEntry.benchOnly.keySet & SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"benchOnly entries shadowing gated queries: $overlap")
  }

  test("q_agg_approx: HLL estimate within 5% of exact distinct count") {
    // bound the RAW estimate here (the query itself only exposes the bound
    // as a boolean so the driver's oracle can hash the whole row)
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val raw = Tables(spark, sf, "lineitem").agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).collect().head
    val approx = raw.getAs[Long]("approx").toDouble
    val exact = raw.getAs[Long]("exact").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    val row = q("q_agg_approx").collect().head
    assert(row.getAs[Boolean]("approx_ok"))
    assert(row.getAs[Long]("exact_parts") == exact.toLong)
  }

  test("hll sketch state merges losslessly across disjoint partitions") {
    // THE 100 TB property, proven directly: sketches built on disjoint
    // halves of the data and UNIONED give the same estimate as one pass
    // over the whole — i.e. the map-side partial state loses nothing.
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sf, "lineitem")
    val s1 = li.filter(col("l_orderkey") % 2 === 0)
      .agg(hll_sketch_agg(col("l_partkey")).as("s"))
    val s2 = li.filter(col("l_orderkey") % 2 =!= 0)
      .agg(hll_sketch_agg(col("l_partkey")).as("s"))
    val merged = s1.crossJoin(s2.select(col("s").as("s2")))
      .select(hll_sketch_estimate(hll_union(col("s"), col("s2"))).as("est"))
      .head.getLong(0)
    val onePass = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .head.getLong(0)
    assert(merged == onePass,
      s"union of half-sketches ($merged) != one-pass sketch ($onePass)")
  }

  test("q_hll_only: per-group estimates within 5% of exact distinct counts") {
    // the sketch-only production plan has no oracle (engine-specific HLL
    // values) — bound every group's estimate against the exact count here;
    // q_hll_sketch exposes the same bound as an oracle-hashable boolean
    import org.apache.spark.sql.functions.{col, countDistinct}
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("exact")).toMap
    val rows = SparkEntry.benchOnly("q_hll_only")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == exact.keySet)
    rows.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag")).toDouble
      val a = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getAs[String]("l_returnflag")}: approx=$a exact=$e")
    }
    val gate = q("q_hll_sketch").collect()
    assert(gate.map(_.getAs[String]("l_returnflag")).toSet == exact.keySet)
    assert(gate.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("q_scalar_subq returns rows (threshold inside the price range)") {
    assert(q("q_scalar_subq").count() > 0)
  }

  test("q_asof_join: every matched purchase precedes or equals its click") {
    val rows = q("q_asof_join").collect()
    assert(rows.nonEmpty)
    val matched = rows.filter(!_.isNullAt(3))
    assert(matched.nonEmpty)
    assert(matched.forall(r => r.getAs[Long]("last_purch_s") <= r.getAs[Long]("secs")))
    assert(matched.forall(r => r.getAs[Long]("gap_s") >= 0))
  }

  test("q_agg_group: 6 flag/status groups, counts add up") {
    val rows = q("q_agg_group").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("n")).sum > 0)
  }

  test("filter is pushed down to the parquet scan") {
    val plan = q("q_filter_pred").queryExecution.executedPlan.toString
    // the rendered plan truncates the PushedFilters list, so assert on the
    // leading entries plus the untruncated scan metadata
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"), plan.take(2000))
    // metadata strings are truncated for display; the scan's dataFilters are
    // the untruncated predicates that reached the file source
    // executedPlan is an AdaptiveSparkPlanExec leaf — collect on sparkPlan
    val pushed = q("q_filter_pred").queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.dataFilters.map(_.toString).mkString(";")
    }
    assert(pushed.exists(s => s.contains("l_quantity") && s.contains(">= 30")), pushed.mkString)
  }

  test("scan schema is pruned to referenced columns") {
    val plan = q("q_scan_project").queryExecution.executedPlan.toString
    // projection uses 4 source columns; the scan must not read the other 12
    assert(plan.contains("ReadSchema"), plan.take(500))
    assert(!plan.contains("l_shipdate"), "unreferenced column in scan")
  }

  test("dimension join broadcasts the small side") {
    val plan = q("q_join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("order-by + limit plans as top-k, not global sort") {
    val plan = q("q_sort_limit").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("semi and anti join partition orders exactly") {
    val total = Tables(spark, sf, "orders").count()
    assert(q("q_join_semi").count() + q("q_join_anti").count() == total)
  }

  test("rollup emits group, subtotal and grand-total rows") {
    val rows = q("q_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val detail = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.head.getAs[Long]("n") == detail.map(_.getAs[Long]("n")).sum)
  }

  test("window running sum final value equals group total") {
    // output is ordered by o_orderkey but the frame by o_orderdate, so the
    // frame's final value is the MAX running sum (prices are positive)
    val running = q("q_window_running").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("running")).max }
    val totals = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("o_totalprice"), 2).as("t"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Double]("t")).toMap
    running.foreach { case (k, last) =>
      assert(math.abs(last - totals(k)) < 0.05, s"custkey $k")
    }
  }
}
