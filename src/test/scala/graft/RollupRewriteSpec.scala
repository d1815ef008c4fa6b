package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Persisted._
import graft.plans.RollupRewrite

/** Randomized equivalence fuzz for the aggregate-navigation rule: for a
  * seeded sample of (group-key subset | global) × (grain filter | none) ×
  * translatable-aggregate combinations, the navigated plan must (a) fire —
  * zero fact scans — and (b) return EXACTLY the raw plan's rows. The
  * structural matcher in RollupRewrite is all-or-nothing; this suite is
  * the behavioral complement that would catch an exprId/alias slip or a
  * mistranslated re-aggregation that still type-checks.
  */
class RollupRewriteSpec extends AnyFunSuite with SparkSpec {

  private val qty = col("l_quantity").cast("long")
  private val aggPool = Vector(
    ("sum_qty", sum(qty)),
    ("n_rows", count(lit(1))),
    ("max_qty", max(qty)),
    ("min_qty", min(qty)),
    ("avg_qty", avg(qty)),
    ("n_qty", count(qty)))

  private def factScans(df: DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("lineitem")) => f
    }

  private def registerRollup(): Unit = {
    val mv = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_rows"),
        max(qty).as("max_qty"), min(qty).as("min_qty"),
        // the non-null count partial: the parquet scan schema is
        // nullable, so AVG / COUNT(col) navigation requires it
        count(qty).as("n_qty"))
      .persistTracked()
    mv.count()
    RollupRewrite.register(spark, s"$sf/lineitem.parquet",
      Set("l_returnflag", "l_linestatus"),
      Map("CAST(l_quantity AS BIGINT)" -> "sum_qty"), "n_rows", mv,
      mins = Map("CAST(l_quantity AS BIGINT)" -> "min_qty"),
      maxs = Map("CAST(l_quantity AS BIGINT)" -> "max_qty"),
      counts = Map("CAST(l_quantity AS BIGINT)" -> "n_qty"))
  }

  test("seeded fuzz: every translatable shape navigates and matches raw") {
    val rnd = new scala.util.Random(42)
    val keyChoices = Vector(
      Seq("l_returnflag"), Seq("l_linestatus"),
      Seq("l_returnflag", "l_linestatus"), Seq.empty)
    registerRollup()
    try {
      (1 to 12).foreach { i =>
        val keys = keyChoices(rnd.nextInt(keyChoices.size))
        val nAggs = 1 + rnd.nextInt(aggPool.size)
        val aggs = rnd.shuffle(aggPool).take(nAggs)
          .map { case (n, c) => c.as(n) }
        val filtered = rnd.nextBoolean()
        def build(): DataFrame = {
          val base = Tables(spark, sf, "lineitem")
          val src = if (filtered) base.filter(col("l_linestatus") === "F")
                    else base
          val grouped =
            if (keys.isEmpty) src.agg(aggs.head, aggs.tail: _*)
            else src.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
          if (keys.isEmpty) grouped else grouped.orderBy(keys.map(col): _*)
        }
        val nav = build()
        assert(factScans(nav).isEmpty,
          s"combo $i (keys=$keys filtered=$filtered aggs=$nAggs) " +
            "did not navigate")
        val got = nav.collect().map(_.toString).sorted.toSeq
        RollupRewrite.clear(spark)
        val want = build().collect().map(_.toString).sorted.toSeq
        registerRollup()
        assert(got == want,
          s"combo $i (keys=$keys filtered=$filtered aggs=$nAggs) differs")
      }
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }

  test("a non-translatable aggregate in the list blocks navigation entirely") {
    registerRollup()
    try {
      // sum over a DIFFERENT column than the registered partial
      val blocked = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(qty).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"))
      assert(factScans(blocked).nonEmpty,
        "partially-translatable aggregate list wrongly navigated")
      // avg over a DOUBLE child must block (FP re-association)
      val blockedAvg = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("avg_raw"))
      assert(factScans(blockedAvg).nonEmpty,
        "double-child AVG wrongly navigated")
      // a NON-DETERMINISTIC filter must block even with zero column
      // references: rand() over fact ROWS is not rand() over rollup GROUPS
      val blockedRand = Tables(spark, sf, "lineitem")
        .filter(rand(7) < 0.5)
        .groupBy(col("l_returnflag"))
        .agg(sum(qty).as("sum_qty"))
      assert(factScans(blockedRand).nonEmpty,
        "non-deterministic filter wrongly navigated")
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }

  test("HAVING above a navigated aggregate survives the rewrite") {
    // the rewrite preserves output exprIds, so a parent Filter (HAVING)
    // keeps resolving — and the aggregate below it still navigates
    registerRollup()
    try {
      def coarse() = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 100L) // HAVING
        .orderBy(col("l_returnflag"))
      val nav = coarse()
      assert(factScans(nav).isEmpty, "HAVING blocked navigation")
      val got = nav.collect().map(_.toString).toSeq
      RollupRewrite.clear(spark)
      val want = coarse().collect().map(_.toString).toSeq
      assert(got == want, "HAVING-over-navigation differs from raw")
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }

  test("an unpersisted rollup terminates (self-reference guard) and is correct") {
    // without cache substitution the inserted plan CONTAINS the rollup's
    // own defining aggregate over the fact; the guard must stop the
    // fixed-point batch from re-rewriting it every iteration
    val mv = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_rows"))
    RollupRewrite.register(spark, s"$sf/lineitem.parquet",
      Set("l_returnflag", "l_linestatus"),
      Map("CAST(l_quantity AS BIGINT)" -> "sum_qty"), "n_rows", mv)
    try {
      def coarse() = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_rows"))
      val got = coarse().collect().map(_.toString).sorted.toSeq
      RollupRewrite.clear(spark)
      val want = coarse().collect().map(_.toString).sorted.toSeq
      assert(got == want, "unpersisted-rollup navigation differs from raw")
    } finally {
      RollupRewrite.clear(spark)
    }
  }

  test("nullable-child AVG blocks without a registered non-null count") {
    // count(1) counts ALL rows; Average divides by the NON-NULL count —
    // for a nullable child the two differ, so a rollup that only carries
    // count(1) must not answer AVG (or COUNT(col))
    val mv = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_rows"))
      .persistTracked()
    mv.count()
    RollupRewrite.register(spark, s"$sf/lineitem.parquet",
      Set("l_returnflag", "l_linestatus"),
      Map("CAST(l_quantity AS BIGINT)" -> "sum_qty"), "n_rows", mv)
    try {
      val blockedAvg = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(avg(qty).as("avg_qty"))
      assert(factScans(blockedAvg).nonEmpty,
        "nullable-child AVG navigated without a count(col) partial")
      val blockedCnt = Tables(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(count(qty).as("n_qty"))
      assert(factScans(blockedCnt).nonEmpty,
        "nullable-child COUNT(col) navigated without a count(col) partial")
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }

  test("real NULLs: AVG and COUNT(col) navigate via count(col) and match raw") {
    // the lineitem fixture is null-free, so this builds a fact with a
    // genuinely nullable column: every third v is NULL — sum/count(1)
    // would dilute the average and this test would catch it
    import graft.operators.Persisted._
    val dir = java.nio.file.Files.createTempDirectory("graft-mvnull").toString
    spark.range(0, 1000)
      .selectExpr("id % 7 AS k",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS v")
      .write.mode("overwrite").parquet(s"$dir/fact.parquet")
    val fact = spark.read.parquet(s"$dir/fact.parquet")
    def scans(df: DataFrame) = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("fact.parquet")) => f
    }
    val mv = fact.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"),
        count("v").as("n_v"))
      .persistTracked()
    mv.count()
    RollupRewrite.register(spark, s"$dir/fact.parquet", Set("k"),
      Map("v" -> "sum_v"), "n_rows", mv, counts = Map("v" -> "n_v"))
    try {
      def coarse() = fact
        .agg(avg("v").as("avg_v"), count(col("v")).as("n_v"),
          count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      val nav = coarse()
      assert(scans(nav).isEmpty, "nulls fact: did not navigate")
      val got = nav.collect()(0)
      RollupRewrite.clear(spark)
      val want = coarse().collect()(0)
      assert(got.getLong(2) > got.getLong(1),
        "fixture degenerate: no NULLs — the test proves nothing")
      assert(got == want,
        s"navigated $got differs from raw $want over a nullable child")
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }

  test("global COUNT over an empty grain selection navigates to 0, not NULL") {
    // Sum over zero rollup rows is NULL; raw COUNT over zero fact rows is
    // 0 — the navigated translation must coalesce
    registerRollup()
    try {
      def coarse() = Tables(spark, sf, "lineitem")
        .filter(col("l_linestatus") === "no_such_status")
        .agg(count(lit(1)).as("n"))
      val nav = coarse()
      assert(factScans(nav).isEmpty, "empty grain selection did not navigate")
      val got = nav.collect()(0)
      assert(!got.isNullAt(0) && got.getLong(0) == 0L,
        s"navigated global COUNT over empty selection returned $got, not 0")
      RollupRewrite.clear(spark)
      assert(got == coarse().collect()(0), "navigated differs from raw")
    } finally {
      RollupRewrite.clear(spark)
      graft.operators.Persisted.releaseAll(spark)
    }
  }
}
