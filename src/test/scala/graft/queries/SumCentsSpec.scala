package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.functions.SumCents

/** Focused proof for the r16 SumCents aggregate — the all-long fast path
  * that replaced `sum(cents.cast("decimal(38,0)"))` in every ExactMoney
  * site. The contract it must keep: bit-identical exact integer sums
  * under every Spark execution shape (partial/final split, arbitrary
  * partitioning), including the carry path where |lo| crosses the 2⁵⁹
  * quantum — which never fires at fixture magnitudes, so this spec
  * forces it explicitly.
  */
class SumCentsSpec extends AnyFunSuite with SparkSpec {

  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,0)"))

  test("matches decimal sum on signed values, any partitioning") {
    // deterministic signed values, magnitudes to ~1e9 (the sumDisc2
    // ceiling), across 1/4/13 partitions — exact integer identity
    for (parts <- Seq(1, 4, 13)) {
      val df = spark.range(0, 100001, 1, parts).select(
        (col("id") % 7).as("g"),
        (((col("id") * 2654435761L) % 2000000000L) - 1000000000L).as("v"))
      val a = df.groupBy("g").agg(decSum(col("v")).as("s"))
        .orderBy("g").collect().toSeq
      val b = df.groupBy("g").agg(SumCents.sum(col("v")).as("s"))
        .orderBy("g").collect().toSeq
      assert(a == b, s"parts=$parts")
    }
  }

  test("carry path: totals past the 2^59 quantum stay exact") {
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val a = df.groupBy("g").agg(decSum(col("v")).as("s")).collect()(0).getDecimal(1)
      val b = df.groupBy("g").agg(SumCents.sum(col("v")).as("s")).collect()(0).getDecimal(1)
      assert(a.compareTo(b) == 0, s"decimal=$a sum_cents=$b")
      // the total really did exceed one quantum, so a carry fired
      assert(a.abs.compareTo(new java.math.BigDecimal(1L << 59)) > 0, s"total=$a")
    }
    // UPDATE-path carry: all-positive 2^45-scale rows — the running |lo|
    // crosses 2^59 ≈ 5.76e17 every ~16k rows, several times per partition
    // (total ≈ 3.5e18)
    check(spark.range(0, 100000, 1, 3).select(
      lit(1L).as("g"), (lit(1L << 45) + col("id") % 97).as("v")))
    // MERGE-path carry with SIGNED values: per-partition partials stay
    // under the quantum (net drift ≈ 3.4e17) but their merged total
    // (≈ 1.0e18) crosses it, with exact cancellation across signs
    val big = 1L << 42
    check(spark.range(0, 700000, 1, 3).select(
      lit(1L).as("g"),
      when(col("id") % 3 === 0, -big + 17L).otherwise(big - 3L).as("v")))
  }

  test("null semantics match SQL SUM (skip nulls, all-null group is NULL)") {
    val df = spark.range(0, 10).select(
      (col("id") % 2).as("g"),
      when(col("id") % 2 === 0, col("id") * 100).as("v")) // odd g → all null
    val r = df.groupBy("g").agg(SumCents.sum(col("v")).as("s"))
      .orderBy("g").collect()
    assert(r(0).getDecimal(1).longValueExact() == (0L + 200 + 400 + 600 + 800))
    assert(r(1).isNullAt(1), "all-null group must evaluate to NULL")
    // global aggregate over an empty frame is one NULL row, like sum()
    val e = spark.range(0).select(col("id").as("v"))
      .agg(SumCents.sum(col("v")).as("s")).collect()
    assert(e.length == 1 && e(0).isNullAt(0))
  }

  test("whole-stage codegen: sum_cents plans into HashAggregate, no fallback") {
    val df = spark.range(0, 1000).select((col("id") % 5).as("g"), col("id").as("v"))
      .groupBy("g").agg(SumCents.sum(col("v")).as("s"))
    val plan = withoutAQE {
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
    }
    assert(plan.contains("sum_cents"), plan.take(500))
    assert(plan.contains("HashAggregate"), plan.take(500))
    // partial + final split present (two HashAggregate levels)
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }
}
