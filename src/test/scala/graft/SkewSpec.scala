package graft

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Physical-layout proof for the salted join: result equality is covered by
  * the q_join_salted oracle (a plain join); here we assert the REWRITE — the
  * shuffle actually partitions on (key, salt), so a hot key's rows land on
  * `salts` reducers instead of one.
  */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join shuffles on (key, salt), not key alone") {
    // force a shuffled join: at test scale the build side would otherwise
    // broadcast and no exchange would exist to inspect
    withoutAQE(withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = Skew.saltedJoin(
        Tables(spark, sf, "orders"), Tables(spark, sf, "customer"),
        "o_custkey", "c_custkey", spread = col("o_orderkey"), salts = 8)
      val hx = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning
      }.collect { case h: HashPartitioning => h.expressions.map(_.toString) }
      assert(hx.nonEmpty, "no hash exchange in salted join plan")
      hx.foreach { exprs =>
        assert(exprs.exists(_.contains("_salt")), s"exchange lacks salt: $exprs")
        assert(exprs.exists(e => e.contains("o_custkey") || e.contains("c_custkey")),
          s"exchange lacks join key: $exprs")
      }
    })
  }

  test("a hot key's rows spread across more than one salt partition") {
    // same salt derivation as saltedJoin's fact side: pmod(spread, salts)
    val spreadPerKey = Tables(spark, sf, "orders")
      .withColumn("_salt", pmod(col("o_orderkey"), lit(8)))
      .groupBy("o_custkey")
      .agg(countDistinct(col("_salt")).as("n_salts"), count(lit(1)).as("n"))
      .filter(col("n") >= 8)
    assert(spreadPerKey.count() > 0, "fixture lacks keys with >= 8 rows")
    val unspread = spreadPerKey.filter(col("n_salts") <= 1).count()
    assert(unspread == 0, s"$unspread hot keys stuck on one salt")
  }

  test("profile degrades to the no-skew shape on an empty fact side") {
    // max(count) over zero rows is NULL — the guard must map it to the
    // (0, 0.0) profile so the chooser picks "plain" instead of NPE-ing
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("row"))
    val (mx, av) = Skew.profile(empty, "k")
    assert((mx, av) == (0L, 0.0), s"empty profile: ($mx, $av)")
    assert(Skew.choose(mx, av) == "plain")
    // and the full auto path completes with an empty (un-salted) join
    val build = spark.range(10).select(col("id").as("bk"))
    val joined = Skew.autoJoin(empty, build, "k", "bk", spread = col("row"))
    assert(joined.count() == 0)
    assert(!joined.queryExecution.executedPlan.toString.contains("_salt"),
      "empty fact should not choose salting")
  }

  test("auto join: the strategy choice flips with the data") {
    // uniform keys (100 rows each, skew 1.0) → plain; one key holding 90% of
    // the table (skew ≈ 900) → salted; in-between (skew ≈ 10 on a hot key) →
    // AQE's runtime split
    import spark.implicits._
    val uniform = Skew.profile(
      spark.range(10000).select((col("id") % 100).as("k")), "k")
    assert(Skew.choose(uniform._1, uniform._2) == "plain", s"uniform: $uniform")
    val pathological = Skew.profile(
      spark.range(10000).select(
        when(col("id") < 9000, 0L).otherwise(col("id")).as("k")), "k")
    assert(Skew.choose(pathological._1, pathological._2) == "salted",
      s"pathological: $pathological")
    val moderate = Skew.profile(
      spark.range(100000).select(
        when(col("id") < 1000, 0L).otherwise(col("id") % 1000).as("k")), "k")
    assert(Skew.choose(moderate._1, moderate._2) == "aqe", s"moderate: $moderate")
    // and the chosen PLAN follows: salt columns appear only when salted
    withoutAQE(withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val build = spark.range(100).select(col("id").as("bk"))
      val skewedFact = spark.range(10000).select(
        when(col("id") < 9000, 0L).otherwise(col("id") % 100).as("k"),
        col("id").as("row"))
      val saltedPlan = Skew.autoJoin(skewedFact, build, "k", "bk",
        spread = col("row")).queryExecution.executedPlan.toString
      assert(saltedPlan.contains("_salt"), "skewed fact did not choose salting")
      val uniformFact = spark.range(10000).select(
        (col("id") % 100).as("k"), col("id").as("row"))
      val plainPlan = Skew.autoJoin(uniformFact, build, "k", "bk",
        spread = col("row")).queryExecution.executedPlan.toString
      assert(!plainPlan.contains("_salt"), "uniform fact salted needlessly")
    })
  }

  test("AQE runtime skew split engages on the moderate tier's plan") {
    // the chooser's "aqe" tier keeps the plain declarative join and relies
    // on AQE splitting oversized partitions at runtime — prove that
    // machinery actually fires: a hot key under aggressive split thresholds
    // must yield an AQEShuffleRead marked `skewed` in the FINAL plan
    withConf("spark.sql.adaptive.enabled", "true") {
      withConf("spark.sql.adaptive.skewJoin.enabled", "true") {
        withConf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2") {
          withConf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB") {
            withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB") {
              withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
                withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1") {
                  // payload is multiplicatively scrambled: an all-equal or
                  // sequential column compresses under the skew threshold
                  // after lz4, hiding the hot partition from the optimizer
                  val fact = spark.range(150000).select(
                    when(col("id") < 120000, 0L).otherwise(col("id") % 100).as("k"),
                    (col("id") * 2654435761L % 1000003L).as("payload"))
                  val build = spark.range(100).select(col("id").as("bk"))
                  // no aggregation on top (a required hash distribution
                  // downstream vetoes the split — splitting breaks
                  // co-partitioning) and no post-join filter (any
                  // row-thinning predicate is rewritten through the join
                  // equivalence and pushed into the fact scan, deflating
                  // the skew); the chooser's "aqe" tier matches — plain
                  // joins feeding projects/writes
                  val j = fact.join(build, col("k") === col("bk"))
                    .select(col("k"), col("payload"))
                  val qe = j.queryExecution
                  j.collect() // materialize so AQE finalizes the plan
                  assert(qe.executedPlan.toString.contains("skewed"),
                    "AQE did not mark any skewed shuffle read in the final plan")
                }
              }
            }
          }
        }
      }
    }
  }

  test("auto join result equals the plain join on both fixtures") {
    val fact = Tables(spark, sf, "orders")
    val build = Tables(spark, sf, "customer")
    val auto = Skew.autoJoin(fact, build, "o_custkey", "c_custkey",
        spread = col("o_orderkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    val plain = fact.join(build, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    assert(auto.exceptAll(plain).isEmpty && plain.exceptAll(auto).isEmpty)
  }

  test("size-gated broadcast flips exchange strategy, never the result") {
    val fact = Tables(spark, sf, "orders")
    val build = Tables(spark, sf, "customer")
    val n = build.count()
    def joined(probe: org.apache.spark.sql.DataFrame) =
      fact.join(probe, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"))
    val under = joined(Skew.sizeGatedBroadcast(build, n, n + 1))
    val over = joined(Skew.sizeGatedBroadcast(build, n, n - 1))
    val underPlan = under.queryExecution.executedPlan.toString
    val overPlan = over.queryExecution.executedPlan.toString
    assert(underPlan.contains("BroadcastHashJoin"),
      "under-threshold build side was not broadcast")
    assert(overPlan.contains("ShuffledHashJoin"),
      "over-threshold build side must pin shuffle_hash, not re-broadcast")
    assert(under.exceptAll(over).isEmpty && over.exceptAll(under).isEmpty,
      "the gate moved results, not just the exchange")
  }

  test("salted join result equals the plain join (pure physical rewrite)") {
    val fact = Tables(spark, sf, "orders")
    val build = Tables(spark, sf, "customer")
    val salted = Skew.saltedJoin(fact, build, "o_custkey", "c_custkey",
        spread = col("o_orderkey"), salts = 8)
      .select(col("o_orderkey"), col("c_custkey"))
    val plain = fact.join(build, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
