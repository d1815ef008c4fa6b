package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** File-sink round trips (PhysicalPlan::Write analog) and the salted-join
  * physical rewrite's result equivalence.
  */
class SinkSpec extends AnyFunSuite with SparkSpec {

  private lazy val ctx = new Context(spark)

  test("write csv → read back with declared schema, values survive") {
    val df = Tables(spark, sf, "nation").orderBy("n_nationkey")
    ctx.write(df.coalesce(1), "target/sink_nation_csv", "csv")
    val back = spark.read.schema(df.schema).option("header", "true")
      .csv("target/sink_nation_csv")
    assert(back.count() == df.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.collect().toSeq)
  }

  test("write parquet → read back, values survive") {
    val df = Tables(spark, sf, "region")
    ctx.write(df, "target/sink_region_parquet", "parquet")
    val back = spark.read.parquet("target/sink_region_parquet")
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      df.orderBy("r_regionkey").collect().toSeq)
  }

  test("write ndjson → read back, values survive") {
    val df = Tables(spark, sf, "nation")
    ctx.write(df, "target/sink_nation_json", "ndjson")
    val back = spark.read.schema(df.schema).json("target/sink_nation_json")
    assert(back.count() == df.count())
  }

  test("write orc → read back, values survive") {
    val df = Tables(spark, sf, "supplier")
    ctx.write(df, "target/sink_supplier_orc", "orc")
    val back = spark.read.orc("target/sink_supplier_orc")
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      df.orderBy("s_suppkey").collect().toSeq)
  }

  test("unsupported sink kind is rejected") {
    intercept[IllegalArgumentException] {
      ctx.write(Tables(spark, sf, "region"), "target/x", "orc-nope")
    }
  }

  test("salted join equals plain join row-for-row") {
    val li = Tables(spark, sf, "lineitem")
    val ord = Tables(spark, sf, "orders")
    val salted = graft.operators.Skew.saltedJoin(
        li, ord, "l_orderkey", "o_orderkey",
        spread = col("l_linenumber") + col("l_suppkey"), salts = 8)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "o_totalprice")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_suppkey", "o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
