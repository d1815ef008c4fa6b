package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Byte-for-byte replay of the earlier-POC golden corpus
  * (CSVs under /root/reference/test/data/expected — SURVEY §5 layer 3).
  *
  * The POC's generating queries are not in the archive, so each replay here
  * is a RECONSTRUCTION verified by exact output equality: if the inferred
  * query reproduces the golden byte-for-byte, the operator semantics
  * (coercion, integer division, float32 arithmetic, Rust Display float
  * formatting) are pinned. Families whose parameters cannot be inferred
  * with certainty (the per-type comparison literals, the cast matrices over
  * randomized all_types data) are exercised semantically by the oracle gate
  * instead.
  *
  * Key semantics these goldens lock in:
  *  - `/` on integers is INTEGER division (2/3 = 0) — Spark `div`, not `/`
  *    (SURVEY §7.4-3);
  *  - int literal + float32 column stays float32; float64 literal promotes
  *    (numerics_plus col5 "5.1400003" vs col6 "5.640000104904175");
  *  - floats print Rust-Display style: integral values without ".0".
  */
class PocGoldenSpec extends AnyFunSuite with SparkSpec {

  private val refData = "/root/reference/test/data"
  private def golden(name: String): String =
    scala.io.Source.fromFile(s"$refData/expected/$name").mkString

  // ---- numerics family: ops applied as (a∘b, a∘2, a∘2.5, a_f∘b_f, a_f∘2, a_f∘2.5) ----

  private def numerics(floatType: DataType) = {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("a_f", floatType), StructField("b_f", floatType)))
    spark.read.schema(schema).option("header", "true").csv(s"$refData/numerics.csv")
  }

  private def opCols(op: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column, intDiv: Boolean = false) =
    (f: DataType) => {
      val n = numerics(f)
      val ab = if (intDiv) expr("a div b").cast(IntegerType)
               else op(col("a"), col("b"))
      val a2 = if (intDiv) expr("a div 2").cast(IntegerType)
               else op(col("a"), lit(2))
      // the reference keeps `a_f ∘ <int literal>` in the column's float
      // width (numerics_plus col5 is f32 "5.1400003"); Spark would widen
      // float+int to double, so type the literal explicitly. Spark's `/`
      // additionally always promotes to double — cast the quotient back
      // to the column width (double-divide-then-round == float divide for
      // these operands; the reference divides in f32 directly)
      val ff = op(col("a_f"), col("b_f"))
      val f2 = op(col("a_f"), lit(2).cast(f))
      n.select(ab, a2, op(col("a"), lit(2.5)),
        if (intDiv) ff.cast(f) else ff,
        if (intDiv) f2.cast(f) else f2,
        op(col("a_f"), lit(2.5)))
    }

  private val ops: Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column, Boolean)] = Seq(
    ("plus", _ + _, false), ("minus", _ - _, false),
    ("multiply", _ * _, false), ("divide", _ / _, true), ("modulo", _ % _, false))

  for ((name, op, intDiv) <- ops; (suffix, ft) <- Seq(("", FloatType), ("_f64", DoubleType))) {
    test(s"golden numerics_$name$suffix") {
      assert(Render.csv(opCols(op, intDiv)(ft)) == golden(s"numerics_$name$suffix.csv"))
    }
  }

  // ---- null predicates over null_test.csv ----

  private lazy val nullTest = {
    val schema = StructType(Seq(
      StructField("c_int", IntegerType), StructField("c_float", DoubleType),
      StructField("c_string", StringType), StructField("c_bool", BooleanType)))
    spark.read.schema(schema).option("header", "true").csv(s"$refData/null_test.csv")
  }

  test("golden is_null_csv") {
    assert(Render.csv(nullTest.filter(col("c_float").isNull).select(col("c_int")))
      == golden("is_null_csv.csv"))
  }

  test("golden is_not_null_csv") {
    assert(Render.csv(nullTest.filter(col("c_float").isNotNull).select(col("c_int")))
      == golden("is_not_null_csv.csv"))
  }

  // ---- sqrt + limit over a 1..10 range ----

  test("golden test_sqrt") {
    val df = spark.range(1, 11).select(col("id").cast(IntegerType).as("n"),
      sqrt(col("id")).as("s"))
    assert(Render.csv(df) == golden("test_sqrt.csv"))
  }

  test("golden test_limit") {
    val df = spark.range(1, 11).select(col("id").cast(IntegerType).as("n"),
      sqrt(col("id")).as("s")).limit(5)
    assert(Render.csv(df) == golden("test_limit.csv"))
  }

  // ---- uk_cities filter + global min/max (headerless full 37-row read,
  //      unlike the later tests/sql.rs golden which consumes row 1) ----

  private lazy val cities = {
    val schema = StructType(Seq(StructField("city", StringType),
      StructField("lat", DoubleType), StructField("lng", DoubleType)))
    spark.read.schema(schema).option("header", "false").csv(s"$refData/uk_cities.csv")
  }

  test("golden test_filter (lat > 52, file order)") {
    // coalesce(1) keeps the single-file input order through the filter
    assert(Render.csv(cities.coalesce(1).filter(col("lat") > 52))
      == golden("test_filter.csv"))
  }

  test("golden test_sql_min_max") {
    val df = cities.agg(min(col("lat")), max(col("lat")), min(col("lng")), max(col("lng")))
    assert(Render.csv(df) == golden("test_sql_min_max.csv"))
  }
}
