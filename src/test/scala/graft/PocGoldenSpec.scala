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
  private def golden(name: String): String = {
    // lossy UTF-8 decode: a few random c_str payloads are not valid UTF-8;
    // Spark's reader substitutes U+FFFD the same way
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$refData/expected/$name"))
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

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

  // ---- all_types_flat comparison / cast / aggregate families.
  //      Schema per §1.5: unsigned widened to the next signed type (u64 data
  //      here fits LongType). Filters preserve file order via coalesce(1). ----

  private lazy val allTypes = {
    val schema = StructType(Seq(
      StructField("c_bool", BooleanType),
      StructField("c_uint8", ShortType), StructField("c_uint16", IntegerType),
      StructField("c_uint32", LongType), StructField("c_uint64", LongType),
      StructField("c_int8", ByteType), StructField("c_int16", ShortType),
      StructField("c_int32", IntegerType), StructField("c_int64", LongType),
      StructField("c_float32", FloatType), StructField("c_float64", DoubleType),
      StructField("c_str", StringType)))
    // RFC-4180 parsing: two c_str payloads contain embedded newlines, so
    // the file uses quoted multi-line fields with doubled-quote escaping
    // (arrow's CSV dialect) — multiLine + escape='"' mirrors it
    spark.read.schema(schema).option("header", "false")
      .option("multiLine", "true").option("escape", "\"")
      .csv(s"$refData/all_types_flat.csv").coalesce(1)
  }

  // scalar comparisons: the eq/lt/lteq/gt/gteq goldens are EMPTY results
  // (literal outside the int8 domain — SURVEY §5: "encode intended semantics
  // precisely (e.g. empty result)"); noteq/positive/negative/range carry the
  // inferred literals, verified by byte equality
  private val int8Filters: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "c_int8_eq" -> (col("c_int8") === 999),
    "c_int8_noteq" -> (col("c_int8") =!= 0),
    "c_int8_lt" -> (col("c_int8") < -999),
    "c_int8_lteq" -> (col("c_int8") <= -999),
    "c_int8_gt" -> (col("c_int8") > 999),
    "c_int8_gteq" -> (col("c_int8") >= 999),
    "c_int8_scalar_gt" -> (col("c_int8") > 999),
    "c_int8_positive" -> (col("c_int8") >= 0),
    "c_int8_negative" -> (col("c_int8") < 0),
    "c_int8_range_inclusive" -> col("c_int8").between(2, 99),
    "c_int8_range_exclusive" -> (col("c_int8") > 100 && col("c_int8") < 128),
    "c_int8_col_eq" -> (col("c_int8") === col("c_int16")),
    "c_int8_col_noteq" -> (col("c_int8") =!= col("c_int16")),
    "c_int8_col_lt" -> (col("c_int8") < col("c_int16")),
    "c_int8_col_lteq" -> (col("c_int8") <= col("c_int16")),
    "c_int8_col_gt" -> (col("c_int8") > col("c_int16")),
    "c_int8_col_gteq" -> (col("c_int8") >= col("c_int16")))

  for ((name, pred) <- int8Filters) {
    test(s"golden $name") {
      assert(Render.csv(allTypes.filter(pred).select(col("c_int8"))) == golden(s"$name.csv"))
    }
  }

  for (c <- Seq("c_int16", "c_int32", "c_int64")) {
    test(s"golden ${c}_positive / ${c}_negative") {
      assert(Render.csv(allTypes.filter(col(c) >= 0).select(col(c)))
        == golden(s"${c}_positive.csv"))
      assert(Render.csv(allTypes.filter(col(c) < 0).select(col(c)))
        == golden(s"${c}_negative.csv"))
    }
  }

  for (c <- Seq("c_float32", "c_float64")) {
    test(s"golden ${c}_low / ${c}_high") {
      assert(Render.csv(allTypes.filter(col(c) < 0.5).select(col(c)))
        == golden(s"${c}_low.csv"))
      assert(Render.csv(allTypes.filter(col(c) >= 0.5).select(col(c)))
        == golden(s"${c}_high.csv"))
    }
  }

  // cast family: signed casts run over the negative-filtered set, unsigned
  // over all rows (inferred from row counts); value rendering is width-
  // independent, target INT mirrors expression.rs:272-280's wired targets
  for ((c, filtered) <- Seq("c_int8" -> true, "c_int16" -> true, "c_int32" -> true,
      "c_int64" -> true, "c_uint8" -> false, "c_uint16" -> false,
      "c_uint32" -> false, "c_uint64" -> false)) {
    test(s"golden ${c}_cast") {
      val base = if (filtered) allTypes.filter(col(c) < 0) else allTypes
      assert(Render.csv(base.select(col(c).cast(LongType))) == golden(s"${c}_cast.csv"))
    }
  }

  test("golden csv_aggregate_by_c_bool (min/max of every column per group)") {
    val valueCols = allTypes.columns.filterNot(_ == "c_bool")
    val aggs = valueCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val df = allTypes.groupBy(col("c_bool")).agg(aggs.head, aggs.tail: _*)
      .orderBy("c_bool")
    assert(Render.csv(df) == golden("csv_aggregate_by_c_bool.csv"))
  }

  // float cast goldens: the signed-float casts run over the < 0.5 set; the
  // *_uint32 trio all contain the full unfiltered column — the POC's
  // uint32-cast predicates never filtered anything because every c_float32
  // value lies in (0,1), so CAST(c_float32 AS UINT32) is always 0
  test("golden c_float32_cast / c_float64_cast") {
    assert(Render.csv(allTypes.filter(col("c_float32") < 0.5)
      .select(col("c_float32").cast(FloatType))) == golden("c_float32_cast.csv"))
    assert(Render.csv(allTypes.filter(col("c_float64") < 0.5)
      .select(col("c_float64"))) == golden("c_float64_cast.csv"))
  }

  test("golden c_float32 uint32-cast trio (always-true predicates)") {
    val all = Render.csv(allTypes.filter(col("c_float32").cast(IntegerType) >= 0)
      .select(col("c_float32")))
    assert(all == golden("c_float32_cast_uint32.csv"))
    assert(all == golden("c_float32_low_uint32.csv"))
    assert(all == golden("c_float32_high_uint32.csv"))
  }

  test("golden csv_query_all_types / parquet_query_all_types (c_float64 < 0.1)") {
    // predicate recovered by threshold search over the selected set:
    // max(selected)=0.0977… < 0.1 ≤ min(unselected)=0.1078…
    assert(Render.csv(allTypes.filter(col("c_float64") < 0.1))
      == golden("csv_query_all_types.csv"))
    val pq = spark.read.parquet(s"$refData/all_types_flat.parquet").coalesce(1)
    assert(Render.csv(pq.filter(col("c_float64") < 0.1))
      == golden("parquet_query_all_types.csv"))
  }

  test("golden csv_aggregate_all_types (count + min/max matrix)") {
    // the golden's two trailing string cells are IDENTICAL — the POC emitted
    // min(c_str) twice (max slot included); replicated as-is
    val valueCols = allTypes.columns.filterNot(_ == "c_str")
    val aggs = Seq(count(lit(1)), count(lit(1))) ++
      valueCols.flatMap(c => Seq(min(col(c)), max(col(c)))) ++
      Seq(min(col("c_str")), min(col("c_str")))
    val df = allTypes.agg(aggs.head, aggs.tail: _*)
    assert(Render.csv(df) == golden("csv_aggregate_all_types.csv"))
  }

  // ---- geospatial UDF/UDT goldens over uk_cities ----

  test("golden test_simple_predicate (ST chain, header-consumed, lat < 53)") {
    val withHeader = spark.read.schema(cities.schema).option("header", "true")
      .csv(s"$refData/uk_cities.csv").coalesce(1)
    val df = withHeader.filter(col("lat") < 53)
      .select(graft.functions.Geo.stAsText(
        graft.functions.Geo.stPoint(col("lat"), col("lng"))))
    assert(Render.csv(df) == golden("test_simple_predicate.csv"))
  }

  test("golden test_chaining_functions (full headerless read)") {
    val df = cities.coalesce(1).select(graft.functions.Geo.stAsText(
      graft.functions.Geo.stPoint(col("lat"), col("lng"))))
    assert(Render.csv(df) == golden("test_chaining_functions.csv"))
  }

  test("golden test_sql_udf_udt / test_df_udf_udt (struct Display render)") {
    val df = cities.coalesce(1)
      .select(graft.functions.Geo.stPoint(col("lat"), col("lng")))
    val out = Render.csv(df)
    assert(out == golden("test_sql_udf_udt.csv"))
    assert(out == golden("test_df_udf_udt.csv"))
  }

  test("SQL UDF implicit arg cast: ST_Point(int, int) matches the double path") {
    // the reference planner inserts CASTs to a UDF's declared arg types
    // (/root/reference/src/sqlplanner.rs:350-354); Spark's analyzer does the
    // same for registered UDFs — prove integer inputs flow through the
    // ST_Point(double, double) registration unchanged
    graft.functions.Geo.register(spark)
    val ints = cities.coalesce(1)
      .select(col("lat").cast("int").as("ilat"), col("lng").cast("int").as("ilng"))
    ints.createOrReplaceTempView("cities_int")
    val viaSql = spark.sql("SELECT ST_AsText(ST_Point(ilat, ilng)) FROM cities_int")
      .collect().map(_.getString(0))
    val viaCol = ints.select(graft.functions.Geo.stAsText(graft.functions.Geo.stPoint(
        col("ilat").cast("double"), col("ilng").cast("double"))))
      .collect().map(_.getString(0))
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.head.matches("""POINT \(-?\d+\.0 -?\d+\.0\)"""))
  }

  test("golden parquet_aggregate_all_types (sequential SATURATING sums)") {
    // the POC's sum kernel is a sequential saturating fold — path-dependent
    // once an intermediate saturates (i32 pins at MAX; i64 saturates then
    // drifts back down to 269433464379590488). Replicated as an ordered fold
    // over collect_list on the single-partition read; f32 accumulates in
    // float32, everything else never overflows so a plain sum matches.
    val pq = spark.read.parquet(s"$refData/all_types_flat.parquet").coalesce(1)
    def satFold(c: String, lo: Long, hi: Long) =
      aggregate(collect_list(col(c).cast(LongType)), lit(0L), (acc, v) =>
        when(v > 0 && acc > lit(hi) - v, lit(hi))
          .when(v < 0 && acc < lit(lo) - v, lit(lo))
          .otherwise(acc + v))
    val f32Fold = aggregate(collect_list(col("c_float32")), lit(0f), (acc, v) => acc + v)
    val valueCols = pq.columns.filterNot(_ == "c_utf8")
    val aggs = Seq(count(lit(1)), count(lit(1))) ++
      valueCols.flatMap(c => Seq(min(col(c)), max(col(c)))) ++
      Seq(min(col("c_utf8")), min(col("c_utf8")),
        sum(col("c_int8")), sum(col("c_int16")),
        satFold("c_int32", Int.MinValue, Int.MaxValue),
        satFold("c_int64", Long.MinValue, Long.MaxValue),
        sum(col("c_uint8")), sum(col("c_uint16")), sum(col("c_uint32")),
        sum(col("c_uint64")), f32Fold, sum(col("c_float64")))
    assert(Render.csv(pq.agg(aggs.head, aggs.tail: _*))
      == golden("parquet_aggregate_all_types.csv"))
  }

  test("golden test_cast (null_test cast matrix, non-null rows)") {
    val df = nullTest.filter(col("c_int") <= 2).select(
      col("c_int").cast(ByteType), col("c_int").cast(ShortType),
      col("c_int").cast(IntegerType), col("c_int").cast(LongType),
      col("c_float").cast(FloatType), col("c_float").cast(DoubleType),
      col("c_string").cast(FloatType), col("c_string").cast(DoubleType))
    assert(Render.csv(df) == golden("test_cast.csv"))
  }
}
