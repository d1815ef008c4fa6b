package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.1-2.5), expressed
  * Spark-first over the driver's TPC-H-ish tables.
  *
  * Every query here has a DuckDB oracle with IDENTICAL output column names
  * and a deterministic ORDER BY over a unique key so value hashing matches.
  * Floating aggregates are rounded in BOTH engines: double summation order
  * differs between Spark's partial/final aggregation and DuckDB's, so the
  * last ulp is not comparable — rounding to a fixed scale is.
  *
  * Reference citations (all /root/reference/): projection/selection
  * src/execution/projection.rs, filter.rs; comparison+math+boolean ops
  * src/execution/expression.rs:131-224; CAST expression.rs:316-379;
  * aggregates src/execution/aggregate.rs; sort/limit src/logicalplan.rs:313-338
  * (planned); joins/set-ops are ROADMAP.md:31 items — all are Spark built-ins.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def part(s: SparkSession, d: String) = Tables(s, d, "part")
  private def nation(s: SparkSession, d: String) = Tables(s, d, "nation")
  private def events(s: SparkSession, d: String) = Tables(s, d, "events")

  val queries: Map[String, Q] = Map(
    // ---- scan / projection / arithmetic (projection.rs:29-71) ----
    "q_scan_project" -> ((s, d) =>
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        // lineitem has duplicate (orderkey, linenumber) pairs in the synthetic
        // data: ordering by EVERY output column makes ties interchangeable,
        // so the result is deterministic for the oracle hash
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "revenue")),

    // ---- selection + comparison predicates (filter.rs, expression.rs:171-210) ----
    "q_filter_pred" -> ((s, d) =>
      li(s, d)
        .filter(col("l_quantity") >= 30 && col("l_discount") < 0.05 &&
          col("l_returnflag") =!= "A" && col("l_linenumber") <= 3 && col("l_tax") > 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // ---- boolean AND/OR/NOT (expression.rs:212-224; NOT logicalplan.rs:81) ----
    "q_filter_bool" -> ((s, d) =>
      li(s, d)
        .filter((col("l_returnflag") === "R" && col("l_quantity") > 45) ||
          !(col("l_linestatus") === "F"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- LIKE / NOT LIKE (logicalplan.rs:82-83) ----
    "q_like" -> ((s, d) =>
      part(s, d)
        .filter(col("p_name").like("%ol%") && !col("p_type").like("%BRASS%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy("p_partkey")),

    // ---- IS NULL / IS NOT NULL (logicalplan.rs:147-150) ----
    "q_null_pred" -> ((s, d) =>
      events(s, d).agg(
        (count(lit(1)) - count(col("props"))).as("n_null"),
        count(col("props")).as("n_notnull"))),

    // ---- BETWEEN-style range (goldens c_int8_range_*.csv) ----
    "q_between" -> ((s, d) =>
      li(s, d)
        .filter(col("l_quantity").between(10, 20))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // ---- arithmetic + - * / % div (expression.rs:131-169) ----
    "q_arith" -> ((s, d) =>
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + col("l_tax")).as("add_d"),
          (col("l_extendedprice") - col("l_discount")).as("sub_d"),
          (col("l_quantity") * col("l_tax")).as("mul_d"),
          (col("l_extendedprice") / col("l_quantity")).as("div_d"),
          (col("l_orderkey") % 97).as("mod_i"),
          expr("l_orderkey div 7").as("div_i"))
        .orderBy("l_orderkey", "l_linenumber", "add_d", "sub_d", "mul_d", "div_d")),

    // ---- CAST matrix, value-safe subset (expression.rs:316-379; §7.4-1) ----
    "q_cast" -> ((s, d) =>
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_linenumber").cast("long").as("ln_big"),
          col("l_linenumber").cast("short").as("ln_small"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_partkey").cast("double").as("pk_dbl"),
          col("l_orderkey").cast("string").as("key_str"),
          // render as ISO string: Spark dates vs DuckDB dates surface with
          // different physical types to the comparer; the string is stable
          date_format(col("l_shipdate").cast("date"), "yyyy-MM-dd").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber", "qty_int", "pk_dbl", "ship_date")),

    // ---- ORDER BY + LIMIT → TakeOrderedAndProject (logicalplan.rs:313-338) ----
    "q_sort_limit" -> ((s, d) =>
      ord(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // ---- global aggregate, no GROUP BY (aggregate.rs:703-785).
    //      Money/ratio moments ride EXACT integer units (margin census
    //      r16: a corpus-magnitude plain-double sum has 1e4 ulps of its
    //      own scale EXCEEDING the 2-dp grain, so the §7u margin argument
    //      structurally cannot hold — the q_heaps_law remedy applies).
    //      l_extendedprice/l_discount carry exactly 2 dp in the driver
    //      data (max |x·100 − round(x·100)| ≈ 1e-9), so round(x·100)
    //      recovers the integer cents/basis-points bit-exactly; decimal
    //      sums are order-free and overflow-proof at any corpus size ----
    "q_agg_global" -> ((s, d) =>
      li(s, d)
        // integer units stay LONG per row via the grid-exact floor device
        // (r16 opt, see ExactMoney.centsL: Spark's Round on doubles is a
        // per-row BigDecimal); SumCents folds them on its long fast path
        // and evaluates the same exact decimal sum
        .withColumn("__cents", ExactMoney.centsL(col("l_extendedprice")))
        .withColumn("__bp", ExactMoney.centsL(col("l_discount")))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(graft.functions.SumCents.sum(col("__cents")).cast("double")
            / 100, 2).as("sum_price"),
          round(graft.functions.SumCents.sum(col("__bp")).cast("double") /
            (count(lit(1)) * lit(100L)).cast("double"), 6).as("avg_disc"),
          sum(col("l_linenumber")).as("sum_line"))),

    // ---- hash GROUP BY aggregate, TPC-H Q1 shape (aggregate.rs:787-952).
    //      Same exact-integer device as q_agg_global: per-row products in
    //      long (cents·(100−disc_bp)·(100+tax_bp) ≤ 1.3e11), sums in
    //      decimal(38,0); the 2-dp output grain is cut by integer
    //      HALF_UP ((x + half) DIV grain — all sums positive) so no
    //      double ever carries an order-dependent digit ----
    "q_agg_group" -> ((s, d) => {
      // r16 opt: every per-row unit column stays LONG via the grid-exact
      // floor device (ExactMoney.centsL — Spark's Round on doubles is a
      // per-row BigDecimal); SumCents evaluates the identical exact
      // decimal(38,0) sums, so the HALF_UP DIV devices and the oracle
      // twins are unchanged value for value
      import graft.functions.SumCents.{sum => sumC, intDiv}
      li(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1999-06-30")))
        .withColumn("__q", ExactMoney.centsL(col("l_quantity")))
        .withColumn("__c", ExactMoney.centsL(col("l_extendedprice")))
        .withColumn("__bp", ExactMoney.centsL(col("l_discount")))
        .withColumn("__d4", col("__c") * (lit(100L) - col("__bp")))
        .withColumn("__d6",
          col("__c") * (lit(100L) - col("__bp")) *
            (lit(100L) + ExactMoney.centsL(col("l_tax"))))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sumC(col("__q")).cast("double") / 100, 2).as("sum_qty"),
          round(sumC(col("__c")).cast("double") / 100, 2).as("sum_base"),
          (intDiv(sumC(col("__d4")) + lit(50L), lit(100L)).cast("double")
            / 100).as("sum_disc"),
          (intDiv(sumC(col("__d6")) + lit(5000L), lit(10000L)).cast("double")
            / 100).as("sum_charge"),
          round(sumC(col("__q")).cast("double") /
            (count(lit(1)) * lit(100L)).cast("double"), 4).as("avg_qty"),
          round(sumC(col("__c")).cast("double") /
            (count(lit(1)) * lit(100L)).cast("double"), 4).as("avg_price"),
          round(sumC(col("__bp")).cast("double") /
            (count(lit(1)) * lit(100L)).cast("double"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- GROUP BY integer key (aggregate.rs GroupByScalar ints) ----
    "q_agg_groupint" -> ((s, d) =>
      li(s, d)
        .groupBy(col("l_linenumber"))
        .agg(count(lit(1)).as("n"),
          ExactMoney.sum2(col("l_quantity")).as("sum_qty"),
          ExactMoney.avgK(col("l_extendedprice"), 4).as("avg_price"))
        .orderBy("l_linenumber")),

    // ---- HAVING = post-agg filter (rejected by reference sqlplanner.rs:136-140;
    //      free in Spark) ----
    "q_having" -> ((s, d) =>
      li(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("n") >= 45)
        .orderBy("l_partkey")),

    // ---- broadcast hash join: dim table well under the broadcast threshold ----
    "q_join_broadcast" -> ((s, d) =>
      ord(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          ExactMoney.sum2(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")),

    // ---- 3-way join + agg + top-k, TPC-H Q3 shape ----
    "q_join_multi" -> ((s, d) =>
      cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(ord(s, d).filter(col("o_orderdate") < to_timestamp(lit("1997-03-15"))),
          col("c_custkey") === col("o_custkey"))
        .join(li(s, d).filter(col("l_shipdate") > to_timestamp(lit("1997-03-15"))),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(ExactMoney.sumDisc2(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)),

    // ---- semi join (EXISTS) ----
    "q_join_semi" -> ((s, d) =>
      ord(s, d)
        .join(li(s, d).filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"))
        .orderBy("o_orderkey")),

    // ---- anti join (NOT EXISTS) ----
    "q_join_anti" -> ((s, d) =>
      ord(s, d)
        .join(li(s, d).filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"))
        .orderBy("o_orderkey")),

    // ---- left outer join ----
    "q_join_outer" -> ((s, d) =>
      nation(s, d)
        .join(cust(s, d), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy("n_name")),

    // ---- set ops (ROADMAP-only in reference; built-in here) ----
    "q_union" -> ((s, d) =>
      cust(s, d).filter(col("c_acctbal") > 9000).select(col("c_custkey").as("key"))
        .union(ord(s, d).filter(col("o_totalprice") > 400000).select(col("o_custkey").as("key")))
        .distinct()
        .orderBy("key")),

    "q_intersect" -> ((s, d) =>
      cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
        .intersect(ord(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("key")))
        .orderBy("key")),

    "q_except" -> ((s, d) =>
      cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
        .except(ord(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("key")))
        .orderBy("key")),

    "q_distinct" -> ((s, d) =>
      cust(s, d).select(col("c_mktsegment").as("seg")).distinct().orderBy("seg")),

    // ---- window: rank within group (beyond reference; Spark built-in) ----
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // ---- window: running sum (deterministic frame order → exact) ----
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- rollup (beyond reference) ----
    "q_rollup" -> ((s, d) =>
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          ExactMoney.sum2(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // ---- scalar functions: sqrt (golden test_sqrt.csv) + string fns ----
    "q_scalar_fns" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
          abs(col("p_size") - 25).as("size_dev"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")),

    // ---- CASE WHEN ----
    "q_case_when" -> ((s, d) =>
      ord(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"))
        .orderBy("o_orderkey")),

    // ---- ST_Point / ST_AsText UDT chain (smoketest.sql:2-3, goldens
    //      test_sql_udf_udt.csv, test_chaining_functions.csv): build a
    //      struct point, extract fields, render WKT ----
    "q_stpoint" -> ((s, d) =>
      cust(s, d)
        .withColumn("pt", graft.functions.Geo.stPoint(
          col("c_custkey").cast("double"), col("c_nationkey").cast("double")))
        .select(col("c_custkey"),
          col("pt.x").as("x"), col("pt.y").as("y"),
          graft.functions.Geo.stAsText(col("pt")).as("wkt"))
        .orderBy("c_custkey")),

    // ---- SELECT without FROM (EmptyRelation, logicalplan.rs:347) ----
    "q_empty_select" -> ((s, _) =>
      s.sql("SELECT 1 AS one, sqrt(9) AS three, 'df' AS tag")),

    // ---- event-time hourly aggregate (batch analog of the streaming path) ----
    "q_events_hourly" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("hour_ts", "event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |       l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, revenue""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount < 0.05 AND l_returnflag <> 'A'
        |  AND l_linenumber <= 3 AND l_tax > 0.02
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "q_filter_bool" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |WHERE (l_returnflag = 'R' AND l_quantity > 45) OR NOT (l_linestatus = 'F')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%ol%' AND p_type NOT LIKE '%BRASS%'
        |ORDER BY p_partkey""".stripMargin,

    "q_null_pred" ->
      """SELECT count(*) - count(props) AS n_null, count(props) AS n_notnull
        |FROM events""".stripMargin,

    "q_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "q_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_quantity + l_tax AS add_d,
        |       l_extendedprice - l_discount AS sub_d,
        |       l_quantity * l_tax AS mul_d,
        |       l_extendedprice / l_quantity AS div_d,
        |       l_orderkey % 97 AS mod_i,
        |       l_orderkey // 7 AS div_i
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, add_d, sub_d, mul_d, div_d""".stripMargin,

    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_linenumber AS BIGINT) AS ln_big,
        |       CAST(l_linenumber AS SMALLINT) AS ln_small,
        |       CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
        |       CAST(l_partkey AS DOUBLE) AS pk_dbl,
        |       CAST(l_orderkey AS VARCHAR) AS key_str,
        |       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_int, pk_dbl, ship_date""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_agg_global" ->
      """SELECT count(*) AS n_rows,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_price,
        |       round(CAST(sum(CAST(round(l_discount*100) AS BIGINT))
        |                  AS DOUBLE)/CAST(count(*)*100 AS DOUBLE), 6)
        |         AS avg_disc,
        |       CAST(sum(l_linenumber) AS BIGINT) AS sum_line
        |FROM lineitem""".stripMargin,

    "q_agg_group" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(round(l_quantity*100) AS BIGINT) AS q,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS c,
        |         CAST(round(l_discount*100) AS BIGINT) AS d,
        |         CAST(round(l_tax*100) AS BIGINT) AS tx
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30')
        |SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(q) AS DOUBLE)/100, 2) AS sum_qty,
        |       round(CAST(sum(c) AS DOUBLE)/100, 2) AS sum_base,
        |       CAST((sum(c*(100-d)) + 50) // 100 AS DOUBLE)/100 AS sum_disc,
        |       CAST((sum(c*(100-d)*(100+tx)) + 5000) // 10000 AS DOUBLE)/100
        |         AS sum_charge,
        |       round(CAST(sum(q) AS DOUBLE)/CAST(count(*)*100 AS DOUBLE), 4)
        |         AS avg_qty,
        |       round(CAST(sum(c) AS DOUBLE)/CAST(count(*)*100 AS DOUBLE), 4)
        |         AS avg_price,
        |       round(CAST(sum(d) AS DOUBLE)/CAST(count(*)*100 AS DOUBLE), 6)
        |         AS avg_disc,
        |       count(*) AS n
        |FROM t GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_groupint" ->
      """SELECT l_linenumber, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |                  AS DOUBLE)/CAST(count(l_extendedprice)*100 AS DOUBLE), 4)
        |         AS avg_price
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,

    "q_having" ->
      """SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) >= 45
        |ORDER BY l_partkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_multi" ->
      """SELECT l_orderkey,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |                      *(100 - CAST(round(l_discount*100) AS BIGINT)))
        |                  AS DOUBLE)/10000, 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_outer" ->
      """SELECT n_name, count(c_custkey) AS n_cust
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_union" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
        |ORDER BY key""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
        |ORDER BY key""".stripMargin,

    "q_except" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
        |ORDER BY key""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY seg",

    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_scalar_fns" ->
      """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS name_len,
        |       substring(p_type, 1, 5) AS type5,
        |       round(sqrt(p_retailprice), 4) AS sqrt_price,
        |       abs(p_size - 25) AS size_dev,
        |       concat(p_brand, '#', p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_case_when" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_stpoint" ->
      """SELECT c_custkey,
        |       CAST(c_custkey AS DOUBLE) AS x,
        |       CAST(c_nationkey AS DOUBLE) AS y,
        |       concat('POINT (', CAST(CAST(c_custkey AS DOUBLE) AS VARCHAR), ' ',
        |              CAST(CAST(c_nationkey AS DOUBLE) AS VARCHAR), ')') AS wkt
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_empty_select" ->
      "SELECT 1 AS one, sqrt(9) AS three, 'df' AS tag",

    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
