package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Persisted._

/** The remaining classic star-schema decision-support shapes (TPC-H
  * Q4/Q6/Q9/Q11/Q13/Q16/Q19/Q20, adapted to this schema — no partsupp,
  * no commit/receipt dates), each chosen for a DISTINCT physical-plan
  * property on a 100 TB fact:
  *
  *  - Q4: EXISTS as a residual-condition SEMI join — the fact never
  *    duplicates the probe side and drops out after the first match;
  *  - Q6: the scan-is-the-query shape — every predicate reaches the
  *    parquet reader, zero joins, one partial-agg row per partition;
  *  - Q9: a five-way star where every dimension chain folds to a
  *    broadcast and the only fact-sized exchange is orders⋈lineitem;
  *  - Q11: census + global-threshold (1-row broadcast, integer
  *    cross-multiplication — no share double at the cut);
  *  - Q13: LEFT join preserving zero-order customers, then a
  *    count-of-counts second census;
  *  - Q16: pair-census DISTINCT, anti-join suppression, then a
  *    count-distinct over the dimension grain;
  *  - Q19: OR-of-conjunctions where the disjunction's column envelope
  *    still prunes (brand/size sets push into the dim, the qty envelope
  *    into the fact scan);
  *  - Q20: two chained censuses with a relative threshold, suppliers
  *    surfaced by semi-shaped joins.
  *
  * All revenue arithmetic follows the repo's cents discipline: per-row
  * `round(x*100)` to BIGINT, integer sums, integer cross-multiplied
  * boundaries — bit-identical across engines, so the DuckDB oracle
  * hash-matches without tolerance. Reference scope for the relational
  * surface: /root/reference/src/execution/context.rs:104-196 (these
  * shapes are beyond it).
  */
object StarOps {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def part(s: SparkSession, d: String) = Tables(s, d, "part")
  private def nation(s: SparkSession, d: String) = Tables(s, d, "nation")
  private def sup(s: SparkSession, d: String) = Tables(s, d, "supplier")

  private val cents = expr(
    "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")

  val queries: Map[String, Q] = Map(

    // ---- order-priority census (TPC-H Q4): orders in one half-year with
    //      at least one lineitem shipped >30 days after the order date,
    //      counted per priority. The EXISTS is a LEFT SEMI join whose
    //      condition carries the non-equi lateness residual alongside the
    //      key: the probe side deduplicates on first match, so the fact
    //      never multiplies the order rows and no DISTINCT is needed. At
    //      100 TB: the date window prunes orders AT THE SCAN before the
    //      one orderkey exchange; the census grain is the 5-value
    //      priority alphabet ----
    "q_order_priority_census" -> ((s, d) => {
      val o = ord(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-07-01")))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val l = li(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("interval 30 days"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // ---- forgone-discount revenue (TPC-H Q6): one filtered global
    //      aggregate, no joins — the shape that proves predicates reach
    //      the scan. The discount boundary compares round(l_discount*100)
    //      as an INTEGER band, never the raw double (0.05 is not exactly
    //      representable; the integer band is bit-safe cross-engine).
    //      At 100 TB this is a scan-bandwidth benchmark: date + quantity
    //      prune in the reader, one partial-agg row per partition ----
    "q_forecast_revenue" -> ((s, d) =>
      li(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          expr("cast(round(l_discount * 100) as int)").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          sum(expr("cast(round(l_extendedprice * l_discount * 100) as bigint)"))
            .as("forgone_cents"))),

    // ---- nation profit (TPC-H Q9, cost model adapted: unit cost is 90%
    //      of retail in cents since there is no partsupp): yearly profit
    //      per supplier nation on '%red%'-named parts. Five-way star
    //      where part (name-filtered, 2 columns) and supplier⋈nation both
    //      FOLD TO BROADCASTS — the only fact-sized exchange is
    //      lineitem⋈orders on the orderkey; the census grain is
    //      25 nations × 7 years. Profit is integer cents end to end:
    //      round(rev·100) − qty·round(retail·90) ----
    "q_nation_profit" -> ((s, d) => {
      val redParts = part(s, d).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"),
          expr("cast(round(p_retailprice * 90) as bigint)").as("unit_cost"))
      val supNation = sup(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      li(s, d)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_lines"),
          sum(expr(
            "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)" +
              " - cast(l_quantity as bigint) * unit_cost")).as("profit_cents"))
        .orderBy("n_name", "o_year")
    }),

    // ---- high-value parts (TPC-H Q11's value-fraction HAVING): parts
    //      whose revenue exceeds 1/1500 of TOTAL revenue. The global
    //      threshold is a 1-ROW broadcast over the persisted census (the
    //      fact is scanned once — the census is reused by both the total
    //      and the filter), and the boundary is the integer
    //      cross-multiplication rev·1500 > total, never a share double.
    //      At 100 TB: one map-side-combinable census shuffle; everything
    //      after is census-sized ----
    "q_value_parts" -> ((s, d) => {
      val rev = li(s, d).groupBy(col("l_partkey"))
        .agg(sum(cents).as("rev_cents"))
        .persistTracked()
      val tot = rev.agg(sum(col("rev_cents")).as("tot_cents"))
      rev.crossJoin(broadcast(tot))
        .filter(expr("rev_cents * 1500 > tot_cents"))
        .select(col("l_partkey").as("p_partkey"), col("rev_cents"))
        .orderBy(col("rev_cents").desc, col("p_partkey"))
    }),

    // ---- customer order distribution (TPC-H Q13): how many customers
    //      placed 0, 1, 2, … non-urgent orders. The LEFT join keeps
    //      zero-order customers (the row the inner-join formulation
    //      silently loses); count(o_orderkey) counts matches, not rows,
    //      so the null row of a customer with no orders scores 0. Two
    //      censuses: fact-sized on custkey, then count-of-counts on the
    //      tiny c_count alphabet ----
    "q_customer_distribution" -> ((s, d) => {
      val o = ord(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      cust(s, d).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- brand/type/size supplier census (TPC-H Q16): distinct
    //      suppliers per (brand, type, size) over a part subset,
    //      excluding flagged suppliers (negative balance stands in for
    //      Q16's complaint filter — there is no comment column). Plan:
    //      the (partkey, suppkey) PAIR census is the one fact-sized
    //      DISTINCT; the supplier suppression is a broadcast ANTI join on
    //      the census (6 rows), the part attributes a broadcast, and the
    //      final count-distinct runs on the dimension grain ----
    "q_brand_supplier_census" -> ((s, d) => {
      val parts = part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val flagged = sup(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      li(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(flagged),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // ---- disjunctive-predicate revenue (TPC-H Q19): revenue under an
    //      OR of three (brand, size-band, quantity-band) conjunctions.
    //      The planner can't push the disjunction whole, but its COLUMN
    //      ENVELOPE still prunes: only (partkey, brand, size) leave the
    //      part scan (broadcast), only the five fact columns leave
    //      lineitem, and the quantity envelope [1,30] is scan-rangeable.
    //      One global agg row — no shuffle beyond the partial-agg
    //      collapse ----
    "q_disjunctive_revenue" -> ((s, d) => {
      val p = part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val qty = col("l_quantity").cast("long")
      val disj =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          qty.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 20) &&
          qty.between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(20, 30) &&
          qty.between(20, 30))
      li(s, d).join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(disj)
        .agg(count(lit(1)).as("n_lines"), sum(cents).as("rev_cents"))
    }),

    // ---- excess-share suppliers (TPC-H Q20's nested-subquery chain,
    //      decorrelated): suppliers who shipped more than 1.2× the
    //      average per-supplier volume of '%small%'-named parts in one
    //      year. Chain: name-filtered part keys broadcast into the
    //      date-pruned fact, ONE suppkey census (persisted — reused by
    //      the average and the cut), a 1-row broadcast threshold with the
    //      integer boundary 5·qty·n > 6·total, then supplier + nation
    //      dims broadcast onto the survivors ----
    "q_excess_suppliers" -> ((s, d) => {
      val smallParts = part(s, d).filter(col("p_name").like("%small%"))
        .select(col("p_partkey"))
      val shipped = li(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .persistTracked()
      val tot = shipped.agg(sum(col("sum_qty")).as("tot_qty"),
        count(lit(1)).as("n_supp"))
      shipped.crossJoin(broadcast(tot))
        .filter(expr("5 * sum_qty * n_supp > 6 * tot_qty"))
        .join(broadcast(sup(s, d)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("sum_qty"))
        .orderBy("s_suppkey")
    })
  )

  val oracles: Map[String, String] = Map(
    // the EXISTS spelled directly; same window, same +30d residual
    "q_order_priority_census" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // same integer discount band, same cents forgone-revenue sum
    "q_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |                AS BIGINT)) AS BIGINT) AS forgone_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    // same star, same integer profit: round(rev·100) − qty·round(retail·90)
    "q_nation_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |       count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)
        |           - CAST(l_quantity AS BIGINT)
        |             * CAST(round(p_retailprice * 90) AS BIGINT))
        |        AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same census, same rev·1500 > total integer boundary
    "q_value_parts" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |              * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_partkey, rev_cents
        |FROM rev
        |WHERE rev_cents * 1500 > (SELECT sum(rev_cents) FROM rev)
        |ORDER BY rev_cents DESC, p_partkey""".stripMargin,

    // same LEFT join with the filter in the JOIN condition (a WHERE
    // would turn it inner and lose the zero-order customers)
    "q_customer_distribution" ->
      """WITH co AS MATERIALIZED (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // same pair census, same anti-join suppression, same grain
    "q_brand_supplier_census" ->
      """WITH ps AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (
        |  SELECT l_partkey, l_suppkey FROM ps
        |  WHERE l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ok JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // same three conjunctions, same cents sum
    "q_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 20
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 30
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,

    // same census chain, same 5·qty·n > 6·total integer boundary
    "q_excess_suppliers" ->
      """WITH sq AS MATERIALIZED (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%small%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey),
        |t AS (SELECT sum(sum_qty) AS tot_qty, count(*) AS n_supp FROM sq)
        |SELECT s_suppkey, s_name, n_name, sum_qty
        |FROM sq CROSS JOIN t
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE 5 * sum_qty * n_supp > 6 * tot_qty
        |ORDER BY s_suppkey""".stripMargin
  )
}
