package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer replacements for `round(sum|avg(x), k)` over columns that
  * carry exactly 2 decimal places — every money/qty/rate column in the
  * driver data does (max |x·100 − round(x·100)| ≤ 1e-9 per column, probed
  * across all tables).
  *
  * Margin-census rationale (r16): a plain-double money sum at corpus
  * magnitude S has reassociation drift up to n·eps·S, and 1e4 ulps of S
  * already exceeds the 2-dp rounding grain once S ≳ 1e12 grains — so the
  * PLANS.md §7u margin argument structurally cannot hold for corpus
  * totals (the census flagged q_agg_global/q_agg_group for exactly this;
  * the sibling sites here sat on the warn list with the same shape).
  * `round(x·100)` recovers the integer cents bit-exactly per row;
  * decimal(38,0) sums are order-free at any scale, parallelism, or AQE
  * re-plan; the one double division + final round are computed from the
  * same exact integer on both engines, so the oracle hash cannot drift.
  *
  * Every helper has a textual DuckDB twin the oracle SQL must mirror
  * (the twin keeps round(); the Spark side computes the same integer via
  * the floor device in [[centsL]] — value-identical on the 2-dp grid):
  *   sum2   → round(CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100, 2)
  *   avgK   → round(CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)
  *                  /CAST(count(x)*100 AS DOUBLE), k)
  *   sumDisc2 → round(CAST(sum(CAST(round(ep*100) AS BIGINT)
  *                  *(100 - CAST(round(disc*100) AS BIGINT))) AS DOUBLE)
  *                  /10000, 2)
  */
object ExactMoney {
  import graft.functions.SumCents

  /** Integer hundredths of a 2-dp column as a LONG, exact per row
    * (null-safe), equal VALUE FOR VALUE to the DuckDB twin's
    * CAST(round(x*100) AS BIGINT): on the 2-dp grid x·100 lands within
    * ~1e-9 of an integer n, and floor(n + 0.5 ± 1e-9) = n for every n
    * including negatives — exactly what HALF_UP rounding returns there.
    * floor instead of round because Spark's Round on a DOUBLE routes
    * through java BigDecimal PER ROW (measured r16, 6M-row q_agg_global
    * shape: round-fed 0.63 s vs floor-fed 0.40 s — the floor form beats
    * even the r15 plain-double query), while floor is one libm call and
    * already yields LongType. The long representation is what keeps
    * [[graft.functions.SumCents]] on its all-long fast path. */
  def centsL(c: Column): Column =
    floor(c * 100 + lit(0.5))

  /** Long→decimal per-row cents — retained for call sites that feed a
    * plain `sum()` (e.g. inside struct-packed multi-aggregates). */
  def cents(c: Column): Column =
    centsL(c).cast("decimal(38,0)")

  /** order-free `round(sum(x), 2)` for a 2-dp column. */
  def sum2(c: Column): Column =
    round(SumCents.sum(centsL(c)).cast("double") / 100, 2)

  /** order-free `round(avg(x), k)` for a 2-dp column; `count(c)` matches
    * avg's null semantics. */
  def avgK(c: Column, k: Int): Column =
    round(SumCents.sum(centsL(c)).cast("double") /
      (count(c) * lit(100L)).cast("double"), k)

  /** order-free `round(sum(ep·(1−disc)), 2)` for 2-dp price × 2-dp rate:
    * per-row product in exact 1e-4 units (long, ≤ ~1.3e9), exact sum. */
  def sumDisc2(ep: Column, disc: Column): Column =
    round(SumCents.sum(centsL(ep) * (lit(100L) - centsL(disc)))
      .cast("double") / 10000, 2)
}
