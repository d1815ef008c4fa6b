package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-2 breadth: the rest of the SQL surface a DataFusion user would
  * reach for, expressed Spark-first with DuckDB oracles. Everything here is
  * a Spark built-in (SURVEY §2.5/§7.3: no custom code needed) — the work is
  * exact cross-engine semantics: type widths, null ordering, tie-breaking,
  * float determinism.
  *
  * Scale notes are per-query; the common rules: aggregates are partial
  * (map-side) before any shuffle, small dimensions broadcast, window
  * functions partition by high-cardinality keys (one shuffle, no sort of
  * the whole table), and nothing collects to the driver.
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def part(s: SparkSession, d: String) = Tables(s, d, "part")
  private def nation(s: SparkSession, d: String) = Tables(s, d, "nation")
  private def region(s: SparkSession, d: String) = Tables(s, d, "region")
  private def events(s: SparkSession, d: String) = Tables(s, d, "events")
  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Fuzzy self-join (entity resolution): candidate pairs via blocking on
    * (p_brand, p_size) EXTENDED with a DELETION-NEIGHBORHOOD content key —
    * for every token slot i, the key (slot i, name with token i removed).
    * Two names that agree on every token except one share the key for the
    * differing slot, so candidate recall is EXACT (not probabilistic) for
    * pairs differing in at most one token — which is what Levenshtein ≤ 3
    * over short multi-token entity names produces (measured: all 106 true
    * pairs at sf0.01 differ in ≤1 token; a trigram-MinHash band here
    * recalled only 76% because edit distance 3 on ~10-char names drops
    * trigram-Jaccard to ~0.25). This is the deletion-neighborhood /
    * segment-pigeonhole blocking family (Pass-Join, Ji et al.), the
    * token-granular instance.
    *
    * The catalog key alone is CATALOG-granular: at 100× parts a popular
    * (brand, size) block is O(catalog) and within-block pair generation
    * quadratic. The residual key is CONTENT-granular — parts only co-bucket
    * when brand, size, slot count and all-but-one token agree — and
    * [[DedupOps.cappedBuckets]] caps the residual hot bucket (e.g. a
    * corpus-wide common token with every other token deleted) BEFORE its
    * aggregation buffer fills, so worst-case pairs are cap²/2 per bucket
    * regardless of skew (stress-proven on 10k same-brand/same-size parts in
    * TextDedupSpec). Verification joins shuffle on the fine part key; both
    * engines implement classic unbounded Levenshtein so the threshold
    * filter is value-exact, and the blocking replicates bit-for-bit in
    * DuckDB (string split + list slicing).
    */
  def fuzzyPairs(parts: DataFrame): DataFrame = {
    val p = parts.select(col("p_partkey"), col("p_name"), col("p_brand"),
      col("p_size"), split(col("p_name"), " ").as("words"))
      .persistTracked()
    val banded = p
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("words"),
        posexplode(col("words")).as(Seq("slot", "_w")))
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("slot"),
        array_join(filter(col("words"),
          (_, i) => i =!= col("slot")), " ").as("residual"))
    val cand = DedupOps.cappedBuckets(
        banded, "p_partkey", "p_brand", "p_size", "slot", "residual")
      .select(explode(DedupOps.pairsFromBucket(col("bucket"))).as("pr"))
      .select(col("pr.doc_a").as("key_a"), col("pr.doc_b").as("key_b"))
      .distinct() // a pair can collide in several slots (equal names do)
    val a = p.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    cand.join(a, "key_a").join(b, "key_b")
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 3)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("lev"))
      .orderBy("key_a", "key_b")
  }

  val queries: Map[String, Q] = Map(
    // ---- CUBE with grouping id (beyond reference's agg surface) ----
    "q_cube" -> ((s, d) =>
      li(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          ExactMoney.sum2(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // ---- GROUPING SETS via the SQL front-end ----
    "q_grouping_sets" -> ((s, d) => {
      li(s, d).createOrReplaceTempView("lineitem")
      // floor(x*100 + 0.5) = the oracle's round(x*100) on the 2-dp grid
      // (ExactMoney.centsL rationale — Spark's Round on a double is a
      // per-row BigDecimal; measured 0.47→0.29 s at sf0.1)
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |       round(CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)
          |                          AS BIGINT))
          |                  AS DOUBLE)/100, 2) AS sum_price
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // ---- PIVOT (explicit value list → no extra distinct pass over the data) ----
    "q_pivot" -> ((s, d) =>
      li(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(ExactMoney.sum2(col("l_quantity")))
        .orderBy("l_linestatus")),

    // ---- exact percentiles (interpolated). ONE array-percentile agg: four
    //      separate percentile() calls each maintain their own per-partition
    //      counts map over the same column — 4× the buffer build and merge
    //      (measured 3.6s → the array form shares one buffer) ----
    "q_percentile" -> ((s, d) =>
      ord(s, d)
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D))")
          .as("ps"))
        .select(round(element_at(col("ps"), 1), 2).as("p25"),
          round(element_at(col("ps"), 2), 2).as("p50"),
          round(element_at(col("ps"), 3), 2).as("p75"),
          round(element_at(col("ps"), 4), 2).as("p99"))),

    // ---- moment aggregates: stddev/variance/corr/covar ----
    "q_stats_agg" -> ((s, d) =>
      cust(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
          round(var_samp(col("c_acctbal")), 4).as("var_bal"),
          round(corr(col("c_acctbal"), col("c_nationkey").cast("double")), 6).as("corr_bal_nat"),
          round(covar_samp(col("c_acctbal"), col("c_nationkey").cast("double")), 4).as("cov_bal_nat"))
        .orderBy("c_mktsegment")),

    // ---- date/time function matrix (ISO strings for physical-type parity) ----
    "q_datetime" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        datediff(to_date(lit("1998-12-31")), col("o_orderdate").cast("date")).as("days_to_end"))
        .orderBy("o_orderkey")),

    // ---- string function matrix #2 ----
    "q_string_fns2" -> ((s, d) =>
      part(s, d).select(col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_type"), 24, ".").as("rpadded"),
        reverse(col("p_name")).as("rev_name"),
        repeat(col("p_brand"), 2).as("brand2"),
        split_part(col("p_type"), lit(" "), lit(2)).as("type_word2"),
        instr(col("p_name"), "ol").as("pos_ol"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        substring(col("p_name"), 1, 3).as("left3"))
        .orderBy("p_partkey")),

    // ---- map/struct function matrix: construction + key/value access +
    //      field extraction, reduced to scalar columns. The oracle derives
    //      each output algebraically from the same base columns (the
    //      q_url_parse inverse-check pattern), proving Spark's map/struct
    //      semantics invert their construction exactly ----
    "q_map_fns" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        map(lit("lang"), col("lang"), lit("src"), col("source")).as("m"),
        struct(col("n_chars").as("nc"), col("lang").as("lg")).as("st"))
        .select(col("doc_id"),
          element_at(col("m"), "lang").as("m_lang"),
          size(col("m")).as("m_size"),
          concat_ws(",", map_keys(col("m"))).as("m_keys"),
          concat_ws(",", map_values(col("m"))).as("m_vals"),
          col("st.nc").as("st_nc"),
          col("st.lg").as("st_lg"))
        .orderBy("doc_id")),

    // ---- word count: the canonical explode → aggregate pipeline ----
    "q_wordcount" -> ((s, d) =>
      docs(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(50)),

    // ---- BPE merge-pair induction (the tokenizer-training primitive):
    //      count adjacent character pairs WITHIN words, rank the top merge
    //      candidates — one round of byte-pair-encoding vocabulary
    //      induction. The pair key space is alphabet²-tiny with a Zipf-hot
    //      head ('th', 'in', …), which is safe as a shuffle key ONLY
    //      because the aggregation is map-side combined — partials absorb
    //      the hot pair before the exchange; the ranking is a constant-row
    //      TakeOrderedAndProject heap, so corpus size never moves more
    //      than alphabet² rows ----
    "q_bpe_pairs" -> ((s, d) =>
      docs(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)),

    // ---- deterministic hash sampling (reservoir-free, cluster-stable) ----
    "q_sample_hash" -> ((s, d) =>
      ord(s, d)
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) <= "28")
        .agg(count(lit(1)).as("n_sampled"),
          ExactMoney.sum2(col("o_totalprice")).as("sum_sampled"),
          ExactMoney.avgK(col("o_totalprice"), 4).as("avg_sampled"))),

    // ---- as-of join: each click matched to the latest prior-or-equal
    //      purchase of the same user. Spark-first shape: union + running
    //      last_value — ONE shuffle on user_id, no join, no range explosion;
    //      at 100 TB this beats any O(n·m) inequality join ----
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"), unix_timestamp(col("ts")).as("secs"))
      // dedupe purchases to one row per (user, second) so the as-of pick is
      // well-defined under ties (same rule as the oracle's ASOF <=)
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("secs"))
        .agg(max(col("value")).as("pval"))
        .select(col("user_id"), lit(0).as("kind"), lit(null).cast("long").as("event_id"),
          col("secs"), col("secs").as("psec"), col("pval"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), lit(1).as("kind"), col("event_id"),
          col("secs"), lit(null).cast("long").as("psec"), lit(null).cast("double").as("pval"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("secs").asc, col("kind").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // one struct-valued last(): psec and pval always come from the SAME
      // purchase row (two independent last(ignoreNulls) calls could pair a
      // newer psec with an older pval if a purchase value were NULL)
      purch.unionByName(clicks)
        .withColumn("lp", last(
          when(col("kind") === 0, struct(col("psec"), col("pval"))),
          ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("secs"),
          col("lp.psec").as("last_purch_s"), col("lp.pval").as("last_purch_val"),
          (col("secs") - col("lp.psec")).as("gap_s"))
        .orderBy("event_id")
    }),

    // ---- band join (|Δvalue| ≤ ε): same-priority order pairs within
    //      $25 of each other — the value-distance sibling of q_asof_join
    //      (time) and q_spatial_join (2D). A naive theta join is O(n²)
    //      per priority; bucketing prices into ε-wide cells guarantees
    //      every qualifying pair sits within ±1 bucket, so candidates
    //      come from ONE equi-join on (priority, bucket) with the probe
    //      side exploded 3× and the build side untouched — the 1D grid
    //      recipe. Each ordered pair matches exactly once (the build row
    //      occupies exactly one of the probe's three cells). Prices ride
    //      as integer cents end-to-end; bucket population is
    //      density-bounded (rows per ε of price), never key-skewed ----
    "q_band_join" -> ((s, d) => {
      val o = ord(s, d).select(col("o_orderkey").as("okey"),
        col("o_orderpriority").as("prio"),
        ExactMoney.centsL(col("o_totalprice")).as("cents"))
      val right = o.select(col("prio"), col("okey").as("b_key"),
        col("cents").as("b_cents"), expr("cents div 2500").as("bkt"))
      val probes = o
        .crossJoin(broadcast(s.range(-1, 2).toDF("db")))
        .select(col("prio"), col("okey").as("a_key"),
          col("cents").as("a_cents"),
          (expr("cents div 2500") + col("db")).as("bkt"))
      probes.join(right, Seq("prio", "bkt"))
        .filter(col("a_key") < col("b_key"))
        .select(col("prio"),
          abs(col("a_cents") - col("b_cents")).as("gap"))
        .filter(col("gap") <= 2500)
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("gap")).as("min_gap_cents"),
          max(col("gap")).as("max_gap_cents"),
          sum(col("gap")).as("sum_gap_cents"))
        .withColumn("avg_gap_cents", expr("sum_gap_cents div n_pairs"))
        .orderBy("prio")
    }),

    // ---- full outer join (nulls on both sides) ----
    "q_join_full" -> ((s, d) => {
      val n = nation(s, d).filter(col("n_nationkey") < 20)
        .select(col("n_nationkey"), col("n_name"))
      val c = cust(s, d).filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_rich"))
      n.join(c, col("n_nationkey") === col("c_nationkey"), "full")
        .select(coalesce(col("n_nationkey"), col("c_nationkey")).as("key"),
          col("n_name"), col("n_rich"))
        .orderBy("key")
    }),

    // ---- cross join (tiny × tiny — broadcast nested loop) ----
    "q_cross" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select(concat(col("r_name"), lit("/"), col("n_name")).as("pair"))
        .orderBy("pair")),

    // ---- scalar subquery: compare each row to a global aggregate ----
    "q_scalar_subq" -> ((s, d) => {
      val avgAll = ord(s, d).agg(avg(col("o_totalprice")).as("avg_all"))
      ord(s, d).crossJoin(broadcast(avgAll))
        .filter(col("o_totalprice") > col("avg_all") * 1.5)
        .select(col("o_orderkey"),
          round(col("o_totalprice") / col("avg_all"), 6).as("ratio"))
        .orderBy("o_orderkey")
    }),

    // ---- multiset set-ops (bag semantics — duplicates preserved) ----
    "q_except_all" -> ((s, d) =>
      li(s, d).select(col("l_suppkey").as("key"))
        .exceptAll(ord(s, d).select(col("o_custkey").as("key")))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
        .orderBy("key")),

    "q_intersect_all" -> ((s, d) =>
      li(s, d).select(col("l_suppkey").as("key"))
        .intersectAll(ord(s, d).select(col("o_custkey").as("key")))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
        .orderBy("key")),

    // ---- correlated scalar subquery via the SQL front-end: each order
    //      compared to ITS customer's average (decorrelates to an
    //      aggregate + join in Catalyst) ----
    "q_corr_subq" -> ((s, d) => {
      ord(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderkey,
          |       round(o_totalprice / (SELECT avg(o2.o_totalprice) FROM orders o2
          |                             WHERE o2.o_custkey = o1.o_custkey), 6) AS vs_cust_avg
          |FROM orders o1
          |WHERE o_totalprice > 400000
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ---- UNION ALL with provenance tag ----
    "q_union_all" -> ((s, d) =>
      cust(s, d).filter(col("c_acctbal") > 9900)
        .select(col("c_custkey").as("key"), lit("cust").as("src"))
        .unionByName(ord(s, d).filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("key"), lit("order").as("src")))
        .orderBy("key", "src")),

    // ---- window matrix: lag/lead/first_value/ntile ----
    "q_window_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      ord(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(w).as("first_price"),
        ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- distribution window functions: percent_rank / cume_dist /
    //      nth_value. Window ordering ends in the unique key so ranks are
    //      identical across engines even where prices tie ----
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      ord(s, d).select(col("o_orderpriority"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"),
        nth_value(col("o_orderkey"), 3).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("third_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // ---- conditional aggregation (FILTER-style, via CASE for parity) ----
    "q_agg_filtered" -> ((s, d) =>
      cust(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_acctbal") > 5000, 1).otherwise(0)).as("n_rich"),
          ExactMoney.sum2(when(col("c_acctbal") > 5000, col("c_acctbal"))
            .otherwise(0.0)).as("rich_bal"),
          max(when(col("c_nationkey") < 5, col("c_acctbal"))).as("max_lownat"))
        .orderBy("c_mktsegment")),

    // ---- set-valued aggregation rendered as a string (array_agg analog) ----
    "q_array_agg" -> ((s, d) =>
      cust(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(array_join(array_sort(collect_set(col("c_nationkey"))), ",").as("nations"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy("c_mktsegment")),

    // ---- bitwise operator matrix ----
    "q_bitwise" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("bor"),
        col("o_orderkey").bitwiseXOR(lit(1234L)).as("bxor"),
        shiftleft(col("o_orderkey") % 16, 3).as("shl"),
        shiftright(col("o_orderkey"), 4).as("shr"))
        .orderBy("o_orderkey")),

    // ---- null-handling functions over the nullable props column ----
    "q_null_fns" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        coalesce(col("props"), lit("none")).as("props_or_none"),
        nullif(col("event_type"), lit("click")).as("type_nonclick"),
        when(col("props").isNull, 1).otherwise(0).as("is_null_flag"))
        .orderBy("event_id")),

    // ---- salted join: the skew-handling physical rewrite. Results are
    //      IDENTICAL to a plain join (the oracle IS the plain join) — only
    //      the shuffle layout changes: a hot orderkey's lineitems spread
    //      over 8 sub-partitions instead of one reducer ----
    "q_join_salted" -> ((s, d) =>
      graft.operators.Skew.saltedJoin(
          ord(s, d), cust(s, d), "o_custkey", "c_custkey",
          spread = col("o_orderkey"), salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          ExactMoney.sum2(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")),

    // ---- skew-profiled join: Skew.autoJoin profiles the fact key, then
    //      CHOOSES plain / AQE / salted (q_skew_report's numbers driving an
    //      actual decision). The fixture's o_custkey skew is ~2.5, so this
    //      resolves to the plain declarative join; SkewSpec proves the
    //      choice flips to salted on pathological keys with identical
    //      results either way ----
    "q_join_auto" -> ((s, d) =>
      graft.operators.Skew.autoJoin(
          ord(s, d), cust(s, d), "o_custkey", "c_custkey",
          spread = col("o_orderkey"), salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          ExactMoney.sum2(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")),

    // ---- six-table star join (TPC-H Q5 shape): revenue by supplier nation
    //      for one region, customer and supplier in the SAME nation. The
    //      declarative form leaves join ORDER to Catalyst/AQE: dims (region→
    //      nation→supplier) reduce before touching the facts, dim sides
    //      broadcast from size stats, and the lineitem⋈orders fact join
    //      keys on l_orderkey — at 100 TB the same plan holds with the fact
    //      join shuffled and every dim still broadcast ----
    "q_join_star" -> ((s, d) =>
      li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE" &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(ExactMoney.sumDisc2(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name").asc)),

    // ---- market share (TPC-H Q8 shape): each supplier nation's share of
    //      a customer region's yearly revenue, in basis points. Same
    //      dims-broadcast / facts-shuffled star as q_join_star plus the
    //      share dimension: revenue rides as BIGINT cents (exact sums,
    //      deterministic across engines), the share divides the census —
    //      (year × region × nation) rows, never fact rows — inside a
    //      window over the SAME (year, region) partition the groupBy
    //      already produced ----
    "q_market_share" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val j = li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey").as("cn_key"),
            col("n_regionkey").as("cr_key"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(region(s, d)),
          col("cr_key") === col("r_regionkey"))
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
      val w = Window.partitionBy(col("year"), col("cust_region"))
      j.groupBy(year(col("o_orderdate")).cast("long").as("year"),
          col("r_name").as("cust_region"), col("supp_nation"))
        .agg(sum(cents).as("rev_cents"))
        .withColumn("region_total", sum(col("rev_cents")).over(w))
        .select(col("year"), col("cust_region"), col("supp_nation"),
          col("rev_cents"),
          expr("(rev_cents * 10000) div region_total").as("share_bp"))
        .orderBy("year", "cust_region", "supp_nation")
    }),

    // ---- supply concentration (Herfindahl index) per brand —
    //      q_market_share's structure metric: how concentrated is each
    //      brand's supply across suppliers? Shares in bp by integer floor
    //      division, HHI = Σ share_bp² div 10000 (0..10000, deterministic
    //      integers end to end). One fact shuffle onto the fine
    //      (brand, supplier) key, the HHI reduction runs on the census ----
    "q_hhi_concentration" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val bySupp = li(s, d)
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(sum(cents).as("cents"))
      val w = Window.partitionBy(col("p_brand"))
      bySupp
        .withColumn("total_cents", sum(col("cents")).over(w))
        .withColumn("share_bp", expr("(cents * 10000) div total_cents"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_suppliers"),
          max(col("total_cents")).as("total_cents"),
          max(col("share_bp")).as("top_share_bp"),
          expr("sum(share_bp * share_bp) div 10000").as("hhi"))
        .orderBy("p_brand")
    }),

    // ---- fuzzy self-join (entity resolution): see [[fuzzyPairs]] ----
    "q_fuzzy_join" -> ((s, d) => fuzzyPairs(part(s, d))),

    // ---- custom typed Aggregator (UDAF): price per unit, quantity-weighted.
    //      16-byte buffer per group, map-side partials — same shuffle cost
    //      as a built-in aggregate ----
    "q_agg_udaf" -> ((s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(graft.functions.Aggregators.weightedMean(
            col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // ---- JSON extraction from the semi-structured props column ----
    "q_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // ---- GROUP BY a boolean key (golden csv_aggregate_by_c_bool shape) ----
    "q_agg_groupbool" -> ((s, d) =>
      li(s, d)
        .groupBy((col("l_returnflag") === "R").as("is_returned"))
        .agg(count(lit(1)).as("n"),
          ExactMoney.sum2(col("l_quantity")).as("sum_qty"))
        .orderBy("is_returned")),

    // ---- IN-subquery through the SQL front-end (plans as a semi join) ----
    "q_in_subquery" -> ((s, d) => {
      ord(s, d).createOrReplaceTempView("orders")
      cust(s, d).createOrReplaceTempView("customer")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ---- correlated EXISTS / NOT EXISTS (plan as semi/anti joins — no
    //      per-row subquery execution) ----
    "q_exists_subquery" -> ((s, d) => {
      ord(s, d).createOrReplaceTempView("orders")
      cust(s, d).createOrReplaceTempView("customer")
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          |       EXISTS (SELECT 1 FROM orders o
          |               WHERE o.o_custkey = c.c_custkey
          |                 AND o.o_totalprice > 150000) AS has_big_order
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // ---- single-pass data profiling (the describe/summarize analog a
    //      pipeline runs before trusting a new table): row count, null
    //      counts, distinct cardinalities, id range — one aggregate, all
    //      BIGINT-exact ----
    "q_profile" -> ((s, d) =>
      events(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("props_nulls"),
        countDistinct(col("user_id")).as("users_distinct"),
        countDistinct(col("event_type")).as("types_distinct"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))),

    // ---- arg-max/arg-min (max_by/min_by): which order, not just what
    //      price. Tie-proofing via a STRUCT ordering key forces
    //      SortAggregate (struct buffers aren't hash-mutable — measured a
    //      full per-partition sort, 2.6s). Instead ties are reduced away
    //      first with a fine-grained (priority, price) hash agg, so
    //      max_by/min_by order on a plain DOUBLE — both stages stay
    //      whole-stage-codegen HashAggregates, one scan, zero sorts ----
    "q_minmax_by" -> ((s, d) =>
      ord(s, d)
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(max(col("o_orderkey")).as("k_hi"), min(col("o_orderkey")).as("k_lo"))
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("k_hi"), col("o_totalprice")).as("top_order"),
          round(max(col("o_totalprice")), 2).as("top_price"),
          min_by(col("k_lo"), col("o_totalprice")).as("low_order"),
          round(min(col("o_totalprice")), 2).as("low_price"))
        .orderBy("o_orderpriority")),

    // ---- UNPIVOT (wide measures → long rows; `stack` is codegen'd, no
    //      shuffle beyond the aggregation that feeds it) ----
    "q_unpivot" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"),
          round(sum(col("l_tax")), 2).as("tax"))
        .select(col("l_returnflag"),
          expr("stack(3, 'qty', qty, 'price', price, 'tax', tax) AS (measure, value)"))
        .orderBy("l_returnflag", "measure")),

    // ---- approximate distinct (HLL): the 100 TB cardinality path. The raw
    //      sketch value is engine-specific, so the query outputs the
    //      oracle-able EXACT count plus a boolean asserting the HLL estimate
    //      lands within 5% of it (rsd=0.02: measured error is ~1% at sf0.001
    //      /0.01/0.1 and the estimate is deterministic for fixed data, so
    //      the bound has 5× headroom; rsd below 0.01 blows the sketch buffer
    //      up ~20× for nothing — benched 0.5 s → 11 s); the oracle's `true`
    //      literal makes the whole row value-exact. RelationalSpec
    //      additionally bounds the raw estimate itself ----
    "q_agg_approx" -> ((s, d) =>
      li(s, d).agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) /
            col("exact_parts") <= 0.05).as("approx_ok"))),

    // ---- grouped HLL, oracle-gated: per-group exact count plus a boolean
    //      asserting the sketch estimate lands within 5% of it (the same
    //      bound-flag reduction that gates q_agg_approx — the raw HLL value
    //      is engine-specific, the flag is value-exact). The exact anchor
    //      makes this plan ~2× the sketch alone, so the PRODUCTION
    //      sketch-only plan is benched separately as benchOnly("q_hll_only")
    //      and RelationalSpec bounds its raw estimates directly ----
    "q_hll_sketch" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) /
            col("exact_parts") <= 0.05).as("approx_ok"))
        .orderBy("l_returnflag")),

    // ---- HLL sketch ROLLUP: materialized re-aggregatable sketches (the
    //      Apache DataSketches HLL surface, binary-column sketches) —
    //      distinct parts are sketched once at the FINE grain
    //      (l_returnflag, l_linestatus), then the coarse per-flag count
    //      comes from hll_union_agg over the 6 fine sketches WITHOUT
    //      rescanning the fact table. That is the 100 TB cube pattern:
    //      sketch per partition/cell, persist the binary column, answer
    //      any coarser distinct-count by unioning cells (register-max
    //      merge — associative, commutative, lossless at equal lgK).
    //      Gate: per-flag exact anchor + a flag that the rolled-up
    //      estimate lands within 5% (lgK=12 ⇒ σ≈1.6%, so 5% ≈ 3σ on a
    //      fixed-hash deterministic draw — the q_hll_sketch device) ----
    "q_hll_rollup" -> ((s, d) => {
      val fine = li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
      val coarse = fine.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("rollup_est"))
      val exact = li(s, d).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.join(broadcast(coarse), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("rollup_est") - col("exact_parts")) /
            col("exact_parts") <= 0.05).as("rollup_ok"))
        .orderBy("l_returnflag")
    }),

    // ---- HLL sketch SET ALGEBRA: audience-overlap estimation by
    //      inclusion-exclusion — |A∩B| ≈ est(A) + est(B) − est(A∪B),
    //      where est(A∪B) comes from hll_union over the two sketches.
    //      The 100 TB shape: per-segment sketches are built once (one
    //      grouped pass), then ANY pairwise overlap question is answered
    //      from the sketches alone — no re-scan, no distinct-intersect
    //      shuffle of the fact table. Gate: exact intersect anchor +
    //      a 10% flag (the union error dominates; at gate scale the
    //      sketches are in exact sparse mode, at bench scale ~3σ) ----
    "q_hll_intersect" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      val ests = o.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
        .agg(sum(hll_sketch_estimate(col("sk"))).as("sum_est"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"))
      val ua = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      val ub = o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_custkey")).distinct()
      ua.intersect(ub).agg(count(lit(1)).as("exact_overlap"))
        .crossJoin(broadcast(ests))
        .select(col("exact_overlap"),
          (abs(col("sum_est") - col("est_union") - col("exact_overlap")) <=
            lit(0.10) * col("exact_overlap")).as("overlap_ok"))
    }),

    // ---- sketch set DIFFERENCE: |A \ B| ≈ est(A∪B) − est(B), closing
    //      the HLL algebra (rollup = union, intersect, now difference) —
    //      "how many customers does segment A reach that B doesn't",
    //      answered from the two persisted segment sketches with no
    //      EXCEPT shuffle of the fact table. Same gate device: exact
    //      EXCEPT anchor + accuracy flag ----
    "q_hll_diff" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      val ests = o.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"),
          hll_sketch_estimate(
            max_by(col("sk"), col("o_orderpriority") === "2-HIGH"))
            .as("est_b"))
      val ua = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      val ub = o.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_custkey")).distinct()
      ua.exceptAll(ub).agg(count(lit(1)).as("exact_diff"))
        .crossJoin(broadcast(ests))
        .select(col("exact_diff"),
          (abs(col("est_union") - col("est_b") - col("exact_diff")) <=
            lit(0.15) * col("exact_diff")).as("diff_ok"))
    }),

    // ---- top supplier by quarterly revenue (TPC-H Q15 shape, the view +
    //      max-equality form): revenue per supplier over one quarter, then
    //      every supplier achieving the maximum. Window-free: the quarter
    //      filter prunes at the scan, one fine-key agg builds the revenue
    //      census, the max rides back as a 1-ROW broadcast crossJoin and
    //      the equality filter runs on the census — cents-exact integers,
    //      so cross-engine max equality is bit-safe (a double-revenue
    //      formulation would tie-break on summation dust). Supplier dim
    //      broadcasts. At 100 TB: one shuffle on s_suppkey, census-sized
    //      everything after ----
    "q_top_supplier" -> ((s, d) => {
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val rev = li(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey")).agg(sum(cents).as("rev_cents"))
      val mx = rev.agg(max(col("rev_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_cents") === col("mx"))
        .join(broadcast(Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
        .orderBy("s_suppkey")
    }),

    // ---- cheapest supplier per part (TPC-H Q2's correlated-min shape,
    //      argmin form): for each part, the supplier whose lineitem MIN
    //      price is lowest (ties → lowest suppkey). Two chained fine-key
    //      aggregations, both map-side combinable; the per-part argmin is
    //      min(struct(price, suppkey)) — the same struct-ordering argmin
    //      device as the IVF assignment, NO window, NO per-part sort. MIN
    //      over raw doubles is order-independent, so the value is
    //      bit-identical across engines with no rounding. Q2's correlated
    //      subquery (price = (SELECT min ...)) decorrelates to exactly
    //      this aggregate + argmin ----
    "q_cheapest_supplier" -> ((s, d) =>
      li(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("minp"))
        .groupBy(col("l_partkey"))
        .agg(min(struct(col("minp"), col("l_suppkey"))).as("b"),
          count(lit(1)).as("n_suppliers"))
        .select(col("l_partkey").as("p_partkey"),
          col("b.l_suppkey").as("best_supp"),
          col("b.minp").as("best_price"), col("n_suppliers"))
        .orderBy("p_partkey")),

    // ---- promo revenue share per month (TPC-H Q14 shape): the share of
    //      monthly revenue from PROMO-type parts, in basis points by the
    //      cents discipline (sum cents exactly, integer floor division —
    //      no double division at the boundary). Part flags broadcast as a
    //      2-column pruned dim; one fact shuffle onto the month census ----
    "q_promo_share" -> ((s, d) => {
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      li(s, d)
        .join(broadcast(part(s, d)
          .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate").cast("date"), "yyyy-MM")
          .as("month"))
        .agg(sum(when(col("promo"), cents).otherwise(0L)).as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("month"), col("promo_cents"), col("total_cents"),
          expr("(promo_cents * 10000) div total_cents").as("promo_bp"))
        .orderBy("month")
    }),

    // ---- small-quantity revenue per brand (TPC-H Q17's correlated-avg
    //      shape, decorrelated): revenue from lineitems whose quantity is
    //      below 20% of their part's average. The correlated scalar
    //      subquery (SELECT 0.2*avg(l_quantity) WHERE l_partkey = ...)
    //      decorrelates to ONE per-part census (sum_qty, n) that joins
    //      back onto the fact scan; the boundary is the all-integer
    //      cross-multiplication 5·qty·n < sum_qty — no 0.2·avg double at
    //      the cut, so the qualifying set is bit-identical cross-engine.
    //      At 100 TB: the census is part-cardinality (tiny vs the fact) →
    //      broadcast back; the only corpus shuffle is the census agg
    //      itself, map-side combinable ----
    "q_small_qty_revenue" -> ((s, d) => {
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val census = li(s, d).groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
      li(s, d)
        .join(broadcast(census), col("l_partkey") === col("pk"))
        .filter(expr("5 * cast(l_quantity as bigint) * n_lines < sum_qty"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_small"), sum(cents).as("rev_cents"))
        .orderBy("p_brand")
    }),

    // ---- large-volume orders (TPC-H Q18 shape): orders whose total
    //      quantity exceeds 150, with customer attribution. The HAVING-IN
    //      subquery decorrelates to a per-order quantity census that is
    //      ITSELF the probe side: filter the census (2.9k rows at sf0.01,
    //      ~0.02% of orders at any SF), then join orders + customer onto
    //      the survivors — the fact table is touched once, and both
    //      dimension joins run on the filtered census, not the raw fact.
    //      Integer quantities end to end ----
    "q_large_orders" -> ((s, d) => {
      val oq = li(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 150L)
      oq.join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust(s, d).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy("o_orderkey")
    }),

    // ---- waiting suppliers (TPC-H Q21's multi-EXISTS shape, adapted to
    //      this schema's dates): on finished orders with >1 supplier,
    //      suppliers who were the ONLY one to ship >60 days after the
    //      order date. The EXISTS (another supplier) / NOT EXISTS (another
    //      LATE supplier) pair decorrelates into one per-(order, supplier)
    //      lateness census and one per-order census carrying n_suppliers,
    //      n_late, and the unique late suppkey via max(CASE) — zero
    //      re-probes of the fact, no anti-join against the corpus. The
    //      explicit repartition on l_orderkey makes BOTH chained aggs
    //      exchange-free (a subset partitioning satisfies the
    //      (l_orderkey, l_suppkey) clustering too): ONE fact-sized
    //      exchange end to end instead of two agg exchanges, plan-asserted.
    //      Supplier dim broadcast; ~4 lines/order so the single-key
    //      partitioning carries no skew ----
    "q_waiting_suppliers" -> ((s, d) => {
      val l2 = li(s, d)
        .join(ord(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate") >
          col("o_orderdate") + expr("interval 60 days")).as("late"))
      val oc = l2.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1L && col("n_late") === 1L)
      oc.groupBy(col("late_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("late_supp") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy("s_suppkey")
    }),

    // ---- high-balance dormant segments (TPC-H Q22 shape, adapted: every
    //      customer here HAS orders, so the anti-join target is URGENT
    //      orders): per market segment, customers whose balance beats the
    //      positive-balance average and who never placed a 1-URGENT order.
    //      The scalar subquery is a 1-row broadcast; the boundary is the
    //      integer cross-multiplication cents·n > sum_cents (no avg double
    //      at the cut); the NOT EXISTS is a left-anti join against the
    //      DISTINCT urgent-customer census, never the raw orders. At
    //      100 TB: customer exchanges once onto the census key; orders is
    //      scanned once, pre-shrunk by the priority filter ----
    // ---- nation-pair trade volume (TPC-H Q7 shape): yearly revenue
    //      between supplier-nation and customer-nation pairs, for two
    //      nations in both directions. The interesting plan property is
    //      the TWO-ROLE dimension: nation joins the fact twice under
    //      different roles (supplier side via supplier, customer side via
    //      orders→customer) — both role chains fold to broadcast maps, so
    //      the fact is scanned once and shuffles only onto the final
    //      (supp_nation, cust_nation, year) census grain. Cents-exact ----
    "q_nation_trade" -> ((s, d) => {
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val supNation = Tables(s, d, "supplier")
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custNation = cust(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val pair = (col("supp_nation") === "NATION_1" &&
        col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      li(s, d)
        .join(ord(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
        .filter(pair)
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(count(lit(1)).as("n_lines"), sum(cents).as("rev_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // ---- returned-item revenue (TPC-H Q10 shape): top-20 customers by
    //      revenue lost to returns in one quarter. Plan skeleton: the
    //      returnflag + date filters prune the fact AT THE SCAN, one
    //      fine-key customer census, customer/nation dims broadcast onto
    //      the census (never the fact), and the top-20 is a
    //      TakeOrderedAndProject HEAP on (rev_cents DESC, custkey ASC) —
    //      cents-exact, so the cut is a total order and the boundary row
    //      is deterministic cross-engine; no global sort ----
    "q_returned_revenue" -> ((s, d) => {
      val cents = expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
      val rev = li(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-07-01")))
        .join(ord(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(cents).as("rev_cents"))
      rev
        .join(broadcast(cust(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("rev_cents"))
        .orderBy(col("rev_cents").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- priority lateness census (TPC-H Q12's two-bucket CASE shape,
    //      on this schema's dates): per order priority, lineitems shipped
    //      more vs no more than 90 days after the order date. ONE join,
    //      one alphabet-grain census, integer CASE sums — Q12's exact
    //      plan skeleton (fact ⋈ orders, two conditional counts per
    //      group). At 100 TB the priority alphabet makes the post-combine
    //      shuffle rows-per-partition trivial ----
    "q_priority_lateness" -> ((s, d) => {
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("interval 90 days")
      li(s, d)
        .join(ord(s, d).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(when(late, 1L).otherwise(0L)).as("n_late"),
          sum(when(late, 0L).otherwise(1L)).as("n_ontime"))
        .select(col("o_orderpriority"), col("n_late"), col("n_ontime"),
          expr("(n_late * 10000) div (n_late + n_ontime)").as("late_bp"))
        .orderBy("o_orderpriority")
    }),

    "q_dormant_segments" -> ((s, d) => {
      val c = cust(s, d).select(col("c_custkey"), col("c_mktsegment"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("bal_cents"))
      val avgRow = c.filter(col("bal_cents") > 0L)
        .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
      val urgent = ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      c.crossJoin(broadcast(avgRow))
        .filter(expr("bal_cents * n_pos > sum_cents"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("tot_cents"))
        .orderBy("c_mktsegment")
    })
  )

  /** Timed by Bench, NOT oracle-verified: plans whose values are
    * engine-specific but whose COST is the production shape a 100 TB user
    * runs. The oracled [[queries]] twin carries the correctness gate.
    */
  val benchOnly: Map[String, Q] = Map(
    // HLL, production shape: ONLY the mergeable sketch — one map-side-
    // combined pass, no countDistinct expand+re-shuffle. q_hll_sketch is
    // the value gate; this keeps the perf gate honest (r5: 0.60s vs 1.1s).
    "q_hll_only" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")),

    // HLL rollup, production shape: fine-grain sketches unioned to the
    // coarse grain with NO exact anchor and no fact-table rescan — the
    // cost a 100 TB cube cell re-aggregation actually pays
    "q_hll_rollup_only" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
        .groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("rollup_est"))
        .orderBy("l_returnflag")),

    // sketch-algebra only: one grouped sketch pass + inclusion-exclusion,
    // no exact-intersect anchor (q_hll_intersect is the value gate)
    "q_hll_intersect_only" -> ((s, d) =>
      Tables(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
        .agg((sum(hll_sketch_estimate(col("sk"))) -
          hll_sketch_estimate(hll_union_agg(col("sk")))).as("est_overlap")))
  )

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |       round(CAST(sum(CASE WHEN l_returnflag = 'A'
        |                  THEN CAST(round(l_quantity*100) AS BIGINT) END)
        |                  AS DOUBLE)/100, 2) AS "A",
        |       round(CAST(sum(CASE WHEN l_returnflag = 'N'
        |                  THEN CAST(round(l_quantity*100) AS BIGINT) END)
        |                  AS DOUBLE)/100, 2) AS "N",
        |       round(CAST(sum(CASE WHEN l_returnflag = 'R'
        |                  THEN CAST(round(l_quantity*100) AS BIGINT) END)
        |                  AS DOUBLE)/100, 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_percentile" ->
      """SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |       round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders""".stripMargin,

    "q_stats_agg" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       round(stddev_samp(c_acctbal), 4) AS sd_bal,
        |       round(var_samp(c_acctbal), 4) AS var_bal,
        |       round(corr(c_acctbal, CAST(c_nationkey AS DOUBLE)), 6) AS corr_bal_nat,
        |       round(covar_samp(c_acctbal, CAST(c_nationkey AS DOUBLE)), 4) AS cov_bal_nat
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_datetime" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       CAST(day(o_orderdate) AS INTEGER) AS dom,
        |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER)
        |         AS days_to_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_string_fns2" ->
      """SELECT p_partkey,
        |       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        |       lpad(p_brand, 12, '*') AS lpadded,
        |       rpad(p_type, 24, '.') AS rpadded,
        |       reverse(p_name) AS rev_name,
        |       repeat(p_brand, 2) AS brand2,
        |       split_part(p_type, ' ', 2) AS type_word2,
        |       CAST(strpos(p_name, 'ol') AS INTEGER) AS pos_ol,
        |       translate(p_brand, '#', '-') AS brand_dash,
        |       substring(p_name, 1, 3) AS left3
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_map_fns" ->
      """SELECT doc_id,
        |       lang AS m_lang,
        |       CAST(2 AS INTEGER) AS m_size,
        |       'lang,src' AS m_keys,
        |       lang || ',' || source AS m_vals,
        |       n_chars AS st_nc,
        |       lang AS st_lg
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_wordcount" ->
      """SELECT t.token, count(*) AS cnt
        |FROM documents, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(token)
        |WHERE t.token <> ''
        |GROUP BY t.token ORDER BY cnt DESC, token ASC LIMIT 50""".stripMargin,

    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT t.w FROM documents,
        |       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(w)
        |  WHERE length(t.w) >= 2),
        |p0 AS (SELECT w, unnest(range(1, length(w))) AS i FROM w),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair FROM p0)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    "q_sample_hash" ->
      """SELECT count(*) AS n_sampled,
        |       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_sampled,
        |       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |                  AS DOUBLE)/CAST(count(o_totalprice)*100 AS DOUBLE), 4)
        |         AS avg_sampled
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '28'""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS secs
        |  FROM events),
        |p AS (SELECT user_id, secs AS psec, max(value) AS pval
        |      FROM ev WHERE event_type = 'purchase' GROUP BY user_id, secs),
        |c AS (SELECT user_id, event_id, secs FROM ev WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.secs,
        |       p.psec AS last_purch_s, p.pval AS last_purch_val,
        |       c.secs - p.psec AS gap_s
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND p.psec <= c.secs
        |ORDER BY event_id""".stripMargin,

    // the oracle IS the quadratic band definition — proving the ±1-bucket
    // candidate generation exhaustive
    "q_band_join" ->
      """WITH o AS (
        |  SELECT o_orderkey AS okey, o_orderpriority AS prio,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |pairs AS (
        |  SELECT a.prio, abs(a.cents - b.cents) AS gap
        |  FROM o a JOIN o b
        |    ON a.prio = b.prio AND a.okey < b.okey
        |   AND abs(a.cents - b.cents) <= 2500)
        |SELECT prio, count(*) AS n_pairs,
        |       min(gap) AS min_gap_cents, max(gap) AS max_gap_cents,
        |       CAST(sum(gap) AS BIGINT) AS sum_gap_cents,
        |       CAST(sum(gap) AS BIGINT) // count(*) AS avg_gap_cents
        |FROM pairs GROUP BY prio ORDER BY prio""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(n_nationkey, c_nationkey) AS key, n_name, n_rich
        |FROM (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) n
        |FULL JOIN (SELECT c_nationkey, count(*) AS n_rich FROM customer
        |           WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
        |  ON n_nationkey = c_nationkey
        |ORDER BY key""".stripMargin,

    "q_cross" ->
      """SELECT concat(r_name, '/', n_name) AS pair
        |FROM region CROSS JOIN nation ORDER BY pair""".stripMargin,

    "q_scalar_subq" ->
      """SELECT o_orderkey,
        |       round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS ratio
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q_except_all" ->
      """SELECT key, count(*) AS n FROM (
        |  SELECT l_suppkey AS key FROM lineitem
        |  EXCEPT ALL
        |  SELECT o_custkey AS key FROM orders)
        |GROUP BY key ORDER BY key""".stripMargin,

    "q_intersect_all" ->
      """SELECT key, count(*) AS n FROM (
        |  SELECT l_suppkey AS key FROM lineitem
        |  INTERSECT ALL
        |  SELECT o_custkey AS key FROM orders)
        |GROUP BY key ORDER BY key""".stripMargin,

    "q_corr_subq" ->
      """SELECT o_orderkey,
        |       round(o_totalprice / (SELECT avg(o2.o_totalprice) FROM orders o2
        |                             WHERE o2.o_custkey = o1.o_custkey), 6) AS vs_cust_avg
        |FROM orders o1
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin,

    "q_union_all" ->
      """SELECT c_custkey AS key, 'cust' AS src FROM customer WHERE c_acctbal > 9900
        |UNION ALL
        |SELECT o_custkey AS key, 'order' AS src FROM orders WHERE o_totalprice > 450000
        |ORDER BY key, src""".stripMargin,

    "q_window_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_agg_filtered" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
        |       round(CAST(sum(CAST(round((CASE WHEN c_acctbal > 5000
        |                  THEN c_acctbal ELSE 0.0 END)*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS rich_bal,
        |       max(CASE WHEN c_nationkey < 5 THEN c_acctbal END) AS max_lownat
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_array_agg" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list_distinct(list(c_nationkey))), ',') AS nations,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_bitwise" ->
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS band,
        |       o_orderkey | 4096 AS bor,
        |       xor(o_orderkey, 1234) AS bxor,
        |       (o_orderkey % 16) << 3 AS shl,
        |       o_orderkey >> 4 AS shr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_udaf" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
        |         AS wavg_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(k) AS n_with_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_groupbool" ->
      """SELECT l_returnflag = 'R' AS is_returned, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY is_returned""".stripMargin,

    "q_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
        |ORDER BY o_orderkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment,
        |       EXISTS (SELECT 1 FROM orders o
        |               WHERE o.o_custkey = c.c_custkey
        |                 AND o.o_totalprice > 150000) AS has_big_order
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cum_dist,
        |       nth_value(o_orderkey, 3) OVER (w ROWS BETWEEN UNBOUNDED
        |         PRECEDING AND CURRENT ROW) AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_profile" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS props_nulls,
        |       count(DISTINCT user_id) AS users_distinct,
        |       count(DISTINCT event_type) AS types_distinct,
        |       min(event_id) AS min_event_id,
        |       max(event_id) AS max_event_id
        |FROM events""".stripMargin,

    // arg_max/arg_min replicated with deterministic row_number picks (the
    // Spark side orders by (price, key) so ties are impossible either way)
    "q_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |       max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
        |       round(max(o_totalprice), 2) AS top_price,
        |       max(CASE WHEN rmin = 1 THEN o_orderkey END) AS low_order,
        |       round(min(o_totalprice), 2) AS low_price
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
        |                  round(sum(l_extendedprice), 2) AS price,
        |                  round(sum(l_tax), 2) AS tax
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'price', price FROM a
        |UNION ALL
        |SELECT l_returnflag, 'tax', tax FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // whatever strategy the profile selects, the result is the plain join
    "q_join_auto" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |                  AS DOUBLE)/100, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_star" ->
      """SELECT n_name,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |                      *(100 - CAST(round(l_discount*100) AS BIGINT)))
        |                  AS DOUBLE)/10000, 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND c_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    // same integer shares, same census-level HHI reduction
    "q_hhi_concentration" ->
      """WITH bys AS MATERIALIZED (
        |  SELECT p_brand, l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |              * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_suppkey),
        |sh AS (
        |  SELECT p_brand, cents,
        |         CAST(sum(cents) OVER (PARTITION BY p_brand) AS BIGINT)
        |           AS total_cents,
        |         (cents * 10000) // CAST(sum(cents)
        |            OVER (PARTITION BY p_brand) AS BIGINT) AS share_bp
        |  FROM bys)
        |SELECT p_brand, count(*) AS n_suppliers,
        |       max(total_cents) AS total_cents,
        |       CAST(max(share_bp) AS BIGINT) AS top_share_bp,
        |       CAST(sum(share_bp * share_bp) AS BIGINT) // 10000 AS hhi
        |FROM sh GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // same cents-exact star, same census-level share window
    "q_market_share" ->
      """WITH j AS MATERIALIZED (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
        |         r.r_name AS cust_region, sn.n_name AS supp_nation,
        |         CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |              AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region r  ON cn.n_regionkey = r.r_regionkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
        |c AS (
        |  SELECT year, cust_region, supp_nation,
        |         CAST(sum(cents) AS BIGINT) AS rev_cents
        |  FROM j GROUP BY year, cust_region, supp_nation)
        |SELECT year, cust_region, supp_nation, rev_cents,
        |       (rev_cents * 10000) // CAST(sum(rev_cents)
        |          OVER (PARTITION BY year, cust_region) AS BIGINT)
        |         AS share_bp
        |FROM c ORDER BY year, cust_region, supp_nation""".stripMargin,

    // replicates fuzzyPairs' deletion-neighborhood blocking bit-for-bit
    // (string split + list slicing), then the same exact Levenshtein
    // verification. slot is 0-based; removing 1-based element slot+1 leaves
    // prefix words[1:slot] || suffix words[slot+2:].
    "q_fuzzy_join" ->
      s"""WITH w AS MATERIALIZED (
         |  SELECT p_partkey, p_brand, p_size, string_split(p_name, ' ') AS words
         |  FROM part),
         |ex0 AS (SELECT p_partkey, p_brand, p_size, words,
         |               unnest(range(0, len(words))) AS slot FROM w),
         |ex AS (SELECT p_partkey, p_brand, p_size, slot,
         |              array_to_string(words[1:slot] || words[slot+2:], ' ') AS residual
         |       FROM ex0),
         |bk AS (SELECT p_brand, p_size, slot, residual,
         |              list_sort(list_distinct(list(p_partkey)))[1:${DedupOps.BucketCap}] AS bucket
         |       FROM ex GROUP BY p_brand, p_size, slot, residual
         |       HAVING len(list_distinct(list(p_partkey))) >= 2),
         |cand AS (SELECT DISTINCT pa.x AS key_a, pb.y AS key_b
         |         FROM bk, unnest(bk.bucket) AS pa(x), unnest(bk.bucket) AS pb(y)
         |         WHERE pa.x < pb.y)
         |SELECT c.key_a, c.key_b, a.p_name AS name_a, b.p_name AS name_b,
         |       levenshtein(a.p_name, b.p_name) AS lev
         |FROM cand c JOIN part a ON a.p_partkey = c.key_a
         |            JOIN part b ON b.p_partkey = c.key_b
         |WHERE levenshtein(a.p_name, b.p_name) <= 3
         |ORDER BY key_a, key_b""".stripMargin,

    "q_null_fns" ->
      """SELECT event_id,
        |       coalesce(props, 'none') AS props_or_none,
        |       nullif(event_type, 'click') AS type_nonclick,
        |       CASE WHEN props IS NULL THEN 1 ELSE 0 END AS is_null_flag
        |FROM events ORDER BY event_id""".stripMargin,

    // the HLL sketch itself is engine-specific; the exact count is
    // value-checked and the estimate is asserted within its 5% bound
    "q_agg_approx" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       true AS approx_ok
        |FROM lineitem""".stripMargin,

    // same bound-flag reduction, per group
    "q_hll_sketch" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the rolled-up (fine-sketch union) estimate must satisfy the same
    // bound as a direct sketch — the oracle pins the exact anchor and the
    // flag; a union that lost registers would blow the 5% band and fail
    // the hash gate
    "q_hll_rollup" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       true AS rollup_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // exact EXCEPT anchor + the sketch-difference accuracy flag
    "q_hll_diff" ->
      """SELECT CAST(count(*) AS BIGINT) AS exact_diff,
        |       true AS diff_ok
        |FROM (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '1-URGENT'
        |      EXCEPT
        |      SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '2-HIGH')""".stripMargin,

    // exact-intersect anchor + the inclusion-exclusion accuracy flag
    "q_hll_intersect" ->
      """SELECT CAST(count(*) AS BIGINT) AS exact_overlap,
        |       true AS overlap_ok
        |FROM (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '1-URGENT'
        |      INTERSECT
        |      SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '2-HIGH')""".stripMargin,

    // same cents-exact census, same 1-row max equality
    "q_top_supplier" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |              * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT max(rev_cents) AS mx FROM rev)
        |SELECT s_suppkey, s_name, rev_cents
        |FROM rev CROSS JOIN mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_cents = mx
        |ORDER BY s_suppkey""".stripMargin,

    // the argmin spelled as a deterministic rank window (min over raw
    // doubles — bit-identical, no rounding needed)
    "q_cheapest_supplier" ->
      """WITH mp AS MATERIALIZED (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS minp
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |rk AS (
        |  SELECT l_partkey, l_suppkey, minp,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY minp ASC, l_suppkey ASC) AS rn,
        |         count(*) OVER (PARTITION BY l_partkey) AS n_suppliers
        |  FROM mp)
        |SELECT l_partkey AS p_partkey, l_suppkey AS best_supp,
        |       minp AS best_price, CAST(n_suppliers AS BIGINT) AS n_suppliers
        |FROM rk WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    // same cents sums, same integer bp division
    "q_promo_share" ->
      """SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
        |       CAST(sum(CASE WHEN p_type = 'PROMO'
        |           THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT)) AS BIGINT) AS total_cents,
        |       CAST(sum(CASE WHEN p_type = 'PROMO'
        |           THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT) ELSE 0 END) AS BIGINT) * 10000
        |         // CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                * 100) AS BIGINT)) AS BIGINT) AS promo_bp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY month ORDER BY month""".stripMargin,

    // same per-part census, same all-integer 5·qty·n < sum_qty boundary
    "q_small_qty_revenue" ->
      """WITH pa AS MATERIALIZED (
        |  SELECT l_partkey AS pk,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         count(*) AS n_lines
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand, count(*) AS n_small,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN pa ON l_partkey = pk
        |JOIN part ON l_partkey = p_partkey
        |WHERE 5 * CAST(l_quantity AS BIGINT) * n_lines < sum_qty
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // the HAVING-IN spelled directly; integer quantity sums
    "q_large_orders" ->
      """WITH oq AS MATERIALIZED (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
        |       o_totalprice, sum_qty
        |FROM oq JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // the EXISTS / NOT-EXISTS pair spelled as the same two censuses
    "q_waiting_suppliers" ->
      """WITH l2 AS MATERIALIZED (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |         max(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |oc AS (
        |  SELECT ok, count(*) AS n_supp,
        |         sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
        |         max(CASE WHEN late THEN sk END) AS late_supp
        |  FROM l2 GROUP BY ok)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM oc JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin,

    // same two-role nation star, same cents discipline
    "q_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // same cents census, same deterministic (rev DESC, custkey ASC) cut
    "q_returned_revenue" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |              * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-07-01'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, rev_cents
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev_cents DESC, c_custkey ASC LIMIT 20""".stripMargin,

    // same two-bucket CASE census, integer bp
    "q_priority_lateness" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN l_shipdate > o_orderdate
        |                  + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_late,
        |       CAST(sum(CASE WHEN l_shipdate > o_orderdate
        |                  + INTERVAL 90 DAY THEN 0 ELSE 1 END) AS BIGINT)
        |         AS n_ontime,
        |       (CAST(sum(CASE WHEN l_shipdate > o_orderdate
        |                   + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT)
        |          * 10000) // CAST(count(*) AS BIGINT) AS late_bp
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // same integer cents·n > sum_cents boundary, same DISTINCT anti target
    "q_dormant_segments" ->
      """WITH c AS MATERIALIZED (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |a AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |             count(*) AS n_pos FROM c WHERE bal_cents > 0),
        |u AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority = '1-URGENT')
        |SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(bal_cents) AS BIGINT) AS tot_cents
        |FROM c CROSS JOIN a
        |WHERE bal_cents * n_pos > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM u)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
