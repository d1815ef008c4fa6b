package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators for a training-data pipeline: domain-mixture
  * sampling weights (temperature sampling), percentile-based quality
  * gating, BM25 relevance scoring, vocabulary / OOV coverage, int8
  * embedding quantization, and document-length histograms.
  *
  * Scale notes (design bar = 100 TB):
  *  - domain mix: one map-side-combined groupBy(source); the grand total is
  *    a 1-row aggregate CROSS-JOINED back (broadcast), never a window over
  *    an unpartitioned frame — domain cardinality can be millions of hosts
  *    at web scale and `OVER ()` would serialize them onto one reducer.
  *  - quality gate: percent_rank within lang needs a per-lang sort; lang
  *    cardinality is tiny (~dozens), so at 100 TB the window would hot-spot.
  *    [[qualityGateApprox]] (q_quality_gate_approx) IS that scale path: a
  *    per-lang `percentile_approx` threshold (mergeable sketch — map-side
  *    partials, no per-lang sort) broadcast back as a filter, same gate
  *    semantics (keep top 75% per lang). The exact-rank q_quality_percentile
  *    stays as the bit-exact oracle anchor; CorpusSpec bounds the two
  *    against each other.
  *  - BM25: term stats (df, avgdl) are tiny aggregates broadcast to the
  *    posting join; the per-term tf aggregation keys on (doc_id, term) —
  *    fine-grained, skew-proof.
  *  - vocab/OOV: the vocabulary is a top-k aggregate (small by
  *    construction) broadcast to the token stream; the token stream itself
  *    is never shuffled except by the (doc_id) rollup.
  *  - quantization: per-dimension min/max is a 64-row aggregate broadcast
  *    back to the exploded values — the corpus is scanned twice but never
  *    shuffled on a coarse key.
  */
object CorpusOps {
  type Q = (SparkSession, String) => DataFrame

  /** The deterministic doc_id → sampling-priority LCG, ONE definition for
    * every consumer: q_stratified_sample's engine side, its DuckDB oracle
    * and the streaming twin ([[graft.streaming.DocsStream
    * .stratifiedSample]]). The stream == batch == oracle three-way
    * equivalence depends on these staying bit-identical, so the string
    * must never be re-typed at a call site. doc_id is reduced mod 2³¹−1
    * BEFORE the multiply (the q_domain_sample overflow discipline).
    */
  val LcgPrioritySql: String =
    "((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647"

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  private def nonEmpty(df: DataFrame): DataFrame =
    df.filter(length(trim(col("text"))) > 0)

  private val toks = split(lower(trim(col("text"))), "\\s+")

  /** Scale path of the percentile quality gate: per-lang approx-25th-
    * percentile threshold (mergeable GK sketch, accuracy 10⁴ → rank error
    * ≤ n/10⁴) computed with map-side partial aggregation, broadcast back to
    * the corpus as a plain filter. No per-lang window sort anywhere — the
    * only shuffle is the tiny per-lang sketch merge, so a hot (en) partition
    * can't form at 100 TB. A deterministic (doc_id mod 10⁶)·10⁻¹² jitter
    * makes scores tie-free while staying ≤ 10⁻⁶ — bounded even at 10¹²-scale
    * doc ids, where a raw doc_id·10⁻¹² would dominate the score — so the
    * kept fraction concentrates at 0.75 ± (sketch error + 1/n) and is
    * bounds-checkable per lang. Returns (lang, n_docs, n_kept).
    */
  def qualityGateApprox(documents: DataFrame): DataFrame = {
    val scored = nonEmpty(documents)
      .select(col("doc_id"), col("lang"),
        ((col("n_chars").cast("double") / size(toks)) +
          (col("doc_id") % 1000000L).cast("double") * 1e-12).as("score"))
    val thr = scored.groupBy(col("lang"))
      .agg(percentile_approx(col("score"), lit(0.25), lit(10000)).as("thr"))
    scored.join(broadcast(thr), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= col("thr"), 1L).otherwise(0L)).as("n_kept"))
  }

  val queries: Map[String, Q] = Map(
    // ---- data-recipe materialization (the LLaMA/Gopher-style epoch
    //      mixing step): upsample every source toward the LARGEST
    //      source's token mass. repeat ratio = (max_tokens·10⁴) div
    //      tokens_s in basis points — ALL INTEGER, so the whole-epoch
    //      count and the fractional-epoch keep rate never touch a float;
    //      the fractional epoch admits doc ⇔ LCG(doc) % 10⁴ < extra_bp
    //      (the shared deterministic LCG). Source census broadcast, one
    //      per-row filter, census output — corpus never shuffles ----
    "q_data_recipe" -> ((s, d) => {
      val dd = docs(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      val census = dd.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tokens_s"))
      val maxT = census.agg(max(col("tokens_s")).as("max_t"))
      val plan = census.crossJoin(broadcast(maxT))
        .select(col("source"), col("n_docs"), col("tokens_s"),
          expr("(max_t * 10000) div tokens_s").as("ratio_bp"))
        .select(col("source"), col("n_docs"), col("tokens_s"),
          expr("ratio_bp div 10000").as("repeat_full"),
          (col("ratio_bp") % 10000).as("extra_bp"))
      dd.join(broadcast(plan), "source")
        .withColumn("copies", col("repeat_full") +
          (pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(1103515245L)
            + lit(12345L), lit(2147483647L)) % 10000 < col("extra_bp"))
            .cast("long"))
        .groupBy(col("source"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("tokens_s")).as("tokens_s"),
          max(col("repeat_full")).as("repeat_full"),
          max(col("extra_bp")).as("extra_bp"),
          sum(col("copies")).as("n_virtual_docs"),
          sum(col("copies") * col("n_chars")).as("virtual_tokens"))
        .orderBy("source")
    }),
    // ---- domain-mixture weights (temperature sampling, T=0.7): per-source
    //      token mass raised to tau, normalized. The normalizer is a 1-row
    //      broadcast cross join, not an OVER () window — see scale notes ----
    "q_domain_mix" -> ((s, d) => {
      val bySrc = nonEmpty(docs(s, d))
        .select(col("source"), size(toks).as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("w", pow(col("n_tokens").cast("double"), 0.7))
      val tot = bySrc.agg(sum(col("w")).as("tot_w"))
      bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("w") / col("tot_w"), 6).as("mix_weight"))
        .orderBy("source")
    }),

    // ---- percentile quality gate: score docs (chars per token — a cheap
    //      deterministic quality proxy), keep the top 75% WITHIN each lang,
    //      report the surviving population per lang. percent_rank is exact
    //      rational arithmetic, so the 0.25 cut is engine-independent ----
    "q_quality_percentile" -> ((s, d) => {
      val scored = nonEmpty(docs(s, d))
        .select(col("doc_id"), col("lang"),
          (col("n_chars").cast("double") / size(toks)).as("score"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score").asc, col("doc_id").asc)
      scored.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= 0.25)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          round(avg(col("score")), 4).as("avg_score"),
          round(min(col("score")), 4).as("min_score"))
        .orderBy("lang")
    }),

    // ---- distinctive vocabulary per domain (corpus diagnostics: WHAT a
    //      source contributes, not just how much — the per-source lift
    //      (c_st/n_s)/(c_t/N) surfaces the terms a domain over-represents
    //      vs the whole corpus). Ranking is INTEGER: key = (c_st·10⁶) div
    //      c_t (within a source n_s and N are constant factors, so the
    //      c_st/c_t ratio IS the lift order); ties break on the token —
    //      no float comparisons decide ranks, the rounded lift is output
    //      only. c_st ≥ 3 kills hapax noise. Shapes: two fine-key token
    //      aggs, one fine source-key join, rank-5 window per source ----
    "q_domain_terms" -> ((s, d) => {
      val tk = nonEmpty(docs(s, d))
        .select(col("source"), explode(toks).as("t"))
        .filter(col("t") =!= "")
      val st = tk.groupBy(col("source"), col("t")).agg(count(lit(1)).as("c_st"))
      val gt = tk.groupBy(col("t")).agg(count(lit(1)).as("c_t"))
      val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
      val tot = gt.agg(sum(col("c_t")).as("n_tot"))
      val scored = st.filter(col("c_st") >= 3)
        .join(gt, "t")
        .join(ns, "source")
        .crossJoin(broadcast(tot))
        .withColumn("key", expr("(c_st * 1000000) div c_t"))
        .withColumn("lift", round(
          (col("c_st").cast("double") * col("n_tot")) /
            (col("n_s").cast("double") * col("c_t")), 6))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("key").desc, col("t").asc)
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("t").as("token"), col("c_st"),
          col("c_t"), col("rk"), col("lift"))
        .orderBy("source", "rk")
    }),

    // ---- exact token-budget allocation (largest-remainder / Hamilton
    //      apportionment): given a global token budget B, hand each
    //      source quota_s proportional to its token mass with Σ quota
    //      EXACTLY B — floor division under-allocates by r < #sources
    //      units, and the r largest fractional remainders get the +1.
    //      Float-proportional rounding can miss B by ±#sources tokens
    //      and is order-dependent; this is ALL INTEGER and total by
    //      construction. Scale: two census-sized aggregates broadcast
    //      back; the remainder rank is a window over the CENSUS (one row
    //      per source — ~10⁶ rows ≈ 100 MB at web scale, census-sized
    //      not corpus-sized, same bound as q_range_layout's boundary
    //      frame). The corpus itself is touched once, map-side ----
    "q_token_budget" -> ((s, d) => {
      val budget = 100000L
      val census = docs(s, d).groupBy(col("source"))
        .agg(sum(col("n_chars")).as("t_s"))
      val tot = census.agg(sum(col("t_s")).as("t"))
      // the B·t_s product accumulates in decimal(38,0): at the 100 TB
      // design point (total chars ~1e14) the BIGINT product ~1e19 would
      // silently wrap under Spark's non-ANSI arithmetic while DuckDB
      // raises — decimal keeps both engines exact (the q_corpus_checksum
      // discipline); div/% then land back in BIGINT-ranged values
      val wb = census.crossJoin(broadcast(tot))
        .select(col("source"), col("t_s"),
          expr(s"(CAST($budget AS DECIMAL(38,0)) * t_s) div t").as("base"),
          expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * t_s) % t AS BIGINT)")
            .as("rem"))
      val deficit = wb.agg((lit(budget) - sum(col("base"))).as("r"))
      val w = Window.orderBy(col("rem").desc, col("source").asc)
      wb.crossJoin(broadcast(deficit))
        .withColumn("rk", row_number().over(w))
        .select(col("source"), col("t_s"), col("base"),
          when(col("rk") <= col("r"), 1L).otherwise(0L).as("extra"),
          (col("base") +
            when(col("rk") <= col("r"), 1L).otherwise(0L)).as("quota"))
        .orderBy("source")
    }),

    // ---- cross-source quantile normalization (the mixing prerequisite:
    //      per-source quality scores are NOT comparable — a "good" blog
    //      post and a "good" arXiv paper sit at different raw-score
    //      ranges, so one global threshold over/under-selects whole
    //      sources). Map each doc's WITHIN-source rank onto the GLOBAL
    //      score distribution: rank r of n in its source → basis-point
    //      quantile pr_bp = ((r-1)·10⁴) div (n-1), then norm_score = the
    //      smallest global score whose cumulative basis-point mass covers
    //      pr_bp. ALL INTEGER (ranks, divs) — no float boundary can
    //      disagree across engines. Scale shape: the rank window
    //      partitions BY SOURCE (fine keys at web scale — millions of
    //      hosts, each small); the global CDF is a distinct-score census
    //      (bounded by the score domain, ~max doc length, NOT corpus
    //      size) whose window runs over that bounded table; the per-doc
    //      mapping is a broadcast range join against the tiny CDF. The
    //      corpus shuffles once (the source window) and never sorts
    //      globally ----
    "q_quantile_normalize" -> ((s, d) => {
      val dd = docs(s, d).select(col("doc_id"), col("source"),
        col("n_chars").as("score"))
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("score").asc, col("doc_id").asc)
      val ranked = dd
        .withColumn("rk", row_number().over(wSrc).cast("long"))
        .withColumn("n_s", count(lit(1)).over(
          Window.partitionBy(col("source"))))
        .withColumn("pr_bp", when(col("n_s") === 1L, 0L)
          .otherwise(expr("((rk - 1) * 10000) div (n_s - 1)")))
      // grand total rides as a 1-row broadcast (repo convention — never a
      // driver action, never OVER () on the corpus)
      val nTot = dd.agg(count(lit(1)).as("n_tot"))
      val cdf = dd.groupBy(col("score")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("score")).rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(nTot))
        .withColumn("cum_bp", expr("(cum * 10000) div n_tot"))
        .withColumn("prev_bp", coalesce(lag(col("cum_bp"), 1).over(
          Window.orderBy(col("score"))), lit(-1L)))
        .select(col("score").as("g_score"), col("prev_bp"), col("cum_bp"))
      ranked.join(broadcast(cdf),
          col("pr_bp") > col("prev_bp") && col("pr_bp") <= col("cum_bp"))
        .select(col("doc_id"), col("source"), col("score"), col("pr_bp"),
          col("g_score").as("norm_score"))
        .orderBy("doc_id")
    }),

    // ---- approx quality gate (the 100 TB shape of q_quality_percentile —
    //      see [[qualityGateApprox]]): the oracle value-checks the exact
    //      per-lang populations and the Spark side reduces the kept fraction
    //      to its concentration bound (0.75 ± 0.05 covers sketch error +
    //      1/n discreteness at the smallest sf0.01 lang, n=64), the same
    //      technique that oracle-gates q_agg_approx's HLL ----
    "q_quality_gate_approx" -> ((s, d) =>
      qualityGateApprox(docs(s, d))
        .select(col("lang"), col("n_docs"),
          (abs(col("n_kept").cast("double") / col("n_docs") - 0.75) <= 0.05)
            .as("keep_frac_ok"))
        .orderBy("lang")),

    // ---- BM25 (k1=1.2, b=0.75) for a fixed query over the corpus: doc
    //      frequencies and average doc length are broadcast scalars; the
    //      posting list (docs containing a query term) is the only joined
    //      set. Integer doc lengths keep avgdl's sum exact ----
    "q_bm25" -> ((s, d) => {
      val terms = Seq("spark", "join", "vector")
      val tok = nonEmpty(docs(s, d)).select(col("doc_id"), toks.as("w"))
      val dl = tok.select(col("doc_id"), size(col("w")).as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val tf = tok.select(col("doc_id"), explode(col("w")).as("t"))
        .filter(col("t").isin(terms: _*))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("t"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      tf.join(broadcast(df), "t")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("contrib",
          col("idf") * col("tf") * 2.2 /
            (col("tf") + (lit(0.25) + col("dl") * 0.75 / col("avgdl")) * 1.2))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          round(sum(col("contrib")), 4).as("bm25"))
        .orderBy("doc_id")
    }),

    // ---- vocabulary coverage: corpus top-10 tokens by frequency (ties
    //      broken by token) become the vocab; per-source average
    //      out-of-vocabulary ratio. Vocab is broadcast; no coarse shuffle ----
    "q_vocab_coverage" -> ((s, d) => {
      val t = nonEmpty(docs(s, d))
        .select(col("doc_id"), col("source"), explode(toks).as("t"))
      val vocab = t.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t").asc).limit(10)
        .select(col("t"), lit(1).as("in_v"))
      t.join(broadcast(vocab), Seq("t"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("in_v").isNull, 1).otherwise(0)).as("n_oov"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_oov").cast("double") / col("n_tok")), 6)
            .as("avg_oov_frac"))
        .orderBy("source")
    }),

    // ---- int8 scalar quantization of the embedding column: per-dimension
    //      min/max over the corpus (a 64-row aggregate, broadcast back),
    //      values snapped to 256 levels, reconstruction RMSE per label.
    //      The quantized code is what a vector index would store at scale ----
    "q_embed_quantize" -> ((s, d) => {
      val dims = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("p", "v0")))
        .select(col("vec_id"), col("label"), (col("p") + 1).as("dim"),
          col("v0").cast("double").as("v"))
      val rng = dims.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      dims.join(broadcast(rng), "dim")
        .withColumn("qv",
          when(col("mx") > col("mn"),
            round((col("v") - col("mn")) / (col("mx") - col("mn")) * 255.0))
            .otherwise(0.0))
        .withColumn("dq",
          col("mn") + col("qv") / 255.0 * (col("mx") - col("mn")))
        .withColumn("se", pow(col("v") - col("dq"), 2.0))
        .groupBy(col("label"))
        .agg(countDistinct(col("vec_id")).as("n_vecs"),
          round(sqrt(avg(col("se"))) * 1000.0, 6).as("rmse_milli"))
        .orderBy("label")
    }),

    // ---- unigram-LM quality score (CCNet-style perplexity proxy): train a
    //      corpus unigram model (token counts — one map-side-combined agg;
    //      the LM table is vocab-sized, bounded by language not corpus, so
    //      it broadcasts), then score each doc by its avg cross-entropy
    //      -ln P(t). High score = rare-token-heavy (boilerplate, garbled
    //      text); the canonical cheap quality filter before an expensive
    //      model-based one. The broadcast join means the Zipf-head tokens
    //      ("the") never become a shuffle hot key ----
    "q_lm_score" -> ((s, d) => {
      val tok = nonEmpty(docs(s, d))
        .select(col("doc_id"), explode(toks).as("t"))
      val cnt = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum(col("c")).cast("double").as("tot"))
      tok.join(broadcast(cnt), "t")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          round(avg(log(col("tot") / col("c"))), 4).as("xent"))
        .orderBy("doc_id")
    }),

    // ---- curriculum binning: per-lang quality QUARTILES assigned without
    //      any window — the quality-gate scale path generalized to N bins.
    //      Three per-lang thresholds from ONE mergeable percentile_approx
    //      pass broadcast back; bin assignment is a per-row CASE against
    //      the broadcast thresholds. The deterministic bounded jitter makes
    //      scores tie-free so bin edges are engine-independent ----
    "q_curriculum" -> ((s, d) => {
      val scored = nonEmpty(docs(s, d))
        .select(col("doc_id"), col("lang"),
          ((col("n_chars").cast("double") / size(toks)) +
            (col("doc_id") % 1000000L).cast("double") * 1e-12).as("score"))
      val thr = scored.groupBy(col("lang"))
        .agg(percentile_approx(col("score"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("thr"))
      scored.join(broadcast(thr), "lang")
        .withColumn("bin",
          when(col("score") < element_at(col("thr"), 1), 0)
            .when(col("score") < element_at(col("thr"), 2), 1)
            .when(col("score") < element_at(col("thr"), 3), 2)
            .otherwise(3))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("score")), 4).as("avg_score"))
        .orderBy("lang", "bin")
    }),

    // ---- bigram-LM quality score (add-one smoothed): the sharper sequel
    //      to q_lm_score — P(w2|w1) = (c2+1)/(c1+V), per-doc avg -ln P.
    //      Scale split: the bigram-count join keys on the bigram string
    //      (corpus-bounded table, FINE key → shuffled, never broadcast);
    //      the prefix counts and vocab size are language-bounded → broadcast.
    //      Repetitive docs score low (predictable), garbled docs high ----
    "q_bigram_lm" -> ((s, d) => {
      val tok = nonEmpty(docs(s, d)).select(col("doc_id"), toks.as("w"))
        .filter(size(col("w")) >= 2)
      val bg = tok.select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("w")) - 1),
          i => concat_ws(" ", slice(col("w"), i, lit(2))))).as("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1))
        .withColumn("w2", substring_index(col("b"), " ", -1))
      val c2 = bg.groupBy(col("b")).agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = bg.agg(countDistinct(col("w2")).as("v"))
      bg.join(c2, "b")
        .join(broadcast(c1), "w1")
        .crossJoin(broadcast(v))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log((col("c1") + col("v")).cast("double") /
            (col("c2") + lit(1)))), 4).as("xent2"))
        .orderBy("doc_id")
    }),

    // ---- mixture-weighted downsampling: turns q_domain_mix's weights into
    //      an actual sampled corpus. Per-source keep rate = the source's
    //      share of a 50%-of-corpus token budget under temperature weights,
    //      capped at 100%; membership is the deterministic LCG bucket (same
    //      generator as q_sample_stratified), so the sample is reproducible across
    //      engines and runs. Rates are a broadcast table; the corpus is
    //      never shuffled — per-row filter only, then one fine-keyed agg ----
    "q_domain_sample" -> ((s, d) => {
      val base = nonEmpty(docs(s, d))
        .select(col("doc_id"), col("source"), size(toks).as("n_tok"))
      val bySrc = base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("w", pow(col("n_tokens").cast("double"), 0.7))
      val tot = bySrc.agg(sum(col("w")).as("tot_w"),
        sum(col("n_docs")).as("tot_docs"))
      val rates = bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          round(least(lit(100.0),
            lit(50.0) * col("tot_docs") * (col("w") / col("tot_w")) /
              col("n_docs")), 4).as("rate_pct"))
      // doc_id reduced mod 2³¹−1 BEFORE the multiply: the raw product wraps
      // Long (or errors under ANSI) once ids pass ~8·10⁹; reduced first, the
      // product tops out at ~2.4·10¹⁸ — and fixture results are unchanged
      val bucket = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L)) % 100
      val kept = base
        .join(broadcast(rates.select(col("source"), col("rate_pct"))), "source")
        .filter(bucket.cast("double") < col("rate_pct"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("rate_pct"))
        .orderBy("source")
    }),

    // ---- weighted (priority) sampling: inclusion favors token-heavy docs.
    //      Each doc draws a deterministic pseudo-uniform u (the same LCG
    //      generator as q_sample_stratified) and gets priority key u / w with
    //      w = token count; the 50 smallest keys form the sample —
    //      Duffield-style priority sampling, reproducible across engines
    //      because the key is ONE IEEE division (exact-rounded identically
    //      everywhere), never a libm pow/log. Scale shape: the top-k is
    //      TakeOrderedAndProject — per-partition 50-row heaps merged on the
    //      driver, no global sort, no shuffle of the corpus ----
    "q_sample_weighted" -> ((s, d) => {
      val base = nonEmpty(docs(s, d))
        .select(col("doc_id"), col("source"), size(toks).cast("long").as("n_tok"))
      val u = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L))
      base.withColumn("pri", u.cast("double") / col("n_tok"))
        .orderBy(col("pri").asc, col("doc_id").asc)
        .limit(50)
        .select(col("doc_id"), col("source"), col("n_tok"),
          round(col("pri"), 4).as("pri_r"))
        .orderBy("doc_id")
    }),

    // ---- document-length histogram (equi-width 16-token bins): pure
    //      integer bucket arithmetic (no float boundary risk), one
    //      map-side-combined groupBy on the bin key ----
    "q_len_histogram" -> ((s, d) =>
      nonEmpty(docs(s, d))
        .select(size(toks).cast("long").as("n_tok"))
        .withColumn("bin_lo", (col("n_tok") / 16).cast("long") * 16)
        .groupBy(col("bin_lo"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
        .orderBy("bin_lo")),

    // ---- temperature-scaled mixture (T = 2): the q_domain_mix shape with
    //      the sampling-temperature exponent a multilingual/multi-domain
    //      training run actually uses — w_d = share_d^(1/T). T = 2 makes
    //      the exponent a SQRT, which is IEEE correctly-rounded on both
    //      engines (pow/log would not be); the normalizer is the same
    //      1-row broadcast crossJoin as q_domain_mix, never a window over
    //      the corpus ----
    "q_temperature_mix" -> ((s, d) => {
      val t = docs(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = t.agg(sum(col("n_docs")).as("n_total"))
      val w = t.crossJoin(broadcast(tot))
        .withColumn("share",
          col("n_docs").cast("double") / col("n_total").cast("double"))
        .withColumn("w", sqrt(col("share")))
      val z = w.agg(sum(col("w")).as("z"))
      w.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"), round(col("share"), 6).as("share_r"),
          round(col("w") / col("z"), 6).as("mix_weight"))
        .orderBy("source")
    }),

    // ---- k-anonymity audit (k = 5) on the customer quasi-identifier
    //      (nation, segment, account-balance kilobucket): one map-side-
    //      combined groupBy on the fine QI key, reduced to a 1-row census
    //      — group counts, violating groups, and rows re-identifiable
    //      because their QI class is smaller than k. The bucket edge is
    //      floor(double/1000): one IEEE division + floor, bit-identical
    //      across engines. At 100 TB this is the privacy gate a training
    //      corpus with user-derived metadata runs before release ----
    "q_kanonymity" -> ((s, d) => {
      val g = Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bkt"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bkt"))
        .agg(count(lit(1)).as("n"))
      g.agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_at_risk"),
          min(col("n")).as("min_group"), max(col("n")).as("max_group"))
    }),

    // ---- stratified k-fold audit: deterministic hash folds (the shared
    //      LCG — reproducible across engines/runs/cluster layouts, the
    //      property sklearn's random_state can't give a distributed
    //      pipeline) + the per-(fold, stratum) balance census that
    //      decides whether hash splitting preserved class shares. One
    //      fine-key census shuffle; marginals ride as broadcasts;
    //      shares in integer basis points ----
    "q_stratified_kfold" -> ((s, d) => {
      val P = 2147483647L
      val cen = docs(s, d)
        .select(col("lang"),
          (pmod(pmod(col("doc_id"), lit(P)) * 1103515245L + 12345L,
            lit(P)) % 5).as("fold"))
        .groupBy(col("fold"), col("lang")).agg(count(lit(1)).as("n"))
        .persistTracked()
      val foldTot = cen.groupBy(col("fold")).agg(sum(col("n")).as("n_fold"))
      val langTot = cen.groupBy(col("lang")).agg(sum(col("n")).as("n_lang"))
      val tot = cen.agg(sum(col("n")).as("n_tot"))
      cen.join(broadcast(foldTot), "fold").join(broadcast(langTot), "lang")
        .crossJoin(broadcast(tot))
        .select(col("fold"), col("lang"), col("n"),
          expr("n * 10000 div n_fold").as("share_bp"),
          expr("n_lang * 10000 div n_tot").as("global_bp"),
          abs(expr("n * 10000 div n_fold") -
            expr("n_lang * 10000 div n_tot")).as("dev_bp"))
        .orderBy("fold", "lang")
    }),

    // ---- l-diversity audit — [[q_kanonymity]]'s second axis: a QI class
    //      can be k-anonymous yet leak its sensitive attribute when every
    //      member shares one value. Per (nation, segment) class: size,
    //      DISTINCT sensitive buckets (the same floor(acctbal/1000) edge
    //      as q_kanonymity, one IEEE division + floor, bit-identical),
    //      and the l ≥ 3 verdict. One fine-key shuffle on the QI pair;
    //      the distinct count is exact (the class × bucket census is
    //      |QI| · 20-bounded, never corpus-sized) ----
    "q_ldiversity" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bkt"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("bal_bkt")).as("l_div"))
        .withColumn("diverse", col("l_div") >= 3)
        .orderBy("c_nationkey", "c_mktsegment")),

    // ---- t-closeness audit (new in r14) — the privacy trio's third
    //      axis after [[q_kanonymity]] / [[q_ldiversity]]: a QI class can
    //      be k-anonymous AND l-diverse yet still leak when its sensitive
    //      DISTRIBUTION skews far from the global one. Distance is the
    //      ordered-bucket earth mover's distance, exact by cross-
    //      multiplication: EMD = Σ_b |cumC·N − cumG·n| / (n·N·(B−1)),
    //      held in decimal(38,0) (cum·N wraps int64 at warehouse scale)
    //      and reported in integer basis points — hash-exact. The
    //      class×bucket spine is |QI|·|buckets|-bounded (≤ 25·5·20); the
    //      only unpartitioned window rides the ≤20-row global bucket
    //      census; per-class cums partition on the QI key ----
    "q_tcloseness" -> ((s, d) => {
      val base = Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bkt"))
      val cls = base
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bkt"))
        .agg(count(lit(1)).as("n_cb"))
        .persistTracked()
      val clsTot = cls.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(sum(col("n_cb")).as("n_cls"))
      val glob = cls.groupBy(col("bal_bkt")).agg(sum(col("n_cb")).as("n_gb"))
      val wg = Window.orderBy(col("bal_bkt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val globCum = glob.withColumn("cum_g", sum(col("n_gb")).over(wg))
      val tot = glob.agg(sum(col("n_gb")).as("n_tot"),
        count(lit(1)).as("n_buckets"))
      val spine = clsTot.crossJoin(broadcast(globCum))
        .join(cls, Seq("c_nationkey", "c_mktsegment", "bal_bkt"), "left")
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bkt"),
          col("n_cls"), col("cum_g"),
          coalesce(col("n_cb"), lit(0L)).as("nc"))
      val wc = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("bal_bkt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.crossJoin(broadcast(tot))
        .withColumn("cum_c", sum(col("nc")).over(wc))
        .withColumn("dev", abs(expr("CAST(cum_c AS DECIMAL(38,0)) * n_tot" +
          " - CAST(cum_g AS DECIMAL(38,0)) * n_cls")))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("n_cls"),
          col("n_tot"), col("n_buckets"))
        .agg(sum(col("dev")).as("dev_sum"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("n_cls").as("n"),
          when(col("n_buckets") > 1,
            expr("dev_sum * 10000 div (CAST(n_cls AS DECIMAL(38,0))" +
              " * n_tot * (n_buckets - 1))"))
            .otherwise(lit(0L)).as("emd_bp"))
        .withColumn("close", col("emd_bp") <= 2000)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // ---- per-domain sample cap (C4-style host capping): every source
    //      keeps at most 10 docs, chosen by a deterministic md5 priority —
    //      reproducible across engines, runs, and partitionings (the
    //      q_sample_hash device, ranked instead of thresholded). The
    //      row_number partitions on source (fine key — millions of hosts
    //      at web scale, no hot reducer); the per-group sort is bounded by
    //      group size, the standard repartition-and-cap shape ----
    "q_group_sample_cap" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      docs(s, d).select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy("source", "rk")
    }),

    // ---- stratified exact-k sample THROUGH the native TopKPerKey
    //      operator (q_group_sample_cap's semantics, the custom plan's
    //      physics): exactly 5 docs per language, chosen by a
    //      deterministic LCG priority — reproducible across engines,
    //      runs, partitionings. Where the window formulation sorts each
    //      partition, the native operator keeps ≤k-entry HEAPS per key in
    //      both its partial and final passes (PlanSpec asserts
    //      TopKPerKeyExec, zero window sorts) — per-stratum sampling at
    //      100 TB moves k rows per key per partition, never the corpus.
    //      LCG reduced mod 2³¹−1 before the multiply (the q_domain_sample
    //      overflow discipline) ----
    "q_stratified_sample" -> ((s, d) => {
      val pr = docs(s, d).select(col("lang"), col("doc_id"),
        expr(LcgPrioritySql).as("priority"))
      graft.plans.TopK.perKey(pr, Seq("lang"),
          Seq("priority" -> true, "doc_id" -> true), 5)
        .orderBy("lang", "priority", "doc_id")
    }),

    // ---- vocabulary drift census (distribution-shift monitoring): per
    //      source, the Jaccard overlap between its top-50 tokens and the
    //      CORPUS top-50 — the cheap early-warning number a multi-source
    //      ingest watches; a source whose head vocabulary diverges from
    //      the corpus (new language, spam burst, encoding break) drops
    //      fast. ALL-INTEGER: ranks break ties on the token string, set
    //      sizes and overlap are counts, drift is basis points. Shape:
    //      the corpus explode is folded ONCE into a fine-key
    //      (source, token) census — partial-agg'd map-side — and every
    //      branch hangs off that ONE exchange, which AQE's stage reuse
    //      materializes exactly once (ReusedExchange; no persist needed).
    //      This closed a ~2× regression: the old body persisted the raw
    //      corpus explode LAZILY and read it from three independent AQE
    //      leaf stages (the per-source window leg plus two broadcast
    //      builds), which AQE materializes CONCURRENTLY — the stages raced
    //      to populate the cache and each recomputed the full explode
    //      ("Block already exists" warns in the bench log). Making the
    //      shared work an exchange instead of a lazy cache turns the race
    //      into a DAG dependency: consumers cannot start before the census
    //      stage exists. Same device scales: at 100 TB shuffle-reuse of a
    //      fine-key census beats caching a corpus-sized explode ----
    "q_vocab_drift" -> ((s, d) => {
      val cnt = nonEmpty(docs(s, d))
        .select(col("source"), explode(toks).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("c"))
      val srcTop = cnt
        .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("c").desc, col("t").asc)))
        .filter(col("rk") <= 50)
      val globTop = cnt.groupBy(col("t")).agg(sum(col("c")).as("gc"))
        .orderBy(col("gc").desc, col("t").asc).limit(50)
        .select(col("t"), lit(1L).as("hit"))
      // the global-top size is MEASURED, not assumed 50 — a degenerate
      // corpus with < 50 distinct tokens would otherwise report phantom
      // drift for a source whose top set equals the global top exactly
      val nGlob = globTop.agg(count(lit(1)).as("n_glob"))
      val scored = srcTop.join(broadcast(globTop), Seq("t"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_top"),
          coalesce(sum(col("hit")), lit(0L)).as("n_common"))
      scored.crossJoin(broadcast(nGlob))
        .select(col("source"), col("n_top"), col("n_common"),
          expr("(n_common * 10000) div (n_top + n_glob - n_common)")
            .as("overlap_bp"),
          expr("10000 - (n_common * 10000) div (n_top + n_glob - n_common)")
            .as("drift_bp"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    // identical bucket edge, cross-multiplied EMD on HUGEINT, same spine
    "q_tcloseness" ->
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bkt
        |  FROM customer),
        |cls AS (SELECT c_nationkey, c_mktsegment, bal_bkt, count(*) AS n_cb
        |        FROM base GROUP BY 1, 2, 3),
        |ct AS (SELECT c_nationkey, c_mktsegment,
        |              CAST(sum(n_cb) AS BIGINT) AS n_cls
        |       FROM cls GROUP BY 1, 2),
        |gl AS (SELECT bal_bkt, CAST(sum(n_cb) AS BIGINT) AS n_gb
        |       FROM cls GROUP BY 1),
        |glc AS (SELECT bal_bkt, CAST(sum(n_gb) OVER (ORDER BY bal_bkt ROWS
        |          BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_g
        |        FROM gl),
        |tot AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_tot,
        |               count(*) AS n_buckets FROM gl),
        |sp AS (
        |  SELECT ct.c_nationkey, ct.c_mktsegment, glc.bal_bkt, ct.n_cls,
        |         glc.cum_g, CAST(COALESCE(cls.n_cb, 0) AS BIGINT) AS nc
        |  FROM ct CROSS JOIN glc
        |  LEFT JOIN cls ON cls.c_nationkey = ct.c_nationkey
        |               AND cls.c_mktsegment = ct.c_mktsegment
        |               AND cls.bal_bkt = glc.bal_bkt),
        |cm AS (
        |  SELECT c_nationkey, c_mktsegment, n_cls, cum_g,
        |         CAST(sum(nc) OVER (PARTITION BY c_nationkey, c_mktsegment
        |           ORDER BY bal_bkt ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           CURRENT ROW) AS BIGINT) AS cum_c
        |  FROM sp),
        |dv AS (
        |  SELECT c_nationkey, c_mktsegment, n_cls, n_tot, n_buckets,
        |         abs(CAST(cum_c AS HUGEINT) * n_tot -
        |             CAST(cum_g AS HUGEINT) * n_cls) AS dev
        |  FROM cm, tot),
        |ag AS (
        |  SELECT c_nationkey, c_mktsegment, n_cls, n_tot, n_buckets,
        |         sum(dev) AS dev_sum
        |  FROM dv GROUP BY 1, 2, 3, 4, 5)
        |SELECT c_nationkey, c_mktsegment, n_cls AS n,
        |       CASE WHEN n_buckets > 1
        |            THEN CAST(dev_sum * 10000 //
        |              (CAST(n_cls AS HUGEINT) * n_tot * (n_buckets - 1))
        |              AS BIGINT)
        |            ELSE 0 END AS emd_bp,
        |       CASE WHEN n_buckets > 1
        |            THEN CAST(dev_sum * 10000 //
        |              (CAST(n_cls AS HUGEINT) * n_tot * (n_buckets - 1))
        |              AS BIGINT)
        |            ELSE 0 END <= 2000 AS close
        |FROM ag ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_data_recipe" ->
      """WITH dd AS (
        |  SELECT doc_id, source, n_chars FROM documents),
        |census AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS tokens_s
        |  FROM dd GROUP BY source),
        |mx AS (SELECT max(tokens_s) AS max_t FROM census),
        |plan AS (
        |  SELECT source, n_docs, tokens_s,
        |         (max_t * 10000) // tokens_s // 10000 AS repeat_full,
        |         ((max_t * 10000) // tokens_s) % 10000 AS extra_bp
        |  FROM census CROSS JOIN mx),
        |c AS (
        |  SELECT dd.source, n_docs, tokens_s, repeat_full, extra_bp,
        |         repeat_full + CASE WHEN
        |           (((dd.doc_id % 2147483647) * 1103515245 + 12345)
        |            % 2147483647) % 10000 < extra_bp THEN 1 ELSE 0 END
        |           AS copies,
        |         n_chars
        |  FROM dd JOIN plan ON dd.source = plan.source)
        |SELECT source, max(n_docs) AS n_docs, max(tokens_s) AS tokens_s,
        |       max(repeat_full) AS repeat_full, max(extra_bp) AS extra_bp,
        |       CAST(sum(copies) AS BIGINT) AS n_virtual_docs,
        |       CAST(sum(copies * n_chars) AS BIGINT) AS virtual_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // sqrt is IEEE correctly-rounded (unlike pow); casts keep DuckDB off
    // its DECIMAL division path; the ~20-term normalizer sum is rounded
    // away at 6 dp on both engines
    "q_temperature_mix" ->
      """WITH t AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_docs) AS n_total FROM t),
        |w AS (SELECT source, n_docs,
        |             CAST(n_docs AS DOUBLE) / CAST((SELECT n_total FROM tot) AS DOUBLE) AS share,
        |             sqrt(CAST(n_docs AS DOUBLE) / CAST((SELECT n_total FROM tot) AS DOUBLE)) AS w
        |      FROM t),
        |z AS (SELECT sum(w) AS z FROM w)
        |SELECT source, n_docs, round(share, 6) AS share_r,
        |       round(w / (SELECT z FROM z), 6) AS mix_weight
        |FROM w ORDER BY source""".stripMargin,

    "q_group_sample_cap" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
        |           AS rk
        |  FROM documents)
        |SELECT source, rk, doc_id FROM r WHERE rk <= 10
        |ORDER BY source, rk""".stripMargin,

    // the oracle is the window formulation of the same exact-k selection —
    // the native heap operator must agree row for row
    "q_stratified_sample" ->
      s"""WITH p AS (
        |  SELECT lang, doc_id, $LcgPrioritySql AS priority
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY priority, doc_id) AS rn FROM p)
        |SELECT lang, doc_id, priority FROM r WHERE rn <= 5
        |ORDER BY lang, priority, doc_id""".stripMargin,

    "q_vocab_drift" ->
      """WITH tk AS (
        |  SELECT source,
        |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |tk2 AS (SELECT source, t FROM tk WHERE t <> ''),
        |st AS (
        |  SELECT source, t, count(*) AS c FROM tk2 GROUP BY source, t),
        |sr AS (
        |  SELECT source, t,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY c DESC, t ASC) AS rk
        |  FROM st),
        |stop AS (SELECT source, t FROM sr WHERE rk <= 50),
        |gtop AS (
        |  SELECT t, 1 AS hit FROM (
        |    SELECT t, count(*) AS gc FROM tk2 GROUP BY t
        |    ORDER BY gc DESC, t ASC LIMIT 50)),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_glob FROM gtop),
        |sc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_top,
        |         CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_common
        |  FROM stop LEFT JOIN gtop USING (t) GROUP BY source)
        |SELECT source, n_top, n_common,
        |       (n_common * 10000) // (n_top + n_glob - n_common)
        |         AS overlap_bp,
        |       10000 - (n_common * 10000) // (n_top + n_glob - n_common)
        |         AS drift_bp
        |FROM sc CROSS JOIN ng ORDER BY source""".stripMargin,

    "q_kanonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bkt,
        |         count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       min(n) AS min_group, max(n) AS max_group
        |FROM g""".stripMargin,

    "q_stratified_kfold" ->
      """WITH cen AS (
        |  SELECT ((doc_id % 2147483647) * 1103515245 + 12345)
        |           % 2147483647 % 5 AS fold,
        |         lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |ft AS (SELECT fold, CAST(sum(n) AS BIGINT) AS n_fold
        |       FROM cen GROUP BY 1),
        |lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
        |       FROM cen GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cen)
        |SELECT cen.fold, cen.lang, n,
        |       n * 10000 // n_fold AS share_bp,
        |       n_lang * 10000 // n_tot AS global_bp,
        |       abs(n * 10000 // n_fold - n_lang * 10000 // n_tot) AS dev_bp
        |FROM cen JOIN ft ON cen.fold = ft.fold
        |     JOIN lt ON cen.lang = lt.lang, tt
        |ORDER BY cen.fold, cen.lang""".stripMargin,

    "q_ldiversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
        |         AS l_div,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
        |         AS diverse
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_domain_mix" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
        |              AS BIGINT) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0 GROUP BY source),
        |w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS w FROM t)
        |SELECT source, n_docs, n_tokens,
        |       round(w / sum(w) OVER (), 6) AS mix_weight
        |FROM w ORDER BY source""".stripMargin,

    "q_domain_terms" ->
      """WITH tk AS (
        |  SELECT source, u.t
        |  FROM documents,
        |       unnest(list_filter(regexp_split_to_array(lower(trim(text)),
        |                                                '\s+'),
        |                          x -> x <> '')) AS u(t)
        |  WHERE length(trim(text)) > 0),
        |st AS (SELECT source, t, count(*) AS c_st FROM tk GROUP BY 1, 2),
        |gt AS (SELECT t, count(*) AS c_t FROM tk GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
        |       FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_tot FROM gt),
        |sc AS (
        |  SELECT st.source, st.t, c_st, c_t, n_s, n_tot,
        |         (c_st * 1000000) // c_t AS key
        |  FROM st JOIN gt USING (t) JOIN ns USING (source) CROSS JOIN tot
        |  WHERE c_st >= 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY source
        |                  ORDER BY key DESC, t) AS rk FROM sc)
        |SELECT source, t AS token, c_st, c_t, CAST(rk AS BIGINT) AS rk,
        |       round((CAST(c_st AS DOUBLE) * n_tot) /
        |             (CAST(n_s AS DOUBLE) * c_t), 6) AS lift
        |FROM rk WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "q_token_budget" ->
      """WITH census AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS t_s
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS t FROM census),
        |wb AS (
        |  SELECT source, t_s,
        |         (100000::HUGEINT * t_s) // t AS base,
        |         CAST((100000::HUGEINT * t_s) % t AS BIGINT) AS rem
        |  FROM census CROSS JOIN tot),
        |def AS (SELECT 100000 - CAST(sum(base) AS BIGINT) AS r FROM wb),
        |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
        |       FROM wb)
        |SELECT source, t_s, CAST(base AS BIGINT) AS base,
        |       CAST(CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |       CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
        |         AS quota
        |FROM rk CROSS JOIN def ORDER BY source""".stripMargin,

    "q_quantile_normalize" ->
      """WITH dd AS (
        |  SELECT doc_id, source, n_chars AS score FROM documents),
        |ranked AS (
        |  SELECT doc_id, source, score,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY score, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n_s
        |  FROM dd),
        |pr AS (
        |  SELECT doc_id, source, score,
        |         CASE WHEN n_s = 1 THEN 0
        |              ELSE ((rk - 1) * 10000) // (n_s - 1) END AS pr_bp
        |  FROM ranked),
        |tot AS (SELECT count(*) AS n_tot FROM dd),
        |cdf AS (
        |  SELECT score AS g_score,
        |         (sum(count(*)) OVER (ORDER BY score
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          * 10000) // (SELECT n_tot FROM tot) AS cum_bp
        |  FROM dd GROUP BY score),
        |cdf2 AS (
        |  SELECT g_score, cum_bp,
        |         coalesce(lag(cum_bp) OVER (ORDER BY g_score), -1) AS prev_bp
        |  FROM cdf)
        |SELECT pr.doc_id, pr.source, pr.score, CAST(pr.pr_bp AS BIGINT) AS pr_bp,
        |       cdf2.g_score AS norm_score
        |FROM pr JOIN cdf2
        |  ON pr.pr_bp > cdf2.prev_bp AND pr.pr_bp <= cdf2.cum_bp
        |ORDER BY doc_id""".stripMargin,

    "q_quality_percentile" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |         CAST(n_chars AS DOUBLE) /
        |           len(regexp_split_to_array(lower(trim(text)), '\s+')) AS score
        |  FROM documents WHERE length(trim(text)) > 0),
        |r AS (
        |  SELECT *, percent_rank() OVER (
        |      PARTITION BY lang ORDER BY score ASC, doc_id ASC) AS pr
        |  FROM s)
        |SELECT lang, count(*) AS n_kept,
        |       round(avg(score), 4) AS avg_score,
        |       round(min(score), 4) AS min_score
        |FROM r WHERE pr >= 0.25 GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quality_gate_approx" ->
      """SELECT lang, count(*) AS n_docs, TRUE AS keep_frac_ok
        |FROM documents WHERE length(trim(text)) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE length(trim(text)) > 0),
        |dl AS (SELECT doc_id, len(w) AS dl FROM tok),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |                 avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS t FROM tok)
        |  WHERE t IN ('spark', 'join', 'vector')
        |  GROUP BY doc_id, t),
        |df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |       FROM tf GROUP BY t)
        |SELECT tf.doc_id AS doc_id, count(*) AS n_terms,
        |       round(sum(
        |         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |         (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    "q_vocab_coverage" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |vocab AS (
        |  SELECT t, 1 AS in_v FROM (
        |    SELECT t, count(*) AS c FROM t GROUP BY t
        |    ORDER BY c DESC, t ASC LIMIT 10)),
        |cov AS (
        |  SELECT doc_id, source, count(*) AS n_tok,
        |         sum(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM t LEFT JOIN vocab USING (t)
        |  GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |       round(avg(CAST(n_oov AS DOUBLE) / n_tok), 6) AS avg_oov_frac
        |FROM cov GROUP BY source ORDER BY source""".stripMargin,

    // dims derived from each row's actual array length (not a hardcoded 64),
    // mirroring the Spark side's posexplode — a dimension change can't make
    // the oracle silently read out-of-bounds NULLs
    "q_embed_quantize" ->
      """WITH dims AS (
        |  SELECT vec_id, label, u.dim AS dim, u.v AS v FROM (
        |    SELECT vec_id, label,
        |           unnest(list_transform(range(1, len(embedding) + 1),
        |             i -> {'dim': i, 'v': CAST(embedding[i] AS DOUBLE)})) AS u
        |    FROM embeddings)),
        |rng AS (SELECT dim, min(v) AS mn, max(v) AS mx
        |        FROM dims GROUP BY dim),
        |q AS (
        |  SELECT label, vec_id, v, mn, mx,
        |         CASE WHEN mx > mn
        |              THEN round((v - mn) / (mx - mn) * 255.0)
        |              ELSE 0.0 END AS qv
        |  FROM dims JOIN rng USING (dim)),
        |e AS (
        |  SELECT label, vec_id,
        |         pow(v - (mn + qv / 255.0 * (mx - mn)), 2.0) AS se
        |  FROM q)
        |SELECT label, count(DISTINCT vec_id) AS n_vecs,
        |       round(sqrt(avg(se)) * 1000.0, 6) AS rmse_milli
        |FROM e GROUP BY label ORDER BY label""".stripMargin,

    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |cnt AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM cnt)
        |SELECT doc_id, count(*) AS n_tok, round(avg(ln(tot / c)), 4) AS xent
        |FROM toks JOIN cnt USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same sketch-exactness convention as the gate: quantile_disc thresholds
    // equal percentile_approx's at fixture scale, and the jittered scores
    // are tie-free so the CASE assignment is engine-independent
    "q_curriculum" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |         CAST(n_chars AS DOUBLE) /
        |           len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |           + (doc_id % 1000000) * 1e-12 AS score
        |  FROM documents WHERE length(trim(text)) > 0),
        |t AS (SELECT lang, quantile_disc(score, [0.25, 0.5, 0.75]) AS thr
        |      FROM s GROUP BY lang),
        |b AS (
        |  SELECT s.lang, score,
        |         CASE WHEN score < thr[1] THEN 0
        |              WHEN score < thr[2] THEN 1
        |              WHEN score < thr[3] THEN 2
        |              ELSE 3 END AS bin
        |  FROM s JOIN t USING (lang))
        |SELECT lang, bin, count(*) AS n_docs,
        |       round(avg(score), 4) AS avg_score
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE length(trim(text)) > 0),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |           i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM toks WHERE len(w) >= 2),
        |sp AS (SELECT doc_id, b, split_part(b, ' ', 1) AS w1,
        |              split_part(b, ' ', 2) AS w2 FROM bg),
        |c2 AS (SELECT b, count(*) AS c2 FROM sp GROUP BY b),
        |c1 AS (SELECT w1, count(*) AS c1 FROM sp GROUP BY w1),
        |v AS (SELECT count(DISTINCT w2) AS v FROM sp)
        |SELECT s.doc_id, count(*) AS n_bigrams,
        |       round(avg(ln(CAST(c1.c1 + v.v AS DOUBLE) / (c2.c2 + 1))), 4)
        |         AS xent2
        |FROM sp s JOIN c2 USING (b) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "q_domain_sample" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |s AS (SELECT source, count(*) AS n_docs,
        |             CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM base GROUP BY source),
        |w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS w FROM s),
        |t AS (SELECT CAST(sum(w) AS DOUBLE) AS tot_w,
        |             CAST(sum(n_docs) AS BIGINT) AS tot_docs FROM w),
        |r AS (SELECT source, n_docs,
        |             round(least(100.0,
        |               50.0 * tot_docs * (w / tot_w) / n_docs), 4) AS rate_pct
        |      FROM w CROSS JOIN t),
        |k AS (SELECT b.source, count(*) AS n_kept
        |      FROM base b JOIN r USING (source)
        |      WHERE CAST((((b.doc_id % 2147483647) * 1103515245 + 12345)
        |                  % 2147483647) % 100
        |                 AS DOUBLE) < r.rate_pct
        |      GROUP BY b.source)
        |SELECT r.source, r.n_docs, coalesce(k.n_kept, 0) AS n_kept, r.rate_pct
        |FROM r LEFT JOIN k ON r.source = k.source ORDER BY r.source""".stripMargin,

    "q_sample_weighted" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |              AS BIGINT) AS n_tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |p AS (
        |  SELECT doc_id, source, n_tok,
        |         CAST(((doc_id % 2147483647) * 1103515245 + 12345)
        |              % 2147483647 AS DOUBLE)
        |           / n_tok AS pri
        |  FROM base)
        |SELECT doc_id, source, n_tok, round(pri, 4) AS pri_r
        |FROM (SELECT * FROM p ORDER BY pri ASC, doc_id ASC LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

    "q_len_histogram" ->
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |              AS BIGINT) AS n_tok
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT (n_tok // 16) * 16 AS bin_lo,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY bin_lo ORDER BY bin_lo""".stripMargin
  )
}
