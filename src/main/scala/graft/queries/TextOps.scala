package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  * All per-row (no shuffle beyond the final ORDER BY for oracle determinism),
  * so they scale linearly with document count.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** q_jsd_drift per-token Jensen–Shannon contribution — ONE expression
    * text shared verbatim by the Spark plan and the DuckDB oracle
    * (columns na, nb, ta, tb in scope), so the log2 calls and every FP
    * op run in the identical shape; the term is rounded per row.
    */
  private val JsdP = "CAST(na AS DOUBLE) / ta"
  private val JsdQ = "CAST(nb AS DOUBLE) / tb"
  private val JsdTerm: String =
    s"0.5 * (CASE WHEN na > 0 THEN ($JsdP) * " +
      s"log2(2.0 * ($JsdP) / (($JsdP) + ($JsdQ))) ELSE 0.0 END) + " +
      s"0.5 * (CASE WHEN nb > 0 THEN ($JsdQ) * " +
      s"log2(2.0 * ($JsdQ) / (($JsdP) + ($JsdQ))) ELSE 0.0 END)"

  /** Greedy leftmost application of one ranked merge (x_i, y_i) over a
    * space-joined token string — the BPE application step at word level.
    * Fold state is the merged-so-far string: a token equal to y_i fuses
    * with a trailing x_i TOKEN (boundary-checked — merged tokens use '+'
    * so they can never be re-matched as their suffix). `endswith` +
    * left-assoc aggregate == DuckDB ends_with + list_reduce, value-exact.
    */
  private[graft] def mergeRound(prev: String, i: Int): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(filter(split($prev, ' '), t -> t <> ''),
         |  CAST('' AS STRING),
         |  (acc, t) -> CASE
         |    WHEN acc = '' THEN t
         |    WHEN (acc = x$i OR endswith(acc, concat(' ', x$i))) AND t = y$i
         |      THEN concat(substring(acc, 1, length(acc) - length(x$i)),
         |                  x$i, '+', y$i)
         |    ELSE concat(acc, ' ', t) END)""".stripMargin)

  /** BPE wrapper delimiter. U+0001 can never appear in a whitespace-split
    * token the way '|' can — a corpus word containing the delimiter char
    * would silently corrupt the wrapped-form segmentation (the char
    * vanishes and adjacent wrappers merge), and since the oracle shares
    * the encoding the gate could never see it. A control char closes
    * that hole; EvalOpsSpec runs the trainer on a pipe-containing corpus.
    */
  private[graft] val BpeDelim = "\u0001"

  /** Token array of a wrapped BPE form: ␁a␁␁b␁ → ['a','b']. */
  private def bpeToks(s: String): String =
    s"filter(split($s, '$BpeDelim'), t -> t <> '')"

  /** The q_bpe_train body over any `text`-columned corpus — exposed so
    * EvalOpsSpec can run the trainer on a synthetic corpus containing a
    * literal '|' word (the former wrapper char) and prove the wrapped-form
    * segmentation survives delimiter-looking input.
    */
  private[graft] def bpeTrain(corpus: DataFrame): DataFrame = {
    val wc = corpus
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("w"), col("n"),
        regexp_replace(col("w"), "(.)", BpeDelim + "$1" + BpeDelim).as("s"))
      .persistTracked()
    def round(prev: DataFrame, r: Int): (DataFrame, DataFrame) = {
      val pairs = prev
        .select(col("n"), expr(bpeToks("s")).as("t"))
        .select(col("n"), explode(arrays_zip(
          expr("slice(t, 1, size(t) - 1)"),
          expr("slice(t, 2, size(t) - 1)")).cast(
          "array<struct<x:string,y:string>>")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("n")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc).limit(1)
      val next = prev.crossJoin(broadcast(best))
        .select(col("w"), col("n"),
          expr(s"replace(s, concat('$BpeDelim', x, '$BpeDelim$BpeDelim', y, '$BpeDelim')," +
            s" concat('$BpeDelim', x, y, '$BpeDelim'))").as("s"))
      val report = next.crossJoin(broadcast(best))
        .select(lit(r.toLong).as("round"), col("x"), col("y"),
          col("cnt").as("pair_n"),
          (col("n") * expr(s"size(${bpeToks("s")})")).as("sym"))
        .groupBy(col("round"), col("x"), col("y"), col("pair_n"))
        .agg(sum(col("sym")).as("n_symbols"))
      (next, report)
    }
    val (s1, r1) = round(wc, 1)
    val (s2, r2) = round(s1.persistTracked(), 2)
    val (_, r3) = round(s2.persistTracked(), 3)
    r1.unionByName(r2).unionByName(r3).orderBy("round")
  }

  val queries: Map[String, Q] = Map(
    // ---- BPE TRAINING LOOP (char-level, 3 merges): the real algorithm —
    //      count adjacent symbol pairs, merge the argmax, RECOUNT on the
    //      new segmentation, repeat. q_bpe_pairs is the one-shot pair
    //      census; q_phrase_merge the static word-level APPLY; this is
    //      the iterative retrain between merges that both of them skip.
    //      Scale: the corpus collapses to the (word, count) VOCAB CENSUS
    //      in ONE pass (exactly how production BPE trainers work); all 3
    //      rounds then run census-sized. Each round is pure relational
    //      algebra: pair explode (weighted by word count) → map-side-
    //      combined argmax → the winning pair rides as a 1-ROW BROADCAST
    //      into a literal string replace() over the wrapped form
    //      ␁a␁␁b␁␁c␁ (␁ = [[BpeDelim]], U+0001 — a char no whitespace-
    //      split token can contain) — every token carries its own ␁…␁
    //      wrapper, so the pattern ␁x␁␁y␁ can only match whole adjacent
    //      tokens and greedy leftmost non-overlapping replace() == BPE's
    //      merge semantics (on 'aaaa': ␁a␁␁a␁␁a␁␁a␁ → ␁aa␁␁aa␁).
    //      Zero driver actions; all-integer counts; string argmax with
    //      (count DESC, x ASC, y ASC) — engine-invariant ----
    "q_bpe_train" -> ((s, d) => bpeTrain(docs(s, d))),

    // ---- phrase-merge application (the BPE APPLY step, word-level —
    //      q_bpe_pairs is the induction twin): learn the top-8 adjacent
    //      word pairs, then apply them as a greedy merge table — each
    //      merge fully applied leftmost-first before the next, exactly
    //      BPE's application order. The merge table is derived once
    //      (alphabet²-bounded agg, constant-row heap) and rides as a
    //      1-row broadcast; application is a per-row fold — no shuffle
    //      beyond the derivation, linear in corpus size. Gate: per-doc
    //      token counts before/after (all-integer) ----
    "q_phrase_merge" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ws = docs(s, d).filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
            .as("ws"))
      val big = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> struct(element_at(ws, i) AS w1,
            |              element_at(ws, i + 1) AS w2))""".stripMargin))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cb"))
      // rank the top-8 merges; the window runs over an 8-row frame
      val ranked = big
        .orderBy(col("cb").desc, col("w1").asc, col("w2").asc).limit(8)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cb").desc, col("w1").asc, col("w2").asc)))
      val pivotCols = (1 to 8).flatMap(i => Seq(
        max(when(col("rk") === i, col("w1"))).as(s"x$i"),
        max(when(col("rk") === i, col("w2"))).as(s"y$i")))
      val mrow = ranked.agg(pivotCols.head, pivotCols.tail: _*)
      // all 8 rounds in ONE native pass per row (GreedyMergeApply) — the
      // chained-HOF formulation re-split and re-folded the whole string
      // per round interpreted; [[mergeRound]] stays as the spec's
      // semantics witness and the DuckDB oracle keeps the independent
      // list_reduce fold, so the tight loop stays cross-checked twice
      val cur = ws.crossJoin(broadcast(mrow))
        .withColumn("t0", concat_ws(" ", col("ws")))
        .withColumn("t8", graft.functions.TextExprs.greedyMergeApply(
          col("t0"),
          array((1 to 8).map(i => col(s"x$i")): _*),
          array((1 to 8).map(i => col(s"y$i")): _*)))
      cur.select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tok_before"),
          size(split(col("t8"), " ")).cast("long").as("n_tok_after"))
        .withColumn("n_merged", col("n_tok_before") - col("n_tok_after"))
        .orderBy("doc_id")
    }),

    // ---- character-level stats ----
    "q_text_stats" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("n_chars"),
        length(col("text")).as("n_chars_calc"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))).as("n_spaces"),
        (length(col("text")) - length(replace(col("text"), lit("."), lit("")))).as("n_periods"))
        .orderBy("doc_id")),

    // ---- whitespace + BPE-ish token counting ----
    // ---- bag-of-words dedup census (the reordered/repeated-content
    //      class exact dedup can't see): normalize (lowercase, digit runs
    //      masked to '#'), reduce each doc to its SORTED DISTINCT token
    //      set, fingerprint that, and census groups of ≥2 docs sharing a
    //      vocabulary fingerprint — permutations, repetitions and
    //      number-only variants of the same content all collide here
    //      (n-gram-Jaccard-1.0 pairs at shingle order 1) while exact
    //      dedup sees distinct texts. n_exact_variants counts DISTINCT
    //      raw fingerprints inside each group — >1 is precisely the
    //      content a byte-level pass missed. One map-side-combined
    //      groupBy on the set fingerprint (fine key), top-k via
    //      TakeOrdered on the unique (n_docs, tfp) pair — no global sort,
    //      no pair join: O(n) where MinHash pays candidate pairs ----
    "q_bow_dedup" -> ((s, d) => {
      val m = docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ", array_sort(array_distinct(expr(
            """filter(split(regexp_replace(lower(trim(text)),
              |       '[0-9]+', '#'), '\\s+'), t -> t <> '')"""
              .stripMargin))))).as("tfp"),
          md5(col("text")).as("efp"))
      m.groupBy(col("tfp"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("efp")).as("n_exact_variants"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("exemplar_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("tfp").asc)
        .limit(20)
        .select(col("tfp"), col("n_docs"), col("n_exact_variants"),
          col("n_sources"), col("exemplar_doc"))
    }),

    // ---- tokenizer fertility census: subword-per-word ratio per language
    //      — the number that tells a pipeline how expensive each language
    //      is to tokenize (fertility ≈ 1 for analytic scripts, higher for
    //      agglutinative/unsegmented ones) and how to budget token counts
    //      from word counts. Reuses q_text_tokens' two tokenizations
    //      verbatim (whitespace words vs BPE-ish runs) so the two queries
    //      can never disagree; all-integer output (bp floor division).
    //      One map-side-combined groupBy on lang — lang-cardinality
    //      output, linear scan, no data-sized shuffle ----
    "q_tokenizer_fertility" -> ((s, d) =>
      docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nw"),
          (size(split(trim(col("text")),
            "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")) - 1).cast("long").as("nb"),
          length(col("text")).cast("long").as("nc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
          sum(col("nb")).as("n_subwords"), sum(col("nc")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
          expr("(n_subwords * 10000) div n_words").as("fertility_bp"),
          expr("(n_chars * 100) div n_subwords").as("chars_per_subword_cp"))
        .orderBy("lang")),

    "q_text_tokens" -> ((s, d) =>
      docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          // BPE-ish: alpha runs, digit runs, or single non-space symbols
          size(split(trim(col("text")), "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
            .minus(1).as("n_bpeish"))
        .orderBy("doc_id")),

    // ---- quality scoring: stopword ratio + avg token length ----
    "q_text_quality" -> ((s, d) => {
      val t = col("text")
      val nTok = size(split(trim(t), "\\s+"))
      val stopHits =
        ((length(t) - length(replace(t, lit(" the "), lit("")))) / 5) +
          ((length(t) - length(replace(t, lit(" a "), lit("")))) / 3)
      val avgTokLen = (length(trim(t)) -
        (length(trim(t)) - length(replace(trim(t), lit(" "), lit(""))))).cast("double") / nTok
      docs(s, d)
        .filter(length(trim(t)) > 0)
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          round(stopHits.cast("double") / nTok, 4).as("stopword_ratio"),
          round(avgTokLen, 4).as("avg_token_len"),
          round(length(t).cast("double") / nTok, 4).as("chars_per_token"))
        .orderBy("doc_id")
    }),

    // ---- language-ID heuristic (marker-token n-gram rules) ----
    "q_lang_guess" -> ((s, d) => {
      val t = concat(lit(" "), lower(col("text")), lit(" "))
      docs(s, d).select(col("doc_id"), col("lang"),
        when(t.like("% the %") || t.like("% a %"), "en")
          .when(t.like("% der %") || t.like("% und %"), "de")
          .when(t.like("% le %") || t.like("% et %"), "fr")
          .when(t.like("% el %") || t.like("% y %"), "es")
          .otherwise("other").as("lang_guess"))
        .orderBy("doc_id")
    }),

    // ---- language-ID confusion matrix: q_lang_guess's per-doc verdicts
    //      scored against the labeled lang — the census that tells a
    //      pipeline whether the cheap stopword heuristic is good enough
    //      to route on, per (label, guess) cell with recall in bp. Same
    //      CASE ladder verbatim (the two queries can never diverge on
    //      what "guess" means); one label-pair groupBy, cells bounded by
    //      |langs|² at any corpus size ----
    "q_lang_confusion" -> ((s, d) => {
      val t = concat(lit(" "), lower(col("text")), lit(" "))
      val g = docs(s, d).select(col("lang"),
        when(t.like("% the %") || t.like("% a %"), "en")
          .when(t.like("% der %") || t.like("% und %"), "de")
          .when(t.like("% le %") || t.like("% et %"), "fr")
          .when(t.like("% el %") || t.like("% y %"), "es")
          .otherwise("other").as("lang_guess"))
      val perLabel = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
      g.groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("label_total", sum(col("n_docs")).over(perLabel))
        .select(col("lang"), col("lang_guess"), col("n_docs"),
          expr("(n_docs * 10000) div label_total").as("cell_bp"),
          when(col("lang") === col("lang_guess"), lit(1))
            .otherwise(lit(0)).as("is_correct"))
        .orderBy("lang", "lang_guess")
    }),

    // ---- language-mixing entropy (the multilingual-corpus quality
    //      signal q_lang_guess's single label can't see: a doc that is
    //      half English half German gets ONE label there, but its marker
    //      distribution has high entropy HERE — mixed-language docs are
    //      usually boilerplate collages or misparsed navigation). Marker
    //      hits per language via replace-length arithmetic (integer,
    //      engine-exact); entropy terms summed in FIXED lang order so the
    //      double chain is identical cross-engine; per-row only ----
    "q_lang_mix" -> ((s, d) => {
      val t = concat(lit(" "), lower(col("text")), lit(" "))
      def hits(markers: Seq[String]) = markers.map(m =>
        (length(t) - length(replace(t, lit(m), lit("")))) / m.length)
        .reduce(_ + _)
      val cEn = hits(Seq(" the ", " a "))
      val cDe = hits(Seq(" der ", " und "))
      val cFr = hits(Seq(" le ", " et "))
      val cEs = hits(Seq(" el ", " y "))
      val tot = cEn + cDe + cFr + cEs
      def term(c: org.apache.spark.sql.Column) =
        when(c > 0, -(c.cast("double") / col("total_hits")) *
          log2(c.cast("double") / col("total_hits"))).otherwise(lit(0.0))
      docs(s, d)
        .select(col("doc_id"), col("lang"),
          cEn.cast("long").as("c_en"), cDe.cast("long").as("c_de"),
          cFr.cast("long").as("c_fr"), cEs.cast("long").as("c_es"),
          tot.cast("long").as("total_hits"))
        .filter(col("total_hits") > 0)
        .select(col("doc_id"), col("lang"), col("total_hits"),
          ((col("c_en") > 0).cast("long") + (col("c_de") > 0).cast("long") +
            (col("c_fr") > 0).cast("long") + (col("c_es") > 0).cast("long"))
            .as("n_langs_hit"),
          round(
            ((term(col("c_en")) + term(col("c_de"))) + term(col("c_fr"))) +
              term(col("c_es")), 4).as("mix_entropy"))
        .orderBy("doc_id")
    }),

    // ---- document fingerprints: md5 (content-addressed) ----
    "q_doc_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        md5(trim(lower(col("text"))).cast("binary")).as("fp_md5"))
        .orderBy("doc_id")),

    // ---- the materialized cleaning pipeline: exact-dedup (keep min doc_id
    //      per content hash) THEN quality gates. This is the query a
    //      training-data pipeline actually ships — the dedup/quality ops
    //      composed to a cleaned corpus, not reports about it. One shuffle
    //      (the content-hash window); the quality gates are per-row ----
    "q_clean_corpus" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("doc_id").asc)
      val t = col("text")
      val nTok = size(split(trim(t), "\\s+"))
      docs(s, d)
        .withColumn("h", md5(t.cast("binary")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1) // keep first doc of each exact-dup class
        .filter(col("lang").isin("en", "de", "fr", "es"))
        .filter(nTok >= 10)
        .filter((length(t).cast("double") / nTok).between(3.0, 15.0))
        .select(col("doc_id"), col("lang"), nTok.as("n_tokens"))
        .orderBy("doc_id")
    }),

    // ---- document fingerprints: order-sensitive rolling hash (mod-P
    //      polynomial, so the oracle replicates it exactly) ----
    "q_doc_rollhash" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        graft.functions.TextExprs.rollingHash(col("text")).as("fp_roll"))
        .orderBy("doc_id")),

    // ---- TF-IDF top terms per document. Two shuffles (doc-term tf, corpus
    //      df) — both map-side-combined group-bys keyed finely enough to
    //      never hotspot; the doc count joins in as a broadcast scalar.
    //      Ranking uses the ROUNDED score so mathematically-equal scores
    //      computed via different ln() paths (2·ln(x) vs ln(x²)) can't flip
    //      order between engines — ties then break on the term ----
    "q_tfidf" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
      val toks = docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .filter(col("term").rlike("^[a-z]+$"))
        .persistTracked() // regex tokenization is the expensive stage — run it once
      // df and the doc count both derive from the tf aggregate — no second
      // distinct pass over the raw token stream. tf itself is cheap to
      // recompute from the cached tokens, so it is NOT cached: columnar
      // cache-write cost for the aggregate exceeded its reuse win (benched)
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("tfidf"))
        .orderBy("doc_id", "rk")
    }),

    // ---- stratified deterministic sampling: per-language rates via an
    //      integer LCG hash of doc_id (pure BIGINT arithmetic — bit-exact in
    //      any engine, stable across runs/partitions, no RNG state). The
    //      pattern for carving eval slices out of a 100 TB corpus: a per-row
    //      filter, no shuffle at all before the oracle ORDER BY ----
    "q_sample_stratified" -> ((s, d) => {
      // doc_id reduced mod 2³¹−1 first — the raw product wraps Long past
      // ~8·10⁹ ids (fixture results unchanged; see CorpusOps sampling)
      val bucket = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L)) % 100
      val rate = when(col("lang") === "en", 10)
        .when(col("lang").isin("de", "fr", "es"), 30)
        .otherwise(50)
      docs(s, d)
        .filter(bucket < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- inverted index (capped posting lists) — see [[invertedIndex]] ----
    "q_inverted_index" -> ((s, d) => invertedIndex(docs(s, d))),

    // ---- character-entropy quality signal: Shannon entropy of each doc's
    //      character distribution — gibberish and template boilerplate sit
    //      at the distribution's two tails, so entropy is the classic
    //      third axis next to length and stopword ratio. Computed by the
    //      native [[graft.functions.CharEntropy]] expression: one tight
    //      JVM histogram loop per ROW, zero shuffles — the explode →
    //      (doc_id, ch) shuffle → log2 aggregation formulation moved one
    //      row per character (5.2 s at sf0.1 vs 0.4 s for this plan); the
    //      SQL oracle still runs that exploded form, value-matching the
    //      per-row loop. libm log2 → rounded 4 dp, output-only ----
    "q_char_entropy" -> ((s, d) =>
      docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_ent"),
          round(graft.functions.TextExprs.charEntropy(lower(col("text"))), 4)
            .as("entropy"))
        .orderBy("doc_id")),

    // ---- PMI phrase mining: pointwise mutual information of adjacent
    //      token pairs — the statistic behind collocation/phrase
    //      detection (word2vec-style preprocessing). Bigrams come from the
    //      position expansion (sequence is stop-INCLUSIVE here, range
    //      stop-exclusive in the oracle — bounds chosen to match); counts
    //      key on the fine pair/token keys; the two totals are 1-row
    //      broadcasts. Ranking is by COUNT (integer), never by the float
    //      PMI; log2 is libm → round 4, output-only ----
    "q_pmi_phrases" -> ((s, d) => {
      val toksArr = docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(split(lower(trim(col("text"))), "\\s+").as("ts"))
        .filter(size(col("ts")) >= 2)
      val big = toksArr.select(explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) as w1, element_at(ts, i + 1) as w2))"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
      val uni = docs(s, d)
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val nu = uni.agg(sum(col("cu")).as("nu"))
      val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .filter(col("cb") >= 5)
      val nb = big.agg(count(lit(1)).as("nb"))
      bc.join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("cb"),
          round(log2((col("cb").cast("double") / col("nb").cast("double")) /
            ((col("c1").cast("double") / col("nu").cast("double")) *
              (col("c2").cast("double") / col("nu").cast("double")))), 4)
            .as("pmi"))
        .orderBy(col("cb").desc, col("w1").asc, col("w2").asc)
        .limit(20)
    }),

    // ---- trigram substring search: the scale path for LIKE '%pattern%'.
    //      A full-corpus contains() is a 100 TB scan per query; the
    //      production shape is an inverted TRIGRAM index probed by the
    //      pattern's trigrams, candidates = docs containing ALL of them
    //      (a necessary condition for a contiguous match), verify
    //      contains() on candidates only. Here the index build + probe run
    //      in one plan: per-doc trigrams via a native transform/sequence
    //      (no UDF), cut to the pattern's ~10 trigram keys BEFORE the
    //      explode (array_intersect both dedupes and prunes, so the
    //      flattened posting stream is ≤|pattern| rows per doc) — the
    //      exchange carries only matching postings (the true index-probe
    //      cost, ~selectivity·corpus), never the full posting table. Output
    //      keeps is_match so trigram false positives (all grams present,
    //      pattern not contiguous) stay visible. At 100 TB the postings
    //      frame is the one you materialize once and bucket by trigram;
    //      the probe is then an index lookup, corpus untouched until the
    //      candidate verify ----
    // ---- positional proximity search (terms within k tokens — the IR
    //      operator the substring index can't answer: "merge NEAR group",
    //      not "merge group" literally): ONE token-position explosion,
    //      term-filtered to the query terms BEFORE the persist so the
    //      positional index carries only the two posting lists (at 100 TB
    //      the index build is the corpus pass; the per-doc position join
    //      is posting-list-sized). Token split is single-space on BOTH
    //      engines so positions align exactly; the gap is a position
    //      DIFFERENCE, so the index base cancels ----
    "q_proximity_search" -> ((s, d) => {
      val (ta, tb, k) = ("merge", "group", 3)
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), " "))
            .as(Seq("pos", "term")))
        .filter(col("term").isin(ta, tb))
        .persistTracked()
      val a = toks.filter(col("term") === ta)
        .select(col("doc_id"), col("pos").as("pa"))
      val b = toks.filter(col("term") === tb)
        .select(col("doc_id"), col("pos").as("pb"))
      a.join(b, "doc_id")
        .groupBy(col("doc_id"))
        .agg(min(abs(col("pa") - col("pb"))).as("min_gap"))
        .select(col("doc_id"), col("min_gap"),
          (col("min_gap") <= k).as("is_match"))
        .orderBy("doc_id")
    }),

    // ---- multi-pattern blocklist screening (the N-phrase generalization
    //      of q_trigram_search — contamination / policy blocklists at
    //      corpus scale): ONE posting pass answers EVERY pattern. The
    //      blocklist's trigrams are plan-time literals, so the posting
    //      build keeps the r11 "cut before the explode" property for the
    //      UNION of all patterns' grams (the exchange carries only grams
    //      some pattern needs, never the full posting table); the
    //      pattern-gram table is a broadcast; a doc is a candidate for a
    //      pattern when it holds ALL of that pattern's grams, and
    //      contains() verifies — false positives stay visible, misses
    //      are impossible (the PropertySpec index guarantee). A
    //      never-matching phrase rides along: its grams are absent, so it
    //      costs nothing and fabrication would be caught by the oracle.
    //      At 100 TB: screening 10k phrases costs one corpus pass + a
    //      pattern-keyed census, not 10k scans ----
    "q_blocklist_screen" -> ((s, d) => {
      val pats = Seq("table hash", "part filter", "merge group",
        "customer join", "slow key", "quantum flux capacitor")
      val allGrams = pats.flatMap(_.sliding(3)).distinct
      val pg = s.range(1)
        .select(explode(array(pats.map(lit): _*)).as("pattern"))
        .select(col("pattern"),
          expr("array_distinct(transform(sequence(1, length(pattern) - 2)," +
            " i -> substring(pattern, i, 3)))").as("gs"))
        .select(col("pattern"), size(col("gs")).as("ng"),
          explode(col("gs")).as("g"))
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val postings = docs.select(col("doc_id"),
        explode(array_intersect(
          expr("transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3))"),
          lit(allGrams.toArray))).as("g"))
      val cand = postings.join(broadcast(pg), "g")
        .groupBy(col("doc_id"), col("pattern"), col("ng"))
        .agg(count(lit(1)).as("hit"))
        .filter(col("hit") === col("ng"))
      cand.join(docs, "doc_id")
        .select(col("pattern"), col("doc_id"),
          col("text").contains(col("pattern")).as("is_match"))
        .orderBy("pattern", "doc_id")
    }),

    "q_trigram_search" -> ((s, d) => {
      val pat = "window table"
      val patGrams = pat.sliding(3).toSeq.distinct
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val postings = docs.select(col("doc_id"),
        explode(array_intersect(
          expr("transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3))"),
          lit(patGrams.toArray))).as("g"))
      val cand = postings
        .groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
        .filter(col("ng") === lit(patGrams.size.toLong))
      cand.join(docs, "doc_id")
        .select(col("doc_id"), col("text").contains(pat).as("is_match"))
        .orderBy("doc_id")
    }),

    // ---- Jensen–Shannon divergence between the token distributions of
    //      two source arms (new in r14) — the information-theoretic
    //      corpus-drift monitor (q_psi_drift buckets values; this
    //      measures the VOCABULARY distribution shift, symmetric and
    //      bounded to [0,1] bit unlike KL). One map-side-combined token
    //      census is the entire corpus touch; the report is the top-100
    //      combined-count tokens (INTEGER ordering key, token tiebreak —
    //      deterministic), each contribution a fixed per-row FP shape
    //      over exact integers (log2 inside the rounded term, the
    //      q_mutual_info discipline), the cumulative JSD a token-ORDERED
    //      census fold (the q_benford device). Per-token JS contributions
    //      are ≥ 0 by convexity — spec-asserted ----
    "q_jsd_drift" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val cen = docs(s, d)
        .select(expr("CAST(substring(source, 4) AS BIGINT) % 2").as("arm"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("t"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
        .persistTracked()
      val tot = cen.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      val top = cen.orderBy((col("na") + col("nb")).desc, col("t").asc)
        .limit(100)
      val wCum = W.orderBy(col("t")).rowsBetween(Long.MinValue, 0)
      top.crossJoin(broadcast(tot))
        .withColumn("term", expr(JsdTerm))
        .select(col("t").as("token"), col("na"), col("nb"),
          expr("na * 10000 div ta").as("p_bp"),
          expr("nb * 10000 div tb").as("q_bp"),
          round(col("term"), 8).as("jsd_term"),
          round(sum(col("term")).over(wCum), 6).as("cum_jsd"))
        .orderBy("token")
    }),

    // ---- McNemar paired test (new in r14): do two quality gates — the
    //      char-length rule and the token-count rule — disagree more than
    //      chance on the SAME documents? The whole corpus reduces to the
    //      2×2 paired census in one pass; χ² = (b−c)²/(b+c) (+ the
    //      continuity-corrected variant) is one fixed shape on exact
    //      integers. This is the test for comparing classifiers on a
    //      shared corpus (accuracy deltas ignore pairing) ----
    "q_mcnemar" -> ((s, d) => {
      val a = (col("n_chars") >= 250).cast("long")
      val b = (size(split(trim(col("text")), "\\s+")) >= 40).cast("long")
      docs(s, d)
        .select(a.as("ra"), b.as("rb"))
        .agg(sum(expr("ra * rb")).as("n11"),
          sum(expr("ra * (1 - rb)")).as("n10"),
          sum(expr("(1 - ra) * rb")).as("n01"),
          sum(expr("(1 - ra) * (1 - rb)")).as("n00"))
        .select(col("n11"), col("n10"), col("n01"), col("n00"),
          round(expr("cast((n10 - n01) * (n10 - n01) as double) / " +
            "(n10 + n01)"), 6).as("chi2"),
          round(expr("cast((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) " +
            "as double) / (n10 + n01)"), 6).as("chi2_cc"))
    }),

    // ---- Cohen's κ inter-rater agreement (new in r14): the stored lang
    //      label vs the q_lang_guess heuristic, agreement CORRECTED FOR
    //      CHANCE. From the ≤36-cell confusion census: κ = (N·Σn_ii −
    //      Σr_i·c_i) / (N² − Σr_i·c_i) — ALL-INTEGER in decimal(38,0)
    //      (N² wraps int64 past ~3G docs) until the single κ division,
    //      so the gate is hash-exact at any corpus size ----
    "q_cohen_kappa" -> ((s, d) => {
      val t = concat(lit(" "), lower(col("text")), lit(" "))
      val conf = docs(s, d).select(col("lang").as("r"),
          when(t.like("% the %") || t.like("% a %"), "en")
            .when(t.like("% der %") || t.like("% und %"), "de")
            .when(t.like("% le %") || t.like("% et %"), "fr")
            .when(t.like("% el %") || t.like("% y %"), "es")
            .otherwise("other").as("g"))
        .groupBy(col("r"), col("g")).agg(count(lit(1)).as("n_rg"))
        .persistTracked()
      val tot = conf.agg(sum(col("n_rg")).as("n"),
        sum(when(col("r") === col("g"), col("n_rg")).otherwise(0L))
          .as("diag"))
      val rows = conf.groupBy(col("r").as("lbl"))
        .agg(sum(col("n_rg")).as("ri"))
      val cols = conf.groupBy(col("g").as("lbl"))
        .agg(sum(col("n_rg")).as("ci"))
      val pe = rows.join(cols, "lbl")
        .agg(sum(expr("cast(ri as decimal(38,0)) * ci")).as("src"))
      tot.crossJoin(broadcast(pe))
        .select(col("n").as("n_docs"),
          expr("diag * 10000 div n").as("po_bp"),
          expr("src * 10000 div (cast(n as decimal(38,0)) * n)")
            .cast("long").as("pe_bp"),
          round(expr("cast(cast(n as decimal(38,0)) * diag - src as double)" +
            " / cast(cast(n as decimal(38,0)) * n - src as double)"), 6)
            .as("kappa"))
    }),

    // ---- per-source KL divergence from the corpus LM (new in r14) —
    //      q_jsd_drift ranks ONE pair of arms; this ranks EVERY source
    //      by how far its unigram distribution sits from the corpus,
    //      restricted to the global top-100 token census (bounded; the
    //      reported number is the partial KL over that census plus its
    //      coverage share, so the truncation is visible, not silent).
    //      Terms can be negative, so the per-source fold takes the LAST
    //      cumulative value via max_by(cum, rn) — not the max — over
    //      the (source × 100)-bounded census; log2 stays inside the
    //      per-row term (the q_mutual_info discipline) ----
    "q_kl_source" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val tok = docs(s, d)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .filter(col("t") =!= "")
        .persistTracked()
      val glob = tok.groupBy(col("t")).agg(count(lit(1)).as("gc"))
        .persistTracked()
      val gtot = glob.agg(sum(col("gc")).as("gn"))
      val top = glob.orderBy(col("gc").desc, col("t").asc).limit(100)
      val st = tok.groupBy(col("source")).agg(count(lit(1)).as("sn"))
      val cnt = tok.join(broadcast(top.select(col("t"))), "t")
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("sc"))
      val wSrc = W.partitionBy(col("source")).orderBy(col("t"))
      val scored = cnt.join(broadcast(top), Seq("t"))
        .join(broadcast(st), "source")
        .crossJoin(broadcast(gtot))
        .withColumn("term", expr(KlTerm))
        .withColumn("rn", row_number().over(wSrc))
        .withColumn("cum",
          sum(col("term")).over(wSrc.rowsBetween(Long.MinValue, 0)))
      scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_top"), max(col("sn")).as("n_tok"),
          sum(col("sc")).as("n_covered"),
          max_by(col("cum"), col("rn")).as("klraw"))
        .select(col("source"), col("n_top"), col("n_tok"),
          expr("n_covered * 10000 div n_tok").as("coverage_bp"),
          round(col("klraw"), 6).as("kl_bits"))
        .orderBy("source")
    })
  )

  /** q_kl_source per-token term — ONE expression text shared with the
    * oracle (columns sc, sn, gc, gn in scope): p_src·log2(p_src/p_corpus)
    * in the cross-multiplied shape.
    */
  private val KlTerm =
    "(cast(sc as double) / sn) * " +
      "log2((cast(sc as double) * gn) / (cast(sn as double) * gc))"

  /** Inverted index with capped posting lists: term → document frequency +
    * the first-`postingCap` posting list (terms with df ≥ `minDf`). TWO
    * aggregations on the SAME term key: df over ALL postings (so the cap
    * can't undercount), and the posting list through a row_number
    * pre-filter (the cappedBuckets bound from DedupOps) so the Zipf-head
    * term's reducer buffer is cap-bounded instead of scaling with the
    * corpus. Both aggregations and their join hash-partition on term, so
    * Catalyst reuses one exchange. Postings render as a CSV string — the
    * driver-hashable form (matches q_array_agg precedent). Exposed for
    * spec-level stress inputs (a corpus-wide stop word).
    */
  def invertedIndex(documents: DataFrame, postingCap: Int = 20,
      minDf: Long = 25): DataFrame = {
    val t = documents
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(col("term").rlike("^[a-z]{4,}$"))
      .distinct()
    val dfreq = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val postings = t.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= postingCap)
      .groupBy(col("term"))
      .agg(array_join(array_sort(collect_list(col("doc_id"))), ",")
        .as("postings"))
    dfreq.filter(col("df") >= minDf)
      .join(postings, "term")
      .select(col("term"), col("df"), col("postings"))
      .orderBy("term")
  }

  /** DuckDB twin of [[mergeRound]] — same fold, ends_with for endswith.
    * NOTE: this string is inlined into an outer stripMargin template, so
    * no line may start with '|' after whitespace (concat operators sit at
    * line ends) — the outer strip would otherwise eat them as margins. */
  private def mergeRoundSql(prev: String, i: Int): String =
    s"""list_reduce(list_prepend(CAST('' AS VARCHAR),
       |  list_filter(string_split($prev, ' '), t -> t <> '')),
       |  (acc, t) -> CASE
       |    WHEN acc = '' THEN t
       |    WHEN (acc = m.x$i OR ends_with(acc, ' ' || m.x$i)) AND t = m.y$i
       |      THEN substr(acc, 1, length(acc) - length(m.x$i)) ||
       |           m.x$i || '+' || m.y$i
       |    ELSE acc || ' ' || t END)""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical vocab census, wrapped-form replace, and argmax tie-break
    "q_bpe_train" -> {
      def toks(s: String) =
        s"list_filter(string_split($s, '$BpeDelim'), t -> t <> '')"
      val rounds = (1 to 3).map { r =>
        val prev = if (r == 1) "wc" else s"s${r - 1}"
        s"""p$r AS (
           |  SELECT l[i] AS x, l[i + 1] AS y, n FROM (
           |    SELECT n, l, unnest(range(1, len(l))) AS i FROM (
           |      SELECT n, ${toks("s")} AS l FROM $prev))),
           |b$r AS (SELECT x, y, CAST(sum(n) AS BIGINT) AS cnt
           |        FROM p$r GROUP BY x, y
           |        ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
           |s$r AS (SELECT w, n,
           |          replace(s, '$BpeDelim' || x || '$BpeDelim$BpeDelim' || y || '$BpeDelim',
           |                  '$BpeDelim' || x || y || '$BpeDelim') AS s
           |        FROM $prev, b$r),
           |rep$r AS (
           |  SELECT CAST($r AS BIGINT) AS round, x, y, cnt AS pair_n,
           |         CAST(sum(n * len(${toks("s")})) AS BIGINT) AS n_symbols
           |  FROM s$r, b$r GROUP BY 1, 2, 3, 4)""".stripMargin
      }.mkString(",\n")
      s"""WITH wc0 AS (
         |  SELECT t.w AS w, count(*) AS n
         |  FROM documents,
         |       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(w)
         |  WHERE length(t.w) >= 2 GROUP BY t.w),
         |wc AS MATERIALIZED (
         |  SELECT w, n, regexp_replace(w, '(.)', '$BpeDelim\\1$BpeDelim', 'g') AS s
         |  FROM wc0),
         |$rounds
         |SELECT * FROM rep1 UNION ALL SELECT * FROM rep2
         |UNION ALL SELECT * FROM rep3 ORDER BY round""".stripMargin
    },

    // the oracle re-derives the same top-8 merge table and replays the
    // same greedy per-merge fold
    "q_phrase_merge" -> {
      val fin = (1 to 8)
        .foldLeft("array_to_string(ws.ws, ' ')")((p, i) => mergeRoundSql(p, i))
      val pivot = (1 to 8).map(i =>
        s"max(CASE WHEN rk = $i THEN w1 END) AS x$i, " +
          s"max(CASE WHEN rk = $i THEN w2 END) AS y$i").mkString(", ")
      s"""WITH ws AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |                     t -> t <> '') AS ws
         |  FROM documents WHERE length(trim(text)) > 0),
         |bg AS (SELECT t.p.w1 AS w1, t.p.w2 AS w2
         |       FROM ws, unnest([{'w1': ws.ws[i], 'w2': ws.ws[i+1]}
         |                        for i in range(1, len(ws.ws))]) AS t(p)
         |       WHERE len(ws.ws) >= 2),
         |bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
         |rk AS (SELECT w1, w2,
         |         row_number() OVER (ORDER BY cb DESC, w1, w2) AS rk
         |       FROM bc QUALIFY rk <= 8),
         |m AS (SELECT $pivot FROM rk),
         |t AS (SELECT ws.doc_id, len(ws.ws) AS nb, $fin AS fin
         |      FROM ws CROSS JOIN m)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_tok_before,
         |       CAST(len(string_split(fin, ' ')) AS BIGINT) AS n_tok_after,
         |       CAST(nb - len(string_split(fin, ' ')) AS BIGINT) AS n_merged
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "q_lang_mix" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' the ', ''))) // 5
        |    + (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' a ', ''))) // 3
        |      AS c_en,
        |    (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' der ', ''))) // 5
        |    + (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' und ', ''))) // 5
        |      AS c_de,
        |    (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' le ', ''))) // 4
        |    + (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' et ', ''))) // 4
        |      AS c_fr,
        |    (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' el ', ''))) // 4
        |    + (length(' ' || lower(text) || ' ')
        |     - length(replace(' ' || lower(text) || ' ', ' y ', ''))) // 3
        |      AS c_es
        |  FROM documents),
        |t AS (SELECT doc_id, lang, c_en, c_de, c_fr, c_es,
        |             c_en + c_de + c_fr + c_es AS total_hits
        |      FROM h WHERE c_en + c_de + c_fr + c_es > 0)
        |SELECT doc_id, lang, CAST(total_hits AS BIGINT) AS total_hits,
        |  CAST((CASE WHEN c_en > 0 THEN 1 ELSE 0 END)
        |     + (CASE WHEN c_de > 0 THEN 1 ELSE 0 END)
        |     + (CASE WHEN c_fr > 0 THEN 1 ELSE 0 END)
        |     + (CASE WHEN c_es > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_langs_hit,
        |  round(
        |    ((CASE WHEN c_en > 0 THEN -(CAST(c_en AS DOUBLE) / total_hits)
        |          * log2(CAST(c_en AS DOUBLE) / total_hits) ELSE 0 END
        |     + CASE WHEN c_de > 0 THEN -(CAST(c_de AS DOUBLE) / total_hits)
        |          * log2(CAST(c_de AS DOUBLE) / total_hits) ELSE 0 END)
        |     + CASE WHEN c_fr > 0 THEN -(CAST(c_fr AS DOUBLE) / total_hits)
        |          * log2(CAST(c_fr AS DOUBLE) / total_hits) ELSE 0 END)
        |     + CASE WHEN c_es > 0 THEN -(CAST(c_es AS DOUBLE) / total_hits)
        |          * log2(CAST(c_es AS DOUBLE) / total_hits) ELSE 0 END, 4)
        |    AS mix_entropy
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, t.ch
        |  FROM documents,
        |       unnest(string_split(lower(text), '')) AS t(ch)
        |  WHERE length(trim(text)) > 0),
        |freq AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
        |len AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS len
        |        FROM freq GROUP BY doc_id)
        |SELECT f.doc_id, min(l.len) AS n_chars_ent,
        |       round(-sum((CAST(f.c AS DOUBLE) / CAST(l.len AS DOUBLE)) *
        |         log2(CAST(f.c AS DOUBLE) / CAST(l.len AS DOUBLE))), 4)
        |         AS entropy
        |FROM freq f JOIN len l ON f.doc_id = l.doc_id
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,

    "q_pmi_phrases" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |big AS (
        |  SELECT list_extract(ts, CAST(i AS INTEGER)) AS w1,
        |         list_extract(ts, CAST(i AS INTEGER) + 1) AS w2
        |  FROM t, unnest(range(1, len(ts))) AS r(i)
        |  WHERE len(ts) >= 2),
        |uni AS (
        |  SELECT t.w, count(*) AS cu
        |  FROM documents,
        |       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(w)
        |  WHERE length(trim(text)) > 0 GROUP BY t.w),
        |nu AS (SELECT CAST(sum(cu) AS BIGINT) AS nu FROM uni),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM big
        |       GROUP BY w1, w2 HAVING count(*) >= 5),
        |nb AS (SELECT count(*) AS nb FROM big)
        |SELECT bc.w1, bc.w2, bc.cb,
        |       round(log2((CAST(bc.cb AS DOUBLE) / CAST(nb.nb AS DOUBLE)) /
        |         ((CAST(u1.cu AS DOUBLE) / CAST(nu.nu AS DOUBLE)) *
        |          (CAST(u2.cu AS DOUBLE) / CAST(nu.nu AS DOUBLE)))), 4) AS pmi
        |FROM bc JOIN uni u1 ON bc.w1 = u1.w
        |        JOIN uni u2 ON bc.w2 = u2.w, nu, nb
        |ORDER BY bc.cb DESC, bc.w1 ASC, bc.w2 ASC LIMIT 20""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id, n_chars, length(text) AS n_chars_calc,
        |       length(text) - length(replace(text, ' ', '')) AS n_spaces,
        |       length(text) - length(replace(text, '.', '')) AS n_periods
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same normalize → sort → distinct → fingerprint chain (DuckDB needs
    // the explicit 'g' regexp flag Spark defaults to; list_sort and
    // Spark's array_sort agree on plain lexicographic string order)
    "q_bow_dedup" ->
      """WITH m AS MATERIALIZED (
        |  SELECT doc_id, source,
        |         md5(list_aggregate(list_sort(list_distinct(list_filter(
        |             regexp_split_to_array(regexp_replace(lower(trim(text)),
        |               '[0-9]+', '#', 'g'), '\s+'),
        |             t -> t <> ''))), 'string_agg', ' ')) AS tfp,
        |         md5(text) AS efp
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT tfp, count(*) AS n_docs,
        |       count(DISTINCT efp) AS n_exact_variants,
        |       count(DISTINCT source) AS n_sources,
        |       min(doc_id) AS exemplar_doc
        |FROM m GROUP BY tfp HAVING count(*) >= 2
        |ORDER BY n_docs DESC, tfp ASC LIMIT 20""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH t AS MATERIALIZED (
        |  SELECT lang,
        |         CAST(length(regexp_split_to_array(trim(text), '\s+'))
        |              AS BIGINT) AS nw,
        |         CAST(length(regexp_split_to_array(trim(text),
        |              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) - 1
        |              AS BIGINT) AS nb,
        |         CAST(length(text) AS BIGINT) AS nc
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS n_words,
        |       CAST(sum(nb) AS BIGINT) AS n_subwords,
        |       (CAST(sum(nb) AS BIGINT) * 10000)
        |         // CAST(sum(nw) AS BIGINT) AS fertility_bp,
        |       (CAST(sum(nc) AS BIGINT) * 100)
        |         // CAST(sum(nb) AS BIGINT) AS chars_per_subword_cp
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |       length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |       length(regexp_split_to_array(trim(text),
        |              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) - 1 AS n_bpeish
        |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id,
        |       length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |       round(CAST((length(text) - length(replace(text, ' the ', ''))) // 5
        |                + (length(text) - length(replace(text, ' a ', ''))) // 3 AS DOUBLE)
        |             / length(regexp_split_to_array(trim(text), '\s+')), 4) AS stopword_ratio,
        |       round(CAST(length(trim(text))
        |                - (length(trim(text)) - length(replace(trim(text), ' ', ''))) AS DOUBLE)
        |             / length(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_token_len,
        |       round(CAST(length(text) AS DOUBLE)
        |             / length(regexp_split_to_array(trim(text), '\s+')), 4) AS chars_per_token
        |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin,

    // same CASE ladder, same per-label window
    "q_lang_confusion" ->
      """WITH g AS MATERIALIZED (
        |  SELECT lang,
        |         CASE WHEN concat(' ', lower(text), ' ') LIKE '% the %'
        |                OR concat(' ', lower(text), ' ') LIKE '% a %'
        |              THEN 'en'
        |              WHEN concat(' ', lower(text), ' ') LIKE '% der %'
        |                OR concat(' ', lower(text), ' ') LIKE '% und %'
        |              THEN 'de'
        |              WHEN concat(' ', lower(text), ' ') LIKE '% le %'
        |                OR concat(' ', lower(text), ' ') LIKE '% et %'
        |              THEN 'fr'
        |              WHEN concat(' ', lower(text), ' ') LIKE '% el %'
        |                OR concat(' ', lower(text), ' ') LIKE '% y %'
        |              THEN 'es'
        |              ELSE 'other' END AS lang_guess
        |  FROM documents),
        |c AS (SELECT lang, lang_guess, count(*) AS n_docs
        |      FROM g GROUP BY lang, lang_guess)
        |SELECT lang, lang_guess, n_docs,
        |       (n_docs * 10000) // CAST(sum(n_docs)
        |          OVER (PARTITION BY lang) AS BIGINT) AS cell_bp,
        |       CASE WHEN lang = lang_guess THEN 1 ELSE 0 END AS is_correct
        |FROM c ORDER BY lang, lang_guess""".stripMargin,

    "q_lang_guess" ->
      """SELECT doc_id, lang,
        |       CASE WHEN concat(' ', lower(text), ' ') LIKE '% the %'
        |              OR concat(' ', lower(text), ' ') LIKE '% a %' THEN 'en'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% der %'
        |              OR concat(' ', lower(text), ' ') LIKE '% und %' THEN 'de'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% le %'
        |              OR concat(' ', lower(text), ' ') LIKE '% et %' THEN 'fr'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% el %'
        |              OR concat(' ', lower(text), ' ') LIKE '% y %' THEN 'es'
        |            ELSE 'other' END AS lang_guess
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(trim(lower(text))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_doc_rollhash" ->
      s"""SELECT doc_id, ${graft.functions.TextExprs.rollingHashSql("text")} AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term
        |  FROM documents, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t(term)
        |  WHERE length(trim(text)) > 0 AND regexp_matches(t.term, '^[a-z]+$')),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
        |              round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        |       FROM tf JOIN dfreq USING (term), nd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tfidf DESC, term ASC) AS rk FROM sc)
        |SELECT doc_id, rk, term, tf, tfidf FROM r
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647) % 100 <
        |      CASE WHEN lang = 'en' THEN 10
        |           WHEN lang IN ('de', 'fr', 'es') THEN 30
        |           ELSE 50 END
        |ORDER BY doc_id""".stripMargin,

    "q_clean_corpus" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |         length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens
        |FROM d
        |WHERE rn = 1 AND lang IN ('en', 'de', 'fr', 'es')
        |  AND n_tokens >= 10
        |  AND CAST(length(text) AS DOUBLE) / n_tokens BETWEEN 3.0 AND 15.0
        |ORDER BY doc_id""".stripMargin,

    // df computed over ALL (doc, term) rows; the posting list capped at the
    // 20 smallest doc_ids — mirrors the Spark row_number pre-filter
    "q_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |f AS (SELECT DISTINCT doc_id, term FROM t
        |      WHERE regexp_matches(term, '^[a-z]{4,}$')),
        |df AS (SELECT term, count(*) AS df FROM f GROUP BY term),
        |pl AS (SELECT term,
        |              array_to_string(list_sort(list(doc_id)), ',') AS postings
        |       FROM (SELECT term, doc_id,
        |                    row_number() OVER (PARTITION BY term
        |                                       ORDER BY doc_id) AS rn
        |             FROM f)
        |       WHERE rn <= 20 GROUP BY term)
        |SELECT term, df, postings
        |FROM df JOIN pl USING (term)
        |WHERE df >= 25 ORDER BY term""".stripMargin,

    // same single-space positional split (1-indexed here, 0-indexed in
    // Spark — differences cancel), same min-gap census
    "q_proximity_search" ->
      """WITH t AS MATERIALIZED (
        |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        |  FROM documents),
        |p AS MATERIALIZED (
        |  SELECT doc_id, w[CAST(i AS INT)] AS term, CAST(i AS INT) AS pos
        |  FROM t, unnest(range(1, len(w) + 1)) r(i)
        |  WHERE w[CAST(i AS INT)] IN ('merge', 'group')),
        |a AS (SELECT doc_id, pos FROM p WHERE term = 'merge'),
        |b AS (SELECT doc_id, pos FROM p WHERE term = 'group')
        |SELECT doc_id, min(abs(a.pos - b.pos)) AS min_gap,
        |       min(abs(a.pos - b.pos)) <= 3 AS is_match
        |FROM a JOIN b USING (doc_id)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same pattern-gram pre-cut, same all-grams-present candidate rule,
    // same contains() verify — per pattern
    "q_blocklist_screen" ->
      """WITH pats AS MATERIALIZED (
        |  SELECT * FROM (VALUES ('table hash'), ('part filter'),
        |    ('merge group'), ('customer join'), ('slow key'),
        |    ('quantum flux capacitor')) p(pattern)),
        |pg AS MATERIALIZED (
        |  SELECT DISTINCT pattern, substr(pattern, CAST(i AS INT), 3) AS g
        |  FROM pats, unnest(range(1, length(pattern) - 1)) r(i)),
        |ng AS MATERIALIZED (
        |  SELECT pattern, count(*) AS ng FROM pg GROUP BY pattern),
        |post AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
        |  FROM documents, unnest(range(1, length(text) - 1)) r(i)
        |  WHERE substr(text, CAST(i AS INT), 3) IN (SELECT g FROM pg)),
        |cand AS (
        |  SELECT doc_id, p.pattern
        |  FROM post JOIN pg p USING (g) JOIN ng USING (pattern)
        |  GROUP BY doc_id, p.pattern, ng
        |  HAVING count(*) = ng)
        |SELECT pattern, doc_id, contains(text, pattern) AS is_match
        |FROM cand JOIN documents USING (doc_id)
        |ORDER BY pattern, doc_id""".stripMargin,

    // same trigram index probe: all pattern grams present -> candidate,
    // contains() verifies; false positives stay visible
    "q_trigram_search" ->
      """WITH idx AS MATERIALIZED (
        |  -- position range derived from the corpus, not a hard cap: a doc
        |  -- longer than any fixed constant would silently lose trigrams
        |  -- past it and the candidate set could miss true matches (the
        |  -- scalar list range + unnest form, because DuckDB's range TABLE
        |  -- function only accepts constant bounds)
        |  SELECT CAST(u.i AS INT) AS i FROM (
        |    SELECT unnest(range(1, (SELECT max(length(text))
        |                            FROM documents))) AS i) u),
        |g AS MATERIALIZED (
        |  SELECT DISTINCT substr(pat, i, 3) AS g
        |  FROM (SELECT 'window table' AS pat) p JOIN idx
        |    ON i <= length(pat) - 2),
        |post AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 3) AS g
        |  FROM documents JOIN idx ON i <= length(text) - 2),
        |cand AS (
        |  SELECT doc_id FROM post JOIN g USING (g)
        |  GROUP BY doc_id
        |  HAVING count(*) = (SELECT count(*) FROM g))
        |SELECT doc_id, contains(text, 'window table') AS is_match
        |FROM cand JOIN documents USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // identical token census, the SAME shared per-token expression text
    // (JsdTerm), integer top-100 key, token-ordered census fold
    "q_jsd_drift" ->
      s"""WITH tok AS (
         |  SELECT CAST(substring(source, 4) AS BIGINT) % 2 AS arm, t.w AS t
         |  FROM documents,
         |       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |         AS t(w)
         |  WHERE t.w <> ''),
         |cen AS MATERIALIZED (
         |  SELECT t,
         |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS na,
         |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS nb
         |  FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
         |               CAST(sum(nb) AS BIGINT) AS tb FROM cen),
         |top AS (SELECT * FROM cen ORDER BY na + nb DESC, t ASC LIMIT 100),
         |j AS (SELECT t, na, nb, ta, tb, $JsdTerm AS term FROM top, tot)
         |SELECT t AS token, na, nb,
         |       (na * 10000) // ta AS p_bp,
         |       (nb * 10000) // tb AS q_bp,
         |       round(term, 8) AS jsd_term,
         |       round(sum(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
         |             PRECEDING AND CURRENT ROW), 6) AS cum_jsd
         |FROM j ORDER BY token""".stripMargin,

    // identical paired 2×2 census and fixed χ² shape
    "q_mcnemar" ->
      """WITH r AS (
        |  SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS ra,
        |         CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
        |              >= 40 THEN 1 ELSE 0 END AS rb
        |  FROM documents),
        |cen AS (SELECT CAST(sum(ra * rb) AS BIGINT) AS n11,
        |               CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
        |               CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
        |               CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
        |        FROM r)
        |SELECT n11, n10, n01, n00,
        |       round(CAST((n10 - n01) * (n10 - n01) AS DOUBLE) /
        |             (n10 + n01), 6) AS chi2,
        |       round(CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
        |             AS DOUBLE) / (n10 + n01), 6) AS chi2_cc
        |FROM cen""".stripMargin,

    // the q_lang_guess CASE verbatim, all-integer HUGEINT κ parts,
    // one final division
    "q_cohen_kappa" ->
      """WITH conf AS MATERIALIZED (
        |  SELECT lang AS r,
        |       CASE WHEN concat(' ', lower(text), ' ') LIKE '% the %'
        |              OR concat(' ', lower(text), ' ') LIKE '% a %' THEN 'en'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% der %'
        |              OR concat(' ', lower(text), ' ') LIKE '% und %' THEN 'de'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% le %'
        |              OR concat(' ', lower(text), ' ') LIKE '% et %' THEN 'fr'
        |            WHEN concat(' ', lower(text), ' ') LIKE '% el %'
        |              OR concat(' ', lower(text), ' ') LIKE '% y %' THEN 'es'
        |            ELSE 'other' END AS g,
        |         count(*) AS n_rg
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_rg) AS BIGINT) AS n,
        |               CAST(sum(CASE WHEN r = g THEN n_rg ELSE 0 END)
        |                    AS BIGINT) AS diag
        |        FROM conf),
        |rws AS (SELECT r AS lbl, sum(n_rg) AS ri FROM conf GROUP BY 1),
        |cls AS (SELECT g AS lbl, sum(n_rg) AS ci FROM conf GROUP BY 1),
        |pe AS (SELECT sum(CAST(ri AS HUGEINT) * ci) AS src
        |       FROM rws JOIN cls USING (lbl))
        |SELECT n AS n_docs,
        |       CAST(diag * 10000 // n AS BIGINT) AS po_bp,
        |       CAST(src * 10000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |         AS pe_bp,
        |       round(CAST(CAST(n AS HUGEINT) * diag - src AS DOUBLE) /
        |             CAST(CAST(n AS HUGEINT) * n - src AS DOUBLE), 6)
        |         AS kappa
        |FROM tot, pe""".stripMargin,

    // identical top-100 census, the SAME shared term text (KlTerm),
    // last-cumulative via max_by over the token-ordered fold
    "q_kl_source" ->
      s"""WITH tok AS MATERIALIZED (
         |  SELECT source, t.w AS t
         |  FROM documents,
         |       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |         AS t(w)
         |  WHERE t.w <> ''),
         |gl AS MATERIALIZED (
         |  SELECT t, count(*) AS gc FROM tok GROUP BY 1),
         |gtot AS (SELECT CAST(sum(gc) AS BIGINT) AS gn FROM gl),
         |top AS (SELECT t, gc FROM gl
         |        ORDER BY gc DESC, t ASC LIMIT 100),
         |st AS (SELECT source, count(*) AS sn FROM tok GROUP BY 1),
         |cnt AS (SELECT source, tok.t AS t, count(*) AS sc
         |        FROM tok JOIN top ON tok.t = top.t
         |        GROUP BY 1, 2),
         |scored AS (
         |  SELECT source, sc, sn,
         |         $KlTerm AS term,
         |         row_number() OVER w AS rn,
         |         sum($KlTerm) OVER (PARTITION BY source ORDER BY t
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS cum
         |  FROM cnt JOIN top USING (t) JOIN st USING (source), gtot
         |  WINDOW w AS (PARTITION BY source ORDER BY t))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_top,
         |       CAST(max(sn) AS BIGINT) AS n_tok,
         |       CAST(sum(sc) * 10000 // max(sn) AS BIGINT) AS coverage_bp,
         |       round(max_by(cum, rn), 6) AS kl_bits
         |FROM scored GROUP BY source ORDER BY source""".stripMargin
  )
}
