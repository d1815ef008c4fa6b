package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the corpus-curation + temporal operators
  * (CorpusOps / TemporalOps) — each already value-exact vs the DuckDB
  * oracle; these assert the properties the oracle can't see (probability
  * mass, gate selectivity, quantization error bounds, interval validity).
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {

  test("domain mix weights form a probability distribution") {
    val rows = q("q_domain_mix").collect()
    val tot = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(tot - 1.0) < 1e-3, s"weights sum to $tot")
    assert(rows.forall(_.getAs[Double]("mix_weight") > 0))
    // temperature < 1 flattens: the weight ratio between the largest and
    // smallest domain must be LESS extreme than the raw token-mass ratio
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    val rawRatio = byTok.last.getAs[Long]("n_tokens").toDouble /
      byTok.head.getAs[Long]("n_tokens")
    val mixRatio = byTok.last.getAs[Double]("mix_weight") /
      byTok.head.getAs[Double]("mix_weight")
    assert(mixRatio < rawRatio)
  }

  test("curriculum quartiles partition each lang into ~equal bins") {
    val rows = q("q_curriculum").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, bins) =>
      assert(bins.map(_.getAs[Int]("bin")).sorted.toSeq == Seq(0, 1, 2, 3),
        s"$lang missing bins")
      val counts = bins.map(_.getAs[Long]("n_docs"))
      val n = counts.sum
      counts.foreach { c =>
        // tie-free scores → every bin holds 25% ± discreteness
        assert(math.abs(c - n / 4.0) <= n / 8.0 + 2, s"$lang bin of $c vs n=$n")
      }
      // bins are ordered by quality: average scores strictly increase
      val avgs = bins.sortBy(_.getAs[Int]("bin")).map(_.getAs[Double]("avg_score"))
      assert(avgs.zip(avgs.tail).forall { case (a, b) => a < b }, s"$lang $avgs")
    }
  }

  test("bigram LM score is total, positive, and conserves bigram counts") {
    val rows = q("q_bigram_lm").collect()
    val want = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        (size(split(lower(trim(col("text"))), "\\s+")) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == want.keySet)
    rows.foreach { r =>
      // n_bigrams = tokens - 1 (every adjacent pair scored exactly once)
      assert(r.getAs[Long]("n_bigrams") == want(r.getAs[Long]("doc_id")))
      // -ln P > 0: c2+1 <= c1+V strictly for any real vocab
      assert(r.getAs[Double]("xent2") > 0.0)
    }
  }

  test("weighted sample is fixed-size, deterministic, and token-biased") {
    val rows = q("q_sample_weighted").collect()
    assert(rows.length == 50)
    // deterministic: same LCG priorities on a second run
    assert(q("q_sample_weighted").collect().map(_.getLong(0)).toSeq ==
      rows.map(_.getLong(0)).toSeq)
    // priority u/w favors token-heavy docs: the sample's mean token count
    // must clearly exceed the population's
    val sampleAvg = rows.map(_.getAs[Long]("n_tok")).sum.toDouble / rows.length
    val pop = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(avg(col("n"))).head.getDouble(0)
    // 50-of-500 at sf0.001 gives a moderate but unmistakable tilt (~1.15×)
    assert(sampleAvg > pop * 1.05, s"sample avg $sampleAvg vs population $pop")
  }

  test("quality gate keeps ~75% of each lang") {
    val kept = q("q_quality_percentile").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_kept")).toMap
    val all = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    all.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      // percent_rank >= 0.25 keeps ceil(0.75·(n-1)) + 1-ish rows
      assert(k <= n && k >= (0.7 * n).toLong - 1, s"$lang kept $k of $n")
    }
  }

  test("approx quality gate tracks the exact gate within the sketch bound") {
    // equivalence bound between the scale path (sketch threshold) and the
    // exact anchor (percent_rank): per-lang kept counts within
    // max(2, 5% of lang population), and every bound flag green
    val exact = q("q_quality_percentile").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_kept")).toMap
    val approx = graft.queries.CorpusOps
      .qualityGateApprox(Tables(spark, sf, "documents")).collect()
      .map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept")))
    assert(approx.nonEmpty && approx.map(_._1).toSet == exact.keySet)
    approx.foreach { case (lang, n, kept) =>
      val bound = math.max(2L, (0.05 * n).toLong)
      assert(math.abs(kept - exact(lang)) <= bound,
        s"$lang: approx kept $kept vs exact ${exact(lang)} (n=$n)")
    }
    val flags = q("q_quality_gate_approx").collect()
    assert(flags.forall(_.getAs[Boolean]("keep_frac_ok")))
  }

  test("bm25 scores are positive and favor term-dense docs") {
    val rows = q("q_bm25").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("bm25") > 0))
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 &&
      r.getAs[Long]("n_terms") <= 3))
  }

  test("lm score: cross-entropy is bounded by the corpus unigram extremes") {
    // avg -ln P(t) must lie between the entropy of the most and least
    // common tokens — a doc can't score outside the support of the LM
    val rows = q("q_lm_score").collect()
    assert(rows.nonEmpty)
    val toks = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().agg(
        sum(col("count")), max(col("count")), min(col("count"))).head
    val (tot, cMax, cMin) =
      (toks.getLong(0).toDouble, toks.getLong(1).toDouble, toks.getLong(2).toDouble)
    val (lo, hi) = (math.log(tot / cMax), math.log(tot / cMin))
    rows.foreach { r =>
      val x = r.getAs[Double]("xent")
      assert(x >= lo - 1e-3 && x <= hi + 1e-3, s"doc ${r.getLong(0)}: $x not in [$lo, $hi]")
    }
  }

  test("domain sample: rates valid, kept within budget, deterministic") {
    val rows = q("q_domain_sample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate_pct")
      assert(rate > 0.0 && rate <= 100.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // the rates allocate a 50%-of-corpus budget; sources capped at 100%
    // under-spend it and the LCG bucket adds sampling noise — the total
    // kept fraction must still land in a loose band around the budget
    val kept = rows.map(_.getAs[Long]("n_kept")).sum.toDouble
    val tot = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    assert(kept / tot > 0.2 && kept / tot < 0.8, s"kept ${kept / tot} of corpus")
    // deterministic: the same sample on every run
    val again = q("q_domain_sample").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("vocab coverage: oov fraction is a valid ratio") {
    val rows = q("q_vocab_coverage").collect()
    assert(rows.forall { r =>
      val f = r.getAs[Double]("avg_oov_frac"); f >= 0.0 && f <= 1.0
    })
  }

  test("embedding quantization error is within the int8 step bound") {
    val rows = q("q_embed_quantize").collect()
    assert(rows.nonEmpty)
    // worst-case per-dim error is half a step: range/255/2. Ranges here are
    // O(1) (unit-ish floats), so RMSE·1000 must be well under half a step
    // of a range-4 dimension = 4/255/2·1000 ≈ 7.8
    assert(rows.forall { r =>
      val e = r.getAs[Double]("rmse_milli"); e >= 0.0 && e < 8.0
    })
  }

  test("length histogram conserves docs and tokens") {
    val h = q("q_len_histogram").collect()
    val base = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(count(lit(1)), sum(col("n"))).head
    assert(h.map(_.getAs[Long]("n_docs")).sum == base.getLong(0))
    assert(h.map(_.getAs[Long]("sum_tokens")).sum == base.getLong(1))
    // every member's length lies inside its 16-wide bin by construction:
    // bin_lo values are multiples of 16
    assert(h.forall(_.getAs[Long]("bin_lo") % 16 == 0))
  }

  test("scd2 intervals are contiguous, versioned, and state-changing") {
    val rows = q("q_scd2").collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      // versions are 1..n
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to rs.length))
      // exactly one open interval, and it is the last version
      assert(sorted.count(_.getAs[Long]("valid_to") == -1L) == 1)
      assert(sorted.last.getAs[Long]("valid_to") == -1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // closed interval ends where the next begins (contiguity)
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"))
          // consecutive versions always change state (the SCD-2 contract)
          assert(a.getAs[String]("state") != b.getAs[String]("state"))
        case _ => ()
      }
    }
  }

  test("decay weights discount older events") {
    import spark.implicits._
    val decayed = q("q_decay_agg")
      .agg(sum("decayed_value")).head.getDouble(0)
    val raw = Tables(spark, sf, "events")
      .agg(sum("value")).head.getDouble(0)
    // every weight < 1 (all events precede the reference instant)
    assert(decayed < raw)
    assert(decayed > 0)
  }

  test("token budget allocation is exactly total and proportional within 1") {
    val rows = q("q_token_budget").collect()
    val budget = 100000L
    assert(rows.map(_.getAs[Long]("quota")).sum == budget)
    rows.foreach(r => assert(Set(0L, 1L).contains(r.getAs[Long]("extra"))))
    val tTot = rows.map(_.getAs[Long]("t_s")).sum
    rows.foreach { r =>
      // Hamilton apportionment never strays more than 1 from exact shares
      val exact = BigInt(budget) * r.getAs[Long]("t_s") / tTot
      assert((BigInt(r.getAs[Long]("quota")) - exact).abs <= 1)
    }
  }

  test("holt forecast is consistent with its level and trend") {
    val rows = q("q_holt_forecast").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("forecast_7")
      val expect = r.getAs[Double]("level") + 7.0 * r.getAs[Double]("trend")
      // level/trend/forecast are rounded independently at 4 dp
      assert(math.abs(f - expect) <= 8e-4, s"$f vs $expect")
      assert(r.getAs[Long]("n_days") >= 1L)
    }
  }

  test("topk group returns at most 3 purchases per user, ranked") {
    val rows = q("q_topk_group").collect().groupBy(_.getAs[Long]("user_id"))
    rows.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      // values non-increasing with rank
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("value") >= b.getAs[Double]("value"))
        case _ => ()
      }
    }
  }
}
