package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-4 pipeline operators (PipelineOps) —
  * each already value-exact vs the DuckDB oracle; these assert the properties
  * the oracle can't see (pre-filter selectivity, conservation laws, scrub
  * completeness).
  */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("contamination output never contains eval docs") {
    val rows = q("q_contamination").collect()
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0))
    assert(rows.forall(_.getAs[Long]("n_overlap") >= 1))
  }

  test("sequence packing conserves tokens and fills bins") {
    val bins = q("q_pack_sequences").collect()
    val docs = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .agg(sum("n")).head.getLong(0)
    // conservation: every token lands in exactly one bin
    assert(bins.map(_.getAs[Long]("n_tokens")).sum == docs)
    // bins are contiguous per shard (concat-then-chunk leaves no gaps)
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, bs) =>
      val ids = bs.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.zipWithIndex.forall { case (b, i) => b == i })
    }
    // concat-then-chunk boundary invariant: a doc starts bin b when the
    // running total BEFORE it is in [b·2048, (b+1)·2048), so within a shard
    // the cumulative token count through the last doc of every non-final bin
    // must CROSS that bin's upper boundary (else the next doc would still
    // belong to the same bin)
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, bs) =>
      val byBin = bs.sortBy(_.getAs[Long]("bin_id"))
      val cums = byBin.scanLeft(0L)(_ + _.getAs[Long]("n_tokens")).drop(1)
      byBin.zip(cums).dropRight(1).foreach { case (b, cumThroughBin) =>
        assert(cumThroughBin >= (b.getAs[Long]("bin_id") + 1) * 2048,
          s"shard ${b.getAs[Long]("shard")} bin ${b.getAs[Long]("bin_id")} " +
            s"ends at $cumThroughBin before its boundary")
      }
    }
  }

  test("sequence packing conserves tokens at any shard count") {
    // the shard count is the scale knob — token conservation and bin
    // contiguity must hold per shard regardless of its value
    val docs = Tables(spark, sf, "documents")
    val total = docs
      .filter(length(trim(col("text"))) > 0)
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .agg(sum("n")).head.getLong(0)
    Seq(3, 32).foreach { shards =>
      val bins = graft.queries.PipelineOps.packSequences(docs, shards).collect()
      assert(bins.map(_.getAs[Long]("n_tokens")).sum == total, s"shards=$shards")
      assert(bins.map(_.getAs[Long]("shard")).distinct.length == shards)
      bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, bs) =>
        val ids = bs.map(_.getAs[Long]("bin_id")).sorted
        assert(ids.zipWithIndex.forall { case (b, i) => b == i })
      }
    }
    // default: shard count follows the session's parallelism
    val defBins = graft.queries.PipelineOps.packSequences(docs).collect()
    assert(defBins.map(_.getAs[Long]("shard")).distinct.length ==
      math.min(spark.sparkContext.defaultParallelism, docs.count()).toInt)
  }

  test("pii scrub removes every email and phone pattern") {
    import spark.implicits._
    val emailRe = "[a-z0-9]+@[a-z]+\\.com"
    val aug = concat(col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(aug, emailRe, "<EMAIL>"), "\\+1-555-[0-9]{4}", "<PHONE>")
    val leftovers = Tables(spark, sf, "documents")
      .select(scrubbed.as("s"))
      .filter(col("s").rlike(emailRe) || col("s").rlike("\\+1-555-[0-9]{4}"))
      .count()
    assert(leftovers == 0)
    // and the query actually found the injected PII in every doc
    val rows = q("q_pii_scrub").collect()
    assert(rows.forall(_.getAs[Int]("n_emails") >= 1))
    assert(rows.forall(_.getAs[Int]("n_phones") >= 1))
  }

  test("bloom pre-filter prunes most of lineitem before the join") {
    val lineitem = Tables(spark, sf, "lineitem")
    val sel = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))
    val bf = sel.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bc.value.mightContain(k))
    val total = lineitem.count()
    val kept = lineitem.filter(might(col("l_orderkey"))).count()
    val trueMatch = lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
      .count()
    // no false negatives: everything that joins survives the pre-filter
    assert(kept >= trueMatch)
    // selectivity: the pre-filter drops the large non-matching majority
    // (~10% of orders are selected; 1% FPR adds ~1% of the remainder)
    assert(kept < total / 2, s"bloom kept $kept of $total")
  }

  test("span dedup: span counts conserve and boilerplate is a subset") {
    val rows = q("q_span_dedup").collect()
    assert(rows.nonEmpty)
    // every doc's span count is exactly ⌊tokens/3⌋ (non-overlapping chunks)
    val want = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        (size(split(lower(trim(col("text"))), "\\s+")) / 3).cast("long").as("k"))
      .filter(col("k") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == want.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_spans") == want(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_spans"))
      assert(r.getAs[Double]("avg_span_df") >= 1.0)
    }
  }

  test("ivm rollup equals a from-scratch recompute of the merged snapshot") {
    val maintained = q("q_ivm_rollup").collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Double]("revenue"), r.getAs[Long]("n_orders"))).toMap
    // q_cdc_merge IS the merged snapshot — recompute the rollup from it
    val scratch = q("q_cdc_merge")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("price")), 2).as("revenue"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Double]("revenue"), r.getAs[Long]("n"))).toMap
    assert(maintained.keySet == scratch.keySet)
    maintained.foreach { case (k, (rev, n)) =>
      assert(n == scratch(k)._2, s"customer $k count")
      // delta-sum vs direct-sum may differ by float association only
      assert(math.abs(rev - scratch(k)._1) <= 0.011, s"customer $k revenue")
    }
  }

  test("overlapping chunks tile every doc with stride 16") {
    val byDoc = q("q_chunk_overlap").collect().groupBy(_.getAs[Long]("doc_id"))
    val want = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == want.keySet)
    byDoc.foreach { case (id, chunks) =>
      val starts = chunks.map(_.getAs[Long]("start")).sorted
      assert(starts.head == 1L)
      starts.zip(starts.tail).foreach { case (a, b) => assert(b - a == 16) }
      // the final chunk reaches the last token — full coverage
      val last = chunks.maxBy(_.getAs[Long]("start"))
      assert(last.getAs[Long]("start") + last.getAs[Long]("n_tok") - 1 ==
        want(id), s"doc $id not covered to its end")
      // every non-final chunk is the full window
      chunks.filter(_.getAs[Long]("start") < last.getAs[Long]("start"))
        .foreach(c => assert(c.getAs[Long]("n_tok") == 32))
    }
  }

  test("skew report profiles the key distribution consistently") {
    val r = q("q_skew_report").collect().head
    val users = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(r.getAs[Long]("n_keys") == users)
    assert(r.getAs[Long]("max_c") >= r.getAs[Double]("avg_c").toLong)
    assert(r.getAs[Double]("skew") >= 1.0)
    assert(r.getAs[String]("top_keys").split(",").length == 3)
  }

  test("decontaminate removes exactly the detected train docs") {
    val contaminated = q("q_contamination").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val train = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 97 =!= 0)
    val keptCensus = q("q_decontaminate").collect()
    assert(keptCensus.map(_.getAs[Long]("n_docs")).sum ==
      train.count() - contaminated.size)
    // char mass of the kept set matches the direct computation
    val directChars = train
      .filter(!col("doc_id").isin(contaminated.toSeq: _*))
      .agg(sum(col("n_chars").cast("long"))).head.getLong(0)
    assert(keptCensus.map(_.getAs[Long]("sum_chars")).sum == directChars)
  }

  test("cdc merge applies inserts, updates and deletes exactly") {
    val orders = Tables(spark, sf, "orders")
    def n(pred: org.apache.spark.sql.Column) = orders.filter(pred).count()
    val nBase = n(col("o_orderkey") % 10 < 8)
    val nDel = n(col("o_orderkey") % 10 === 3)
    val nUpd = n(col("o_orderkey") % 10 === 7)
    val nIns = n(col("o_orderkey") % 10 === 8)
    val rows = q("q_cdc_merge").collect()
    assert(rows.length == nBase - nDel + nIns)
    val byAction = rows.groupBy(_.getAs[String]("action")).view.mapValues(_.length)
    assert(byAction("updated") == nUpd)
    assert(byAction("inserted") == nIns)
    assert(byAction("kept") == nBase - nDel - nUpd)
    // no deleted key survives; updated rows carry the +100 price
    assert(rows.forall(_.getAs[Long]("o_orderkey") % 10 != 3))
    val basePrice = orders.select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.filter(_.getAs[String]("action") == "updated").foreach { r =>
      assert(r.getAs[Double]("price") ==
        basePrice(r.getAs[Long]("o_orderkey")) + 100.0)
    }
  }

  test("range layout boundaries are ordered and split mass near-evenly") {
    val bs = q("q_range_layout").collect().map(_.getAs[Long]("boundary_s"))
    assert(bs.length == 7)
    assert(bs.sameElements(bs.sorted), "boundaries must be non-decreasing")
    val k = Tables(spark, sf, "orders")
      .select(unix_timestamp(col("o_orderdate")).as("k"))
    val total = k.count()
    val ideal = total / 8.0
    val edges = (Long.MinValue +: bs) :+ Long.MaxValue
    edges.init.zip(edges.tail).foreach { case (lo, hi) =>
      val mass = k.filter(col("k") > lo && col("k") <= hi).count()
      // date keys tie at daily granularity → shards can't be exactly equal;
      // anything past 2× ideal would mean the split points are wrong
      assert(mass <= ideal * 2, s"shard ($lo,$hi] holds $mass of $total")
    }
  }

  test("cluster-safe split partitions the corpus with zero cluster leakage") {
    val rows = q("q_split_cluster_safe").collect()
    val total = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // structural guarantee, COMPUTED from the pair set: no near-dup pair
    // straddles a split boundary
    rows.foreach(r => assert(r.getAs[Long]("cluster_leaky_pairs") == 0L))
    // the train share of an LCG%10<8 split concentrates near 80%
    val train = rows.find(_.getAs[String]("split") == "train").get
      .getAs[Long]("n_docs").toDouble / total
    assert(train > 0.6 && train < 0.95, s"train share $train")
  }

  test("corpus checksum is partition- and order-independent") {
    import org.apache.spark.sql.functions._
    val whole = q("q_corpus_checksum").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("checksum"), r.getAs[Long]("checksum2"))).toMap
    // recompute over a deliberately re-sharded, re-ordered copy of the
    // corpus via the same SparkEntry body pointed at a temp view — the
    // aggregation must not care about layout
    val docs = Tables(spark, sf, "documents")
      .repartition(7, col("lang")).sortWithinPartitions(desc("text"))
    val h = expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)") % 2147483647L
    val re = docs.select(col("source"), h.as("hm"))
      .groupBy("source")
      .agg((sum(col("hm").cast("decimal(38,0)")) % 2147483647L)
        .cast("long").as("checksum"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("checksum")).toMap
    whole.foreach { case (src, (c1, _)) => assert(re(src) == c1, s"source $src") }
  }

  test("quantile normalization is monotone and covers every doc") {
    val rows = q("q_quantile_normalize").collect()
    val total = Tables(spark, sf, "documents").count()
    assert(rows.length == total, "every doc mapped exactly once")
    // within a source, a higher raw score can never map LOWER globally
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("norm_score") <= b.getAs[Long]("norm_score"))
        case _ => ()
      }
    }
    // normalized scores live in the global score domain
    val domain = rows.map(_.getAs[Long]("score")).toSet
    rows.foreach(r => assert(domain.contains(r.getAs[Long]("norm_score"))))
  }

  test("bloom-gated decontamination equals the exact plan row for row") {
    val exact = q("q_decontaminate").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"))).sortBy(_._1)
    val bloom = q("q_bloom_decontaminate").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"))).sortBy(_._1)
    assert(bloom.toSeq == exact.toSeq)
  }

  test("cluster medoid is a member and minimizes the quantized objective") {
    val med = q("q_cluster_medoid").collect()
    val clusters = q("q_semantic_clusters").collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(med.nonEmpty)
    med.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(clusters(cid).contains(r.getAs[Long]("medoid_vec_id")))
      assert(r.getAs[Long]("n_members") == clusters(cid).size)
      assert(r.getAs[Double]("dist2_q") >= 0.0)
    }
    // brute-force re-derivation on the driver for one cluster: quantize,
    // average, argmin — must agree with the distributed integer ranking
    val (cid, members) = clusters.maxBy(_._2.size)
    val vecs = Tables(spark, sf, "embeddings").collect()
      .filter(r => members.contains(r.getAs[Long]("vec_id")))
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(v => math.floor(v.toDouble * 1048576L).toLong).toArray)
      .toMap
    val n = vecs.size
    val sums = vecs.values.transpose.map(_.sum).toArray
    val best = vecs.toSeq.map { case (id, q) =>
      val d2 = q.indices.map { i =>
        val r = BigInt(n) * q(i) - sums(i); r * r
      }.sum
      (d2, id)
    }.min
    assert(med.find(_.getAs[Long]("cluster_id") == cid).get
      .getAs[Long]("medoid_vec_id") == best._2)
  }

  test("dedup locality shares cover the pair set within rounding") {
    val rows = q("q_dedup_locality").collect()
    assert(rows.nonEmpty)
    val totalBp = rows.map(_.getAs[Long]("share_bp")).sum
    val n = rows.length
    // integer floor division loses < 1 bp per bucket
    assert(totalBp > 10000L - n && totalBp <= 10000L, s"shares sum to $totalBp")
  }

  test("lateness census is internally consistent") {
    val rows = q("q_lateness_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l1, l5, l60) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("late_1m"), r.getAs[Long]("late_5m"),
        r.getAs[Long]("late_1h"))
      assert(l1 >= l5 && l5 >= l60, "horizon counts must be monotone")
      assert(l1 <= n)
      assert(r.getAs[Long]("max_late_s") >= 0L)
    }
  }

  test("clustering depth is at least 1 and avg <= max") {
    val rows = q("q_clustering_depth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_depth")
      val avg = r.getAs[Long]("avg_depth_bp")
      assert(mx >= 1L && mx <= r.getAs[Long]("n_files"))
      assert(avg >= 10000L && avg <= mx * 10000L,
        s"avg $avg outside [1, max=$mx] depth range")
    }
  }

  test("repetition signals are bounded and consistent") {
    val rows = q("q_quality_repetition").collect()
    rows.foreach { r =>
      val top = r.getAs[Double]("top_word_frac")
      val dis = r.getAs[Double]("distinct_frac")
      assert(top > 0 && top <= 1.0)
      assert(dis > 0 && dis <= 1.0)
      // the most frequent token is at least as common as the average token
      // (values are rounded to 4 decimals → allow half-ulp of that rounding)
      assert(top + 5e-5 >= 1.0 / r.getAs[Long]("n_tokens"))
      val dup = r.getAs[Double]("dup_bigram_frac")
      assert(dup >= 0 && dup < 1.0)
    }
  }
}
