package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the text-analysis and dedup operators — these have no
  * SQL oracle (engine-specific hashing), so the invariants live here.
  */
class TextDedupSpec extends AnyFunSuite with SparkSpec {

  test("GreedyMergeApply equals the chained HOF merge fold, round for round") {
    import org.apache.spark.sql.functions._
    // adversarial token streams: overlapping self-merges ("a a a"), a
    // merged token re-used as a later merge's x, y matching a merged
    // token, suffix-collision bait ("ba" vs x="a" — the boundary check),
    // and null merge slots (fewer than 8 learned merges)
    val fixtures = Seq(
      "a a a b a",            // overlapping self-merge: (a,a) → "a+a a"
      "x y x y z x",          // repeated pair, tail never merged
      "ba a b a a",           // "ba" must NOT suffix-match x="a"
      "p q r p q",            // chained: (p,q) then (p+q,r)
      "solo")
    val merges = Seq(
      ("a", "a"), ("x", "y"), ("p", "q"), ("p+q", "r"), ("b", "a"))
    val df = spark.createDataFrame(
      fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "t0")
    // bind the merge table as literal columns x1..y8 (nulls past slot 5)
    val withM = merges.zipWithIndex.foldLeft(df) { case (d, ((x, y), i)) =>
      d.withColumn(s"x${i + 1}", lit(x)).withColumn(s"y${i + 1}", lit(y))
    }
    val padded = (merges.size + 1 to 8).foldLeft(withM)((d, i) =>
      d.withColumn(s"x$i", lit(null).cast("string"))
        .withColumn(s"y$i", lit(null).cast("string")))
    var hof = padded
    for (i <- 1 to 8)
      hof = hof.withColumn(s"t$i", queries.TextOps.mergeRound(s"t${i - 1}", i))
    val native = padded.withColumn("tn",
      functions.TextExprs.greedyMergeApply(col("t0"),
        array((1 to 8).map(i => col(s"x$i")): _*),
        array((1 to 8).map(i => col(s"y$i")): _*)))
    val hofOut = hof.orderBy("doc_id").select("t8").collect().map(_.getString(0))
    val natOut = native.orderBy("doc_id").select("tn").collect().map(_.getString(0))
    assert(natOut.toSeq == hofOut.toSeq)
    // and the first fixture lands where greedy-leftmost semantics say
    // rounds: (a,a) fuses only the FIRST overlap pair ("a a a" → "a+a a"),
    // then (b,a) catches the trailing "b a" — greedy-leftmost, per round
    assert(natOut(0) == "a+a a b+a")
  }

  test("recall curve: bounded, monotone-consistent, and total at the top band") {
    val rows = q("q_dedup_recall_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rec, bp) = (r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_recalled"), r.getAs[Long]("recall_bp"))
      assert(rec >= 0 && rec <= n)
      assert(bp == rec * 10000 / n)
    }
    // 16 bands × 4 rows at j ≥ 0.9 ⇒ miss probability (1−j⁴)¹⁶ < 10⁻⁸ —
    // the top band must be fully recalled on any non-adversarial fixture
    rows.filter(_.getAs[Long]("jaccard_band") >= 9L)
      .foreach(r => assert(r.getAs[Long]("recall_bp") == 10000L,
        "LSH missed a ≥0.9-jaccard pair"))
  }

  test("exact dedup partitions the corpus") {
    val rows = q("q_dedup_exact").collect()
    val total = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_dups")).sum == total)
    assert(rows.forall(_.getAs[Long]("n_dups") >= 1))
  }

  test("minhash LSH recalls every strong exact-Jaccard near-dup pair") {
    // ngram computes exact char-5-gram Jaccard (blocked); every pair it finds
    // with jaccard >= 0.9 must be recalled by the MinHash+LSH path
    val strong = q("q_dedup_ngram").collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mh = q("q_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strong.nonEmpty, "test data should contain near-dups")
    val missed = strong -- mh
    assert(missed.isEmpty, s"minhash missed $missed")
  }

  test("minhash estimate tracks exact jaccard on confirmed pairs") {
    val exact = q("q_dedup_ngram").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val est = q("q_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    val common = exact.keySet intersect est.keySet
    assert(common.nonEmpty)
    common.foreach { p =>
      // 64-perm MinHash on ~0.9 Jaccard: σ≈0.04, allow 5σ
      assert(math.abs(exact(p) - est(p)) < 0.25, s"pair $p: ${exact(p)} vs ${est(p)}")
    }
  }

  test("simhash pairs have genuinely close signatures and overlap minhash") {
    val sh = q("q_dedup_simhash").collect()
    assert(sh.nonEmpty)
    assert(sh.forall(_.getAs[Int]("hamming") <= 3))
    val shPairs = sh.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mh = q("q_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert((shPairs intersect mh).nonEmpty, "simhash and minhash fully disagree")
  }

  test("dedup clusters: edges never split, representative is the min member") {
    val pairs = q("q_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val rows = q("q_dedup_clusters").collect()
    val lab = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(pairs.nonEmpty && lab.nonEmpty)
    pairs.foreach { case (a, b) => assert(lab(a) == lab(b), s"edge ($a,$b) split") }
    lab.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid rep is not its min member")
    }
    val keeps = rows.filter(_.getAs[Boolean]("is_keep")).map(_.getAs[Long]("doc_id")).toSet
    assert(keeps == lab.values.toSet, "keep set != cluster representatives")
  }

  test("degenerate hot bucket: 10k identical docs stay capped and complete") {
    // every band hash collides → one bucket holds all 10k docs. The
    // row_number pre-cap must bound the aggregation buffer at BucketCap, so
    // the output is exactly the pairs among the BucketCap smallest doc_ids.
    import org.apache.spark.sql.functions.{col, lit}
    val cap = graft.queries.DedupOps.BucketCap
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
    val pairs = graft.queries.DedupOps.minhashPairs(docs).collect()
    assert(pairs.length == cap * (cap - 1) / 2, s"got ${pairs.length} pairs")
    val ids = pairs.flatMap(r =>
      Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct
    assert(ids.forall(_ < cap), s"pair outside the capped bucket: ${ids.max}")
    assert(pairs.forall(_.getAs[Double]("est_jaccard") == 1.0))
  }

  test("ngram blocking is content-banded: hot (lang,size) block keeps recall") {
    // 10k docs, ALL the same lang and length bucket: under the old
    // (lang, size_bkt)-only block key this was ONE window partition of 10k
    // rows and the BucketCap pre-cap discarded every doc above id 63 —
    // recall collapsed to pairs among the 64 smallest ids. The content band
    // splits the block by gram-set MinHash bands, so the 5000 true dup pairs
    // (i, i+5000) each land in their own fine bucket and ALL survive.
    import org.apache.spark.sql.functions._
    val docs = spark.range(10000).select(
      col("id").as("doc_id"),
      lit("en").as("lang"),
      concat_ws(" ",
        md5(concat(lit("a"), (col("id") % 5000).cast("string"))),
        md5(concat(lit("b"), (col("id") % 5000).cast("string"))),
        md5(concat(lit("c"), (col("id") % 5000).cast("string")))).as("text"))
      .withColumn("n_chars", length(col("text"))) // constant: 3*32+2 = 98
    val pairs = graft.queries.DedupOps.ngramPairs(docs).collect()
    val got = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val want = (0L until 5000L).map(i => (i, i + 5000L)).toSet
    assert(got == want, s"recall ${got.intersect(want).size}/5000, spurious ${(got -- want).size}")
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("fuzzy join: 10k same-brand/same-size parts stay blocked, never quadratic") {
    // the whole catalog shares ONE (p_brand, p_size) block: under the old
    // catalog-key-only blocking this was a 10k×10k/2 quadratic self-join
    // (50M Levenshtein calls). The deletion-neighborhood key splits the
    // block by (slot, name minus slot): each true pair (i, i+5000 —
    // identical 32-char first token, edit-distance-2 second token) shares
    // exactly the slot-1 residual key, a 2-member bucket, so recall is
    // EXACT. The corpus-wide hot buckets this fixture engineers — residual
    // "x" (5000 docs) and "yz" (5000 docs) at slot 1 — are truncated by the
    // BucketCap pre-filter before their aggregation buffers fill, and the
    // lev ≤ 3 verifier discards their (distinct-base) members, so the
    // output is exactly the constructed pairs.
    import org.apache.spark.sql.functions._
    val parts = spark.range(10000).select(
      col("id").as("p_partkey"),
      concat(md5(concat(lit("n"), (col("id") % 5000).cast("string"))),
        when(col("id") < 5000, lit(" x")).otherwise(lit(" yz"))).as("p_name"),
      lit("Brand#55").as("p_brand"),
      lit(7).as("p_size"))
    val rows = graft.queries.Relational2.fuzzyPairs(parts).collect()
    val got = rows.map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"))).toSet
    val want = (0L until 5000L).map(i => (i, i + 5000L)).toSet
    assert(got == want,
      s"recall ${got.intersect(want).size}/5000, spurious ${(got -- want).size}")
    assert(rows.forall(_.getAs[Long]("lev") <= 3))
  }

  test("inverted index: corpus-wide stop word stays capped, df stays exact") {
    // 50k docs all containing the token "ubiquitous": the posting list must
    // hold exactly the postingCap smallest doc_ids (bounded reducer buffer)
    // while df still reports the full 50k (computed pre-cap)
    import org.apache.spark.sql.functions._
    val shard = element_at(array(Seq("alpha", "bravo", "charlie", "delta",
      "echoes", "foxtrot", "golfer").map(lit): _*), (col("id") % 7 + 1).cast("int"))
    val docs = spark.range(50000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("ubiquitous"), shard).as("text"))
    val rows = graft.queries.TextOps.invertedIndex(docs, postingCap = 20,
      minDf = 1000).collect()
    val ubi = rows.find(_.getAs[String]("term") == "ubiquitous").get
    assert(ubi.getAs[Long]("df") == 50000)
    assert(ubi.getAs[String]("postings") ==
      (0 until 20).mkString(","), "postings must be the 20 smallest ids")
    // the 7 shard terms (~7143 docs each) also cap at 20 entries
    rows.filter(_.getAs[String]("term") != "ubiquitous").foreach { r =>
      assert(r.getAs[String]("postings").split(",").length == 20)
      assert(r.getAs[Long]("df") > 7000)
    }
  }

  test("containment catches asymmetric overlap below the jaccard threshold") {
    // 40 pairs sharing ~63% of their gram mass (24 common words, 14 distinct
    // tail words): containment ≈ 0.63 passes its 0.45 gate while Jaccard
    // ≈ 0.63/(2-0.63) ≈ 0.46 sits below the 0.5 gate — the regime (quotes,
    // partial rewrites with asymmetric extra content) that containment
    // scoring exists for. Texts are md5-derived → fully deterministic, and
    // any cross-pair band collision is filtered by verification (containment
    // ≈ 0), so the result can only be a subset of the constructed pairs.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (0 until 40).flatMap { i =>
      val shared = (0 until 24).map(j => md5hex(s"s$i$j")).mkString(" ")
      val a = shared + " " + (0 until 14).map(j => md5hex(s"a$i$j")).mkString(" ")
      val b = shared + " " + (0 until 14).map(j => md5hex(s"b$i$j")).mkString(" ")
      Seq((i.toLong, "en", a), (i.toLong + 100, "en", b))
    }
    val df = rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
    val expected = (0 until 40).map(i => (i.toLong, i.toLong + 100)).toSet
    val cont = graft.queries.DedupOps.containmentPairs(df).collect()
    val got = cont.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(expected), s"spurious pairs: ${got -- expected}")
    // LSH recall at J≈0.46 is ~60% per pair (4 bands of 2 over 8 perms) —
    // deterministic for this fixture, and far above this floor
    assert(got.size >= 5, s"containment recalled only ${got.size} of 40")
    cont.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.45 && c <= 0.85, s"containment $c outside expected band")
    }
    val jacPairs = graft.queries.DedupOps.ngramPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((jacPairs intersect expected).isEmpty,
      "fixture pairs should sit below the 0.5 jaccard gate")
  }

  test("rolling fingerprint is deterministic and order-sensitive") {
    val a = q("q_doc_rollhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = q("q_doc_rollhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    import spark.implicits._
    import graft.functions.Text
    val fp = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(Text.rollingFingerprint(Text.tokens(org.apache.spark.sql.functions.col("text"))))
      .collect().map(_.getLong(0))
    assert(fp(0) != fp(1), "rolling hash must depend on token order")
  }

  test("native MinHashSig expression matches the HOF formulation exactly") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{Text, TextExprs}
    val sh = Tables(spark, sf, "documents").limit(50)
      .select(col("doc_id"),
        Text.shingleHashes(Text.wordShingles(Text.tokens(col("text")), 3)).as("sh"))
      .persist()
    val hof = sh.select(col("doc_id"), Text.minhashSig(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = sh.select(col("doc_id"), TextExprs.minhashSig(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hof == native)
  }

  test("token counts are consistent between whitespace and bpe-ish schemes") {
    val rows = q("q_text_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Int]("n_tokens"); val bpe = r.getAs[Int]("n_bpeish")
      assert(ws >= 1)
      assert(bpe >= ws, s"doc ${r.getLong(0)}: bpe-ish $bpe < whitespace $ws")
    }
  }

  test("lang guess is total and deterministic") {
    val rows = q("q_lang_guess").collect()
    assert(rows.map(_.getAs[String]("lang_guess")).forall(
      Set("en", "de", "fr", "es", "other").contains))
  }

  test("sorted neighborhood: dup groups recovered, distant texts rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted corpus: a triple of identical docs, a near-dup pair (one
    // char edit in ~40), and unrelated texts sharing the same block prefix
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val near = base.replace("theta", "thetb")
    val far = "alpha completely different content entirely unrelated words"
    val docsDf = Seq(
      (1L, base), (2L, base), (3L, base), (4L, near), (5L, far),
      (6L, "zzz isolated text with its own block prefix")
    ).toDF("doc_id", "text").repartition(3)
    val got = graft.queries.DedupOps.sortedNeighborhoodPairs(docsDf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    // identical texts sort adjacently: all three intra-triple pairs are
    // within the w=3 window and dist=0 passes any cut
    Seq((1L, 2L), (2L, 3L), (1L, 3L)).foreach(p =>
      assert(got.contains(p), s"exact-duplicate pair $p missed"))
    // the near-dup sorts next to the triple (shared prefix) and is one
    // edit away — must be caught by the 10% cut
    assert(got.exists { case (a, b) => b == 4L && a >= 1L && a <= 3L },
      s"near-dup doc 4 missed: $got")
    // the same-block but distant text must NOT pair with anything
    assert(!got.exists { case (a, b) => a == 5L || b == 5L },
      s"distant doc 5 wrongly flagged: $got")
    assert(got.forall { case (a, b) => a < b }, "pairs not canonicalized")
  }

  test("ppjoin equals brute force on an adversarial hot-token corpus") {
    import spark.implicits._
    // every doc shares the hot shingle run "the quick brown fox jumps";
    // a naive inverted index would go quadratic on it, but hot shingles
    // have MAX df, so they sort to the END of the canonical order and
    // never enter a prefix — candidates come only from the rare tails
    val docsDf = (0 until 60).map { i =>
      val tail = if (i % 3 == 0) s"alpha$i beta$i gamma$i delta$i"
        else if (i % 3 == 1) s"alpha${i - 1} beta${i - 1} gamma${i - 1} x$i"
        else s"unique$i only$i here$i now$i"
      (i.toLong, s"the quick brown fox jumps $tail")
    }.toDF("doc_id", "text").repartition(5)
    def shingles(text: String): Set[String] = {
      val ws = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val t = 0.5
    val texts = docsDf.collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      sa = shingles(ta); sb = shingles(tb)
      inter = (sa & sb).size
      uni = sa.size + sb.size - inter
      if uni > 0 && inter.toDouble / uni >= t
    } yield (a, b)).toSet
    val got = graft.queries.DedupOps.ppjoinPairs(docsDf, t)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(expected.nonEmpty, "degenerate fixture: brute force found no pairs")
    assert(got == expected,
      s"missed=${expected -- got} extra=${got -- expected}")
  }

  test("winnowing: shared runs guaranteed a shared fingerprint, density bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextExprs
    val (n, w) = (3, 4)
    // two docs sharing EXACTLY a w+n−1 = 6-token run inside otherwise
    // disjoint text — the winnowing guarantee says ≥1 shared fingerprint
    val run = "omega psi chi phi upsilon tau"
    val docs = Seq(
      (1L, s"aaa bbb ccc ddd eee $run fff ggg hhh iii"),
      (2L, s"zzz yyy xxx www $run vvv uuu ttt sss rrr")
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextExprs.winnowHashes(col("text"), n, w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "winnowing guarantee broken: shared 6-token run, no shared fingerprint")
    // density: on the real corpus, selected fingerprints per doc should be
    // far below the gram count but nonzero — expected ~2/(w+1) of windows
    val corpus = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(TextExprs.winnowHashes(col("text"), n, w)).as("n_fp"),
        (size(split(lower(trim(col("text"))), "\\s+")) - (n - 1)).as("m"))
      .filter(col("m") >= 10).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (nf, m) = (r.getAs[Int]("n_fp"), r.getAs[Int]("m"))
      assert(nf >= 1 && nf <= m, s"degenerate selection: $nf of $m")
      assert(nf <= m * 3 / (w + 1) + 2,
        s"selection density $nf/$m far above the 2/(w+1) expectation")
    }
  }

  test("winnow pairs: viral boilerplate fingerprint is stop-cut, true overlap survives") {
    import spark.implicits._
    val cap = graft.queries.DedupOps.WinnowDfCap
    val nViral = cap * 3 // boilerplate df far above the cap
    // every doc carries the SAME long boilerplate run (a shared header) —
    // its fingerprints have df = nViral > cap and must be dropped before
    // the self-join, else the candidate set is C(nViral, 2) pairs from
    // boilerplate alone. Docs 1 and 2 additionally share a long UNIQUE
    // run (df = 2 fingerprints) that must still pair them.
    val boiler = "creative commons license applies to this entire document text"
    val shared = "aurora borealis shimmers over the frozen tundra tonight while " +
      "quiet rivers carve ancient valleys beneath pale silver starlight"
    val docsDf = (1 to nViral).map { i =>
      val unique =
        if (i <= 2) shared
        else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h w${i}i"
      (i.toLong, s"$boiler $unique")
    }.toDF("doc_id", "text").repartition(4)
    val pairs = graft.queries.DedupOps.winnowPairs(docsDf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(pairs.contains((1L, 2L)),
      "stop-cut dropped the genuine near-dup pair (its fps have df=2)")
    // bounded candidates: without the cut every doc pair shares the
    // boilerplate fps; with it only the genuine pair survives
    assert(pairs.size < 10,
      s"viral fingerprint not capped: ${pairs.size} pairs (expected ~1 of " +
        s"${nViral.toLong * (nViral - 1) / 2} uncapped)")
  }

  test("incremental cluster composition equals full CC when a new doc merges two old clusters") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.DedupOps.connectedComponents
    // old graph: two separate components {1,2} and {10,11}; the new batch
    // (ids % 10 == 9) brings doc 19 adjacent to BOTH — full CC merges
    // everything into one min-label-1 component, and the contracted
    // composition must reproduce exactly that
    val pairs = Seq((1L, 2L), (10L, 11L), (2L, 19L), (11L, 19L), (29L, 39L))
      .toDF("doc_a", "doc_b").repartition(3)
    def isNew(c: org.apache.spark.sql.Column) = c % 10 === 9
    val full = connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldPairs = pairs.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
    val newPairs = pairs.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
    val ccOld = connectedComponents(oldPairs)
    val contracted = newPairs
      .join(ccOld.select(col("doc_id").as("doc_a"), col("cluster_id").as("ra")),
        Seq("doc_a"), "left")
      .join(ccOld.select(col("doc_id").as("doc_b"), col("cluster_id").as("rb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("ra"), col("doc_a")).as("sa"),
        coalesce(col("rb"), col("doc_b")).as("sb"))
      .filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("doc_a"),
        greatest(col("sa"), col("sb")).as("doc_b")).distinct()
    val supMap = connectedComponents(contracted)
      .select(col("cluster_id").as("sup"), col("doc_id").as("rep"))
    val docsInPairs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val inc = docsInPairs.join(ccOld, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("rep"))
      .join(supMap, Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("sup"), col("rep")).as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet.contains(1L) && full(19L) == 1L && full(11L) == 1L,
      s"fixture broken: full CC did not merge across the batch ($full)")
    assert(inc == full, s"incremental diverges: inc=$inc full=$full")
    // the all-new-edge component {29,39} survives with no old labels at all
    assert(inc(39L) == 29L)
  }

  test("multi-pass SN catches the first-character blind spot pass 1 misses") {
    import spark.implicits._
    // two docs identical except the FIRST word: different pass-1 blocks
    // (prefix differs) so the forward pass can't pair them, but reversed
    // keys share block and sort position — pass 2 must catch them
    val a = "xxxx alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "yyyy alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docsDf = (Seq((1L, a), (2L, b)) ++
      (3 to 30).map(i => (i.toLong, s"filler$i totally unrelated words $i")))
      .toDF("doc_id", "text").repartition(3)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val single = pairsOf(graft.queries.DedupOps.sortedNeighborhoodPairs(docsDf))
    val multi = pairsOf(graft.queries.DedupOps.sortedNeighborhoodPairs(docsDf)
      .unionByName(graft.queries.DedupOps
        .sortedNeighborhoodPairs(docsDf, reversed = true)))
    assert(!single.contains((1L, 2L)),
      "fixture broken: forward pass already pairs them — blind spot untested")
    assert(multi.contains((1L, 2L)),
      "reversed pass missed the suffix-identical pair")
  }

  test("new dedup operators degrade cleanly on empty and degenerate input") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextExprs
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // empty corpus → empty pair sets, no exceptions
    assert(graft.queries.DedupOps.ppjoinPairs(empty, 0.5).count() == 0)
    assert(graft.queries.DedupOps.sortedNeighborhoodPairs(empty).count() == 0)
    // single doc → no pairs
    val one = Seq((1L, "solo document with a few words here")).toDF("doc_id", "text")
    assert(graft.queries.DedupOps.ppjoinPairs(one, 0.5).count() == 0)
    assert(graft.queries.DedupOps.sortedNeighborhoodPairs(one).count() == 0)
    // winnowing on a doc shorter than n tokens → one whole-string hash
    val short = Seq((1L, "ab")).toDF("doc_id", "text")
      .select(TextExprs.winnowHashes(col("text"), 3, 4).as("fps"))
      .collect()(0).getSeq[Long](0)
    assert(short.length == 1)
  }

  test("sorted neighborhood on the corpus agrees with its oracle shape") {
    // fixture has near-dups but (at sf0.001) no exact dups — assert the
    // reported pairs are canonical and respect the edit-distance cut
    import org.apache.spark.sql.functions._
    val rows = q("q_dedup_sorted_neighborhood").collect()
    val norm = Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(trim(col("text"))).as("skey"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b, d) =
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("dist"))
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(d * 10 <= math.max(norm(a).length, norm(b).length),
        s"pair ($a,$b) dist=$d breaks the 10% cut")
    }
  }
}
