package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** ScalaCheck property layer (SURVEY §5): algebraic invariants of the
  * native sketch/vector expressions, checked against brute-force reference
  * implementations. Generators are sampled with fixed seeds (offline cache
  * has no scalatest-scalacheck bridge), so runs are deterministic.
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  /** Deterministic sample stream from a generator. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] = {
    val p = Gen.Parameters.default
    (0 until n * 4).iterator
      .flatMap(i => g.apply(p, Seed(i.toLong)))
      .take(n).toSeq
  }

  private val dummy = Literal(1)

  test("TextHash.poly matches a BigInt reference on arbitrary strings") {
    for {
      s <- samples(Gen.alphaNumStr, 200)
      m <- Seq(131, 137, 1000003)
    } {
      val ref = s.foldLeft(BigInt(0))((h, c) => (h * m + c.toInt) mod BigInt(TextHash.P))
      assert(TextHash.poly(s, 0, s.length, m) == ref.toLong, s"s=$s m=$m")
    }
  }

  test("sortedDistinct equals the set semantics of the input") {
    samples(Gen.listOf(Gen.chooseNum(-1000L, 1000L)), 200).foreach { xs =>
      val got = TextHash.sortedDistinct(xs.toArray, xs.length).toSeq
      assert(got == xs.distinct.sorted, s"xs=$xs")
    }
  }

  test("JaccardSorted equals naive set Jaccard") {
    val arr = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)
    val e = graft.functions.JaccardSorted(dummy, dummy)
    samples(Gen.zip(arr, arr), 200).foreach { case (a, b) =>
      val got = e.nullSafeEval(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
        .asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val want = if (union == 0) 1.0 else inter / union
      assert(math.abs(got - want) < 1e-12, s"a=$a b=$b")
    }
  }

  test("ContainmentSorted equals naive set containment") {
    val arr = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)
    val e = graft.functions.ContainmentSorted(dummy, dummy)
    samples(Gen.zip(arr, arr), 200).foreach { case (a, b) =>
      val got = e.nullSafeEval(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
        .asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val mn = math.min(a.size, b.size).toDouble
      val want = if (mn == 0) 1.0 else inter / mn
      assert(math.abs(got - want) < 1e-12, s"a=$a b=$b")
    }
  }

  test("Skew.choose is monotone in skew and never salts a cold key") {
    import graft.operators.Skew
    val order = Map("plain" -> 0, "aqe" -> 1, "salted" -> 2)
    val profiles = Gen.zip(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(0.1, 10000.0))
    samples(profiles, 300).foreach { case (maxC, avgC) =>
      val c = Skew.choose(maxC, avgC)
      // growing the hot key (same average) can only escalate the strategy
      val c2 = Skew.choose(maxC * 4, avgC)
      assert(order(c2) >= order(c), s"maxC=$maxC avgC=$avgC: $c -> $c2")
      // a key too small to hurt is never salted, whatever the ratio
      if (maxC < 256) assert(c == "plain", s"cold key salted: maxC=$maxC avgC=$avgC")
    }
  }

  test("CharEntropy matches a naive distribution-entropy oracle") {
    val strs = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ', 'z')).map(_.mkString)
    val e = graft.functions.CharEntropy(dummy)
    samples(strs, 300).foreach { s =>
      val got = e.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Double]
      val n = s.length.toDouble
      val want =
        if (s.isEmpty) 0.0
        else s.groupBy(identity).values.map { g =>
          val p = g.length / n
          -p * (math.log(p) / math.log(2.0))
        }.sum
      assert(math.abs(got - want) < 1e-9, s"text=$s got=$got want=$want")
      assert(got >= 0.0 && (s.isEmpty || got <= math.log(n.max(2)) / math.log(2.0) + 1e-9))
    }
  }

  test("Morton interleave is a bijection on 8-bit pairs and preserves order locality") {
    // the same 16-term shift/mask expression q_zorder_layout generates;
    // evaluated here in plain Scala to pin the bit layout
    def z(cb: Long, db: Long): Long =
      (0 until 8).map(i => (((cb >> i) & 1L) << (2 * i)) + (((db >> i) & 1L) << (2 * i + 1))).sum
    val all = for (c <- 0L until 256L; d <- 0L until 256L) yield z(c, d)
    assert(all.toSet.size == 65536, "z-keys collide — not a bijection")
    assert(all.min == 0L && all.max == 65535L)
    // deinterleave inverts: even bits → cb, odd bits → db
    def unz(v: Long): (Long, Long) = {
      var c = 0L; var d = 0L
      (0 until 8).foreach { i =>
        c |= ((v >> (2 * i)) & 1L) << i
        d |= ((v >> (2 * i + 1)) & 1L) << i
      }
      (c, d)
    }
    samples(Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)), 200)
      .foreach { case (c, d) => assert(unz(z(c, d)) == (c, d)) }
  }

  test("MinHash signature is permutation-invariant and deterministic") {
    val e = graft.functions.MinHashSig(dummy, 16)
    def sig(v: Seq[Long]) = e.nullSafeEval(new GenericArrayData(v.toArray))
      .asInstanceOf[ArrayData].toLongArray().toSeq
    val rnd = new scala.util.Random(42)
    samples(Gen.listOf(Gen.chooseNum(0L, TextHash.P - 1)), 100).foreach { xs =>
      assert(sig(xs) == sig(rnd.shuffle(xs)), s"xs=$xs")
    }
  }

  test("MinHash match fraction estimates Jaccard within statistical error") {
    // near-dup docs share most shingles → estimate must be high; disjoint
    // docs share none → estimate must be ~0. 64 permutations → ±3σ ≈ 0.19.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (100 to 160).map(i => s"tok$i").mkString(" ")
    import spark.implicits._
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
      .select(col("id"), graft.functions.TextExprs.minhashSig(
        graft.functions.TextExprs.shingleHashes(col("text"), 3), 64).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def frac(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(frac(sigs(1L), sigs(2L)) > 0.7, "near-dup estimate too low")
    assert(frac(sigs(1L), sigs(3L)) < 0.2, "disjoint estimate too high")
  }

  test("SimHash of identical docs equal; Hamming grows with divergence") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val tweaked = (1 to 80).map(i => if (i % 20 == 0) s"X$i" else s"w$i").mkString(" ")
    val other = (200 to 280).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, tweaked), (4L, other)).toDF("id", "text")
      .select(col("id"), graft.functions.TextExprs.simhashBits(
        graft.functions.TextExprs.shingleFeatures62(col("text"), 3)).as("sim"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) == 0)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)),
      s"tweak ${ham(m(1L), m(3L))} !< other ${ham(m(1L), m(4L))}")
  }

  test("CosineSim: self-similarity 1, symmetry, scale-invariance") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_.toFloat))
      .suchThat(v => v.exists(_ != 0f))
    val e = graft.functions.CosineSim(dummy, dummy)
    def cos(x: Seq[Float], y: Seq[Float]) = e.nullSafeEval(
      new GenericArrayData(x.toArray), new GenericArrayData(y.toArray))
      .asInstanceOf[Double]
    samples(Gen.zip(vec, vec), 100).foreach { case (a, b) =>
      assert(math.abs(cos(a, a) - 1.0) < 1e-9)
      assert(math.abs(cos(a, b) - cos(b, a)) < 1e-12)
      val scaled = a.map(_ * 2f)
      assert(math.abs(cos(a, b) - cos(scaled, b)) < 1e-6)
    }
  }

  test("HyperplaneBucket: same vector same bucket; bucket in range") {
    val e = graft.functions.HyperplaneBucket(dummy, 6, 0, 8)
    val vec = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_.toFloat))
    samples(vec, 100).foreach { v =>
      val b1 = e.nullSafeEval(new GenericArrayData(v.toArray)).asInstanceOf[Long]
      val b2 = e.nullSafeEval(new GenericArrayData(v.toArray)).asInstanceOf[Long]
      assert(b1 == b2 && b1 >= 0 && b1 < 64, s"v=$v b=$b1")
    }
  }

  test("connectedComponents matches brute-force union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
      .suchThat(_.nonEmpty)
    samples(edgeGen, 5).foreach { edges =>
      // brute force: iterate min-propagation over an adjacency map
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2))
      var lbl = adj.keys.map(k => k -> k).toMap
      var changed = true
      while (changed) {
        val next = lbl.map { case (k, v) =>
          k -> (v +: adj(k).map(lbl)).min
        }
        changed = next != lbl
        lbl = next
      }
      val got = graft.queries.DedupOps.connectedComponents(
          edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lbl, s"edges=$edges")
    }
  }

  test("incremental contracted-CC composition equals full CC on random graphs and splits") {
    import spark.implicits._
    val caseGen = for {
      raw <- Gen.listOfN(25,
        Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
      newMask <- Gen.listOfN(20, Gen.oneOf(true, false))
    } yield (raw.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.distinct, newMask.zipWithIndex.collect { case (true, i) => i.toLong }.toSet)
    samples(caseGen.suchThat(_._1.nonEmpty), 5).foreach { case (edges, newNodes) =>
      val full = graft.queries.DedupOps.connectedComponents(
          edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oldPairs = edges.filter { case (a, b) =>
        !newNodes(a) && !newNodes(b) }
      val newPairs = edges.filter { case (a, b) =>
        newNodes(a) || newNodes(b) }
      val ccOld =
        if (oldPairs.isEmpty) Map.empty[Long, Long]
        else graft.queries.DedupOps.connectedComponents(
            oldPairs.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def rep(x: Long) = ccOld.getOrElse(x, x)
      val contracted = newPairs.map { case (a, b) => (rep(a), rep(b)) }
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val sup =
        if (contracted.isEmpty) Map.empty[Long, Long]
        else graft.queries.DedupOps.connectedComponents(
            contracted.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val docsInPairs = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val inc = docsInPairs.map { x =>
        val r = rep(x); x -> sup.getOrElse(r, r)
      }.toMap
      assert(inc == full,
        s"edges=$edges newNodes=$newNodes inc=$inc full=$full")
    }
  }

  test("connectedComponents resolves a deep chain (pointer-halving path)") {
    // a 100-node path with the minimum at one END is the adversarial shape:
    // pure min-propagation needs ~100 rounds (one Spark job each); the
    // round-3 pointer-halving must collapse it in O(log n) rounds. The id
    // permutation (i*37 % 101) makes labels non-monotone along the path.
    import spark.implicits._
    val ids = (0 until 100).map(i => (i * 37L) % 101L)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = graft.queries.DedupOps.connectedComponents(
        edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mn = ids.min
    assert(got.keySet == ids.toSet)
    assert(got.values.forall(_ == mn), s"labels: ${got.values.toSet}")
  }

  test("connectedComponents converges exactly with doc ids near 2^62") {
    // the convergence check is a decimal(38,0) Σ of labels — a raw Long Σ
    // would wrap on ids this large and could false-converge. Two chains and
    // a singleton pair, all in the top of the id space.
    import spark.implicits._
    val base = (1L << 62) - 16
    val edges = Seq(
      (base + 1, base + 2), (base + 2, base + 3), (base + 3, base + 4),
      (base + 8, base + 9), (base + 9, base + 10),
      (base + 12, base + 13))
    val got = graft.queries.DedupOps.connectedComponents(
        edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      base + 1 -> (base + 1), base + 2 -> (base + 1),
      base + 3 -> (base + 1), base + 4 -> (base + 1),
      base + 8 -> (base + 8), base + 9 -> (base + 8), base + 10 -> (base + 8),
      base + 12 -> (base + 12), base + 13 -> (base + 12))
    assert(got == want)
  }

  test("q_bloom_fpr's LCG bloom has NO false negatives on arbitrary key sets") {
    // the property the q_file_skipping verdict's n_missed = 0 column
    // reports for one fixture, proven over random sets: every inserted
    // key's two hash positions are in the filter's bit set, for any
    // insert set and any of the three filter sizes — the one-sided error
    // guarantee that makes a bloom skip SAFE (a false positive costs a
    // file open; a false negative would silently lose data)
    val P = 2147483647L
    def h1(k: Long, m: Int) = ((k % P) * 1103515245L + 12345L) % P % m
    def h2(k: Long, m: Int) = ((k % P) * 69069L + 362437L) % P % m
    for {
      keys <- samples(Gen.listOf(Gen.chooseNum(0L, 3000000L)), 100)
      m <- Seq(4096, 16384, 65536)
    } {
      val bits = keys.flatMap(k => Seq(h1(k, m), h2(k, m))).toSet
      keys.foreach { k =>
        assert(bits.contains(h1(k, m)) && bits.contains(h2(k, m)),
          s"false negative for key $k at m=$m")
      }
    }
  }

  test("RollingHash is order-sensitive where md5 fingerprint content-equal") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("id", "text")
      .select(col("id"),
        graft.functions.TextExprs.rollingHash(col("text")).as("roll"),
        md5(concat_ws("", array_sort(split(col("text"), " ")))).as("bag"))
    val rows = df.orderBy("id").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(rows(0)._1 != rows(1)._1, "rolling hash must see order")
    assert(rows(0)._2 == rows(1)._2, "bag fingerprint must not")
  }

  test("trigram index: candidates == all-grams-present set; verify is exact " +
    "contains, for arbitrary patterns") {
    // the q_trigram_search SHAPE generalized over patterns: the candidate
    // set must equal the all-pattern-trigrams-present set (the index
    // guarantee — a SUPERSET of true matches, never a miss), and the
    // verified flag must equal text.contains
    import org.apache.spark.sql.functions._
    val corpus = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sparkSearch(p: String): Map[Long, Boolean] = {
      val grams = p.sliding(3).toSeq.distinct
      val docs = Tables(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      docs.select(col("doc_id"), explode(array_intersect(
          expr("transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3))"),
          lit(grams.toArray))).as("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
        .filter(col("ng") === lit(grams.size.toLong))
        .join(docs, "doc_id")
        .select(col("doc_id"), col("text").contains(p).as("m"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    // seeded patterns: substrings of real docs (guaranteed hits), a
    // cross-doc frankenstein (trigram-possible, likely non-contiguous),
    // and an alphabet miss
    val rnd = new scala.util.Random(7)
    val texts = corpus.values.toVector
    val fromDocs = (1 to 6).map { _ =>
      val t = texts(rnd.nextInt(texts.size))
      val start = rnd.nextInt(math.max(1, t.length - 15))
      t.substring(start, math.min(t.length, start + 6 + rnd.nextInt(9)))
    }
    val patterns = (fromDocs :+ "table scan merge" :+ "zzzqqqxxx")
      .filter(_.length >= 3).distinct
    patterns.foreach { p =>
      val grams = p.sliding(3).toSeq.distinct
      val got = sparkSearch(p)
      val wantCand = corpus.filter { case (_, t) =>
        val tg = t.sliding(3).toSet
        grams.forall(tg.contains)
      }
      assert(got.keySet == wantCand.keySet,
        s"pattern '$p': candidate set mismatch")
      got.foreach { case (id, m) =>
        assert(m == corpus(id).contains(p),
          s"pattern '$p' doc $id: verify flag wrong")
      }
      // the index guarantee: no true match escapes the candidate set
      val trueMatches = corpus.filter(_._2.contains(p)).keySet
      assert(trueMatches.subsetOf(got.keySet),
        s"pattern '$p': a true match escaped the trigram index")
    }
  }

  test("Kmv bottom-k equals sorted-distinct-take-k under any split") {
    // the Aggregator's reduce/merge against the obvious reference, over
    // seeded random multisets (duplicates included — distinct-set
    // semantics must hold) and arbitrary reduce/merge splits
    val rnd = new scala.util.Random(7)
    val k = 16
    val agg = new graft.functions.Kmv.Sketch(k)
    def fold(v: Seq[Long]) = v.foldLeft(agg.zero)((s, x) => agg.reduce(s, x))
    (1 to 100).foreach { i =>
      val xs = Vector.fill(rnd.nextInt(200))(rnd.nextInt(60).toLong)
      val want = xs.distinct.sorted.take(k)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(fold(a), fold(b)).toSeq
      assert(merged == want, s"case $i (cut $cut): $merged != $want")
      // idempotence: merging a sketch with itself is a no-op
      val self = agg.merge(fold(xs), fold(xs)).toSeq
      assert(self == want, s"case $i: self-merge changed the sketch")
    }
  }

  test("exact-decimal OLS moments are partition/order-invariant bit-exactly") {
    // the q_heaps_law/q_zipf_slope/r15 device: per-row values rounded to
    // 9 dp, scaled ×1e9 to integers, four moments in decimal(38,0),
    // beta/intercept each ONE double division of exact integers, + 0.0
    // normalizing signed zero. Properties: (1) the fit is BIT-identical
    // under any row order and partition count — the r14 bug class was
    // exactly a partition-dependent sign; (2) it equals an independent
    // BigInt reference; (3) a constant-y (degenerate, true-slope-0) set
    // yields POSITIVE zero — sign bit clear — at every partitioning.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val schema = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType)))
    def fit(pts: Seq[(Double, Double)], parts: Int): (Double, Double) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(pts.map(p => Row(p._1, p._2)), parts),
        schema)
      val p = df.select(
        expr("cast(round(round(x, 9) * 1e9, 0) as decimal(38,0))").as("xi"),
        expr("cast(round(round(y, 9) * 1e9, 0) as decimal(38,0))").as("yi"))
      val r = p.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
          sum(expr("xi * yi")).as("sxy"), sum(expr("xi * xi")).as("sxx"))
        .select(col("n"), col("sx"), col("sy"),
          expr("n * sxy - sx * sy").as("num"),
          expr("n * sxx - sx * sx").as("den"))
        .select(
          (round(expr("cast(num as double) / cast(den as double)"), 4)
            + lit(0.0)).as("beta"),
          (round(expr("cast(sy * den - num * sx as double) / " +
            "cast(den * n * 1000000000 as double)"), 4) + lit(0.0))
            .as("icept"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    def bits(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)
    def round4(v: Double): Double =
      BigDecimal.decimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // generator: x strictly increasing, y arbitrary, all values multiples
    // of 1e-4 so the 9-dp rounding and ×1e9 scaling are tie-free exact
    val rnd = new scala.util.Random(4242)
    val cases: Seq[Seq[(Double, Double)]] = (1 to 25).map { _ =>
      val n = 3 + rnd.nextInt(12)
      (1 to n).map(i => (i * 1e-4 * (1 + rnd.nextInt(50)) + i,
        (rnd.nextInt(20001) - 10000) * 1e-4))
    } :+ (1 to 10).map(i => (i.toDouble, 3.1416)) // degenerate constant y
    cases.zipWithIndex.foreach { case (pts, ci) =>
      val ref = {
        def scaled(v: Double): BigInt =
          BigDecimal.decimal(
            BigDecimal.decimal(v).setScale(9,
              BigDecimal.RoundingMode.HALF_UP).toDouble * 1e9)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
        val xi = pts.map(p => scaled(p._1)); val yi = pts.map(p => scaled(p._2))
        val n = BigInt(pts.size)
        val (sx, sy) = (xi.sum, yi.sum)
        val sxy = xi.zip(yi).map { case (a, b) => a * b }.sum
        val sxx = xi.map(a => a * a).sum
        val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
        (round4(num.toDouble / den.toDouble) + 0.0,
          round4((sy * den - num * sx).toDouble /
            (den * n * BigInt(1000000000)).toDouble) + 0.0)
      }
      val base = fit(pts, 1)
      assert(bits(base._1) == bits(ref._1) && bits(base._2) == bits(ref._2),
        s"case $ci: engine $base != BigInt reference $ref")
      Seq(3, 7).foreach { parts =>
        val alt = fit(rnd.shuffle(pts.toList), parts)
        assert(bits(alt._1) == bits(base._1) && bits(alt._2) == bits(base._2),
          s"case $ci at $parts partitions: $alt != $base — " +
            "fit is partition/order-dependent")
      }
    }
    // the degenerate case (last) must carry POSITIVE zero
    val degen = fit(cases.last, 7)
    assert(bits(degen._1) == 0L,
      s"degenerate slope is not +0.0 (bits ${bits(degen._1)})")
  }
}
