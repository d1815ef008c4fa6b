package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Same-session A/B probe for the r17 kernel work (measurement protocol:
  * host speed swings ±40% between windows, so cross-JVM comparisons lie;
  * this main times OLD-vs-NEW implementations interleaved in ONE session,
  * min of 5 noop passes each).
  *
  * The `Old*` expressions below are verbatim r16 copies (CodegenFallback,
  * `%`/floorMod in the hot loops, regex split per row) kept ONLY as the
  * probe baseline — no query path references them.
  */
object ProbeR17 {

  // ---- r16 baselines, frozen ----

  case class OldShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    import graft.functions.TextHash.P
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private def hashShingle(toks: Array[String], from: Int, len: Int): Long = {
      var h = 0L
      var i = from
      val end = from + len
      while (i < end) {
        if (i > from) h = (h * 131 + ' ') % P
        val s = toks(i)
        var j = 0
        while (j < s.length) { h = (h * 131 + s.charAt(j)) % P; j += 1 }
        i += 1
      }
      h
    }
    override def nullSafeEval(input: Any): Any = {
      val toks = input.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      if (toks.length < n)
        return new GenericArrayData(Array(hashShingle(toks, 0, toks.length)))
      val buf = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) { buf(i) = hashShingle(toks, i, n); i += 1 }
      new GenericArrayData(graft.functions.TextHash.sortedDistinct(buf, buf.length))
    }
    override protected def withNewChildInternal(c: Expression): OldShingleHashes =
      copy(child = c)
  }

  case class OldMinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    import graft.functions.TextHash.P
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData].toLongArray()
      val sig = new Array[Long](k)
      var i = 0
      while (i < k) {
        val a = Math.floorMod((2L * i + 1) * 2654435761L, P)
        val b = Math.floorMod((i + 7L) * 40503L * 99991L, P)
        var m = Long.MaxValue
        var j = 0
        while (j < arr.length) {
          val v = Math.floorMod(a * arr(j) + b, P)
          if (v < m) m = v
          j += 1
        }
        sig(i) = if (arr.isEmpty) 0L else m
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): OldMinHashSig =
      copy(child = c)
  }

  case class OldCharNgramHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    import graft.functions.TextHash
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.toString.toLowerCase(java.util.Locale.ROOT)
      val upper = math.max(1, s.length - n + 1)
      val buf = new Array[Long](upper)
      var i = 0
      while (i < upper) {
        // pre-r17 poly used `%`; TextHash.poly now uses modP — same
        // values, so timing the current poly per window is the honest
        // old-shape baseline (the r16 cost was windows × n, not the mod)
        var h = 0L
        var j = i
        val end = math.min(s.length, i + n)
        while (j < end) { h = (h * 131 + s.charAt(j)) % TextHash.P; j += 1 }
        buf(i) = h
        i += 1
      }
      new GenericArrayData(TextHash.sortedDistinct(buf, upper))
    }
    override protected def withNewChildInternal(c: Expression): OldCharNgramHashes =
      copy(child = c)
  }

  case class OldCosineSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData].toFloatArray()
      val b = r.asInstanceOf[ArrayData].toFloatArray()
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): OldCosineSim =
      copy(left = l, right = r)
  }

  private def col2e(c: Column) = org.apache.spark.sql.graftx.Bridge.expression(c)
  private def e2col(e: Expression) = org.apache.spark.sql.graftx.Bridge.column(e)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Persisted._
    val docs = Tables(spark, sfDir, "documents").select(col("text"))
      .persistTracked()
    docs.count()
    val emb = Tables(spark, sfDir, "embeddings").persistTracked()
    emb.count()
    val li = Tables(spark, sfDir, "lineitem").persistTracked()
    li.count()

    def pass(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    /** Interleaved A/B: warm both, then alternate old/new passes so JIT /
      * code-cache / host drift taxes both sides equally (plain
      * back-to-back min-of-5 flipped sign with probe order on the 0.15 s
      * shapes). Returns (oldMin, newMin). */
    def ab(label: String)(oldMk: => DataFrame)(newMk: => DataFrame): (Double, Double) = {
      pass(oldMk); pass(newMk) // warm
      var o = Double.MaxValue; var n = Double.MaxValue
      (1 to 5).foreach { _ =>
        o = math.min(o, pass(oldMk))
        n = math.min(n, pass(newMk))
      }
      println(f"[probe] $label%-28s old=$o%.3f new=$n%.3f x=${o / n}%.2f")
      (o, n)
    }
    def time(label: String)(mk: => DataFrame): Double = {
      pass(mk)
      val best = Seq.fill(5)(pass(mk)).min
      println(f"[probe] $label%-34s min=$best%.3f s")
      best
    }

    // 1. word-shingle → 64-perm minhash (the LSH front end)
    val (oldSig, newSig) = ab("shingle3+minhash64") {
      docs.select(e2col(OldMinHashSig(
        OldShingleHashes(col2e(col("text")), 3), 64)).as("s"))
    } {
      docs.select(graft.functions.TextExprs.minhashSig(
        graft.functions.TextExprs.shingleHashes(col("text"), 3), 64).as("s"))
    }

    // 2. char-5-gram → 8-perm minhash (the sorted-neighborhood front end)
    val (oldGram, newGram) = ab("chargram5+minhash8") {
      docs.select(e2col(OldMinHashSig(
        OldCharNgramHashes(col2e(col("text")), 5), 8)).as("s"))
    } {
      docs.select(graft.functions.TextExprs.minhashSig(
        graft.functions.TextExprs.charNgramHashes(col("text"), 5), 8).as("s"))
    }

    // 3. cosine scoring (the FP family hot loop): every embedding against
    //    one broadcast probe vector — OLD timed first to rule out
    //    session-order effects
    val probeVec = emb.limit(1).select(col("embedding").as("pv"))
    val (oldCos, newCos) = ab("cosine 64d") {
      emb.crossJoin(broadcast(probeVec))
        .select(e2col(OldCosineSim(col2e(col("embedding")), col2e(col("pv")))).as("c"))
    } {
      emb.crossJoin(broadcast(probeVec))
        .select(graft.functions.VectorExprs.cosine(col("embedding"), col("pv")).as("c"))
    }
    // 3b. the aggregate shape (cosine feeding a sum — the q_ann/q_embed
    //     family's real consumer shape and the calib_fp anchor's shape)
    val (oldCosAgg, newCosAgg) = ab("sum(cosine)") {
      emb.crossJoin(broadcast(probeVec))
        .select(e2col(OldCosineSim(col2e(col("embedding")), col2e(col("pv")))).as("c"))
        .agg(sum(col("c")))
    } {
      emb.crossJoin(broadcast(probeVec))
        .select(graft.functions.VectorExprs.cosine(col("embedding"), col("pv")).as("c"))
        .agg(sum(col("c")))
    }

    // 4. 13-moment exact aggregate: SumCents vs decimal(38,0) sums
    import graft.queries.ExactMoney
    val moments = li.select(
      col("l_quantity").cast("bigint").as("q"),
      ExactMoney.centsL(col("l_extendedprice")).as("p"),
      ExactMoney.centsL(col("l_discount")).as("dd"),
      ExactMoney.centsL(col("l_tax")).as("t"))
    val cols = Seq("q", "p", "dd", "t")
    val (oldMom, newMom) = ab("corr moments") {
      val sums = Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
        cols.map(c => sum(col(c).cast("decimal(38,0)")).as(s"s_$c")) ++
        cols.map(c => sum(expr(s"cast($c * $c as decimal(38,0))")).as(s"ss_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(expr(s"cast($a * $b as decimal(38,0))")).as(s"sp_${a}_$b") }.toSeq
      moments.agg(sums.head, sums.tail: _*)
    } {
      import graft.functions.SumCents
      val sums = Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
        cols.map(c => SumCents.sum(col(c)).as(s"s_$c")) ++
        cols.map(c => SumCents.sum(expr(s"$c * $c")).as(s"ss_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          SumCents.sum(expr(s"$a * $b")).as(s"sp_${a}_$b") }.toSeq
      moments.agg(sums.head, sums.tail: _*)
    }

    // 5. graph-loop checkpointing: eager (one scheduled job per round at
    //    DataFrame-construction time — the pre-r17 shape) vs lazy (rounds
    //    fold into the final job as chained stages). Same label-prop
    //    recurrence, same inputs, same values.
    val lpEdges = li
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select(explode(array(
        struct((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")),
        struct((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).persistTracked()
    lpEdges.count()
    def labelProp(eager: Boolean): DataFrame = {
      val edges = lpEdges
      var lbl = edges.select(col("src").as("v")).distinct()
        .select(col("v"), col("v").as("lbl"))
      for (_ <- 1 to 3) {
        lbl = edges.join(lbl, edges("dst") === lbl("v"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max_by(col("lbl"), struct(col("c"), (-col("lbl")).as("nl")))
            .as("lbl"))
          .select(col("src").as("v"), col("lbl"))
          .localCheckpoint(eager)
      }
      lbl.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"))
    }
    val (eagerLp, lazyLp) = ab("label-prop eager vs lazy ckpt") {
      labelProp(eager = true)
    } {
      labelProp(eager = false)
    }

    println(f"""[probe-summary] {"sig":${oldSig / newSig}%.2f,"gram":${oldGram / newGram}%.2f,"cos":${oldCos / newCos}%.2f,"cos_agg":${oldCosAgg / newCosAgg}%.2f,"moments":${oldMom / newMom}%.2f,"graphloop":${eagerLp / lazyLp}%.2f}""")
    graft.operators.Persisted.releaseAll(spark)
    spark.stop()
  }
}
