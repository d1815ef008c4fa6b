package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch hot loops.
  *
  * The higher-order-function formulations (see git history of Text.scala)
  * are interpreted per lambda invocation — k×N closure evaluations per row.
  * These expressions do the same arithmetic in tight JVM loops over the
  * array data (one virtual call per ROW, not per element), which benched
  * ~10× faster on the dedup pipeline. They are deterministic pure functions
  * of their input, so they remain safe under retries and AQE re-execution.
  */

/** MinHash signature: sig_i = min over hashes h of (a_i*h + b_i) mod P,
  * byte-compatible with Text.minhashSig's permutation constants.
  * Empty input → all-zero signature.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  private val P = 2147483647L

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
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of 64-bit feature hashes: bit b is set iff
  * bit b is set in the majority of inputs.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val counts = new Array[Int](64)
    var j = 0
    while (j < arr.length) {
      val h = arr(j)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct hashes of word n-gram shingles, straight from the text in one
  * pass: tokenize on whitespace (lowercased), hash each n-token window with a
  * splitmix64-style string hash, dedup, sort ascending. Replaces a 4-node
  * interpreted HOF chain (split → transform(element_at×n) → xxhash64 →
  * array_distinct) that dominated the dedup pipeline's cost.
  * A doc shorter than n tokens contributes its whole token string.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def mix(h0: Long): Long = {
    var h = h0 + 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  private def hashShingle(toks: Array[String], from: Int, len: Int): Long = {
    var h = 1469598103934665603L
    var i = from
    val end = from + len
    while (i < end) {
      val s = toks(i)
      var j = 0
      while (j < s.length) { h = (h ^ s.charAt(j)) * 1099511628211L; j += 1 }
      h = (h ^ ' ') * 1099511628211L
      i += 1
    }
    mix(h)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.toLowerCase.trim.split("\\s+")
    val set = new java.util.TreeSet[java.lang.Long]()
    if (toks.length < n) set.add(hashShingle(toks, 0, toks.length))
    else {
      var i = 0
      while (i + n <= toks.length) { set.add(hashShingle(toks, i, n)); i += 1 }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Distinct sorted hashes of character n-grams (for exact-Jaccard near-dup
  * verification via [[JaccardSorted]]).
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.toLowerCase
    val set = new java.util.TreeSet[java.lang.Long]()
    val upper = math.max(1, s.length - n + 1)
    var i = 0
    while (i < upper) {
      var h = 1469598103934665603L
      var j = i
      val end = math.min(s.length, i + n)
      while (j < end) { h = (h ^ s.charAt(j)) * 1099511628211L; j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** Exact Jaccard similarity of two SORTED distinct long arrays: two-pointer
  * merge, no per-element boxing or hash sets (array_intersect/array_union
  * build hash maps per row).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    java.lang.Double.valueOf(if (union == 0) 1.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
}

object TextExprs {
  // Spark 4's Column wraps a ColumnNode, not an Expression — the classic
  // bridge converts in both directions
  import org.apache.spark.sql.graftx.Bridge.{column, expression}

  def minhashSig(hashes: Column, k: Int): Column = column(MinHashSig(expression(hashes), k))
  def simhash64(featureHashes: Column): Column = column(SimHash64(expression(featureHashes)))
  def shingleHashes(text: Column, n: Int): Column = column(ShingleHashes(expression(text), n))
  def charNgramHashes(text: Column, n: Int): Column = column(CharNgramHashes(expression(text), n))
  def jaccardSorted(a: Column, b: Column): Column = column(JaccardSorted(expression(a), expression(b)))

  /** SQL names, so the console can call them too. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head, 64), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
  }
}
