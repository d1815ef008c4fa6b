package graft.queries

import graft.SparkSpec
import graft.functions.{TextExprs, TextHash, VectorExprs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused gate for the r17 expression-codegen work: the text/vector
  * kernels stopped being CodegenFallback (which split every containing
  * plan node out of whole-stage codegen) and the mod-P hot loops swapped
  * the hardware division for the Mersenne fold. Both changes must be
  * VALUE-INVISIBLE; this spec pins (1) the arithmetic identities, (2)
  * generated-vs-interpreted equality on real corpus data, and (3) the
  * plan-level claim that a signature projection now fuses into a
  * WholeStageCodegen span.
  */
class KernelCodegenSpec extends AnyFunSuite with SparkSpec {

  test("modP equals % on the full 2^62 domain incl. boundary values") {
    val P = TextHash.P
    val edge = Seq(0L, 1L, P - 1, P, P + 1, 2 * P, 2 * P + 1,
      (1L << 62) - 1, (1L << 62) - P, 123456789012345678L)
    val rnd = new scala.util.Random(7)
    val xs = edge ++ Seq.fill(20000)(math.abs(rnd.nextLong()) & ((1L << 62) - 1))
    xs.foreach { x =>
      assert(TextHash.modP(x) == x % P, s"x=$x")
    }
  }

  test("rolling CharNgramHashes equals the per-window poly fold") {
    val rnd = new scala.util.Random(11)
    def reference(s: String, n: Int): Seq[Long] = {
      val upper = math.max(1, s.length - n + 1)
      val buf = (0 until upper).map(i =>
        TextHash.poly(s, i, math.min(s.length, i + n), 131))
      buf.distinct.sorted
    }
    val alpha = "ab cdéxyz QRs  t"
    (0 until 300).foreach { _ =>
      val len = rnd.nextInt(40)
      val s = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val n = 1 + rnd.nextInt(7)
      val e = graft.functions.CharNgramHashes(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), n)
      val got = e.kernel(org.apache.spark.unsafe.types.UTF8String
        .fromString(s.toLowerCase(java.util.Locale.ROOT)))
        .toLongArray().toSeq
      assert(got == reference(s.toLowerCase(java.util.Locale.ROOT), n),
        s"s='$s' n=$n")
    }
  }

  test("generated and interpreted paths agree on corpus text") {
    val docs = graft.Tables(spark, sf, "documents").limit(40)
      .select(col("doc_id"), col("text"))
    val viaCodegen = docs.select(col("doc_id"),
        TextExprs.minhashSig(TextExprs.shingleHashes(col("text"), 3), 64)
          .as("sig"),
        TextExprs.bandHashes(
          TextExprs.minhashSig(TextExprs.charNgramHashes(col("text"), 5), 8),
          4, 2).as("bands"),
        TextExprs.simhashBits(
          TextExprs.shingleFeatures62(col("text"), 3)).as("sh"),
        TextExprs.rollingHash(col("text")).as("rh"),
        TextExprs.winnowHashes(col("text"), 3, 4).as("wh"),
        TextExprs.charEntropy(col("text")).as("ent"))
      .collect()
    // interpreted twins: call the kernels directly on the same strings
    val raw = docs.collect().map(r => r.getLong(0) ->
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      .toMap
    viaCodegen.foreach { r =>
      val u = raw(r.getLong(0))
      val sh3 = graft.functions.ShingleHashes(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 3).kernel(u)
      val sig = graft.functions.MinHashSig(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 64).kernel(sh3)
      assert(r.getSeq[Long](1) == sig.toLongArray().toSeq)
      val ent = graft.functions.CharEntropy(
        org.apache.spark.sql.catalyst.expressions.Literal("x")).kernel(u)
      assert(r.getDouble(6) == ent)
    }
  }

  test("a signature projection fuses into a WholeStageCodegen span") {
    val df = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        TextExprs.minhashSig(TextExprs.shingleHashes(col("text"), 3), 16)
          .as("sig"),
        VectorExprs.cosine(
          array((0 until 4).map(_ => lit(1.0f)): _*),
          array((0 until 4).map(_ => lit(0.5f)): _*)).as("cos"))
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
    val fusedProject = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.collect {
          case p: org.apache.spark.sql.execution.ProjectExec => p
        }.exists(_.projectList.exists(_.find {
          case _: graft.functions.MinHashSig => true
          case _ => false
        }.isDefined)) => w
    }
    assert(fusedProject.nonEmpty,
      "MinHashSig projection is not inside a WholeStageCodegen span:\n" +
        plan.toString)
    // and the generated span actually janino-compiles (no silent
    // interpreted fallback past the huge-method limit)
    fusedProject.foreach { w =>
      val (_, source) = w.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source)
    }
  }

  test("CosineSim kernel matches the reference fold on random vectors") {
    val rnd = new scala.util.Random(3)
    (0 until 100).foreach { _ =>
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
      val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b)
      val dummy = org.apache.spark.sql.catalyst.expressions.Literal("x")
      val got = graft.functions.CosineSim(dummy, dummy).kernel(ad, bd)
      // reference: the pre-r17 toFloatArray fold
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      assert(got == dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }
}
