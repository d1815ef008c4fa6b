package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftx.Bridge.{column, expression}
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-backed predicates as native Catalyst expressions.
  *
  * `bloomMightContain` wraps Spark's own codegen'd
  * [[BloomFilterMightContain]] — the expression Spark's runtime row-level
  * filtering (InjectRuntimeFilter) injects — over a filter built with
  * `df.stat.bloomFilter` (both sides use `org.apache.spark.util.sketch
  * .BloomFilter`, so the serialized form round-trips). Unlike a Scala UDF it
  * stays inside whole-stage codegen with no per-row boxing, and the literal
  * filter bytes ship once per task binary, the same way InjectRuntimeFilter's
  * scalar-subquery result does.
  */
object SketchExprs {

  /** Predicate: `key` (LongType) might be in `bf`. Exact-negative: false ⇒
    * definitely absent, so filtering with it before a join loses no rows.
    */
  def bloomMightContain(bf: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    column(BloomFilterMightContain(Literal(bos.toByteArray), expression(key)))
  }
}
