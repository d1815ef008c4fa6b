package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Skew-injection proof for the dedup/LSH bucket-cap contract (r15 verdict
  * item 2): the 100-TB story for every near-dup variant leans on
  * [[DedupOps.cappedBuckets]] — a degenerate band key (boilerplate text,
  * adversarial duplicates) must NOT produce an O(hot²) pair explosion or an
  * unbounded aggregation buffer. SkewSpec proves the join-side skew story;
  * this spec feeds the dedup side an actually-degenerate key distribution
  * and asserts the contract rather than assuming it:
  *
  *  (a) bucket arrays stay ≤ BucketCap rows even when one key covers 20%
  *      of the corpus, and the kept members are the BucketCap SMALLEST ids
  *      (the deterministic survivor rule the oracles mirror);
  *  (b) candidate-pair counts stay ≤ Σ_buckets C(cap,2) — the cap²/2 bound
  *      PLANS.md states — instead of C(hot,2);
  *  (c) the full minhash LSH pipeline completes on a corpus where 25% of
  *      docs are byte-identical (every band hashes them to ONE bucket) and
  *      emits exactly C(cap,2) pairs for the hot group, all among the cap
  *      smallest hot ids.
  */
class DedupSkewSpec extends AnyFunSuite with SparkSpec {

  private val cap = DedupOps.BucketCap

  test("cappedBuckets bounds a 20%-hot key to BucketCap smallest ids") {
    // 10k rows; key 0 holds every 5th row (2000 rows = 20%); the rest
    // spread over 997 keys (~8 rows each)
    val df = spark.range(10000).select(
      col("id").as("doc_id"),
      when(col("id") % 5 === 0, lit(0L))
        .otherwise(pmod(col("id"), lit(997L)) + 1L).as("k"))
    val buckets = DedupOps.cappedBuckets(df, "doc_id", "k")
      .select(col("k"), col("bucket"))
    val sizes = buckets.select(max(size(col("bucket")))).head().getInt(0)
    assert(sizes <= cap, s"bucket exceeded cap: $sizes")
    // the hot bucket keeps the cap SMALLEST members: ids 0,5,...,5*(cap-1)
    val hot = buckets.filter(col("k") === 0L)
      .select(explode(col("bucket")).as("id"))
      .collect().map(_.getLong(0)).sorted
    assert(hot.length == cap, s"hot bucket size ${hot.length}")
    assert(hot.toSeq == (0 until cap).map(_ * 5L),
      s"hot bucket is not the $cap smallest ids: ${hot.take(5).toSeq}...")
    // (b) total candidate-pair bound: Σ C(|bucket|,2) ≤ n_buckets·C(cap,2)
    val (nBuckets, pairSum) = {
      val r = buckets.select(
        count(lit(1)),
        sum(expr("size(bucket) * (size(bucket) - 1) / 2"))).head()
      (r.getLong(0), r.getDouble(1).toLong)
    }
    assert(pairSum <= nBuckets * (cap.toLong * (cap - 1) / 2),
      s"pair bound violated: $pairSum pairs over $nBuckets buckets")
  }

  test("minhash LSH completes on a 25%-identical corpus with capped pairs") {
    // 600 docs: 150 byte-identical (ids 0..149 — every band's signature
    // slice collides, the worst-case single hot bucket), 450 unique
    val hotText = "the quick brown fox jumps over the lazy dog while the " +
      "slow green turtle naps beside the riverbank under warm afternoon sun"
    val docs = spark.range(600).select(
      col("id").as("doc_id"),
      when(col("id") < 150, lit(hotText)).otherwise(
        concat(lit("unique stream "), col("id"),
          lit(" alpha "), col("id") * 7, lit(" beta "), col("id") * 13,
          lit(" gamma "), col("id") * 31, lit(" delta "), col("id") * 57,
          lit(" epsilon "), col("id") * 91)).as("text"))
    val pairs = DedupOps.minhashPairs(docs)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hotPairs = pairs.filter { case (a, b) => a < 150 && b < 150 }
    // all 16 bands map the identical docs to one bucket; the cap keeps the
    // 64 smallest in each, so the hot group yields exactly C(cap,2) pairs —
    // NOT C(150,2) = 11175 — and every member is among the cap smallest ids
    assert(hotPairs.length == cap * (cap - 1) / 2,
      s"hot-group pairs ${hotPairs.length} != C($cap,2)")
    assert(hotPairs.forall { case (a, b) => a < cap && b < cap },
      "a hot pair escaped the cap-smallest-ids survivor set")
    // unique docs must not cross-match the hot group at jaccard >= 0.5
    val crossed = pairs.count { case (a, b) => (a < 150) != (b < 150) }
    assert(crossed == 0, s"$crossed unique docs matched the hot group")
  }

  test("simhash banding under the same degenerate corpus stays capped") {
    val hotText = "shared boilerplate header terms of service apply to all " +
      "users of this site please read carefully before continuing to browse"
    val docs = spark.range(400).select(
      col("id").as("doc_id"),
      when(col("id") < 100, lit(hotText)).otherwise(
        concat(lit("doc body "), col("id"), lit(" content "),
          col("id") * 17, lit(" more "), col("id") * 29)).as("text"))
    val cand = DedupOps.simhashCandPairs(docs)
      .filter(col("doc_a") < 100 && col("doc_b") < 100).count()
    // identical docs share every simhash chunk → one hot bucket per chunk,
    // capped: candidates ≤ C(cap,2), not C(100,2) = 4950
    assert(cand <= cap.toLong * (cap - 1) / 2,
      s"simhash hot-group candidates $cand exceed C($cap,2)")
    assert(cand > 0, "degenerate fixture produced no candidates at all")
  }
}
