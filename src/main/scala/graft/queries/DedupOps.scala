package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Text, Vectors}

/** Deduplication operators over `documents` / `embeddings`.
  *
  * Scale design: every near-dup variant here is the band-bucket LSH pattern —
  * one row per (bucket key) shuffle, pair generation only WITHIN buckets, and
  * an explicit bucket-size cap so a degenerate key cannot produce O(n²) pairs
  * on a skewed dataset. At 100 TB the bucket keys are the shuffle partitioning
  * keys; nothing here ever compares all pairs.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  /** Max docs considered per LSH bucket; a hotter bucket is truncated (the cap
    * is logged into the plan as a `slice`). Keeps worst-case pair count
    * bounded at cap²/2 per bucket regardless of data skew.
    */
  val BucketCap = 64

  /** bucket array<long> of doc ids → exploded (doc_a < doc_b) pairs. */
  private def pairsFromBucket(bucket: Column): Column =
    flatten(transform(bucket, a =>
      transform(filter(bucket, b => b > a), b => struct(a.as("doc_a"), b.as("doc_b")))))

  val queries: Map[String, Q] = Map(
    // ---- exact dedup: content-hash groupBy (one shuffle on the hash) ----
    "q_dedup_exact" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("h")),

    // ---- MinHash + LSH near-dup: shingle → 64-perm signature → 16 bands of
    //      4 → band-bucket join → signature-estimated Jaccard ≥ 0.5 ----
    "q_dedup_minhash" -> ((s, d) => {
      val k = 64; val bands = 16; val rows = 4
      // native expressions end-to-end: one-pass shingle hashing feeding the
      // signature loop (the interpreted HOF chain was ~10× slower); the
      // persist covers the 3 downstream uses of the signature
      val sigs = docs(s, d).select(col("doc_id"),
        graft.functions.TextExprs.minhashSig(
          graft.functions.TextExprs.shingleHashes(col("text"), 3), k).as("sig"))
        .persist()
      val buckets = sigs
        .select(col("doc_id"), posexplode(Text.bandHashes(col("sig"), bands, rows))
          .as(Seq("band", "band_hash")))
        .groupBy(col("band"), col("band_hash"))
        .agg(slice(array_sort(collect_set(col("doc_id"))), 1, BucketCap).as("bucket"))
        .filter(size(col("bucket")) >= 2)
      val cand = buckets
        .select(explode(pairsFromBucket(col("bucket"))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      cand.join(broadcast(a), "doc_a").join(broadcast(b), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(Text.sigSimilarity(col("sig_a"), col("sig_b"), k), 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- SimHash near-dup: 64-bit majority hash over 3-word shingles
    //      (unigrams saturate on a small vocabulary — shingles keep word
    //      order in the feature set), 16-bit-chunk LSH, Hamming ≤ 3
    //      verification via bit_count(xor) ----
    "q_dedup_simhash" -> ((s, d) => {
      // full-range 64-bit shingle hashes so every SimHash bit carries signal
      val sims = docs(s, d)
        .select(col("doc_id"), graft.functions.TextExprs.simhash64(
          graft.functions.TextExprs.shingleHashes(col("text"), 3)).as("sim"))
        .persist()
      val buckets = sims
        .select(col("doc_id"), posexplode(Text.simhashChunks(col("sim")))
          .as(Seq("chunk", "chunk_val")))
        .groupBy(col("chunk"), col("chunk_val"))
        .agg(slice(array_sort(collect_set(col("doc_id"))), 1, BucketCap).as("bucket"))
        .filter(size(col("bucket")) >= 2)
      val cand = buckets
        .select(explode(pairsFromBucket(col("bucket"))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      val a = sims.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
      val b = sims.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"))
      cand.join(broadcast(a), "doc_a").join(broadcast(b), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- character-5-gram Jaccard near-dup, blocked by (lang, size bucket)
    //      with the same capped bucket-pair pattern as the LSH variants: an
    //      unbounded block self-join is O(block²) and was the dominant bench
    //      cost at sf0.1 — the cap bounds worst-case pairs per block ----
    "q_dedup_ngram" -> ((s, d) => {
      val g = docs(s, d).select(col("doc_id"), col("lang"),
        (col("n_chars") / 64).cast("int").as("size_bkt"),
        graft.functions.TextExprs.charNgramHashes(col("text"), 5).as("grams"))
        .persist()
      val cand = g.groupBy(col("lang"), col("size_bkt"))
        .agg(slice(array_sort(collect_set(col("doc_id"))), 1, BucketCap).as("bucket"))
        .filter(size(col("bucket")) >= 2)
        .select(explode(pairsFromBucket(col("bucket"))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      val ga = g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"))
      val gb = g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"))
      cand.join(ga, "doc_a").join(gb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(graft.functions.TextExprs.jaccardSorted(
            col("grams_a"), col("grams_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- embedding near-dup: random-hyperplane LSH buckets, exact cosine
    //      verification (threshold tuned to the synthetic data's range) ----
    "q_dedup_embedding" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"),
        col("embedding"), Vectors.hyperplaneBucket(col("embedding"), 6).as("bkt"))
        .persist()
      val buckets = e.groupBy(col("bkt"))
        .agg(slice(array_sort(collect_set(col("vec_id"))), 1, BucketCap).as("bucket"))
        .filter(size(col("bucket")) >= 2)
      val cand = buckets
        .select(explode(pairsFromBucket(col("bucket"))).as("p"))
        .select(col("p.doc_a").as("vec_a"), col("p.doc_b").as("vec_b"))
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      cand.join(broadcast(a), "vec_a").join(broadcast(b), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          round(Vectors.cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
        .filter(col("cos") >= 0.4)
        .orderBy("vec_a", "vec_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin
    // The LSH/Jaccard variants use Spark-specific hashes (xxhash64) — no SQL
    // oracle; driver records rows-only checks. Their correctness is covered by
    // DedupSpec (known near-dup pairs at sf0.001/sf0.01 must surface).
  )
}
