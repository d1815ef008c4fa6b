package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks: tokenization, shingling, MinHash, SimHash,
  * rolling-hash fingerprints. All composed from codegen-friendly built-ins and
  * higher-order functions — no Scala UDFs, so everything stays inside Catalyst
  * and distributes trivially (per-row, no shuffle).
  *
  * Arithmetic is kept inside [0, 2^31-1) via `pmod` so products fit a long
  * without overflow even under ANSI mode (a*h < 2^62).
  */
object Text {
  /** Mersenne prime 2^31-1; hash universe for MinHash permutations. */
  val P = 2147483647L

  /** Whitespace tokenization after lowercasing. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles; a doc shorter than n words contributes its whole
    * token string as a single shingle.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array(concat_ws(" ", toks)))

  /** Distinct shingle hashes in [0, P). */
  def shingleHashes(shingles: Column): Column =
    array_distinct(transform(shingles, s => pmod(xxhash64(s), lit(P))))

  /** k-permutation MinHash signature: sig_i = min over shingles of
    * (a_i * h + b_i) mod P. Fixed deterministic Knuth-style multipliers.
    */
  def minhashSig(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = pmod((i * 2 + 1) * lit(2654435761L), lit(P))
      val b = pmod((i + 7) * lit(40503L) * lit(99991L), lit(P))
      array_min(transform(hashes, h => pmod(a * h + b, lit(P))))
    })

  /** LSH band hashes over a MinHash signature: `bands` hashes, each over
    * `rows` consecutive signature positions. Docs sharing any band hash are
    * near-dup candidates (the classic band-bucket scheme — at cluster scale
    * this is ONE shuffle keyed by (band, hash), no pairwise comparison).
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(slice(sig, b * lit(rows) + 1, lit(rows))))

  /** Estimated Jaccard similarity = fraction of matching signature positions. */
  def sigSimilarity(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k

  /** Per-token 64-bit hashes (SimHash input). */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** 64-bit SimHash: bit b is set iff the b-th bit is set in the majority of
    * token hashes. Uses a SQL-expression lambda because `shiftright` with a
    * non-literal shift is SQL-only.
    */
  def simhash64(tokenHashesCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), 0L, (acc, b) ->
       |  acc + if(aggregate($tokenHashesCol, 0L,
       |             (s, h) -> s + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
       |           shiftleft(1L, b), 0L))""".stripMargin)

  /** The `nChunks` 16-bit chunks of a 64-bit SimHash — Hamming-distance LSH:
    * two hashes within distance d share at least one chunk if d < nChunks.
    */
  def simhashChunks(sim: Column, nChunks: Int = 4): Column =
    array((0 until nChunks).map(c =>
      shiftright(sim, c * 16).bitwiseAND(lit(0xFFFFL))): _*)

  /** Distinct character n-grams. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Polynomial rolling-hash document fingerprint: order-sensitive fold over
    * per-token hashes, mod P.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(transform(toks, t => pmod(xxhash64(t), lit(P))), lit(0L),
      (acc, h) => pmod(acc * 131 + h, lit(P)))
}
