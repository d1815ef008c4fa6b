package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `documents` table shape
  * (doc_id, text, lang, source, n_chars) — the ingest-side counterpart of
  * [[EventsStream]]: a crawl arrives as a stream and must be deduplicated
  * before it lands in the corpus.
  */
object DocsStream {

  /** Streaming incremental-ingest dedup — the watermarked twin of
    * q_dedup_incremental, which proved the batch shape (16-byte md5
    * fingerprints, left-anti against the historical corpus) is exactly the
    * streaming-friendly one. Two stages:
    *
    *  1. in-stream dedup via `dropDuplicatesWithinWatermark("fp")` over a
    *     synthetic monotone ingest time (documents carry no event time, so
    *     crawl order = doc_id maps to 1 doc/second): the state store keeps
    *     one fingerprint per active watermark horizon (1 h ≈ 3600 docs per
    *     shard), NOT one per stream lifetime — bounded state at any crawl
    *     rate. Duplicates farther apart than the horizon fall through to
    *     stage 2.
    *  2. stream-static LEFT ANTI join against the historical fingerprint
    *     set — stateless on the stream side (the static side is re-read per
    *     micro-batch and broadcast when small; at 100 TB the static side is
    *     a bucketed fingerprint table and the join co-locates on fp).
    *
    * The same function runs on a batch frame (watermark is a no-op there)
    * — StreamingSpec checks stream == batch twin == q_dedup_incremental
    * three ways, on a fixture that CONTAINS intra-batch duplicate texts.
    * Which representative survives a duplicate group differs by mode, so
    * only the batch side can promise one:
    *
    *  - stream: `dropDuplicatesWithinWatermark` keeps the FIRST arrival
    *    per fingerprint — arrival order is real in a stream, but not a
    *    function of the data alone, so cross-mode equivalence is stated
    *    on FINGERPRINT SETS (which both modes determine identically).
    *  - batch: deterministic keep — min doc_id per fingerprint (a
    *    groupBy, not `dropDuplicates`, whose survivor depends on
    *    partition scan order). Same shape q_dedup_keep_best uses, so the
    *    batch twin is bit-reproducible run to run.
    *
    * Equivalence with the query holds whenever intra-batch duplicates sit
    * within one watermark horizon (trivially true for a batch).
    */
  def incrementalDedup(newDocs: DataFrame, historyFps: DataFrame): DataFrame = {
    val withFp = newDocs
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
      .withWatermark("ingest_ts", "1 hour")
      .select(col("doc_id"), md5(col("text")).as("fp"), col("ingest_ts"))
    val deduped =
      if (withFp.isStreaming) withFp.dropDuplicatesWithinWatermark("fp")
      else withFp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    deduped
      .join(historyFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** Streaming per-source heavy hitters: the Misra-Gries aggregator from
    * the batch path ([[graft.functions.HeavyHitters]]) dropped into a
    * streaming groupBy. The state store holds ONE ≤k-entry sketch buffer
    * per source — bounded regardless of stream length or vocabulary size;
    * each micro-batch folds in through the same merge the batch
    * partial-aggregation tree uses, and the MG guarantee (est ≤ true ≤
    * est + n/(k+1); no supra-threshold item evicted) holds under ANY
    * merge order, so it holds at every emission. Mergeable summaries ARE
    * the streaming-sketch story: the same property that makes the batch
    * plan one map-side-combined pass makes the streaming state bounded.
    * Runs identically on a batch frame (groupBy is mode-agnostic) —
    * StreamingSpec checks both modes against exact counts.
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("source"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"))
      .agg(graft.functions.HeavyHitters.misraGries(col("token"), k).as("mg"))

  /** Streaming Count-Min sketch over the token stream — one d·w counter
    * array in the state store regardless of stream length. Stronger
    * equivalence than [[heavyHitters]]: CM merge is element-wise ADDITION,
    * so the streamed sketch is BIT-IDENTICAL to the batch sketch over the
    * same rows — not merely bound-equivalent — whatever the micro-batch
    * cut points (StreamingSpec asserts array equality). The streaming
    * form answers point-frequency queries mid-ingest with no rescan.
    */
  def tokenFrequencies(docs: DataFrame, d: Int, w: Int): DataFrame =
    docs.select(
      explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .agg(graft.functions.CountMin.countMin(col("token"), d, w).as("cms"))

  /** Streaming MinHash signature rollup — q_minhash_rollup's per-source
    * signature as a running aggregate. Element-wise MIN is commutative,
    * associative and idempotent, so the streamed (source, pos) minima
    * after any series of micro-batches are BIT-IDENTICAL to the batch
    * rollup over the same rows — the [[tokenFrequencies]] argument,
    * applied to set-similarity sketches. The state store holds
    * |sources|·64 longs regardless of stream length; a 100 TB ingest
    * keeps live per-source signatures (→ pairwise source similarity
    * estimates mid-stream) with no rescan and no re-shingling.
    */
  def minhashRollup(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      posexplode(graft.functions.TextExprs.minhashSig(
        graft.functions.TextExprs.shingleHashes(col("text"), 3), 64))
        .as(Seq("pos", "v")))
      .groupBy(col("source"), col("pos"))
      .agg(min(col("v")).as("mv"))

  /** Streaming corpus checksum — q_corpus_checksum's integrity
    * fingerprint as a running per-source aggregate. Both channels are
    * COMMUTATIVE modular sums, so the streamed state after any series of
    * micro-batches is BIT-IDENTICAL to the batch aggregate over the same
    * rows (the [[tokenFrequencies]] argument, applied to integrity):
    * an ingest pipeline certifies "what landed == what was sent" per
    * source at every trigger, without ever rescanning the corpus. The
    * BATCH query q_corpus_checksum calls this very function, so the two
    * can never drift (StreamingSpec pins 3-micro-batch == batch anyway).
    */
  def corpusChecksum(docs: DataFrame): DataFrame = {
    val h = expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
    val hm = h % 2147483647L
    docs.select(col("source"), hm.as("hm"),
        ((hm * hm) % 2147483647L).as("hm2"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("hm").cast("decimal(38,0)")) % 2147483647L)
          .cast("long").as("checksum"),
        (sum(col("hm2").cast("decimal(38,0)")) % 2147483647L)
          .cast("long").as("checksum2"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Streaming winnow-fingerprint near-dup detection — the set-similarity
    * twin the sketch family (CMS/MG/checksum) already has: an arriving doc
    * is flagged when it shares ≥ `minShared` winnowing fingerprints with
    * the HISTORICAL corpus. The history side is the batch-side fingerprint
    * table ((fp) rows, already stop-cut by [[graft.queries.DedupOps
    * .WinnowDfCap]] discipline upstream), so the stream side is a
    * STATELESS stream-static inner join on the fp value; the per-doc
    * count aggregates under a synthetic-ingest-time watermark (the
    * [[incrementalDedup]] device: crawl order = doc_id → 1 doc/second),
    * with the window key alongside doc_id so closed windows EVICT — state
    * is bounded by the watermark horizon, never by stream lifetime (a
    * bare groupBy(doc_id) would keep one entry per doc forever). Each doc
    * has one ingest timestamp, so the window column refines nothing and
    * is dropped from the output. At 100 TB the history side is a bucketed
    * fp table and the join co-locates on fp — the q_dedup_incremental
    * scale story applied to LOCAL overlap instead of exact equality.
    *
    * `historyFps` must be DISTINCT (fp) rows — n_shared counts how many
    * of the doc's (already-distinct) fingerprints appear in the history
    * SET, a corpus-level containment signal rather than q_winnow_dedup's
    * per-pair count. Same function runs on a batch frame; StreamingSpec
    * pins three-way equivalence (stream == batch twin == an independent
    * set-arithmetic computation of the same semantics) on the flagged set.
    */
  def winnowNearDups(newDocs: DataFrame, historyFps: DataFrame,
      minShared: Int = 3): DataFrame =
    newDocs
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
      .withWatermark("ingest_ts", "1 hour")
      .select(col("doc_id"), col("ingest_ts"),
        explode(graft.functions.TextExprs
          .winnowHashes(col("text"), 3, 4)).as("fp"))
      .join(historyFps, Seq("fp"))
      .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("n_shared"))

  case class DocPriority(lang: String, doc_id: Long, priority: Long)
  // public for the janino state-store serializer (the EventsStream
  // RingState caveat); holds ≤k "id:priority" slots packed in one string
  case class SampleState(packed: String)

  /** Streaming stratified exact-k sample — the bounded-state twin of
    * q_stratified_sample's native TopKPerKey heap: per language the state
    * is the k smallest (priority, doc_id) pairs seen so far, O(k) per key
    * at any stream length, folded exactly like the batch operator's
    * partial heaps. Because the priority is a DETERMINISTIC function of
    * doc_id (the shared LCG), the final k per stratum is a pure function
    * of the row SET — independent of arrival order and micro-batch cuts —
    * so stream == batch fn == the oracle-gated query row for row, not
    * merely set-equivalent (StreamingSpec pins all three). This is why
    * hash-priority sampling, not RNG sampling, is the streamable design:
    * random() state would make the sample depend on replay history.
    */
  def stratifiedSample(docs: DataFrame, k: Int = 5): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val prio = docs.select(col("lang"), col("doc_id"),
      expr(graft.queries.CorpusOps.LcgPrioritySql).as("priority"))
      .as[DocPriority]
    prio.groupByKey(_.lang)
      .flatMapGroupsWithState[SampleState, DocPriority](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[DocPriority],
            state: org.apache.spark.sql.streaming.GroupState[SampleState]) =>
          val prev = state.getOption.filter(_.packed.nonEmpty)
            .map(_.packed.split(',').toList.map { s =>
              val Array(i, p) = s.split(':'); (p.toLong, i.toLong)
            }).getOrElse(Nil)
          val next = (prev ++ it.map(d => (d.priority, d.doc_id)))
            .distinct.sorted.take(k)
          state.update(SampleState(
            next.map { case (p, i) => s"$i:$p" }.mkString(",")))
          next.iterator.map { case (p, i) => DocPriority(lang, i, p) }
      }.toDF()
  }

  /** Load the documents table as a STREAM from a parquet directory.
    * `filesPerTrigger > 0` throttles ingest so a multi-file directory
    * arrives as multiple micro-batches (exercises cross-batch state). */
  def readDocsStream(spark: SparkSession, dir: String,
      filesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, " +
        "source STRING, n_chars BIGINT")
    (if (filesPerTrigger > 0)
      r.option("maxFilesPerTrigger", filesPerTrigger)
    else r).parquet(dir)
  }
}
