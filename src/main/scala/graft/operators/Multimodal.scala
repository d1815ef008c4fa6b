package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed batches.
  *
  * The decode step is a STUB — this container has no image/audio codecs — but
  * everything around it is the real Spark shape a production pipeline uses:
  *
  *  - blobs travel as `BinaryType` columns with a metadata struct alongside;
  *  - decode/feature-extract runs via `mapPartitions` on a typed Dataset
  *    (the JVM analog of `mapInPandas`: one iterator per partition, so a
  *    codec library would be initialized once per partition, not per row);
  *  - frame sampling is pure Catalyst (binary `substring` over an index
  *    `sequence`), no UDF at all;
  *  - extracted features are Array[Float] columns that flow straight into
  *    the VectorOps ANN/dedup operators.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, dim: Int, features: Array[Float])

  /** Synthesize a media table from `documents`: the text's UTF-8 bytes stand
    * in for an encoded blob; metadata is derived deterministically. Real
    * pipelines read blobs via `spark.read.format("binaryFile")` or a
    * bytes-bearing parquet/iceberg table — the downstream shape is identical.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(6)) * 64 + 256).cast("int").as("height"),
        lit(3).cast("int").as("channels")).as("meta"))

  /** Frame sampling without leaving Catalyst: split the blob into fixed-size
    * "frames" and keep every `stride`-th one.
    */
  def sampleFrames(bytes: org.apache.spark.sql.Column, frameBytes: Int,
      stride: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(octet_length(bytes).cast("double") / frameBytes).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nFrames, lit(1)) - 1),
        i => struct(i.as("idx"),
          substring(bytes, (i * frameBytes + 1).cast("int"), lit(frameBytes)).as("frame"))),
      f => pmod(f.getField("idx"), lit(stride)) === 0)
  }

  /** STUB decoder: a real implementation would decode the codec and pool
    * pixel/sample values; this deterministic fake hashes fixed-size byte
    * blocks into a unit-norm float vector so the full pipeline (including
    * ANN over the output) is testable. Signature and batch shape are real.
    * Arithmetic is poly-131 mod P (2^31-1) + float32 normalization, both
    * replicable in plain SQL — so even the stub path has a DuckDB oracle.
    */
  private def decodeBlobStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val P = 2147483647L
    val raw = new Array[Float](dim)
    val block = math.max(1, bytes.length / dim)
    var i = 0
    while (i < dim) {
      var h = 0L
      var j = i * block
      val end = math.min(bytes.length, j + block)
      while (j < end) { h = (h * 131 + (bytes(j) & 0xFF)) % P; j += 1 }
      raw(i) = (h % 1000003L).toFloat / 1000003f
      i += 1
    }
    val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
    if (norm == 0f) raw else raw.map(_ / norm)
  }

  /** Distributed decode/feature-extract: one iterator per partition, codec
    * init once per partition (here: nothing to init — STUB).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec initialization would go here
      it.map(m => MediaFeatures(m.media_id, dim, decodeBlobStub(m.bytes, dim)))
    }
  }

  /** End-to-end: documents → media blobs → stub decode → feature vectors. */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(docs)
      .select(col("media_id"), col("kind"), col("bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
    extractFeatures(media, dim).toDF()
  }
}
