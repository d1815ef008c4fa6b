package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Multimodal
import graft.functions.Vectors

/** Multimodal-column queries: metadata projection (oracle-able), frame
  * sampling (oracle on counts/sizes — the frame bytes themselves are opaque),
  * and the stub-decode → feature → similarity pipeline (rows-only: the
  * decoder is engine-side).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  val queries: Map[String, Q] = Map(
    // ---- blob + metadata projection ----
    "q_media_meta" -> ((s, d) =>
      Multimodal.mediaFromDocuments(docs(s, d))
        .select(col("media_id"), col("kind"),
          octet_length(col("bytes")).as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .orderBy("media_id")),

    // ---- frame sampling over binary columns (stride 4, 256-byte frames) ----
    "q_media_frames" -> ((s, d) =>
      Multimodal.mediaFromDocuments(docs(s, d))
        .select(col("media_id"),
          Multimodal.sampleFrames(col("bytes"), 256, 4).as("frames"),
          octet_length(col("bytes")).as("n_bytes"))
        .select(col("media_id"), col("n_bytes"),
          size(col("frames")).as("n_sampled"),
          octet_length(element_at(col("frames"), 1).getField("frame")).as("first_frame_bytes"))
        .orderBy("media_id")),

    // ---- stub decode → features → per-kind nearest neighbor (rows-only) ----
    "q_media_ann" -> ((s, d) => {
      val feats = Multimodal.featuresFromDocuments(s, docs(s, d)).persist()
      val probes = feats.filter(col("media_id") < 5)
        .select(col("media_id").as("probe_id"), col("features").as("pf"))
      val corpus = feats.select(col("media_id").as("neighbor_id"), col("features").as("nf"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      corpus.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"),
          round(Vectors.cosine(col("pf"), col("nf")), 6).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("probe_id"), col("rn"), col("neighbor_id"), col("cos"))
        .orderBy("probe_id", "rn")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       CAST(doc_id % 8 * 64 + 256 AS INTEGER) AS width,
        |       CAST(doc_id % 6 * 64 + 256 AS INTEGER) AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_media_frames" ->
      """SELECT doc_id AS media_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       CAST(ceil(greatest(ceil(octet_length(CAST(text AS BLOB)) / 256.0), 1) / 4.0)
        |            AS INTEGER) AS n_sampled,
        |       least(octet_length(CAST(text AS BLOB)), 256) AS first_frame_bytes
        |FROM documents ORDER BY media_id""".stripMargin
    // q_media_ann: decoder is engine-side (stub) — rows-only.
  )
}
