package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing checks: blob integrity, frame sampling arithmetic,
  * stub-decoder determinism, and features flowing into the ANN path.
  */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("blob bytes round-trip the source text exactly") {
    val row = Multimodal.mediaFromDocuments(Tables(spark, sf, "documents"))
      .filter(col("media_id") === 0)
      .join(Tables(spark, sf, "documents").filter(col("doc_id") === 0),
        col("media_id") === col("doc_id"))
      .select(col("bytes"), col("text")).collect().head
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == row.getString(1))
  }

  test("frame sampling covers the blob with the right frame count and sizes") {
    val rows = SparkEntry.queries("q_media_frames")(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_bytes"); val sampled = r.getAs[Int]("n_sampled")
      val frames = math.max(1, math.ceil(n / 256.0).toInt)
      assert(sampled == math.ceil(frames / 4.0).toInt, s"media ${r.getLong(0)}")
      assert(r.getAs[Int]("first_frame_bytes") == math.min(n, 256))
    }
  }

  test("stub decoder is deterministic and unit-norm") {
    val a = Multimodal.featuresFromDocuments(spark, Tables(spark, sf, "documents"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap
    val b = Multimodal.featuresFromDocuments(spark, Tables(spark, sf, "documents"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(v == b(k), s"media $k features not deterministic")
      assert(v.length == 64)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"media $k norm $norm")
    }
  }

  test("media features feed the ANN operator") {
    val rows = SparkEntry.queries("q_media_ann")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("cos") <= 1.000001))
    assert(rows.map(_.getAs[Long]("probe_id")).distinct.length <= 5)
  }
}
