package graft.queries

import graft.operators.Persisted._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Geospatial operators beyond the reference's ST_Point/ST_AsText scalar
  * surface (/root/reference/src — the UDF registry): a distance-radius
  * SELF-JOIN made tractable by grid-cell blocking — the spatial sibling
  * of the LSH band-bucket recipe every DedupOps variant uses.
  *
  * Scale notes: an all-pairs radius join is O(n²); bucketing points into
  * cells of side == radius guarantees every qualifying pair shares one of
  * the 3×3 neighbor cells, so candidates come from ONE equi-join on the
  * cell key (probe side expanded 9×, the corpus side untouched). Cell
  * population is area-bounded (points per cell ≈ density · r²), the same
  * content-bounded-block argument as the dedup banding. Coordinates are
  * integers derived from the shared LCG, the distance test compares
  * SQUARED integer distances — no FP anywhere, bit-exact either engine.
  */
object GeoOps {
  type Q = (SparkSession, String) => DataFrame

  private val P = 2147483647L

  val queries: Map[String, Q] = Map(
    // ---- grid-blocked radius self-join: customers at deterministic
    //      integer coordinates in a 1000×1000 plane; report the census of
    //      pairs within distance 20 (dist² ≤ 400) plus a squared-distance
    //      histogram. Candidate generation: each LEFT point explodes into
    //      its 3×3 cell neighborhood (9 rows), equi-join on the cell key
    //      against unexpanded RIGHT points, a.id < b.id dedups the
    //      symmetric pair ----
    "q_spatial_join" -> ((s, d) => {
      // key reduced mod P BEFORE the multiplies (the repo-wide LCG wrap
      // rule): the raw products overflow Long past ~8·10⁹ ids, where Spark
      // wraps silently but DuckDB's BIGINT errors — mod-first keeps every
      // intermediate < 2⁶² on both engines at any key scale
      val k = pmod(col("c_custkey"), lit(P))
      val pts = Tables(s, d, "customer")
        .select(col("c_custkey").as("id"),
          (pmod(k * 1103515245L + 12345L, lit(P)) % 1000).as("x"),
          // y mixes a quadratic term — two LINEAR congruential coordinates
          // of the same key are collinear mod the lattice and collapse the
          // distance spectrum to a handful of values
          (pmod(pmod(k * k, lit(P)) * 69069L + 1L, lit(P)) % 1000).as("y"))
        .persistTracked()
      val right = pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("by"), expr("x div 20").as("cx"), expr("y div 20").as("cy"))
      val probes = pts
        .crossJoin(broadcast(
          s.range(-1, 2).toDF("dx").crossJoin(s.range(-1, 2).toDF("dy"))))
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          (expr("x div 20") + col("dx")).as("cx"),
          (expr("y div 20") + col("dy")).as("cy"))
      probes.join(right, Seq("cx", "cy"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
            (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
        .filter(col("d2") <= 400)
        .select(expr("d2 div 100").as("d2_bucket"), col("d2"))
        .groupBy(col("d2_bucket"))
        .agg(count(lit(1)).as("n_pairs"), min(col("d2")).as("min_d2"),
          max(col("d2")).as("max_d2"))
        .orderBy("d2_bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    // the 9-cell neighborhood via two 3-row VALUES cross joins; identical
    // integer LCG coordinates, identical squared-distance test
    "q_spatial_join" ->
      """WITH pts AS (
        |  SELECT c_custkey AS id,
        |         (((c_custkey % 2147483647) * 1103515245 + 12345)
        |          % 2147483647) % 1000 AS x,
        |         ((((c_custkey % 2147483647) * (c_custkey % 2147483647)
        |            % 2147483647) * 69069 + 1)
        |          % 2147483647) % 1000 AS y
        |  FROM customer),
        |probes AS (
        |  SELECT id AS a_id, x AS ax, y AS ay,
        |         x // 20 + dx.v AS cx, y // 20 + dy.v AS cy
        |  FROM pts, (VALUES (-1), (0), (1)) dx(v),
        |            (VALUES (-1), (0), (1)) dy(v)),
        |rgt AS (
        |  SELECT id AS b_id, x AS bx, y AS by, x // 20 AS cx, y // 20 AS cy
        |  FROM pts),
        |pairs AS (
        |  SELECT p.a_id, r.b_id,
        |         (p.ax - r.bx) * (p.ax - r.bx) +
        |         (p.ay - r.by) * (p.ay - r.by) AS d2
        |  FROM probes p JOIN rgt r ON p.cx = r.cx AND p.cy = r.cy
        |  WHERE p.a_id < r.b_id)
        |SELECT d2 // 100 AS d2_bucket, count(*) AS n_pairs,
        |       min(d2) AS min_d2, max(d2) AS max_d2
        |FROM pairs WHERE d2 <= 400
        |GROUP BY d2 // 100 ORDER BY d2_bucket""".stripMargin
  )
}
