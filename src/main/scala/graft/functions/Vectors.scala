package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column (Array[Float]) math via higher-order functions — per-row,
  * shuffle-free, no UDFs. Elements are cast to double before arithmetic so
  * Spark and any oracle accumulate in the same precision.
  */
object Vectors {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic pseudo-random hyperplane weight for (plane, dim): uniform
    * in [-1, 1), from a splitmix64-style mix computed ONCE on the driver —
    * the weight matrix ships to executors as a literal array, so the per-row
    * work is a pure multiply-add with no hashing.
    */
  private def planeWeight(plane: Int, dim: Int): Double = {
    var h = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    Math.floorMod(h, 2000001L).toDouble / 1000000.0 - 1.0
  }

  /** Random-hyperplane LSH bucket id: `nPlanes` sign bits packed into a long.
    * Vectors with high cosine similarity land in the same bucket with high
    * probability; at cluster scale the bucket id is the shuffle key for both
    * near-dup pairing and ANN candidate generation. `table` offsets the plane
    * set so independent hash tables can be OR-combined. `dim` must match the
    * embedding width (the weight matrix is a compile-time literal).
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, table: Int = 0,
      dim: Int = 64): Column =
    (0 until nPlanes).map { p =>
      val w = typedlit((0 until dim).map(i => planeWeight(table * 64 + p, i)))
      val proj = aggregate(
        zip_with(vec, w, (x, wi) => x.cast("double") * wi),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table LSH signature: array of (table, bucket) structs. OR-combining
    * `nTables` independent tables trades a linear factor of work for
    * exponentially better recall — the standard production ANN layout.
    */
  def lshTables(vec: Column, nPlanes: Int, nTables: Int, dim: Int = 64): Column =
    array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), hyperplaneBucket(vec, nPlanes, t, dim).as("bkt"))): _*)
}
