package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line the driver parses.
  *
  * Protocol (BASELINE.md): warm runs — one untimed pass first (JIT +
  * whole-stage codegen compilation, parquet footer caches, OS page cache),
  * then one timed pass. Caches are cleared before each timed query so a
  * query's own persist() calls never hide recompute cost inside the warm
  * pass; what's measured is the full operator pipeline on warm I/O.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force full computation of every operator: count() would let Catalyst
    // prune projections away; the noop sink executes the real plan.
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n => // warm pass
      try run(n) catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop this query's persists before the next
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
