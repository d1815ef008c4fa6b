package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Mid-band cost census (r16 verdict item 7): for each named query,
  * decompose wall time into
  *
  *   - `build_s`: DataFrame construction (logical plan assembly; includes
  *     any eager materialization a body does at construction time),
  *   - `plan_s`: analysis → executedPlan preparation (optimizer +
  *     physical planning + codegen collapse) on a fresh copy,
  *   - `exec_s`: the noop-sink execution wall (median of 3 warm passes),
  *   - `task_s`: Σ executor task durations inside that execution,
  *   - `tasks`/`stages`/`jobs`: scheduling volume,
  *   - `sched_s`: exec_s − task_s/cores — the wall not explained by
  *     perfectly-packed task work: scheduler latency, stage barriers,
  *     driver-side codegen/broadcast waits. For a 1–2 s query at 32
  *     cores, sched_s ≈ exec_s means the key is fixed-cost-bound (a
  *     bench-scale artifact, not a 100 TB problem); task-bound keys are
  *     the real optimization candidates.
  *
  * `runMain graft.MidbandCensus <sfDir> <outPath> <query...>` — the key
  * list comes from the caller (the round's BENCH_FULL mins band), so the
  * census never hardcodes a cost model.
  */
object MidbandCensus {

  private class Acc extends SparkListener {
    @volatile var taskMs = 0L
    @volatile var tasks = 0L
    @volatile var stages = 0L
    @volatile var jobs = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null) { taskMs += t.taskInfo.duration; tasks += 1 }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    def reset(): Unit = synchronized { taskMs = 0; tasks = 0; stages = 0; jobs = 0 }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: MidbandCensus <sfDir> <outPath> <query...>")
      sys.exit(2)
    }
    val (sfDir, outPath) = (args(0), args(1))
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    def release(): Unit = {
      graft.operators.Persisted.releaseAll(spark)
      graft.plans.RollupRewrite.clear(spark)
      spark.catalog.clearCache()
    }
    val rows = names.filter(all.contains).map { name =>
      spark.sparkContext.setJobDescription(s"midband: $name")
      // warm pass (JIT, page cache, codegen cache)
      all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      release()
      // build: logical assembly incl. any eager work the body does
      val tb0 = System.nanoTime()
      val df = all(name)(spark, sfDir)
      val buildS = (System.nanoTime() - tb0) / 1e9
      // plan: force the prepared physical plan on the built frame
      val tp0 = System.nanoTime()
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      val planS = (System.nanoTime() - tp0) / 1e9
      release()
      // exec: median of 3 fresh noop passes, task metrics from the median
      // pass's accumulator snapshot (per-pass counters)
      val passes = (1 to 3).map { _ =>
        acc.reset()
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        release()
        (w, acc.taskMs / 1e3, acc.tasks, acc.stages, acc.jobs)
      }.sortBy(_._1)
      val (wall, taskS, tasks, stages, jobs) = passes(1)
      val schedS = wall - taskS / cpus
      f"""{"q":"$name","build_s":$buildS%.3f,"plan_s":$planS%.3f,""" +
        f""""exec_s":$wall%.3f,"task_s":$taskS%.3f,"tasks":$tasks,""" +
        f""""stages":$stages,"jobs":$jobs,"sched_s":$schedS%.3f}"""
    }
    val json = s"""{"cpus":$cpus,"sf":"$sfDir","rows":[${rows.mkString(",\n")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(s"[midband] wrote ${rows.size} rows to $outPath")
    spark.stop()
  }
}
