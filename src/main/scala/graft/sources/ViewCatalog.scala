package graft.sources

import org.apache.spark.sql.SparkSession

/** Persistable view catalog — "save a plan, re-run it later".
  *
  * The reference serializes logical plans to JSON
  * (/root/reference/src/logicalplan.rs:607-652; ROADMAP.md:44 plans a
  * protobuf form). Spark's analyzed plans are deliberately NOT stable
  * across sessions/versions, so the Spark-first durable representation of a
  * plan is its SQL text (the substitute SURVEY.md §1.5 documents): the
  * catalog maps view name → SQL, persists itself as JSON through Spark's own
  * writer, and re-registering a loaded catalog re-plans each view against
  * the current tables and optimizer — same results, fresh physical plan.
  *
  * Metadata-scale by construction: the persisted payload is a few strings
  * per view (the `collect` on load reads catalog entries, never data).
  */
final case class ViewCatalog(views: Map[String, String] = Map.empty) {

  /** Add/replace a view definition (pure — returns the new catalog). */
  def withView(name: String, sql: String): ViewCatalog =
    copy(views = views + (name -> sql))

  /** Plan each SQL and register it as a temp view in `spark`. */
  def registerAll(spark: SparkSession): Unit =
    views.foreach { case (n, sql) => spark.sql(sql).createOrReplaceTempView(n) }

  /** Persist the catalog as JSON lines at `path` (overwrites). */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    views.toSeq.toDF("name", "sql")
      .coalesce(1).write.mode("overwrite").json(path)
  }
}

object ViewCatalog {
  /** Load a catalog previously written by [[ViewCatalog.save]]. */
  def load(spark: SparkSession, path: String): ViewCatalog =
    ViewCatalog(spark.read.json(path).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("sql")).toMap)
}
