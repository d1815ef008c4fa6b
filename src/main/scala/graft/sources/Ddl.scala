package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}
import graft.Types

/** `CREATE EXTERNAL TABLE` front-end, translating the reference's DDL dialect
  * (grammar at /root/reference/src/dfparser.rs:101-208) onto Spark readers +
  * temp views:
  *
  * {{{
  * CREATE EXTERNAL TABLE t (c1 TYPE, ...)
  *   STORED AS CSV [WITH HEADER ROW | WITHOUT HEADER ROW] | NDJSON | PARQUET
  *   LOCATION 'path'
  * }}}
  *
  * A ~100-line regex front-end in front of `spark.sql` (SURVEY §7.2-5): the
  * statement registers a lazily-scanned table, so Catalyst still sees a plain
  * file relation with pushdown/pruning intact.
  */
object Ddl {
  private val CreatePattern =
    ("""(?is)\s*CREATE\s+EXTERNAL\s+TABLE\s+(\w+)\s*""" +
      """(?:\((.*)\)\s*)?""" + // greedy: type args like VARCHAR(100) contain ')'
      """STORED\s+AS\s+(CSV|NDJSON|PARQUET)\s*""" +
      """(WITH\s+HEADER\s+ROW|WITHOUT\s+HEADER\s+ROW)?\s*""" +
      """LOCATION\s+'([^']*)'\s*;?\s*""").r

  /** True if the statement is our DDL dialect (vs plain SQL for Spark). */
  def matches(sql: String): Boolean =
    sql.trim.toUpperCase.startsWith("CREATE EXTERNAL TABLE")

  case class External(name: String, schema: Option[StructType],
      format: String, header: Boolean, location: String)

  def parse(sql: String): External = sql match {
    case CreatePattern(name, cols, format, headerClause, location) =>
      val schema = Option(cols).filter(_.trim.nonEmpty).map { c =>
        StructType(c.split(",").map { colDef =>
          val parts = colDef.trim.split("\\s+", 2)
          require(parts.length == 2, s"bad column definition: $colDef")
          StructField(parts(0), Types.fromSql(parts(1)), nullable = true)
        })
      }
      val header = Option(headerClause).exists(_.toUpperCase.startsWith("WITH "))
      External(name, schema, format.toUpperCase, header, location)
    case _ =>
      throw new IllegalArgumentException(s"cannot parse DDL: $sql")
  }

  /** Parse + register. Returns the registered table as a DataFrame. */
  def register(spark: SparkSession, sql: String): DataFrame = {
    val ext = parse(sql)
    val reader = spark.read
    val df = ext.format match {
      case "CSV" =>
        val r = reader.option("header", ext.header.toString)
        ext.schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
          .csv(ext.location)
      case "NDJSON" =>
        ext.schema.map(reader.schema).getOrElse(reader).json(ext.location)
      case "PARQUET" =>
        reader.parquet(ext.location) // self-describing
    }
    df.createOrReplaceTempView(ext.name)
    df
  }
}
