package graft

import org.apache.spark.sql.types._

/** SQL type name → Spark type, mirroring the reference's `convert_data_type`
  * (/root/reference/src/sqlplanner.rs:379-393) plus the unsigned widening
  * policy from SURVEY.md §1.5 (Spark has no unsigned types; widen to the next
  * signed type that holds the full range — the same convention Spark itself
  * uses for Parquet unsigned logical types).
  */
object Types {
  def fromSql(name: String): DataType = {
    val n = name.trim.toUpperCase.replaceAll("\\(.*\\)", "") // CHAR(100) → CHAR
    n match {
      case "BOOLEAN" | "BOOL"        => BooleanType
      case "TINYINT" | "INT8"        => ByteType
      case "SMALLINT" | "INT16"      => ShortType
      case "INT" | "INTEGER" | "INT32" => IntegerType
      case "BIGINT" | "INT64" | "LONG" => LongType
      // reference maps FLOAT/REAL/DOUBLE all to Float64
      case "FLOAT" | "REAL" | "DOUBLE" | "FLOAT64" => DoubleType
      case "FLOAT32"                 => FloatType
      case "CHAR" | "VARCHAR" | "TEXT" | "STRING" | "UTF8" => StringType
      // unsigned → widened signed (SURVEY §1.5)
      case "UINT8"                   => ShortType
      case "UINT16"                  => IntegerType
      case "UINT32"                  => LongType
      case "UINT64"                  => DecimalType(20, 0)
      case "TIMESTAMP"               => TimestampType
      case "DATE"                    => DateType
      case other => throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }
}
