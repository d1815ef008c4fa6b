package graft

import org.apache.spark.sql.DataFrame

/** Result renderers matching the reference's two output formats:
  *
  *  - `tsv`: the integration-test renderer (tests/sql.rs:100-137): rows as
  *    tab-separated lines, strings in Rust `{:?}` style (double-quoted),
  *    floats shortest-roundtrip, trailing newline.
  *  - `console`: the console's plain Display rendering (strings unquoted),
  *    used by the smoketest contract (smoketest-expected.txt).
  *
  * Both collect to the driver — they are REPL/test sinks, not data paths.
  */
object Render {
  /** Shortest-roundtrip float formatting. Java's `Double.toString` matches
    * Rust `{:?}` for the magnitudes in the goldens; scientific-notation edge
    * cases (|x| ≥ 1e7 or < 1e-3) are expanded to plain decimal like Rust.
    */
  def fmtDouble(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    else s
  }

  def fmtFloat(f: Float): String = {
    val s = java.lang.Float.toString(f)
    if (s.contains("E")) new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    else s
  }

  private def cell(v: Any, quoted: Boolean): String = v match {
    case null               => "NULL"
    case s: String if quoted => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case s: String          => s
    case d: java.lang.Double => fmtDouble(d)
    case f: java.lang.Float  => fmtFloat(f)
    case x                  => x.toString
  }

  def tsv(df: DataFrame): String =
    df.collect().map(_.toSeq.map(cell(_, quoted = true)).mkString("\t"))
      .mkString("", "\n", "\n")

  def consoleLines(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map(cell(_, quoted = false)).mkString("\t"))

  /** Rust `{}` Display float formatting: integral floats print without the
    * trailing `.0` (`6.0` → `6`), otherwise shortest-roundtrip.
    */
  private def displayCell(v: Any): String = v match {
    case null => ""
    case d: java.lang.Double =>
      val s = fmtDouble(d); if (s.endsWith(".0")) s.dropRight(2) else s
    case f: java.lang.Float =>
      val s = fmtFloat(f); if (s.endsWith(".0")) s.dropRight(2) else s
    case r: org.apache.spark.sql.Row => // struct (UDT) Display: "x, y"
      r.toSeq.map(displayCell).mkString(", ")
    case x => cell(x, quoted = false)
  }

  /** The earlier-POC golden-file format (CSVs under test/data/expected):
    * plain comma-joined cells, strings unquoted, Rust Display floats,
    * trailing newline.
    */
  def csv(df: DataFrame): String = {
    val rows = df.collect()
    if (rows.isEmpty) "" // empty goldens are zero-byte files
    else rows.map(_.toSeq.map(displayCell).mkString(",")).mkString("", "\n", "\n")
  }
}
