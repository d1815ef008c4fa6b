package graft

import scala.io.StdIn

/** SQL console / script runner replicating the reference's console contract
  * (/root/reference/src/bin/console/main.rs:36-155, smoketest.sh): statements
  * are `;`-terminated; `--script file.sql` runs a script and exits; output
  * matches test/data/smoketest-expected.txt (banner, "Executing query ..."
  * per statement, plain-rendered result rows).
  */
object Console {
  def main(args: Array[String]): Unit = {
    val script = args.sliding(2).collectFirst {
      case Array("--script", f) => f
      case Array("-s", f)       => f
    }
    val ctx = Context.local()
    ctx.spark.sparkContext.setLogLevel("ERROR")
    println("DataFusion Console")
    script match {
      case Some(file) =>
        val text = scala.io.Source.fromFile(file).mkString
        text.split(";").map(_.trim).filter(_.nonEmpty).foreach(execute(ctx, _))
      case None =>
        Iterator.continually(StdIn.readLine("graft> "))
          .takeWhile(l => l != null && l.trim != "quit" && l.trim != "exit")
          .map(_.trim).filter(_.nonEmpty)
          .foreach(stmt => execute(ctx, stmt.stripSuffix(";")))
    }
    ctx.spark.stop()
  }

  private def execute(ctx: Context, sql: String): Unit = {
    println("Executing query ...")
    try {
      val df = ctx.sql(sql)
      if (!graft.sources.Ddl.matches(sql))
        Render.consoleLines(df).foreach(println)
    } catch {
      case e: Exception => println(s"Error: ${e.getMessage}")
    }
  }
}
