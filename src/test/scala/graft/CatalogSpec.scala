package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ViewCatalog

/** Plan-persistence round trip: define views as SQL, save the catalog, drop
  * everything, load + re-register, and get identical results — the
  * Spark-first equivalent of the reference's logical-plan serde round-trip
  * tests (/root/reference/src/logicalplan.rs:607-652).
  */
class CatalogSpec extends AnyFunSuite with SparkSpec {

  test("view catalog survives save → drop → load → re-run") {
    Tables(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    val cat = ViewCatalog()
      .withView("v_flag_qty",
        "SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
          "FROM lineitem GROUP BY l_returnflag")
      .withView("v_top_flag",
        "SELECT l_returnflag FROM lineitem GROUP BY l_returnflag " +
          "ORDER BY count(*) DESC LIMIT 1")
    cat.registerAll(spark)
    val before = spark.sql("SELECT * FROM v_flag_qty ORDER BY l_returnflag").collect()
    val beforeTop = spark.sql("SELECT * FROM v_top_flag").collect()
    assert(before.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft-cat").toString
    cat.save(spark, s"$dir/catalog")
    spark.catalog.dropTempView("v_flag_qty")
    spark.catalog.dropTempView("v_top_flag")
    assert(!spark.catalog.tableExists("v_flag_qty"))

    val loaded = ViewCatalog.load(spark, s"$dir/catalog")
    assert(loaded.views == cat.views, "SQL text must round-trip exactly")
    loaded.registerAll(spark)
    val after = spark.sql("SELECT * FROM v_flag_qty ORDER BY l_returnflag").collect()
    assert(after.sameElements(before))
    assert(spark.sql("SELECT * FROM v_top_flag").collect().sameElements(beforeTop))
  }

  test("a reloaded view re-plans against current data, not a frozen snapshot") {
    Tables(spark, sf, "nation").createOrReplaceTempView("nation_cat")
    val cat = ViewCatalog().withView("v_nations",
      "SELECT count(*) AS n FROM nation_cat")
    val dir = java.nio.file.Files.createTempDirectory("graft-cat2").toString
    cat.save(spark, s"$dir/catalog")
    val full = ViewCatalog.load(spark, s"$dir/catalog")
    full.registerAll(spark)
    val n1 = spark.sql("SELECT n FROM v_nations").collect().head.getLong(0)
    // swap the underlying table, re-register the SAME catalog: new result
    Tables(spark, sf, "nation").limit(3).createOrReplaceTempView("nation_cat")
    full.registerAll(spark)
    val n2 = spark.sql("SELECT n FROM v_nations").collect().head.getLong(0)
    assert(n1 > 3 && n2 == 3, s"n1=$n1 n2=$n2")
  }
}
