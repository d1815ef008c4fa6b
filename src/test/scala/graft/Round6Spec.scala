package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-6 operator set (GraphOps /
  * StorageOps / GeoOps + the analytics additions) — each query is already
  * value-exact vs the DuckDB oracle; these assert the properties the
  * oracle can't see: blocking completeness, probability mass, pruning
  * soundness, monotone funnels, closure conservation.
  */
class Round6Spec extends AnyFunSuite with SparkSpec {

  test("spatial blocking finds EVERY pair within the radius (brute-force recall)") {
    // the 3×3 neighbor-cell candidates must lose nothing vs all-pairs —
    // the same completeness bar TextDedupSpec holds the dedup banding to
    val k = pmod(col("c_custkey"), lit(2147483647L))
    val pts = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("id"),
        (pmod(k * 1103515245L + 12345L, lit(2147483647L)) % 1000).as("x"),
        (pmod(pmod(k * k, lit(2147483647L)) * 69069L + 1L, lit(2147483647L))
          % 1000).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b && (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= 400
    } yield 1).size
    val blocked = q("q_spatial_join").collect()
      .map(_.getAs[Long]("n_pairs")).sum
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    assert(brute > 0, "degenerate fixture: no pairs within radius")
  }

  test("pagerank mass is conserved and ranks are positive") {
    val rows = q("q_pagerank").collect()
    val total = rows.map(_.getAs[Double]("pr")).sum
    // Σpr = 1 up to the per-iteration 9-dp rounding (n nodes × ≤5e-10 each)
    assert(math.abs(total - 1.0) < 1e-4, s"mass $total")
    assert(rows.forall(_.getAs[Double]("pr") > 0))
    // suppliers connect to many parts: their mean rank must exceed parts'
    val (sup, part) = rows.partition(_.getAs[String]("kind") == "supplier")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("pr")).sum / rs.length
    assert(mean(sup) > mean(part))
  }

  test("hierarchy rollup conserves mass: root subtrees sum to the whole table") {
    val parts = Tables(spark, sf, "part")
    val total = parts.agg(sum(col("p_retailprice"))).head.getDouble(0)
    val rows = q("q_hierarchy_rollup").collect()
    val roots = rows.filter(_.getAs[Long]("anc") < 10)
    assert(math.abs(roots.map(_.getAs[Double]("subtree_price")).sum - total) < 0.1)
    assert(roots.map(_.getAs[Long]("n_desc")).sum == parts.count())
    // every level-1 subtree is contained in its root's
    val byAnc = rows.map(r => r.getAs[Long]("anc") -> r.getAs[Double]("subtree_price")).toMap
    rows.filter(_.getAs[Long]("anc") >= 10).foreach { r =>
      val anc = r.getAs[Long]("anc")
      assert(r.getAs[Double]("subtree_price") <= byAnc(anc / 10) + 0.01,
        s"subtree $anc exceeds its parent's")
    }
  }

  test("zone-map pruning is sound and range layout strictly dominates") {
    val rows = q("q_zonemap_prune").collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("n_pruned"),
          r.getAs[Long]("rows_total"), r.getAs[Long]("rows_scanned"))).toMap
    val matching = Tables(spark, sf, "orders")
      .filter(unix_timestamp(col("o_orderdate")).between(820454400L, 852076799L))
      .count()
    rows.values.foreach { case (nf, np, rt, rs) =>
      assert(np <= nf && rs <= rt)
      assert(rs >= matching, "pruning dropped matching rows — unsound")
    }
    assert(rows("range")._4 < rows("natural")._4,
      "range layout should scan strictly fewer rows")
  }

  test("funnel stages are monotone and bounded by the user count") {
    val r = q("q_funnel").head
    val (n, v, c, p) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_view"),
      r.getAs[Long]("n_view_click"), r.getAs[Long]("n_full_funnel"))
    assert(n >= v && v >= c && c >= p && p >= 0, s"($n, $v, $c, $p)")
    // and the streaming state machine census agrees (also checked in
    // StreamingSpec; kept here so the funnel invariants live together)
  }

  test("lorenz deciles: cumulative share is monotone and ends at 1") {
    val rows = q("q_lorenz_deciles").collect().sortBy(_.getAs[Long]("decile"))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // top decile holds more revenue than the bottom decile
    assert(rows.last.getAs[Double]("revenue") > rows.head.getAs[Double]("revenue"))
  }

  test("temperature mixture flattens the raw shares toward uniform") {
    val rows = q("q_temperature_mix").collect()
    val tot = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(tot - 1.0) < 1e-3)
    // T=2 compresses: every domain's weight sits between its raw share
    // and the uniform 1/n (strictly, unless already uniform)
    val n = rows.length.toDouble
    rows.foreach { r =>
      val (share, w) = (r.getAs[Double]("share_r"), r.getAs[Double]("mix_weight"))
      val lo = math.min(share, 1.0 / n) - 1e-6
      val hi = math.max(share, 1.0 / n) + 1e-6
      assert(w >= lo && w <= hi, s"${r.getAs[String]("source")}: $share -> $w")
    }
  }

  test("join-cardinality pre-flight: exact count matches the executed join") {
    val r = q("q_join_cardinality").head
    val e = Tables(spark, sf, "events").select(col("user_id"))
    val executed = e.join(e.withColumnRenamed("user_id", "u2"),
      col("user_id") === col("u2")).count()
    assert(r.getAs[Long]("true_rows") == executed,
      s"Σc² ${r.getAs[Long]("true_rows")} vs executed $executed")
  }
}
