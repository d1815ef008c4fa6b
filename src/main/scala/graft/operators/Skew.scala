package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join patterns for 100 TB-scale shuffles.
  *
  * A plain shuffled hash/sort-merge join sends every row of a hot key to ONE
  * reducer; at cluster scale a single key holding 1% of a 100 TB fact table
  * is a 1 TB partition — a guaranteed straggler or OOM. Salting splits each
  * fact key across `salts` sub-partitions and replicates the (much smaller)
  * build side once per salt, bounding any reducer's share of a hot key at
  * 1/salts. AQE's skew-join handles moderate skew automatically; explicit
  * salting is the deterministic heavy-hammer for known-pathological keys.
  *
  * The result set is IDENTICAL to the unsalted join (verified by the
  * q_join_salted oracle, which is a plain JOIN), so the pattern is a pure
  * physical rewrite — semantics never change.
  */
object Skew {

  /** Inner-join `fact` to `build` on `factKey == buildKey`, salted.
    *
    * @param spread deterministic per-row column spreading a fact key's rows
    *               across salts (e.g. a line number or any hash of non-key
    *               columns). Using the KEY itself would defeat the salting —
    *               same key, same salt.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, spread: Column, salts: Int): DataFrame = {
    // NULL spread must not drop the row (pmod(NULL) = NULL would never
    // match any build salt) — any constant salt keeps join semantics
    val saltedFact = fact.withColumn("_salt",
      pmod(coalesce(spread, lit(0)), lit(salts)).cast("int"))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedBuild,
      saltedFact(factKey) === saltedBuild(buildKey) &&
        saltedFact("_salt") === saltedBuild("_salt"))
      .drop("_salt")
  }
}
