package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Persisted

/** The persist lifecycle contract: query bodies REGISTER caches via
  * persistTracked, runners RELEASE them via releaseAll — the balance is
  * machine-checked here instead of audited by grep each round.
  */
class PersistLedgerSpec extends AnyFunSuite with SparkSpec {

  test("a persisting query registers in the ledger; releaseAll drains it") {
    Persisted.releaseAll() // isolate from whatever earlier suites left
    assert(Persisted.pending == 0)
    // q_dedup_minhash persists its signature frame — constructing the plan
    // must register it
    val df = q("q_dedup_minhash")
    assert(Persisted.pending > 0, "query body took a cache without registering it")
    val n = df.count()
    assert(n >= 0)
    Persisted.releaseAll()
    assert(Persisted.pending == 0, "releaseAll left ledgered frames behind")
    // the query still computes identically after release (unpersist is a
    // physical-only change)
    assert(q("q_dedup_minhash").count() == n)
    Persisted.releaseAll()
  }

  test("no bare persist() remains in query bodies (ledger owns every cache)") {
    // source-level guard: a future body calling .persist() directly would
    // reopen the leak the ledger closed. Allow the helper itself (it wraps
    // the bare call) and non-query infrastructure.
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val offenders = new scala.collection.mutable.ArrayBuffer[String]()
    val walk = java.nio.file.Files.walk(dir)
    try walk.forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val lines = java.nio.file.Files.readAllLines(p)
        var i = 0
        while (i < lines.size()) {
          if (lines.get(i).contains(".persist()"))
            offenders += s"${p.getFileName}:${i + 1}"
          i += 1
        }
      }
    } finally walk.close()
    assert(offenders.isEmpty,
      s"bare .persist() outside the ledger: ${offenders.mkString(", ")}")
  }
}
