package graft.operators

import org.apache.spark.sql.Dataset

/** Scoped persist lifecycle for query bodies — the single owner of every
  * cache a query creates.
  *
  * A query body persists an intermediate because its RESULT plan reads it
  * more than once (an LSH pair chain probed by three configs, an edge set
  * walked by an iterative CC loop). The result is returned LAZILY, so the
  * body itself can never unpersist: the cache must outlive plan
  * construction, until whatever action the CALLER runs has materialized the
  * plan. The lifecycle therefore has two halves with two owners:
  *
  *  - the BODY registers: [[TrackedPersist.persistTracked]] persists the
  *    frame and records it in a session-wide ledger (a one-token swap for
  *    the bare `.persist()` it replaces);
  *  - the RUNNER releases: [[releaseAll]] unpersists exactly the registered
  *    frames after it has materialized the query — `Verify.main` after each
  *    per-query parquet dump, `Bench.timedPass` after every timed pass,
  *    `SparkSpec` between suites. (`spark.catalog.clearCache()` would also
  *    evict them, but it nukes every cached relation in the session —
  *    including test fixtures and cross-query static tables — so the ledger
  *    releases only what query bodies actually took.)
  *
  * At 100 TB the same discipline is what keeps a long-lived driver from
  * pinning executor storage memory across queries: every persist a query
  * takes is enumerable and returned, not leaked until session death.
  */
object Persisted {

  private val ledger =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  implicit class TrackedPersist[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + register in the session ledger. Same storage level,
      * same laziness, same return value as the bare call — only the
      * RELEASE side changes (owned by the runner via [[releaseAll]]). */
    def persistTracked(): Dataset[T] = {
      ds.persist()
      ledger.add(ds)
      ds
    }
  }

  /** Unpersist every ledgered frame (non-blocking) and empty the ledger.
    * Idempotent; unpersisting a frame a body already dropped is a no-op. */
  def releaseAll(): Unit = {
    var f = ledger.poll()
    while (f != null) {
      f.unpersist(blocking = false)
      f = ledger.poll()
    }
  }

  /** Outstanding registered frames — a spec asserts this returns to zero
    * after a runner-shaped release so the balance is machine-checked. */
  def pending: Int = ledger.size
}
