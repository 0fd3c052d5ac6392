package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-wide staged-fixture registry — "stage once, derive many".
  *
  * Several registry queries deliberately consume the SAME expensive
  * intermediate: the takedown family's stored pair graph and cluster
  * labels, the coverage pair's shingle feature table, the BPE family's
  * trained histogram. In a deployment those are persisted artifacts —
  * written once, read by every downstream job — not re-derived per
  * query; the queries' own scaladocs already model them as "state a
  * previous run left behind". This registry makes that literal for the
  * in-process harnesses (Verify / Bench / DebugTiming): the FIRST
  * consumer builds and materializes the fixture, later consumers read
  * the materialized copy. Results are byte-identical (the fixture is
  * the same rows either way); only the re-derivation disappears —
  * exactly the lakehouse materialized-intermediate contract, and the
  * 100 TB shape (nobody re-shingles a corpus per consumer there).
  *
  * Keys are scoped by SparkContext application id, so a fixture never
  * leaks across sessions (test suites, restarted shells); entries staged
  * by finished applications are evicted on the next access so their
  * checkpointed blocks don't pin driver memory for the JVM's lifetime.
  */
object Staged {

  /** Per-key memoizing cell: the map's value is the HOLDER, not the
    * fixture, so the build runs under the holder's own monitor (lazy
    * val), never under a ConcurrentHashMap bin lock. That keeps (a)
    * nested staged builds legal — the stored-star fixture forces the
    * stored-pairs holder, a different monitor, where a nested
    * computeIfAbsent on one map would violate the CHM contract (Java
    * 9+ "Recursive update") — and (b) single-build semantics under
    * concurrency: the parallel lint suite hits a shared fixture from
    * 8 threads at once, and a get-then-putIfAbsent of the VALUE would
    * run the expensive build (staged BPE training, pair graphs) once
    * per thread and leak each loser's eager checkpoint. Fixture
    * dependencies are acyclic, so cross-holder forcing cannot
    * deadlock. */
  private final class Holder(build: () => AnyRef) {
    lazy val value: AnyRef = build()
  }

  private val cache = new ConcurrentHashMap[String, Holder]()

  /** Memoized eager localCheckpoint of `build`, keyed per application. */
  def df(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    any(spark, key)(build.localCheckpoint(eager = true))

  /** Memoized arbitrary staged value (e.g. a (driver chain, DataFrame)
    * pair) — `build` is responsible for materializing any DataFrames it
    * captures. See [[Holder]] for the locking design. */
  def any[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    evictDead(appId)
    val k = s"$appId|$key"
    val hit = cache.get(k)
    val holder =
      if (hit != null) hit
      else {
        val fresh = new Holder(() => build)
        val prev = cache.putIfAbsent(k, fresh)
        if (prev != null) prev else fresh
      }
    holder.value.asInstanceOf[T]
  }

  /** Spark allows one active SparkContext per JVM, so any key scoped to a
    * different application id belongs to a stopped session — drop it. */
  private def evictDead(liveAppId: String): Unit = {
    val prefix = liveAppId + "|"
    val it = cache.keySet().iterator()
    while (it.hasNext) if (!it.next().startsWith(prefix)) it.remove()
  }
}
