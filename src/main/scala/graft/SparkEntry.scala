package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in per-area registries ([[graft.ops]]) as [[Q]] values
  * pairing the Spark implementation with its DuckDB oracle SQL.
  */
object SparkEntry {

  /** Every registered, verifiable query. */
  def all: Seq[Q] = {
    val qs = ops.Relational.queries ++ ops.DslQueries.queries ++
      ops.CorpusQueries.queries ++ ops.StreamingQueries.queries
    // four hand-maintained registries: a name collision would silently
    // drop one implementation from the .toMap-based verification below
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the README-quickstart DSL pipeline (nested docs → users+posts
    * with a link) — the engine's core operator end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.DslQueries.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
