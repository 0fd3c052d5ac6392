package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL string runnable by DuckDB over the same parquet
  * tables. Names and column aliases MUST match between the two sides —
  * the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Read one of the driver-provided TESTDATA tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** Shared JSON string escaping for the driver-facing emitters (Verify's
  * oracle_sql.json and Bench's one-line result): backslash, quote, and
  * ALL control chars — one unescaped character in builder-authored SQL
  * or an env-provided path would make the driver's json.load fail and
  * silently zero the round's result. */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
