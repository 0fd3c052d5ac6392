package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs the named query N times and prints
  * per-iteration wall time plus the formatted plan once.
  * Usage: runMain graft.tools.DebugTiming <sfDir> <query> [n]
  */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "__entry__") (s, _) => SparkEntry.entry(s)
      else SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[timing] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
