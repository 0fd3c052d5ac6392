package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs the named queries N times each through the
  * same noop sink the bench uses (a bare count() lets EliminateSorts and
  * column pruning skip real work, hiding 2-5x of a query's cost) and
  * prints per-iteration wall time. Set SPARK_GRAFT_EXPLAIN=1 to also dump
  * each query's formatted plan.
  * Usage: runMain graft.tools.DebugTiming <sfDir> <query>[,<query>...] [n]
  */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation",
        (if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-ckpt-"
         else sys.props("java.io.tmpdir") + "/graft-ckpt-") +
          java.util.UUID.randomUUID().toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (name == "__entry__") (s, _) => SparkEntry.entry(s)
        else SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[timing] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
