package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"...","value":N,"unit":"sec","queries":{name:sec,...},"sf":...}
  *
  * Measures steady-state execution: each query is warmed once at sf0.001
  * (JIT + whole-stage-codegen compile), then timed at the target SF with a
  * `noop` sink so the full result is materialized (a bare count() lets
  * Spark skip computing projected columns). Reported time per query is the
  * min of two runs; "value" is the sum over queries.
  */
object Bench {
  private val warmDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val qs = SparkEntry.all // stable registration order
    if (new java.io.File(warmDir).isDirectory)
      qs.foreach(q => try exec(q.run, warmDir) catch { case _: Throwable => () })

    // The host shows bursty CPU steal (noisy neighbors): one run can be
    // 10-30x off, and a burst can cover consecutive runs of one query.
    // So: three full INTERLEAVED passes over all queries (samples for a
    // given query land minutes apart), min per query.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val samples = scala.collection.mutable.Map.empty[String, Double]
    (1 to passes).foreach { _ =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val ok = try { exec(q.run, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
          }
        if (ok) {
          val t = (System.nanoTime() - t0) / 1e9
          samples(q.name) = math.min(samples.getOrElse(q.name, Double.MaxValue), t)
        }
      }
    }
    val results = qs.map(q => q.name -> samples.getOrElse(q.name, -1.0))
    emit(results, sfDir)
  }

  private def emit(results: Seq[(String, Double)], sfDir: String): Unit = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"steady_state_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
