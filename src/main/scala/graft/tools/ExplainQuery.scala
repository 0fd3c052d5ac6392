package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool: print the formatted physical plan of registered
  * queries — the .explain("formatted") loop the build uses to audit
  * join strategies, pushed filters, and codegen spans.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <name1,name2,...> \
  *          [<outDir> <suffix>]
  *
  * With the optional 3rd/4th args, each plan is ALSO written to
  * `<outDir>/<name>_<suffix>.txt` — the optimization rounds commit
  * before/after plans under plans/rNN/ as evidence for plan-shape
  * claims (Exchange counts, join strategies, PushedFilters).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSet
    val outDir = args.lift(2)
    val suffix = args.lift(3).getOrElse("plan")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.all.filter(q => names(q.name)).foreach { q =>
      println(s"==== ${q.name} ====")
      val plan = q.run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      outDir.foreach { od =>
        val p = java.nio.file.Paths.get(od, s"${q.name}_$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
