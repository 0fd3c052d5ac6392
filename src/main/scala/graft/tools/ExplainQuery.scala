package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool: print the formatted physical plan of registered
  * queries — the .explain("formatted") loop the build uses to audit
  * join strategies, pushed filters, and codegen spans.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <name1,name2,...>
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.all.filter(q => names(q.name)).foreach { q =>
      println(s"==== ${q.name} ====")
      println(q.run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
