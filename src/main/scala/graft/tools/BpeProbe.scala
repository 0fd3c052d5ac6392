package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the library surface): measures how many
  * batched-BPE rounds a given candidate-window size needs to learn N
  * merges over the documents pretoken histogram, and where merge
  * exhaustion hits. Drives the sizing of the tokenizer-scale gate. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val window = if (args.length > 1) args(1).toInt else 2
    val target = if (args.length > 2) args(2).toInt else 4096
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hist = docs
      .select(explode(
        graft.functions.TextFunctions.pretokens(col("text"), window)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("s", regexp_replace(col("w"), "(.)", "·$1·"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    println(s"[probe] window=$window distinct pretokens=${hist.length}")
    for (m <- Seq(16, 32, 64, 128)) {
      var rows = hist.clone()
      var found = 0
      var rounds = 0
      var exhausted = false
      val marks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (found < target && !exhausted && rounds < 2000) {
        rounds += 1
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        rows.foreach { case (_, cnt, s) =>
          val us = s.substring(1, s.length - 1).split("··", -1)
          var i = 0
          while (i < us.length - 1) {
            val k = (us(i), us(i + 1))
            pc.update(k, pc.getOrElse(k, 0L) + cnt)
            i += 1
          }
        }
        if (pc.isEmpty) exhausted = true
        else {
          val cands = pc.iterator.map { case ((u1, u2), c) => (u1, u2, c) }
            .toArray
            .sortWith { case ((a1, a2, ac), (b1, b2, bc)) =>
              if (ac != bc) ac > bc else if (a1 != b1) a1 < b1 else a2 < b2
            }.take(m)
          val accepted = cands.zipWithIndex.filter { case ((u1, u2, _), i) =>
            cands.take(i).forall { case (v1, v2, _) =>
              v1 != u1 && v1 != u2 && v2 != u1 && v2 != u2 }
          }.map(_._1).take(target - found)
          accepted.foreach { case (u1, u2, _) =>
            found += 1
            val pat = s"·${u1}··${u2}·"
            val rep = s"·${u1}${u2}·"
            rows = rows.map { case t @ (w, cnt, s) =>
              if (s.contains(pat)) (w, cnt, s.replace(pat, rep)) else t }
          }
          Seq(512, 1024, 2048, 4096).foreach { mark =>
            if (found >= mark && !marks.exists(_._1 == mark))
              marks += ((mark, rounds))
          }
        }
      }
      println(s"[probe] m=$m -> merges=$found rounds=$rounds " +
        s"exhausted=$exhausted marks=${marks.mkString(",")}")
    }
    spark.stop()
  }
}
