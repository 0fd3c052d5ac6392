package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Merge-algebra properties of the incremental aggregate state and the
  * quantile sketch: any split of the input, merged, equals the whole —
  * the contract that makes per-day/per-shard materialization sound.
  */
class MergeablesSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = (1 to 300).map(i =>
    (s"k${i % 4}", (i * 37 % 990) + 1L)).toSeq

  test("aggState merge over any 3-way split equals the whole") {
    val df = rows.toDF("k", "v")
    def st(f: org.apache.spark.sql.DataFrame) =
      EventState.aggState(f, "k", col("v"))
    val whole = st(df).orderBy("k").collect().map(_.toSeq).toSeq
    val merged = EventState.mergeAggStates("k",
        st(df.filter(col("v") % 3 === 0)),
        st(df.filter(col("v") % 3 === 1)),
        st(df.filter(col("v") % 3 === 2)))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(merged === whole)
  }

  test("quantile sketch merge equals the single-pass sketch") {
    val df = rows.toDF("k", "v")
    val whole = Sketches.quantileBuckets(df, "k", col("v"))
      .orderBy("k", "bucket").collect().map(_.toSeq).toSeq
    val merged = Sketches.quantileMerge("k", Seq(
        Sketches.quantileBuckets(df.filter(col("v") < 100), "k", col("v")),
        Sketches.quantileBuckets(df.filter(col("v") >= 100), "k", col("v"))))
      .orderBy("k", "bucket").collect().map(_.toSeq).toSeq
    assert(merged === whole)
  }

  test("quantile estimate brackets the true quantile within one octave") {
    val df = rows.toDF("k", "v")
    val est = Sketches.quantileEstimate(
        Sketches.quantileBuckets(df, "k", col("v")), "k", Seq(500000L))
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Int]("bucket"), r.getAs[Long]("upper_bound"))).toMap
    rows.groupBy(_._1).foreach { case (k, kv) =>
      val vs = kv.map(_._2).sorted
      val trueMedian = vs((vs.size - 1) / 2)
      val (b, ub) = est(k)
      assert(trueMedian <= ub, s"$k: median $trueMedian above bound $ub")
      // the true median lands inside the reported bucket
      assert(b == 1 || trueMedian >= (1L << (b - 1)),
        s"$k: median $trueMedian below bucket $b")
    }
  }
}
