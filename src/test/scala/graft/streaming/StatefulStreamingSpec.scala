package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Event-time streaming semantics: watermark late-data drop and custom
  * state via flatMapGroupsWithState (SURVEY §2.8's Spark-native surface).
  */
case class Sess(user: String, start: Long, n: Int)

class StatefulStreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late events from windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()

    input.addData((ts("2024-01-01 00:05:00"), "a"))
    q.processAllAvailable()
    // advance the watermark far past the first window → it closes
    input.addData((ts("2024-01-01 01:00:00"), "a"))
    q.processAllAvailable()
    // this event is 55 min late — behind the watermark → dropped
    input.addData((ts("2024-01-01 00:06:00"), "a"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 02:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_out")
      .select(date_format($"window.start", "HH:mm").as("w"), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // first window emitted with exactly 1 event; the late one never counted
    assert(rows("00:00") === 1L)
  }

  test("update-mode watermark drain drops the late slice and bounds state") {
    // the registry drain at sf0.001: on-time half-month in batch 1, the
    // earlier half arriving late in batch 2 — every late row is behind
    // the watermark, so the state store must report them dropped and the
    // drained result must equal the batch aggregate of the on-time slice
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped) =
      graft.ops.StreamingQueries.watermarkWindowCounts(spark, dir)
    assert(dropped > 0L,
      "watermark evicted nothing — late rows were not dropped")
    val got = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expect = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm"),
        $"event_type", $"n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === expect)
  }

  test("append-mode session windows finalize once and evict state") {
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkSessionize(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no session state rows were evicted on emit")
    val got = out.collect().map(r =>
      (r.get(0).toString, r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.nonEmpty)
    // append mode emits each finalized session exactly once
    assert(got.map(t => (t._1, t._2)).distinct.length === got.length)
  }

  test("update-mode windowed hot keys drop late rows and evict state") {
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkHotKeys(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    val got = out.collect()
    assert(got.nonEmpty)
    // at most 5 hot keys per window, ranks contiguous from 1
    val byWin = got.groupBy(_.getString(0))
    byWin.values.foreach { rows =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.length <= 5 && ranks.toSeq == (1 to ranks.length))
    }
  }

  test("update-mode windowed funnel drops late rows and evicts state") {
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkFunnel(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    val got = out.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(3)))
    assert(got.nonEmpty)
    // within a window the funnel is monotone: users at step i+1 <= step i,
    // and a step row only exists if its predecessor does
    got.groupBy(_._1).values.foreach { rows =>
      val byStep = rows.map(t => t._2 -> t._3).toMap
      byStep.keys.foreach(s =>
        if (s > 1) {
          assert(byStep.contains(s - 1), s"step ${s - 1} row missing")
          assert(byStep(s) <= byStep(s - 1), "funnel not monotone")
        })
    }
  }

  test("update-mode CDC current state drops late rows and evicts state") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkLatestSnapshot(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    // the folded current-state view equals the batch latest-row-per-user
    // over the ON-TIME slice (late rows must be invisible in it)
    val got = out.collect().map(_.toSeq).toSet
    val expect = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .groupBy($"user_id")
      .agg(max_by(struct($"ts", $"event_type", $"value"),
        struct($"ts", $"event_id")).as("l"))
      .select($"user_id", unix_micros($"l.ts").as("last_ts_us"),
        $"l.event_type".as("last_type"), $"l.value".as("last_value"))
      .collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("update-mode windowed quantile sketch drops late and evicts state") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkQuantile(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    val got = out.collect().map(_.toSeq).toSet
    val counts = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .select(date_format(window($"ts", "6 hours").getField("start"),
        "yyyy-MM-dd HH:mm").as("win_start"),
        length(bin(expr("CAST(floor(value * 100) AS BIGINT)")))
          .cast("int").as("bucket"))
      .groupBy($"win_start", $"bucket").agg(count(lit(1)).as("cnt"))
    val expect = graft.ops.Sketches.quantileEstimate(counts, "win_start",
      Seq(500000L, 900000L, 990000L)).collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("update-mode windowed HLL register fold drops late and evicts state") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkNdv(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    // the drained register fold's estimate equals the one-shot batch
    // sketch over the on-time slice — register maxes commute with any
    // stream slicing, so this is an equality, not a tolerance
    val got = out.collect().map(_.toSeq).toSet
    val onTime = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .select(date_format(window($"ts", "6 hours").getField("start"),
        "yyyy-MM-dd HH:mm").as("win_start"), $"user_id")
    val expect = graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllSketch(onTime, "win_start", "user_id"),
        "win_start")
      .collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("update-mode daily drift monitor drops late rows and evicts state") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkChangepoint(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-day state rows were evicted")
    val got = out.collect().map(_.toSeq).toSet
    val daily = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val expect = graft.ops.EventState.changePoint(daily,
        "event_type", "day", "n")
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"score_ppm", $"mean_before_ppm", $"mean_after_ppm")
      .collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("update-mode windowed incremental agg drops late and evicts state") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, dropped, evicted) =
      graft.ops.StreamingQueries.watermarkIncrementalAgg(spark, dir)
    assert(dropped > 0L, "late slice was not dropped by the watermark")
    assert(evicted > 0L, "no expired-window state rows were evicted")
    val got = out.collect().map(_.toSeq).toSet
    val cents = expr("CAST(floor(value * 100) AS BIGINT)")
    val expect = graft.ops.Relational.events(spark, dir)
      .filter($"ts" >= "2024-01-15 00:00:00")
      .groupBy(date_format(window($"ts", "6 hours").getField("start"),
        "yyyy-MM-dd HH:mm").as("win_start"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents).as("total_cents"),
        min(cents).as("min_cents"), max(cents).as("max_cents"))
      .collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("watermarked drain is provider-agnostic: RocksDB state store") {
    // at deployment scale the HDFS-backed in-memory store caps state at
    // executor heap; RocksDB spills to local disk. Same drained result
    // and the same late-drop behavior under the swapped provider proves
    // the queries don't lean on provider-specific semantics
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val (out, dropped) =
        graft.ops.StreamingQueries.watermarkWindowCounts(spark, dir)
      assert(dropped > 0L, "late rows not dropped under RocksDB")
      val got = out.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet
      import spark.implicits._
      val expect = graft.ops.Relational.events(spark, dir)
        .filter($"ts" >= "2024-01-15 00:00:00")
        .groupBy(window($"ts", "6 hours"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm"),
          $"event_type", $"n")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === expect)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("restarted query recovers aggregation state from the checkpoint") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (out, run2Rows, oddCount) =
      graft.ops.StreamingQueries.checkpointRestart(spark, dir)
    // run 2 read ONLY the file staged after run 1 stopped — committed
    // offsets in the checkpoint prevented any reprocessing
    assert(run2Rows === oddCount,
      s"run 2 read $run2Rows rows, expected only the odd half ($oddCount)")
    // yet its output covers BOTH halves: the difference is recovered state
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val cents = expr("CAST(floor(value * 100) AS BIGINT)")
    val expect = graft.ops.Relational.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum(cents).as("total_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("flatMapGroupsWithState sessionizes per key with custom state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)] // (user, epochSec)

    val sessions = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Sess, (String, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[(String, Long)], state: GroupState[Sess]) =>
          var out = List.empty[(String, Long, Int)]
          events.toSeq.sortBy(_._2).foreach { case (_, t) =>
            state.getOption match {
              case Some(s) if t - (s.start + s.n * 60) <= 1800 =>
                state.update(s.copy(n = s.n + 1))
              case Some(s) =>
                out ::= ((user, s.start, s.n)) // close previous session
                state.update(Sess(user, t, 1))
              case None =>
                state.update(Sess(user, t, 1))
            }
          }
          out.reverse.iterator
      }

    val q = sessions.toDF().toDF("user", "start", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    input.addData(("u1", 1000L), ("u1", 1060L))   // one session, 2 events
    q.processAllAvailable()
    input.addData(("u1", 10000L))                 // gap > 1800 → new session
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sess_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // the first session was closed when the far event arrived
    assert(closed.toSeq === Seq(("u1", 1000L, 2)))
  }

  test("stream_dedup_ingest: drained pairs equal the one-shot batch " +
    "answer and every arrival is registered in the signature store") {
    import graft.ops.{Dedup, StreamingQueries}
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamDedupIngest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val history = docs.filter(col("doc_id") < 400)
    val fresh = docs.filter(col("doc_id") >= 400)
    val oneShot = Dedup.minhashLshIncremental(fresh, "doc_id", "text",
        Dedup.minhashSignatureTable(history, "doc_id", "text", n = 3, k = 12),
        n = 3, bands = 4, rowsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === oneShot)
    assert(got.nonEmpty)
    // the register half of the loop: after the drain the store holds
    // exactly one signature row per signable doc (history + arrivals)
    val storePath = s"/tmp/graft_stream_dedupin_sf0.001" +
      s"_pid${ProcessHandle.current().pid()}/store"
    val store = spark.read.parquet(storePath)
    val expected =
      Dedup.minhashSignatureTable(docs, "doc_id", "text", n = 3, k = 12)
    assert(store.count() === expected.count())
    assert(store.select("doc_id").except(expected.select("doc_id")).isEmpty)
  }
}
