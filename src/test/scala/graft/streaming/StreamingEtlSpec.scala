package graft.streaming

import graft.SparkTestBase
import graft.dsl.{Etl, PipelineResult}
import graft.dsl.{transforms => T}
import graft.dsl.transforms.pairToField
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Chunked streaming semantics (reference §2.8, tests/test_issue_75/76/77):
  * per-chunk map+flush, eager dimensions, completeness violations.
  */
class StreamingEtlSpec extends SparkTestBase {

  test("foreachChunk maps and flushes each micro-batch independently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val flushed = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]

    val writer = StreamingEtl.foreachChunk(
      input.toDF().withColumnRenamed("value", "payload"),
      batch => Etl(batch)
        .mapTo("records", joinOn = Seq("payload"))(
          "payload" -> T.get("payload")),
      new StreamingEtl.FlushStrategy {
        def flush(result: PipelineResult, batchId: Long): Unit =
          result.write { (t, df) =>
            flushed.synchronized { flushed += ((batchId, t, df.count())) }
          }
      })

    val q = writer.start()
    input.addData("a", "b")
    q.processAllAvailable()
    input.addData("c")
    q.processAllAvailable()
    q.stop()

    // per-chunk state: batch 1 sees only its own rows (eviction is free)
    assert(flushed.toList === List((0L, "records", 2L), (1L, "records", 1L)))
  }

  test("flush is component-scoped: each component flushes as one cycle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val flushOrder = scala.collection.mutable.ArrayBuffer.empty[String]

    // declaration order users, tags, posts; components {users,posts} and
    // {tags}. A GLOBAL topo (alphabetic Kahn) would flush tags before
    // posts; component scoping keeps users+posts contiguous.
    val writer = StreamingEtl.foreachChunk(
      input.toDF().withColumnRenamed("value", "v"),
      batch => Etl(batch)
        .mapTo("users", joinOn = Seq("v"))("v" -> T.get("v"))
        .mapTo("tags", joinOn = Seq("v"))("v" -> T.get("v"))
        .mapTo("posts", joinOn = Seq("v"))(
          "v" -> T.get("v"), T.temp("uref" -> T.get("v")))
        .linkTo("users", by = Map("uref" -> "v"), as = "user"),
      StreamingEtl.AppendStrategy((t, df) => {
        df.count(); flushOrder.synchronized { flushOrder += t }
      }))

    val q = writer.start()
    input.addData("x")
    q.processAllAvailable()
    q.stop()
    assert(flushOrder.toList === List("users", "posts", "tags"))
  }

  test("multi-root chunks: each goto_root index maps its own slice") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    val writer = StreamingEtl.foreachMultiRootChunk(
      input.toDF().toDF("kind", "payload"),
      batch => Seq(
        batch.filter($"kind" === "a").select("payload"),
        batch.filter($"kind" === "b").select("payload")),
      roots => Etl(roots: _*)
        .mapTo("a_tab", joinOn = Seq("payload"))("payload" -> T.get("payload"))
        .root(1)
        .mapTo("b_tab", joinOn = Seq("payload"))("payload" -> T.get("payload")),
      StreamingEtl.AppendStrategy((t, df) =>
        df.collect().foreach(r => seen.synchronized { seen += ((t, r.getString(0))) })))

    val q = writer.start()
    input.addData(("a", "a1"), ("b", "b1"), ("a", "a2"))
    q.processAllAvailable()
    q.stop()
    assert(seen.toSet === Set(("a_tab", "a1"), ("a_tab", "a2"), ("b_tab", "b1")))
  }

  test("sequential chunks refuse goto_root beyond root 0") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val writer = StreamingEtl.foreachChunk(
      input.toDF().withColumnRenamed("value", "v"),
      batch => Etl(batch)
        .mapTo("a", joinOn = Seq("v"))("v" -> T.get("v"))
        .root(1) // single-root chunk; reference raises the same way
        .mapTo("b", joinOn = Seq("v"))("v" -> T.get("v")),
      StreamingEtl.AppendStrategy((_, df) => { df.count(); () }))
    val q = writer.start()
    input.addData("x")
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(e.getMessage.contains("no root 1"))
    q.stop()
  }

  test("relationship completeness: missing parent raises with key names") {
    import spark.implicits._
    val children = Seq(("p1", "u1"), ("p2", "zz")).toDF("id", "user_id")
    val parents = Seq(Tuple1("u1")).toDF("id")
    val e = intercept[StreamingEtl.RelationshipIncompleteError] {
      StreamingEtl.checkRelationshipCompleteness(
        children, "user_id", parents, "id", "posts", "users")
    }
    assert(e.getMessage.contains("zz"))
    assert(e.getMessage.contains("posts"))
    // complete case does not throw
    val ok = Seq(("p1", "u1")).toDF("id", "user_id")
    StreamingEtl.checkRelationshipCompleteness(
      ok, "user_id", parents, "id", "posts", "users")
  }

  test("repartitionByKey co-locates whole key groups per partition") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i % 5, i)).toDF("k", "v")
    val parts = StreamingEtl.repartitionByKey(df, "k", 4)
      .select($"k", org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    // every key lives in exactly one partition
    assert(parts.groupBy(_._1).forall(_._2.length == 1))
  }

  test("eager dimension stays resident across chunks (broadcast join)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dims = Seq(("t1", "red"), ("t2", "blue")).toDF("tag_id", "color")
    val input = MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    val writer = StreamingEtl.foreachChunk(
      input.toDF().withColumnRenamed("value", "tag"),
      batch => Etl(batch.join(broadcast(dims), batch("tag") === dims("tag_id"))
          .select("tag", "color"))
        .mapTo("tagged")("tag" -> T.get("tag"), "color" -> T.get("color")),
      new StreamingEtl.FlushStrategy {
        def flush(result: PipelineResult, batchId: Long): Unit =
          result.tableOrdered("tagged").collect().foreach(r =>
            seen.synchronized { seen += ((r.getString(0), r.getString(1))) })
      })

    val q = writer.start()
    input.addData("t1")
    q.processAllAvailable()
    input.addData("t2")
    q.processAllAvailable()
    q.stop()
    assert(seen.toSet === Set(("t1", "red"), ("t2", "blue")))
  }
}
