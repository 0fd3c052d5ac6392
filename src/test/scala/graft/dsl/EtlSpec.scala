package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** End-to-end pipeline tests over the canonical fixture shapes J1-J7
  * (FIXTURES.md), asserting exact output rows like the reference's
  * test_fluent.py does.
  */
class EtlSpec extends SparkTestBase {
  import transforms._

  // ---- J1: nested one-to-many (README quickstart shape) ----
  private val j1 =
    """{"users": [
      |  {"id": "u1", "name": "Alice",
      |   "posts": [{"id": "p1", "title": "Hello"}, {"id": "p2", "title": "World"}]},
      |  {"id": "u2", "name": "Bob", "posts": []}
      |]}""".stripMargin

  test("J1: users and posts from nested JSON, parent access") {
    val result = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"))
      .root()
      .goto("users").each().goto("posts").each()
      .mapTo("posts", joinOn = Seq("id"))(
        "id" -> get("id"),
        "user_id" -> getFromParent("id"),
        "title" -> get("title"))
      .run()

    assert(rows(result.tableOrdered("users")) ===
      Seq(Seq("u1", "Alice"), Seq("u2", "Bob")))
    assert(rows(result.tableOrdered("posts")) ===
      Seq(Seq("p1", "u1", "Hello"), Seq("p2", "u1", "World")))
  }

  test("J1: index() and node() transforms") {
    val result = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("users_idx")(
        "pos" -> index(), "name" -> get("name"))
      .run()
    assert(rows(result.tableOrdered("users_idx")) ===
      Seq(Seq(0, "Alice"), Seq(1, "Bob")))
  }

  test("index() is null for dict iteration, key() is null for list iteration") {
    // transforms.py:69-80: key/index each answer only their own iteration
    // kind — dict iteration must NOT leak entry positions through index()
    val dict = Etl.json(spark, """{"obj": {"a": 1, "b": 2}}""")
      .goto("obj").each()
      .mapTo("t")("k" -> key(), "i" -> index())
      .run()
    assert(rows(dict.tableOrdered("t")) === Seq(Seq("a", null), Seq("b", null)))
    val list = Etl.json(spark, """{"xs": [10, 20]}""")
      .goto("xs").each()
      .mapTo("t")("k" -> key(), "i" -> index())
      .run()
    assert(rows(list.tableOrdered("t")) === Seq(Seq(null, 0), Seq(null, 1)))
  }

  // ---- J2: multi-path merge by join key ----
  test("J2: field-wise merge across traversals, TempField dropped") {
    val j2 =
      """{"users":    [{"id": "u1", "name": "Alice"}],
        |  "profiles": [{"user_id": "u1", "email": "alice@example.com"}]}""".stripMargin
    val result = Etl.json(spark, j2)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"))
      .root()
      .goto("profiles").each()
      .mapTo("users", joinOn = Seq("id"))(
        temp("id" -> get("user_id")),
        "email" -> get("email"))
      .run()
    // id is temp in the 2nd emission but a real field in the 1st → visible
    assert(rows(result.tableOrdered("users")) ===
      Seq(Seq("u1", "Alice", "alice@example.com")))
  }

  test("J2: later traversal overwrites field-wise (last-write-wins)") {
    val j =
      """{"a": [{"id": "x", "v": "old", "w": "keep"}],
        |  "b": [{"id": "x", "v": "new"}]}""".stripMargin
    val result = Etl.json(spark, j)
      .goto("a").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"), "v" -> get("v"), "w" -> get("w"))
      .root().goto("b").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"), "v" -> get("v"))
      .run()
    assert(rows(result.tableOrdered("t")) === Seq(Seq("x", "new", "keep")))
  }

  // ---- J3: dict-of-lists with dynamic keys (MapType) ----
  test("J3: .each().each() over map-of-lists yields junction rows") {
    val schema = StructType(Seq(StructField("question_choices",
      MapType(StringType, ArrayType(StringType)))))
    val result = Etl.json(spark,
      """{"question_choices": {"Q1": ["c1", "c2"], "Q2": ["c2", "c3"]}}""",
      schema)
      .goto("question_choices").each().each()
      .mapTo("junction")(
        "question_id" -> parentKey(),
        "choice_id" -> node())
      .run()
    assert(rows(result.tableOrdered("junction")) === Seq(
      Seq("Q1", "c1"), Seq("Q1", "c2"), Seq("Q2", "c2"), Seq("Q2", "c3")))
  }

  // ---- auto mode over a struct: each() == items() (executor.py:66-76) ----
  test("auto mode iterates a schema-inferred JSON object's items") {
    // no explicit MapType anywhere: the object lands as a struct
    val result = Etl.json(spark,
      """{"name": "day1", "counts": {"a": 1, "b": 2}}""")
      .goto("counts").each()
      .mapTo("kv")(
        "day" -> getFromRoot("name"), "k" -> key(), "v" -> node())
      .run()
    assert(rows(result.tableOrdered("kv")) === Seq(
      Seq("day1", "a", 1L), Seq("day1", "b", 2L)))
  }

  test("auto mode over a null struct emits nothing") {
    val result = Etl.json(spark,
      """[{"id": "x", "counts": {"a": 1}}, {"id": "y", "counts": null}]""")
      .goto("counts").each()
      .mapTo("kv")("id" -> getFromRoot("id"), "k" -> key(), "v" -> node())
      .run()
    assert(rows(result.tableOrdered("kv")) === Seq(Seq("x", "a", 1L)))
  }

  // ---- J4: list-of-lists ----
  test("J4: 2-D grid with parent_index") {
    val result = Etl.json(spark, """{"rows": [[1, 2], [3, 4]]}""")
      .goto("rows").each().each()
      .mapTo("cells")(
        "row_num" -> parentIndex(), "col" -> index(), "value" -> node())
      .run()
    assert(rows(result.tableOrdered("cells")) === Seq(
      Seq(0, 0, 1L), Seq(0, 1, 2L), Seq(1, 0, 3L), Seq(1, 1, 4L)))
  }

  // ---- J5: deep nesting, multi-depth parent access ----
  test("J5: get_from_parent at depth 1 and 2") {
    val j5 =
      """{"servers": [{"id": "s1", "channels": [{"id": "ch1",
        |  "messages": [{"id": "m1", "text": "hi"}]}]}]}""".stripMargin
    val result = Etl.json(spark, j5)
      .goto("servers").each().goto("channels").each().goto("messages").each()
      .mapTo("messages", joinOn = Seq("id"))(
        "id" -> get("id"),
        "channel_id" -> getFromParent("id", 1),
        "server_id" -> getFromParent("id", 2),
        "text" -> get("text"))
      .run()
    assert(rows(result.tableOrdered("messages")) ===
      Seq(Seq("m1", "ch1", "s1", "hi")))
  }

  // ---- J7: null/edge-case matrix ----
  test("J7: null join-key part drops the row; null collections emit nothing") {
    val j7 =
      """{"users": [
        |  {"id": "u1", "name": "Alice"},
        |  {"id": null, "name": "Bob"},
        |  {"id": "u3", "name": "Carol", "tags": null}
        |]}""".stripMargin
    val result = Etl.json(spark, j7)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"))
      .root()
      .goto("users").each().goto("tags").each()
      .mapTo("tags")("t" -> node())
      .run()
    assert(rows(result.tableOrdered("users")) ===
      Seq(Seq("u1", "Alice"), Seq("u3", "Carol")))
    assert(result.tableOrdered("tags").count() === 0)
  }

  test("missing path yields null; goto missing container emits nothing") {
    val result = Etl.json(spark, """{"users": [{"id": "u1"}]}""")
      .goto("users").each()
      .mapTo("users")("id" -> get("id"), "nope" -> get("does.not.exist"))
      .root().goto("ghosts").each()
      .mapTo("ghosts")("x" -> node())
      .run()
    assert(rows(result.tableOrdered("users")) === Seq(Seq("u1", null)))
    assert(result.tableOrdered("ghosts").count() === 0)
  }

  // ---- scalar transforms ----
  test("concat, format_id, coalesce, len_of semantics") {
    val j = """{"items": [{"a": "x", "b": null, "c": "", "n": 5, "list": [1,2,3]}]}"""
    val result = Etl.json(spark, j)
      .goto("items").each()
      .mapTo("out")(
        "cc" -> concatT(get("a"), get("b"), literal("-"), get("n")),
        "fid" -> formatId(get("a"), get("b"), get("c"), get("n")),
        "co" -> coalesceT(get("b"), get("c"), get("a")),
        "l1" -> lenOf(get("list")),
        "l2" -> lenOf(get("a")),
        "l3" -> lenOf(get("n")),
        "l4" -> lenOf(node())) // len of a dict = its key count
      .run()
    // concat: null → ""; format_id: skip null AND ""; coalesce: "" is non-null
    assert(rows(result.tableOrdered("out")) ===
      Seq(Seq("x-5", "x_5", "", 3, 1, null, 5)))
  }

  test("applyValue: typed value function; throws become phase-apply error rows (collect)") {
    val j = """{"items": [{"id": "a", "v": "10"}, {"id": "b", "v": "oops"},
              |           {"id": "c", "v": " 7 "}]}""".stripMargin
    val result = Etl.json(spark, j)
      .goto("items").each()
      .mapTo("out", joinOn = Seq("id"))(
        "id" -> get("id"),
        "n" -> applyValue[String, Int](_.trim.toInt, get("v")))
      .run()
    // the failing row KEEPS its other fields; only the applied value nulls
    assert(rows(result.tableOrdered("out")) ===
      Seq(Seq("a", 10), Seq("b", null), Seq("c", 7)))
    val errs = result.errors("out")
      .select("key", "field", "error", "phase").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(0) === "b")
    assert(errs(0).getString(1) === "n")
    assert(errs(0).getString(2) ===
      "NumberFormatException: For input string: \"oops\"")
    assert(errs(0).getString(3) === "apply")
  }

  test("applyValue: fail_fast raises; a null value reaches f (reference None semantics)") {
    val j = """{"items": [{"id": "a", "v": "1"}, {"id": "b", "v": null}]}"""
    def pipe = Etl.json(spark, j)
      .goto("items").each()
      .mapTo("out", joinOn = Seq("id"))(
        "id" -> get("id"),
        "n" -> applyValue[String, Int](_.trim.toInt, get("v")))
    // null extracted value → f(null) throws NPE → error row, not a crash
    val collected = pipe.run()
    val errs = collected.errors("out").select("key", "phase").collect()
    assert(errs.map(_.getString(0)).toSeq === Seq("b"))
    assert(errs.forall(_.getString(1) == "apply"))
    // fail_fast: the run fails loudly, reference apply-raise semantics
    intercept[Validation.ValidationFailedException] { pipe.run(failFast = true) }
  }

  test("applyValue: apply errors union with typed-schema validation errors") {
    val j = """{"items": [{"id": "a", "v": "2", "w": "ok"},
              |           {"id": "b", "v": "nope", "w": "ok"}]}""".stripMargin
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("n", IntegerType),
      StructField("w", StringType)))
    val result = Etl.json(spark, j)
      .goto("items").each()
      .mapToTyped("out", schema, joinOn = Seq("id"))(
        "id" -> get("id"),
        "n" -> applyValue[String, Int](_.trim.toInt, get("v")),
        "w" -> get("w"))
      .run()
    assert(rows(result.tableOrdered("out")) ===
      Seq(Seq("a", 2, "ok"), Seq("b", null, "ok")))
    val phases = result.errors("out").select("key", "phase").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(phases.contains(("b", "apply")))
  }

  test("each() iterates a heterogeneous struct as JSON-text values") {
    // mixed value types (string / number / nested object) straight off
    // schema inference — executor.py:66-76 iterates ANY dict
    val j = """{"doc": {"name": "ada", "size": 7, "meta": {"x": 1}}}"""
    val result = Etl.json(spark, j)
      .goto("doc").each()
      .mapTo("kv")("k" -> key(), "v" -> node())
      .run()
    assert(rows(result.tableOrdered("kv")) === Seq(
      Seq("meta", """{"x":1}"""), Seq("name", "ada"), Seq("size", "7")))
  }

  test("tableStats and stats run one Spark action for all tables") {
    val j = """{"users": [{"id": "u1", "age": "x"}, {"id": "u2", "age": "2"}],
               |"posts": [{"pid": "p1"}]}""".stripMargin
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("age", IntegerType)))
    val result = Etl.json(spark, j)
      .goto("users").each()
      .mapToTyped("users", schema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("age"))
      .root().goto("posts").each()
      .mapTo("posts")("pid" -> get("pid"))
      .run()

    @volatile var actions = 0
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions += 1
      def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val stats = result.tableStats
      assert(stats("users") === TableStats(1, 1)) // u1's age fails the cast
      assert(stats("posts") === TableStats(1, 0))
      // listener delivery is async: wait for it to settle, then require
      // exactly ONE action for the whole 2-table + errors stats pass
      val deadline = System.currentTimeMillis() + 10000
      while (actions < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(300)
      assert(actions === 1)
    } finally spark.listenerManager.unregister(listener)
  }

  test("writeStats fuses all four TableStats fields in one extra action") {
    val j = """{"users": [{"id": "u1", "age": "x"}, {"id": "u2", "age": "2"}],
               |"posts": [{"pid": "p1"}, {"pid": "p2"}, {"pid": "p3"}]}""".stripMargin
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("age", IntegerType)))
    val result = Etl.json(spark, j)
      .goto("users").each()
      .mapToTyped("users", schema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("age"))
      .root().goto("posts").each()
      .mapTo("posts")("pid" -> get("pid"))
      .run()

    @volatile var actions = 0
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions += 1
      def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // posts' writer dies before running any action; users flushes to
      // the noop sink. Expected Spark actions: 1 write + 1 fused count.
      val stats = result.writeStats { (t, df) =>
        if (t == "posts") throw new RuntimeException("sink down")
        df.write.format("noop").mode("overwrite").save()
      }
      // u1 fails the declared cast → 1 error, 1 valid row reaches the sink
      assert(stats("users") === TableStats(1, 1, 1, 0))
      assert(stats("posts") === TableStats(3, 0, 0, 3))
      val deadline = System.currentTimeMillis() + 10000
      while (actions < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(300)
      assert(actions === 2)
    } finally spark.listenerManager.unregister(listener)
  }
}
