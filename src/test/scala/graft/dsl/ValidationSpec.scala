package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** Error modes, strict field check, typed validation, stats, telemetry
  * (reference §2.7; tests/test_instances.py fail-fast + suggestion cases).
  */
class ValidationSpec extends SparkTestBase {
  import transforms._

  private val userSchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("age", IntegerType),
    StructField("name", StringType)))

  private val j =
    """{"users": [
      |  {"id": "u1", "age": "30",  "name": "Alice"},
      |  {"id": "u2", "age": "old", "name": "Bob"},
      |  {"id": "u3", "age": null,  "name": "Carol"}
      |]}""".stripMargin

  private def pipeline = Etl.json(spark, j)
    .goto("users").each()
    .mapToTyped("users", userSchema, joinOn = Seq("id"))(
      "id" -> get("id"), "age" -> get("age"), "name" -> get("name"))

  test("collect mode: bad rows go to the error side-channel, good rows pass") {
    val result = pipeline.run()
    assert(rows(result.tableOrdered("users")) ===
      Seq(Seq("u1", 30, "Alice"), Seq("u3", null, "Carol")))
    val errs = result.errors("users").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(1) === "u2")
    assert(errs(0).getString(2) === "age")
    assert(errs(0).getString(3).contains("cannot cast to int"))
    val stats = result.tableStats
    assert(stats("users").errors === 1)
  }

  test("fail-fast mode throws naming the bad value") {
    val e = intercept[Validation.ValidationFailedException] {
      pipeline.run(failFast = true)
    }
    assert(e.getMessage.contains("age"))
    assert(e.getMessage.contains("old"))
  }

  test("per-emission error mode overrides the pipeline default (fail-fast wins)") {
    // global default is collect; the 'strict' table opts into fail-fast
    val e = intercept[Validation.ValidationFailedException] {
      Etl.json(spark, j)
        .goto("users").each()
        .mapToTyped("lenient", userSchema, joinOn = Seq("id"))(
          "id" -> get("id"), "age" -> get("age"))
        .root()
        .goto("users").each()
        .mapToTyped("strict", userSchema, joinOn = Seq("id"),
          errors = ErrorMode.FailFast)(
          "id" -> get("id"), "age" -> get("age"))
        .run()
    }
    assert(e.getMessage.contains("strict"))
  }

  test("per-emission Collect override survives a fail-fast pipeline default") {
    val result = Etl.json(spark, j)
      .goto("users").each()
      .mapToTyped("users", userSchema, joinOn = Seq("id"),
        errors = ErrorMode.Collect)(
        "id" -> get("id"), "age" -> get("age"), "name" -> get("name"))
      .run(failFast = true)
    assert(result.errors("users").count() === 1)
    assert(result.table("users").count() === 2)
  }

  test("unknown field fails at build time with did-you-mean") {
    val e = intercept[Validation.UnknownFieldException] {
      Etl.json(spark, j)
        .goto("users").each()
        .mapToTyped("users", userSchema)(
          "id" -> get("id"), "nmae" -> get("name"))
    }
    assert(e.getMessage.contains("did you mean 'name'"))
  }

  test("non-nullable violation is an error row") {
    val schema = StructType(Seq(StructField("id", StringType, nullable = false)))
    val result = Etl.json(spark, """{"xs": [{"id": "a"}, {"id": null}]}""")
      .goto("xs").each()
      .mapToTyped("t", schema)("id" -> get("id"))
      .run()
    // null id row: no joinOn so it is kept in mapping, then rejected
    assert(result.tableOrdered("t").count() === 1)
    val errs = result.errors("t").collect()
    assert(errs.length === 1 && errs(0).getString(3).contains("non-nullable"))
  }

  test("finalize checks are a second error stream over the merged row") {
    import org.apache.spark.sql.functions.col
    val result = Etl.json(spark, j)
      .goto("users").each()
      .mapToTyped("users", userSchema, joinOn = Seq("id"),
        finalizeChecks = Map(
          "age_known" -> col("age").isNotNull,
          "age_range" -> (col("age").isNull || col("age") < 100)))(
        "id" -> get("id"), "age" -> get("age"), "name" -> get("name"))
      .run()
    // u2: update-phase cast error ("old" -> int); u3: finalize age_known
    val errs = result.errors("users").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(4))).toSet
    assert(errs.exists { case (k, f, p) => k == "u2" && f == "age" && p == "update" })
    assert(errs.contains(("u3", "age_known", "finalize")))
    // u3 also fails age_known at finalize because its cast null survives
    // update validation; only u1 passes both phases
    assert(rows(result.tableOrdered("users")) === Seq(Seq("u1", 30, "Alice")))
  }

  test("eager-boundary rules fail at analysis time (test_issue_75 cases)") {
    val jj = """{"users": [{"id": "u1", "posts": [{"id": "p1"}], "post_ids": ["p1"]}]}"""
    def base = Etl.json(spark, jj).goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), temp("post_ids" -> get("post_ids")))
      .root().goto("users").each().goto("posts").each()
      .mapTo("posts", joinOn = Seq("id"))(
        "id" -> get("id"), temp("uref" -> getFromParent("id")))

    // eager table never mapped
    val e1 = intercept[IllegalArgumentException] {
      base.loadEager("ghosts").run()
    }
    assert(e1.getMessage.contains("preceding mapTo"))

    // eager child depending on a non-eager parent (posts linkTo users)
    val e2 = intercept[IllegalArgumentException] {
      base.linkTo("users", by = Map("uref" -> "id"), as = "user")
        .loadEager("posts").run()
    }
    assert(e2.getMessage.contains("non-eager parent"))

    // backlink crossing the eager boundary
    val e3 = intercept[IllegalArgumentException] {
      base.backlink("users", "posts", attr = "posts", by = ("post_ids", "id"))
        .loadEager("users").run()
    }
    assert(e3.getMessage.contains("cannot cross eager/non-eager"))

    // both sides eager is fine
    base.linkTo("users", by = Map("uref" -> "id"), as = "user")
      .loadEager("users", "posts").run()
  }

  test("streaming validation rejects traversal buildIndex and multi-field by") {
    val jj = """{"users": [{"id": "u1", "name": "A", "region": "r1"}]}"""
    def base = Etl.json(spark, jj).goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"), "region" -> get("region"))

    val e1 = intercept[IllegalArgumentException] {
      base.buildIndex("names", key = get("id"), value = get("name"))
        .validateForStreaming(sequentialOnly = true)
    }
    assert(e1.getMessage.contains("buildIndex"))
    // seeded index is fine
    base.buildIndex("m", from = Map("a" -> "b"))
      .validateForStreaming(sequentialOnly = true)

    val e2 = intercept[IllegalArgumentException] {
      base.root().goto("users").each()
        .mapTo("posts", joinOn = Seq("id"))(
          "id" -> get("id"), temp("n" -> get("name")), temp("r" -> get("region")))
        .linkTo("users", by = Map("n" -> "name", "r" -> "region"), as = "u")
        .validateForStreaming(sequentialOnly = true)
    }
    assert(e2.getMessage.contains("single-field"))
  }

  test("update-time validation is per emission: overwritten bad values still error") {
    // first traversal writes a bad age for u1; second overwrites with good
    val result = Etl.json(spark, """{"users": [{"id": "u1", "bad": "nope", "good": "41"}]}""")
      .goto("users").each()
      .mapToTyped("users", userSchema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("bad"))
      .root().goto("users").each()
      .mapToTyped("users", userSchema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("good"))
      .run()
    // the merged row survives with the good value...
    assert(rows(result.table("users").select("id", "age")) === Seq(Seq("u1", 41)))
    // ...but the bad intermediate update still recorded its error
    val errs = result.errors("users").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(2) === "age" && errs(0).getString(3).contains("nope"))
    assert(errs(0).getString(4) === "update")
  }

  test("writeObserved piggybacks written-row counts on the flush job") {
    val result = Etl.json(spark,
      """{"users": [{"id": "u1"}, {"id": "u2"}], "tags": [{"t": "a"}]}""")
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))("id" -> get("id"))
      .root().goto("tags").each()
      .mapTo("tags", joinOn = Seq("t"))("t" -> get("t"))
      .run()
    val written = result.writeObserved { (_, df) =>
      df.write.format("noop").mode("overwrite").save()
    }
    assert(written === Map("users" -> 2L, "tags" -> 1L))
  }

  test("synthesized merge values failing the declared cast error as phase=merge") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("total", IntegerType)))
    // two individually-valid values whose SUM overflows the declared int:
    // update-phase sees nothing wrong, so without the merge-phase check
    // the key would vanish from both the table and the error stream
    val result = Etl.json(spark,
      """{"rows": [{"id": "a", "v": "1900000000"}, {"id": "a", "v": "1900000000"}]}""")
      .goto("rows").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("total", applyFn(_.cast("long"), get("v")), policy = MergePolicy.Add))
      .run()
    assert(result.table("t").count() === 0)
    val errs = result.errors("t").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(2) === "total" && errs(0).getString(4) === "merge")
  }

  test("typed table with Append policy validates elements, not the array") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("nums", ArrayType(IntegerType))))
    // "7" and "x" are single elements pre-merge; update-phase must cast
    // them against the ELEMENT type (int), and the merged array column
    // validates as array — previously this crashed with an unresolvable
    // string→array cast before any row ran
    val result = Etl.json(spark,
      """{"rows": [{"id": "a", "v": "7"}, {"id": "a", "v": "x"}]}""")
      .goto("rows").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("nums", get("v"), policy = MergePolicy.Append))
      .run()
    val errs = result.errors("t").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(2) === "nums" && errs(0).getString(3).contains("x"))
  }

  test("Append into a non-array declared type is rejected with guidance") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("nums", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, """{"rows": [{"id": "a", "v": "7"}]}""")
        .goto("rows").each()
        .mapToTyped("t", schema, joinOn = Seq("id"))(
          "id" -> get("id"),
          Field("nums", get("v"), policy = MergePolicy.Append))
        .run()
    }
    assert(e.getMessage.contains("declare array"))
  }

  test("emissions disagreeing on a field's Spark type align to string, then validate") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("age", IntegerType)))
    // emission 1 provides age as a NUMBER, emission 2 as a STRING that is
    // not a number: the union aligns the mixed field to string (no ANSI
    // crash, no silent null) and schema validation records the real error
    val result = Etl.json(spark,
      """{"a": [{"id": "u1", "age": 30}], "b": [{"id": "u1", "age": "N/A"}]}""")
      .goto("a").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("age"))
      .root().goto("b").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("age"))
      .run()
    val errs = result.errors("t").collect()
    assert(errs.length === 1 && errs(0).getString(3).contains("N/A"))
  }

  test("numerically-compatible mixed types widen instead of falling to string") {
    // int (json integer) + double (json float) for the same field across
    // emissions: the union must carry the widened numeric, not a string
    val result = Etl.json(spark,
      """{"a": [{"id": "u1", "v": 2}], "b": [{"id": "u2", "v": 2.5}]}""")
      .goto("a").each()
      .mapTo("t", joinOn = Seq("id"))("id" -> get("id"), "v" -> get("v"))
      .root().goto("b").each()
      .mapTo("t", joinOn = Seq("id"))("id" -> get("id"), "v" -> get("v"))
      .run()
    val df = result.table("t")
    assert(df.schema("v").dataType === org.apache.spark.sql.types.DoubleType)
    assert(rows(df.select("id", "v").orderBy("id")) ===
      Seq(Seq("u1", 2.0), Seq("u2", 2.5)))
  }

  test("conflicting merge policies for one field are rejected") {
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, """{"rows": [{"id": "a", "v": 1}]}""")
        .goto("rows").each()
        .mapTo("t", joinOn = Seq("id"))(
          "id" -> get("id"),
          Field("v", get("v"), policy = MergePolicy.Add))
        .root().goto("rows").each()
        .mapTo("t", joinOn = Seq("id"))(
          "id" -> get("id"),
          Field("v", get("v"), policy = MergePolicy.Max))
        .run()
    }
    assert(e.getMessage.contains("conflicting merge policies"))
  }

  test("conflicting declared schemas for one table are rejected") {
    val s1 = StructType(Seq(StructField("id", StringType)))
    val s2 = StructType(Seq(StructField("id", StringType),
      StructField("age", IntegerType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, """{"rows": [{"id": "a", "age": 1}]}""")
        .goto("rows").each()
        .mapToTyped("t", s1, joinOn = Seq("id"))("id" -> get("id"))
        .root().goto("rows").each()
        .mapToTyped("t", s2, joinOn = Seq("id"))(
          "id" -> get("id"), "age" -> get("age"))
        .run()
    }
    assert(e.getMessage.contains("conflicting schemas"))
  }

  test("conflicting per-emission error modes on one table are rejected") {
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, j)
        .goto("users").each()
        .mapToTyped("users", userSchema, joinOn = Seq("id"),
          errors = ErrorMode.Collect)("id" -> get("id"))
        .root().goto("users").each()
        .mapToTyped("users", userSchema, joinOn = Seq("id"),
          errors = ErrorMode.FailFast)("id" -> get("id"), "age" -> get("age"))
        .run()
    }
    assert(e.getMessage.contains("conflicting error modes"))
  }

  test("a key whose non-nullable field no emission provided errors once, post-merge") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("age", IntegerType, nullable = false)))
    val result = Etl.json(spark,
      """{"withAge": [{"id": "a", "age": 30}], "noAge": [{"id": "b"}]}""")
      .goto("withAge").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))(
        "id" -> get("id"), "age" -> get("age"))
      .root().goto("noAge").each()
      .mapToTyped("t", schema, joinOn = Seq("id"))("id" -> get("id"))
      .run()
    // key b never received age: exactly one post-merge error, no
    // double-count from the update phase (which only checks provided values)
    val errs = result.errors("t").collect()
    assert(errs.length === 1)
    assert(errs(0).getString(1) === "b")
    assert(errs(0).getString(2) === "age" && errs(0).getString(3).contains("non-nullable"))
    assert(rows(result.table("t").select("id", "age")) === Seq(Seq("a", 30)))
  }

  test("telemetry receives map and flush events in order") {
    val rec = new Telemetry.Recording
    val result = pipeline.run(telemetry = rec)
    result.write((_, df) => { df.count(); () })
    val names = rec.events.map(e => (e._1, e._2)).toSeq
    assert(names === Seq(
      ("MapStarted", "users"), ("MapCompleted", "users"),
      ("FlushStarted", "users"), ("FlushCompleted", "users")))
  }

  // reference telemetry.py:27-124 ordering: Map* follows declaration
  // order, Flush* follows TOPO order (parent before child even when the
  // child was declared first), and a failing writer emits FlushFailed
  // for exactly its table
  test("telemetry pins topo flush order and FlushFailed per table") {
    val jj =
      """{"posts": [{"pid": "p1", "uid": "u1"}],
        | "users": [{"id": "u1"}]}""".stripMargin
    val rec = new Telemetry.Recording
    val result = Etl.json(spark, jj)
      .goto("posts").each()
      .mapTo("posts", joinOn = Seq("pid"))(
        "pid" -> get("pid"), "uid" -> get("uid"))
      .linkTo("users", by = Map("uid" -> "id"), as = "user")
      .root()
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))("id" -> get("id"))
      .run(telemetry = rec)
    val e = intercept[RuntimeException] {
      result.write { (t, df) =>
        df.count()
        if (t == "posts") throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage === "boom")
    val names = rec.events.map(ev => (ev._1, ev._2)).toSeq
    assert(names === Seq(
      ("MapStarted", "posts"), ("MapCompleted", "posts"),
      ("MapStarted", "users"), ("MapCompleted", "users"),
      ("FlushStarted", "users"), ("FlushCompleted", "users"),
      ("FlushStarted", "posts"), ("FlushFailed", "posts")))

    // writeStats: same failure CONTINUES the flush (error-collecting
    // mode) and the failed table reports inserted=0, failed=mapped
    val rec2 = new Telemetry.Recording
    val result2 = Etl.json(spark, jj)
      .goto("posts").each()
      .mapTo("posts", joinOn = Seq("pid"))(
        "pid" -> get("pid"), "uid" -> get("uid"))
      .linkTo("users", by = Map("uid" -> "id"), as = "user")
      .root()
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))("id" -> get("id"))
      .run(telemetry = rec2)
    val stats = result2.writeStats { (t, df) =>
      df.write.format("noop").mode("overwrite").save()
      if (t == "posts") throw new RuntimeException("boom")
    }
    val flushes = rec2.events.map(ev => (ev._1, ev._2)).toSeq
      .filter(_._1.startsWith("Flush"))
    assert(flushes === Seq(
      ("FlushStarted", "users"), ("FlushCompleted", "users"),
      ("FlushStarted", "posts"), ("FlushFailed", "posts")))
    assert(stats("users") === TableStats(1, 0, 1, 0))
    assert(stats("posts") === TableStats(1, 0, 0, 1))
  }
}
