package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** linkTo / backlink / buildIndex+lookup semantics (FIXTURES J6, reference
  * tests: test_relationships.py, test_many_to_many.py).
  */
class RelationshipSpec extends SparkTestBase {
  import transforms._

  private val j1 =
    """{"users": [
      |  {"id": "u1", "name": "Alice",
      |   "posts": [{"id": "p1", "title": "Hello"}, {"id": "p2", "title": "World"}]},
      |  {"id": "u2", "name": "Bob", "posts": []}
      |]}""".stripMargin

  test("linkTo embeds the parent row; missing parent stays null") {
    val j =
      """{"users": [{"id": "u1", "name": "Alice"}],
        |  "posts": [{"id": "p1", "user_id": "u1", "title": "Hello"},
        |            {"id": "p2", "user_id": "zz", "title": "Orphan"}]}""".stripMargin
    val result = Etl.json(spark, j)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))("id" -> get("id"), "name" -> get("name"))
      .root()
      .goto("posts").each()
      .mapTo("posts", joinOn = Seq("id"))(
        "id" -> get("id"),
        temp("user_id" -> get("user_id")),
        "title" -> get("title"))
      .linkTo("users", by = Map("user_id" -> "id"))
      .run()

    val out = rows(result.tableOrdered("posts"))
    assert(out === Seq(
      Seq("p1", "Hello", Row("u1", "Alice")),
      Seq("p2", "Orphan", null)))
    // flush order: parents before children
    assert(result.topoOrder === Seq("users", "posts"))
  }

  test("linkTo attr colliding with an existing column fails at bind, not materialize") {
    val j =
      """{"users": [{"id": "u1", "name": "Alice"}],
        |  "posts": [{"id": "p1", "user_id": "u1", "user": "existing col"}]}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, j)
        .goto("users").each()
        .mapTo("users", joinOn = Seq("id"))("id" -> get("id"), "name" -> get("name"))
        .root().goto("posts").each()
        .mapTo("posts", joinOn = Seq("id"))(
          "id" -> get("id"),
          temp("user_id" -> get("user_id")),
          "user" -> get("user")) // column named like the default attr
        .linkTo("users", by = Map("user_id" -> "id"))
        .run()
    }
    assert(e.getMessage.contains("already has that column"))
  }

  test("buildIndex with a non-scalar value names the offending entry") {
    val j = """{"rows": [{"k": "a", "v": {"nested": 1}}]}"""
    val e = intercept[IllegalArgumentException] {
      Etl.json(spark, j)
        .goto("rows").each()
        .buildIndex("m", key = get("k"), value = node())
        .root().goto("rows").each()
        .mapTo("t")("k" -> get("k"), "x" -> lookup("m", get("k")))
        .run()
    }
    assert(e.getMessage.contains("scalar"))
  }

  test("J6: backlink attaches children in list order, missing ids skipped") {
    val j6 =
      """{"questions": [{"id": "q1", "text": "Pick one", "choice_ids": ["c2", "c1", "zz"]}],
        |  "choices":   [{"id": "c1", "text": "A"}, {"id": "c2", "text": "B"}]}""".stripMargin
    val result = Etl.json(spark, j6)
      .goto("questions").each()
      .mapTo("questions", joinOn = Seq("id"))(
        "id" -> get("id"), "text" -> get("text"),
        temp("choice_ids" -> get("choice_ids")))
      .root().goto("choices").each()
      .mapTo("choices", joinOn = Seq("id"))(
        "id" -> get("id"), "text" -> get("text"))
      .backlink("questions", "choices", attr = "choices",
        by = ("choice_ids", "id"))
      .run()

    val out = rows(result.tableOrdered("questions"))
    // list order c2 before c1; unmatched "zz" skipped
    assert(out === Seq(
      Seq("q1", "Pick one", Seq(Row("c2", "B"), Row("c1", "A")))))
    // backlink: children flush before the parent that references them
    assert(result.topoOrder === Seq("choices", "questions"))
  }

  test("buildIndex from traversal + lookup with default") {
    val j =
      """{"codes": [{"k": "a", "v": "Alpha"}, {"k": "b", "v": "Beta"}],
        |  "items": [{"code": "a"}, {"code": "b"}, {"code": "x"}]}""".stripMargin
    val result = Etl.json(spark, j)
      .goto("codes").each()
      .buildIndex("code_names", key = get("k"), value = get("v"))
      .root().goto("items").each()
      .mapTo("items")(
        "code" -> get("code"),
        "label" -> lookup("code_names", get("code"), default = "?"))
      .run()
    assert(rows(result.tableOrdered("items")) === Seq(
      Seq("a", "Alpha"), Seq("b", "Beta"), Seq("x", "?")))
  }

  test("lookup against a seeded map; unknown index raises") {
    val result = Etl.json(spark, """{"items": [{"c": "x"}]}""")
      .buildIndex("m", Map("x" -> "X"))
      .goto("items").each()
      .mapTo("t")("v" -> lookup("m", get("c")))
      .run()
    assert(rows(result.tableOrdered("t")) === Seq(Seq("X")))

    val err = intercept[IllegalArgumentException] {
      Etl.json(spark, """{"items": [{"c": "x"}]}""")
        .goto("items").each()
        .mapTo("t")("v" -> lookup("nope", get("c")))
        .run()
    }
    assert(err.getMessage.contains("nope"))
  }

  test("components split unrelated table groups") {
    val result = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))("id" -> get("id"))
      .root().goto("users").each().goto("posts").each()
      .mapTo("posts", joinOn = Seq("id"))(
        "id" -> get("id"), temp("uid" -> getFromParent("id")))
      .linkTo("users", by = Map("uid" -> "id"))
      .root().goto("users").each()
      .mapTo("loners")("n" -> get("name"))
      .run()
    assert(result.components === Seq(Set("loners"), Set("posts", "users")))
  }
}
