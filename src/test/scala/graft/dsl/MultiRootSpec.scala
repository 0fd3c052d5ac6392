package graft.dsl

import graft.SparkTestBase

/** Multi-root pipelines: cross-root merge into one table, root order in
  * last-write-wins, typed output (reference: fluent.py:1339-1371
  * cross-root merge; multi-root chunks).
  */
case class UserRow(id: String, name: String, email: String)

class MultiRootSpec extends SparkTestBase {
  import transforms._

  test("same table from two roots merges field-wise by key, root order wins") {
    val r0 = spark.read.option("multiLine", true).json(
      spark.createDataset(Seq(
        """{"users": [{"id": "u1", "name": "Alice"}, {"id": "u2", "name": "Bob"}]}"""))(
        org.apache.spark.sql.Encoders.STRING))
    val r1 = spark.read.option("multiLine", true).json(
      spark.createDataset(Seq(
        """{"profiles": [{"user_id": "u1", "email": "a@x.io", "name": "Alicia"}]}"""))(
        org.apache.spark.sql.Encoders.STRING))

    val result = Etl(r0, r1)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"))
      .root(1)
      .goto("profiles").each()
      .mapTo("users", joinOn = Seq("id"))(
        temp("id" -> get("user_id")),
        "name" -> get("name"), // later root overwrites
        "email" -> get("email"))
      .run()

    assert(rows(result.tableOrdered("users")) === Seq(
      Seq("u1", "Alicia", "a@x.io"),
      Seq("u2", "Bob", null)))
  }

  test("typed accessor returns a Dataset of the case class") {
    import spark.implicits._
    val r = spark.read.option("multiLine", true).json(
      spark.createDataset(Seq(
        """{"users": [{"id": "u1", "name": "Alice", "email": "a@x.io"}]}"""))(
        org.apache.spark.sql.Encoders.STRING))
    val result = Etl(r)
      .goto("users").each()
      .mapTo("users", joinOn = Seq("id"))(
        "id" -> get("id"), "name" -> get("name"), "email" -> get("email"))
      .run()
    val ds = result.typed[UserRow]("users")
    assert(ds.collect().toSeq === Seq(UserRow("u1", "Alice", "a@x.io")))
  }

  test("cacheRoots is a no-op semantically") {
    val r = spark.read.option("multiLine", true).json(
      spark.createDataset(Seq("""{"xs": [{"v": 1}, {"v": 2}]}"""))(
        org.apache.spark.sql.Encoders.STRING))
    val result = Etl(r).cacheRoots()
      .goto("xs").each()
      .mapTo("a")("v" -> get("v"))
      .root().goto("xs").each()
      .mapTo("b")("v2" -> applyFn(_ * 2, get("v")))
      .run()
    assert(rows(result.tableOrdered("a")) === Seq(Seq(1L), Seq(2L)))
    assert(rows(result.tableOrdered("b")) === Seq(Seq(2L), Seq(4L)))
    r.unpersist()
  }
}
