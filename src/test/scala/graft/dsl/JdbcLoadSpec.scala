package graft.dsl

import graft.SparkTestBase

import java.sql.DriverManager

/** Relational load against embedded Derby (a real JDBC database in the
  * Spark classpath) — flush ordering with FK constraints, upsert, and
  * generated-ID capture (reference: tests/test_fluent_sqlalchemy.py).
  */
class JdbcLoadSpec extends SparkTestBase {
  import transforms._

  private val url = s"jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }
  private def queryAll(sql: String): Seq[Seq[Any]] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally c.close()
  }

  private val j =
    """{"users": [{"id": "u1", "name": "Alice",
      |  "posts": [{"id": "p1", "title": "Hello"}, {"id": "p2", "title": "World"}]}]}""".stripMargin

  private def result = Etl.json(spark, j)
    .goto("users").each()
    .mapTo("users", joinOn = Seq("id"))("id" -> get("id"), "name" -> get("name"))
    .root().goto("users").each().goto("posts").each()
    .mapTo("posts", joinOn = Seq("id"))(
      "id" -> get("id"),
      "user_id" -> getFromParent("id"),
      "title" -> get("title"))
    .linkTo("users", by = Map("user_id" -> "id"))
    .run()

  test("append flushes parent-first through a NOT NULL FK") {
    exec("CREATE TABLE users (id VARCHAR(10) PRIMARY KEY, name VARCHAR(50))")
    exec("""CREATE TABLE posts (id VARCHAR(10) PRIMARY KEY,
           | user_id VARCHAR(10) NOT NULL REFERENCES users(id),
           | title VARCHAR(50))""".stripMargin)

    val r = result
    // linkTo embeds a struct column; JDBC needs flat columns — project
    r.write { (t, df) =>
      val flat = if (t == "posts") df.select("id", "user_id", "title") else df
      flat.write.mode("append").jdbc(url, t, new java.util.Properties())
    }
    assert(queryAll("SELECT id, name FROM users") === Seq(Seq("u1", "Alice")))
    assert(queryAll("SELECT id, user_id FROM posts ORDER BY id") ===
      Seq(Seq("p1", "u1"), Seq("p2", "u1")))
  }

  test("upsert updates on key conflict instead of duplicating") {
    exec("CREATE TABLE dim (k VARCHAR(10) PRIMARY KEY, v VARCHAR(20))")
    import spark.implicits._
    val first = Seq(("a", "one"), ("b", "two")).toDF("k", "v")
    val second = Seq(("b", "TWO"), ("c", "three")).toDF("k", "v")
    JdbcLoad.upsertTable(first, url, "dim", Seq("k"), batchSize = 10)
    JdbcLoad.upsertTable(second, url, "dim", Seq("k"), batchSize = 10)
    assert(queryAll("SELECT k, v FROM dim ORDER BY k") ===
      Seq(Seq("a", "one"), Seq("b", "TWO"), Seq("c", "three")))
  }

  test("updateNonNull keeps stored values where the new row is null") {
    exec("CREATE TABLE buf (k VARCHAR(10) PRIMARY KEY, " +
      "a VARCHAR(20), b INTEGER)")
    import spark.implicits._
    val first = Seq(("x", Some("alpha"), None: Option[Int]),
      ("y", Some("beta"), Some(1))).toDF("k", "a", "b")
    val second = Seq(("x", None: Option[String], Some(7)), // partial update
      ("y", Some("BETA"), None: Option[Int]), // other column partial
      ("z", None: Option[String], Some(9))).toDF("k", "a", "b") // fresh insert
    JdbcLoad.upsertTable(first, url, "buf", Seq("k"), 10, updateNonNull = true)
    JdbcLoad.upsertTable(second, url, "buf", Seq("k"), 10, updateNonNull = true)
    assert(queryAll("SELECT k, a, b FROM buf ORDER BY k") === Seq(
      Seq("x", "alpha", 7), // a survived the null in chunk 2
      Seq("y", "BETA", 1), // b survived
      Seq("z", null, 9))) // new key inserts as-is, nulls included
  }

  test("upsert batches statements: >=10x fewer round trips than rows") {
    exec("CREATE TABLE big_dim (k INT PRIMARY KEY, v VARCHAR(20))")
    import spark.implicits._
    val existing = (1 to 40).map(i => (i, "old")).toDF("k", "v")
    JdbcLoad.upsertTable(existing.repartition(1), url, "big_dim", Seq("k"), batchSize = 50)
    // 100 rows: 40 updates hit, 60 miss and insert
    val rows = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(1)
    val trips = JdbcLoad.upsertTable(rows, url, "big_dim", Seq("k"), batchSize = 50)
    assert(queryAll("SELECT COUNT(*) FROM big_dim").head.head
      .asInstanceOf[Number].intValue === 100)
    assert(queryAll("SELECT v FROM big_dim WHERE k = 7").head.head === "v7")
    // 2 chunks x (1 update batch + 1 insert batch) = 4 round trips vs 100 rows
    assert(trips * 10 <= 100, s"expected batched round trips, got $trips")
  }

  test("all-key-column upsert degenerates to insert-if-missing") {
    exec("CREATE TABLE edges (child_id VARCHAR(10), parent_id VARCHAR(10), " +
      "PRIMARY KEY (child_id, parent_id))")
    exec("INSERT INTO edges VALUES ('c1', 'p1')") // pre-existing row
    import spark.implicits._
    val df = Seq(("c1", "p1"), ("c2", "p1"), ("c2", "p2"))
      .toDF("child_id", "parent_id")
    // every column is a key: nothing to UPDATE — the old code built
    // "UPDATE edges SET  WHERE ..." and died in prepareStatement
    JdbcLoad.upsertTable(df, url, "edges", Seq("child_id", "parent_id"), 500)
    assert(queryAll("SELECT child_id, parent_id FROM edges ORDER BY 1, 2") ===
      Seq(Seq("c1", "p1"), Seq("c2", "p1"), Seq("c2", "p2")))
    exec("DROP TABLE edges")
  }

  test("non-identifier table/column names are refused") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      JdbcLoad.upsertTable(df, url, "dim; DROP TABLE users", Seq("k"), 10)
    }
  }

  test("schema-qualified table names pass; each segment is still validated") {
    JdbcLoad.checkTable("app.users")
    JdbcLoad.checkTable("users")
    intercept[IllegalArgumentException](JdbcLoad.checkTable("app.users; DROP"))
    intercept[IllegalArgumentException](JdbcLoad.checkTable("app..users"))
    intercept[IllegalArgumentException](JdbcLoad.checkTable(".users"))
    // column names stay single-segment
    intercept[IllegalArgumentException](JdbcLoad.checkIdent("a.b"))
  }

  test("insertReturningIds captures DB-generated keys for FK population") {
    exec("""CREATE TABLE gen_users (
           | id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
           | name VARCHAR(50))""".stripMargin)
    import spark.implicits._
    val parents = Seq(Tuple1("Alice"), Tuple1("Bob")).toDF("name")
    val ids = JdbcLoad.insertReturningIds(parents, url, "gen_users",
      naturalKey = Seq("name"), idCol = "id")
    val got = ids.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keySet === Set("Alice", "Bob"))
    assert(got.values.toSet.size === 2) // distinct generated ids
    // and they match what the DB holds
    val db = queryAll("SELECT name, id FROM gen_users ORDER BY id")
      .map(r => (r(0), r(1).asInstanceOf[Long])).toMap
    assert(db === got)
  }
}
