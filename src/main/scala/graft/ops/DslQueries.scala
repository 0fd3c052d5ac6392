package graft.ops

import graft.Q
import graft.Q.table
import graft.dsl._
import graft.dsl.transforms._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{get => _, _}

/** Input row for the [[MergePolicy.FromUdaf]] oracle query: traversal
  * ordinal + value (top-level so Spark derives an Encoder). The value
  * carries its own ordering key (a fixed-width-padded event id prefix),
  * because a distributed aggregate sees values in ANY order and the
  * root-level ordinal is partition-dependent. */
case class UdafOrdIn(o: Seq[Long], v: String)

/** Buffer: the values seen so far, unordered until finish. */
case class UdafJoinBuf(vs: Seq[String])

/** Ordered string-join as a REAL partially-aggregating Aggregator — the
  * FromUdaf plugin seam (instances.py:31-33) exercised the way a cluster
  * would: map-side partial buffers per input partition, merged on the
  * reducer, sorted once in finish. */
object OrderedJoinAgg extends org.apache.spark.sql.expressions.Aggregator[
    UdafOrdIn, UdafJoinBuf, String] {
  override def zero: UdafJoinBuf = UdafJoinBuf(Vector.empty)
  override def reduce(b: UdafJoinBuf, a: UdafOrdIn): UdafJoinBuf =
    if (a == null || a.o == null || a.v == null) b // absent emission: skip
    else UdafJoinBuf(b.vs :+ a.v)
  override def merge(b1: UdafJoinBuf, b2: UdafJoinBuf): UdafJoinBuf =
    UdafJoinBuf(b1.vs ++ b2.vs)
  // values are "000000000042:click" — sort restores event order, then the
  // 13-char key prefix is dropped from the joined output
  override def finish(r: UdafJoinBuf): String =
    r.vs.sorted.map(_.substring(13)).mkString("|")
  override def bufferEncoder: org.apache.spark.sql.Encoder[UdafJoinBuf] =
    org.apache.spark.sql.Encoders.product[UdafJoinBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING
}

/** Driver-verifiable queries exercising the graft DSL end-to-end over the
  * TESTDATA tables: each query builds a nested "document" DataFrame from
  * parquet (the reference's JSON-root shape), runs an Etl pipeline over
  * it, and is checked against plain SQL on the flat tables — a roundtrip
  * oracle for the traversal/merge/relationship compilers.
  *
  * Scale note: roots are built per-entity (one row per customer/user), so
  * nothing ever collects to the driver; the nested build is a groupBy and
  * the DSL plan on top stays a narrow explode chain.
  */
object DslQueries {

  /** Run a chunk-at-a-time streaming drain with few shuffle partitions:
    * each micro-batch here carries a handful of rows, so the session's
    * batch-scale partition count just multiplies per-chunk task launch and
    * JDBC-write overhead (32 mostly-empty writer tasks per chunk).
    * Restored afterwards so batch queries keep the session's parallelism.
    * Same rationale as StreamingQueries.withStreamShuffle. */
  private def withStreamShuffle[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** orders nested per customer, deterministic array order. */
  private def nestedOrders(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))).as("orders"))
  }

  val queries: Seq[Q] = Seq(
    // ---- traversal compiler roundtrip: explode nested docs back to rows
    Q(
      "dsl_traversal_roundtrip",
      (s, dir) => {
        Etl(nestedOrders(s, dir))
          .goto("orders").each()
          .mapTo("lines")(
            "o_custkey" -> getFromRoot("o_custkey"),
            "o_orderkey" -> get("o_orderkey"),
            "o_totalprice" -> get("o_totalprice"),
            "pos" -> index())
          .run().table("lines")
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey, o_totalprice, o_orderstatus) - 1 AS INT) AS pos
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- merge policies over the events stream grouped by user
    Q(
      "dsl_merge_policies",
      (s, dir) => {
        val ev = Relational.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(
            col("event_id"), col("value")))).as("events"))
        Etl(ev)
          .goto("events").each()
          .mapTo("agg", joinOn = Seq("user_id"))(
            "user_id" -> getFromRoot("user_id"),
            Field("total",
              applyFn(_.cast("decimal(18,2)"), transforms.get("value")),
              policy = MergePolicy.Add),
            Field("lo", transforms.get("value"), policy = MergePolicy.Min),
            Field("hi", transforms.get("value"), policy = MergePolicy.Max),
            Field("first_ev", transforms.get("event_id"), policy = MergePolicy.FirstNonNull),
            Field("last_ev", transforms.get("event_id"), policy = MergePolicy.LastWrite),
            Field("ev_ids", transforms.get("event_id"), policy = MergePolicy.Append))
          .run().table("agg")
          .select(
            col("user_id"),
            col("total").cast("double").as("total"),
            col("lo"), col("hi"), col("first_ev"), col("last_ev"),
            concat_ws(",", col("ev_ids")).as("ev_ids"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  MIN(value) AS lo, MAX(value) AS hi,
             |  MIN(event_id) AS first_ev, MAX(event_id) AS last_ev,
             |  STRING_AGG(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS ev_ids
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- linkTo: many-to-one binding == broadcast hash join
    Q(
      "dsl_linkto",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val ord = table(s, dir, "orders")
        Etl(cust, ord)
          .mapTo("customers", joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "c_name" -> transforms.get("c_name"),
            "c_mktsegment" -> transforms.get("c_mktsegment"))
          .root(1)
          .mapTo("orders", joinOn = Seq("o_orderkey"))(
            "o_orderkey" -> transforms.get("o_orderkey"),
            temp("o_custkey" -> transforms.get("o_custkey")),
            "o_totalprice" -> transforms.get("o_totalprice"))
          .linkTo("customers", by = Map("o_custkey" -> "c_custkey"), as = "customer")
          .run().table("orders")
          .select(
            col("o_orderkey"), col("o_totalprice"),
            col("customer.c_name").as("c_name"),
            col("customer.c_mktsegment").as("c_mktsegment"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- backlink: list-of-ids → array of child rows, list order
    Q(
      "dsl_backlink",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val ord = table(s, dir, "orders")
        val custWithIds = cust.join(
          ord.groupBy(col("o_custkey"))
            .agg(sort_array(collect_list(col("o_orderkey"))).as("order_ids")),
          cust("c_custkey") === col("o_custkey"), "inner")
          .select(col("c_custkey"), col("c_name"), col("order_ids"))
        Etl(custWithIds, ord)
          .mapTo("customers", joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "c_name" -> transforms.get("c_name"),
            temp("order_ids" -> transforms.get("order_ids")))
          .root(1)
          .mapTo("orders", joinOn = Seq("o_orderkey"))(
            "o_orderkey" -> transforms.get("o_orderkey"),
            "o_totalprice" -> transforms.get("o_totalprice"))
          .backlink("customers", "orders", attr = "orders",
            by = ("order_ids", "o_orderkey"))
          .run().table("customers")
          .select(
            col("c_custkey"), col("c_name"),
            size(col("orders")).as("n_orders"),
            concat_ws(",", transform(col("orders"), o => o.getField("o_orderkey")))
              .as("order_keys"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(COUNT(*) AS INT) AS n_orders,
             |  STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin)),

    // ---- items(): dict iteration over a dynamic-key JSON object
    Q(
      "dsl_items_map",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val ev = Relational.events(s, dir)
          .withColumn("props_map",
            from_json(col("props"), MapType(StringType, LongType)))
        Etl(ev)
          .goto("props_map").items()
          .mapTo("kv")(
            "event_id" -> getFromRoot("event_id"),
            "pkey" -> transforms.key(),
            "pval" -> node())
          .run().table("kv")
          .orderBy(col("event_id"), col("pkey"))
      },
      Some("""SELECT event_id, 'k' AS pkey,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS pval
             |FROM events
             |ORDER BY event_id, pkey""".stripMargin)),

    // ---- 3-level traversal: get_from_parent / parent_index / index over
    //      region → nation → customer nested docs (SURVEY §2 rows 19-21)
    Q(
      "dsl_parent_paths",
      (s, dir) => {
        val nat = table(s, dir, "nation")
        val cust = table(s, dir, "customer")
        val reg = table(s, dir, "region")
        val natDocs = nat.join(
          cust.groupBy(col("c_nationkey")).agg(
            sort_array(collect_list(struct(col("c_custkey"), col("c_name"))))
              .as("customers")),
          col("n_nationkey") === col("c_nationkey"))
          .select(col("n_regionkey"),
            struct(col("n_nationkey"), col("n_name"), col("customers")).as("nd"))
        val root = reg.join(natDocs, col("r_regionkey") === col("n_regionkey"))
          .groupBy(col("r_regionkey"), col("r_name"))
          .agg(sort_array(collect_list(col("nd"))).as("nations"))
        Etl(root)
          .goto("nations").each().goto("customers").each()
          .mapTo("out")(
            "c_custkey" -> transforms.get("c_custkey"),
            "nation_name" -> getFromParent("n_name"),
            "region_name" -> getFromRoot("r_name"),
            "nation_pos" -> parentIndex(),
            "cust_pos" -> transforms.index())
          .run().table("out")
          .orderBy(col("c_custkey"))
      },
      Some("""WITH nats AS (
             |  SELECT n_nationkey, n_name, n_regionkey,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1 AS INT) AS nation_pos
             |  FROM nation WHERE n_nationkey IN (SELECT DISTINCT c_nationkey FROM customer)),
             |custs AS (
             |  SELECT c_custkey, c_nationkey,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) - 1 AS INT) AS cust_pos
             |  FROM customer)
             |SELECT c_custkey, n_name AS nation_name, r_name AS region_name,
             |  nation_pos, cust_pos
             |FROM custs JOIN nats ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    // ---- Extend policy: list concat across traversals, scalar → 1-list
    Q(
      "dsl_extend_policy",
      (s, dir) => {
        val root = nestedOrders(s, dir)
        Etl(root)
          .mapTo("t", joinOn = Seq("o_custkey"))(
            "o_custkey" -> transforms.get("o_custkey"),
            Field("okeys",
              applyFn(c => transform(c, o => o.getField("o_orderkey")),
                transforms.get("orders")),
              policy = MergePolicy.Extend))
          .root().goto("orders").each()
          .mapTo("t", joinOn = Seq("o_custkey"))(
            "o_custkey" -> getFromRoot("o_custkey"),
            // scalar contribution — wrapped to a 1-list by the policy
            Field("okeys", transforms.get("o_orderkey"),
              policy = MergePolicy.Extend))
          .run().table("t")
          .select(col("o_custkey"), concat_ws(",", col("okeys")).as("okeys"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH s AS (
             |  SELECT o_custkey,
             |    STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS sk
             |  FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, sk || ',' || sk AS okeys
             |FROM s ORDER BY o_custkey""".stripMargin)),

    // ---- typed validation: error side-channel counts match the rows that
    //      genuinely fail the declared schema
    Q(
      "dsl_validation_errors",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val cust = table(s, dir, "customer").withColumn("num",
          when(col("c_custkey") % 10 === 0, concat(lit("bad"), col("c_custkey")))
            .otherwise(col("c_custkey").cast("string")))
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("num", IntegerType)))
        Etl(cust)
          .mapToTyped("cust", schema, joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "num" -> transforms.get("num"))
          .run().errors("cust")
          .groupBy(col("table")).agg(count(lit(1)).as("n_errors"))
          .withColumnRenamed("table", "tbl")
      },
      Some("""SELECT 'cust' AS tbl, COUNT(*) AS n_errors
             |FROM customer WHERE c_custkey % 10 = 0""".stripMargin)),

    // ---- auto mode over a schema-INFERRED JSON object: each() iterates
    //      dict items exactly like items() (executor.py:66-76) — no
    //      hand-written MapType schema anywhere
    Q(
      "dsl_auto_struct",
      (s, dir) => {
        import s.implicits._
        val ev = Relational.events(s, dir)
        val inferred = s.read.json(ev.select(col("props")).as[String]).schema
        Etl(ev.withColumn("props_obj", from_json(col("props"), inferred)))
          .goto("props_obj").each()
          .mapTo("kv")(
            "event_id" -> getFromRoot("event_id"),
            "pkey" -> transforms.key(),
            "pval" -> node())
          .run().table("kv")
          .orderBy(col("event_id"), col("pkey"))
      },
      Some("""SELECT event_id, 'k' AS pkey,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS pval
             |FROM events
             |ORDER BY event_id, pkey""".stripMargin)),

    // ---- auto-key: unkeyed emits get sequential "__auto_N__" row keys
    //      (executor.py:181-196); deterministic mode reproduces the
    //      reference counter exactly via row_number over the ordinal
    Q(
      "dsl_autokey",
      (s, dir) => {
        val o = table(s, dir, "orders")
        // single root doc with a sorted orders array, so traversal arrival
        // order (= auto-key order) is deterministic for the oracle
        val root = o.agg(sort_array(collect_list(struct(
          col("o_orderkey"), col("o_totalprice")))).as("orders"))
        Etl(root)
          .goto("orders").each()
          .mapTo("seq")(
            "o_orderkey" -> transforms.get("o_orderkey"),
            "o_totalprice" -> transforms.get("o_totalprice"))
          .run().tableKeyed("seq")
          .select(col("auto_key"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT '__auto_' || CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS VARCHAR) || '__' AS auto_key,
             |  o_orderkey, o_totalprice
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- buildIndex/lookup: broadcast dimension dictionary
    Q(
      "dsl_lookup",
      (s, dir) => {
        val nation = table(s, dir, "nation")
        val cust = table(s, dir, "customer")
        Etl(nation, cust)
          .buildIndex("nation_names",
            key = transforms.get("n_nationkey"), value = transforms.get("n_name"))
          .root(1)
          .mapTo("customers", joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "nation_name" -> lookup("nation_names",
              transforms.get("c_nationkey"), default = "UNKNOWN"))
          .run().table("customers")
          .select(col("c_custkey"), col("nation_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COALESCE(n_name, 'UNKNOWN') AS nation_name
             |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    // ---- per-emission update-time validation: a bad value overwritten by
    //      a later good emission still records its error row
    //      (instances.py:204-214 validates every update), while the merged
    //      row itself survives with the good value
    Q(
      "dsl_update_validation",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val cust = table(s, dir, "customer").withColumn("num",
          when(col("c_custkey") % 10 === 0, concat(lit("bad"), col("c_custkey")))
            .otherwise(col("c_custkey").cast("string")))
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("num", IntegerType)))
        val r = Etl(cust)
          .mapToTyped("cust", schema, joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "num" -> transforms.get("num"))
          .root() // second pass overwrites every num with a castable value
          .mapToTyped("cust", schema, joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "num" -> transforms.get("c_custkey"))
          .run()
        r.errors("cust")
          .agg(count(lit(1)).as("n"))
          .select(lit("errors").as("metric"), col("n"))
          .unionByName(r.table("cust")
            .agg(count(lit(1)).as("n"))
            .select(lit("rows").as("metric"), col("n")))
          .orderBy(col("metric"))
      },
      Some("""SELECT 'errors' AS metric, COUNT(*) AS n
             |FROM customer WHERE c_custkey % 10 = 0
             |UNION ALL
             |SELECT 'rows' AS metric, COUNT(*) AS n FROM customer
             |ORDER BY metric""".stripMargin)),

    // ---- heterogeneous-struct iteration: each() over a mixed-type JSON
    //      object straight off schema inference — values carried as their
    //      JSON text (executor.py:66-76 iterates any dict)
    Q(
      "dsl_hetero_struct",
      (s, dir) => {
        import s.implicits._
        val ev = Relational.events(s, dir).withColumn("doc",
          to_json(struct(col("event_type").as("name"), col("user_id").as("num"))))
        val inferred = s.read.json(ev.select(col("doc")).as[String]).schema
        Etl(ev.withColumn("obj", from_json(col("doc"), inferred)))
          .goto("obj").each()
          .mapTo("kv")(
            "event_id" -> getFromRoot("event_id"),
            "pkey" -> transforms.key(),
            "pval" -> node())
          .run().table("kv")
          .orderBy(col("event_id"), col("pkey"))
      },
      Some("""SELECT event_id, 'name' AS pkey, event_type AS pval FROM events
             |UNION ALL
             |SELECT event_id, 'num' AS pkey, CAST(user_id AS VARCHAR) AS pval FROM events
             |ORDER BY event_id, pkey""".stripMargin)),

    // ---- full sink roundtrip: pipeline → batched JDBC upsert (embedded
    //      Derby) → read back — the SQLAlchemy-flush parity check, now in
    //      the oracle gate instead of unit tests only. A pre-seeded stale
    //      row proves the UPDATE arm; everything else exercises INSERT.
    Q(
      "dsl_jdbc_roundtrip",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val r = Etl(cust)
          .mapTo("cust_rt", joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "c_name" -> transforms.get("c_name"),
            "c_mktsegment" -> transforms.get("c_mktsegment"))
          .run()
        val url = "jdbc:derby:memory:graft_rt;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE cust_rt")
          catch { case _: java.sql.SQLException => () } // first run: no table
          st.execute("CREATE TABLE cust_rt (c_custkey BIGINT PRIMARY KEY, " +
            "c_name VARCHAR(100), c_mktsegment VARCHAR(100), id BIGINT)")
          st.execute("INSERT INTO cust_rt VALUES (0, 'STALE', 'STALE', 0)")
        } finally conn.close()
        JdbcLoad.upsert(r, url, Map("cust_rt" -> Seq("c_custkey")))
        s.read.jdbc(url, "cust_rt", new java.util.Properties())
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- scalar-transform edge semantics in one row set:
    //      literal / concat (null→"") / format_id (skip null AND "") /
    //      coalesce / len_of (null stays null) — transforms.py:10-118
    Q(
      "dsl_scalar_transforms",
      (s, dir) => {
        val root = table(s, dir, "customer")
          .withColumn("maybe",
            when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
              .otherwise(col("c_mktsegment")))
          .withColumn("emp",
            when(col("c_custkey") % 2 === 0, lit("")).otherwise(lit("x")))
        Etl(root)
          .mapTo("t")(
            "c_custkey" -> transforms.get("c_custkey"),
            "lit_s" -> literal("X"),
            "cat" -> concatT(transforms.get("c_name"), literal("-"),
              transforms.get("maybe")),
            "fid" -> formatId(transforms.get("c_custkey"),
              transforms.get("maybe"), transforms.get("emp")),
            "coal" -> coalesceT(transforms.get("maybe"),
              transforms.get("c_mktsegment")),
            "len_name" -> lenOf(transforms.get("c_name")),
            "len_null" -> lenOf(transforms.get("maybe")))
          .run().table("t")
          .orderBy(col("c_custkey"))
      },
      Some("""WITH t AS (
             |  SELECT c_custkey, c_name, c_mktsegment,
             |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS maybe,
             |    CASE WHEN c_custkey % 2 = 0 THEN '' ELSE 'x' END AS emp
             |  FROM customer)
             |SELECT c_custkey, 'X' AS lit_s,
             |  c_name || '-' || COALESCE(maybe, '') AS cat,
             |  concat_ws('_', CAST(c_custkey AS VARCHAR), NULLIF(maybe, ''), NULLIF(emp, '')) AS fid,
             |  COALESCE(maybe, c_mktsegment) AS coal,
             |  CAST(length(c_name) AS INT) AS len_name,
             |  CAST(length(maybe) AS INT) AS len_null
             |FROM t ORDER BY c_custkey""".stripMargin)),

    // ---- value-level apply(func, t) parity (transforms.py:206-212):
    //      an arbitrary typed Scala function over the extracted value;
    //      rows where it THROWS surface as phase-"apply" error rows in
    //      collect mode (exception class + message pinned in the oracle)
    //      while the run continues — test_transforms.py:131-141 semantics
    Q(
      "dsl_apply_value",
      (s, dir) => {
        val root = table(s, dir, "customer")
          .withColumn("numstr",
            when(col("c_custkey") % 7 === 0,
              concat(lit("x"), col("c_custkey").cast("string")))
              .otherwise((col("c_custkey") * 3).cast("string")))
        val res = Etl(root)
          .mapTo("t", joinOn = Seq("ck"))(
            "ck" -> transforms.get("c_custkey"),
            "parsed" -> transforms.applyValue[String, Int](
              _.trim.toInt, transforms.get("numstr")))
          .run()
        val t = res.table("t").select(col("ck"), col("parsed"))
        val e = res.errors("t").select(col("key").cast("long").as("ck"),
          col("field"), col("error"), col("phase"))
        t.join(e, Seq("ck"), "left")
          .select(col("ck"), col("parsed"), col("field"), col("error"),
            col("phase"))
          .orderBy(col("ck"))
      },
      Some("""SELECT c_custkey AS ck,
             |  CASE WHEN c_custkey % 7 = 0 THEN NULL
             |       ELSE CAST(c_custkey * 3 AS INT) END AS parsed,
             |  CASE WHEN c_custkey % 7 = 0 THEN 'parsed' END AS field,
             |  CASE WHEN c_custkey % 7 = 0
             |       THEN 'NumberFormatException: For input string: "x' || c_custkey || '"'
             |       END AS error,
             |  CASE WHEN c_custkey % 7 = 0 THEN 'apply' END AS phase
             |FROM customer ORDER BY ck""".stripMargin)),

    // ---- chunked streaming == batch parity, in the oracle gate: suppliers
    //      arrive as key-complete chunks (GroupByChunkSource semantics,
    //      chunking.py:74-124 — every chunk carries whole s_nationkey
    //      groups), each chunk is mapped by a fresh per-chunk pipeline with
    //      merge policies, flushed via the batched JDBC upsert strategy,
    //      and evicted. The read-back must equal the one-shot batch
    //      aggregate DuckDB computes — the reference's streaming-vs-
    //      resident parity contract (tests/test_issue_75.py).
    Q(
      "dsl_chunked_upsert",
      (s, dir) => withStreamShuffle(s, 2) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"),
            col("s_acctbal").cast("double"))
          .as[(Long, Long, Double)].collect() // chunk feed is driver-side by
        // construction (the reference's ChunkSource is an iterator too)
        val chunks = sup.groupBy(_._2 % 3).toSeq.sortBy(_._1).map(_._2.toSeq)
        val url = "jdbc:derby:memory:graft_chunk;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE nat_stats")
          catch { case _: java.sql.SQLException => () } // first run: no table
          // `id` holds the pipeline's auto-injected single-key id column
          st.execute("CREATE TABLE nat_stats (s_nationkey BIGINT PRIMARY KEY, " +
            "n_sup BIGINT, sum_bal DECIMAL(18,2), min_bal DOUBLE, max_bal DOUBLE, " +
            "id BIGINT)")
        } finally conn.close()
        val input = MemoryStream[(Long, Long, Double)]
        val writer = graft.streaming.StreamingEtl.foreachChunk(
          input.toDF().toDF("s_suppkey", "s_nationkey", "s_acctbal"),
          batch => Etl(batch)
            .mapTo("nat_stats", joinOn = Seq("s_nationkey"))(
              "s_nationkey" -> transforms.get("s_nationkey"),
              Field("n_sup", applyFn(_.cast("long"), literal(1)),
                policy = MergePolicy.Add),
              Field("sum_bal",
                applyFn(_.cast("decimal(18,2)"), transforms.get("s_acctbal")),
                policy = MergePolicy.Add),
              Field("min_bal", transforms.get("s_acctbal"), policy = MergePolicy.Min),
              Field("max_bal", transforms.get("s_acctbal"), policy = MergePolicy.Max)),
          graft.streaming.StreamingEtl.JdbcUpsertStrategy(
            url, Map("nat_stats" -> Seq("s_nationkey"))))
        val q = writer.start()
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        q.stop()
        s.read.jdbc(url, "nat_stats", new java.util.Properties())
          .select(col("s_nationkey"), col("n_sup"),
            col("sum_bal").cast("double").as("sum_bal"),
            col("min_bal"), col("max_bal"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n_sup,
             |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             |  MIN(s_acctbal) AS min_bal, MAX(s_acctbal) AS max_bal
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ---- two-phase DB-generated-ID capture (reference Supabase
    //      link_to(fk=...), fluent.py:820-901): parents flush first into an
    //      IDENTITY table, each generated id is captured on the way in
    //      (insertReturningIds), children get their FK column populated
    //      from the captured map BEFORE their own flush — then the
    //      read-back joins child→parent purely through the DB-assigned
    //      surrogate key. Parents are inserted from one sorted partition so
    //      the identity order is deterministic (id = rank of n_name), which
    //      the oracle reproduces with ROW_NUMBER.
    Q(
      "dsl_generated_ids",
      (s, dir) => {
        val url = "jdbc:derby:memory:graft_gen;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          Seq("sup_gen", "nat_gen").foreach { t =>
            try st.execute(s"DROP TABLE $t")
            catch { case _: java.sql.SQLException => () } // first run: no table
          }
          st.execute("CREATE TABLE nat_gen (id BIGINT GENERATED ALWAYS AS " +
            "IDENTITY (START WITH 1, INCREMENT BY 1) PRIMARY KEY, " +
            "n_nationkey BIGINT, n_name VARCHAR(100))")
          st.execute("CREATE TABLE sup_gen (s_suppkey BIGINT PRIMARY KEY, " +
            "s_name VARCHAR(100), nation_fk BIGINT REFERENCES nat_gen(id))")
        } finally conn.close()
        val parents = table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
          .repartition(1).sortWithinPartitions(col("n_name"))
        // collect() forces the side-effecting insert exactly once and keeps
        // the captured ids driver-side (the reference holds them in a dict)
        val captured = JdbcLoad.insertReturningIds(
          parents, url, "nat_gen", Seq("n_nationkey"), "id")
        val ids = s.createDataFrame(
          java.util.Arrays.asList(captured.collect(): _*), captured.schema)
        val children = table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
          .join(broadcast(ids), col("s_nationkey") === ids("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("id").as("nation_fk"))
        children.write.mode("append").jdbc(url, "sup_gen", new java.util.Properties())
        val p = new java.util.Properties()
        s.read.jdbc(url, "sup_gen", p)
          .join(s.read.jdbc(url, "nat_gen", p), col("nation_fk") === col("id"))
          .select(col("s_suppkey"), col("nation_fk"), col("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH ids AS (
             |  SELECT n_nationkey, n_name,
             |    ROW_NUMBER() OVER (ORDER BY n_name) AS nation_fk
             |  FROM nation)
             |SELECT s_suppkey, nation_fk, n_name
             |FROM supplier JOIN ids ON s_nationkey = n_nationkey
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- strict field check (reference executor.py:310-333): declaring
    //      a field the schema doesn't know fails AT BUILD TIME with a
    //      did-you-mean suggestion; the row pins the exact message so the
    //      suggestion machinery (edit-distance <= 3, schema-order known
    //      list) is oracle-checked, not just unit-asserted
    Q(
      "dsl_strict_field",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("name", StringType)))
        val msg =
          try {
            Etl(table(s, dir, "customer"))
              .mapToTyped("cust", schema, joinOn = Seq("c_custkey"))(
                "c_custkey" -> transforms.get("c_custkey"),
                "nmae" -> transforms.get("c_name"))
            "no error"
          } catch { case e: Validation.UnknownFieldException => e.getMessage }
        Seq(msg).toDF("err")
      },
      Some("SELECT 'unknown field ''nmae'' for table ''cust''; " +
        "did you mean ''name''? (known fields: c_custkey, name)' AS err")),

    // ---- custom MergePolicy seam (reference instances.py:31-33): a
    //      user-defined ordered Fold — running concatenation of event
    //      types in ARRIVAL order — checked against STRING_AGG with an
    //      explicit ORDER BY. The fold runs as Catalyst lambdas over the
    //      arrival-ordered value array, so the custom policy stays
    //      inside the same hash aggregate as the built-ins.
    Q(
      "dsl_custom_fold",
      (s, dir) => {
        val ev = Relational.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(
            col("event_id"), col("event_type")))).as("events"))
        Etl(ev)
          .goto("events").each()
          .mapTo("agg", joinOn = Seq("user_id"))(
            "user_id" -> getFromRoot("user_id"),
            Field("types",
              applyFn(_.substr(lit(1), lit(1)), transforms.get("event_type")),
              policy = MergePolicy.Fold(lit(""),
                (acc, x) => concat(acc, x))))
          .run().table("agg")
          .select(col("user_id"), col("types")) // drop the injected id
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  STRING_AGG(substring(event_type, 1, 1), '' ORDER BY event_id, event_type) AS types
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- PipelineResult.tableStats in the oracle gate (reference
    //      TableStats {mapped, errors}, fluent.py:164-281): a two-table
    //      pipeline where every 10th customer fails its typed cast —
    //      mapped counts the valid rows, errors the recorded failures,
    //      and the untyped table reports zero errors. All counts come
    //      from the single unioned-count job tableStats runs.
    Q(
      "dsl_pipeline_stats",
      (s, dir) => {
        import org.apache.spark.sql.types._
        import s.implicits._
        val cust = table(s, dir, "customer").withColumn("num",
          when(col("c_custkey") % 10 === 0, concat(lit("bad"), col("c_custkey")))
            .otherwise(col("c_custkey").cast("string")))
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("num", IntegerType)))
        val r = Etl(cust, table(s, dir, "orders"))
          .mapToTyped("cust", schema, joinOn = Seq("c_custkey"))(
            "c_custkey" -> transforms.get("c_custkey"),
            "num" -> transforms.get("num"))
          .root(1)
          .mapTo("ord", joinOn = Seq("o_orderkey"))(
            "o_orderkey" -> transforms.get("o_orderkey"))
          .run()
        r.tableStats.toSeq
          .map { case (t, st) => (t, st.mapped, st.errors) }
          .toDF("tbl", "mapped", "errors")
          .orderBy(col("tbl"))
      },
      Some("""SELECT 'cust' AS tbl,
             |  (SELECT COUNT(*) FROM customer WHERE c_custkey % 10 <> 0) AS mapped,
             |  (SELECT COUNT(*) FROM customer WHERE c_custkey % 10 = 0) AS errors
             |UNION ALL
             |SELECT 'ord',
             |  (SELECT COUNT(*) FROM orders), CAST(0 AS BIGINT)
             |ORDER BY tbl""".stripMargin)),

    // ---- one-record-per-chunk streaming append (reference
    //      OneRecordPerChunkSource, chunking.py:36-71, flushed through the
    //      append-only KeyCompleteFlushStrategy, chunking.py:281-315):
    //      every nation row is its OWN micro-batch chunk — addData +
    //      processAllAvailable per record pins the batch boundary — each
    //      chunk mapped by a fresh pipeline and appended component-by-
    //      component. The Derby read-back must equal the plain batch
    //      projection: the reference's record-at-a-time streaming == batch
    //      parity contract (tests/test_issue_77.py).
    Q(
      "dsl_stream_append",
      (s, dir) => withStreamShuffle(s, 1) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val rows = table(s, dir, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
        val url = "jdbc:derby:memory:graft_append;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE nat_append")
          catch { case _: java.sql.SQLException => () } // first run: no table
          st.execute("CREATE TABLE nat_append (n_nationkey BIGINT PRIMARY KEY, " +
            "n_name VARCHAR(100), id BIGINT)")
        } finally conn.close()
        val input = MemoryStream[(Long, String)]
        val writer = graft.streaming.StreamingEtl.foreachChunk(
          input.toDF().toDF("n_nationkey", "n_name"),
          batch => Etl(batch)
            .mapTo("nat_append", joinOn = Seq("n_nationkey"))(
              "n_nationkey" -> transforms.get("n_nationkey"),
              "n_name" -> transforms.get("n_name")),
          graft.streaming.StreamingEtl.AppendStrategy((t, df) =>
            df.write.mode("append").jdbc(url, t, new java.util.Properties())))
        val q = writer.start()
        rows.foreach { r => input.addData(r); q.processAllAvailable() }
        q.stop()
        s.read.jdbc(url, "nat_append", new java.util.Properties())
          .select(col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")),

    // ---- pre-segmented multi-root chunks (reference Chunk(sequential=
    //      False) + PreSegmentedChunkSource, chunking.py:26-33,132-178;
    //      fluent.py:1406-1446): each chunk carries rows for BOTH pipeline
    //      roots — the nations of one key group plus the suppliers that
    //      reference them — the splitter slices the batch per root, and
    //      the pipeline maps chunk segment i via root(i). Upsert-flushed
    //      so re-appearing keys update; the read-back aggregate must equal
    //      the one-shot batch join.
    Q(
      "dsl_multiroot_chunks",
      (s, dir) => withStreamShuffle(s, 2) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val nat = table(s, dir, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
          .collect().map(r => ("n", r.getLong(0), r.getString(1), r.getLong(0)))
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_name"),
            col("s_nationkey").cast("long"))
          .collect().map(r => ("s", r.getLong(0), r.getString(1), r.getLong(2)))
        // pre-segmented by nation group: chunk k holds nation keys ≡ k
        // (mod 5) AND the suppliers referencing them — segment-complete
        val chunks = (nat ++ sup).groupBy(_._4 % 5).toSeq.sortBy(_._1)
          .map(_._2.toSeq)
        val url = "jdbc:derby:memory:graft_multiroot;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          Seq("nat_mr", "sup_mr").foreach { t =>
            try st.execute(s"DROP TABLE $t")
            catch { case _: java.sql.SQLException => () } // first run: no table
          }
          st.execute("CREATE TABLE nat_mr (n_nationkey BIGINT PRIMARY KEY, " +
            "n_name VARCHAR(100), id BIGINT)")
          st.execute("CREATE TABLE sup_mr (s_suppkey BIGINT PRIMARY KEY, " +
            "s_name VARCHAR(101), s_nationkey BIGINT, id BIGINT)")
        } finally conn.close()
        val input = MemoryStream[(String, Long, String, Long)]
        val writer = graft.streaming.StreamingEtl.foreachMultiRootChunk(
          input.toDF().toDF("kind", "k", "name", "nat"),
          batch => Seq(
            batch.filter(col("kind") === "n")
              .select(col("k").as("n_nationkey"), col("name").as("n_name")),
            batch.filter(col("kind") === "s")
              .select(col("k").as("s_suppkey"), col("name").as("s_name"),
                col("nat").as("s_nationkey"))),
          roots => Etl(roots: _*)
            .mapTo("nat_mr", joinOn = Seq("n_nationkey"))(
              "n_nationkey" -> transforms.get("n_nationkey"),
              "n_name" -> transforms.get("n_name"))
            .root(1)
            .mapTo("sup_mr", joinOn = Seq("s_suppkey"))(
              "s_suppkey" -> transforms.get("s_suppkey"),
              "s_name" -> transforms.get("s_name"),
              "s_nationkey" -> transforms.get("s_nationkey")),
          graft.streaming.StreamingEtl.JdbcUpsertStrategy(url,
            Map("nat_mr" -> Seq("n_nationkey"), "sup_mr" -> Seq("s_suppkey"))))
        val q = writer.start()
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        q.stop()
        val p = new java.util.Properties()
        val natBack = s.read.jdbc(url, "nat_mr", p)
        val supBack = s.read.jdbc(url, "sup_mr", p)
        natBack.join(supBack,
            natBack("n_nationkey") === supBack("s_nationkey"), "left")
          .groupBy(natBack("n_nationkey"), natBack("n_name"))
          .agg(count(col("s_suppkey")).as("n_sup"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_sup
             |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
             |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin)),

    // ---- relationship completeness + the eager dimension that resolves
    //      it (reference relationships.py:541-616 + load_eager,
    //      fluent.py:1292-1326): chunks are split by SUPPLIER key, so
    //      every chunk's suppliers reference nations the chunk does NOT
    //      carry — the completeness check must fail LOUD on the bare
    //      chunk, and pass once the eagerly-loaded nation dimension joins
    //      the parent set. The pipeline then links each supplier to the
    //      eager parent (non-eager child → eager parent crosses the
    //      boundary in the one allowed direction) and the linked struct's
    //      fields are flattened into the Derby sink, so the read-back
    //      proves the eager rows actually bound.
    Q(
      "dsl_completeness_eager",
      (s, dir) => withStreamShuffle(s, 2) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        import graft.streaming.StreamingEtl
        val nations = table(s, dir, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_name"),
            col("s_nationkey").cast("long"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val chunks = sup.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2.toSeq)
        // 1. a supplier-keyed chunk carries no nation rows: the check must
        //    raise, naming the missing keys (an incomplete chunk written
        //    anyway would strand dangling foreign keys in the sink)
        val bare = chunks.head.toDF("s_suppkey", "s_name", "s_nationkey")
        val fired =
          try {
            StreamingEtl.checkRelationshipCompleteness(
              bare, "s_nationkey", nations.limit(0), "n_nationkey",
              "sup_e", "nat_e")
            false
          } catch { case _: StreamingEtl.RelationshipIncompleteError => true }
        if (!fired) throw new IllegalStateException(
          "RelationshipIncompleteError did not fire for a chunk with no parents")
        val url = "jdbc:derby:memory:graft_eager;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE sup_e")
          catch { case _: java.sql.SQLException => () } // first run: no table
          st.execute("CREATE TABLE sup_e (s_suppkey BIGINT PRIMARY KEY, " +
            "s_name VARCHAR(101), s_nationkey BIGINT, " +
            "nation_n_nationkey BIGINT, nation_n_name VARCHAR(100), " +
            "nation_id BIGINT, id BIGINT)")
        } finally conn.close()
        // 2. same chunks with the eager dimension closed over: the check
        //    runs against {chunk parents ∪ eager parents} and passes
        val input = MemoryStream[(Long, String, Long)]
        val writer = StreamingEtl.foreachMultiRootChunk(
          input.toDF().toDF("s_suppkey", "s_name", "s_nationkey"),
          batch => {
            StreamingEtl.checkRelationshipCompleteness(
              batch, "s_nationkey", nations, "n_nationkey", "sup_e", "nat_e")
            Seq(batch, nations)
          },
          roots => Etl(roots: _*)
            .root(1)
            .mapTo("nat_e", joinOn = Seq("n_nationkey"))(
              "n_nationkey" -> transforms.get("n_nationkey"),
              "n_name" -> transforms.get("n_name"))
            .root(0)
            .mapTo("sup_e", joinOn = Seq("s_suppkey"))(
              "s_suppkey" -> transforms.get("s_suppkey"),
              "s_name" -> transforms.get("s_name"),
              "s_nationkey" -> transforms.get("s_nationkey"))
            .linkTo("nat_e", by = Map("s_nationkey" -> "n_nationkey"),
              as = "nation")
            .loadEager("nat_e"),
          StreamingEtl.AppendStrategy { (t, df) =>
            // the eager dimension is resident, not per-chunk output — only
            // the fact table reaches the sink, with link structs flattened
            if (t != "nat_e") {
              val flat = df.schema.fields.toSeq.flatMap { f =>
                f.dataType match {
                  case st: org.apache.spark.sql.types.StructType =>
                    st.fields.toSeq.map(sf =>
                      col(s"${f.name}.${sf.name}").as(s"${f.name}_${sf.name}"))
                  case _ => Seq(col(f.name))
                }
              }
              df.select(flat: _*).write.mode("append")
                .jdbc(url, t, new java.util.Properties())
            }
          })
        val q = writer.start()
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        q.stop()
        s.read.jdbc(url, "sup_e", new java.util.Properties())
          .select(col("s_suppkey"), col("s_name"),
            col("nation_n_name").as("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, n_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- FromUdaf merge policy in the oracle gate (reference custom
    //      MergePolicy, instances.py:31-33): the root is the RAW events
    //      table — one emission per row across many input partitions, so
    //      one user's values land in several map-side partial buffers and
    //      the Aggregator's merge() genuinely runs (dsl_custom_fold's
    //      array fold covers only the single-array half of the seam).
    //      Checked against STRING_AGG ... ORDER BY.
    Q(
      "dsl_custom_udaf",
      (s, dir) => {
        val ev = Relational.events(s, dir)
        Etl(ev)
          .mapTo("agg", joinOn = Seq("user_id"))(
            "user_id" -> transforms.get("user_id"),
            Field("types",
              concatT(
                applyFn(c => lpad(c.cast("string"), 12, "0"),
                  transforms.get("event_id")),
                literal(":"),
                transforms.get("event_type")),
              policy = MergePolicy.FromUdaf(udaf(OrderedJoinAgg))))
          .run().table("agg")
          .select(col("user_id"), col("types"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  STRING_AGG(event_type, '|' ORDER BY event_id) AS types
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- BufferedKeyFlushStrategy semantics in the oracle gate
    //      (reference chunking.py:543-677): a key re-appearing in a later
    //      chunk UPDATEs only the columns the new row provides — "copy
    //      non-None scalars onto the cached instance" — while null columns
    //      keep the stored value. graft runs it DB-side (COALESCE update),
    //      so it is exact at any size instead of LRU-bounded. Chunk 1
    //      carries every customer's name (no balance); chunk 2 re-sends
    //      every third key with a balance and NO name — the read-back must
    //      show names surviving the partial update.
    Q(
      "dsl_buffered_upsert",
      (s, dir) => withStreamShuffle(s, 2) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val cust = table(s, dir, "customer")
          .select(col("c_custkey").cast("long"), col("c_name"),
            col("c_acctbal").cast("double"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
          .sortBy(_._1).toSeq
        val chunk1 = cust.map(c => (c._1, Option(c._2), Option.empty[Double]))
        val chunk2 = cust.filter(_._1 % 3 == 0)
          .map(c => (c._1, Option.empty[String], Option(c._3)))
        val url = "jdbc:derby:memory:graft_buffered;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE cust_buf")
          catch { case _: java.sql.SQLException => () } // first run: no table
          st.execute("CREATE TABLE cust_buf (c_custkey BIGINT PRIMARY KEY, " +
            "name VARCHAR(100), balance DOUBLE, id BIGINT)")
        } finally conn.close()
        val input = MemoryStream[(Long, Option[String], Option[Double])]
        val writer = graft.streaming.StreamingEtl.foreachChunk(
          input.toDF().toDF("c_custkey", "name", "balance"),
          batch => Etl(batch)
            .mapTo("cust_buf", joinOn = Seq("c_custkey"))(
              "c_custkey" -> transforms.get("c_custkey"),
              "name" -> transforms.get("name"),
              "balance" -> transforms.get("balance")),
          graft.streaming.StreamingEtl.bufferedKeyStrategy(url,
            Map("cust_buf" -> Seq("c_custkey"))))
        val q = writer.start()
        Seq(chunk1, chunk2).foreach { c =>
          input.addData(c: _*); q.processAllAvailable()
        }
        q.stop()
        s.read.jdbc(url, "cust_buf", new java.util.Properties())
          .select(col("c_custkey"), col("name"), col("balance"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name AS name,
             |  CASE WHEN c_custkey % 3 = 0 THEN CAST(c_acctbal AS DOUBLE) END AS balance
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- ExternalPartitionChunkSource in the oracle gate (reference
    //      chunking.py:149-233: two-pass disk spill + one chunk per key in
    //      first-appearance order): in Spark the SHUFFLE is the
    //      disk-backed partitioner — repartitionByKey hashes every key's
    //      rows into one partition, and each partition becomes one chunk
    //      (partition order = the deterministic chunk order). The
    //      key-in-exactly-one-chunk contract is asserted before feeding,
    //      and the Derby read-back aggregate must equal the batch GROUP BY.
    Q(
      "dsl_external_partition",
      (s, dir) => withStreamShuffle(s, 2) {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_name"),
            col("s_nationkey").cast("long"))
        val tagged = graft.streaming.StreamingEtl
          .repartitionByKey(sup, "s_nationkey", 8)
          .withColumn("pid", spark_partition_id())
          .collect()
          .map(r => (r.getInt(3), (r.getLong(0), r.getString(1), r.getLong(2))))
        val chunks = tagged.groupBy(_._1).toSeq.sortBy(_._1)
          .map(_._2.map(_._2).toSeq)
        // the external-partition contract: a key never spans two chunks
        val owners = chunks.zipWithIndex
          .flatMap { case (c, i) => c.map(_._3 -> i) }.distinct
        require(owners.groupBy(_._1).forall(_._2.size == 1),
          "external-partition contract violated: key split across chunks")
        val url = "jdbc:derby:memory:graft_extpart;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE sup_ext")
          catch { case _: java.sql.SQLException => () } // first run: no table
          st.execute("CREATE TABLE sup_ext (s_suppkey BIGINT PRIMARY KEY, " +
            "s_name VARCHAR(101), s_nationkey BIGINT, id BIGINT)")
        } finally conn.close()
        val input = MemoryStream[(Long, String, Long)]
        val writer = graft.streaming.StreamingEtl.foreachChunk(
          input.toDF().toDF("s_suppkey", "s_name", "s_nationkey"),
          batch => Etl(batch)
            .mapTo("sup_ext", joinOn = Seq("s_suppkey"))(
              "s_suppkey" -> transforms.get("s_suppkey"),
              "s_name" -> transforms.get("s_name"),
              "s_nationkey" -> transforms.get("s_nationkey")),
          graft.streaming.StreamingEtl.JdbcUpsertStrategy(url,
            Map("sup_ext" -> Seq("s_suppkey"))))
        val q = writer.start()
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        q.stop()
        s.read.jdbc(url, "sup_ext", new java.util.Properties())
          .groupBy(col("s_nationkey"))
          .agg(count(col("s_suppkey")).as("n_sup"),
            sum(col("s_suppkey")).as("key_sum"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n_sup,
             |  CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ---- telemetry event ordering in the oracle gate (reference
    //      telemetry.py:27-124): Map* events follow declaration order,
    //      Flush* events follow TOPO order (parent before child even
    //      though the child was declared first), and a failing writer
    //      emits FlushFailed for exactly its table before the error
    //      propagates. The recorded sequence is compared against the
    //      pinned literal — the reference's event contract, oracle-checked.
    Q(
      "dsl_telemetry_order",
      (s, dir) => {
        import s.implicits._
        val nat = table(s, dir, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
        val rec = new Telemetry.Recording
        val result = Etl(sup, nat)
          .mapTo("sup_t", joinOn = Seq("s_suppkey"))(
            "s_suppkey" -> transforms.get("s_suppkey"),
            temp("natkey" -> transforms.get("s_nationkey")))
          .linkTo("nat_t", by = Map("natkey" -> "n_nationkey"), as = "nation")
          .root(1)
          .mapTo("nat_t", joinOn = Seq("n_nationkey"))(
            "n_nationkey" -> transforms.get("n_nationkey"))
          .run(telemetry = rec)
        val got =
          try {
            result.write { (t, df) =>
              df.write.format("noop").mode("overwrite").save()
              if (t == "sup_t") throw new RuntimeException("boom")
            }; "no error"
          } catch { case e: RuntimeException => e.getMessage }
        if (got != "boom") throw new IllegalStateException(
          s"flush failure did not propagate: got '$got'")
        rec.events.toSeq.zipWithIndex
          .map { case ((ev, tbl, _), i) => (i + 1, ev, tbl) }
          .toDF("seq", "event", "tbl")
      },
      Some("""SELECT * FROM (VALUES
             |  (1, 'MapStarted', 'sup_t'), (2, 'MapCompleted', 'sup_t'),
             |  (3, 'MapStarted', 'nat_t'), (4, 'MapCompleted', 'nat_t'),
             |  (5, 'FlushStarted', 'nat_t'), (6, 'FlushCompleted', 'nat_t'),
             |  (7, 'FlushStarted', 'sup_t'), (8, 'FlushFailed', 'sup_t')
             |) AS t(seq, event, tbl) ORDER BY seq""".stripMargin))
  )

  /** Flagship: the README-quickstart pipeline shape (users+posts) over the
    * sf0.001 star schema — nested per-customer docs, two tables, a
    * cross-table link, exact traversal-order output.
    */
  def flagship(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val root = nestedOrders(spark, dir)
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("orders"))
    Etl(root)
      .mapTo("users", joinOn = Seq("c_custkey"))(
        "c_custkey" -> transforms.get("c_custkey"),
        "name" -> transforms.get("c_name"))
      .root()
      .goto("orders").each()
      .mapTo("posts", joinOn = Seq("o_orderkey"))(
        "o_orderkey" -> transforms.get("o_orderkey"),
        temp("user_key" -> getFromRoot("c_custkey")),
        "total" -> transforms.get("o_totalprice"))
      .linkTo("users", by = Map("user_key" -> "c_custkey"), as = "user")
      .run().table("posts")
  }
}
