package graft.dsl

import graft.SparkTestBase

/** Auto-key semantics for unkeyed emissions (reference:
  * executor.py:181-196 — per-table sequential "__auto_N__" keys; id is
  * never injected from an auto key, executor.py:363-370).
  */
class AutoKeySpec extends SparkTestBase {
  import transforms._

  private val j1 =
    """{"users": [
      |  {"id": "u1", "name": "Alice"},
      |  {"id": "u2", "name": "Bob"},
      |  {"id": "u3", "name": "Cara"}
      |]}""".stripMargin

  private def pipeline(scalable: Boolean) = {
    val base = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("u")("name" -> get("name"))
    (if (scalable) base.scalableIds() else base).run()
  }

  test("unkeyed emissions get sequential __auto_N__ keys in arrival order") {
    val result = pipeline(scalable = false)
    assert(rows(result.tableKeyed("u").orderBy("auto_key")) === Seq(
      Seq("Alice", "__auto_0__"),
      Seq("Bob", "__auto_1__"),
      Seq("Cara", "__auto_2__")))
    // the visible table is unchanged — auto keys are identity, not data
    assert(result.table("u").columns.toSeq === Seq("name"))
  }

  test("auto key spans emissions into the same table") {
    val result = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("u")("name" -> get("name"))
      .root()
      .goto("users").each()
      .mapTo("u")("name" -> applyFn(c => org.apache.spark.sql.functions.upper(c), get("name")))
      .run()
    val keys = result.tableKeyed("u").collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(keys.keySet === (0 to 5).map(i => s"__auto_${i}__").toSet)
    assert(keys("__auto_0__") === "Alice" && keys("__auto_3__") === "ALICE")
  }

  test("scalableIds keeps keys unique but compiles without the global window") {
    val det = pipeline(scalable = false)
    val sca = pipeline(scalable = true)

    val keys = sca.tableKeyed("u").collect().map(_.getString(1))
    assert(keys.distinct.length === keys.length)
    assert(keys.forall(_.matches("__auto_\\d+__")))

    val detPlan = det.tableKeyed("u").queryExecution.optimizedPlan.toString
    val scaPlan = sca.tableKeyed("u").queryExecution.optimizedPlan.toString
    assert(detPlan.contains("row_number"))
    assert(!scaPlan.contains("row_number"))
    assert(scaPlan.contains("monotonically_increasing_id"))
  }

  test("deterministic sequential keys are a local-master-only default") {
    // the single-partition global window behind row_number is acceptable in
    // one JVM; on a cluster master tableKeyed falls back to scalable ids
    assert(PipelineResult.deterministicKeysSafe("local"))
    assert(PipelineResult.deterministicKeysSafe("local[4]"))
    assert(PipelineResult.deterministicKeysSafe("local[*]"))
    // local-cluster spawns separate executor JVMs — treat as a cluster
    assert(!PipelineResult.deterministicKeysSafe("local-cluster[2,1,1024]"))
    assert(!PipelineResult.deterministicKeysSafe("spark://host:7077"))
    assert(!PipelineResult.deterministicKeysSafe("yarn"))
    assert(!PipelineResult.deterministicKeysSafe("k8s://https://host:443"))
  }

  test("keyed tables refuse tableKeyed") {
    val result = Etl.json(spark, j1)
      .goto("users").each()
      .mapTo("u", joinOn = Seq("id"))("id" -> get("id"), "name" -> get("name"))
      .run()
    val e = intercept[IllegalArgumentException](result.tableKeyed("u"))
    assert(e.getMessage.contains("keyed on"))
  }
}
