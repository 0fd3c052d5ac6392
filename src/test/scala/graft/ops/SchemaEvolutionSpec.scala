package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The declared-mapping evolved read: null-filling (including NUMERIC
  * targets, which the oracle gate keeps out of its hashed columns),
  * widening casts, rename application, and both fail-loud paths
  * (unmapped extra column, lossy cast). */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_schema_evo_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val target = StructType(Seq(
    StructField("k", LongType),
    StructField("v", DoubleType),
    StructField("tag", StringType)))

  test("missing columns null-fill with the TARGET type, incl. numerics") {
    val dir = tmp("nullfill")
    Seq((1, "a")).toDF("k", "tag").write.mode("overwrite").parquet(s"$dir/v1")
    val out = SchemaEvolution.evolvedRead(spark, Seq("v1" -> s"$dir/v1"),
      Map.empty, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("k", LongType), ("v", DoubleType), ("tag", StringType),
        ("version", StringType)))
    val r = out.collect()(0)
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.getString(2) === "a" &&
      r.getString(3) === "v1")
  }

  test("renames apply before target matching; widenings are exact") {
    val dir = tmp("rename")
    Seq((7, 2.5f, "x")).toDF("key", "v", "tag")
      .write.mode("overwrite").parquet(s"$dir/v1")
    val out = SchemaEvolution.evolvedRead(spark, Seq("v1" -> s"$dir/v1"),
      Map("key" -> "k"), target).collect()(0)
    assert(out.getLong(0) === 7L)     // int -> long
    assert(out.getDouble(1) === 2.5)  // float -> double, exact
  }

  test("an unmapped extra column fails loud with version and name") {
    val dir = tmp("unmapped")
    Seq((1L, 1.0, "a", "junk")).toDF("k", "v", "tag", "orphan")
      .write.mode("overwrite").parquet(s"$dir/v2")
    val e = intercept[RuntimeException] {
      SchemaEvolution.evolvedRead(spark, Seq("v2" -> s"$dir/v2"),
        Map.empty, target)
    }
    assert(e.getMessage.contains("v2") && e.getMessage.contains("orphan"))
  }

  test("a lossy cast is refused at plan time (long does not narrow/float)") {
    val dir = tmp("lossy")
    Seq((1L, 1L, "a")).toDF("k", "v", "tag")
      .write.mode("overwrite").parquet(s"$dir/v1") // v: LONG, target DOUBLE
    val e = intercept[RuntimeException] {
      SchemaEvolution.evolvedRead(spark, Seq("v1" -> s"$dir/v1"),
        Map.empty, target)
    }
    assert(e.getMessage.contains("lossy") && e.getMessage.contains("'v'"))
  }

  test("a rename target outside the schema is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.evolvedRead(spark, Seq("v1" -> "/nonexistent"),
        Map("old" -> "nosuch"), target)
    }
    assert(e.getMessage.contains("nosuch"))
  }

  test("multi-version union stacks in order and tags provenance") {
    val dir = tmp("multi")
    Seq((1, "a")).toDF("k", "tag").write.mode("overwrite").parquet(s"$dir/v1")
    Seq((2L, 9.0, "b")).toDF("k", "v", "tag")
      .write.mode("overwrite").parquet(s"$dir/v2")
    val out = SchemaEvolution.evolvedRead(spark,
      Seq("v1" -> s"$dir/v1", "v2" -> s"$dir/v2"), Map.empty, target)
      .orderBy("k").collect()
    assert(out.map(_.getString(3)).toSeq === Seq("v1", "v2"))
    assert(out(0).isNullAt(1) && out(1).getDouble(1) === 9.0)
  }
}
