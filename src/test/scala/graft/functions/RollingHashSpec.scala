package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native codegen expression: value parity with the composable-HOF
  * form, SQL registration, null handling.
  */
class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  test("native expression matches the HOF construction on ASCII text") {
    val df = Seq("", "a", "the quick brown fox", "x" * 500, "a b  c ")
      .toDF("t")
      .select(
        TextFunctions.fingerprint($"t").as("native"),
        TextFunctions.fingerprintHof($"t").as("hof"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("SQL registration exposes rolling_hash()") {
    RollingHash.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('abc') AS h").collect()(0).getLong(0)
    val viaCol = Seq("abc").toDF("t")
      .select(RollingHash.rolling_hash($"t")).collect()(0).getLong(0)
    assert(viaSql === viaCol)
    // h("abc") = ((97*31 + 98)*31 + 99) mod p
    assert(viaSql === ((97L * 31 + 98) * 31 + 99) % TextFunctions.FingerprintMod)
  }

  test("null input stays null; non-string input fails analysis") {
    val out = Seq(Some("x"), None).toDF("t")
      .select(RollingHash.rolling_hash($"t").as("h")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val e = intercept[Exception] {
      Seq(1).toDF("n").select(RollingHash.rolling_hash($"n")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
