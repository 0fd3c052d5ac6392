package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Md5PrefixLong must be bit-identical to the composed
  * `conv(substring(md5(x), 1, k), 16, 10)` chain it replaces — the
  * cross-engine hash every oracle reproduces as
  * `('0x' || substr(md5(x), 1, k))::BIGINT`. */
class Md5PrefixLongSpec extends SparkTestBase {
  import spark.implicits._

  private val samples: Seq[String] =
    Seq("", "a", "the quick brown fox", "naïve café — ünïcødé",
      "0", "\n\t spaces \n", "x" * 10000) ++
      (1 to 500).map(i => s"doc $i shingle ${i * 37} tail ${"pad" * (i % 7)}")

  test("equals the conv(substring(md5)) spelling for every call-site width") {
    val df = samples.toDF("s")
    for (k <- Seq(1, 6, 8, 9, 12, 14, 15)) {
      val rows = df.select(
          Md5PrefixLong.md5_prefix_long(col("s"), k).as("native"),
          conv(substring(md5(col("s").cast("binary")), 1, k), 16, 10)
            .cast("long").as("composed"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"k=$k mismatch: native=${r.getLong(0)} composed=${r.getLong(1)}"))
    }
  }

  test("mid-digest slices match too (the minhash h2 form)") {
    val df = samples.toDF("s")
    for ((k0, k) <- Seq((15, 14), (2, 7), (14, 14), (29, 4), (18, 15))) {
      val rows = df.select(
          Md5PrefixLong.md5_slice_long(col("s"), k0, k).as("native"),
          conv(substring(md5(col("s").cast("binary")), k0, k), 16, 10)
            .cast("long").as("composed"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"slice($k0,$k) mismatch: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
  }

  test("16 digits = the signed two-word assembly (hi << 32 | lo)") {
    val df = samples.toDF("s")
    val rows = df.select(
        Md5PrefixLong.md5_slice_long(col("s"), 1, 16).as("native"),
        shiftleft(conv(substring(md5(col("s").cast("binary")), 1, 8), 16, 10)
            .cast("long"), 32)
          .bitwiseOR(conv(substring(md5(col("s").cast("binary")), 9, 8), 16, 10)
            .cast("long")).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("binary input hashes the raw bytes, null stays null") {
    val df = Seq(Array[Byte](0, 1, 2, -1), Array[Byte]()).toDF("b")
    val rows = df.select(
        Md5PrefixLong.md5_prefix_long(col("b"), 14).as("native"),
        conv(substring(md5(col("b")), 1, 14), 16, 10)
          .cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val n = Seq[Option[String]](None).toDF("s")
      .select(Md5PrefixLong.md5_prefix_long(col("s"), 14)).collect()
    assert(n.head.isNullAt(0))
  }
}
