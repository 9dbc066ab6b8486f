package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native 60-bit md5-prefix must be value-identical to the
  * conv(substr(md5(x),1,15),16,10) chain it replaces — the dedup
  * family's oracles replay that formula in DuckDB, so any divergence
  * breaks the hash gate. */
class Md5Prefix64Spec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("equals the conv-chain on arbitrary strings, through codegen") {
    import spark.implicits._
    val strGen = Gen.frequency(
      6 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(Gen.choose('', '퟿')).map(_.mkString),
      1 -> Gen.const(""),
      1 -> Gen.const("a" * 500))
    val strs = samples(Gen.listOfN(200, strGen), 3).flatten.distinct
    val df = strs.toDF("s").repartition(4)
    val diff = df.select(
        (Md5Prefix64.md5p64(col("s")) -
          expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)")).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getLong(0)
    assert(diff == 0L, s"native md5 prefix diverges from the conv chain by $diff")
  }

  test("NULL propagates; result is always non-negative and fits 60 bits") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("")).toDF("s")
    val got = df.select(Md5Prefix64.md5p64(col("s")).as("h")).collect()
    assert(got(1).isNullAt(0))
    got.filter(!_.isNullAt(0)).foreach { r =>
      val h = r.getLong(0)
      assert(h >= 0L && h < (1L << 60), s"out of 60-bit range: $h")
    }
  }

  test("binary input hashes the raw bytes (same as the equivalent string)") {
    import spark.implicits._
    val df = Seq("hello graft").toDF("s")
      .select(col("s"), col("s").cast("binary").as("b"))
    val row = df.select(Md5Prefix64.md5p64(col("s")).as("hs"),
      Md5Prefix64.md5p64(col("b")).as("hb")).collect().head
    assert(row.getLong(0) == row.getLong(1))
  }

  test("GraftExtensions registers md5_prefix64 for SQL in an extended session") {
    // getOrCreate reuses the shared session (extensions are create-time
    // static config), so build a sibling session on the same context —
    // and never stop() it, which would kill the shared context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        "SELECT md5_prefix64('abc') AS h, " +
        "cast(conv(substr(md5('abc'), 1, 15), 16, 10) as bigint) AS want")
        .collect().head
      assert(got.getLong(0) == got.getLong(1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
