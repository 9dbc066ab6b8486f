package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class DotProductDSpec extends SparkSuite {

  test("dot_d equals the sequential fold, through codegen") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val got = df.select(DotProductD.dotD(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(32.0, 0.0, 0.0))
  }

  test("dot_d bit-matches the unrolled GetArrayItem sum on real embeddings") {
    val v = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val unrolled = (0 until 64).map(i => col("e").getItem(i) * col("e").getItem(i)).reduce(_ + _)
    val diff = v.select(
        (DotProductD.dotD(col("e"), col("e")) - unrolled).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"codegen path diverges from unrolled sum by $diff")
  }

  test("null input yields null (BinaryExpression null semantics)") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val r = df.select(DotProductD.dotD(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("GraftExtensions registers dot_d for SQL in an extended session") {
    // getOrCreate reuses the shared session (extensions are create-time
    // static config), so build a sibling session on the same context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT dot_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0).getDouble(0)
      assert(r == 11.0)
      // the native aggregates are SQL-callable too
      val sig = s2.sql(
        "SELECT minhash_sig(h1, h2) AS s FROM VALUES (5L, 3L), (9L, 7L) t(h1, h2)")
        .collect()(0).getSeq[Long](0)
      assert(sig.length == 64 && sig.head == 5L) // min(5, 9)
      val fi = s2.sql(
        "SELECT freq_items(tok, 4) AS s FROM VALUES ('a'),('a'),('b'),('a') t(tok)")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(fi.head.getString(0) == "a" && fi.head.getLong(1) == 3L)
      val bf = s2.sql(
        "SELECT bloom_agg(k, 4096, 3) AS bf FROM VALUES (1L), (2L) t(k)")
        .collect()(0).getSeq[Long](0)
      assert(bf.length == 64 && bf.map(java.lang.Long.bitCount).sum > 0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
