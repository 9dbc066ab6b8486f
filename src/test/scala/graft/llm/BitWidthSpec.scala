package graft.llm

import graft.SparkSuite

/** Pins the adaptive SRP band width ([[AnnOps.bandBitsFor]]) — the
  * round-12 verdict's last scale-killer fix. Two things must never
  * drift:
  *
  * 1. the BOUNDARIES: n ≤ 32768 → 8 bits (every gate corpus through
  *    sf1 stays bit-identical to rounds ≤ 12), first widening at
  *    32769, sf10's 200k corpus at 11 bits;
  * 2. the Scala integer formula vs the ORACLE's SQL integer formula —
  *    the oracle re-derives the width from its own count(*) via
  *    `greatest(8, length(bin((n+127)//128 - 1)))`; `bin`/`length`
  *    behave identically in Spark SQL and DuckDB for non-negative
  *    BIGINTs (binary digits, no leading zeros), so evaluating the
  *    oracle's exact expression in Spark and comparing against the
  *    JVM numberOfLeadingZeros form proves the two replays agree for
  *    every corpus size, not just the gate SFs.
  */
class BitWidthSpec extends SparkSuite {

  private val occ = AnnOps.LshOcc

  test("bandBitsFor boundaries: floor 8 through 32768, then ceil-log2 growth") {
    assert(AnnOps.bandBitsFor(0L) == 8)
    assert(AnnOps.bandBitsFor(1L) == 8)
    assert(AnnOps.bandBitsFor(500L) == 8) // sf0.001 / sf0.01 corpus
    assert(AnnOps.bandBitsFor(2000L) == 8) // sf0.1 corpus
    assert(AnnOps.bandBitsFor(20000L) == 8) // sf1 corpus
    assert(AnnOps.bandBitsFor(occ * 256L) == 8) // 32768: last 8-bit n
    assert(AnnOps.bandBitsFor(occ * 256L + 1L) == 9) // first widening
    assert(AnnOps.bandBitsFor(occ * 512L) == 9)
    assert(AnnOps.bandBitsFor(occ * 512L + 1L) == 10)
    assert(AnnOps.bandBitsFor(200000L) == 11) // the sf10 corpus
    assert(AnnOps.bandBitsFor(20000000L) == 18) // 100x sf10
    assert(AnnOps.bandBitsFor(1000000000L) == 23) // 10^9 vectors
  }

  test("mean bucket occupancy per band stays <= LshOcc for all n") {
    // the whole point of the policy: 2^bits >= ceil(n / LshOcc)
    for (n <- Seq(1L, 100L, 32768L, 32769L, 100000L, 200000L,
        1000000L, 123456789L, 10000000000L)) {
      val nb = AnnOps.bandBitsFor(n)
      val m = (n + occ - 1) / occ
      assert((1L << nb) >= m, s"n=$n bits=$nb buckets=${1L << nb} < $m")
      // and never over-wide by more than one doubling past the floor
      if (nb > 8) assert((1L << (nb - 1)) < m, s"n=$n over-wide at $nb bits")
    }
  }

  test("JVM formula equals the oracle's SQL formula for exhaustive + boundary n") {
    // The oracle's exact arithmetic (DuckDB `//` spelled as Spark
    // `div` — both are floor division on non-negative BIGINTs;
    // bin/length behave identically for them), evaluated in ONE plan
    // over every boundary-adjacent corpus size.
    import spark.implicits._
    val ns = ((0L to 1024L) ++
      Seq(16384L, 32767L, 32768L, 32769L, 65536L, 65537L, 200000L,
        1048576L, 1048577L, 199999999L) ++
      (0 to 40).flatMap(k => Seq((occ << k) - 1, occ << k, (occ << k) + 1)))
      .distinct
    val rows = ns.toDF("n").selectExpr("n",
      s"""greatest(8, CASE
            WHEN (greatest(n, 1) + ${occ - 1}) div $occ <= 1 THEN 0
            ELSE length(bin((greatest(n, 1) + ${occ - 1}) div $occ - 1)) END) AS nb"""
    ).collect()
    assert(rows.length == ns.length)
    rows.foreach { r =>
      assert(r.getInt(1) == AnnOps.bandBitsFor(r.getLong(0)),
        s"formula drift at n=${r.getLong(0)}")
    }
  }
}
