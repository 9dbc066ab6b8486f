package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine constants that tools/oracle_sharded.py's SRP-LSH
  * replay HARDCODES as Python/SQL literals (ADVICE r14: a change to
  * AnnOps.LshBucketCap / LshBands / BANDBITS / LshOcc or the embedding
  * dim would silently desync the sf10 sharded replay from the engine
  * and from the committed monolithic oracle, caught only by an
  * expensive --selfcheck re-run). This spec fails the same `sbt test`
  * that the constant change ships in, naming the literal to update. */
class ShardedOracleConstsSpec extends AnyFunSuite {

  private lazy val py: String = {
    val p = java.nio.file.Paths.get("tools/oracle_sharded.py")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("LSH_BUCKET_CAP literal matches AnnOps.LshBucketCap") {
    assert(py.contains(s"LSH_BUCKET_CAP = ${AnnOps.LshBucketCap}"),
      s"tools/oracle_sharded.py LSH_BUCKET_CAP != ${AnnOps.LshBucketCap}")
  }

  test("bit-width derivation matches bandBitsFor (occupancy + floor)") {
    // the DuckDB twin of bandBitsFor: greatest(<BANDBITS>, ...) over
    // ceil-division by LshOcc, spelled (count + (LshOcc-1)) // LshOcc
    val occ = AnnOps.LshOcc
    assert(py.contains(s"greatest(${AnnOps.BANDBITS}, CASE"),
      s"sharded replay's bit-width floor != BANDBITS=${AnnOps.BANDBITS}")
    assert(py.contains(s"+ ${occ - 1})//$occ"),
      s"sharded replay's occupancy divisor != LshOcc=$occ")
  }

  test("band count and plane dimension match the engine's signature pipeline") {
    assert(py.contains(s"range(0, ${AnnOps.LshBands} * nb)"),
      s"sharded replay's plane count != LshBands=${AnnOps.LshBands} * nb")
    // engine planes: transform(sequence(0, 63), ...) — 64 components
    assert(py.contains("range(0,64)"),
      "sharded replay's plane dim != the engine's 64 (AnnOps.lshBuckets sequence(0, 63))")
  }

  test("cosine threshold literal matches the gate's 0.4") {
    assert(py.contains("WHERE cos >= 0.4"),
      "sharded replay's cosine threshold != the gate's 0.4")
  }

  test("jaccard df cap and delta threshold match the engine (r16 jdelta family)") {
    assert(py.contains(s"JACCARD_DF_CAP = ${Dedup.JaccardDfCap}"),
      s"tools/oracle_sharded.py JACCARD_DF_CAP != ${Dedup.JaccardDfCap}")
    // the jdelta final pass replays dedup_jaccard_delta's 0.6 threshold
    assert(py.contains("(n1 + n2 - inter), 6) >= 0.6"),
      "sharded jdelta replay's jaccard threshold != the gate's 0.6")
  }

  test("winnow df cap literals match Dedup.WinnowDfCap (sharded replay + pysmoke)") {
    // the winnow sharded family computes its GLOBAL df cap inside the
    // posting pass; pysmoke's streaming_winnow_probe passes the cap to
    // fpProbeFor explicitly — both are Python-side literals
    assert(py.contains(s"HAVING count(*) <= ${Dedup.WinnowDfCap})"),
      s"tools/oracle_sharded.py winnow df cap != ${Dedup.WinnowDfCap}")
    val py2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/pysmoke.py")), "UTF-8")
    assert(py2.contains(s"sf_dir, ${Dedup.WinnowDfCap})"),
      s"tools/pysmoke.py fpProbeFor cap != ${Dedup.WinnowDfCap}")
  }
}
