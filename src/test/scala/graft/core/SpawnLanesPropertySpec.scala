package graft.core

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (fixed seeds, reproducible) for the round-10
  * primitives: the spawner-KVS marshaling is a byte-exact bijection on
  * arbitrary binary pairs, lane conflict is a reflexive/symmetric
  * relation that equals the dotted-prefix definition, and the locality
  * assignment keeps every file on its own host's ring with level
  * round-robin loads for arbitrary (size, host) catalogs. */
class SpawnLanesPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- SpawnerKvs framing ----

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  private val kvListGen: Gen[List[(Array[Byte], Array[Byte])]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.zip(bytesGen, bytesGen)))

  test("marshal → unmarshal is the identity on arbitrary binary pairs, " +
      "including empty keys/values and the empty KVS") {
    samples(kvListGen, 12).foreach { pairs =>
      val bos = new java.io.ByteArrayOutputStream()
      SpawnerKvs.marshal(bos, pairs.iterator)
      val back = SpawnerKvs.unmarshal(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(back.length == pairs.length)
      back.zip(pairs).foreach { case ((k1, v1), (k2, v2)) =>
        assert(java.util.Arrays.equals(k1, k2) && java.util.Arrays.equals(v1, v2))
      }
    }
  }

  test("any strict prefix of a marshaled stream is rejected (no " +
      "truncation passes as a smaller KVS)") {
    samples(kvListGen.suchThat(_.nonEmpty), 6).foreach { pairs =>
      val bos = new java.io.ByteArrayOutputStream()
      SpawnerKvs.marshal(bos, pairs.iterator)
      val full = bos.toByteArray
      // chop anywhere after the magic but before the end: must throw
      Seq(full.length / 2, full.length - 1, 5).filter(_ >= 4).foreach { cut =>
        intercept[Exception] {
          SpawnerKvs.unmarshal(new java.io.ByteArrayInputStream(full.take(cut)))
        }
      }
    }
  }

  // ---- Lanes conflict relation ----

  private val laneGen: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(lv =>
      Gen.listOfN(lv, Gen.chooseNum(0, 3)).map(_.mkString(".")))

  test("lane conflict is reflexive, symmetric, and exactly the " +
      "dotted-level prefix relation") {
    val lanes = samples(laneGen, 40)
    lanes.foreach(l => assert(Lanes.conflicts(l, l)))
    for (a <- lanes; b <- lanes) {
      assert(Lanes.conflicts(a, b) == Lanes.conflicts(b, a))
      val as = a.split('.'); val bs = b.split('.')
      val n = math.min(as.length, bs.length)
      val prefixRelated = as.take(n).sameElements(bs.take(n))
      assert(Lanes.conflicts(a, b) == prefixRelated,
        s"conflicts($a,$b) != level-prefix relation")
    }
  }

  // ---- Locality assignment invariants ----

  private val catalogGen: Gen[List[(Long, Int)]] = // (size, host)
    Gen.chooseNum(1, 80).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 10000L), Gen.chooseNum(0, 6))))

  test("assignByHost keeps every file on its host's ring with level " +
      "per-host loads, for arbitrary catalogs (nHosts <= nRanks)") {
    import graft.sources.Locality
    samples(catalogGen, 6).foreach { cat =>
      import spark.implicits._
      val files = cat.zipWithIndex
        .map { case ((sz, h), i) => (f"f$i%04d", sz, h) }
        .toDF("file", "size", "host_idx")
      val nRanks = 10; val nHosts = 7
      val out = Locality.assignByHost(files, nRanks, nHosts).collect()
      assert(out.length == cat.length)
      out.foreach { r =>
        val (h, rank) = (r.getInt(1), r.getInt(2))
        assert(rank % nHosts == h && rank < nRanks,
          s"${r.getString(0)}: rank $rank off host $h's ring")
      }
      out.groupBy(_.getInt(1)).foreach { case (_, fs) =>
        val loads = fs.groupBy(_.getInt(2)).map(_._2.length)
        assert(loads.max - loads.min <= 1)
      }
    }
  }
}
