package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the v2 streaming-offset codec: parse ∘ json is
  * the identity over arbitrary (run, batch) sets — dense runs, gappy
  * runs, runs whose names carry every separator the wire format uses
  * (raw ScalaCheck generators, seeded sampling — the
  * scalatest/scalacheck bridge isn't on the offline classpath). No
  * SparkSession needed: the codec is pure. */
class CommitLogOffsetPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // run ids exercise the URL-encoder surface: spaces, '%', the wire
  // separators ':' ';' ',' '|' '~', unicode — everything EXCEPT the
  // characters markerName itself forbids ('-', '/', ',', tab, newline)
  private val runChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '%', ':', ';', '|', '~', '.', '_', '+', 'é', '中'))
  private val runId: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, runChar).map(_.mkString))

  private val batchSet: Gen[Set[(String, Long)]] = for {
    nRuns <- Gen.choose(0, 4)
    runs <- Gen.listOfN(nRuns, runId)
    entries <- Gen.sequence[List[List[(String, Long)]], List[(String, Long)]](
      runs.map { r =>
        Gen.oneOf(
          // dense: one contiguous range
          for {
            lo <- Gen.choose(0L, 100L); n <- Gen.choose(1, 50)
          } yield (lo until lo + n).map(r -> _).toList,
          // gappy: arbitrary ids, including huge (ts-shaped) ones
          Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
            Gen.oneOf(Gen.choose(0L, 30L),
              Gen.choose(1700000000000L, 1700000001000L)))
            .map(_.map(r -> _))))
      })
  } yield entries.flatten.toSet

  test("parse(json) == identity over arbitrary read/covered sets") {
    for (seed <- 1 to 300) {
      val read = sample(batchSet, seed.toLong)
      val covered = sample(batchSet, 100000L + seed)
      val o = CommitLogStreamOffset(read, covered -- read)
      val parsed = CommitLogStreamOffset.parse(o.json())
      assert(parsed == o, s"seed $seed: ${o.json()}")
    }
  }

  test("cdc offset: parse(json) == identity over arbitrary state triples") {
    for (seed <- 1 to 300) {
      val entries = sample(batchSet, 200000L + seed)
      val retired = sample(batchSet, 300000L + seed)
      val tombs = (seed * 7) % 40
      val o = CommitLogChangesOffset(entries, retired, tombs)
      val parsed = CommitLogChangesOffset.parse(o.json())
      assert(parsed == o, s"seed $seed: ${o.json()}")
    }
  }

  test("dense runs stay O(runs): json length independent of batch count") {
    def dense(runs: Int, n: Int) = CommitLogStreamOffset(
      (0 until runs).flatMap(r =>
        (0 until n).map(b => (s"run$r", b.toLong))).toSet, Set.empty)
    val len100 = dense(3, 100).json().length
    val len100k = dense(3, 100000).json().length
    assert(len100k <= len100 + 9,
      s"1000x batches must cost only the digits: $len100 vs $len100k")
  }
}
