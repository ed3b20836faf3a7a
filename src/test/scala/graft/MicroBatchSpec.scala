package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.MicroBatch

/** P12 slice math — exact port of the reference's deterministic feed
  * (`src/news_nlp/ingestion/simulated_ingestion.py:49-82`), property-based.
  */
class MicroBatchSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("sliceBounds invariants: 0 ≤ start ≤ end ≤ total; size ≤ batch size") {
    val gen = for {
      total <- Gen.choose(0L, 10000L)
      fraction <- Gen.choose(1e-4, 1.0)
      runIdx <- Gen.choose(0L, 500L)
      loop <- Gen.oneOf(true, false)
    } yield (total, fraction, runIdx, loop)
    check(Prop.forAll(gen) { case (total, fraction, runIdx, loop) =>
      val (s, e) = MicroBatch.sliceBounds(total, fraction, runIdx, loop)
      val bs = math.max(1L, math.ceil(total * fraction).toLong)
      s >= 0 && s <= e && e <= total && (e - s) <= bs
    })
  }

  test("loop=true wraps modulo num_batches and is never empty for total>0") {
    val gen = for {
      total <- Gen.choose(1L, 10000L)
      fraction <- Gen.choose(1e-4, 1.0)
      runIdx <- Gen.choose(0L, 500L)
    } yield (total, fraction, runIdx)
    check(Prop.forAll(gen) { case (total, fraction, runIdx) =>
      val bs = math.max(1L, math.ceil(total * fraction).toLong)
      val nb = math.ceil(total.toDouble / bs).toLong
      val wrapped = MicroBatch.sliceBounds(total, fraction, runIdx, loop = true)
      val direct = MicroBatch.sliceBounds(total, fraction, runIdx % nb, loop = false)
      wrapped == direct && wrapped._2 > wrapped._1
    })
  }

  test("loop=false: consecutive slices exactly tile [0, total), then exhaust") {
    val gen = for {
      total <- Gen.choose(1L, 2000L)
      fraction <- Gen.choose(1e-3, 1.0)
    } yield (total, fraction)
    check(Prop.forAll(gen) { case (total, fraction) =>
      val bs = math.max(1L, math.ceil(total * fraction).toLong)
      val nb = math.ceil(total.toDouble / bs).toLong
      val slices = (0L until nb).map(i => MicroBatch.sliceBounds(total, fraction, i, loop = false))
      val tiles = slices.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => e1 == s2
        case _ => true
      }
      tiles && slices.head._1 == 0L && slices.last._2 == total &&
        MicroBatch.sliceBounds(total, fraction, nb, loop = false) == ((0L, 0L))
    })
  }

  test("reference constants: 1% of 10072 rows → batch 101, 100 batches, wraps at 100") {
    assert(MicroBatch.sliceBounds(10072L, 0.01, 0L, loop = true) === ((0L, 101L)))
    assert(MicroBatch.sliceBounds(10072L, 0.01, 99L, loop = true) === ((9999L, 10072L)))
    assert(MicroBatch.sliceBounds(10072L, 0.01, 100L, loop = true) === ((0L, 101L)))
  }

  test("runIndex = floor(Δ/period), negative before start") {
    assert(MicroBatch.runIndex(1000L, 1000L, 600L) === 0L)
    assert(MicroBatch.runIndex(1000L, 1599L, 600L) === 0L)
    assert(MicroBatch.runIndex(1000L, 1600L, 600L) === 1L)
    assert(MicroBatch.runIndex(1000L, 400L, 600L) === -1L)
  }

  test("distributed slice selects exactly [start, end) in orderCol order") {
    import spark.implicits._
    val df = (0L until 100L).map(i => 99L - i).toDF("id") // unsorted input
    val got = MicroBatch.slice(df, "id", fraction = 0.1, runIdx = 3, loop = false)
      .as[Long].collect().sorted.toSeq
    assert(got === (30L until 40L).toSeq)
  }

  test("slice is invariant to input partitioning (range-shuffle determinism)") {
    import spark.implicits._
    val base = (0L until 5000L).map(i => graft.util.Hashing.splitmix64(i)).toDF("k")
    for (parts <- Seq(1, 3, 32)) {
      val df = base.repartition(parts)
      val got = MicroBatch.slice(df, "k", fraction = 0.013, runIdx = 4, loop = true)
        .as[Long].collect().sorted.toSeq
      val expect = (0L until 5000L).map(graft.util.Hashing.splitmix64).sorted
        .slice(65 * 4, 65 * 5).toSeq // batch = ceil(5000*0.013) = 65
      assert(got === expect, s"parts=$parts")
    }
  }
}
