package killa

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import killa.codec.{Delta, Varint}

class CodecSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("varint roundtrip on non-negative longs") {
    samples(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue)), 100).foreach { vs =>
      val arr = vs.toArray
      assert(Varint.decode(Varint.encode(arr), arr.length).sameElements(arr))
    }
  }

  test("varint boundaries") {
    val edges = Array(0L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue)
    assert(Varint.decode(Varint.encode(edges), edges.length).sameElements(edges))
  }

  test("delta roundtrip on strictly ascending sequences") {
    samples(Gen.listOf(Gen.chooseNum(1L, 1000000L)), 100).foreach { gaps =>
      val asc = gaps.scanLeft(0L)(_ + _).tail.toArray
      assert(Delta.decode(Delta.encode(asc), asc.length).sameElements(asc))
    }
  }

  test("delta rejects non-ascending input") {
    intercept[IllegalArgumentException] { Delta.encode(Array(5L, 5L)) }
    intercept[IllegalArgumentException] { Delta.encode(Array(5L, 3L)) }
  }

  test("compression is effective on dense docId runs") {
    val dense = Array.tabulate(10000)(i => i.toLong * 2)
    assert(Delta.encode(dense).length < 10000 * 2)
  }
}
