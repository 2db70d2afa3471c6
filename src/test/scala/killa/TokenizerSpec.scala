package killa

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import killa.tokenize.{Tokenize, WhitespaceTokenizer}

/** Golden truth table ported verbatim from the reference
  * (ElasticKilla.Tests/TokenizerTests/WhitespaceTokenizerTests.cs:12-18),
  * plus a property proving the codegen column path (Tokenize.termsCol) always
  * agrees with the Scala tokenizer.
  */
class TokenizerSpec extends AnyFunSuite {

  test("reference truth table (WhitespaceTokenizerTests.cs:12-18)") {
    assert(WhitespaceTokenizer.tokenize(null).isEmpty)
    assert(WhitespaceTokenizer.tokenize("").isEmpty)
    assert(WhitespaceTokenizer.tokenize("aaa").sameElements(Array("aaa")))
    assert(WhitespaceTokenizer.tokenize("aaa.").sameElements(Array("aaa.")))
    assert(WhitespaceTokenizer.tokenize("a. b").sameElements(Array("a.", "b")))
    assert(WhitespaceTokenizer.tokenize("a . b").sameElements(Array("a", ".", "b")))
  }

  test("case-sensitive, punctuation kept, tabs/newlines NOT separators") {
    assert(WhitespaceTokenizer.tokenize("Ab aB").sameElements(Array("Ab", "aB")))
    assert(WhitespaceTokenizer.tokenize("a\tb").sameElements(Array("a\tb")))
    assert(WhitespaceTokenizer.tokenize("  a  b ").sameElements(Array("a", "b")))
  }

  test("column path ≡ scala path on arbitrary strings") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("."),
      Gen.const("a b"), Gen.const("  "), Gen.const("\t")))
      .map(_.mkString)
    val samples = (0 until 200)
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i))) ++
      Seq("", " ", "a . b", "aaa.",
        // unicode: multi-byte sequences must survive the byte-level scan
        "héllo wörld", "日本語 テスト", " ü ", "emoji 👍 mix", "日 本", "👍👍 👍")
    val got = samples.toDF("text")
      .select(Tokenize.termsCol(org.apache.spark.sql.functions.col("text")).as("terms"))
      .collect().map(_.getSeq[String](0).toArray)
    samples.zip(got).foreach { case (s, viaCol) =>
      assert(viaCol.sameElements(WhitespaceTokenizer.tokenize(s)), s"input=<$s>")
    }
  }
}
