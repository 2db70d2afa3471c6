package killa.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable tokenizer, mirroring the reference's extension point
  * (ElasticKilla.Core/Tokenizer/ITokenizer.cs:5-8, injected at
  * FileAnalyzer.cs:356).
  */
trait Tokenizer extends Serializable {
  def tokenize(s: String): Array[String]
}

/** Reference-identical whitespace tokenization
  * (ElasticKilla.Core/Tokenizer/WhitespaceTokenizer.cs:8-10): split on the
  * single space character, drop empty entries, keep punctuation,
  * case-sensitive; null/"" → []. Pinned by the truth table in
  * WhitespaceTokenizerTests.cs:12-18 (ported verbatim in TokenizerSpec).
  */
object WhitespaceTokenizer extends Tokenizer {
  override def tokenize(s: String): Array[String] =
    if (s == null || s.isEmpty) Array.empty[String]
    else s.split(" ").filter(_.nonEmpty)
}

/** Column-level equivalent of WhitespaceTokenizer for the hot index-build
  * path — a native codegen expression ([[killa.expr.WsTokens]]): the former
  * `filter(split(text, " ", -1), length > 0)` form went through the `filter`
  * higher-order function, which is CodegenFallback (interpreted per token,
  * boxed lambda variables) on the per-row hot loop of every build wave.
  * Semantics proven equal to WhitespaceTokenizer.tokenize by a ScalaCheck
  * property (TokenizerSpec), unicode cases included.
  */
object Tokenize {
  /** array<string> of non-empty space-separated tokens; null text → null
    * (explode then yields no rows, matching "null line contributes nothing").
    */
  def termsCol(text: Column): Column = killa.expr.WsTokens.tokensCol(text)
}
