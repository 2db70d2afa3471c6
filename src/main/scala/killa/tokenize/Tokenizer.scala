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

/** Column-level (whole-stage-codegen'd) equivalent of WhitespaceTokenizer for
  * the hot index-build path: split + higher-order filter stay inside codegen,
  * no UDF. Semantics proven equal to WhitespaceTokenizer.tokenize by a
  * ScalaCheck property (TokenizerSpec).
  */
object Tokenize {
  /** array<string> of non-empty space-separated tokens; null text → null
    * (explode then yields no rows, matching "null line contributes nothing").
    */
  def termsCol(text: Column): Column =
    filter(split(text, " ", -1), t => length(t) > 0)
}
