package killa.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import killa.tokenize.Tokenize

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, fingerprinting,
  * shingling. All column-level (whole-stage codegen) — no UDFs on the hot
  * path — and deterministic.
  */
object TextOps {

  /** BPE-ish pre-tokenization pattern: letter runs, digit runs, single
    * punctuation marks (the shape GPT-style byte-pair pre-splits use).
    * Plain character classes only, so Java and RE2-family engines (the
    * DuckDB oracle) agree.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Whitespace token count (reference tokenizer semantics). Long for
    * dtype parity with SQL oracles (count functions are BIGINT there).
    */
  def wsTokenCount(text: Column): Column =
    coalesce(size(Tokenize.termsCol(text)), lit(0)).cast("long")

  /** BPE-ish token count via regexp extraction. */
  def bpeishTokenCount(text: Column): Column =
    coalesce(size(regexp_extract_all(text, lit(BpeishPattern), lit(0))), lit(0)).cast("long")

  /** Word n-gram shingles (ordered, space-joined); < n tokens → empty. */
  def shingleCol(text: Column, n: Int): Column = {
    val toks = Tokenize.termsCol(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality-scoring features: length, token stats, punctuation ratio,
    * stopword ratio — the standard cheap filters a pretraining pipeline runs
    * over every document.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "it", "for", "on", "with", "as")

  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = Tokenize.termsCol(text)
    val nToks = coalesce(size(toks), lit(0))
    val stops = filter(toks, t => t.isInCollection(Stopwords))
    df.select(
      col(idCol),
      length(coalesce(text, lit(""))).cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      round(when(nToks > 0,
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks)
        .otherwise(lit(0.0)), 4).as("avg_token_len"),
      round(when(length(text) > 0,
        length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text))
        .otherwise(lit(0.0)), 4).as("punct_ratio"),
      round(when(nToks > 0, coalesce(size(stops), lit(0)).cast("double") / nToks)
        .otherwise(lit(0.0)), 4).as("stopword_ratio"))
  }

  /** Language-ID heuristic: marker-stopword hit counts per language,
    * argmax with a fixed priority tie-break. A real deployment swaps in a
    * character-n-gram profile model; the operator shape (per-doc scoring →
    * argmax, fully codegen'd) is what matters at 100 TB.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "que", "los", "una", "por"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "une"))

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Tokenize.termsCol(lower(col(textCol)))
    // long for dtype parity with the SQL oracle (DuckDB len() is BIGINT)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> coalesce(size(filter(toks, t => t.isInCollection(markers))), lit(0)).cast("long")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declared priority order) reaching the max wins;
    // zero hits → "und" (undetermined)
    val pred = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    // foldRight gives en > de > es > fr priority (en checked first)
    df.select(Seq(col(idCol), pred.as("lang_pred")) ++
      scores.map { case (l, s) => s.as(s"hits_$l") }: _*)
  }

  /** Content fingerprint: md5 over the normalized (tokenized, re-joined)
    * text — whitespace-insensitive exact-dup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", Tokenize.termsCol(text)))

  /** 64-bit Rabin-Karp rolling hash over a token sequence (pure Scala; used
    * by simhash/minhash internals and available as a cheap shift-resistant
    * document fingerprint).
    */
  def rollingHash(tokens: Seq[String]): Long = {
    var h = 0xcbf29ce484222325L
    tokens.foreach { t =>
      h = h * 0x100000001b3L + killa.util.Hashing.fnv1a64(t)
    }
    h
  }
}
