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

  /** Within-document repetition features (the Gopher repetition filters,
    * Rae et al. 2021 §A1.1, restated over word n-grams): per document the
    * overlapping-n-gram count, the fraction of n-gram slots taken by the
    * single most frequent n-gram (`top_ngram_frac`), and the fraction taken
    * by any n-gram occurring more than once (`dup_ngram_frac`). High values
    * flag boilerplate / degenerate repetition for pretraining filtering.
    *
    * Shape: explode n-grams → two map-side-combinable aggregations keyed by
    * (doc, gram) then doc — one shuffle each, no doc-local quadratic work,
    * no UDF. Documents with fewer than n tokens report 0 slots and 0.0
    * fractions.
    *
    * @return (idCol, n_ngrams, top_ngram_frac, dup_ngram_frac) rows, 4dp.
    */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val grams = df.select(col(idCol).as("__id"),
      explode(shingleCol(col(textCol), n)).as("s"))
    val perGram = grams.groupBy("__id", "s").agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy("__id").agg(
      sum(col("c")).as("tot"),
      max(col("c")).as("topc"),
      sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dupc"))
    df.select(col(idCol)).distinct()
      .join(perDoc, col(idCol) === col("__id"), "left")
      .select(
        col(idCol),
        coalesce(col("tot"), lit(0L)).as("n_ngrams"),
        round(when(col("tot") > 0, col("topc").cast("double") / col("tot"))
          .otherwise(lit(0.0)), 4).as("top_ngram_frac"),
        round(when(col("tot") > 0, col("dupc").cast("double") / col("tot"))
          .otherwise(lit(0.0)), 4).as("dup_ngram_frac"))
  }

  /** Corpus-unigram language-model document score (the cheap CCNet-style
    * typicality proxy used for pretraining data selection): mean over the
    * document's tokens of ln(tf_corpus(token) / total_corpus_tokens).
    * Closer to 0 = built from common corpus vocabulary; very negative =
    * rare-token-heavy. Two aggregations (corpus tf, per-doc mean) and one
    * token-keyed equi-join — every stage shuffles on a key the data is
    * already fine-grained in (term, doc), so skew is bounded by the hottest
    * term, the same profile the index build already salts for.
    *
    * @return (idCol, n_tokens, avg_logprob) rows, 4dp.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(Tokenize.termsCol(col(textCol))).as("term"))
    val tf = toks.groupBy("term").agg(count(lit(1)).as("ctf"))
    // one scalar to the driver (the LM's normalizer) — bounded at any scale
    val totRow = tf.agg(sum(col("ctf"))).collect()(0)
    val totalTokens = if (totRow.isNullAt(0)) 1L else totRow.getLong(0)
    toks.join(tf, "term")
      .groupBy("__id").agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("ctf").cast("double") / lit(totalTokens.toDouble))), 4)
          .as("avg_logprob"))
      .select(col("__id").as(idCol), col("n_tokens"), col("avg_logprob"))
  }

  /** Corpus-bigram language-model document score — the next step up from
    * [[unigramLogProb]] for perplexity-style data selection: mean over the
    * document's bigram occurrences of ln p̂(w₂|w₁), with the conditional
    * estimated from the corpus itself (c(w₁w₂) / c(w₁·), where c(w₁·)
    * counts bigrams STARTING with w₁ — every observed bigram therefore has
    * p̂ > 0, no smoothing needed for self-scoring). Bigrams never cross a
    * row boundary (a turn is the sequence unit), so the feature is
    * well-defined under any row order.
    *
    * Shape at scale: the bigram list is a per-row codegen transform (no
    * shuffle to FORM sequences), then two combinable count aggregations and
    * two bigram-keyed joins — the same bounded-skew profile as
    * [[unigramLogProb]].
    *
    * @return (idCol, n_bigrams, avg_logprob) rows, 4dp.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = Tokenize.termsCol(col(textCol))
    // rows with < 2 tokens form no bigrams: the guard keeps sequence() from
    // running descending (Spark's sequence(1, 0) = [1, 0]), and explode
    // drops the null array
    val bg = df.select(col(idCol).as("__id"),
        explode(when(size(t) >= 2, transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2")))))
          .as("__b"))
      .select(col("__id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("__c1"))
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("__id").agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("__c12").cast("double") / col("__c1"))), 4)
          .as("avg_logprob"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("avg_logprob"))
  }

  /** Top-k PMI term pairs (corpus collocation mining): for terms whose
    * document frequency lies in [minDf, maxDf], the pointwise mutual
    * information of document-level co-occurrence —
    * ln( n₁₂ · N / (n₁ · n₂) ) over pairs with n₁₂ ≥ minPair — ranked
    * PMI desc (ties lexicographic). The df window is the scale contract:
    * maxDf excludes stopword-grade terms, so the per-document pair
    * expansion is bounded by the number of MID-FREQUENCY terms a document
    * carries, never its full vocabulary; the pair join itself is conv-keyed
    * (co-occurrence is an equi-join on the document, not an all-pairs scan
    * over the vocabulary).
    *
    * @return (t1, t2, n_pair, pmi) — k rows, pmi rounded 4dp.
    */
  def pmiPairs(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long, minPair: Long, k: Int): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf && minPair >= 1 && k >= 1,
      "bounds must be positive and ordered")
    val toks = df.select(col(idCol).as("__id"),
      explode(Tokenize.termsCol(col(textCol))).as("term")).distinct()
    val dfs = toks.groupBy("term").agg(count(lit(1)).as("__df"))
      .where(col("__df").between(minDf, maxDf))
    val kept = toks.join(dfs, "term")
    val nDocs = df.select(col(idCol)).distinct().count().toDouble
    val pairs = kept.select(col("__id"), col("term").as("t1"), col("__df").as("__d1"))
      .join(kept.select(col("__id"), col("term").as("t2"), col("__df").as("__d2")),
        Seq("__id"))
      .where(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("n_pair"),
        max(col("__d1")).as("__d1"), max(col("__d2")).as("__d2"))
      .where(col("n_pair") >= minPair)
      .withColumn("__pmi",
        log(col("n_pair") * lit(nDocs) / (col("__d1") * col("__d2"))))
    pairs.orderBy(col("__pmi").desc, col("t1").asc, col("t2").asc).limit(k)
      .select(col("t1"), col("t2"), col("n_pair"), round(col("__pmi"), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)
  }

  /** Composite quality gate (the Gopher-rule keep/drop step, Rae et al.
    * 2021 §A1.1): a document survives iff it passes EVERY cheap filter —
    * token-count bounds, stopword-ratio ceiling (low stopword density flags
    * non-prose), and the §A1.1 repetition ceilings on top-bigram and
    * duplicate-bigram fractions. Thresholds compare against the features'
    * 4dp-rounded presentation values (what [[qualityFeatures]] /
    * [[repetitionFeatures]] publish), so an audit of the gate against the
    * feature tables is exact.
    *
    * Shape at scale: the stopword/length legs are pure codegen projections;
    * the repetition legs reuse [[repetitionFeatures]]'s two combinable
    * aggregations; one id-keyed join fuses them. No collect, no UDF.
    *
    * @return (idCol) rows — the surviving documents.
    */
  def qualityGate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long, maxStopwordRatio: Double,
      maxTopBigramFrac: Double, maxDupBigramFrac: Double): DataFrame = {
    val q = qualityFeatures(df, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("stopword_ratio"))
    val rep = repetitionFeatures(df, idCol, textCol, 2)
      .select(col(idCol), col("top_ngram_frac"), col("dup_ngram_frac"))
    q.join(rep, idCol)
      .where(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
        col("stopword_ratio") <= maxStopwordRatio &&
        col("top_ngram_frac") <= maxTopBigramFrac &&
        col("dup_ngram_frac") <= maxDupBigramFrac)
      .select(col(idCol))
  }

  /** Canonical text normalization (the first step of most dedup/quality
    * pipelines): lowercase, every non-alphanumeric run collapsed to one
    * space, trimmed. Plain character classes so Java and RE2-family
    * engines agree; pure codegen projection — no shuffle, scales linearly.
    */
  def normalizeCol(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Email-address pattern shared by the redaction pass and its oracle —
    * character classes + bounded quantifiers only, identical semantics
    * under java.util.regex and RE2.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** North-American-style phone pattern: 3-3-4 digit groups with `-`/`.`/
    * space separators, optional area-code parens. Anchored by \\b so digit
    * runs inside longer numbers don't half-match.
    */
  val PhonePattern = "\\(?\\b[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII redaction (the standard pre-training scrub): emails → `<EMAIL>`,
    * phone numbers → `<PHONE>`, with per-document match counts for audit
    * sampling. Counts are taken BEFORE redaction (regexp_count on the raw
    * text), emails redact first so a phone-looking digit run inside an
    * address can't double-fire. Whole-stage codegen projection — no UDF,
    * no shuffle; at 100 TB this is a pure map over the scan.
    *
    * @return (idCol, redacted, n_emails, n_phones) rows.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(t, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("redacted"),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhonePattern)).cast("long").as("n_phones"))
  }

  /** Token-window chunking (the training-data "split long documents into
    * model-context pieces" step): windows of `window` tokens starting every
    * `stride` tokens — `stride < window` gives overlapping chunks, `stride
    * == window` a partition. Chunk offsets are 0, stride, 2·stride, …
    * strictly below the document's token count; the final chunk may be
    * short (`min(window, n − off)` tokens). Empty documents produce no
    * chunks. The chunk content rides out as an md5 over the
    * space-rejoined tokens, so row width stays bounded no matter the
    * window.
    *
    * Shape at scale: tokenize → one generator explode per document (output
    * rows ≈ n/stride, data-proportional) → codegen projections; no shuffle,
    * no UDF, no driver state — a pure flatMap over the scan.
    *
    * @return (idCol, chunk_idx, off, n_tokens, chunk_hash) rows.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1, "stride must be >= 1")
    val toksDf = df.select(col(idCol), Tokenize.termsCol(col(textCol)).as("__toks"))
    toksDf
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - 1, lit(stride))).as("off"))
      .select(
        col(idCol),
        (col("off") / stride).cast("int").as("chunk_idx"),
        col("off"),
        slice(col("__toks"), col("off") + 1, lit(window)).as("__chunk"))
      .select(
        col(idCol), col("chunk_idx"), col("off"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_hash"))
  }

  /** Transcript well-formedness validation — the data-quality gate a
    * conversation corpus needs before training on it: per conversation,
    * whether turn indexes are dense 0..n−1 (no holes, no duplicates — the
    * "stable turn ordering" invariant every downstream op assumes), whether
    * roles strictly alternate (no dropped or doubled speaker turns), and
    * whether any turn tokenizes to nothing (empty/whitespace text). Shape
    * at scale: one bounded per-conversation window (turn counts are small
    * by construction) + one combinable aggregation — no collect, no skew
    * risk beyond the longest conversation.
    *
    * @return (conv_id, n_turns, dense_idx, roles_alternate, has_empty_turn)
    *         — one row per conversation.
    */
  def validateTranscripts(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("__i"))
    turns
      .select(col(convCol).as("conv_id"), col(idxCol).as("__i"),
        col(roleCol).as("__r"),
        (size(Tokenize.termsCol(col(textCol))) === 0).as("__empty"))
      .withColumn("__pr", lag(col("__r"), 1).over(w))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (min(col("__i")) === 0 &&
          max(col("__i")).cast("long") === count(lit(1)) - 1 &&
          countDistinct(col("__i")) === count(lit(1))).as("dense_idx"),
        (sum(when(col("__pr") === col("__r"), 1L).otherwise(0L)) === 0)
          .as("roles_alternate"),
        (sum(when(col("__empty"), 1L).otherwise(0L)) > 0).as("has_empty_turn"))
  }

  /** Adjacent-turn transition counts (the role→role / tool→tool Markov
    * matrix of a transcript corpus — agent-behavior mining: "how often does
    * a tool call follow a user turn?"): for every conversation, count each
    * (value at turn i, value at turn i+1) pair under the stable
    * (conv_id, turn_idx) order, folded corpus-wide. Shape at scale: one
    * bounded per-conversation window (same lag shape [[validateTranscripts]]
    * uses — turn counts are small by construction) + one combinable fold;
    * no self-join, nothing driver-side.
    *
    * @return (from_v, to_v, n), n desc then pair asc — deterministic.
    */
  def turnTransitions(turns: DataFrame, convCol: String, idxCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__c")).orderBy(col("__i"))
    turns
      .select(col(convCol).as("__c"), col(idxCol).as("__i"),
        col(valueCol).cast("string").as("to_v"))
      .withColumn("from_v", lag(col("to_v"), 1).over(w))
      .where(col("from_v").isNotNull)
      .groupBy("from_v", "to_v").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_v").asc, col("to_v").asc)
  }

  /** T5-style span corruption (the denoising-objective data generator):
    * each document's token stream is deterministically corrupted — a token
    * at position p is selected when the first hex digit of
    * md5("docId:p") is '0' or '1' (rate 2/16 = 12.5%, the T5 ballpark),
    * consecutive selected tokens MERGE into one span, the input replaces
    * each span with an ordinal sentinel `<extra_id_k>`, and the target is
    * the span contents prefixed by their sentinels plus the closing
    * `<extra_id_n>` (the T5 convention). The seeded hash stands in for the
    * usual RNG so the corruption is reproducible across engines and runs —
    * swap the digit set for a different rate. Documents where nothing is
    * selected keep input = text and get an empty target.
    *
    * Shape at scale: a ZERO-shuffle single-pass projection — the token
    * list never leaves its row; one `aggregate` higher-order fold carries
    * (input pieces, target pieces, next sentinel ordinal, in-island flag)
    * across the tokens, so island grouping, sentinel numbering, and both
    * output strings fall out of one linear scan per document. No explode,
    * no window, no UDF: the whole operator is a per-row expression the
    * scan pipeline evaluates in place, which is the shape that survives
    * 100 TB (corpus passes: exactly one).
    *
    * @return (doc_id, input, target) rows.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        // native tokenizer (same non-empty-runs result as the former
        // filter(split(...)) HOF — TokenizerSpec-pinned semantics)
        Tokenize.termsCol(col(textCol)).as("__toks"))
      .withColumn("__tm", expr(
        "transform(__toks, (x, i) -> named_struct('tok', x, 'm'," +
          " substring(md5(concat(CAST(doc_id AS STRING), ':'," +
          " CAST(i AS STRING))), 1, 1) IN ('0', '1')))"))
      .withColumn("__acc", expr(
        """aggregate(__tm,
          named_struct('inp', CAST(array() AS ARRAY<STRING>),
                       'tgt', CAST(array() AS ARRAY<STRING>),
                       'k', 0, 'pm', false),
          (a, t) -> CASE
            WHEN NOT t.m THEN named_struct(
              'inp', array_append(a.inp, t.tok), 'tgt', a.tgt,
              'k', a.k, 'pm', false)
            WHEN a.pm THEN named_struct(
              'inp', a.inp, 'tgt', array_append(a.tgt, t.tok),
              'k', a.k, 'pm', true)
            ELSE named_struct(
              'inp', array_append(a.inp,
                concat('<extra_id_', CAST(a.k AS STRING), '>')),
              'tgt', array_append(array_append(a.tgt,
                concat('<extra_id_', CAST(a.k AS STRING), '>')), t.tok),
              'k', a.k + 1, 'pm', true) END,
          a -> named_struct(
            'input', array_join(a.inp, ' '),
            'target', CASE WHEN a.k > 0
              THEN concat(array_join(a.tgt, ' '),
                ' <extra_id_', CAST(a.k AS STRING), '>')
              ELSE '' END))"""))
      .select(col("doc_id"), col("__acc.input").as("input"),
        col("__acc.target").as("target"))

  /** Fill-in-the-middle transformation (the FIM / PSM objective used for
    * code-model training — Bavarian et al.; StarCoder's sentinel layout):
    * each document's token stream is split at two deterministic cut points
    * into prefix / middle / suffix and re-serialized as
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` so the model learns to
    * infill. Cut points derive from md5(docId ‖ ":fim1"/":fim2") —
    * c1 uniform on [0, n], c2 uniform on [c1, n] — the seeded-hash stand-in
    * for the usual RNG, replayable in SQL. Empty slices are legal (adjacent
    * sentinels); n_middle carries the middle length for length-bucketed
    * batching downstream.
    *
    * Shape at scale: like [[spanCorrupt]], a zero-shuffle single-pass
    * projection — two hashes, three list slices, one join, all inside the
    * row.
    *
    * @return (doc_id, psm, n_middle) rows.
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        // native tokenizer (same non-empty-runs result as the former
        // filter(split(...)) HOF — TokenizerSpec-pinned semantics)
        Tokenize.termsCol(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__h1", expr("CAST(conv(substring(md5(concat(" +
        "CAST(doc_id AS STRING), ':fim1')), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("__h2", expr("CAST(conv(substring(md5(concat(" +
        "CAST(doc_id AS STRING), ':fim2')), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("__c1", (col("__h1") % (col("__n") + 1)).cast("int"))
      .withColumn("__c2", (col("__c1") +
        col("__h2") % (col("__n") - col("__c1") + 1)).cast("int"))
      .select(col("doc_id"),
        expr("array_join(concat(" +
          "array('<fim_prefix>'), slice(__toks, 1, __c1), " +
          "array('<fim_suffix>'), slice(__toks, __c2 + 1, __n - __c2), " +
          "array('<fim_middle>'), slice(__toks, __c1 + 1, __c2 - __c1)" +
          "), ' ')").as("psm"),
        (col("__c2") - col("__c1")).cast("long").as("n_middle"))

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
