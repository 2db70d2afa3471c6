package killa.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import killa.tokenize.Tokenize

/** Distributed BPE tokenizer-vocabulary induction — the training-data
  * pipeline step that LEARNS the subword merges token counting assumes
  * (Sennrich et al. 2016; the trainer behind GPT-2/Llama-style vocabs).
  *
  * Scale story: ONE corpus pass builds the distinct-word count table
  * ([[wordCounts]] — one combinable shuffle); every merge round after that
  * touches only the VOCAB table, which is orders of magnitude smaller than
  * the corpus (10^8 distinct words vs 10^12 docs), with:
  *  - pair counting as a map-side-combinable groupBy over exploded adjacent
  *    symbol pairs,
  *  - argmax as a bounded 1-row collect (count desc, pair asc — total order,
  *    so the learned merge list is deterministic at any parallelism),
  *  - merge application as a narrow per-row higher-order fold (no UDF, no
  *    shuffle), left-to-right non-overlapping exactly like the reference
  *    BPE ("aaa" + merge a·a → "aa","a"),
  *  - `localCheckpoint` per round so plan lineage stays O(1), not O(merges).
  */
object Bpe {

  /** Distinct-word count table: (word, cnt). The one corpus-sized pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Tokenize.termsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Character-split symbol column: "hello" → ["h","e","l","l","o"]. */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent symbol pairs weighted by word count: (lhs, rhs, cnt rows). */
  private def pairRows(words: DataFrame): DataFrame =
    words.where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2), i =>
          struct(element_at(col("syms"), i + 1).as("lhs"),
            element_at(col("syms"), i + 2).as("rhs")))).as("p"))
      .select(col("p.lhs"), col("p.rhs"), col("cnt"))

  /** Top-k first-round merge candidates: adjacent CHARACTER pair counts over
    * the corpus, weighted by word frequency (every occurrence in a word
    * counts, so "aaa" contributes (a,a) twice per occurrence). Total order
    * (freq desc, lhs asc, rhs asc) so the k-cut is deterministic.
    * @return (lhs, rhs, freq) — k rows.
    */
  def topPairs(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = wordCounts(df, textCol)
      .select(col("word"), col("cnt"), charSyms(col("word")).as("syms"))
    pairRows(words)
      .groupBy("lhs", "rhs").agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
      .limit(k)
  }

  /** Apply one merge (l, r) → l+r to a symbol array, left-to-right
    * non-overlapping, as a codegen'd higher-order fold — after "a","a"
    * merges, the merged "aa" symbol cannot chain into the next "a".
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` BPE merges over the corpus. Each round: count adjacent
    * symbol pairs (weighted by word frequency), take the single most
    * frequent pair (ties lhs asc, rhs asc), fuse it in every word. Stops
    * early if no pair remains (fully merged vocabulary).
    * @return (step 1-based, lhs, rhs, merged, freq) — one row per learned
    *         merge, in learning order.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordCounts(df, textCol)
      .select(col("cnt"), charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = pairRows(words)
        .groupBy("lhs", "rhs").agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, l + r, f))
        words = words
          .select(col("cnt"), applyMerge(col("syms"), l, r).as("syms"))
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "freq")
  }

  /** Segment words with a learned merge list (the ENCODE side of BPE —
    * applies merges in learning order, each as the same non-overlapping
    * fold used during training). Output one row per input row with the
    * word's subword segmentation.
    * @return input columns + `pieces: array<string>`.
    */
  def segment(df: DataFrame, wordCol: String, merges: Seq[(String, String)]): DataFrame = {
    val init = df.withColumn("pieces", charSyms(col(wordCol)))
    merges.foldLeft(init) { case (acc, (l, r)) =>
      acc.withColumn("pieces", applyMerge(col("pieces"), l, r))
    }
  }

  /** Per-document token counts under a LEARNED merge list — the corpus-scope
    * ENCODE pass a trained tokenizer feeds into data budgeting (tokens per
    * doc under the real vocab, not the whitespace proxy). Segmentation runs
    * once per DISTINCT word (the vocab-sized table, orders of magnitude
    * smaller than the corpus), then one word-keyed join fans the piece
    * counts back out — the same "touch the vocab, not the corpus" shape as
    * [[train]], and the join's hot words (stopwords) are exactly what AQE
    * skew-splits.
    * @return (idCol, bpe_tokens) — total subword pieces per document.
    */
  def encodeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
      explode(Tokenize.termsCol(col(textCol))).as("word"))
    val vocab = segment(words.select("word").distinct(), "word", merges)
      .select(col("word"), size(col("pieces")).cast("long").as("__np"))
    words.join(vocab, "word")
      .groupBy(idCol).agg(sum(col("__np")).as("bpe_tokens"))
  }

  /** Tokenizer fertility report under a learned merge list — the standard
    * tokenizer-evaluation metrics: fertility = subword pieces per
    * whitespace word (1.0 = every word is one piece; high fertility means
    * the vocab fragments this corpus) and chars per piece (the compression
    * the vocab actually achieves). One vocab-sized segmentation + one
    * corpus-weighted fold: occurrence counts come from the (word, cnt)
    * table, so the corpus is touched exactly once (the wordCounts pass) —
    * no per-document work at all.
    *
    * @return a single (n_words, n_pieces, n_chars, fertility,
    *         chars_per_token) row, ratios 4dp.
    */
  def fertility(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    segment(wordCounts(df, textCol), "word", merges)
      .select(col("cnt"),
        (col("cnt") * size(col("pieces"))).as("__p"),
        (col("cnt") * length(col("word"))).as("__c"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("__p")).as("n_pieces"),
        sum(col("__c")).as("n_chars"))
      .select(col("n_words"), col("n_pieces"), col("n_chars"),
        round(col("n_pieces") / col("n_words").cast("double"), 4).as("fertility"),
        round(col("n_chars") / col("n_pieces").cast("double"), 4).as("chars_per_token"))
}
