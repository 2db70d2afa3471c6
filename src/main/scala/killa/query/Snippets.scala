package killa.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import killa.tokenize.Tokenize

/** Keyword-in-context snippet extraction: for each hit conversation, the
  * ±`width`-token window around the FIRST occurrence of the query term
  * (first turn by turn_idx, first position within the turn — the stable
  * per-turn order the input_hint pins).
  *
  * This is the serving-side complement of search: the index finds the
  * conversations (membership/bm25TopK), the source table supplies the text —
  * exactly how a production engine renders results (the index never stores
  * raw text). The join against hits is broadcast-sized (≤ top-k rows or a
  * membership set), the window runs per conversation over its ≤ turns rows,
  * and every string op (tokenize, array_position, slice) is codegen'd —
  * no UDFs, scales with the source scan.
  */
object Snippets {

  /** @param turns source transcripts (conv_id, turn_idx, text, …)
    * @param hits  conversations to render (a `conv_id` column — typically
    *              the output of membership/bm25TopK)
    * @param term  the query term to locate (reference tokenizer semantics)
    * @param width tokens of context on each side
    * @return (conv_id, turn_idx, pos, snippet) — pos is the 1-based token
    *         position of the first occurrence; convs whose hits don't
    *         contain the literal term (e.g. fuzzy hits) yield no row
    */
  def forTerm(turns: DataFrame, hits: DataFrame, term: String, width: Int): DataFrame = {
    require(width >= 0, "width must be >= 0")
    val matched = turns
      .join(hits.select("conv_id").distinct(), "conv_id")
      .withColumn("toks", Tokenize.termsCol(col("text")))
      .withColumn("pos", array_position(col("toks"), term))
      .where(col("pos") > 0)
    val firstTurn = Window.partitionBy("conv_id").orderBy("turn_idx")
    val start = greatest(lit(1L), col("pos") - width)
    val end = least(size(col("toks")).cast("long"), col("pos") + width)
    matched
      .withColumn("rn", row_number().over(firstTurn))
      .where(col("rn") === 1)
      .select(
        col("conv_id"),
        col("turn_idx"),
        col("pos"),
        concat_ws(" ",
          slice(col("toks"), start.cast("int"), (end - start + 1L).cast("int")))
          .as("snippet"))
  }

  /** Multi-term tagged highlighting (the Elasticsearch `highlight` API,
    * plain-highlighter semantics with the TURN as the fragment unit — the
    * natural fragment boundary for transcripts): every matched token
    * wrapped in `preTag`…`postTag`, up to `maxFragments` matching turns
    * per conversation in turn order, each carrying its match count.
    * Distinct from [[forTerm]]: any of SEVERAL terms, ALL occurrences
    * tagged, several fragments — forTerm renders one ±width window around
    * one term's first hit. Every op (tokenize, higher-order filter /
    * transform, concat) is a codegen'd builtin — no UDF; the per-conv
    * window is bounded by one conversation's turns.
    *
    * @param hits conversations to render (a `conv_id` column — typically
    *             membershipAny/bm25TopK output)
    * @return (conv_id, turn_idx, n_hits, fragment) rows
    */
  def highlight(turns: DataFrame, hits: DataFrame, terms: Seq[String],
      maxFragments: Int = 2, preTag: String = "<em>",
      postTag: String = "</em>"): DataFrame = {
    require(maxFragments > 0, "maxFragments must be > 0")
    val qs = terms.filter(t => t != null && t.nonEmpty).distinct
    require(qs.nonEmpty, "at least one highlight term")
    val termsArr = array(qs.map(lit): _*)
    val matched = turns
      .join(hits.select("conv_id").distinct(), "conv_id")
      .withColumn("toks", Tokenize.termsCol(col("text")))
      .withColumn("n_hits",
        size(filter(col("toks"), x => array_contains(termsArr, x))).cast("long"))
      .where(col("n_hits") > 0)
    val order = Window.partitionBy("conv_id").orderBy("turn_idx")
    matched
      .withColumn("fragment", concat_ws(" ",
        transform(col("toks"), x =>
          when(array_contains(termsArr, x), concat(lit(preTag), x, lit(postTag)))
            .otherwise(x))))
      .withColumn("rn", row_number().over(order))
      .where(col("rn") <= maxFragments)
      .select("conv_id", "turn_idx", "n_hits", "fragment")
  }
}
