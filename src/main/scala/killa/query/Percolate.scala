package killa.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import killa.tokenize.Tokenize

/** Reverse search (the Elasticsearch `percolate` query): instead of running
  * one query against an index of documents, run a BATCH of documents against
  * a table of registered queries — "alert me when a document matching my
  * search arrives". The registered-query table is the index here; the
  * documents are the probes.
  *
  * Spark-first shape: the query table is tiny next to any document batch
  * (thousands of saved searches vs millions of docs), so it broadcasts and
  * the whole match is one scan over the batch — tokenize (codegen), explode
  * to distinct (doc, term), broadcast-join the exploded query terms, and one
  * combinable count per (doc, query) decides conjunctive/disjunctive
  * satisfaction. No index, no shuffle of the document side beyond the
  * per-pair count. Composes with streaming ingestion as a `foreachBatch`
  * step (percolate the arriving batch BEFORE it merges into the index —
  * exactly ES's alerting pattern).
  */
object Percolate {

  /** Match every conversation in `docs` against every registered query.
    *
    * @param docs transcripts-shaped rows (`conv_id`, `text`); all rows of a
    *             conv_id form one document (reference document semantics).
    * @param queries registered queries: (`query_id` string, `terms` array of
    *             strings, `conjunctive` boolean). Conjunctive queries match
    *             docs containing ALL terms; disjunctive ANY. Duplicate terms
    *             in a query collapse set-style (reference token-set
    *             semantics, same as the forward search surfaces).
    * @return (conv_id, query_id) matched pairs, unordered.
    */
  def percolate(docs: DataFrame, queries: DataFrame): DataFrame = {
    val docTerms = docs
      .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
      .distinct()
    val q = queries.select(col("query_id"), col("conjunctive"),
        size(array_distinct(col("terms"))).as("__nt"),
        explode(array_distinct(col("terms"))).as("term"))
    // both sides are term-distinct, so the per-(doc, query) row count IS the
    // number of satisfied query terms
    docTerms.join(broadcast(q), "term")
      .groupBy(col("conv_id"), col("query_id"))
      .agg(count(lit(1)).as("__hit"), first(col("__nt")).as("__nt"),
        first(col("conjunctive")).as("__conj"))
      .where(!col("__conj") || col("__hit") === col("__nt"))
      .select("conv_id", "query_id")
  }
}
