package killa.query

/** Okapi BM25 (standard Lucene-form constants, pinned in SURVEY.md §4.2 —
  * the reference has no scoring, so the oracle pins the formula). All inputs
  * are exact integers (tf, df, dl, N) plus one deterministic double (avgdl),
  * and both the WAND path and the relational/DuckDB oracles evaluate the
  * same expression shape in the same order, so scores are reproducible
  * across partitionings.
  */
/** Externally-supplied BM25 corpus statistics — the dfs_query_then_fetch
  * carrier: when a query spans several index roots (shards), each shard's
  * kernel must score under the MERGED corpus's N / avgdl / per-term df, not
  * its own, or shard boundaries would change scores. Built by
  * [[ShardedSearch.mergedStats]]; absent terms carry df 0.
  */
final case class CorpusStats(numDocs: Long, avgdl: Double, df: Map[String, Long])

object Bm25 {
  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** Pre-multiplied term weight w = idf · (k1 + 1). */
  def weight(n: Long, df: Long, k1: Double): Double = idf(n, df) * (k1 + 1.0)

  /** Length-normalized impact: tf / (tf + k1·(1 − b + b·dl/avgdl)).
    * contribution = weight · impact. Increasing in tf, decreasing in dl ⇒
    * bound(maxTf, minDl) is an admissible block-max for any avgdl > 0.
    */
  def impact(tf: Long, dl: Long, k1: Double, b: Double, avgdl: Double): Double =
    tf / (tf + k1 * (1.0 - b + b * dl / avgdl))

  def contrib(w: Double, tf: Long, dl: Long, k1: Double, b: Double, avgdl: Double): Double =
    w * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
}
