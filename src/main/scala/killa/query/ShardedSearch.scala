package killa.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sharded search — one query over SEVERAL index roots, with exactly the
  * semantics of one merged index (the Elasticsearch/Lucene
  * `dfs_query_then_fetch` search type, and the shape a 10^12-doc corpus
  * actually serves from: many independently-built, independently-maintained
  * shard roots behind one query API).
  *
  * The whole problem is statistics: BM25's idf and length normalization use
  * corpus-level N / df / avgdl, so scoring each shard under its OWN stats
  * makes a doc's score depend on which shard it landed in (ES's default
  * `query_then_fetch` accepts that skew; its `dfs_query_then_fetch` runs a
  * stats round first). Here the stats round is [[mergedStats]] — cheap
  * driver-side sums: N = Σ shard numDocs, total tokens = Σ, per-term
  * df = Σ shard dfs (each one pruned block-metadata point-read) — and every
  * shard's DAAT kernel then runs under the merged stats
  * ([[IndexReader.bm25TopKRowsStats]]): weights and block-max bounds scale
  * together, so WAND pruning stays exact per shard. Each shard's exact
  * top-k (with boundary ties retained in deterministic order) merges
  * driver-side by (score desc, conv_id asc) — a doc cut by shard-local
  * truncation ranks below its shard's k-th and therefore below the global
  * k-th, so the merged top-k is EXACT. Rank identity with a single index
  * over the union corpus is both spec-pinned (Round5lSpec) and
  * oracle-gated (`q_sharded_bm25` hash-matches the SINGLE-corpus SQL).
  *
  * Shape at scale: shards are the unit of build/maintenance/serving
  * placement; per-query driver traffic is ≤ k + ties rows per shard plus
  * one block-metadata df probe per (term, shard); nothing about a shard's
  * size reaches another shard.
  */
object ShardedSearch {

  /** Merged corpus statistics across shards — the dfs round. avgdl derives
    * as Σ totalTokens / Σ numDocs, the SAME expression every single-root
    * build uses (IndexWriter), so a corpus split into shards merges to
    * bit-identical doubles. Terms absent everywhere carry df 0.
    */
  def mergedStats(readers: Seq[IndexReader], terms: Seq[String]): CorpusStats = {
    require(readers.nonEmpty, "at least one shard")
    val ms = readers.flatMap(_.manifest)
    val n = ms.map(_.numDocs).sum
    val tot = ms.map(_.totalTokens).sum
    val avgdl = if (n == 0) 0.0 else tot.toDouble / n
    val perShard = readers.map(_.termDf(terms.distinct))
    val df = terms.distinct
      .map(t => t -> perShard.map(_.getOrElse(t, 0L)).sum).toMap
    CorpusStats(n, avgdl, df)
  }

  /** Exact global top-k BM25 over the shard set — ids AND scores identical
    * to one index holding the union corpus. All of [[IndexReader.bm25TopK]]'s
    * boolean machinery passes through per shard (mustNot exclusion,
    * minimum_should_match, per-term boosts): docs never span shards, so
    * per-shard admission is global admission.
    *
    * @return (conv_id, score), (score desc, conv_id asc), ≤ k rows.
    */
  def bm25TopK(spark: SparkSession, readers: Seq[IndexReader],
      termsIn: Seq[String], k: Int, conjunctive: Boolean = false,
      mustNot: Seq[String] = Nil, minShouldMatch: Int = 1,
      boosts: Map[String, Double] = Map.empty): DataFrame = {
    import spark.implicits._
    val terms = termsIn.filter(t => t != null && t.nonEmpty).distinct
    if (terms.isEmpty || k <= 0 || readers.isEmpty)
      return Seq.empty[(String, Double)].toDF("conv_id", "score")
    val stats = mergedStats(readers, terms ++ mustNot)
    val merged = readers
      .flatMap(_.bm25TopKRowsStats(terms, k, stats, conjunctive, mustNot,
        minShouldMatch, boosts))
      .sortBy { case (conv, score) => (-score, conv) }
      .take(k)
    if (merged.isEmpty) Seq.empty[(String, Double)].toDF("conv_id", "score")
    else merged.toDF("conv_id", "score")
  }

  /** Per-index boosted top-k (the Elasticsearch `indices_boost` clause):
    * every shard scores under the MERGED statistics like [[bm25TopK]], then
    * its hits scale by that index's boost before the global merge — "prefer
    * the fresh index over the archive" without re-scoring anything. Exact
    * despite boosting AFTER per-shard truncation: the boost is constant
    * within a shard, so it preserves shard-local order — a doc cut by its
    * shard's top-k ranks below k boosted shard-mates and can never reach
    * the boosted global top-k.
    *
    * @param shards (reader, boost) pairs, boost > 0.
    * @return (conv_id, score), (score desc, conv_id asc), ≤ k rows; scores
    *         are boosted.
    */
  def bm25TopKIndicesBoost(spark: SparkSession,
      shards: Seq[(IndexReader, Double)], termsIn: Seq[String], k: Int,
      conjunctive: Boolean = false): DataFrame = {
    import spark.implicits._
    require(shards.nonEmpty && shards.forall(_._2 > 0.0),
      "shards must be non-empty with boosts > 0")
    val terms = termsIn.filter(t => t != null && t.nonEmpty).distinct
    if (terms.isEmpty || k <= 0)
      return Seq.empty[(String, Double)].toDF("conv_id", "score")
    val stats = mergedStats(shards.map(_._1), terms)
    val merged = shards
      .flatMap { case (r, w) =>
        r.bm25TopKRowsStats(terms, k, stats, conjunctive)
          .map { case (conv, score) => (conv, score * w) }
      }
      .sortBy { case (conv, score) => (-score, conv) }
      .take(k)
    if (merged.isEmpty) Seq.empty[(String, Double)].toDF("conv_id", "score")
    else merged.toDF("conv_id", "score")
  }

  /** Unscored membership across shards — a plain union of per-shard pruned
    * scans (sets are statistics-free, so no dfs round needed). */
  def membership(readers: Seq[IndexReader], term: String): DataFrame = {
    require(readers.nonEmpty, "at least one shard")
    readers.map(_.membership(term)).reduce(_ union _).distinct()
  }

  /** Exact match count across shards — Σ per-shard block-metadata counts
    * (docs never span shards). */
  def membershipCount(readers: Seq[IndexReader], term: String): Long =
    readers.map(_.membershipCount(term)).sum
}
