package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.tokenize.Tokenize

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every fulltext query below runs through the REAL engine (index build →
  * segment store → snapshot reader), not a relational shortcut; the DuckDB
  * oracle recomputes the expected answer independently from the same parquet.
  */
object SparkEntry {
  import Harness._

  /** Flagship: BM25 top-10 over the sf0.001 transcripts via the full
    * build+query pipeline; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    present(reader(spark, "/root/testdata/sf0.001").bm25TopK(Seq("the", "query"), 10))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 1+2: tokenize → per-doc term frequencies (ParseTokens analog)
    "q_tokenize_tf" -> ((s, dir) => {
      val toks = transcripts(s, dir)
        .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
      toks.groupBy("conv_id", "term").agg(count(lit(1)).as("tf"))
        .orderBy("conv_id", "term")
    }),
    // forward-index doc stats: doc length + distinct-term count (set semantics)
    "q_doc_stats" -> ((s, dir) => {
      val toks = transcripts(s, dir)
        .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
      toks.groupBy("conv_id")
        .agg(count(lit(1)).as("dl"), countDistinct(col("term")).as("n_terms"))
        .orderBy("conv_id")
    }),
    // op 10/segment store: per-term document frequency read back from the
    // committed posting blocks
    "q_df" -> ((s, dir) => {
      reader(s, dir).allBlocks
        .groupBy("term").agg(max(col("df")).as("df"))
        .orderBy("term")
    }),
    // op 11: reference-parity membership query (Searcher.cs:16-23)
    "q_membership" -> ((s, dir) =>
      reader(s, dir).membership("spark").orderBy("conv_id")),
    // absent term → empty (StringIndexTests.cs:575-595)
    "q_membership_miss" -> ((s, dir) =>
      reader(s, dir).membership("qqq_absent_term_zzz").orderBy("conv_id")),
    // BM25 top-k, single term
    "q_bm25_single" -> ((s, dir) =>
      present(reader(s, dir).bm25TopK(Seq("spark"), 10))),
    // BM25 top-k, multi-term disjunctive
    "q_bm25_multi" -> ((s, dir) =>
      present(reader(s, dir).bm25TopK(Seq("query", "filter", "join"), 10))),
    // BM25 top-k, conjunctive (posting-list intersection)
    "q_bm25_conj" -> ((s, dir) =>
      present(reader(s, dir).bm25TopK(Seq("query", "filter"), 10, conjunctive = true))),
    // op 8 Indexer.Update end-to-end: index built on 3/5 of the turns, then
    // one incremental diff batch brings it to the full corpus — df readback
    // and BM25 must match full-corpus oracles exactly
    "q_incr_update_df" -> ((s, dir) => {
      new killa.query.IndexReader(s, incrUpdateRoot(s, dir), conf).allBlocks
        .groupBy("term").agg(max(col("df")).as("df")).orderBy("term")
    }),
    "q_incr_update_bm25" -> ((s, dir) =>
      present(new killa.query.IndexReader(s, incrUpdateRoot(s, dir), conf)
        .bm25TopK(Seq("query", "scan"), 10))),
    // op 6 Indexer.Remove end-to-end: every 10th conversation deleted
    "q_incr_delete_membership" -> ((s, dir) =>
      new killa.query.IndexReader(s, incrDeleteRoot(s, dir), conf)
        .membership("spark").orderBy("conv_id")),
    // op 9 Indexer.Switch end-to-end: conversation renamed
    "q_incr_rename_membership" -> ((s, dir) =>
      new killa.query.IndexReader(s, incrRenameRoot(s, dir), conf)
        .membership("spark").orderBy("conv_id")),
    // corpus stats from the committed manifest
    "q_corpus_stats" -> ((s, dir) => {
      import s.implicits._
      val m = reader(s, dir).manifest.get
      val avgdl4 = BigDecimal(m.avgdl).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((m.numDocs, m.totalTokens, avgdl4))
        .toDF("n_docs", "total_tokens", "avgdl")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_tokenize_tf" -> (TurnsCte + TfCtes +
      " SELECT conv_id, term, tf FROM tf ORDER BY conv_id, term"),
    "q_doc_stats" -> (TurnsCte + TfCtes +
      " SELECT conv_id, CAST(sum(tf) AS BIGINT) AS dl, count(*) AS n_terms" +
      " FROM tf GROUP BY conv_id ORDER BY conv_id"),
    "q_df" -> (TurnsCte + TfCtes +
      " SELECT term, count(*) AS df FROM tf GROUP BY term ORDER BY term"),
    "q_membership" -> (TurnsCte + TfCtes +
      " SELECT DISTINCT conv_id FROM tok2 WHERE term = 'spark' ORDER BY conv_id"),
    "q_membership_miss" -> (TurnsCte + TfCtes +
      " SELECT DISTINCT conv_id FROM tok2 WHERE term = 'qqq_absent_term_zzz' ORDER BY conv_id"),
    "q_bm25_single" -> bm25OracleSql(Seq("spark"), 10, conjunctive = false),
    "q_bm25_multi" -> bm25OracleSql(Seq("query", "filter", "join"), 10, conjunctive = false),
    "q_bm25_conj" -> bm25OracleSql(Seq("query", "filter"), 10, conjunctive = true),
    "q_incr_update_df" -> (TurnsCte + TfCtes +
      " SELECT term, count(*) AS df FROM tf GROUP BY term ORDER BY term"),
    "q_incr_update_bm25" -> bm25OracleSql(Seq("query", "scan"), 10, conjunctive = false),
    "q_incr_delete_membership" -> (TurnsCte + TfCtes +
      " SELECT DISTINCT conv_id FROM tok2 WHERE term = 'spark'" +
      " AND CAST(substr(conv_id, 2) AS INT) % 10 <> 0 ORDER BY conv_id"),
    "q_incr_rename_membership" -> (TurnsCte + TfCtes +
      " SELECT DISTINCT CASE WHEN conv_id = 'c00001' THEN 'z99999' ELSE conv_id END AS conv_id" +
      " FROM tok2 WHERE term = 'spark' ORDER BY conv_id"),
    "q_corpus_stats" -> (TurnsCte + TfCtes +
      " SELECT (SELECT n FROM stats) AS n_docs," +
      " (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_tokens," +
      " round((SELECT avgdl FROM stats), 4) AS avgdl")
  )
}
