package killa.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merged views over the log-structured docs dictionary and forward index.
  *
  * Both are append-only logs of per-batch deltas (full replacement rows per
  * touched doc, batchSeq-stamped): a read merges them last-wins. This is the
  * scale answer to the reference's in-place ConcurrentDictionary mutation
  * (StringIndex.cs:38-49): maintenance batches append O(Δ) rows instead of
  * rewriting O(corpus); compaction folds the log back into a single dir.
  */
object Logs {

  /** Latest dictionary entry per docId (including dead docs — docIds are
    * never reused, like the reference's normalized-path identity).
    */
  private def emptyDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long, String, Boolean, Long)]
      .toDF("docId", "convId", "dl", "source", "alive", "batchSeq")
  }

  def docsAll(spark: SparkSession, m: Manifest): DataFrame = {
    if (m.docsDirs.isEmpty) return emptyDocs(spark)
    val raw = spark.read.parquet(m.docsDirs: _*)
    val w = Window.partitionBy("docId").orderBy(col("batchSeq").desc)
    raw.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** Live dictionary entries only. */
  def docsAlive(spark: SparkSession, m: Manifest): DataFrame =
    docsAll(spark, m).where(col("alive"))

  /** Merged forward index: each doc's rows from the latest batch that wrote
    * it, restricted to live docs. Columns (term, docId, tf, dl, bkt).
    */
  def forward(spark: SparkSession, m: Manifest): DataFrame =
    forwardPruned(spark, m, None)

  /** [[forward]] with optional term-bucket pruning of the DATA read.
    *
    * The last-wins batchSeq per doc is always computed over ALL buckets
    * (a column-pruned (docId, batchSeq) scan): a delta that rewrote a doc
    * without touching bucket B must still retire the doc's OLD rows in B —
    * a per-bucket max(batchSeq) would resurrect them.
    */
  def forwardPruned(spark: SparkSession, m: Manifest, buckets: Option[Seq[Int]]): DataFrame = {
    if (m.forwardDirs.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Int)]
        .toDF("term", "docId", "tf", "dl", "bkt")
    }
    // each forward dir is its own hive-partitioned root (bkt_p=*) — read them
    // separately (per-dir basePath) and union, or Spark rejects the mix as
    // conflicting directory structures
    def read(pruned: Boolean): DataFrame = m.forwardDirs
      .map { d =>
        val df0 = spark.read.option("basePath", d).parquet(d)
        val df = buckets.filter(_ => pruned).fold(df0)(bs =>
          df0.where(col("bkt_p").isin(bs.map(Integer.valueOf): _*)))
        df.select("term", "docId", "tf", "dl", "bkt", "batchSeq")
      }
      .reduce(_ unionByName _)
    val latest = read(pruned = false).groupBy("docId").agg(max(col("batchSeq")).as("mb"))
    read(pruned = true).join(latest, "docId").where(col("batchSeq") === col("mb"))
      .join(docsAlive(spark, m).select("docId"), "docId")
      .select("term", "docId", "tf", "dl", "bkt")
  }
}
