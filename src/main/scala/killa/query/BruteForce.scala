package killa.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.tokenize.Tokenize

/** Relational BM25 oracle, computed directly from raw transcripts —
  * completely independent of the segment pipeline (FIXTURES.md §3 oracle (a)).
  * Used by rank-identity tests: the WAND path must match these ids AND scores
  * exactly. The expression shape and the per-doc ordered fold mirror
  * Bm25.contrib / Daat's term-order summation bit for bit.
  */
object BruteForce {

  /** @return (conv_id, score), ordered (score desc, conv_id asc), limit k. */
  def bm25(
      turns: DataFrame,
      termsIn: Seq[String],
      k: Int,
      conjunctive: Boolean = false,
      conf: Conf = Conf.default,
      mustNot: Seq[String] = Nil,
      minShouldMatch: Int = 1,
      boosts: Map[String, Double] = Map.empty): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val terms = termsIn.filter(t => t != null && t.nonEmpty).distinct
    if (terms.isEmpty || k <= 0) return Seq.empty[(String, Double)].toDF("conv_id", "score")

    val toks = turns.select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
    val tf = toks.groupBy("conv_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("conv_id").agg(sum(col("tf")).as("dl"))

    val nDocs = turns.select("conv_id").distinct().count()
    val totalRow = dl.agg(sum(col("dl"))).collect()(0)
    val totalTokens = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    if (nDocs == 0 || totalTokens == 0) return Seq.empty[(String, Double)].toDF("conv_id", "score")
    val avgdl = totalTokens.toDouble / nDocs

    val dfMap = tf.where(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val q = terms.zipWithIndex.map { case (t, i) =>
      (t, i, Bm25.weight(nDocs, dfMap.getOrElse(t, 0L), conf.k1) * boosts.getOrElse(t, 1.0))
    }.toDF("term", "tidx", "w")

    val contrib = tf.join(dl, "conv_id").join(broadcast(q), "term")
      .withColumn("contrib",
        col("w") * col("tf").cast("double") /
          (col("tf").cast("double") +
            lit(conf.k1) * (lit(1.0 - conf.b) +
              lit(conf.b) * col("dl").cast("double") / lit(avgdl))))

    val scored = contrib.groupBy("conv_id").agg(
      aggregate(
        array_sort(collect_list(struct(col("tidx"), col("contrib").as("c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("c")).as("score"),
      count(lit(1)).as("nt"))

    val filtered =
      if (conjunctive) scored.where(col("nt") === terms.size)
      else if (minShouldMatch > 1) scored.where(col("nt") >= minShouldMatch)
      else scored
    // boolean NOT: drop convs holding any excluded term before the top-k cut
    val ex = mustNot.filter(t => t != null && t.nonEmpty).distinct
    val notFiltered = if (ex.isEmpty) filtered
      else filtered.join(
        toks.where(col("term").isin(ex: _*)).select("conv_id").distinct(),
        Seq("conv_id"), "left_anti")
    notFiltered.orderBy(col("score").desc, col("conv_id").asc).limit(k)
      .select("conv_id", "score")
  }

  /** Brute-force membership oracle: conversations containing `term`. */
  def membership(turns: DataFrame, term: String): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    if (term == null || term.isEmpty) return Seq.empty[String].toDF("conv_id")
    turns.select(col("conv_id"), Tokenize.termsCol(col("text")).as("terms"))
      .where(array_contains(col("terms"), term))
      .select("conv_id").distinct()
  }
}
