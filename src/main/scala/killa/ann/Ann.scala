package killa.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import killa.util.Hashing

/** Similarity search over an embedding column (array<float>):
  *
  *  - brute-force cosine top-k — codegen'd higher-order functions
  *    (zip_with + ordered aggregate fold, so scores are deterministic),
  *    queries broadcast against the corpus: the exact baseline, linear scan;
  *  - LSH (random-hyperplane signatures) bucketed candidates with exact
  *    cosine re-rank — the sublinear 100 TB path (signature join prunes the
  *    corpus to colliding buckets; hyperplanes derive from fixed seeds).
  */
object Ann {

  /** Σ aᵢ·bᵢ as an ordered left fold (deterministic double summation). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column = dotCol(a, b) / (normCol(a) * normCol(b))

  /** Exact cosine top-k neighbors for each query vector.
    * `queries` (q_id, embedding) is broadcast — at corpus scale the plan is
    * one scan of the embeddings table, no shuffle until the per-query top-k.
    * Output: (q_id, vec_id, cosine, rank), self-matches excluded.
    */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val joined = embeddings.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"))))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(cosineCol(col("v"), col("qv")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "cosine", "rank")
  }

  /** Deterministic random-hyperplane component (j-th plane, i-th dim). */
  @inline private def planeComponent(seed: Long, j: Int, i: Int): Double = {
    val h = Hashing.splitmix64(seed ^ (j.toLong << 32) ^ i.toLong)
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** nPlanes-bit signature of a vector under the fixed hyperplane family. */
  def signature(vec: Seq[Float], nPlanes: Int, seed: Long): Long = {
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * planeComponent(seed, j, i); i += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** LSH top-k: candidates = corpus vectors whose signature agrees with the
    * query on ≥ 1 of `bands` signature bands (multi-band OR — same recall
    * structure as MinHash LSH), re-ranked by exact cosine. Approximate:
    * recall < 1 by construction; compare against [[bruteForceTopK]] to
    * measure it.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nPlanes: Int = 32, bands: Int = 4, seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0 && nPlanes <= 64)
    val rowsPerBand = nPlanes / bands
    val mask = if (rowsPerBand == 64) -1L else (1L << rowsPerBand) - 1
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sigUdf = udf((v: Seq[Float]) => signature(v, nPlanes, seed))
    def bandRows(df: DataFrame, id: String, vec: String, outId: String) =
      df.select(col(id).as(outId), col(vec).as(s"${outId}_v"), sigUdf(col(vec)).as("sig"))
        .select(col(outId), col(s"${outId}_v"), explode(sequence(lit(0), lit(bands - 1))).as("band"),
          col("sig"))
        .withColumn("bandVal",
          expr(s"shiftright(sig, band * $rowsPerBand)").bitwiseAND(lit(mask)))
        .drop("sig")
    val e = bandRows(embeddings, idCol, vecCol, "vec_id")
    val q = bandRows(queries, qIdCol, qVecCol, "q_id")
    val cand = e.join(broadcast(q), Seq("band", "bandVal"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("vec_id_v").as("v"), col("q_id_v").as("qv"))
      .dropDuplicates("q_id", "vec_id")
    val scored = cand.withColumn("cosine", round(cosineCol(col("v"), col("qv")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (cosine ≥ threshold, a < b).
    * Exact via self-join at test scale; the scale path reuses the LSH
    * buckets as the candidate generator.
    */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = embeddings.select(col(idCol).as("b_id"), col(vecCol).as("bv"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("cosine", round(cosineCol(col("av"), col("bv")), 4))
      .where(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }
}
