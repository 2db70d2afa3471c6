package killa.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage-scale path for vector
  * corpora (4× smaller than float32 before any codebook method; the form ES
  * dense_vector calls `int8` quantization and FAISS calls SQ8). Symmetric
  * per-vector scaling: scale = max|x| / 127, code = round-half-up(x/scale)
  * ∈ [−127, 127], reconstruction x̂ = code · scale with |x − x̂| ≤ scale/2.
  *
  * Codes are INTEGERS computed by deterministic IEEE double arithmetic from
  * the stored floats, so any engine reproduces them bit-exactly — the
  * registered gate compares raw codes, not a rounded error metric.
  */
object Quant {

  /** Exploded int8 codes: one (vec_id, i, q) row per vector element.
    * Zero vectors (scale 0) code to all-zero. One codegen'd projection —
    * no shuffle, no UDF; scales like any columnar map.
    */
  def int8Codes(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .withColumn("__scale",
        array_max(transform(col("__v"), x => abs(x.cast("double")))) / 127.0)
      .select(col("vec_id"), col("__scale"), posexplode(col("__v")).as(Seq("i", "__x")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        when(col("__scale") === 0.0, lit(0L))
          .otherwise(floor(col("__x").cast("double") / col("__scale") + 0.5))
          .as("q"))

  /** Bits per packed lane. 32 (not 64) so every lane code is a non-negative
    * Long on BOTH engines — a sign bit at position 63 would need unsigned
    * shifts the SQL oracle cannot express portably.
    */
  val LaneBits = 32

  private val laneBitValues: Column =
    array((0 until LaneBits).map(i => lit(1L << i)): _*)

  /** Packed sign-bit lane codes of one vector: lane `l` holds bits for
    * dimensions [32l, 32l+31], bit i set iff x_i > 0 (the ES `bit` element
    * type / binary-quantization sign rule). Pure integer construction —
    * each set bit contributes its exact power of two, so the sum IS the
    * bitwise OR and any engine reproduces codes bit-exactly.
    */
  private def laneCodes(v: Column): Column =
    transform(sequence(lit(0), ceil(size(v) / lit(LaneBits.toDouble)).cast("int") - 1),
      l => aggregate(
        zip_with(slice(v, l * LaneBits + 1, lit(LaneBits)), laneBitValues,
          (x, b) => when(x > lit(0.0f), b).otherwise(lit(0L))),
        lit(0L), (acc, c) => acc + coalesce(c, lit(0L))))

  /** Exploded binary (1-bit) codes: one (vec_id, lane, code) row per packed
    * 32-dim lane — 32× smaller than float32 storage. Same codegen-only
    * shape as [[int8Codes]]: no shuffle, no UDF.
    */
  def binaryCodes(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"), laneCodes(col(vecCol)).as("__lanes"))
      .select(col("vec_id"), posexplode(col("__lanes")).as(Seq("lane", "code")))
      .select(col("vec_id"), col("lane").cast("long").as("lane"), col("code"))

  /** Per-vector int8 code ARRAY (same quantization rule as [[int8Codes]],
    * kept packed for scoring instead of exploded for storage). Element type
    * long (floor of a double), values ∈ [−127, 127].
    */
  private def int8CodesCol(v: Column): Column = {
    val scale = array_max(transform(v, x => abs(x.cast("double")))) / 127.0
    when(scale === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x.cast("double") / scale + 0.5)))
  }

  /** Quantized-coarse + float-rescore kNN (the Elasticsearch 8.x
    * `rescore_vector` pattern over `int8` dense_vectors: search the 4×
    * smaller quantized codes, then re-score only `k × oversample` survivors
    * against the full-precision floats). Phase 1 ranks by the INTEGER int8
    * dot product — exact on any engine, no float drift at the admission
    * boundary; phase 2 recomputes exact float cosine for survivors only and
    * returns the top-k. Both vectors and codes ride the same single corpus
    * scan (codes are a codegen projection), queries broadcast; only the
    * per-query windows shuffle. Ties break vec_id asc at BOTH phases, so
    * the admitted set and final ranking are fully deterministic.
    * Output: (q_id, vec_id, cosine, rank).
    */
  def int8RescoreTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      oversample: Int): DataFrame = {
    require(k >= 1 && oversample >= 1, "k and oversample must be >= 1")
    val corpus = embeddings.select(col(idCol).as("vec_id"), col(vecCol).as("__v"),
      int8CodesCol(col(vecCol)).as("__c"))
    val qs = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("__qv"),
      int8CodesCol(col(qVecCol)).as("__qc"))
    val joined = corpus.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      // native codegen fold — bit-identical to the HOF form
      // aggregate(zip_with(__c, __qc, _*_), 0L, acc + coalesce(x, 0L))
      // (Round6Spec-pinned); the interpreted fold was the per-pair cost of
      // the whole phase-1 ranking stage
      .withColumn("__dot", killa.expr.VecExprs.dotCodesCol(col("__c"), col("__qc")))
    val wc = Window.partitionBy("q_id").orderBy(col("__dot").desc, col("vec_id").asc)
    val admitted = joined.withColumn("__crank", row_number().over(wc))
      .where(col("__crank") <= k * oversample)
    val wf = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    admitted
      .withColumn("cosine", round(Ann.cosineCol(col("__v"), col("__qv")), 4))
      .withColumn("rank", row_number().over(wf))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Exact Hamming top-k over sign-bit binary codes (the ES `bit`
    * dense_vector kNN: distance = popcount(xor)). `queries` is broadcast —
    * one scan of the corpus computes lane codes AND distances inside a
    * single codegen stage (zip_with → xor → native bit_count fold); only
    * the per-query top-k window shuffles, carrying (q, id, dist) triples.
    * Self-matches excluded; ties break vec_id asc like [[Ann.bruteForceTopK]].
    * Output: (q_id, vec_id, hamming, rank).
    */
  def hammingTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val corpus = embeddings.select(col(idCol).as("vec_id"), laneCodes(col(vecCol)).as("__c"))
    val qs = queries.select(col(qIdCol).as("q_id"), laneCodes(col(qVecCol)).as("__qc"))
    val joined = corpus.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      // native codegen fold — bit-identical to the HOF form
      // aggregate(zip_with(__c, __qc, bit_count(xor).cast(long)), 0L,
      // acc + coalesce) (Round6Spec-pinned)
      .withColumn("hamming", killa.expr.VecExprs.hammingLanesCol(col("__c"), col("__qc")))
    val w = Window.partitionBy("q_id").orderBy(col("hamming").asc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "hamming", "rank")
  }
}
