package killa.ann

import org.apache.spark.sql.DataFrame
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
}
