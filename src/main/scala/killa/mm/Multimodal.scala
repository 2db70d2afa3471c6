package killa.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import killa.util.Hashing

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-batches (the Scala analog of
  * `mapInPandas` batch shape: iterator-in, iterator-out, bounded memory per
  * batch — never one giant collect).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `decodeStub` produces deterministic fake features from the raw bytes
  * (length, FNV-64 content hash, fake dimensions). The Spark-side contract —
  * schema, binary handling, batched partition processing, deterministic
  * output — is real and tested; swapping `decodeStub` for a JNI/codec call
  * is the only production change.
  */
object Multimodal {

  final case class MmRow(id: Long, kind: String, payload: Array[Byte])
  final case class MmFeatures(
      id: Long, kind: String, n_bytes: Long, content_hash: String,
      fake_width: Int, fake_height: Int, decoded_by: String)

  /** Pack any id+string table into (id, kind, binary payload) rows —
    * the ingestion boundary a real pipeline hits when payload columns are
    * raw bytes in parquet.
    */
  def payloadize(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(col(idCol).as("id"), lit(kind).as("kind"),
      encode(coalesce(col(textCol), lit("")), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-features of the payload bytes.
    * Replace with a real codec (??? in production terms) — signature and
    * batch shape stay identical.
    */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MmFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val w = 16 + java.lang.Math.floorMod(h, 1024L).toInt
    val hgt = 16 + java.lang.Math.floorMod(Hashing.splitmix64(h), 1024L).toInt
    MmFeatures(id, kind, payload.length.toLong, f"$h%016x", w, hgt, "stub")
  }

  /** Batched feature extraction over binary payload rows. mapPartitions with
    * an internal batch buffer mirrors the mapInPandas execution shape:
    * bounded memory (batchSize rows), iterator-to-iterator, no driver
    * round-trips.
    */
  def extractFeatures(spark: SparkSession, rows: DataFrame, batchSize: Int = 256): Dataset[MmFeatures] = {
    import spark.implicits._
    rows.select("id", "kind", "payload").as[MmRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call here
        batch.iterator.map(r => decodeStub(r.id, r.kind, r.payload))
      }
    }
  }
}
