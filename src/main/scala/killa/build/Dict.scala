package killa.build

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic dense docId dictionary: docId = global rank of conv_id
  * (ascending), the analog of the reference's normalized-path doc key
  * (PathExtensions.cs:7-12). Rank order makes the BM25 tie-break
  * (score desc, docId asc) ≡ (score desc, conv_id asc), which is what the
  * relational/DuckDB oracles use.
  *
  * Computed scalably — no single-partition global window: range-partition by
  * conv_id, rank within each partition, then add broadcast per-partition
  * offsets (a collect of ≤ P counts). Offsets are prefix sums in partition
  * order, and range partitions are ordered, so the result is the exact global
  * rank regardless of where sampling placed the boundaries.
  */
object Dict {
  /** @param convs single-column DataFrame `conv_id`, distinct.
    * @return (dictionary DataFrame (conv_id, docId), cleanup) — call cleanup()
    *         only after the result has been materialized (e.g. written to
    *         parquet); it unpersists the pinned partitioning.
    */
  def assign(convs: DataFrame, startId: Long = 0L): (DataFrame, () => Unit) = {
    val spark = convs.sparkSession
    val p = math.max(1, spark.sparkContext.defaultParallelism)
    // pin the (usually distinct-aggregated) input: repartitionByRange reads
    // it twice — once for boundary sampling, once for the shuffle
    val pinned = convs.persist(StorageLevel.MEMORY_AND_DISK)
    // persist pins the sampled range boundaries so the counts job and the
    // rank job see identical partition assignment
    val sorted = pinned
      .repartitionByRange(p, col("conv_id"))
      .sortWithinPartitions("conv_id")
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tC0 = System.nanoTime()
    val counts = sorted.groupBy("pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (sys.env.contains("KILLA_BUILD_TIMING"))
      System.err.println(s"[killa-timing] dict counts ${(System.nanoTime() - tC0) / 1e9}s")
    var acc = startId
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "off")
    val w = Window.partitionBy("pid").orderBy("conv_id")
    val dict = sorted
      .join(broadcast(offDf), "pid")
      .withColumn("docId", row_number().over(w).cast("long") + col("off") - 1L)
      .select("conv_id", "docId")
    (dict, () => { sorted.unpersist(); pinned.unpersist(); () })
  }
}
