package killa.build

import org.apache.spark.sql.{DataFrame, SparkSession}

import killa.model.LedgerRow

/** Per-partition checkpoint/lineage/metrics ledger (north rule: "resumable
  * from checkpoint with per-partition lineage + metrics"). One parquet row per
  * (buildId, step, bucket). The functional replacement for the reference's
  * per-folder BackgroundTaskQueue state (BackgroundTaskQueue.cs:16-27):
  * "pending partitions > 0" is our IsIndexing, and resume = all − done.
  */
object Ledger {
  def dir(root: String): String = s"$root/ledger"

  def append(spark: SparkSession, root: String, rows: Seq[LedgerRow]): Unit = {
    if (rows.isEmpty) return
    import spark.implicits._
    rows.toDS().coalesce(1).write.mode("append").parquet(dir(root))
  }

  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(dir(root))
    else Seq.empty[LedgerRow].toDS().toDF()
  }

  def doneBuckets(spark: SparkSession, root: String, buildId: String, step: String): Set[Int] = {
    import org.apache.spark.sql.functions.col
    read(spark, root)
      .where(col("buildId") === buildId && col("step") === step && col("status") === "done")
      .select("bkt").collect().map(_.getInt(0)).toSet
  }

  def hasStep(spark: SparkSession, root: String, buildId: String, step: String): Boolean = {
    import org.apache.spark.sql.functions.col
    !read(spark, root)
      .where(col("buildId") === buildId && col("step") === step && col("status") === "done")
      .isEmpty
  }
}
