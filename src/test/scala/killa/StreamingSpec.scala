package killa

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.{BruteForce, IndexReader}
import killa.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowed event counts match a batch aggregation of the same data") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val got = StreamOps.windowedEventCounts(spark, path, "spec_window")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val exp = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("append-mode file sink: finalized windows stream to parquet, none on the driver (production shape)") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val out = TestSpark.freshDir("winout")
    val ckpt = TestSpark.freshDir("winckpt")
    StreamOps.windowedEventCountsToPath(spark, path, out, ckpt)
    val got = spark.read.parquet(out)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val exp = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // append emits only watermark-finalized windows: exact subset, and only
    // trailing windows (within watermark of the max event time) may be absent
    assert(got.subsetOf(exp), "a finalized window diverged from the batch aggregation")
    // the watermark (10 min) can hold back the last window, and the one
    // before it when the max event falls in its hour's first 10 minutes
    val trailing = exp.map(_._1).toSeq.sorted.takeRight(2).toSet
    assert(got.nonEmpty && exp.forall(e => trailing.contains(e._1) || got.contains(e)),
      "a non-trailing window was not finalized to the sink")
  }

  test("stream ingestion maintains the index like the reference watcher (FileAnalyzer.cs:144-168)") {
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
    val root = TestSpark.freshDir("stream")
    val epoch = 1704067200000L
    def turnsDf(rows: (String, Int, String)*) = rows.map { case (c, i, t) =>
      Turn(c, i, "user", t, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

    // base index
    new IndexWriter(spark, root, conf).fullBuild(turnsDf(("a", 0, "alpha base")), "b0")
    // two transcript batches land in the watched directory
    val watched = TestSpark.freshDir("watched")
    turnsDf(("b", 0, "beta base")).write.mode("append").parquet(watched)
    turnsDf(("c", 0, "gamma base"), ("a", 0, "alpha changed")).write.mode("append").parquet(watched)

    val batches = StreamOps.ingestTranscripts(spark, watched, root, conf)
    assert(batches >= 1)

    // quiescent (DelayedSearch-analog) visibility: everything ingested
    val r = new IndexReader(spark, root, conf)
    def owners(t: String) = r.membership(t).collect().map(_.getString(0)).toSet
    assert(owners("base").contains("b") && owners("base").contains("c"))
    // last-write-wins for conv a across batches
    val finalCorpus = turnsDf(("a", 0, "alpha changed"), ("b", 0, "beta base"), ("c", 0, "gamma base"))
    assert(owners("alpha") == BruteForce.membership(finalCorpus, "alpha")
      .collect().map(_.getString(0)).toSet)
    assert(owners("changed") == Set("a"))
  }
}
