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

  test("sessionization: gap merging; the exactly-gap boundary MERGES (touching windows coalesce)") {
    val dir = TestSpark.freshDir("sessin")
    def t(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    // user 1: three events < 10 min apart, then one EXACTLY 10 min after the
    // last — Spark merges touching session windows, so all four are ONE
    // session; one more at +10:01 strictly exceeds the gap = NEW session.
    // user 2: one lone event.
    Seq(
      (0L, t(0), 1L, "view", 1.0, "{}"),
      (1L, t(5), 1L, "view", 2.0, "{}"),
      (2L, t(14, 59), 1L, "view", 3.0, "{}"),
      (3L, t(24, 59), 1L, "view", 4.0, "{}"), // = last + exactly 10:00 → merges
      (4L, t(35), 1L, "view", 5.0, "{}"), // = last + 10:01 → breaks
      (5L, t(30), 2L, "click", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val got = StreamOps.sessionizedUserStats(spark, dir, "10 minutes", "spec_sessions")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, "2024-01-01 00:00:00.0", 4L, 10.0),
      (1L, "2024-01-01 00:35:00.0", 1L, 5.0),
      (2L, "2024-01-01 00:30:00.0", 1L, 9.0)))
    // and on real driver data: the streaming result equals the batch
    // session_window aggregation of the same input
    val path = "/root/testdata/sf0.001/events.parquet"
    val stream = StreamOps.sessionizedUserStats(spark, path, "10 minutes", "spec_sessions2")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3))).toSet
    val batch = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
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

  test("append-mode sessionization: closed sessions land exactly once (production shape)") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val out = TestSpark.freshDir("sessout")
    val ckpt = TestSpark.freshDir("sessckpt")
    StreamOps.sessionizedToPath(spark, path, out, ckpt)
    val got = spark.read.parquet(out)
      .select("user_id", "session_start", "n", "sum_value")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3))).toSeq
    // exactly once: no (user, session_start) appears twice
    assert(got.size == got.distinct.size, "duplicate session emitted")
    val gotSet = got.toSet
    val batch = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"), col("sum_value"))
      .persist()
    val expAll = batch.collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(3), r.getDouble(4))).toSet
    assert(gotSet.subsetOf(expAll), "an emitted session diverged from the batch aggregation")
    // every session the final watermark strictly closed must have been emitted
    val maxTs = spark.read.parquet(path)
      .agg(max(col("ts").cast("timestamp"))).collect()(0).getTimestamp(0)
    val closed = batch.where(col("e") < lit(maxTs) - expr("INTERVAL 10 MINUTES"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(3), r.getDouble(4))).toSet
    assert(closed.nonEmpty && closed.subsetOf(gotSet), "a closed session was not emitted")
    batch.unpersist()
    // idempotent continuation: re-running over the same (fully-consumed)
    // input emits nothing new
    StreamOps.sessionizedToPath(spark, path, out, ckpt)
    assert(spark.read.parquet(out).count() == got.size.toLong)
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
