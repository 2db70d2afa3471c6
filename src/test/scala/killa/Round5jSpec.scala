package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth

/** Round-5j surfaces: the metric-aggregation completion set —
  * extended_stats, weighted_avg, median_absolute_deviation, string_stats.
  */
class Round5jSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 4, seed = 61L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5jroot")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private lazy val matchSet: Set[String] =
    BruteForce.membership(turns, "the").collect().map(_.getString(0)).toSet

  // deterministic per-conv numeric value with real spread
  private lazy val meta = turns.select("conv_id").distinct()
    .withColumn("v", expr("CAST(CAST(substring(conv_id, 5) AS INT) * 7 % 23 AS DOUBLE)"))
    .withColumn("w", expr("CAST(CAST(substring(conv_id, 5) AS INT) % 5 + 1 AS DOUBLE)"))

  private lazy val vals: Seq[(Double, Double)] = meta.collect()
    .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    .filter(t => matchSet.contains(t._1)).map(t => (t._2, t._3)).toSeq

  test("extendedStatsAgg: population variance, σ bounds, NaN/null ignored") {
    val xs = vals.map(_._1)
    val n = xs.length
    val mean = xs.sum / n
    val varP = xs.map(x => (x - mean) * (x - mean)).sum / n
    val poisoned = meta.withColumn("v",
      when(col("conv_id") === matchSet.toSeq.sorted.head, lit(null)).otherwise(col("v")))
    val r = reader.extendedStatsAgg("the", meta, "conv_id", "v", sigma = 2.0).collect()(0)
    assert(r.getAs[Long]("n") == n.toLong)
    assert(math.abs(r.getAs[Double]("variance") - varP) < 1e-9)
    assert(math.abs(r.getAs[Double]("std_upper") -
      (mean + 2.0 * math.sqrt(varP))) < 1e-9)
    assert(math.abs(r.getAs[Double]("sum_sq") - xs.map(x => x * x).sum) < 1e-9)
    val r2 = reader.extendedStatsAgg("the", poisoned, "conv_id", "v").collect()(0)
    assert(r2.getAs[Long]("n") == (n - 1).toLong)
  }

  test("weightedAvgAgg: Σvw/Σw; a row missing either side contributes nothing") {
    val want = vals.map(t => t._1 * t._2).sum / vals.map(_._2).sum
    val got = reader.weightedAvgAgg("the", meta, "conv_id", "v", "w")
      .collect()(0).getDouble(0)
    assert(math.abs(got - want) < 1e-9)
    // null weight on one conv: that conv drops from BOTH sums
    val victim = matchSet.toSeq.sorted.head
    val vv = meta.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .filter(t => matchSet.contains(t._1) && t._1 != victim)
    val want2 = vv.map(t => t._2 * t._3).sum / vv.map(_._3).sum
    val poisoned = meta.withColumn("w",
      when(col("conv_id") === victim, lit(null)).otherwise(col("w")))
    val got2 = reader.weightedAvgAgg("the", poisoned, "conv_id", "v", "w")
      .collect()(0).getDouble(0)
    assert(math.abs(got2 - want2) < 1e-9)
  }

  test("madAgg: median(|v − median|), interpolated like percentile") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val xs = vals.map(_._1)
    val want = medianOf(xs.map(x => math.abs(x - medianOf(xs))))
    val got = reader.madAgg("the", meta, "conv_id", "v").collect()(0).getDouble(0)
    assert(math.abs(got - want) < 1e-9)
  }

  test("stringStatsAgg: length stats + char-distribution entropy") {
    val sMeta = meta.withColumn("s",
      concat(lit("t"), expr("substring(conv_id, 5)"))).drop("v", "w")
    val ss = sMeta.collect().map(r => (r.getString(0), r.getString(1)))
      .filter(t => matchSet.contains(t._1)).map(_._2).toSeq
    val chars = ss.flatMap(_.toCharArray)
    val n = chars.length.toDouble
    val want = -chars.groupBy(identity).values
      .map(g => g.length / n * (math.log(g.length / n) / math.log(2.0))).sum
    val r = reader.stringStatsAgg("the", sMeta, "conv_id", "s").collect()(0)
    assert(r.getAs[Long]("n") == ss.length.toLong)
    assert(r.getAs[Int]("min_len") == ss.map(_.length).min)
    assert(r.getAs[Int]("max_len") == ss.map(_.length).max)
    assert(math.abs(r.getAs[Double]("avg_len") -
      ss.map(_.length).sum.toDouble / ss.length) < 1e-9)
    assert(math.abs(r.getAs[Double]("entropy") - want) < 1e-9)
  }
}
