package graft

import org.apache.spark.sql.SparkSession

import killa.Conf
import killa.query.IndexReader

/** Serving-latency diagnostic over an existing index snapshot: per-term
  * block counts (which decide the local/parallel/distributed routing) and
  * per-query wall times through the serving APIs. Args: <indexRoot> [cpus].
  */
object QueryDiag {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("killa-qdiag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = Conf(nBuckets = 32, rangeDocs = 131072, waveBuckets = 32, blockSize = 128)
    val reader = new IndexReader(spark, root, conf)
    Seq("the", "query", "filter", "join").foreach { t =>
      val n = reader.postingBlocks(t).count()
      val df = reader.termDf(Seq(t))(t)
      println(s"term=$t blocks=$n df=$df routing=${if (n > conf.localQueryBlocks) "distributed" else if (n > conf.localParBlocks) "parallel-local" else "local"}")
    }
    val queries: Seq[(String, () => Long)] = Seq(
      "membership_hot" -> (() => reader.membershipCount("the")),
      "bm25_single_hot" -> (() => reader.bm25TopKRows(Seq("the"), 10).length.toLong),
      "bm25_single_mid" -> (() => reader.bm25TopKRows(Seq("query"), 10).length.toLong),
      "bm25_multi" -> (() => reader.bm25TopKRows(Seq("query", "filter", "join"), 10).length.toLong),
      "bm25_conj" -> (() => reader.bm25TopKRows(Seq("query", "filter"), 10, conjunctive = true).length.toLong))
    queries.foreach(_._2()) // warm
    queries.foreach { case (name, fn) =>
      val ts = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-18s median=${ts.sorted.apply(2)}%8.1f ms  min=${ts.min}%8.1f ms")
    }
    spark.stop()
  }
}
