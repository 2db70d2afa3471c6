package graft

import org.apache.spark.sql.SparkSession

import killa.Conf
import killa.query.IndexReader

/** Reader-replication scaling probe: one stateless serving frontend over an
  * existing on-disk index snapshot. Readers are snapshot-pinned and share
  * nothing, so query THROUGHPUT scales by adding frontends (each its own
  * driver) over the shared segment store — the standard search-serving
  * architecture — while executor count scales per-query latency of the big
  * fan-out queries. Run K instances pinned to disjoint core sets and sum
  * their printed qps: that ratio (vs one instance) is the horizontal
  * serving-scaling number the single-JVM bench cannot express (all of one
  * JVM's queries serialize through its lone DAGScheduler).
  *
  * args: <indexRoot> <cpus> <clients> <passes> [nConvs]
  */
object QpsProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val cpus = args(1).toInt
    val clients = args(2).toInt
    val passes = args(3).toInt
    val nConvs = if (args.length > 4) args(4).toInt else 2000000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("killa-qps-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir",
        sys.env.getOrElse("KILLA_LOCAL_DIR", "/dev/shm/killa-shuffle"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = Conf(nBuckets = 32, rangeDocs = 131072, waveBuckets = 32, blockSize = 128)
    val reader = new IndexReader(spark, root, conf)
    val queries: Seq[() => Long] = Seq(
      () => reader.membership("the").count(),
      () => reader.membership(s"uniq${nConvs / 2}_0").count(),
      () => reader.bm25TopK(Seq("the"), 10).count(),
      () => reader.bm25TopK(Seq("query"), 10).count(),
      () => reader.bm25TopK(Seq("query", "filter", "join"), 10).count(),
      () => reader.bm25TopK(Seq("query", "filter"), 10, conjunctive = true).count())
    queries.foreach(_.apply()) // warmup (dict cache + codegen)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
    val t0 = System.nanoTime()
    val futures = (0 until clients).map { c =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"client-$c")
          (0 until passes).foreach(_ => queries.foreach(_.apply()))
          passes * queries.length
        }
      })
    }
    val total = futures.map(_.get()).sum
    val qps = total / ((System.nanoTime() - t0) / 1e9)
    pool.shutdown()
    println(f"""{"probe_qps":$qps%.2f,"cpus":$cpus,"clients":$clients,"queries":$total}""")
    spark.stop()
  }
}
