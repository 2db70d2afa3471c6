package killa.cli

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import killa.Conf
import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.session.QuerySession
import killa.store.SegmentStore
import killa.streaming.StreamOps

/** spark-submit entry point mirroring the reference CLI verbs
  * (ElasticKilla.CLI/Program.cs:43-113):
  *
  * {{{
  * spark-submit --class killa.cli.Main <jar> <indexRoot> <verb> [args...]
  *   q <term>                  immediate search            (Program.cs:52-66)
  *   qw <term>                 quiescent search            (Program.cs:53-59)
  *   bm25 <k> <term>...        top-k BM25 (baseline addition)
  *   sub <parquet> <source>    subscribe: register + backfill (Program.cs:67-79)
  *   unsub <source>            unsubscribe + de-index      (Program.cs:80-90)
  *   index?                    IsIndexing                  (Program.cs:91-97)
  *   sub?                      list subscriptions          (Program.cs:98-107)
  *   build <parquet> [source]  full (resumable) index build
  *   ingest <dir> [source]     continuous ingestion (watcher analog)
  *   flush                     clear the index (StringIndex.cs:84-89)
  *   compact                   fold the docs/forward logs (GC analog)
  *   status                    manifest + ledger summary
  * }}}
  */
object Main {
  private val mapper = new ObjectMapper()
  private val conf = Conf(nBuckets = 32, waveBuckets = 32)

  private def sourcesPath(root: String) = new Path(s"$root/sources.json")

  private def readSources(spark: SparkSession, root: String): Map[String, String] = {
    val p = sourcesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val node = try mapper.readTree(in) finally in.close()
    val it = node.fieldNames()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val k = it.next(); b += (k -> node.get(k).asText()) }
    b.result()
  }

  private def writeSources(spark: SparkSession, root: String, s: Map[String, String]): Unit = {
    val p = sourcesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val node = mapper.createObjectNode()
    s.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: killa.cli.Main <indexRoot> <verb> [args...]")
      sys.exit(2)
    }
    val root = args(0)
    val verb = args(1)
    val rest = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName(s"killa-$verb")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; default to local mode otherwise
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, root, verb, rest)
    finally spark.stop()
  }

  private def run(spark: SparkSession, root: String, verb: String, rest: Array[String]): Unit = {
    lazy val session = new QuerySession(spark, root, conf)
    verb match {
      case "q" =>
        session.search(rest.headOption.orNull).collect().foreach(r => println(r.getString(0)))
      case "qw" =>
        session.delayedSearch(rest.headOption.orNull).collect()
          .foreach(r => println(r.getString(0)))
      case "qp" => // prefix/wildcard search (reference README TODO)
        val mask = rest.headOption.getOrElse("")
        val hits = if (mask.exists(c => c == '*' || c == '?')) session.searchWildcard(mask)
          else session.searchPrefix(mask)
        hits.orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "bm25" =>
        val k = rest.head.toInt
        session.topK(rest.drop(1).toSeq, k).collect()
          .foreach(r => println(f"${r.getString(0)}%s\t${r.getDouble(1)}%.6f"))
      case "build" =>
        val src = if (rest.length > 1) rest(1) else "default"
        new IndexWriter(spark, root, conf)
          .fullBuild(spark.read.parquet(rest.head), buildId = s"cli-${stableId(rest.head)}", source = src)
        println("built")
      case "sub" =>
        val Array(path, source) = rest.take(2)
        val sources = readSources(spark, root)
        writeSources(spark, root, sources + (source -> path))
        val turns = spark.read.parquet(path)
        if (SegmentStore.latest(spark, root).isEmpty)
          new IndexWriter(spark, root, conf).fullBuild(turns, s"sub-${stableId(source)}", source)
        else
          new IndexMaintainer(spark, root, conf)
            .applyChanges(turns, source = source, batchId = s"sub-${stableId(source)}")
        println(s"subscribed $source")
      case "unsub" =>
        val source = rest.head
        new IndexMaintainer(spark, root, conf).removeSource(source, s"unsub-${stableId(source)}")
        writeSources(spark, root, readSources(spark, root) - source)
        println(s"unsubscribed $source")
      case "ingest" =>
        val src = if (rest.length > 1) rest(1) else "stream"
        val n = StreamOps.ingestTranscripts(spark, rest.head, root, conf, src)
        println(s"ingested $n batches")
      case "index?" =>
        println(if (session.isIndexing) "indexing" else "idle")
      case "sub?" =>
        readSources(spark, root).toSeq.sortBy(_._1)
          .foreach { case (s, p) => println(s"$s|$p") }
      case "flush" =>
        QuerySession.flush(spark, root)
        println("flushed")
      case "compact" =>
        val m = new IndexMaintainer(spark, root, conf).compact()
        println(s"compacted to version ${m.version}")
      case "status" =>
        SegmentStore.latest(spark, root) match {
          case None => println("no index")
          case Some(m) =>
            println(s"version=${m.version} docs=${m.numDocs} tokens=${m.totalTokens} " +
              f"avgdl=${m.avgdl}%.2f buckets=${m.buckets.size}/${m.nBuckets} batchSeq=${m.batchSeq}")
        }
      case other =>
        System.err.println(s"unknown verb: $other")
        sys.exit(2)
    }
  }

  private def stableId(s: String): String =
    f"${killa.util.Hashing.fnv1a64(s)}%08x".takeRight(8)
}
