package killa.build

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import killa.model.LedgerRow

/** Per-partition checkpoint/lineage/metrics ledger (north rule: "resumable
  * from checkpoint with per-partition lineage + metrics"). One JSONL row per
  * (buildId, step, bucket), appended driver-side (a ledger append must not
  * cost a Spark job — it is bookkeeping on the critical path of every build
  * wave). The functional replacement for the reference's per-folder
  * BackgroundTaskQueue state (BackgroundTaskQueue.cs:16-27): "pending
  * partitions > 0" is our IsIndexing, and resume = all − done.
  */
object Ledger {
  private val mapper = new ObjectMapper()

  def dir(root: String): String = s"$root/ledger"

  def append(spark: SparkSession, root: String, rows: Seq[LedgerRow]): Unit = {
    if (rows.isEmpty) return
    val d = new Path(dir(root))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(d)
    val sb = new StringBuilder
    rows.foreach { r =>
      val n = mapper.createObjectNode()
      n.put("buildId", r.buildId); n.put("step", r.step); n.put("bkt", r.bkt)
      n.put("status", r.status); n.put("termCount", r.termCount)
      n.put("postingCount", r.postingCount); n.put("blockCount", r.blockCount)
      n.put("bytes", r.bytes); n.put("wallMs", r.wallMs)
      n.put("inputVersion", r.inputVersion); n.put("error", r.error)
      sb.append(mapper.writeValueAsString(n)).append('\n')
    }
    // unique, content-addressed-ish file name → idempotent task retries
    val name = f"${r0(rows)}-${rows.length}%04d.jsonl"
    val out = fs.create(new Path(d, name), true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def r0(rows: Seq[LedgerRow]): String = {
    val h = killa.util.Hashing.fnv1a64(
      rows.map(r => s"${r.buildId}|${r.step}|${r.bkt}|${r.status}").mkString(";"))
    f"$h%016x"
  }

  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) spark.read.json(dir(root))
    else Seq.empty[LedgerRow].toDS().toDF()
  }

  /** Driver-side done-set read (no Spark job — resume decisions are cheap). */
  def doneBuckets(spark: SparkSession, root: String, buildId: String, step: String): Set[Int] = {
    val p = new Path(dir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val out = Set.newBuilder[Int]
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".jsonl")).foreach { st =>
      val in = fs.open(st.getPath)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      content.linesIterator.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.get("buildId").asText() == buildId && n.get("step").asText() == step &&
          n.get("status").asText() == "done") out += n.get("bkt").asInt()
      }
    }
    out.result()
  }
}
