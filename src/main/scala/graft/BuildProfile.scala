package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import killa.Conf
import killa.build.IndexWriter
import killa.synth.Synth

/** Diagnostic main: one full build per parallelism level with a stage
  * listener — prints per-stage task counts, total executor core-seconds and
  * wall time, to locate serial bottlenecks in the build. Not part of the
  * driver contract; run with `sbt "runMain graft.BuildProfile [nConvs]"`.
  */
object BuildProfile {
  private final class StageLog extends SparkListener {
    val rows = mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
      rows += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
        si.taskMetrics.executorRunTime, wall))
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(100000)
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    val conf = Conf(nBuckets = 32, rangeDocs = 131072, waveBuckets = 32, blockSize = 128)
    levels.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"profile-$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/killa-shuffle")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val turns = Synth.transcripts(spark, nConvs, 10, seed = 42L).toDF().persist()
      turns.count()
      // warmup
      val w0 = s"/root/repo/target/bench/prof-w-$cpus"
      BenchUtil.rmDir(w0)
      new IndexWriter(spark, w0, conf).fullBuild(turns, "w")
      // profiled run
      val log = new StageLog
      spark.sparkContext.addSparkListener(log)
      val root = s"/root/repo/target/bench/prof-$cpus"
      BenchUtil.rmDir(root)
      val t0 = System.nanoTime()
      new IndexWriter(spark, root, conf).fullBuild(turns, "p")
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(log)
      println(f"== cpus=$cpus wall=$wall%.2fs totalCoreSec=${log.rows.map(_._4).sum / 1e3}%.1f")
      log.rows.sortBy(-_._5).take(14).foreach { case (id, name, tasks, run, w) =>
        println(f"  stage$id%4d tasks=$tasks%3d coreSec=${run / 1e3}%7.2f wall=${w / 1e3}%6.2f  $name")
      }
      spark.stop()
    }
  }
}

object BenchUtil {
  def rmDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(path); if (f.exists()) rm(f)
  }
}
