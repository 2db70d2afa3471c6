package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4) — NOT part of the
  * driver contract (Bench.scala is frozen; this is the "separate main" the
  * round rules allow). Times each registered SparkEntry query against the
  * noop sink (computes every column of every row, no output cost), labels
  * jobs, and can dump `.explain("formatted")` per query for plan audits.
  *
  * Usage:
  *   runMain graft.BenchExtra <sfDir> [queryCsv|all] [reps] [explainDir]
  *
  * Prints one JSON line: {"total_sec": N, "queries": {name: bestSec, ...}}
  * (best of `reps` — on a shared host noise only ever slows a run).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only: Option[Set[String]] =
      if (args.length > 1 && args(1) != "all")
        Some(args(1).split(",").map(_.trim).toSet)
      else None
    val reps = if (args.length > 2) args(2).toInt else 1
    val explainDir: Option[String] = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach { name =>
      try {
        val secs = (0 until reps).map { r =>
          spark.sparkContext.setJobDescription(s"$name rep$r")
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val s = (System.nanoTime() - t0) / 1e9
          if (r == 0) explainDir.foreach { d =>
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$d/$name.txt"), plan)
          }
          s
        }
        times(name) = secs.min
        System.err.println(f"[benchextra] $name%-32s ${secs.min}%8.3f s (${secs.map(x => f"$x%.3f").mkString(",")})")
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}")
          times(name) = -1.0
      }
    }
    val total = times.values.filter(_ >= 0).sum
    val qs = times.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"total_sec":$total%.2f,"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
