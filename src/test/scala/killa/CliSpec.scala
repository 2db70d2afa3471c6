package killa

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import killa.cli.Main
import killa.model.Turn
import killa.query.IndexReader

/** CLI mask-subscription semantics — mirrors the reference's per-folder mask
  * multiplexing (FileAnalyzer.cs:100-120; FileAnalyzerTests.cs:741-768):
  * adding a mask to a live subscription indexes only its new docs, removing
  * one de-indexes exactly the docs no remaining mask covers.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkData(dir: String): Unit = {
    val rows =
      (0 until 5).map(i => Turn(s"alpha$i", 0, "user", s"common ua$i", "", new Timestamp(0L))) ++
        (0 until 5).map(i => Turn(s"beta$i", 0, "user", s"common ub$i", "", new Timestamp(0L)))
    rows.toDS().toDF().write.mode("overwrite").parquet(dir)
  }

  private def members(root: String, term: String): Set[String] =
    new IndexReader(spark, root).membership(term).collect().map(_.getString(0)).toSet

  test("mask subscriptions multiplex per source; per-mask unsub removes exactly the uncovered docs") {
    val root = TestSpark.freshDir("cliroot")
    val data = TestSpark.freshDir("clidata")
    mkData(data)
    val alphas = (0 until 5).map(i => s"alpha$i").toSet

    Main.run(spark, root, "sub", Array(data, "s1", "alpha*"))
    assert(members(root, "common") == alphas, "first mask backfills only its matches")

    Main.run(spark, root, "sub", Array(data, "s1", "*0"))
    assert(members(root, "common") == alphas + "beta0",
      "adding a mask indexes only the newly-matching docs")

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.run(spark, root, "sub?", Array.empty)
    }
    assert(out.toString.trim == s"s1|$data|alpha*|*0",
      s"listing must be source|path|mask...: got '${out.toString.trim}'")

    // removing alpha*: alpha0 survives (still covered by *0), alpha1..4 leave
    Main.run(spark, root, "unsub", Array("s1", "alpha*"))
    assert(members(root, "common") == Set("alpha0", "beta0"),
      "per-mask unsub keeps docs another mask still covers")
    assert(!new IndexReader(spark, root).contains("ua3"))

    Main.run(spark, root, "unsub", Array("s1"))
    assert(members(root, "common").isEmpty, "whole-source unsub empties the source")
    assert(Main.readSources(spark, root).isEmpty)
  }
}
