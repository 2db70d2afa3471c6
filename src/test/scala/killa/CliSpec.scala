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

  test("delete/rename events drop or remap conv-specific masks (FileAnalyzer.cs:267-328)") {
    val root = TestSpark.freshDir("clilc")
    val data = TestSpark.freshDir("clilcdata")
    mkData(data)
    Main.run(spark, root, "sub", Array(data, "s1", "alpha1"))
    Main.run(spark, root, "sub", Array(data, "s1", "alpha2"))
    Main.run(spark, root, "sub", Array(data, "s1", "beta*"))
    val betas = (0 until 5).map(i => s"beta$i").toSet
    assert(members(root, "common") == Set("alpha1", "alpha2") ++ betas)

    // delete event: alpha1 de-indexed AND its conv-specific mask dropped;
    // the glob mask and the sibling specific mask stay (FileAnalyzer.cs:267-295)
    Main.run(spark, root, "del", Array("alpha1"))
    assert(Main.readSources(spark, root)("s1").masks == Seq("alpha2", "beta*"))
    assert(members(root, "common") == Set("alpha2") ++ betas)

    // rename event: Switch + mask remap, new name lower-cased like the
    // reference's Filters.Add(e.Name.ToLowerInvariant()) (FileAnalyzer.cs:298-328)
    Main.run(spark, root, "ren", Array("alpha2", "GAMMA7"))
    assert(Main.readSources(spark, root)("s1").masks == Seq("gamma7", "beta*"))
    assert(members(root, "ua2") == Set("GAMMA7"), "renamed conv answers under its new name")

    // deleting a conv matched only by a glob leaves the mask set untouched
    Main.run(spark, root, "del", Array("beta3"))
    assert(Main.readSources(spark, root)("s1").masks == Seq("gamma7", "beta*"))
    assert(!members(root, "common").contains("beta3"))
  }

  test("repl loop dispatches verbs from stdin until exit (Program.cs:115-126)") {
    val root = TestSpark.freshDir("clirepl")
    val data = TestSpark.freshDir("clirepldata")
    mkData(data)
    val script =
      s"""sub $data s1 alpha*
         |q ua1
         |badverb
         |index?
         |q ub1
         |exit
         |""".stripMargin
    val out = new java.io.ByteArrayOutputStream()
    Console.withIn(new java.io.StringReader(script)) {
      Console.withOut(new java.io.PrintStream(out)) {
        Main.run(spark, root, "repl", Array.empty)
      }
    }
    val lines = out.toString.linesIterator.toSeq
    assert(lines.contains("subscribed s1 alpha*"))
    assert(lines.contains("alpha1"), s"q ua1 must print its owner: $lines")
    // `index?` comes AFTER the unknown verb: its output proves the loop
    // reported the error (to stderr) and kept going, Program.cs-style
    assert(lines.contains("idle"))
    // beta1 is outside the alpha* mask → q ub1 prints nothing
    assert(!lines.contains("beta1"))
  }

  test("watch daemon: repeated ingestion passes until the stop file (FileAnalyzer.cs:144-168)") {
    val root = TestSpark.freshDir("cliwatch")
    val watched = TestSpark.freshDir("cliwatched")
    val seedDir = TestSpark.freshDir("cliseed")
    def turnsDf(rows: (String, Int, String)*) = rows.map { case (c, i, t) =>
      killa.model.Turn(c, i, "user", t, "", new Timestamp(i * 1000L))
    }.toDS().toDF()
    turnsDf(("a", 0, "alpha seed")).write.mode("overwrite").parquet(seedDir)
    Main.run(spark, root, "build", Array(seedDir))
    // first batch file exists before the watcher starts (schema inference)
    turnsDf(("b", 0, "bravo fresh")).write.mode("append").parquet(watched)

    val watcher = new Thread(() =>
      killa.cli.Main.run(spark, root, "watch", Array(watched, "w1", "*")))
    watcher.setDaemon(true)
    watcher.start()
    def owners(t: String): Set[String] =
      new IndexReader(spark, root).membership(t).collect().map(_.getString(0)).toSet
    def await(cond: => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + 120000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(250)
      cond
    }
    assert(await(owners("bravo") == Set("b")), "watcher missed the first batch")
    // a second file lands while the watcher runs — the next pass picks it up
    turnsDf(("c", 0, "charlie fresh")).write.mode("append").parquet(watched)
    assert(await(owners("charlie") == Set("c")), "watcher missed a late-arriving batch")
    assert(owners("fresh") == Set("b", "c"))
    // stop cleanly
    val stop = new org.apache.hadoop.fs.Path(s"$root/watch.stop")
    stop.getFileSystem(spark.sparkContext.hadoopConfiguration).create(stop, true).close()
    watcher.join(120000)
    assert(!watcher.isAlive, "watch verb did not stop on the stop file")
  }

  test("round-4 verbs: slop / page / mlt / qat dispatch and print hits") {
    val root = TestSpark.freshDir("clir4")
    val data = TestSpark.freshDir("clir4data")
    Seq(
      Turn("cA", 0, "user", "alpha beta gap gap gamma shared", "", new Timestamp(0L)),
      Turn("cB", 0, "user", "alpha gamma shared shared", "", new Timestamp(0L)),
      Turn("cC", 0, "user", "other words here", "", new Timestamp(0L))
    ).toDS().toDF().write.mode("overwrite").parquet(data)
    Main.run(spark, root, "build", Array(data))
    Main.run(spark, root, "posbuild", Array(data))

    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Main.run(spark, root, verb, args) }
      out.toString.split("\n").filter(_.nonEmpty).toSeq
    }

    // slop 3 admits the alpha..gamma gap in cA and the adjacent pair in cB
    assert(capture("slop", Array("3", "alpha", "gamma")) == Seq("cA", "cB"))
    assert(capture("slop", Array("0", "alpha", "gamma")) == Seq("cB"))
    // page: cursor after the first bm25 hit returns the next one
    val p1 = capture("bm25", Array("1", "shared"))
    val Array(conv1, score1) = p1.head.split("\t")
    val p2 = capture("page", Array("1", conv1, score1, "shared"))
    assert(p2.nonEmpty && p2.head.split("\t")(0) != conv1)
    // mlt: similar docs for cA exclude cA itself
    val mlt = capture("mlt", Array("cA", "5", "100"))
    assert(mlt.nonEmpty && mlt.forall(!_.startsWith("cA")))
    // qat: pinned pre-delete version still sees the deleted conv
    val v0 = killa.store.SegmentStore.latestVersion(spark, root).get
    Main.run(spark, root, "del", Array("cB"))
    assert(capture("q", Array("gamma")) == Seq("cA"))
    assert(capture("qat", Array(v0.toString, "gamma")) == Seq("cA", "cB"))
    // fixed arity: missing args fail as clean usage errors
    intercept[IllegalArgumentException](Main.run(spark, root, "page", Array("1", "cA")))
    intercept[IllegalArgumentException](Main.run(spark, root, "qat", Array("1")))
  }

  test("round-5 verbs: qpp (match_phrase_prefix) / qsf (span_first) dispatch") {
    val root = TestSpark.freshDir("clir5")
    val data = TestSpark.freshDir("clir5data")
    Seq(
      Turn("cP", 0, "user", "run scan now", "", new Timestamp(0L)),
      Turn("cQ", 0, "user", "run sort here", "", new Timestamp(0L)),
      Turn("cR", 0, "user", "scan run", "", new Timestamp(0L))
    ).toDS().toDF().write.mode("overwrite").parquet(data)
    Main.run(spark, root, "build", Array(data))
    Main.run(spark, root, "posbuild", Array(data))

    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Main.run(spark, root, verb, args) }
      out.toString.split("\n").filter(_.nonEmpty).toSeq
    }

    // "run s…" matches cP (run scan) and cQ (run sort), not cR (wrong order)
    assert(capture("qpp", Array("run", "s")) == Seq("cP", "cQ"))
    // span_first: scan at position 0 only in cR; window 2 also admits cP
    assert(capture("qsf", Array("scan", "1")) == Seq("cR"))
    assert(capture("qsf", Array("scan", "2")) == Seq("cP", "cR"))
    intercept[IllegalArgumentException](Main.run(spark, root, "qsf", Array("scan")))

    // qfo: OSA fuzzy — 'csan' reaches 'scan' in one transposition (qf at
    // the same distance finds nothing); qrange: ['ru', 'sa') hits 'run'/'runs'
    assert(capture("qfo", Array("csan", "1")) == Seq("cP", "cR"))
    assert(capture("qf", Array("csan", "1")).isEmpty)
    assert(capture("qrange", Array("ru", "sa")) == Seq("cP", "cQ", "cR"))
    assert(capture("qrange", Array("zz", "aa")).isEmpty)
  }

  test("reverse-index verbs: revbuild / qs (suffix) / qlw (leading wildcard)") {
    val root = TestSpark.freshDir("clirev")
    val data = TestSpark.freshDir("clirevdata")
    Seq(
      Turn("cA", 0, "user", "spark runs here", "", new Timestamp(0L)),
      Turn("cB", 0, "user", "park the walk", "", new Timestamp(0L)),
      Turn("cC", 0, "user", "nothing else", "", new Timestamp(0L))
    ).toDS().toDF().write.mode("overwrite").parquet(data)
    Main.run(spark, root, "revbuild", Array(data))

    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Main.run(spark, root, verb, args) }
      out.toString.split("\n").filter(_.nonEmpty).toSeq
    }

    assert(capture("qs", Array("ark")) == Seq("cA", "cB")) // spark, park
    assert(capture("qs", Array("alk")) == Seq("cB"))       // walk
    assert(capture("qs", Array("zzz")).isEmpty)
    assert(capture("qlw", Array("*ark")) == Seq("cA", "cB"))
    assert(capture("qlw", Array("?ark")) == Seq("cB"))      // park only
    intercept[IllegalArgumentException](Main.run(spark, root, "qs", Array.empty))
  }

  test("gram-index verbs: grambuild / qin (infix wildcard)") {
    val root = TestSpark.freshDir("cligram")
    val data = TestSpark.freshDir("cligramdata")
    Seq(
      Turn("cA", 0, "user", "spark merge", "", new Timestamp(0L)),
      Turn("cB", 0, "user", "customer walk", "", new Timestamp(0L)),
      Turn("cC", 0, "user", "order only", "", new Timestamp(0L))
    ).toDS().toDF().write.mode("overwrite").parquet(data)
    Main.run(spark, root, "build", Array(data))

    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Main.run(spark, root, verb, args) }
      out.toString.split("\n").filter(_.nonEmpty).toSeq
    }

    assert(capture("grambuild", Array.empty) == Seq("gram index built"))
    assert(capture("qin", Array("*mer*")) == Seq("cA", "cB")) // merge, customer
    assert(capture("qin", Array("*alk*")) == Seq("cB"))
    assert(capture("qin", Array("*zzz*")).isEmpty)
    intercept[IllegalArgumentException](Main.run(spark, root, "qin", Array.empty))
  }
}
