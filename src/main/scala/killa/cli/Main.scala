package killa.cli

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import killa.Conf
import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.query.IndexReader
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
  *   qp <prefix|glob>          prefix/wildcard search (reference README TODO)
  *   qf <term> [maxDist]       fuzzy search (Levenshtein over terms)
  *   qfo <term> [maxDist]      OSA fuzzy (ES default: transposition = 1 edit)
  *   qrange <lo> <hi>          lexicographic term range [lo, hi)
  *   qs <suffix>               suffix search (reversed-term sub-index)
  *   qlw <glob>                leading-wildcard search via the reversed tree
  *   revbuild <parquet>        build the reversed-term sub-index
  *   grambuild                 build the trigram dictionary sub-index
  *   qin <glob>                infix wildcard via the trigram tree
  *   suggest <term> [d] [n]    did-you-mean: close spellings by df desc
  *   qr <pattern>              regex term search (anchor with ^...$)
  *   bm25 <k> <term>... [NOT <term>...]  top-k BM25, boolean NOT exclusions
  *   snip <parquet> <term> [w] keyword-in-context snippets for hits
  *   slop <n> <term>...        ordered proximity phrase (each gap ≤ 1 + n)
  *   page <k> <conv> <score> <term>...  cursor pagination (searchAfter)
  *   mlt <conv> [k] [maxDfPct] more-like-this via forward-index term selection
  *   qat <version> <term>      time-travel membership at a pinned snapshot
  *   sub <parquet> <source> [mask]   subscribe/add mask + backfill (Program.cs:67-79)
  *   unsub <source> [mask]     unsubscribe source or one mask + de-index (Program.cs:80-90)
  *   del <conv>...             delete event: de-index + drop conv-specific
  *                             masks (FileAnalyzer.cs:267-295)
  *   ren <from> <to>           rename event: Switch + remap conv-specific
  *                             mask to the new name (FileAnalyzer.cs:298-328)
  *   index?                    IsIndexing                  (Program.cs:91-97)
  *   sub?                      list `source|path|mask...`  (Program.cs:98-107)
  *   build <parquet> [source]  full (resumable) index build
  *   ingest <dir> [source] [mask...]  one ingestion pass (watcher analog)
  *   watch <dir> [source] [mask...]   daemon: repeat ingestion passes until
  *                             <root>/watch.stop appears (FileSystemWatcher
  *                             persistence, FileAnalyzer.cs:144-168)
  *   repl                      interactive verb loop (Program.cs:115-126)
  *   flush                     clear the index (StringIndex.cs:84-89)
  *   compact                   fold the docs/forward logs (GC analog)
  *   vacuum [keepLast]         expire old snapshots + dead segment dirs
  *   status                    manifest + ledger summary
  * }}}
  */
object Main {
  private val mapper = new ObjectMapper()
  private val conf = Conf(nBuckets = 32, waveBuckets = 32)

  /** One subscription: a parquet path + its glob masks over conv_id — the
    * analog of the reference's per-folder watcher with multiplexed file
    * masks (FileAnalyzer.cs:34-47, 100-120; masks lower-cased at :100).
    */
  private[killa] final case class Subscription(path: String, masks: Seq[String])

  private def sourcesPath(root: String) = new Path(s"$root/sources.json")

  private[killa] def readSources(spark: SparkSession, root: String): Map[String, Subscription] = {
    val p = sourcesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val node = try mapper.readTree(in) finally in.close()
    val it = node.fieldNames()
    val b = Map.newBuilder[String, Subscription]
    while (it.hasNext) {
      val k = it.next()
      val v = node.get(k)
      val masksNode = v.get("masks")
      val masks = (0 until masksNode.size()).map(masksNode.get(_).asText())
      b += (k -> Subscription(v.get("path").asText(), masks))
    }
    b.result()
  }

  private def writeSources(spark: SparkSession, root: String, s: Map[String, Subscription]): Unit = {
    val p = sourcesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val node = mapper.createObjectNode()
    s.toSeq.sortBy(_._1).foreach { case (k, sub) =>
      val sn = node.putObject(k)
      sn.put("path", sub.path)
      val mn = sn.putArray("masks")
      sub.masks.foreach(mn.add)
    }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  /** conv_id predicate for one glob mask. */
  private def maskCond(mask: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("conv_id")
      .rlike(killa.util.Glob.toRegex(mask))

  /** Mask lifecycle on delete/rename events — parity with the reference's
    * watcher handlers: a mask equal (case-insensitively) to a DELETED conv's
    * name leaves its subscription's mask set (FileAnalyzer.cs:267-295:
    * `watcher.Filters.Remove(file)`); a mask equal to a RENAMED conv's old
    * name remaps to the new name lower-cased (FileAnalyzer.cs:298-328:
    * `Filters.Remove(old); Filters.Add(e.Name.ToLowerInvariant())`). A
    * subscription whose mask set empties is KEPT with no masks — mirroring
    * FileSystemWatcher, where an empty Filters collection matches everything
    * (and our ingest's empty-mask predicate is likewise match-all).
    */
  private[killa] def applyMaskLifecycle(spark: SparkSession, root: String,
      deletes: Seq[String], renames: Map[String, String]): Unit = {
    val sources = readSources(spark, root)
    if (sources.isEmpty || (deletes.isEmpty && renames.isEmpty)) return
    val del = deletes.map(_.toLowerCase).toSet
    val ren = renames.map { case (f, t) => f.toLowerCase -> t.toLowerCase }
    val next = sources.map { case (s, sub) =>
      val masks2 = sub.masks.flatMap { m =>
        if (del.contains(m)) None
        else ren.get(m) match {
          case Some(to) => Some(to)
          case None => Some(m)
        }
      }.distinct
      s -> sub.copy(masks = masks2)
    }
    if (next != sources) writeSources(spark, root, next)
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
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        spark.stop()
        sys.exit(2)
    } finally spark.stop()
  }

  private[killa] def run(spark: SparkSession, root: String, verb: String, rest: Array[String]): Unit = {
    lazy val session = new QuerySession(spark, root, conf)
    // fixed-arity verbs fail as clean usage errors (exit 2), not MatchError /
    // NoSuchElementException stack traces (ADVICE r3)
    val minArity = Map("build" -> 1, "posbuild" -> 1, "unsub" -> 1, "sub" -> 2, "ren" -> 2,
      "slop" -> 2, "mlt" -> 1, "qat" -> 2, "page" -> 4, "suggest" -> 1,
      "qr" -> 1, "qany" -> 1, "sig" -> 1, "qsyn" -> 2, "dbq" -> 1,
      "qpp" -> 1, "qsf" -> 2, "explain" -> 2,
      "qs" -> 1, "qlw" -> 1, "revbuild" -> 1, "qin" -> 1)
    minArity.get(verb).filter(rest.length < _).foreach { n =>
      throw new IllegalArgumentException(s"$verb requires at least $n argument(s)")
    }
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
      case "posbuild" => // positional index for phrase queries
        new IndexWriter(spark, root, conf)
          .buildPositions(spark.read.parquet(rest.head), s"pos-${stableId(rest.head)}")
        println("positions built")
      case "phrase" =>
        session.phrase(rest.toSeq).orderBy("conv_id").collect()
          .foreach(r => println(r.getString(0)))
      case "slop" => // slop <n> <term>...: ordered proximity phrase
        session.reader.phrase(rest.drop(1).toSeq, slop = rest.head.toInt)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "qpp" => // qpp <term>... <prefix>: match_phrase_prefix (last arg
        // is the incomplete word — "qpp batch s" matches "batch s…")
        session.reader.phrasePrefix(rest.dropRight(1).toSeq, rest.last)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "qsf" => // qsf <term> <limit>: span_first (first occurrence
        // inside the doc's leading <limit> positions)
        session.reader.spanFirst(rest.head, rest(1).toInt)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "explain" => // explain <conv> <term>...: per-term BM25 breakdown
        session.reader.bm25Explain(rest.head, rest.drop(1).toSeq).collect()
          .foreach(r => println(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}" +
            s"\t${r.getLong(3)}\t${r.getDouble(4)}\t${r.getDouble(5)}"))
      case "mlt" => // mlt <conv> [k] [maxDfPct]: more-like-this
        val k = rest.lift(1).map(_.toInt).getOrElse(10)
        val pct = rest.lift(2).map(_.toInt).getOrElse(50)
        session.reader.moreLikeThis(rest.head, k = k, maxDfPct = pct).collect()
          .foreach(r => println(s"${r.getString(0)}\t${r.getDouble(1)}"))
      case "qat" => // qat <version> <term>: time-travel membership query
        new IndexReader(spark, root, conf, pinVersion = Some(rest.head.toInt))
          .membership(rest(1)).orderBy("conv_id").collect()
          .foreach(r => println(r.getString(0)))
      case "page" => // page <k> <afterConv> <afterScore> <term>...: searchAfter
        session.reader.bm25TopKAfter(rest.drop(3).toSeq, rest.head.toInt,
            rest(1), rest(2).toDouble).collect()
          .foreach(r => println(s"${r.getString(0)}\t${r.getDouble(1)}"))
      case "qr" => // qr <pattern>: regex term search (anchor with ^...$)
        session.reader.membershipRegex(rest.head)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "revbuild" => // revbuild <parquet>: reversed-term sub-index
        killa.build.ReverseIndex.build(spark, root,
          spark.read.parquet(rest.head), conf,
          buildId = s"rev-${stableId(rest.head)}")
        println("reversed index built")
      case "qs" => // qs <suffix>: terms ending with <suffix>
        killa.build.ReverseIndex.membershipSuffix(spark, root, conf, rest.head)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "qlw" => // qlw <glob>: leading-wildcard mask via the reversed tree
        killa.build.ReverseIndex.membershipWildcardReversed(spark, root, conf, rest.head)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "grambuild" => // trigram dictionary sub-index (infix masks)
        killa.build.GramIndex.build(spark, root, conf)
        println("gram index built")
      case "qin" => // qin <glob>: infix wildcard via the trigram tree
        killa.build.GramIndex.membershipInfix(spark, root, conf, rest.head)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "suggest" => // suggest <term> [maxDist] [n]: did-you-mean
        val d = rest.lift(1).map(_.toInt).getOrElse(1)
        val n = rest.lift(2).map(_.toInt).getOrElse(5)
        session.reader.suggest(rest.head, d, n).collect()
          .foreach(r => println(s"${r.getString(0)}\t${r.getLong(1)}"))
      case "qf" => // fuzzy search: qf <term> [maxDist]
        val d = rest.lift(1).map(_.toInt).getOrElse(1)
        session.searchFuzzy(rest.headOption.orNull, d)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "qfo" => // OSA fuzzy (ES default: transposition = 1 edit): qfo <term> [maxDist]
        val d = rest.lift(1).map(_.toInt).getOrElse(1)
        session.searchFuzzyOsa(rest.headOption.orNull, d)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "qrange" => // lexicographic term range [lo, hi): qrange <lo> <hi>
        session.searchTermRange(rest.headOption.orNull, rest.lift(1).orNull)
          .orderBy("conv_id").collect().foreach(r => println(r.getString(0)))
      case "bm25" =>
        // bm25 <k> <term[^boost]>... [MIN <m>] [NOT <term>...] — `^boost`
        // suffixes are ES-style per-term boosts, `MIN m` is
        // minimum_should_match, terms after a literal NOT are exclusions
        val k = rest.head.toInt
        val pos = List.newBuilder[String]
        val neg = List.newBuilder[String]
        val boosts = scala.collection.mutable.Map.empty[String, Double]
        var minM = 1
        var inNot = false
        var i = 1
        while (i < rest.length) {
          rest(i) match {
            case "NOT" => inNot = true
            // the inNot arm comes BEFORE the MIN keyword: a literal token
            // "MIN" inside the NOT section is an excluded term, not the
            // minimum_should_match keyword (MIN must precede NOT)
            case t if inNot => neg += t
            case "MIN" if i + 1 < rest.length => minM = rest(i + 1).toInt; i += 1
            case t =>
              val caret = t.lastIndexOf('^')
              if (caret > 0) {
                pos += t.take(caret)
                boosts(t.take(caret)) = t.drop(caret + 1).toDouble
              } else pos += t
          }
          i += 1
        }
        session.topK(pos.result(), k, mustNot = neg.result(),
            minShouldMatch = minM, boosts = boosts.toMap).collect()
          .foreach(r => println(s"${r.getString(0)}\t${r.getDouble(1)}"))
      case "qany" => // qany <term>...: OR membership (terms query / synonyms)
        session.reader.membershipAny(rest.toSeq).orderBy("conv_id").collect()
          .foreach(r => println(r.getString(0)))
      case "qsyn" => // qsyn <k> <grp,grp,...>...: synonym-group scored BM25
        session.reader.bm25SynonymsTopK(
            rest.drop(1).map(_.split(",").toSeq).toSeq, rest.head.toInt)
          .collect().foreach(r => println(s"${r.getString(0)}\t${r.getDouble(1)}"))
      case "dbq" => // dbq <term>...: delete-by-query (match set leaves index)
        new killa.maintain.IndexMaintainer(spark, root, conf)
          .deleteByQuery(rest.toSeq)
        println("deleted")
      case "sig" => // sig <term> [n]: significant terms of the match set (JLH)
        val n = rest.lift(1).map(_.toInt).getOrElse(10)
        session.reader.significantTerms(rest.head, n).collect()
          .foreach(r => println(
            s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getDouble(3)}"))
      case "snip" => // snip <parquet> <term> [width]: render hit contexts
        val width = rest.lift(2).map(_.toInt).getOrElse(3)
        val term = rest(1)
        killa.query.Snippets.forTerm(spark.read.parquet(rest.head),
            session.search(term), term, width)
          .orderBy("conv_id").collect()
          .foreach(r => println(s"${r.getString(0)}|${r.getInt(1)}|${r.getString(3)}"))
      case "build" =>
        val src = if (rest.length > 1) rest(1) else "default"
        new IndexWriter(spark, root, conf)
          .fullBuild(spark.read.parquet(rest.head), buildId = s"cli-${stableId(rest.head)}", source = src)
        println("built")
      case "sub" =>
        // sub <parquet> <source> [mask]: register (or extend) a subscription.
        // Re-subbing an existing source ADDS the mask to its set and indexes
        // the newly-matching convs only — reference mask multiplexing
        // (FileAnalyzer.cs:100-120; masks lower-cased at :100).
        val Array(path, source) = rest.take(2)
        val mask = rest.lift(2).getOrElse("*").toLowerCase
        val sources = readSources(spark, root)
        sources.get(source) match {
          case Some(sub) if sub.path != path =>
            throw new IllegalArgumentException(
              s"source $source already subscribed to ${sub.path}")
          case Some(sub) if sub.masks.contains(mask) =>
            println(s"already subscribed $source $mask") // idempotent
          case existing =>
            val masks = existing.map(_.masks).getOrElse(Nil) :+ mask
            writeSources(spark, root, sources + (source -> Subscription(path, masks)))
            val turns = spark.read.parquet(path).where(maskCond(mask))
            val batch = s"sub-${stableId(s"$source|$mask")}"
            if (SegmentStore.latest(spark, root).isEmpty)
              new IndexWriter(spark, root, conf).fullBuild(turns, batch, source)
            else
              new IndexMaintainer(spark, root, conf)
                .applyChanges(turns, source = source, batchId = batch)
            println(s"subscribed $source $mask")
        }
      case "unsub" =>
        // unsub <source> [mask]: without a mask the whole source is
        // de-indexed; with a mask only docs matched by it AND by no remaining
        // mask leave the index (FileAnalyzer.cs:199-220 per-mask case)
        val source = rest.head
        val maskOpt = rest.lift(1).map(_.toLowerCase)
        val sources = readSources(spark, root)
        val maint = new IndexMaintainer(spark, root, conf)
        (sources.get(source), maskOpt) match {
          case (None, _) => println(s"not subscribed: $source")
          case (Some(_), None) =>
            maint.removeSource(source, s"unsub-${stableId(source)}")
            writeSources(spark, root, sources - source)
            println(s"unsubscribed $source")
          case (Some(sub), Some(mask)) =>
            val remaining = sub.masks.filterNot(_ == mask)
            if (remaining.size == sub.masks.size) println(s"no such mask on $source: $mask")
            else {
              import org.apache.spark.sql.functions.{col, lit}
              val m0 = SegmentStore.latest(spark, root)
              m0.foreach { m =>
                val alive = killa.store.Logs.docsAlive(spark, m)
                  .select(col("convId").as("conv_id"), col("source"))
                val keep = remaining
                  .map(r => col("conv_id").rlike(killa.util.Glob.toRegex(r)))
                  .reduceOption(_ || _).getOrElse(lit(false))
                val victims = alive.where(col("source") === source &&
                  col("conv_id").rlike(killa.util.Glob.toRegex(mask)) && !keep)
                  .select("conv_id")
                maint.removeConvs(victims, s"unsub-${stableId(s"$source|$mask")}")
              }
              val next = if (remaining.isEmpty) sources - source
                else sources + (source -> sub.copy(masks = remaining))
              writeSources(spark, root, next)
              println(s"unsubscribed $source $mask")
            }
        }
      case "del" =>
        // delete events: de-index + conv-specific mask drop
        // (FileAnalyzer.cs:267-295 — delete supersedes pending work, then
        // the file's own mask leaves the watcher)
        val convs = rest.toSeq
        new IndexMaintainer(spark, root, conf)
          .remove(convs, s"del-${stableId(convs.mkString(","))}")
        applyMaskLifecycle(spark, root, convs, Map.empty)
        println(s"deleted ${convs.length}")
      case "ren" =>
        // rename event: Switch + conv-specific mask remap
        // (FileAnalyzer.cs:298-328)
        val Array(from, to) = rest.take(2)
        new IndexMaintainer(spark, root, conf)
          .rename(from, to, s"ren-${stableId(s"$from|$to")}")
        applyMaskLifecycle(spark, root, Nil, Map(from -> to))
        println(s"renamed $from -> $to")
      case "watch" =>
        // watch <dir> [source] [mask...]: persistent-watcher parity
        // (FileSystemWatcher, FileAnalyzer.cs:144-168) — repeated
        // AvailableNow ingestion passes over the directory until
        // <root>/watch.stop appears; the shared streaming checkpoint makes
        // each pass pick up only newly-arrived files.
        val src = if (rest.length > 1) rest(1) else "stream"
        val masks = if (rest.length > 2) rest.drop(2).toSeq.map(_.toLowerCase) else Seq("*")
        val stop = new Path(s"$root/watch.stop")
        val fs = stop.getFileSystem(spark.sparkContext.hadoopConfiguration)
        var total = 0L
        while (!fs.exists(stop)) {
          total += StreamOps.ingestTranscripts(spark, rest.head, root, conf, src, masks)
          Thread.sleep(sys.env.getOrElse("KILLA_WATCH_INTERVAL_MS", "250").toLong)
        }
        fs.delete(stop, false)
        println(s"watch stopped after $total batches")
      case "ingest" =>
        val src = if (rest.length > 1) rest(1) else "stream"
        val masks = if (rest.length > 2) rest.drop(2).toSeq.map(_.toLowerCase) else Seq("*")
        val n = StreamOps.ingestTranscripts(spark, rest.head, root, conf, src, masks)
        println(s"ingested $n batches")
      case "index?" =>
        println(if (session.isIndexing) "indexing" else "idle")
      case "sub?" =>
        // `source|path|mask1|mask2` — parity with the reference's listing
        // (FileAnalyzer.cs:34-47 prints path + its mask set)
        readSources(spark, root).toSeq.sortBy(_._1)
          .foreach { case (s, sub) => println((s +: sub.path +: sub.masks).mkString("|")) }
      case "flush" =>
        QuerySession.flush(spark, root)
        println("flushed")
      case "compact" =>
        val m = new IndexMaintainer(spark, root, conf).compact()
        println(s"compacted to version ${m.version}")
      case "vacuum" => // vacuum [keepLast]: expire old snapshots + dead dirs
        val keep = rest.headOption.map(_.toInt).getOrElse(1)
        val st = SegmentStore.vacuum(spark, root, keep)
        println(s"vacuumed: ${st.removedSnapshots} snapshots, ${st.removedDirs} dirs")
      case "repl" =>
        // the reference CLI's interactive loop (Program.cs:115-126): read
        // verb lines from stdin until EOF or `exit`, dispatching each to the
        // same handlers; one warm SparkSession serves every command
        var line = scala.io.StdIn.readLine()
        while (line != null && line.trim != "exit") {
          val parts = line.trim.split("\\s+").filter(_.nonEmpty)
          if (parts.nonEmpty) {
            if (parts(0) == "repl") System.err.println("already in repl")
            else
              try run(spark, root, parts(0), parts.drop(1))
              catch {
                case e: Exception => System.err.println(s"error: ${e.getMessage}")
              }
          }
          line = scala.io.StdIn.readLine()
        }
      case "status" =>
        SegmentStore.latest(spark, root) match {
          case None => println("no index")
          case Some(m) =>
            println(s"version=${m.version} docs=${m.numDocs} tokens=${m.totalTokens} " +
              f"avgdl=${m.avgdl}%.2f buckets=${m.buckets.size}/${m.nBuckets} batchSeq=${m.batchSeq}")
        }
      case other =>
        // thrown, not sys.exit: main() maps it to exit code 2, the repl
        // loop reports and continues (Program.cs prints and re-prompts)
        throw new IllegalArgumentException(s"unknown verb: $other")
    }
  }

  private def stableId(s: String): String =
    f"${killa.util.Hashing.fnv1a64(s)}%08x".takeRight(8)
}
