package killa.store

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** One committed snapshot of the index (Iceberg-style: an immutable manifest
  * naming the live data directories; see SURVEY.md §7.3 — the Iceberg runtime
  * jar is unavailable offline, so this thin seam implements the same
  * snapshot/atomic-commit semantics over plain Parquet + a JSON manifest, and
  * keeps `spark.read.format("iceberg")` a one-line swap later).
  *
  * Queries read one manifest version ⇒ consistent snapshot (the analog of the
  * reference's copy-out `Get`, StringIndex.cs:19-24). Maintenance rewrites
  * only affected term buckets and commits a new version ⇒ O(Δ-buckets)
  * incremental updates at scale.
  *
  * @param buckets     term-bucket → parquet commit dir holding `bkt_p=<b>`
  * @param docsDirs    ordered docId-dictionary log dirs (last-wins per docId)
  * @param forwardDirs ordered forward-index log dirs (doc → term/tf rows;
  *                    last-wins per docId by batchSeq)
  * @param posBuckets  optional positional index (term, docId) → position
  *                    list, term-bucketed like the posting segments: bucket →
  *                    its CURRENT bkt_p dir. Built by
  *                    IndexWriter.buildPositions; content batches rewrite
  *                    only the affected buckets (IndexMaintainer), pure
  *                    delete/rename batches touch nothing (docIds are stable
  *                    and dead docs filter out at query time)
  * @param bucketDicts per-bucket term-dictionary summary (the sidecar of
  *                    VERDICT r2 #7): the set of distinct leading 2-char
  *                    term prefixes (None once it exceeds the cap — then the
  *                    bucket never prunes) plus the term-length range.
  *                    Buckets are HASH-laid, so plain min/max term spans the
  *                    whole alphabet and prunes nothing — the prefix SET is
  *                    what lets a prefix/leading-literal-wildcard scan skip
  *                    buckets holding no candidate term, and the length band
  *                    does the same for fuzzy scans. Recomputed for every
  *                    bucket a build wave or maintenance batch rewrites;
  *                    absent (old manifests) = no pruning, never wrong.
  */
final case class BucketDict(prefixes: Option[Seq[String]], minLen: Int, maxLen: Int) {
  /** Could this bucket hold a term starting with `p`? (conservative) */
  def mayHavePrefix(p: String): Boolean = prefixes match {
    case None => true
    case Some(ps) =>
      if (p.length >= SegmentStore.DictPrefixLen)
        ps.contains(p.take(SegmentStore.DictPrefixLen))
      else ps.exists(_.startsWith(p))
  }
  /** Could this bucket hold a term with length in [lo, hi]? */
  def mayHaveLen(lo: Int, hi: Int): Boolean = maxLen >= lo && minLen <= hi
}

final case class Manifest(
    version: Int,
    nBuckets: Int,
    buckets: Map[Int, String],
    docsDirs: Seq[String],
    forwardDirs: Seq[String],
    numDocs: Long,
    totalTokens: Long,
    avgdl: Double,
    maxDocId: Long,
    batchSeq: Long,
    posBuckets: Map[Int, String] = Map.empty,
    bucketDicts: Map[Int, BucketDict] = Map.empty) {
  def bucketPath(b: Int): Option[String] = buckets.get(b).map(dir => s"$dir/bkt_p=$b")
  /** Current positions dir of one term bucket (already a bkt_p leaf). */
  def posPath(b: Int): Option[String] = posBuckets.get(b)
}

object SegmentStore {
  /** Leading-prefix length of the bucket term-dictionary summary. */
  val DictPrefixLen = 2
  /** Distinct-prefix cap per bucket: beyond it the summary stores None
    * (a near-saturated prefix set prunes nothing but bloats the manifest).
    */
  val DictMaxPrefixes = 512

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def snapshotsDir(root: String): String = s"$root/snapshots"

  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val dir = new Path(snapshotsDir(root))
    val f = fs(spark, root)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt
        }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def read(spark: SparkSession, root: String, version: Int): Manifest = {
    val p = new Path(f"${snapshotsDir(root)}/v$version%06d.json")
    val in = fs(spark, root).open(p)
    val node = try mapper.readTree(in) finally in.close()
    def intMap(field: String): Map[Int, String] = {
      if (!node.has(field)) return Map.empty
      val bnode = node.get(field)
      val it = bnode.fieldNames()
      val b = Map.newBuilder[Int, String]
      while (it.hasNext) { val k = it.next(); b += (k.toInt -> bnode.get(k).asText()) }
      b.result()
    }
    def strs(field: String): Seq[String] = {
      val arr = node.get(field)
      (0 until arr.size()).map(arr.get(_).asText())
    }
    val dicts: Map[Int, BucketDict] = {
      if (!node.has("bucketDicts")) Map.empty
      else {
        val dnode = node.get("bucketDicts")
        val it = dnode.fieldNames()
        val b = Map.newBuilder[Int, BucketDict]
        while (it.hasNext) {
          val k = it.next(); val v = dnode.get(k)
          val ps =
            if (!v.has("p") || v.get("p").isNull) None
            else Some((0 until v.get("p").size()).map(v.get("p").get(_).asText()))
          b += (k.toInt -> BucketDict(ps, v.get("lo").asInt(), v.get("hi").asInt()))
        }
        b.result()
      }
    }
    Manifest(
      version = node.get("version").asInt(),
      nBuckets = node.get("nBuckets").asInt(),
      buckets = intMap("buckets"),
      docsDirs = strs("docsDirs"),
      forwardDirs = strs("forwardDirs"),
      numDocs = node.get("numDocs").asLong(),
      totalTokens = node.get("totalTokens").asLong(),
      avgdl = node.get("avgdl").asDouble(),
      maxDocId = node.get("maxDocId").asLong(),
      batchSeq = node.get("batchSeq").asLong(),
      posBuckets = intMap("posBuckets"),
      bucketDicts = dicts)
  }

  def latest(spark: SparkSession, root: String): Option[Manifest] =
    latestVersion(spark, root).map(read(spark, root, _))

  final case class VacuumStats(removedSnapshots: Int, removedDirs: Int)

  /** Expire old snapshots and delete the data directories only they
    * reference — the Iceberg `expire_snapshots` analog. Every maintenance
    * batch rewrites its affected buckets into NEW commit dirs (old versions
    * stay readable for snapshot isolation), so a long-running index
    * accumulates dead segment files; vacuum bounds that.
    *
    * Keeps the newest `keepLast` manifests. Deletable = (referenced by an
    * EXPIRED manifest) minus (referenced by a kept manifest) — like Iceberg's
    * expire_snapshots, paths referenced by NO manifest are never touched:
    * they are the uncommitted output of an in-flight build or maintenance
    * batch (or of a crashed, ledger-resumable one), and deleting them would
    * lose data a writer is about to commit or a resume will re-reference.
    * Safe to run concurrently with writers for the same reason. Readers
    * pinned to an expired version break — the standard retention contract;
    * pick `keepLast` ≥ the longest reader lifetime. Build lineage
    * (`builds/`, `ledger/`) is resume state, not snapshot data — untouched.
    *
    * Metadata-only driver work (per-manifest reference sets, one delete per
    * dead dir — no data scan), so it runs the same at any corpus size.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): VacuumStats = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, root)
    val snapDir = new Path(snapshotsDir(root))
    if (!f.exists(snapDir)) return VacuumStats(0, 0)
    val versions = f.listStatus(snapDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt
      }.sorted
    if (versions.isEmpty) return VacuumStats(0, 0)
    def norm(s: String): String = new Path(s).toUri.getPath
    def refs(m: Manifest): Set[String] =
      (m.buckets.keys.flatMap(m.bucketPath) ++ m.docsDirs ++ m.forwardDirs ++
        m.posBuckets.values).map(norm).toSet
    val kept = versions.takeRight(keepLast).map(read(spark, root, _))
    val expired = versions.dropRight(keepLast)
    val live: Set[String] = kept.flatMap(refs).toSet
    val dead: Set[String] = expired.map(read(spark, root, _)).flatMap(refs).toSet -- live

    var removedDirs = 0
    dead.toSeq.sorted.foreach { d =>
      val p = new Path(d)
      if (f.exists(p)) { f.delete(p, true); removedDirs += 1 }
    }
    // a posting/positions commit dir whose bkt_p children are all gone is an
    // empty shell — drop it, but ONLY if no DIRECTORY children remain (a
    // remaining dir may be an in-flight writer's not-yet-committed bucket;
    // marker FILES like parquet's _SUCCESS survive the bkt_p vacuums and
    // must not keep a dead shell alive forever — ADVICE r3)
    def childDirs(p: Path): Seq[Path] =
      if (f.exists(p)) f.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq else Nil
    Seq("data", "positions").foreach { sub =>
      childDirs(new Path(s"$root/$sub")).foreach { commit =>
        if (f.exists(commit) && !f.listStatus(commit).exists(_.isDirectory)) {
          f.delete(commit, true); ()
        }
      }
    }
    expired.foreach(v => f.delete(new Path(f"${snapshotsDir(root)}/v$v%06d.json"), false))
    VacuumStats(expired.length, removedDirs)
  }

  /** Atomic commit: write v{N+1} to a temp file, then rename into place. */
  def commit(spark: SparkSession, root: String, m: Manifest): Manifest = {
    val v = latestVersion(spark, root).getOrElse(0) + 1
    val toWrite = m.copy(version = v)
    val node: ObjectNode = mapper.createObjectNode()
    node.put("version", toWrite.version)
    node.put("nBuckets", toWrite.nBuckets)
    val bnode = node.putObject("buckets")
    toWrite.buckets.toSeq.sortBy(_._1).foreach { case (k, p) => bnode.put(k.toString, p) }
    val dnode = node.putArray("docsDirs")
    toWrite.docsDirs.foreach(dnode.add)
    val fnode = node.putArray("forwardDirs")
    toWrite.forwardDirs.foreach(fnode.add)
    val pnode = node.putObject("posBuckets")
    toWrite.posBuckets.toSeq.sortBy(_._1).foreach { case (k, p) => pnode.put(k.toString, p) }
    val dicts = node.putObject("bucketDicts")
    toWrite.bucketDicts.toSeq.sortBy(_._1).foreach { case (k, d) =>
      val dn = dicts.putObject(k.toString)
      d.prefixes match {
        case None => dn.putNull("p")
        case Some(ps) => val arr = dn.putArray("p"); ps.foreach(arr.add)
      }
      dn.put("lo", d.minLen); dn.put("hi", d.maxLen)
    }
    node.put("numDocs", toWrite.numDocs)
    node.put("totalTokens", toWrite.totalTokens)
    node.put("avgdl", toWrite.avgdl)
    node.put("maxDocId", toWrite.maxDocId)
    node.put("batchSeq", toWrite.batchSeq)
    val f = fs(spark, root)
    f.mkdirs(new Path(snapshotsDir(root)))
    val tmp = new Path(f"${snapshotsDir(root)}/.tmp-v$v%06d.json")
    val dst = new Path(f"${snapshotsDir(root)}/v$v%06d.json")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    if (!f.rename(tmp, dst))
      throw new IllegalStateException(s"manifest commit race: $dst already exists")
    toWrite
  }
}
