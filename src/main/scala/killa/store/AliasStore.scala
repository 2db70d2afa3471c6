package killa.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Index aliases — the Elasticsearch `_aliases` API's core use: a stable
  * serving name that atomically re-points between index roots, so a
  * reindex/reshard ([[killa.maintain.IndexMaintainer.reindexTo]]) goes live
  * with ONE metadata flip and zero downtime. Readers resolve the alias at
  * construction and then serve their pinned snapshot (SegmentStore
  * isolation), so an in-flight query never observes the flip; the next
  * reader sees the new target.
  *
  * Storage: one versioned JSON file per alias under `<dir>/_aliases/<name>/`
  * — the SAME write-temp-then-rename commit protocol manifests use
  * (SegmentStore.commit), giving last-writer-wins with no torn reads on any
  * filesystem with atomic rename. Versions make the flip history
  * inspectable (`history`), mirroring manifest time travel.
  */
object AliasStore {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def aliasDir(dir: String, name: String): String = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad alias name: $name")
    s"$dir/_aliases/$name"
  }

  /** Point `name` at `target` (an index root path). Atomic: readers see
    * either the old target or the new, never a partial write. Returns the
    * new alias version. */
  def set(spark: SparkSession, dir: String, name: String, target: String): Int = {
    val ad = aliasDir(dir, name)
    val f = fs(spark, ad)
    f.mkdirs(new Path(ad))
    val v = latestVersion(spark, dir, name).getOrElse(0) + 1
    val tmp = new Path(f"$ad/.tmp-v$v%06d.json")
    val dst = new Path(f"$ad/v$v%06d.json")
    val bytes = s"""{"version": $v, "target": ${jsonStr(target)}}"""
      .getBytes("UTF-8")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!f.rename(tmp, dst))
      throw new IllegalStateException(s"alias commit race: $dst already exists")
    v
  }

  /** Current target of `name`, if the alias exists. */
  def resolve(spark: SparkSession, dir: String, name: String): Option[String] =
    latestVersion(spark, dir, name).map(v => readTarget(spark, dir, name, v))

  /** A reader over the alias's CURRENT target — resolution happens here,
    * once; the returned reader then serves its pinned snapshot regardless
    * of later flips (the zero-downtime property). */
  def reader(spark: SparkSession, dir: String, name: String,
      conf: killa.Conf): killa.query.IndexReader = {
    val target = resolve(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(s"no such alias: $name under $dir"))
    new killa.query.IndexReader(spark, target, conf)
  }

  /** All alias names under `dir`. */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val base = new Path(s"$dir/_aliases")
    val f = fs(spark, base.toString)
    if (!f.exists(base)) Nil
    else f.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
      .toSeq.sorted
  }

  /** The alias's full flip history, oldest first: (version, target). */
  def history(spark: SparkSession, dir: String, name: String): Seq[(Int, String)] =
    versions(spark, dir, name).map(v => (v, readTarget(spark, dir, name, v)))

  /** Delete the alias (its targets stay untouched). */
  def remove(spark: SparkSession, dir: String, name: String): Boolean = {
    val ad = new Path(aliasDir(dir, name))
    val f = fs(spark, ad.toString)
    f.exists(ad) && f.delete(ad, true)
  }

  private def versions(spark: SparkSession, dir: String, name: String): Seq[Int] = {
    val ad = new Path(aliasDir(dir, name))
    val f = fs(spark, ad.toString)
    if (!f.exists(ad)) Nil
    else f.listStatus(ad).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .toSeq.sorted
  }

  private def latestVersion(spark: SparkSession, dir: String, name: String): Option[Int] =
    versions(spark, dir, name).lastOption

  private def readTarget(spark: SparkSession, dir: String, name: String, v: Int): String = {
    val p = new Path(f"${aliasDir(dir, name)}/v$v%06d.json")
    val f = fs(spark, p.toString)
    val in = f.open(p)
    val bytes = try {
      val len = f.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      in.readFully(0, b)
      b
    } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, "UTF-8"))
    node.get("target").asText()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
