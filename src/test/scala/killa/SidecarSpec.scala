package killa

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.model.Turn
import killa.query.IndexReader

/** Per-bucket term-dictionary sidecar (VERDICT r2 #7): prefix and
  * length-band scans must skip buckets whose summaries exclude every
  * candidate term, results must be identical to the unpruned oracle, and
  * maintenance rewrites must keep the summaries fresh.
  */
class SidecarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // 16 terms with 16 distinct 2-char prefixes, hash-spread over 8 buckets:
  // any single prefix lives in exactly one bucket, so a prefix query that
  // cannot prune would scan ~8× the data it needs
  private val prefixes = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
    "ij", "kl", "mn", "op", "qr", "st", "uv", "wx")

  private lazy val turns = prefixes.zipWithIndex.map { case (p, i) =>
    Turn(s"c$i", 0, "user", s"${p}word$i common", "", new Timestamp(i * 1000L))
  }.toDS().toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("sidecar")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }

  test("prefix queries prune to the buckets whose dictionaries hold the prefix") {
    val r = new IndexReader(spark, root, conf)
    val all = r.prunedBucketPaths(None, None)
    assert(all.size >= 4, s"fixture spread too narrow: ${all.size} buckets")
    prefixes.foreach { p =>
      val pruned = r.prunedBucketPaths(Some(p), None)
      assert(pruned.nonEmpty, s"false prune for $p")
      assert(pruned.size * 2 < all.size,
        s"prefix $p pruned only ${all.size - pruned.size} of ${all.size} buckets")
    }
    // an absent prefix prunes EVERY bucket — the query never touches parquet
    assert(r.prunedBucketPaths(Some("zz"), None).isEmpty)
    assert(r.membershipPrefix("zz").isEmpty)
  }

  test("pruned prefix/wildcard/fuzzy results equal the relational oracle") {
    val r = new IndexReader(spark, root, conf)
    def oracle(pred: String => Boolean): Set[String] =
      turns.collect().map(row => (row.getString(0), row.getString(3))).filter {
        case (_, text) => text.split(' ').exists(pred)
      }.map(_._1).toSet
    Seq("aa", "ij", "w").foreach { p =>
      val got = r.membershipPrefix(p).collect().map(_.getString(0)).toSet
      assert(got == oracle(_.startsWith(p)), s"prefix $p")
      assert(got.nonEmpty, s"vacuous prefix $p")
    }
    val viaMask = r.membershipWildcard("aa*0").collect().map(_.getString(0)).toSet
    assert(viaMask == oracle(t => t.startsWith("aa") && t.endsWith("0")))
    // fuzzy: length band [len±1] — matches the oracle, and an impossible
    // band (no term is 19-21 chars) prunes every bucket up front
    val fz = r.membershipFuzzy("aaword0", 1).collect().map(_.getString(0)).toSet
    assert(fz == oracle(t => lev(t, "aaword0") <= 1))
    assert(r.prunedBucketPaths(None, Some((19, 21))).isEmpty)
  }

  test("maintenance rewrites refresh the sidecar (no stale prefixes, no lost ones)") {
    val rt = TestSpark.freshDir("sidecarm")
    new IndexWriter(spark, rt, conf).fullBuild(turns, "b0")
    val maint = new IndexMaintainer(spark, rt, conf)
    // c0 owns the only aa* term; deleting it rewrites its buckets
    maint.remove(Seq("c0"), "d1")
    val r = new IndexReader(spark, rt, conf)
    assert(r.membershipPrefix("aa").isEmpty)
    assert(r.prunedBucketPaths(Some("aa"), None).isEmpty,
      "stale sidecar kept claiming the deleted prefix")
    // a NEW prefix arriving via maintenance becomes visible to pruning
    val add = Seq(Turn("c99", 0, "user", "zzfresh common", "", new Timestamp(0L)))
      .toDS().toDF()
    maint.applyChanges(add, batchId = "a1")
    val r2 = new IndexReader(spark, rt, conf)
    assert(r2.membershipPrefix("zz").collect().map(_.getString(0)).toSet == Set("c99"))
    assert(r2.prunedBucketPaths(Some("zz"), None).nonEmpty)
    // untouched prefixes keep answering
    assert(r2.membershipPrefix("bb").collect().map(_.getString(0)).toSet == Set("c1"))
  }
}
