package killa

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.codec.{Delta, Varint}
import killa.model.PostingBlock
import killa.query.Daat

/** Round-6 optimization gates: the lazy-decode DAAT cursor, the fused
  * commit read-back, and the signed-zero presentation fix must all preserve
  * the exact pre-optimization results.
  */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- deterministic synthetic posting lists (no Spark needed) ----------

  /** Build a term's blocks from (docId, tf, dl) triples, blockSize postings
    * per block — the same layout IndexWriter emits.
    */
  private def mkBlocks(term: String, rows: Seq[(Long, Long, Long)],
      blockSize: Int): Array[PostingBlock] = {
    val sorted = rows.sortBy(_._1)
    val df = sorted.length.toLong
    sorted.grouped(blockSize).zipWithIndex.map { case (g, bi) =>
      val ds = g.map(_._1).toArray
      val ts = g.map(_._2).toArray
      val ls = g.map(_._3).toArray
      PostingBlock(term, bi.toLong, df, g.length, ds.head, ds.last,
        ts.max, ls.min, Delta.encode(ds), Varint.encode(ts), Varint.encode(ls), 0)
    }.toArray
  }

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(killa.util.Hashing.splitmix64).drop(1)

  private def synthTerm(term: String, seed: Long, nDocs: Int, maxDoc: Long)
      : Array[PostingBlock] = {
    val docs = rng(seed).map(h => math.floorMod(h, maxDoc))
      .distinct.take(nDocs).toSeq.sorted
    val rows = docs.map { d =>
      val h = killa.util.Hashing.splitmix64(d ^ seed)
      (d, 1L + math.floorMod(h, 9L), 20L + math.floorMod(h >>> 8, 80L))
    }
    mkBlocks(term, rows, blockSize = 16)
  }

  /** Exact top-k the slow way: decode everything, score, sort. */
  private def bruteTopK(termBlocks: Array[Array[PostingBlock]],
      weights: Array[Double], k: Int, conjunctive: Boolean,
      k1: Double, b: Double, avgdl: Double): Seq[(Long, Double)] = {
    val perTerm = termBlocks.map { bs =>
      bs.flatMap { blk =>
        val ds = Delta.decode(blk.docsBin, blk.n)
        val ts = Varint.decode(blk.tfsBin, blk.n)
        val ls = Varint.decode(blk.dlsBin, blk.n)
        (0 until blk.n).map(i => ds(i) -> ((ts(i), ls(i))))
      }.toMap
    }
    val allDocs = perTerm.flatMap(_.keys).distinct
    val scored = allDocs.flatMap { d =>
      val present = perTerm.count(_.contains(d))
      if (conjunctive && present < termBlocks.length) None
      else {
        var s = 0.0
        perTerm.indices.foreach { t =>
          perTerm(t).get(d).foreach { case (tf, dl) =>
            s += killa.query.Bm25.contrib(weights(t), tf, dl, k1, b, avgdl)
          }
        }
        Some((d, s))
      }
    }
    val top = scored.sortBy { case (d, s) => (-s, d) }
    if (top.isEmpty) Seq.empty
    else {
      val kth = top(math.min(k, top.length) - 1)._2
      top.takeWhile(_._2 >= kth) // ties retained, like TopK.drain
    }
  }

  test("lazy-decode cursor: scoreRange equals brute force over random range decompositions") {
    val k1 = 1.2; val b = 0.75; val avgdl = 55.0
    val t1 = synthTerm("alpha", 0xA1L, nDocs = 400, maxDoc = 1000)
    val t2 = synthTerm("beta", 0xB2L, nDocs = 150, maxDoc = 1000)
    val t3 = synthTerm("gamma", 0xC3L, nDocs = 40, maxDoc = 1000)
    val termBlocks = Array(t1, t2, t3)
    val weights = termBlocks.map(bs => killa.query.Bm25.weight(1000, bs(0).df, k1))
    for (conjunctive <- Seq(false, true); k <- Seq(1, 5, 23)) {
      val expect = bruteTopK(termBlocks, weights, k, conjunctive, k1, b, avgdl)
        .toSet
      // single full range: every doc scoring ≥ the k-th best (ties retained)
      val one = Daat.scoreRange(termBlocks, weights, -1L, Long.MaxValue, k,
        conjunctive, k1, b, avgdl).toSet
      assert(one == expect, s"single-range mismatch conj=$conjunctive k=$k")
      // the global top-k (ties included) must be recoverable from any
      // decomposition: split (lo, hi] at pseudo-random boundaries and take
      // the global merge of per-range results, exactly like the fan-out
      for (seed <- 1L to 5L) {
        val cuts = (-1L +: rng(seed).map(h => math.floorMod(h, 1002L) - 1)
          .take(6).toSeq :+ 1001L).distinct.sorted
        val merged = cuts.zip(cuts.tail).flatMap { case (lo, hi) =>
          Daat.scoreRange(termBlocks, weights, lo, hi, k, conjunctive,
            k1, b, avgdl)
        }
        val kept = {
          val st = merged.sortBy { case (d, s) => (-s, d) }
          if (st.isEmpty) st else {
            val kth = st(math.min(k, st.length) - 1)._2
            st.takeWhile(_._2 >= kth)
          }
        }
        assert(kept.toSet == expect,
          s"decomposition mismatch conj=$conjunctive k=$k seed=$seed cuts=$cuts")
      }
    }
  }

  test("lazy-decode cursor: exclusion and include filters unchanged across decompositions") {
    val k1 = 1.2; val b = 0.75; val avgdl = 55.0
    val t1 = synthTerm("alpha", 0xA1L, 400, 1000)
    val ex = synthTerm("not", 0xEEL, 120, 1000)
    val inc = synthTerm("flt", 0xF1L, 300, 1000)
    val weights = Array(killa.query.Bm25.weight(1000, t1(0).df, k1))
    val full = Daat.scoreRange(Array(t1), weights, -1L, Long.MaxValue, 9,
      false, k1, b, avgdl, Array(ex), includeBlocks = Array(inc)).toSet
    val exDocs = ex.flatMap(blk => Delta.decode(blk.docsBin, blk.n)).toSet
    val incDocs = inc.flatMap(blk => Delta.decode(blk.docsBin, blk.n)).toSet
    assert(full.nonEmpty)
    assert(full.forall { case (d, _) => !exDocs.contains(d) && incDocs.contains(d) })
    for (seed <- 1L to 3L) {
      val cuts = (-1L +: rng(seed).map(h => math.floorMod(h, 1002L) - 1)
        .take(4).toSeq :+ 1001L).distinct.sorted
      val merged = cuts.zip(cuts.tail).flatMap { case (lo, hi) =>
        Daat.scoreRange(Array(t1), weights, lo, hi, 9, false, k1, b, avgdl,
          Array(ex), includeBlocks = Array(inc))
      }
      val st = merged.sortBy { case (d, s) => (-s, d) }
      val kth = st(math.min(9, st.length) - 1)._2
      assert(st.takeWhile(_._2 >= kth).toSet == full, s"filtered mismatch seed=$seed")
    }
  }

  test("fused bucketMetricsAndDicts equals the two separate read-backs") {
    import spark.implicits._
    val conf = Conf(nBuckets = 4, rangeDocs = 8, waveBuckets = 4, blockSize = 4)
    val turns = (0 until 40).map { i =>
      killa.model.Turn(f"c$i%03d", 0, "user",
        s"alpha beta w$i shared${i % 3}", "", new java.sql.Timestamp(0L))
    }.toDS().toDF()
    val root = TestSpark.freshDir("r6-fused")
    new IndexWriter(spark, root, conf).fullBuild(turns, "b0")
    // the wave's commit dir is the only bkt_p dir under data/
    val dataDir = new java.io.File(s"$root/data")
    val commit = dataDir.listFiles().filter(_.isDirectory).head.getAbsolutePath
    val (mFused, dFused) = IndexWriter.bucketMetricsAndDicts(spark, commit)
    val mSep = IndexWriter.bucketMetrics(spark, commit, 0 until 4)
    val dSep = IndexWriter.bucketDictSummaries(spark, commit)
    assert(mFused == mSep)
    assert(dFused == dSep)
  }

  test("meanPoolNormalized presents -0.0 for a zero-rounding negative mean (DuckDB parity)") {
    import spark.implicits._
    // dim 0 mean = -5e-8 (rounds to zero, negative), dim 1 mean = 1 → nrm ≈ 1
    val vecs = Seq(
      (0L, Array(-1e-7f, 1f)),
      (0L, Array(0f, 1f))
    ).toDF("g", "v")
    val got = killa.ann.Pooling.meanPoolNormalized(vecs, col("g"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 2)
    val v0 = got.find(_._2 == 0L).get._3
    assert(java.lang.Double.doubleToRawLongBits(v0) ==
      java.lang.Double.doubleToRawLongBits(-0.0),
      s"dim-0 must present as -0.0, got bits of $v0")
    // positive zeros stay +0.0
    val vecs2 = Seq((0L, Array(1e-7f, 1f)), (0L, Array(0f, 1f))).toDF("g", "v")
    val got2 = killa.ann.Pooling.meanPoolNormalized(vecs2, col("g"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w0 = got2.find(_._2 == 0L).get._3
    assert(java.lang.Double.doubleToRawLongBits(w0) ==
      java.lang.Double.doubleToRawLongBits(0.0))
  }

  test("native vector kernels are bit-identical to the HOF folds they replace") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic fixture: random float vectors incl. empty, zero, tiny,
    // mismatched lengths and null elements — the HOF edge-case surface
    val rs = rng(0xbeefL).take(4000).toSeq
    def f(h: Long): Float = ((h >>> 16).toInt.toFloat / Int.MaxValue.toFloat)
    val rows: Seq[(Array[java.lang.Float], Array[java.lang.Float])] =
      (0 until 200).map { i =>
        val la = i % 7 match { case 0 => 0; case 1 => 1; case _ => 8 + (i % 5) }
        val lb = if (i % 11 == 3) la + 1 else la // occasional length mismatch
        val a = Array.tabulate[java.lang.Float](la) { j =>
          if (i % 13 == 5 && j == la / 2) null
          else java.lang.Float.valueOf(
            if (i % 17 == 7) 0f else f(rs((i * 19 + j) % rs.length)))
        }
        val b = Array.tabulate[java.lang.Float](lb) { j =>
          java.lang.Float.valueOf(f(rs((i * 23 + j + 1) % rs.length)))
        }
        (a, b)
      }
    val df = rows.toDF("a", "b")
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val hofCos = hofDot(col("a"), col("b")) /
      (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b"))))
    val cmp = df.select(
      hofDot(col("a"), col("b")).as("hd"),
      killa.expr.VecExprs.dotCol(col("a"), col("b")).as("nd")).collect()
    cmp.foreach { r =>
      def bits(i: Int): Any =
        if (r.isNullAt(i)) null else java.lang.Double.doubleToRawLongBits(r.getDouble(i))
      assert(bits(0) == bits(1), s"dot mismatch: ${r.mkString("|")}")
    }
    // cosine: the HOF divide THROWS under ANSI when a norm is exactly 0
    // (empty or all-zero vector) — an input no registered fixture contains
    // (every ANN query passes today). Equality is pinned on the non-throwing
    // domain; on zero norms the native kernel's IEEE NaN is asserted as the
    // documented (strictly more robust) behavior.
    def zeroNorm(a: Array[java.lang.Float]): Boolean =
      a.forall(_ != null) && a.forall(x => x.floatValue() == 0f)
    val safe = rows.filterNot { case (a, b) => zeroNorm(a) || zeroNorm(b) }
    val ccmp = safe.toDF("a", "b").select(
      hofCos.as("hc"),
      killa.expr.VecExprs.cosineCol(col("a"), col("b")).as("nc")).collect()
    ccmp.foreach { r =>
      def bits(i: Int): Any =
        if (r.isNullAt(i)) null else java.lang.Double.doubleToRawLongBits(r.getDouble(i))
      assert(bits(0) == bits(1), s"cosine mismatch: ${r.mkString("|")}")
    }
    val zn = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
      .select(killa.expr.VecExprs.cosineCol(col("a"), col("b"))).collect()(0)
    assert(zn.getDouble(0).isNaN, "zero-norm cosine must be IEEE NaN")
    // integer kernels: int8-code dot and packed-lane hamming vs the HOF forms
    val lrows: Seq[(Array[java.lang.Long], Array[java.lang.Long])] =
      (0 until 200).map { i =>
        val la = i % 6 match { case 0 => 0; case _ => 3 + (i % 4) }
        val lb = if (i % 9 == 2) la + 2 else la
        val a = Array.tabulate[java.lang.Long](la) { j =>
          if (i % 15 == 4 && j == 0) null
          else java.lang.Long.valueOf(math.floorMod(rs((i * 29 + j) % rs.length), 255L) - 127L)
        }
        val b = Array.tabulate[java.lang.Long](lb) { j =>
          java.lang.Long.valueOf(math.floorMod(rs((i * 31 + j + 5) % rs.length), 255L) - 127L)
        }
        (a, b)
      }
    val ldf = lrows.toDF("a", "b")
    val lcmp = ldf.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + coalesce(x, lit(0L))).as("hd"),
      killa.expr.VecExprs.dotCodesCol(col("a"), col("b")).as("nd"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, c) => acc + coalesce(c, lit(0L))).as("hh"),
      killa.expr.VecExprs.hammingLanesCol(col("a"), col("b")).as("nh")).collect()
    lcmp.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"codes dot mismatch: ${r.mkString("|")}")
      assert(r.getLong(2) == r.getLong(3), s"hamming mismatch: ${r.mkString("|")}")
    }
  }
}
