package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.ann.Ann

/** Round-5t layer: product-quantization ANN (Jégou et al., PAMI 2011 — the
  * FAISS IndexPQ shape): deterministic per-subspace codebooks, native
  * codegen encode, ADC compressed-domain scan, exact re-rank.
  */
class Round5tSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val q = e.where(col("vec_id") < 3)
    .select(col("vec_id").as("q_id"), col("embedding"))

  test("PQ at nCandidates >= corpus ≡ brute force (the registered oracle shape)") {
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = Ann.pqTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nSub = 8, nCentroids = 16, nCandidates = 1000, refineIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "full-candidate PQ diverged from brute force")
  }

  test("PQ sub-linear candidates: precision 1 on identity, recall floor, full k returned") {
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 40 candidates of a 500-vector corpus = a 12.5× scan cut after the 32×
    // byte cut of the codes themselves
    val narrow = Ann.pqTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nSub = 8, nCentroids = 16, nCandidates = 40, refineIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // never fabricates: every returned cosine is the true cosine
    val allCos = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(narrow.toSet.subsetOf(allCos))
    assert(narrow.length == brute.size) // still a full top-k per query
    val recall = narrow.count(t => brute.contains((t._1, t._2))).toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall collapsed at 40/500 candidates: $recall")
  }

  test("PqEncode: nSub codes, all in [1, nCentroids]; deterministic across runs") {
    import killa.expr.PqEncode
    val cbs = Array.tabulate(8)(s => Array.tabulate(16)(c =>
      Array.tabulate(8)(i => ((s + 1) * (c + 1) * (i + 1) % 7 - 3).toFloat / 3f)))
    val once = e.select(col("vec_id"), PqEncode.encodeCol(col("embedding"), cbs).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(once.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 1 && c <= 16)))
    val again = e.select(col("vec_id"), PqEncode.encodeCol(col("embedding"), cbs).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(once == again)
  }
}
