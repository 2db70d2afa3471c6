package killa.query

import scala.collection.mutable

import killa.codec.{Delta, Varint}
import killa.model.PostingBlock

/** Document-at-a-time scoring over decoded posting blocks within one docId
  * range — the executor-side kernel of the distributed top-k
  * (SURVEY.md §3.1 Spark analog). Blocks are decoded lazily and skipped via
  * their (firstDoc, lastDoc, maxTf, minDl) metadata:
  *
  *  - conjunctive mode (posting-list intersection): driven by the rarest
  *    term; other terms seek forward block-by-block without decoding
  *    non-overlapping blocks;
  *  - disjunctive mode: all docs in the union are scored, but per-term
  *    block-max upper bounds (admissible impact bound from maxTf/minDl) let
  *    whole blocks be skipped once the local top-k heap's threshold exceeds
  *    the best score any doc in the block could reach (block-max WAND-style
  *    pruning; admission uses ≥ so score-equal boundary docs are never
  *    dropped — SURVEY.md §7.5.1).
  *
  * Scores are summed in query-term order for every doc ⇒ bit-identical to
  * the relational oracle's ordered fold.
  */
object Daat {

  /** Cursor over one term's blocks restricted to docId ∈ (lo, hi]. */
  private final class TermCursor(blocks: Array[PostingBlock], lo: Long, hi: Long) {
    private var bi = 0
    private var i = 0
    private var docs: Array[Long] = _
    private var tfs: Array[Long] = _
    private var dls: Array[Long] = _
    advanceToRange()

    private def decodeCurrent(): Unit = {
      val b = blocks(bi)
      docs = Delta.decode(b.docsBin, b.n)
      tfs = Varint.decode(b.tfsBin, b.n)
      dls = Varint.decode(b.dlsBin, b.n)
      i = 0
      while (i < b.n && docs(i) <= lo) i += 1
    }

    private def advanceToRange(): Unit = {
      while (bi < blocks.length && blocks(bi).lastDoc <= lo) bi += 1
      if (bi < blocks.length && blocks(bi).firstDoc <= hi) decodeCurrent()
      else docs = null
      skipExhausted()
    }

    private def skipExhausted(): Unit = {
      while (docs != null && i >= docs.length) {
        bi += 1
        if (bi < blocks.length && blocks(bi).firstDoc <= hi) decodeCurrent()
        else docs = null
      }
      if (docs != null && docs(i) > hi) docs = null
    }

    def exhausted: Boolean = docs == null
    def doc: Long = docs(i)
    def tf: Long = tfs(i)
    def dl: Long = dls(i)

    def next(): Unit = { i += 1; skipExhausted() }

    /** Seek to the first posting with docId ≥ target (block-skipping). */
    def seek(target: Long): Unit = {
      if (docs == null) return
      if (docs(i) >= target) return
      // skip whole blocks without decoding
      if (blocks(bi).lastDoc < target) {
        while (bi < blocks.length && blocks(bi).lastDoc < target) bi += 1
        if (bi < blocks.length && blocks(bi).firstDoc <= hi) decodeCurrent()
        else { docs = null; return }
      }
      while (i < docs.length && docs(i) < target) i += 1
      skipExhausted()
    }

    /** Admissible upper bound on this term's impact for its current block. */
    def blockMaxImpact(k1: Double, b: Double, avgdl: Double): Double = {
      val blk = blocks(bi)
      Bm25.impact(blk.maxTf, blk.minDl, k1, b, avgdl)
    }
  }

  /** Local top-k candidate set with score-tie retention: keeps every doc
    * whose score ties the running k-th-best, so the *global* tie-break
    * (score desc, conv_id asc — applied after the dictionary join) is exact
    * even though postings only carry docIds and docId order stops matching
    * conv_id order once maintenance has appended documents. A doc pruned
    * here scores strictly below ≥ k docs of its own range, so it can never
    * reach the global top-k under any tie-break.
    */
  private final class TopK(k: Int) {
    private val minHeap = mutable.PriorityQueue.empty[Double](Ordering[Double].reverse)
    private val buf = mutable.ArrayBuffer.empty[(Long, Double)]
    def threshold: Double = if (minHeap.size < k) Double.NegativeInfinity else minHeap.head
    def offer(score: Double, doc: Long): Unit = {
      if (score >= threshold) { // ≥ admits ties (SURVEY.md §7.5.1)
        buf += ((doc, score))
        if (minHeap.size < k) minHeap.enqueue(score)
        else if (score > minHeap.head) { minHeap.dequeue(); minHeap.enqueue(score) }
      }
    }
    def drain(): Iterator[(Long, Double)] = {
      val t = threshold
      buf.iterator.filter(_._2 >= t)
    }
  }

  /** Score all qualifying docs with docId ∈ (lo, hi]; emit the local top-k.
    *
    * @param termBlocks per query term (in query order), that term's blocks
    *                   sorted by firstDoc; empty array = term absent.
    * @param weights    per-term premultiplied BM25 weight idf·(k1+1).
    */
  def scoreRange(
      termBlocks: Array[Array[PostingBlock]],
      weights: Array[Double],
      lo: Long, hi: Long, k: Int,
      conjunctive: Boolean,
      k1: Double, b: Double, avgdl: Double): Iterator[(Long, Double)] = {
    val nT = termBlocks.length
    if (conjunctive && termBlocks.exists(_.isEmpty)) return Iterator.empty
    val cursors = termBlocks.map(new TermCursor(_, lo, hi))
    val heap = new TopK(k)

    if (conjunctive) {
      // intersection driven by max-of-heads with block skipping
      while (cursors.forall(!_.exhausted)) {
        var target = Long.MinValue
        var t = 0
        while (t < nT) { if (cursors(t).doc > target) target = cursors(t).doc; t += 1 }
        var aligned = true
        t = 0
        while (t < nT && aligned) {
          cursors(t).seek(target)
          if (cursors(t).exhausted) return heap.drain()
          if (cursors(t).doc != target) aligned = false
          t += 1
        }
        if (aligned) {
          var score = 0.0
          t = 0
          while (t < nT) {
            score += Bm25.contrib(weights(t), cursors(t).tf, cursors(t).dl, k1, b, avgdl)
            t += 1
          }
          heap.offer(score, target)
          t = 0
          while (t < nT) { cursors(t).next(); t += 1 }
        }
      }
    } else {
      // disjunctive union with block-max pruning: before scoring the current
      // minimum doc, bound its best possible score by the sum of current
      // block maxima of the terms whose cursor could contain it; if that
      // bound < threshold, advance past without decoding contributions.
      var live = cursors.count(!_.exhausted)
      while (live > 0) {
        var cand = Long.MaxValue
        var t = 0
        while (t < nT) {
          if (!cursors(t).exhausted && cursors(t).doc < cand) cand = cursors(t).doc
          t += 1
        }
        // upper bound for cand using block maxima of cursors positioned at it
        var bound = 0.0
        t = 0
        while (t < nT) {
          if (!cursors(t).exhausted && cursors(t).doc == cand)
            bound += weights(t) * cursors(t).blockMaxImpact(k1, b, avgdl)
          t += 1
        }
        if (bound >= heap.threshold) {
          var score = 0.0
          t = 0
          while (t < nT) {
            if (!cursors(t).exhausted && cursors(t).doc == cand) {
              score += Bm25.contrib(weights(t), cursors(t).tf, cursors(t).dl, k1, b, avgdl)
            }
            t += 1
          }
          heap.offer(score, cand)
        }
        // advance all cursors sitting on cand
        t = 0
        while (t < nT) {
          if (!cursors(t).exhausted && cursors(t).doc == cand) cursors(t).next()
          t += 1
        }
        live = cursors.count(!_.exhausted)
      }
    }
    heap.drain()
  }
}
