package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.ann.Ann
import killa.dedup.Dedup
import killa.mm.Multimodal
import killa.text.TextOps

/** Training-data pipeline operators: dedup family, ANN, text analysis,
  * multimodal plumbing. Each op has a brute-force in-test oracle.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "der hund und die katze und das haus ist hier"),
    (5L, "el gato que la casa los perros una cosa por"),
    (6L, "short text"),
    (7L, "")
  ).toDF("doc_id", "text")

  test("exact dedup: md5 groups find the exact pair, whitespace-insensitively") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dupGroups = groups.filter(_._2 > 1)
    assert(dupGroups.length == 1)
    assert(dupGroups(0)._2 == 2 && dupGroups(0)._3 == 0L) // rep = min id
    // normalization: extra spaces don't change the fingerprint
    val spaced = Seq((0L, "a  b"), (1L, "a b")).toDF("doc_id", "text")
    assert(Dedup.exactGroups(spaced, "doc_id", "text").count() == 1)
  }

  test("n-gram jaccard: finds near-dup pair, exact values") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // 0-1 share 6 of 7 shingles each → j = 6/(7+7-6) = 0.75; 0-3 and 1-3 mirror it
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    val j01 = pairs.find(p => p._1 == 0L && p._2 == 1L).get._3
    assert(j01 == 0.75)
    val j03 = pairs.find(p => p._1 == 0L && p._2 == 3L).get._3
    assert(j03 == 1.0)
  }

  test("minhash LSH: candidates+verify reproduce the exact jaccard result here") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3,
      numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact)
  }

  test("simhash: exact dup at hamming 0; blocking finds near pairs") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p03 = pairs.find(p => p._1 == 0L && p._2 == 3L)
    assert(p03.isDefined && p03.get._3 == 0L, "identical docs → hamming 0")
    assert(pairs.forall(_._3 <= 3))
  }

  test("ANN brute force: agrees with a driver-side exact computation") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (util.Hashing.splitmix64(i * 8L + d) % 1000L).toFloat / 1000f).toArray)
    }
    val edf = vecs.toDF("vec_id", "embedding")
    val queries = edf.where(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = Ann.bruteForceTopK(edf, "vec_id", "embedding",
      queries, "q_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // driver-side oracle
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (q <- Seq(0L, 1L)) {
      val qv = vecs(q.toInt)._2
      val exp = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, math.rint(cos(qv, v) * 10000) / 10000) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val gotQ = got.filter(_._1 == q).sortBy(_._4).map(_._2)
      assert(gotQ.toSeq == exp.toSeq, s"q=$q")
    }
  }

  test("ANN LSH: exact subset with high recall vs brute force") {
    val edf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = edf.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val brute = Ann.bruteForceTopK(edf, "vec_id", "embedding", queries, "q_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(edf, "vec_id", "embedding", queries, "q_id", "embedding", 10,
      nPlanes = 32, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH returns only true vectors (precision 1 on identity), recall measured
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall too low — banding broken?")
    assert(lsh.nonEmpty)
  }

  test("ANN IVF: full probe ≡ brute force; partial probe never fabricates, recall ≈ probe fraction") {
    // q_ann_ivf_topk registers at nProbe = nCells so its DuckDB oracle is
    // exact end-to-end through the whole IVF machinery (seed → assign →
    // probe → cell scan → re-rank); the sub-linear operating point is
    // nProbe < nCells, characterized below. NOTE the driver fixture's
    // embeddings are uniform-random (no cluster structure), the worst case
    // for IVF — recall there ~ nProbe/nCells by construction, which is why
    // the registered query probes everything and real recall targets need
    // clustered data or more probes.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("embedding"))
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = Ann.ivfTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nCells = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "full-probe IVF diverged from brute force")
    // partial probe scans less and may miss — but never fabricates: every
    // returned (pair, cosine) is a true cosine (precision 1 on identity)
    val narrow = Ann.ivfTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nCells = 16, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val allCos = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(narrow.subsetOf(allCos))
    assert(narrow.size == brute.size) // still returns a full top-k per query
    val recall = narrow.count(t => brute.exists(b => b._1 == t._1 && b._2 == t._2)).toDouble / brute.size
    assert(recall >= 0.15, s"nProbe=8/16 recall collapsed: $recall")
  }

  test("IVF k-means refinement: recall at equal nProbe improves on a clustered corpus") {
    // 4 deterministic clusters around near-orthogonal one-hot centers with
    // strong noise (±0.45): sampled-point seeds sit on cluster EDGES and
    // mis-partition their cluster; Lloyd centroids average the noise out —
    // exactly the gap refineIters exists to close
    val vecs = (for (c <- 0 until 4; j <- 0 until 25) yield {
      val id = c * 25 + j
      val v = (0 until 8).map { d =>
        val noise = ((util.Hashing.splitmix64(id * 8L + d) % 900L) - 450L).toFloat / 1000f
        (if (d == 2 * c) 1.0f else 0.0f) + noise
      }.toArray
      (id.toLong, v)
    }).toDF("vec_id", "embedding").persist()
    val q = vecs.where(col("vec_id").isin(3L, 28L, 53L, 78L))
      .select(col("vec_id").as("q_id"), col("embedding"))
    val brute = Ann.bruteForceTopK(vecs, "vec_id", "embedding", q, "q_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(iters: Int): Double = {
      val got = Ann.ivfTopK(vecs, "vec_id", "embedding", q, "q_id", "embedding", 10,
          nCells = 4, nProbe = 1, refineIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val sampled = recall(0)
    val refined = recall(3)
    // deterministic fixture → deterministic recalls (measured 0.325 → 0.6:
    // nProbe=1 of 4 cells on ±0.45-noise clusters caps what ANY partition
    // can reach, so the pin is the IMPROVEMENT, not an absolute)
    assert(refined - sampled >= 0.15,
      s"refinement gained too little: sampled=$sampled refined=$refined")
    assert(sampled <= 0.45 && refined >= 0.55,
      s"recall regime shifted: sampled=$sampled refined=$refined")
    vecs.unpersist()
    ()
  }

  test("IVF broadcast-centroid assignment: identical to the literal form; production cell counts run (VERDICT r3 missing #3)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("embedding"))
    // result identity literal vs reference-object, incl. through refinement
    // (both cellOf forms run inside the Lloyd rounds)
    val lit0 = Ann.ivfTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nCells = 8, nProbe = 3, refineIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bcast = Ann.ivfTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nCells = 8, nProbe = 3, refineIters = 1, literalMaxCells = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(bcast == lit0, "broadcast-centroid path diverged from the literal path")
    // production-shaped cell count (≫ literalMaxCells — literal inlining
    // would blow up codegen here): full probe must still equal brute force
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val big = Ann.ivfTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nCells = 1024, nProbe = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(big == brute, "full-probe IVF at production cell count diverged from brute force")
  }

  test("embedding near-dup: LSH candidates + exact verify ≡ all-pairs oracle at the registered threshold (recall 1.0)") {
    // the exact data+threshold the driver verifies (sf0.01, τ=0.45): the
    // default banding must reproduce the all-pairs result EXACTLY, because
    // verification is exact (precision 1.0) and only recall could diverge
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val edf = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = Ann.nearDupPairsExact(edf, "vec_id", "embedding", 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Ann.nearDupPairs(edf, "vec_id", "embedding", 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(lsh == exact, s"$dir: recall < 1.0 — banding too deep for τ=0.45")
      assert(exact.nonEmpty, s"$dir: vacuous fixture")
    }
  }

  test("goldens on driver data (sf0.01): simhash ≡ exhaustive hamming oracle; lang-id + LSH-ANN recall pinned") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // simhash: the blocking is provably complete (pigeonhole), so the result
    // must EQUAL an independent driver-side all-pairs hamming computation
    val got = Dedup.simhashPairs(docs01, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = docs01.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        Dedup.simhash64(killa.tokenize.WhitespaceTokenizer.tokenize(r.getString(1)).toSeq))
    val exp = (for {
      i <- sigs.indices.iterator
      j <- (i + 1 until sigs.length).iterator
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2).toLong if h <= 3L
    } yield {
      val (a, b) = if (sigs(i)._1 < sigs(j)._1) (sigs(i)._1, sigs(j)._1)
        else (sigs(j)._1, sigs(i)._1)
      (a, b, h)
    }).toSet
    assert(got == exp, "simhash blocking missed or fabricated a pair")
    assert(exp.nonEmpty)
    // lang-id distribution snapshot (regression pin for the heuristic)
    val langs = TextOps.langId(docs01, "doc_id", "text")
      .groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs == Map("en" -> 382L, "und" -> 118L), s"lang-id drifted: $langs")
    // LSH-ANN at the registered banding (64 planes × 16 bands): recall vs
    // brute force on the driver's own data is exactly 1.0 — pinned as FULL
    // row equality (ids, cosine, rank) because q_ann_lsh_topk registers the
    // brute-force SQL as its DuckDB oracle on the strength of this property
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("embedding"))
    val brute = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val lsh = Ann.lshTopK(e, "vec_id", "embedding", q, "q_id", "embedding", 5,
        nPlanes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(lsh == brute, "registered-banding LSH top-k diverged from brute force")
  }

  test("text ops: token counts, quality features, fingerprints") {
    val q = TextOps.qualityFeatures(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(0L).getAs[Long]("n_tokens") == 9L)
    assert(q(7L).getAs[Long]("n_tokens") == 0L)
    assert(q(7L).getAs[Double]("punct_ratio") == 0.0)
    val counts = docs.select(col("doc_id"),
      TextOps.wsTokenCount(col("text")).as("ws"),
      TextOps.bpeishTokenCount(col("text")).as("bpe")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts(0L) == ((9L, 9L)))
    assert(counts(7L) == ((0L, 0L)))
    // punctuation splits in bpe-ish but not ws
    val punct = Seq((0L, "a,b c")).toDF("doc_id", "text")
    val r = punct.select(TextOps.wsTokenCount(col("text")),
      TextOps.bpeishTokenCount(col("text"))).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L) // [a][,][b][c]
  }

  test("lang id heuristic: marker languages detected, priority tie-break") {
    val preds = TextOps.langId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "en")
    assert(preds(4L) == "de")
    assert(preds(5L) == "es")
    assert(preds(7L) == "und")
  }

  test("multimodal: batched stub decode is deterministic, schema intact") {
    val rows = Multimodal.payloadize(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(spark, rows, batchSize = 3).collect()
      .sortBy(_.id)
    assert(feats.length == 8)
    assert(feats(0).n_bytes == docs.collect()(0).getString(1).getBytes("UTF-8").length)
    assert(feats(7).n_bytes == 0)
    assert(feats.forall(_.decoded_by == "stub"))
    // determinism across runs
    val again = Multimodal.extractFeatures(spark, rows, batchSize = 5).collect().sortBy(_.id)
    assert(feats.map(_.content_hash).toSeq == again.map(_.content_hash).toSeq)
  }

  test("repetition features: top/dup n-gram fractions, short-doc zeros") {
    val rep = Seq(
      (0L, "a b a b a b"),   // bigrams: ab,ba,ab,ba,ab → tot 5, top 3, dup 5
      (1L, "a b c d e"),     // all distinct → dup 0, top 1/4
      (2L, "x"),             // < n tokens → 0 slots
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionFeatures(rep, "doc_id", "text", 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((5L, 0.6, 1.0)))
    assert(got(1L) == ((4L, 0.25, 0.0)))
    assert(got(2L) == ((0L, 0.0, 0.0)))
    assert(got(3L) == ((0L, 0.0, 0.0)))
  }

  test("unigram logprob: corpus-LM mean token logprob, exact values") {
    // corpus tf: a=3, b=2, c=1 → total 6
    val lm = Seq((0L, "a a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(lm, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) == ((3L, r4((2 * math.log(3 / 6.0) + math.log(2 / 6.0)) / 3))))
    assert(got(1L) == ((3L, r4((math.log(3 / 6.0) + math.log(2 / 6.0) + math.log(1 / 6.0)) / 3))))
  }

  test("connected components: chains merge transitively, singletons self-label") {
    // clusters: {1,2,3,4} (a chain — pairwise evidence only), {7,9}, {5}, {8}
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 7L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(verts, "doc_id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 7L))
    val kept = Dedup.keepFromClusters(
      Dedup.connectedComponents(verts, "doc_id", edges))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 7L, 8L))
    // no edges at all → identity labeling
    val none = Dedup.connectedComponents(verts, "doc_id",
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none.forall { case (k, v) => k == v })
  }

  test("filtered ANN: pre-filter semantics — top-k over allowed vectors only") {
    val dim = 8
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() * 2 - 1)
    }
    val emb = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") === 0).select(col("vec_id").as("q_id"), col("embedding"))
    val allowed = emb.where(col("vec_id") % 2 === 1).select("vec_id")
    val got = Ann.filteredTopK(emb, "vec_id", "embedding", q, "q_id", "embedding", 5,
      allowed, "vec_id").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.length == 5 && got.forall { case (id, _) => id % 2 == 1 })
    // ≡ brute force over the pre-filtered table
    val want = Ann.bruteForceTopK(emb.where(col("vec_id") % 2 === 1),
      "vec_id", "embedding", q, "q_id", "embedding", 5)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("normalize: lowercase, non-alnum runs collapse, trim") {
    val rows = Seq((0L, "  Hello,   WORLD!x9 "), (1L, "---"), (2L, "ok")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), TextOps.normalizeCol(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "hello world x9")
    assert(got(1L) == "")
    assert(got(2L) == "ok")
  }

  test("redact PII: emails and phones masked, counts pre-redaction") {
    val rows = Seq(
      (0L, "mail a.b+c@x-y.org then call 555-123-4567 or (555) 987 6543"),
      (1L, "no pii here 123456789012"),
      (2L, "two mails p@q.io r@s.co")
    ).toDF("doc_id", "text")
    val got = TextOps.redactPii(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == (("mail <EMAIL> then call <PHONE> or <PHONE>", 1L, 2L)))
    assert(got(1L) == (("no pii here 123456789012", 0L, 0L)))
    assert(got(2L) == (("two mails <EMAIL> <EMAIL>", 2L, 0L)))
  }

  test("chunk tokens: offsets, overlap, short tail, empty doc") {
    val rows = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w=4 s=3
      (1L, "a b"),                                    // single short chunk
      (2L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(rows, "doc_id", "text", 4, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    def h(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val exp0 = Seq(
      (0L, 0, 0, 4L, h("t1 t2 t3 t4")), (0L, 1, 3, 4L, h("t4 t5 t6 t7")),
      (0L, 2, 6, 4L, h("t7 t8 t9 t10")), (0L, 3, 9, 1L, h("t10")))
    assert(got.filter(_._1 == 0L).toSeq == exp0)
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 0, 0, 2L, h("a b"))))
    assert(!got.exists(_._1 == 2L))
  }

  test("stratified hash sampling: per-stratum rates, consistent-subset property") {
    val n = 400
    val rows = (0 until n).map(i => (i.toLong, s"doc number $i body", s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    val kept = Dedup.stratifiedHashSample(rows, "text", "source",
      Map("s0" -> 256, "s1" -> 0), 128).collect().map(_.getLong(0)).toSet
    // s0 fully kept, s1 fully dropped
    assert((0 until n).forall(i => kept.contains(i.toLong) == (i % 2 == 0)))
    // rate monotonicity: a stratum sampled at 64 is a subset of it at 192
    val at64 = Dedup.stratifiedHashSample(rows, "text", "source",
      Map("s0" -> 64), 64).collect().map(_.getLong(0)).toSet
    val at192 = Dedup.stratifiedHashSample(rows, "text", "source",
      Map("s0" -> 192), 192).collect().map(_.getLong(0)).toSet
    assert(at64.subsetOf(at192))
    // and agrees with the unstratified sampler at the same rate
    val flat = Dedup.hashSample(rows, "text", 64).collect().map(_.getLong(0)).toSet
    assert(at64 == flat)
  }
}
