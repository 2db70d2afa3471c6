package killa.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import killa.model.Turn
import killa.util.Hashing.splitmix64

/** Deterministic synthetic transcript corpora (FIXTURES.md §1-2). Mirrors the
  * reference's test-data strategy — GUID-token temp files
  * (ElasticKilla.Tests/Utils/Generator.cs:8-12, TempFolder.cs:22-38) — as a
  * seeded, distributed generator: each row is a pure function of (seed, id),
  * built with spark.range so bench-scale corpora never materialize on the
  * driver. No wall clock, no java.util.Random state.
  *
  * Vocabulary structure per conversation (enables exact-count assertions like
  * FileAnalyzerTests.cs:292-317):
  *  - `uniq<conv>_<i>`: tokens owned by exactly one conversation;
  *  - `shared_<i>`: tokens owned by every conversation;
  *  - zipf-ish common words from a fixed list, including a hot term "the" in
  *    ~50% of turns (skew fixture, FIXTURES.md §2.5).
  */
object Synth {
  val CommonWords: Array[String] = Array(
    "the", "of", "and", "to", "in", "query", "index", "spark", "merge",
    "filter", "join", "scan", "sort", "block", "term", "doc", "turn",
    "agent", "tool", "plan")

  def transcripts(
      spark: SparkSession,
      nConvs: Int,
      turnsPerConv: Int,
      seed: Long,
      uniquePerConv: Int = 5,
      sharedTokens: Int = 5,
      wordsPerTurn: Int = 8): Dataset[Turn] = {
    import spark.implicits._
    val roles = Array("user", "assistant", "system", "tool")
    val tools = Array("", "search", "exec", "")
    val epoch = 1704067200000L // 2024-01-01T00:00:00Z, fixed — never now()
    spark.range(nConvs.toLong * turnsPerConv).map { id =>
      val conv = (id / turnsPerConv).toInt
      val turn = (id % turnsPerConv).toInt
      val convId = f"conv$conv%06d"
      val sb = new StringBuilder
      var i = 0
      while (i < wordsPerTurn) {
        val h = splitmix64(seed ^ (id * 131071L + i * 7919L))
        val pick = java.lang.Math.floorMod(h, 10L).toInt
        val w =
          if (pick < 2 && uniquePerConv > 0)
            s"uniq${conv}_${java.lang.Math.floorMod(h >>> 8, uniquePerConv.toLong)}"
          else if (pick < 4 && sharedTokens > 0)
            s"shared_${java.lang.Math.floorMod(h >>> 8, sharedTokens.toLong)}"
          else if (pick < 7) "the" // hot term in ~half of all turns
          else CommonWords(java.lang.Math.floorMod(h >>> 16, CommonWords.length.toLong).toInt)
        if (i > 0) sb.append(' ')
        sb.append(w)
        i += 1
      }
      Turn(
        conv_id = convId,
        turn_idx = turn,
        role = roles(turn % roles.length),
        text = sb.toString,
        tool = tools(turn % tools.length),
        ts = new Timestamp(epoch + id * 1000L))
    }
  }
}
