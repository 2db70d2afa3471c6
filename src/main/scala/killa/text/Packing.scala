package killa.text

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import killa.tokenize.Tokenize

/** Sequence packing for LLM pretraining (the concat-and-chunk form): lay
  * every document's tokens end to end in a deterministic corpus order and
  * cut the stream into fixed `budget`-token training sequences — each doc is
  * assigned the sequence its FIRST token lands in (`seq_id = start_offset /
  * budget`). This is the standard packed-pretraining data layout (documents
  * concatenated, no padding waste, boundary docs span two sequences), and
  * because the assignment is a pure function of the exclusive prefix sum it
  * is engine- and partitioning-independent — any SQL engine reproduces it
  * with one window function.
  *
  * Scale shape: a naive `sum(n) OVER (ORDER BY id)` window forces ALL rows
  * through ONE reducer — the classic global-window scale killer. This
  * implementation is the textbook two-pass distributed prefix sum instead:
  * range-repartition by the id (Spark's RangePartitioner keeps partition i's
  * keys strictly below partition i+1's), sort within partitions, pass 1
  * folds one (partition, token-sum) pair per partition to the driver
  * (bytes, not rows), pass 2 streams each partition once adding its
  * exclusive base offset. No global shuffle beyond the range partitioning,
  * no driver materialization of data rows, O(partitions) driver state.
  */
object Packing {

  /** @param df       corpus; one row per document.
    * @param idCol    integral document key defining the corpus order
    *                 (doc_id; for transcripts use the conv ordinal). The
    *                 packing contract NEEDS a total order — a dense integer
    *                 key keeps it cheap and reproducible.
    * @param textCol  whitespace-tokenized text (reference semantics).
    * @param budget   tokens per training sequence (> 0), e.g. a model's
    *                 context length.
    * @return (idCol, n_tokens, start_offset, seq_id) — one row per doc,
    *         empty-token docs occupy zero space but keep a row (their
    *         start equals the next doc's).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val withN = df
      .select(col(idCol).cast("long").as("__id"),
        size(Tokenize.termsCol(col(textCol))).cast("long").as("n_tokens"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions("__id")
      .as[(Long, Long)]
      // pin the physical partitions: pass 2 must see exactly the partition
      // boundaries pass 1 summed (and skip recomputing the scan + sort)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = withN.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().toMap
    // exclusive prefix over the ordered partition ids: partition p's base
    // offset is the total token count of every partition before it
    val base: Map[Int, Long] = {
      val ordered = partSums.toSeq.sortBy(_._1)
      var acc = 0L
      ordered.map { case (p, s) => val b = (p, acc); acc += s; b }.toMap
    }
    withN.mapPartitions { it =>
      var run = base.getOrElse(TaskContext.getPartitionId(), 0L)
      it.map { case (id, n) =>
        val start = run
        run += n
        (id, n, start, start / budget)
      }
    }.toDF(idCol, "n_tokens", "start_offset", "seq_id")
  }

  /** Transcript packing with SFT loss-mask accounting: conversations (not
    * turns) are the packing unit — a conversation's turns concatenate in
    * turn order, conversations lay end to end in conv_id order, and each
    * conversation reports how many of its tokens are TRAINABLE under the
    * standard supervised-fine-tuning mask (only `trainRole` turns take
    * loss; user/tool turns are context). The per-conv `n_train_tokens` /
    * `n_tokens` pair IS the loss mask at the granularity a packing planner
    * needs — budgeting packed sequences by trainable density without
    * materializing per-token masks (which the sequence writer derives from
    * the role spans at serialization time).
    *
    * Same two-pass distributed prefix sum as [[packSequences]] (no global
    * window, O(partitions) driver state); conv keys are strings, which the
    * RangePartitioner orders exactly like the SQL `ORDER BY conv_id` an
    * oracle uses.
    *
    * @return (convCol, n_tokens, n_train_tokens, start_offset, seq_id) —
    *         one row per conversation.
    */
  def packTranscripts(turns: DataFrame, convCol: String, roleCol: String,
      textCol: String, budget: Long, trainRole: String = "assistant"): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val spark = turns.sparkSession
    import spark.implicits._
    val perConv = turns
      .select(col(convCol).as("__c"), col(roleCol).as("__r"),
        size(Tokenize.termsCol(col(textCol))).cast("long").as("__n"))
      .groupBy("__c")
      .agg(sum(col("__n")).as("__nt"),
        sum(when(col("__r") === trainRole, col("__n")).otherwise(0L)).as("__tr"))
      .repartitionByRange(col("__c"))
      .sortWithinPartitions("__c")
      .as[(String, Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = perConv.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().toMap
    val base: Map[Int, Long] = {
      val ordered = partSums.toSeq.sortBy(_._1)
      var acc = 0L
      ordered.map { case (p, s) => val b = (p, acc); acc += s; b }.toMap
    }
    perConv.mapPartitions { it =>
      var run = base.getOrElse(TaskContext.getPartitionId(), 0L)
      it.map { case (c, n, tr) =>
        val start = run
        run += n
        (c, n, tr, start, start / budget)
      }
    }.toDF(convCol, "n_tokens", "n_train_tokens", "start_offset", "seq_id")
  }
}
