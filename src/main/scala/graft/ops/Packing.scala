package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: bin documents into fixed token-budget training
  * sequences (the "pack to 4096/8192 tokens" step every LLM pretraining
  * pipeline runs between curation and tokenized-shard writing).
  *
  * Optimal bin packing is NP-hard and inherently sequential; at corpus
  * scale nobody runs it globally. The scalable shape — and what this
  * implements — is PARTITION-LOCAL best-fit-decreasing:
  *
  *  1. one narrow pass computes per-doc token counts;
  *  2. docs hash-repartition by id (the only shuffle — uniform load,
  *     no skew: placement needs no key locality);
  *  3. each partition runs best-fit-decreasing over its docs into
  *     bins of `budget` tokens — O(n log n) sort + O(log bins) TreeMap
  *     fits, memory bounded by the partition's (id, count) pairs;
  *  4. pack ids are made globally unique as
  *     `partitionId << 40 | localBin` — no coordination, no second
  *     shuffle, ids stable for a fixed partition count.
  *
  * BFD within each partition wastes at most one open bin per partition
  * beyond the 11/9·OPT+6/9 bound, so total packs exceed the
  * global lower bound `ceil(total_tokens/budget)` by a factor the
  * `packing_gate` correctness entry pins. Oversized docs (count >
  * budget) become singleton packs flagged `oversize` — callers chunk or
  * drop them downstream; silently truncating text is not this
  * operator's call.
  *
  * Output: one row per doc WITH A POSITIVE TOKEN COUNT —
  * (id, tokens, pack_id, pack_pos, oversize). Zero-token docs (empty /
  * whitespace-only text, or 0 from a custom counter) are EXCLUDED by
  * contract: they contribute nothing to a training sequence, and a
  * tokens=0 row would make `n_docs * 0-cost` packs ambiguous. Callers
  * reconciling doc counts across pipeline stages must count
  * `tokens > 0` docs on the input side (the `pipeline_e2e` gate does);
  * `pack_pos` is the doc's position within its pack (BFD placement
  * order), so `groupBy(pack_id).agg(collect_list(...) sorted by
  * pack_pos)` reconstructs each training sequence deterministically.
  */
object Packing {

  /** whitespace token counts by default — swap in any counter column
    * (e.g. [[TextAnalysis.bpeTokenCount]]) via the `tokenCountOf`
    * overload. */
  def packDocs(df: DataFrame, idCol: String, textCol: String,
      budget: Long, partitions: Int = 0): DataFrame =
    packByCount(df.withColumn("__tok", TextAnalysis.tokenCount(col(textCol))),
      idCol, budget, partitions)

  def packDocs(df: DataFrame, idCol: String, tokenCountOf: Column,
      budget: Long, partitions: Int): DataFrame =
    packByCount(df.withColumn("__tok", tokenCountOf), idCol, budget, partitions)

  /** Core: BFD over (id, __tok) rows, partition-local. */
  private def packByCount(withTok: DataFrame, idCol: String,
      budget: Long, partitions: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = withTok.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val narrow = withTok.select(col(idCol), col("__tok"))
      .filter(col("__tok") > 0)
      .repartition(nPart, col(idCol))
    val idField = narrow.schema(idCol)
    val outSchema = StructType(Seq(
      idField,
      StructField("tokens", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", IntegerType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    narrow.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // decreasing-size sort: BFD's approximation bound needs it. The
      // partition's (id, tok) pairs are materialized — 16 bytes/doc,
      // bounded by docs-per-partition, not text size.
      val docs = rows.map(r => (r.get(0), r.getLong(1))).toArray
        .sortBy { case (_, tok) => -tok }
      // best fit via TreeMap headroom -> open bin ids: O(log bins) per
      // doc (a linear first-fit scan is O(bins) per doc — quadratic
      // corner at cluster-scale partitions)
      val open = new java.util.TreeMap[Long, java.util.ArrayDeque[Integer]]()
      val fill = scala.collection.mutable.ArrayBuffer.empty[Int]
      var nBins = 0
      docs.iterator.map { case (id, tok) =>
        if (tok > budget) {
          // oversize: its own (closed) pack, flagged
          val b = nBins; nBins += 1; fill += 1
          org.apache.spark.sql.Row(id, tok, (pid << 40) | b.toLong, 0, true)
        } else {
          val e = open.ceilingEntry(tok)
          val (b, prevRoom) =
            if (e == null) { val nb = nBins; nBins += 1; fill += 0; (nb, budget) }
            else {
              val q = e.getValue
              val nb = q.pollFirst().intValue()
              if (q.isEmpty) open.remove(e.getKey)
              (nb, e.getKey.longValue())
            }
          val room = prevRoom - tok
          if (room > 0)
            open.computeIfAbsent(room, _ => new java.util.ArrayDeque[Integer]())
              .addLast(b)
          val pos = fill(b); fill(b) = pos + 1
          org.apache.spark.sql.Row(id, tok, (pid << 40) | b.toLong, pos, false)
        }
      }
    }
  }

  /** Pack-level summary: (pack_id, docs, tokens, fill_ratio, oversize). */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("pack_id").agg(
      count(lit(1)).as("docs"),
      sum(col("tokens")).as("tokens"),
      max(col("oversize")).as("oversize"))
      .withColumn("fill_ratio", round(col("tokens").cast("double") / budget, 6))

  /** Materialize the packed TRAINING SEQUENCES: one row per pack —
    * (pack_id, n_docs, tokens, text) with member texts joined by `sep`
    * in `pack_pos` order.
    *
    * Packing decisions run on narrow (id, count) rows ([[packDocs]]);
    * only this materialization step moves text: one join back to the
    * source (by id) and one shuffle co-locating each pack's members —
    * you can't concatenate a sequence without gathering it. The
    * in-pack ordering uses `sort_array` over (pack_pos, text) structs
    * inside the aggregation, not a window. */
  def packedSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, partitions: Int = 0, sep: String = "\n\n"): DataFrame =
    sequencesOf(packDocs(df, idCol, textCol, budget, partitions),
      df, idCol, textCol, sep)

  /** Materialize sequences from an EXISTING pack assignment ([[packDocs]]
    * output) — for pipelines that already ran (and conservation-checked)
    * the decision pass, so the assignment is never recomputed: BFD is
    * partition-local, so a second run over a reshuffled input could
    * legally assign differently and break cross-stage accounting.
    *
    * PRECONDITION: `packed` must be MATERIALIZED (persisted or
    * checkpointed, as [[packDocs]] callers doing conservation checks
    * already need) — an unpersisted assignment re-executes the BFD
    * decision inside this join, which is exactly the recomputation
    * this entry point exists to avoid. */
  def sequencesOf(packed: DataFrame, df: DataFrame, idCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame =
    packed.join(df.select(col(idCol), col(textCol)), idCol)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("pack_pos"), col(textCol).as("t")))),
          s => s.getField("t")), sep).as("text"))

  /** The end of the tokenize-and-pack pipeline: one row per pack with
    * the FLATTENED token-id sequence (members concatenated in
    * `pack_pos` order) — what actually feeds a trainer. Packing
    * decisions run on the REAL learned-BPE counts (so `budget` means
    * model context tokens, not whitespace words); the id arrays move
    * once, in the final pack-co-locating shuffle. Output:
    * (pack_id, n_docs, tokens, input_ids array<int>) with
    * size(input_ids) == tokens on every row by construction. */
  def packedTokenIds(df: DataFrame, idCol: String, textCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val ids = TextAnalysis.bpeTokenIds(
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)])
      .toDF(idCol, "__ids").localCheckpoint(true)
    val packed = packDocs(ids, idCol, size(col("__ids")).cast("long"),
      budget, partitions)
    packed.join(ids, idCol)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("tokens"),
        flatten(transform(
          sort_array(collect_list(struct(col("pack_pos"), col("__ids").as("i")))),
          s => s.getField("i"))).as("input_ids"))
  }
}
