package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign token-counted chunks to
  * fixed-budget sequences (the step between chunking and batch
  * assembly in an LLM data pipeline).
  *
  * Exact bin packing is NP-hard and inherently sequential; the
  * standard scalable compromise is NEXT-FIT WITHIN SHARDS: chunks are
  * deterministically sharded by document hash, ordered within the
  * shard, and cut into sequences by cumulative token count. Each shard
  * is an independent window partition, so the plan is one shuffle on
  * the shard key and parallelism = `nShards` regardless of corpus
  * size — no global ordering, no driver-side loop.
  *
  * Next-fit semantics: a chunk is assigned to the bin its RUNNING
  * START falls in, so a sequence may overshoot `budgetTokens` by at
  * most one chunk (callers truncate or recurse on oversized chunks
  * first). Deterministic on any engine/partitioning: the shard hash is
  * md5-derived and the in-shard order (`idCol, idxCol`) is total.
  *
  * Output: input columns + `seq_id` (string `"<shard>-<bin>"`).
  *
  * Sizing `nShards`: it caps BOTH the packing parallelism and the
  * per-task sort size (≈ corpus rows / nShards). The default 64 suits
  * a single fat node; on a wide cluster raise it toward ~2× the total
  * executor cores (each shard is one window partition), at the cost of
  * proportionally more slightly-underfilled final bins (≤ one per
  * shard). Packing quality is otherwise independent of the count.
  */
object Packing {

  def packSequences(
      chunks: DataFrame,
      idCol: String,
      idxCol: String,
      tokensCol: String,
      budgetTokens: Int,
      nShards: Int = 64
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(nShards > 0, "nShards must be positive")
    chunks
      .withColumn("__shard", shardOf(col(idCol), nShards))
      .withColumn("__start", packStart(col(tokensCol), col("__shard"), col(idCol), col(idxCol)))
      .withColumn("seq_id", seqIdOf(col("__shard"), col("__start"), budgetTokens))
      .drop("__shard", "__start")
  }

  /** Deterministic shard of an id (md5-derived, any engine reproduces
    * it) — the packing hash, exposed so the SQL-text backend renders
    * the same expression (one definition, two spellings).
    */
  private[graft] def shardOf(id: Column, nShards: Int): Column = pmod(
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10).cast("long"),
    lit(nShards.toLong)
  )

  /** Per-shard running token total BEFORE the current chunk.
    * Explicit ROWS frame: the window-default RANGE frame includes all
    * ORDER BY peers, so a non-unique (idCol, idxCol) would lump tied
    * rows' tokens into one running sum and silently diverge from the
    * sequential next-fit the oracle computes.
    */
  private[graft] def packStart(tokens: Column, shard: Column, id: Column, idx: Column): Column = {
    val w = Window.partitionBy(shard).orderBy(id, idx)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    coalesce(sum(tokens).over(w) - tokens, lit(0L))
  }

  /** `<shard>-<start div budget>` sequence label. */
  private[graft] def seqIdOf(shard: Column, start: Column, budgetTokens: Int): Column =
    concat(shard, lit("-"), (start / budgetTokens).cast("long"))

  /** Materialize the packed training rows: one row per sequence with
    * the member text concatenated in pack order, plus the token
    * total — the parquet a training job actually reads. The EOS
    * separator marks DOCUMENT boundaries only (the standard packing
    * convention): chunks split from the same document rejoin with a
    * single space — the separator their tokens were split on — so a
    * trainer never sees a spurious document boundary mid-document.
    * Output: `(seq_id, packed_text, n_chunks, n_tokens)`.
    *
    * Two seq-keyed aggregates over [[packSequences]]' output (per-doc
    * rejoin, then per-sequence doc concat); each concat order is
    * engine-exact via the sort-struct aggregate (= the oracle's
    * `string_agg(... ORDER BY ...)`), and both shuffles are keyed by
    * `seq_id` so the second agg is exchange-free after the first.
    *
    * BOUND CAVEAT: a sequence's chunk list is bounded by
    * `budgetTokens` only for chunks with ≥ 1 token — ZERO-token chunks
    * (empty documents, which [[graft.ops.TextOps.chunk]] row-preserves)
    * never advance the running sum, so a corpus with millions of empty
    * docs would pile them into single sequences. Filter
    * `n_tokens >= 1` upstream when empty docs may exist at volume; not
    * done here so the op stays a pure materialization of its input.
    */
  def packConcat(
      packed: DataFrame,
      idCol: String,
      idxCol: String,
      textCol: String,
      tokensCol: String,
      eos: String = "<|eos|>"
  ): DataFrame =
    packed
      .groupBy(col("seq_id"), col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(idxCol), col(textCol)))),
            _.getField(textCol)),
          " ").as("__doc_text"),
        count(lit(1)).as("__doc_chunks"),
        sum(col(tokensCol)).as("__doc_tokens")
      )
      .groupBy(col("seq_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col("__doc_text")))),
            _.getField("__doc_text")),
          eos).as("packed_text"),
        sum(col("__doc_chunks")).as("n_chunks"),
        sum(col("__doc_tokens")).as("n_tokens")
      )
}
