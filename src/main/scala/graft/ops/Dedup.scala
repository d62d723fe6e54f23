package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale posture (100 TB): every variant reduces to ONE shuffle keyed
  * on a compact digest (md5 of normalized text, or banded signature
  * buckets) — never a full-text comparison join, never a cartesian
  * product. Candidate generation for near-dup is banded equi-join
  * (LSH), so cost is linear in data + candidate pairs, not O(n²).
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per normalized-text
    * group. The group key is the md5 digest, so the shuffle carries a
    * 32-byte key instead of document bodies, and the same rule
    * (`min(id)` wins) is expressible in any SQL engine for oracles.
    *
    * Measured alternative: a `min_by(struct(*), id)` hash aggregate
    * would partially combine map-side (shuffle one row per digest per
    * partition instead of every duplicate), but whole-row struct
    * buffers force ObjectHashAggregate, whose per-row object overhead
    * measured SLOWER at both 1× (0.38 s vs 0.27 s) and 10×-clique
    * (pipeline 2.6 s vs 1.8 s) scale — the window form shuffles
    * compact Tungsten rows and sorts, and wins.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(TextOps.normalize(col(textCol)).cast("binary")))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fragment-level (line-wise) exact dedup — RefinedWeb's "line-wise
    * deduplication" / C4's span dedup at sentence granularity: split
    * each normalized document on `". "`, keep only the FIRST corpus-
    * wide occurrence of every repeated fragment (first = smallest
    * `(idCol, position)`), and reassemble the survivors in document
    * order. Boilerplate repeated across pages (headers, cookie
    * banners, navigation) disappears from every document but its
    * first, while unique prose is untouched.
    *
    * Output: `(idCol, text)` — row-preserving: a document whose every
    * fragment was seen earlier comes back as the empty string, not a
    * dropped row.
    *
    * Scale posture (100 TB): fragment BODIES never ride a shuffle —
    * the keep-first decision moves only `(id, pos, md5)` triples
    * through the digest-keyed window (the body is projected away
    * BEFORE the exchange), the dropped positions come back as one
    * tiny sorted per-doc int array (repeat-losing docs only), and the
    * reassembly re-splits the document row-locally and rejoins the
    * surviving fragments in one codegen merge
    * ([[graft.functions.SpanCover]], the round-19 dedupSubstrings
    * shape). The pre-round-19 form shuffled fragment bodies twice
    * (through the window AND an id-keyed reassembly aggregate) plus a
    * doc-keyed join. No joins against full text, no cartesian
    * anything. The same rule is expressible in SQL, so the DuckDB
    * oracle reproduces reassembled documents byte-for-byte.
    */
  def dedupLines(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fragKeys = df
      .select(col(idCol), posexplode(split(TextOps.normalize(col(textCol)), "\\. ")).as(Seq("pos", "frag")))
      .filter(length(col("frag")) > 0)
      .select(col(idCol), col("pos"), md5(col("frag").cast("binary")).as("__h"))
    val keepFirst = Window.partitionBy(col("__h")).orderBy(col(idCol), col("pos"))
    // positions that lose (a repeat of an earlier fragment, corpus-wide
    // first-occurrence order), one small sorted array per affected doc
    val dropped = fragKeys
      .withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") >= 2)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__dropped"))
      .withColumnRenamed(idCol, "__did")
    val empty = array().cast("array<int>")
    df.select(col(idCol), split(TextOps.normalize(col(textCol)), "\\. ").as("__f"))
      .join(dropped, col(idCol) === col("__did"), "left")
      .select(
        col(idCol),
        coalesce(
          graft.functions.SpanCover.removeDroppedFragments(
            col("__f"), coalesce(col("__dropped"), empty)),
          lit("")).as("text"))
  }

  /** Exact-substring dedup (ExactSubstr of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, token-granular form): every `k`-token span
    * whose hashed `k`-gram occurs MORE THAN ONCE corpus-wide is
    * removed from all but its FIRST occurrence (order: doc id, then
    * position); surviving tokens reassemble in order. Row-preserving:
    * `(idCol, text_clean, n_removed)` — a doc that loses every token
    * (e.g. an exact duplicate of an earlier doc) comes back as `""`.
    *
    * The paper builds a suffix array; the distributed equivalent here
    * is the same rolling-hash machinery every near-dup op shares
    * ([[graft.functions.ShingleHashes]], one codegen projection):
    * suffix arrays need the corpus in one address space, k-gram
    * hashing shards by hash. Docs shorter than `k` tokens contribute
    * their whole-text hash at position 0 (span clamped to the doc), so
    * short exact duplicates are removed too; docs with EMPTY
    * normalized text never participate.
    *
    * Scale shape (100 TB): no document text ever rides a shuffle —
    * the duplicate-span pass moves `(id, pos, h)` triples through ONE
    * hash-keyed window (first-occurrence rank dies in the exchange
    * that computes it), and the removal DECISION comes back to the
    * documents as one tiny per-doc array of removed-span starts
    * (guide-§8 shape: decide with small rows, touch the heavy rows
    * once). The cut itself — drop covered tokens, rejoin the
    * survivors, count the removals — runs row-local in two codegen
    * merges over (token array, sorted span starts)
    * ([[graft.functions.SpanCover]]), so the exploded token stream is
    * never shuffled at all. Round 19: this replaced the join shape
    * (covered positions exploded k× and `distinct()`-shuffled, the
    * FULL token stream shuffled into a token-level anti-join, kept
    * tokens shuffled AGAIN into an id-keyed reassembly aggregate, plus
    * two doc-keyed joins — 12 Exchanges → 4, and the only full-corpus
    * exchange left is the k-gram hash window's).
    * Window-over-hash skew is impossible by construction: a hash's
    * partition holds its occurrence list, bounded by the corpus-wide
    * repeat count of ONE k-gram (and the heaviest k-grams are exactly
    * the ones being deleted).
    */
  def dedupSubstrings(df: DataFrame, textCol: String, idCol: String, k: Int = 8): DataFrame = {
    require(k >= 2, s"substring width must be >= 2 tokens, got $k")
    val base = df.select(col(idCol), NearDup.tokens(col(textCol)).as("w"))
    val ne = base.filter(not(size(col("w")) === 1 && element_at(col("w"), 1) === ""))
    val kg = ne.select(
      col(idCol),
      posexplode(graft.functions.TextHash.shingleHashes(col("w"), k)).as(Seq("pos", "h")))
    val firstWins = Window.partitionBy(col("h")).orderBy(col(idCol), col("pos"))
    val removedSpans = kg
      .withColumn("__rn", row_number().over(firstWins))
      .filter(col("__rn") >= 2)
    // the per-doc removal decision, aggregated to ONE small row per
    // affected doc: ascending span starts (`(id, pos)` is unique in
    // removedSpans, so the sorted list is a set)
    val spanStarts = removedSpans
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
      .withColumnRenamed(idCol, "__sid")
    // attach the decision to the docs (left join — the starts frame
    // holds only docs that lose spans; AQE broadcasts it when small)
    // and cut row-locally. Docs with empty/null normalized text have
    // no kg rows, hence empty starts: the merge keeps their tokens
    // ([""] rejoins to "", n stays 0) — exactly the old outer-join
    // fallback. A null token array nulls both expressions; coalesce
    // restores the row-preserving ("", 0) contract.
    val empty = array().cast("array<int>")
    df.select(col(idCol), NearDup.tokens(col(textCol)).as("__w"))
      .join(spanStarts, col(idCol) === col("__sid"), "left")
      .select(
        col(idCol),
        coalesce(
          graft.functions.SpanCover.removeCoveredTokens(
            col("__w"), coalesce(col("__starts"), empty), k),
          lit("")).as("text_clean"),
        coalesce(
          graft.functions.SpanCover.coveredTokenCount(
            coalesce(col("__starts"), empty), k, size(col("__w"))),
          lit(0L)).as("n_removed"))
  }
}
