package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share n-gram
  * shingles with an evaluation/benchmark set, so eval material can be
  * held out of training data (the standard n-gram-overlap
  * decontamination procedure from the GPT-3 / PaLM data cards).
  *
  * Plan shape, chosen for the 100 TB case:
  *   - The EVAL side is a benchmark suite — thousands of documents,
  *     not billions. Its distinct hashed-shingle set is tiny, so it is
  *     `broadcast()` to every executor: the 100 TB corpus side is
  *     matched map-side with NO shuffle of corpus shingles.
  *   - The corpus side reuses [[NearDup.hashedShingles]] — tokens are
  *     exploded once, each token hashed once in a codegen projection,
  *     consecutive hashes combined with integer arithmetic. No shingle
  *     strings are built.
  *   - The only shuffle is the final per-document aggregation of hit
  *     counts, and that is map-side combined (two `count(distinct)`
  *     over an already doc-clustered stream).
  *
  * The default shingle order is the shared 3-gram family (so the
  * DuckDB oracle reuses the same CTEs as the near-dup gates); pass
  * `shingleN` in [3, 13] to match the production procedure — the
  * GPT-3 data card uses 13-grams, PaLM 8-grams. Any width is the same
  * plan with a wider Horner hash combine (see
  * [[graft.functions.ShingleHashes]]) — shape, broadcast asymmetry,
  * and costs are identical.
  */
object Decontam {

  /** Corpus plan-size floor (bytes) for the adaptive bloom decision:
    * below it the exact broadcast join alone is cheaper than the bloom
    * build's two fixed driver jobs. Break-even measured between the
    * sf0.1 corpus (0.6 MB parquet, bloom +44% — round 12) and sf1
    * (5.9 MB, bloom −29%); 4 MiB splits the measured interval. The
    * estimate read is `optimizedPlan.stats.sizeInBytes` — free, no
    * Spark job.
    */
  private[graft] val BloomMinCorpusBytes: Long = 4L << 20

  /** The adaptive bloom decision for a corpus plan: its
    * size-in-bytes estimate clears [[BloomMinCorpusBytes]] AND is a
    * real estimate. Plans Spark cannot size (RDD-backed frames, some
    * views) report `spark.sql.defaultSizeInBytes` (Long.MaxValue
    * unless tuned) — a sentinel meaning "unknown", not "huge"; forcing
    * the bloom's two eager driver jobs on it would reintroduce the
    * small-corpus regression the gate exists to avoid, so unknown
    * skips the bloom (callers with genuinely large unestimable corpora
    * pass `bloomPreFilter = Some(true)`).
    *
    * "Unknown" is not just exact equality with the sentinel: a
    * filter/projection OVER an unestimable leaf reports a
    * scaled-but-still-astronomical estimate (selectivity × the
    * sentinel) that is `!=` it, so the root estimate counts as
    * unknown when it reaches the sentinel OR when any LEAF of the
    * optimized plan reports it (the derived-from-unknown case).
    */
  private[graft] def bloomDecision(corpus: DataFrame): Boolean = {
    val plan = corpus.queryExecution.optimizedPlan
    val statSize = plan.stats.sizeInBytes
    val sentinel = BigInt(
      org.apache.spark.sql.graftglue.Bridge.defaultSizeInBytes(corpus.sparkSession))
    val unknown = statSize >= sentinel ||
      plan.collectLeaves().exists(_.stats.sizeInBytes >= sentinel)
    !unknown && statSize >= BloomMinCorpusBytes
  }

  /** Per-corpus-document overlap report against `evalDf`.
    *
    * Output: `idCol, n_hits` (distinct shingles shared with ANY eval
    * doc), `n_eval_docs` (distinct eval docs hit), `contaminated`
    * (`n_hits >= minHits`). Every corpus row appears exactly once —
    * zero-hit documents report `(0, 0, false)`.
    *
    * `bloomPreFilter` builds a Bloom filter over the eval shingle
    * hashes at PLAN TIME and probes it ahead of the exact join — a
    * codegen `might_contain` over a literal, so almost-all corpus
    * shingles die before ever entering the join operator; false
    * positives die in the exact join, so output is IDENTICAL (asserted
    * in OpsSpec and measured row-diff-zero at sf1/sf3). Measured
    * 20–29% faster at sf1/sf3 (BASELINE.md round 12).
    *
    * The DEFAULT (`None`) is ADAPTIVE (round 13): the bloom build is
    * two eager driver-side Spark jobs over the eval shingles (count +
    * bloomFilter — they run when `overlap` is CALLED, not when the
    * result executes), a fixed ~0.2 s constant that at small corpus
    * scale exceeds what the probe saves (measured +44% on the sf0.1
    * bench row, round 12). `None` consults the corpus plan's
    * size-in-bytes estimate — a pure plan-statistics read, no job —
    * and builds the bloom only at or above [[BloomMinCorpusBytes]];
    * an UNESTIMABLE plan (stats report `spark.sql.defaultSizeInBytes`)
    * counts as below the floor — see [[bloomDecision]].
    * `Some(true)` forces the filter (and the eager jobs) regardless;
    * `Some(false)` disables it — also the right call when the eval set
    * has ≳10M distinct shingles (the filter bytes ride the task binary
    * at ~1.2 B per shingle at fpp 0.01; don't ship a multi-MB literal).
    */
  def overlap(
      corpus: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      minHits: Int = 2,
      shingleN: Int = 3,
      bloomPreFilter: Option[Boolean] = None
  ): DataFrame = {
    // Distinct (shingle, eval_id) pairs of the benchmark set: small by
    // assumption, broadcast below.
    val evalShingles = NearDup
      .hashedShingles(evalDf, textCol, idCol, shingleN)
      .select(col("h"), col(idCol).as("eval_id"))
      .distinct()

    // Corpus side: raw shingles matched map-side against the broadcast
    // eval set FIRST — the filter is free, while a pre-join distinct()
    // would shuffle the full corpus shingle set (measured 2.8x the
    // whole operator's cost at sf1). countDistinct below dedups the
    // few surviving hit rows instead.
    val corpusShingles = NearDup.hashedShingles(corpus, textCol, idCol, shingleN)
    val useBloom = bloomPreFilter.getOrElse(bloomDecision(corpus))
    val probed =
      if (!useBloom) corpusShingles
      else {
        import org.apache.spark.sql.graftglue.Bridge
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.types.BinaryType
        // cache across the two eager driver jobs (count + bloomFilter)
        // so the eval shingle set is computed once, not twice; released
        // before return — the broadcast-join side re-derives it lazily
        // at execution time, when this plan-time cache would be gone
        // from the pinned set anyway
        evalShingles.persist()
        try {
          val n = evalShingles.count()
          if (n == 0) corpusShingles.filter(lit(false)) // empty eval set: nothing can hit (bloomFilter agg NPEs on zero rows)
          else {
            val bf = evalShingles.stat.bloomFilter("h", n, 0.01)
            val bos = new java.io.ByteArrayOutputStream()
            bf.writeTo(bos)
            corpusShingles.filter(Bridge.column(BloomFilterMightContain(
              Literal(bos.toByteArray, BinaryType),
              Bridge.resolvedExpression(col("h")))))
          }
        } finally evalShingles.unpersist(blocking = false)
      }
    val hits = probed
      .join(broadcast(evalShingles), "h")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("h")).as("n_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs")
      )

    corpus
      .select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated")
      )
  }

  /** Decontaminated corpus: drops documents whose shingle overlap with
    * the eval set reaches `minHits`. Same plan as [[overlap]] plus one
    * broadcast-able anti-join of the (small) contaminated-id set.
    */
  def decontaminate(
      corpus: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      minHits: Int = 2,
      shingleN: Int = 3,
      bloomPreFilter: Option[Boolean] = None
  ): DataFrame = {
    val bad = overlap(corpus, evalDf, textCol, idCol, minHits, shingleN, bloomPreFilter)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
