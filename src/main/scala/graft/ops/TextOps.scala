package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines.
  *
  * All pure `Column` composition over Spark builtins — no UDFs, so
  * every transform stays inside whole-stage codegen and scales as a
  * narrow per-row projection (no shuffle). Regexes stay within the
  * RE2-compatible subset so DuckDB/ClickHouse oracles can replicate
  * results bit-for-bit.
  */
object TextOps {

  /** Explicit whitespace class used instead of `\s`: Java's `\s` is
    * `[ \t\n\x0B\f\r]` while RE2's (DuckDB) excludes vertical tab, so a
    * document containing U+000B would break bit-for-bit oracle
    * equivalence. The explicit class (hex escape works identically in
    * both engines) pins the semantics.
    */
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  /** Whitespace-collapse + lowercase + trim: the canonical form used
    * for fingerprinting and exact dedup.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), WsClass + "+", " ")

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(trim(text), WsClass + "+")

  /** BPE-ish lexical token pattern: runs of letters, runs of digits,
    * or single non-alphanumeric marks — the usual pre-tokenizer shape.
    */
  val TokenPattern = s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  /** Token counting: whitespace tokens and lexical (BPE-ish) tokens.
    * Output: `idCol, n_ws, n_lex, n_chars`.
    */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_ws"),
      regexp_count(col(textCol), lit(TokenPattern)).cast("long").as("n_lex"),
      length(col(textCol)).cast("long").as("n_chars")
    )

  /** Shared mini stopword lexicon (per language) for quality/langid. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "un", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "zu", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
    "zh" -> Seq.empty // scored by CJK character presence instead
  )

  /** Count of tokens appearing in `words` (case-insensitive).
    *
    * Codegen TokenSetHits instead of
    * `size(filter(tokens, array_contains(...)))`: the higher-order
    * filter runs its lambda INTERPRETED per token (languageId makes
    * four such passes) — the dominant cost of text_quality/text_langid
    * at sf1. Same token-equality, occurrence-counting semantics, so
    * the DuckDB oracles are unchanged.
    */
  private def stopwordHits(text: Column, words: Seq[String]): Column =
    if (words.isEmpty) lit(0)
    else graft.functions.TokenSetHits.tokenSetHits(tokens(lower(text)), words)

  /** Heuristic quality scoring: length, punctuation ratio, stopword
    * ratio, mean word length, and a composite score. Per-row double
    * arithmetic only (deterministic, engine-portable).
    * Output: `idCol, n_chars, n_words, punct_ratio, stop_ratio,
    * mean_word_len, q_score`.
    */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    // Stage 1: each raw count is ALIASED so it evaluates once — the
    // single-projection form re-evaluated the split() and the regex
    // scan at every use site (ratios, score, output columns: ~4
    // splits + 2 regex passes per row, most of the operator's sf1
    // wall-time). Multi-referenced aliases survive CollapseProject,
    // so stage 2's arithmetic reuses the counts.
    val counts = df.select(
      col(idCol),
      length(t).cast("double").as("__nc"),
      size(tokens(t)).cast("double").as("__nw"),
      // codegen byte-loop (PunctCount) — the regexp_count form paid a
      // java.util.regex step per punctuation char: 4.3 s of the
      // operator's 4.5 s at sf1
      graft.functions.PunctCount.punctCount(t).cast("double").as("__pc"),
      stopwordHits(t, Stopwords("en")).cast("double").as("__sc")
    )
    val nChars = col("__nc")
    val nWords = col("__nw")
    val punctRatio = col("__pc") / greatest(nChars, lit(1.0))
    val stopRatio = col("__sc") / greatest(nWords, lit(1.0))
    val meanWordLen = (nChars - (nWords - lit(1.0))) / greatest(nWords, lit(1.0))
    // Heuristic blend: long enough, some stopwords, not punctuation soup.
    val score =
      least(nWords / lit(100.0), lit(1.0)) * lit(0.4) +
        least(stopRatio * lit(5.0), lit(1.0)) * lit(0.4) +
        (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2)
    counts.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"),
      meanWordLen.as("mean_word_len"),
      score.as("q_score")
    )
  }

  /** n-gram/stopword-heuristic language ID over the built-in lexicon;
    * CJK scored by character-class presence. Deterministic argmax with
    * fixed priority order on ties. Output: `idCol, lang_pred, lang_score`.
    */
  /** Per-language evidence scores (shared by [[languageId]] and the
    * scalar [[langPred]] so the two can never drift).
    */
  private def langScores(t: Column): Seq[(String, Column)] = {
    val langs = Seq("en", "es", "de", "fr")
    langs.map(l => l -> stopwordHits(t, Stopwords(l)).cast("double")) :+
      // CJK: weight characters since they don't whitespace-tokenize.
      ("zh" -> (regexp_count(t, lit("[\\x{4e00}-\\x{9fff}]")).cast("double") * lit(0.5)))
  }

  /** Language prediction as ONE Column expression — the PQL scalar
    * function `lang_id(text)`. First language (in declaration order)
    * reaching the max wins; zero evidence everywhere is "und".
    */
  def langPred(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.tail.foldLeft(when(scores.head._2 === best, scores.head._1)) {
      case (acc, (l, s)) => acc.when(s === best, l)
    }
    when(best === 0.0, lit("und")).otherwise(coalesce(pred, lit("und")))
  }

  /** The composite quality score as ONE Column expression — the PQL
    * scalar function `quality_score(text)`. The count subtrees repeat
    * inside the formula (no aliasing is possible in a scalar
    * expression); Spark's physical-plan common-subexpression
    * elimination dedupes them inside whole-stage codegen, so the cost
    * matches [[qualityScore]]'s aliased form. Identical arithmetic to
    * the q_score column — the DuckDB oracle spells the same formula.
    */
  def qScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = size(tokens(text)).cast("double")
    val punctRatio =
      graft.functions.PunctCount.punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val stopRatio = stopwordHits(text, Stopwords("en")).cast("double") / greatest(nWords, lit(1.0))
    least(nWords / lit(100.0), lit(1.0)) * lit(0.4) +
      least(stopRatio * lit(5.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2)
  }

  def languageId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val scores = langScores(t)
    val best = greatest(scores.map(_._2): _*)
    df.select(
      col(idCol),
      langPred(t).as("lang_pred"),
      best.as("lang_score")
    )
  }

  /** PII patterns. Boundaries are EXPLICIT ASCII character classes,
    * not `\b`: Java's `\b` is Unicode-aware while RE2's (DuckDB) is
    * ASCII-only, so `\b` silently diverges next to CJK text — explicit
    * classes behave identically in every engine. The boundary groups
    * are restored in replacements via group references.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "(^|[^0-9A-Za-z_])([0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4})($|[^0-9])"
  val Ipv4Pattern = "(^|[^0-9A-Za-z_.])([0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})($|[^0-9.])"

  /** PII scrubbing (the C4/Dolma-style pre-training pass): per-doc
    * match counts plus the redacted text with typed placeholders.
    * Counts are taken on the SAME intermediate text each replacement
    * sees (emails on raw, phones on email-redacted, IPs on
    * phone-redacted), so every count corresponds to a placeholder
    * actually inserted.
    *
    * The phone/IP patterns CONSUME their boundary chars, so a single
    * replace pass misses every second item in a run of PII separated by
    * one boundary char ("10.0.0.1 10.0.0.2"): the first match eats the
    * separator and the scanner resumes at the next digit where the
    * leading-boundary group cannot match. Misses are never adjacent
    * (an unmatched item's own trailing separator is still available to
    * the next), so a SECOND pass over the once-redacted text — where
    * the restored `$3` boundary is no longer consumed — catches them
    * all. Counts sum both passes. Narrow codegen projection — no
    * shuffle, no UDFs. Output: `idCol, n_emails, n_phones, n_ips,
    * redacted`.
    */
  def piiScrub(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    def scrub2(src: Column, pattern: String, repl: String): (Column, Column) = {
      val pass1 = regexp_replace(src, pattern, repl)
      val pass2 = regexp_replace(pass1, pattern, repl)
      val n = (regexp_count(src, lit(pattern)) + regexp_count(pass1, lit(pattern))).cast("long")
      (pass2, n)
    }
    val afterEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val (afterPhone, nPhones) = scrub2(afterEmail, PhonePattern, "$1<PHONE>$3")
    val (afterIp, nIps) = scrub2(afterPhone, Ipv4Pattern, "$1<IP>$3")
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      nPhones.as("n_phones"),
      nIps.as("n_ips"),
      afterIp.as("redacted")
    )
  }

  /** URL pattern: scheme group + host group + rest-of-URL (explicit
    * ASCII whitespace terminator, engine-portable like the PII set).
    */
  val UrlPattern = "(https?)://([A-Za-z0-9.-]+)(:[0-9]+)?[^ \\t\\n\\x0B\\f\\r]*"

  /** URL statistics (the C4/RefinedWeb-style web-corpus pass): per-doc
    * URL count, https share, and the sorted distinct lowercase host
    * list (CSV string — keeps the output schema flat for any engine).
    * Narrow codegen projection except the tiny per-doc host-array
    * transform. Output: `idCol, n_urls, n_https, domains`.
    */
  def urlStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(t, lit("https://")).cast("long").as("n_https"),
      array_join(
        array_sort(array_distinct(transform(regexp_extract_all(t, lit(UrlPattern), lit(2)), d => lower(d)))),
        ","
      ).as("domains")
    )
  }

  /** Token-repetition statistics (the Gopher repetition quality
    * rules): distinct-token ratio and most-frequent-token mass.
    * Plan shape: explode → per-(doc, token) counts → per-doc
    * aggregates — whole-stage codegen with map-side partial counts,
    * shuffles keyed on (doc, token) then doc.
    * Output: `idCol, n_words, n_distinct, rep_ratio, top_word_frac`.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val stats = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum("c").cast("long").as("n_words"),
        count(lit(1)).cast("long").as("n_distinct"),
        max("c").cast("long").as("top_count")
      )
      .select(
        col(idCol),
        col("n_words"),
        col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_words")).as("rep_ratio"),
        (col("top_count").cast("double") / col("n_words")).as("top_word_frac")
      )
    // row-preserving like every per-doc TextOps operator: a NULL text
    // explodes to zero rows, so join stats back (NULL stats for it)
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
  }

  /** Context-window chunking: split each document into consecutive
    * `chunkTokens`-token pieces (the training-sequence packing
    * pre-step). One output row per chunk with its index and token
    * count; empty docs yield one empty chunk (row-preserving for
    * downstream joins).
    *
    * Single linear scan per document: whitespace runs collapse to one
    * space (after which no token can contain whitespace), every
    * `chunkTokens`-th token boundary is marked with `\n` (a character
    * that cannot survive the collapse), and the marks become the chunk
    * splits. `\G` pins each regex match to the end of the previous one
    * and the quantifiers are possessive, so the engine neither rescans
    * nor backtracks — O(doc length), all codegen. (The previous
    * higher-order-function form — `transform(sequence)` + `slice` +
    * `array_join` — ran interpreted and re-evaluated the token split
    * per chunk: O(chunks × tokens) per doc, measured 8+ min for a
    * single-task 50k-doc pass that this form does in seconds.)
    * `[^ ]*` (not `+`) keeps the empty tokens a split on whitespace
    * runs yields at the ends of a doc trimmed only of spaces.
    * Output: `idCol, chunk_idx, chunk_text, n_tokens`.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String, chunkTokens: Int = 128): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    df.select(col(idCol), posexplode(chunkArray(col(textCol), chunkTokens)).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", chunkTokenCount(col("chunk_text")))
  }

  /** The chunk-split array of [[chunk]] as a Column — the SQL-text
    * backend renders THIS expression, so the two paths cannot drift.
    */
  private[graft] def chunkArray(text: Column, chunkTokens: Int): Column = {
    val collapsed = regexp_replace(trim(text), WsClass + "+", " ")
    val cut = "\\G((?:[^ ]*+ ){" + (chunkTokens - 1) + "}[^ ]*+) "
    split(regexp_replace(collapsed, cut, "$1\n"), "\n", -1)
  }

  /** Token count of one chunk (empty chunk = 0, not 1). */
  private[graft] def chunkTokenCount(chunkText: Column): Column =
    when(length(chunkText) === 0, lit(0L))
      .otherwise(size(split(chunkText, " ")).cast("long"))

  /** Document fingerprinting over normalized text: full 128-bit md5 hex
    * plus a 64-bit prefix form — identical in any engine with md5().
    * Output: `idCol, fp_md5, fp64`.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = md5(normalize(col(textCol)).cast("binary"))
    df.select(
      col(idCol),
      fp.as("fp_md5"),
      substring(fp, 1, 16).as("fp64")
    )
  }

  /** Feature hashing (the hashing trick): normalized whitespace tokens
    * → `hash32(token) mod nBuckets` → per-document bucket counts — the
    * standard cheap sparse text vectorizer in front of a quality /
    * language classifier (fastText-style bag-of-words at CCNet scale)
    * when a learned vocabulary is impossible at corpus size. Sparse
    * exploded output: `(idCol, bucket, cnt)` — only occupied buckets
    * materialize.
    *
    * Scale posture (100 TB): explode → codegen hash+pmod projection →
    * ONE map-side-combined shuffle keyed `(id, bucket)` — the count
    * aggregate collapses each document's repeated tokens before the
    * exchange, so the shuffle carries at most `min(n_tokens, nBuckets)`
    * rows per document. Portable md5-based hash32: any engine
    * reproduces bucket ids bit-for-bit.
    */
  /** Corpus vocabulary top-k: normalized-token frequencies, highest
    * count first (token text breaks ties, so the cut is total-order
    * deterministic — the round-5 non-unique-sort-key lesson). The
    * Zipf-curve / vocabulary-coverage pass every corpus report runs.
    *
    * Scale posture (100 TB): explode → ONE map-side-combined count
    * aggregate keyed by token (the combine collapses each partition's
    * repeats before the exchange) → `TakeOrderedAndProject` for the
    * top-k cut (per-partition partial top-k, no global sort).
    * Output: `(token, cnt)`.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(tokens(normalize(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }

  /** CCNet-style domain-LM quality scoring, hashed-bigram form: score
    * every corpus document by how much of it a TARGET-DOMAIN bigram
    * model explains. CCNet ranks Common-Crawl text by the perplexity
    * of a Wikipedia-trained LM; the engine-exact analogue here is
    * bigram COVERAGE against the top-`topK` bigrams of a reference
    * frame `ref` (the domain sample) — all counts are integers and the
    * one division is a single IEEE op, so every value reproduces
    * bit-for-bit on any engine, which a log-probability never does
    * (`ln` is not correctly rounded).
    *
    * Output per input row (row-preserving):
    * `(idCol, n_bigrams, n_hits, model_mass, coverage)` where
    * `n_hits` counts the doc's bigram occurrences (with multiplicity)
    * that appear in the model, `model_mass` sums their model
    * frequencies (high-frequency domain bigrams weigh more), and
    * `coverage = n_hits / n_bigrams` (0.0 for docs under 2 tokens).
    *
    * Scale shape (100 TB corpus, bounded ref): bigrams are HASHED in
    * the [[graft.functions.ShingleHashes]] codegen projection (n=2
    * Horner combine — no bigram strings exist, ever); the model is
    * `topK` rows by construction (`TakeOrderedAndProject` cut, count
    * desc / hash asc total order) and broadcasts; the corpus-side plan
    * is scan → shingle projection → broadcast left join → ONE
    * map-side-combined per-doc aggregate. The ref frame is the small
    * curated domain sample (CCNet's Wikipedia), never the corpus.
    *
    * PLAN-TIME BAKE CONTRACT: construction eagerly runs one Spark job
    * (the topK model cut over `ref`) and bakes the bigram model into
    * the returned plan. The model is a snapshot of `ref` at
    * construction; rebuild the frame to re-fit after `ref` changes.
    */
  def lmScore(
      df: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      topK: Int = 1000
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // only docs with a real bigram (>= 2 tokens) enter either side —
    // ShingleHashes' whole-text fallback hash must not act as a
    // pseudo-bigram in an LM model
    def bigramRows(d: DataFrame): DataFrame =
      NearDup.hashedShingles(
        d.filter(size(NearDup.tokens(col(textCol))) >= 2), textCol, idCol, n = 2)
    // The model is AT MOST topK rows by construction — a bounded
    // plan-time constant (the IVF-centroid precedent), collected once
    // and BAKED into a per-row codegen loop (round 19,
    // [[graft.functions.LmBigramStats]]): the corpus-side plan drops
    // from explode → broadcast join → per-doc aggregate →
    // row-restoring left join (two joins, two exchanges) to ONE
    // narrow projection. All three statistics are integer counts, so
    // the fusion is exact; the collect mirrors the old broadcast
    // model frame row-for-row (same count/order cut).
    val modelRows = bigramRows(ref)
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("h"))
      .limit(topK)
      .collect()
    val sorted = modelRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val stats = graft.functions.LmBigramStats(
      NearDup.tokens(col(textCol)), sorted.map(_._1), sorted.map(_._2))
    df.select(col(idCol), coalesce(stats, lit(Array(0L, 0L, 0L))).as("__lm"))
      .select(
        col(idCol),
        element_at(col("__lm"), 1).as("n_bigrams"),
        element_at(col("__lm"), 2).as("n_hits"),
        element_at(col("__lm"), 3).as("model_mass")
      )
      .select(
        col(idCol),
        col("n_bigrams"),
        col("n_hits"),
        col("model_mass"),
        when(col("n_bigrams") === 0L, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_bigrams").cast("double"))
          .as("coverage")
      )
  }

  /** Subword token accounting: greedy WordPiece-style segmentation
    * counts per document — `(idCol, n_subwords, n_oov)` — via the
    * [[graft.functions.SubwordCounts]] native expression (one codegen
    * loop per row, vocabulary baked into the generated code; no
    * shuffle, no UDF). `n_subwords` is what a longest-match tokenizer
    * would actually emit (the number training budgets care about;
    * whitespace counts drift 2-4× from it) and `n_oov` counts
    * single-character fallbacks — a free script/domain mismatch
    * signal. The counts array is referenced twice below (one element
    * each), so the segmentation loop runs twice per row after
    * CollapseProject — accepted: the loop is O(chars · vocab) with no
    * allocation, and the explode-barrier alternative costs a shuffle.
    */
  def subwordStats(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Seq[String] = graft.functions.SubwordCounts.DefaultVocab
  ): DataFrame = {
    val sc = graft.functions.SubwordCounts.subwordCounts(NearDup.tokens(col(textCol)), vocab)
    df.select(
      col(idCol),
      element_at(sc, 1).as("n_subwords"),
      element_at(sc, 2).as("n_oov")
    )
  }

  /** Gopher-style WITHIN-DOC duplicate-line ratios (the "repetitious
    * document" filters of Rae et al. 2021, line granularity —
    * [[repetitionStats]] covers the token-level rules, [[Dedup
    * .dedupLines]] the corpus-level removal): fraction of lines that
    * repeat an earlier line of the SAME document, by count and by
    * character mass. High values mark boilerplate/spam documents for
    * dropping. Lines are the '. '-fragments of the normalized text
    * (the dedupLines convention).
    *
    * Output (row-preserving): `(idCol, n_lines, n_dup_lines,
    * dup_line_frac, dup_char_frac)` — integers plus two single IEEE
    * divisions, engine-exact. Plan: explode → (doc, line) count
    * aggregate → per-doc aggregate, both map-side combined; no joins,
    * no text through more than the first shuffle.
    */
  def dupLineStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val frags = df
      .select(col(idCol), explode(split(normalize(col(textCol)), "\\. ")).as("frag"))
      .filter(length(col("frag")) > 0)
    val perLine = frags
      .groupBy(col(idCol), col("frag"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(idCol), col("cnt"), length(col("frag")).cast("long").as("len"))
    val perDoc = perLine
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_lines"),
        sum(col("cnt") - 1).as("n_dup_lines"),
        sum(col("cnt") * col("len")).as("tot_chars"),
        sum((col("cnt") - 1) * col("len")).as("dup_chars")
      )
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        when(col("n_lines").isNull, lit(0.0))
          .otherwise(col("n_dup_lines").cast("double") / col("n_lines").cast("double"))
          .as("dup_line_frac"),
        when(col("tot_chars").isNull || col("tot_chars") === 0L, lit(0.0))
          .otherwise(col("dup_chars").cast("double") / col("tot_chars").cast("double"))
          .as("dup_char_frac")
      )
  }

  /** Gopher duplicate n-gram coverage (the last of Rae et al. 2021's
    * repetition-rule family here — [[repetitionStats]] covers the
    * token rules, [[dupLineStats]] the line rules): the fraction of a
    * document's TOKENS covered by some n-gram that occurs at least
    * twice WITHIN the document (the paper's "fraction of characters
    * in duplicate n-grams", at token granularity — chars and tokens
    * rank documents near-identically and tokens keep the counts
    * integer-exact cross-engine). Uses the shared
    * [[graft.functions.ShingleHashes]] rolling hashes; docs under `n`
    * tokens have no n-gram and score 0.
    *
    * Output (row-preserving): `(idCol, n_tok, n_covered, dup_frac)`.
    * Plan: codegen shingle projection → (doc, hash) count → span
    * explode → distinct-position count per doc — all doc-keyed,
    * map-side combined, no text beyond the first projection.
    */
  def dupNgramStats(df: DataFrame, textCol: String, idCol: String, n: Int = 10): DataFrame = {
    require(n >= 2, s"n-gram width must be >= 2, got $n")
    val base = df.select(col(idCol), NearDup.tokens(col(textCol)).as("w"))
    // only docs with a genuine n-gram participate (the ShingleHashes
    // whole-text fallback for short docs must not count as an n-gram)
    val long = base.filter(size(col("w")) >= n)
    val kg = long.select(
      col(idCol),
      posexplode(graft.functions.TextHash.shingleHashes(col("w"), n)).as(Seq("pos", "h")))
    // windowed count, not a collect_list of positions: a pathological
    // doc repeating one n-gram 10^6 times must stay row-shaped, never
    // a 10^6-element array in one aggregation buffer
    val wh = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol), col("h"))
    val dupSpans = kg
      .withColumn("__c", count(lit(1)).over(wh))
      .filter(col("__c") >= 2)
      .select(col(idCol), col("pos"))
    val covered = dupSpans
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_covered"))
    val tlen = base.select(col(idCol),
      when(size(col("w")) === 1 && element_at(col("w"), 1) === "", lit(0L))
        .otherwise(size(col("w")).cast("long")).as("n_tok"))
    tlen
      .join(covered, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tok"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        when(col("n_tok") === 0L, lit(0.0))
          .otherwise(coalesce(col("n_covered"), lit(0L)).cast("double") / col("n_tok").cast("double"))
          .as("dup_frac")
      )
  }

  /** Real BPE token accounting: `(idCol, n_bpe)` — the number of
    * tokens a ranked-merge byte-pair encoder
    * ([[graft.functions.BpeCount]], GPT-2/tiktoken-style) actually
    * produces over each document's whitespace words. One codegen
    * merge-loop per row, merge table baked into the generated code; no
    * shuffle, no UDF. Complements [[subwordStats]] (greedy
    * longest-match), which over-counts against a trained BPE because
    * longest-match cannot model merge priority.
    */
  def bpeStats(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)] = graft.functions.BpeCount.DefaultMerges): DataFrame =
    df.select(col(idCol), graft.functions.BpeCount.bpeCount(tokens(col(textCol)), merges).as("n_bpe"))

  def hashedFeatures(df: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    df.select(col(idCol), explode(NearDup.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), pmod(NearDup.hash32(col("tok")), lit(nBuckets.toLong)).cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fixed-point scale of classifier weights: a weight `w` is stored
    * as `round(w · 2^30)` so per-document logits accumulate as exact
    * integer sums (grouped DOUBLE sums have no defined accumulation
    * order across engines/partitionings — the Kmeans precedent).
    */
  val ClassifierScale: Long = 1L << 30

  /** Deterministic LCG weight table `(bucket INT, w_int LONG)` over
    * `[0, nBuckets)`, `w_int` uniform in `[-2^30, 2^30)` (weight in
    * [-1, 1)). Stands in for a trained model in tests/gates — same
    * generator family as [[graft.ops.Project]]'s JL planes; a real
    * deployment loads `(bucket, w_int)` from the training job's output
    * parquet instead.
    */
  def lcgWeightTable(spark: org.apache.spark.sql.SparkSession, nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(
      col("id").cast("int").as("bucket"),
      ((lit(1103515245L) * col("id") + 12345L) % 2147483648L - 1073741824L).as("w_int")
    )

  /** Scala-side mirror of [[lcgWeightTable]]: the same fixed-point
    * weights as a plain array indexed by bucket, for the PLAN-TIME
    * baked inference path ([[classifierScoreBaked]]). Equality with
    * the table generator is asserted in TextOpsSpec.
    */
  def lcgWeights(nBuckets: Int): Array[Long] =
    Array.tabulate(nBuckets)(i => (1103515245L * i + 12345L) % 2147483648L - 1073741824L)

  /** fastText-style linear quality-classifier INFERENCE over hashed
    * bag-of-words features — the CCNet / RefinedWeb "model-based
    * quality filter" shape: each whitespace token hashes to a bucket,
    * the bucket's weight comes from a broadcast model table, and a
    * document's logit is the mean token weight plus a bias.
    *
    * Output: `(idCol, n_tok, logit, keep)` with
    * `logit = (biasScaled · n_tok + Σ_tok w_int) / (n_tok · 2^30)` and
    * `keep = logit >= 0`; a zero-token document scores the bare bias.
    * Thresholding the logit is equivalent to thresholding the sigmoid
    * probability (monotone), and avoids `exp` — which is NOT
    * engine-exact — so every value reproduces bit-for-bit on any
    * engine: the numerator and denominator are exact integers below
    * 2^53 and one IEEE division is correctly rounded everywhere.
    *
    * Scale shape: scan → token explode → codegen hash/bucket
    * projection → map-side BROADCAST join against the (tiny) model →
    * ONE map-side-combined per-doc aggregate → broadcast-able join
    * back for zero-token rows. The corpus text never shuffles; the
    * only exchange carries `(id, partial sums)`.
    *
    * @param weights model table `(bucket INT, w_int LONG)`, `w_int` at
    *                [[ClassifierScale]] fixed-point.
    * @param biasScaled bias at the same fixed-point scale.
    */
  /** [[classifierScore]] with the model BAKED INTO THE PLAN: the
    * weight vector arrives as a literal `array<long>` and each token's
    * weight is `element_at(weights, bucket+1)` — a constant-folded
    * array index inside whole-stage codegen, so the broadcast model
    * JOIN disappears entirely (the embed_project precedent: plan-time
    * literal planes beat a broadcast by removing a build side, a
    * hash-probe per row, and one plan exchange boundary). Identical
    * output to the table form for a dense model (asserted in
    * TextOpsSpec); sizing: a fastText-style hashed model is
    * `nBuckets` longs — 8 KB at 1024, 16 MB at 2M buckets, both well
    * inside task-binary limits, and the literal ships once per
    * executor with the closure rather than per-query as a broadcast.
    *
    * Prefer this form when the model is known at plan time (the
    * common inference case: weights loaded driver-side from the
    * training job's output); [[classifierScore]] remains for models
    * that live in a table.
    */
  def classifierScoreBaked(
      df: DataFrame,
      weights: Array[Long],
      textCol: String,
      idCol: String,
      biasScaled: Long = 0L
  ): DataFrame = {
    val nBuckets = weights.length
    require(nBuckets >= 2, s"need >= 2 weights, got $nBuckets")
    val scaleD = ClassifierScale.toDouble
    // ONE fused loop per row (round 19, graft.functions.ClassifierAcc):
    // the logit accumulators are integer (2^30-scaled longs — the
    // model's whole design), so the per-document reduction fuses
    // row-locally, deleting the exploded token stream, the aggregate
    // exchange, and the row-restoring left join — the plan is now one
    // codegen projection over the scan. The null-array coalesce is the
    // old join's null branch (n_tok 0; acc unused at n_tok = 0).
    val accArr = graft.functions.ClassifierAcc(NearDup.tokens(col(textCol)), weights)
    val logit =
      when(col("n_tok") === 0L, lit(biasScaled.toDouble / scaleD))
        .otherwise(
          (lit(biasScaled) * col("n_tok") + col("acc")).cast("double") /
            (col("n_tok") * ClassifierScale).cast("double"))
    df.select(col(idCol), coalesce(accArr, lit(Array(0L, 0L))).as("__ca"))
      .select(col(idCol),
        element_at(col("__ca"), 2).as("n_tok"),
        element_at(col("__ca"), 1).as("acc"))
      .select(
        col(idCol),
        col("n_tok"),
        logit.as("logit"),
        (logit >= 0.0).as("keep")
      )
  }

  def classifierScore(
      df: DataFrame,
      weights: DataFrame,
      textCol: String,
      idCol: String,
      biasScaled: Long = 0L,
      nBuckets: Int = 1024
  ): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val scaleD = ClassifierScale.toDouble
    val acc = df
      .select(col(idCol), explode(NearDup.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), pmod(NearDup.hash32(col("tok")), lit(nBuckets.toLong)).cast("int").as("bucket"))
      // LEFT join: a sparse model (buckets missing from the table) must
      // still count every token in n_tok — missing weights read as 0,
      // not as dropped tokens (which would skew both the sum and mean).
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w_int"), lit(0L))).as("acc"), count(lit(1)).as("n_tok"))
    val logit =
      when(col("n_tok") === 0L, lit(biasScaled.toDouble / scaleD))
        .otherwise(
          (lit(biasScaled) * col("n_tok") + col("acc")).cast("double") /
            (col("n_tok") * ClassifierScale).cast("double"))
    df.select(col(idCol))
      .join(acc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tok"), lit(0L)).as("n_tok"), col("acc"))
      .select(
        col(idCol),
        col("n_tok"),
        logit.as("logit"),
        (logit >= 0.0).as("keep")
      )
  }
}
