package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine variants.
  *
  * Scale posture (100 TB):
  *   - Candidate generation is ALWAYS a banded equi-join on compact
  *     signature keys — cost linear in rows + true candidates, never an
  *     all-pairs comparison. The shuffle keys are band hashes
  *     (high-cardinality), so partitioning is even; AQE handles
  *     residual skew from hot buckets.
  *   - Signatures are computed in one codegen'd projection per row
  *     (array lambdas over builtins; no UDFs, no mapPartitions).
  *   - Pair scoring joins the (small) signature table to the candidate
  *     pairs, not documents to documents.
  *
  * Portability: every hash is md5-derived and every bit/band extraction
  * is plain integer arithmetic over the hex text (via `ascii`), so an
  * independent engine (DuckDB oracle, ClickHouse) reproduces results
  * bit-for-bit — the same property the reference gets by compiling to
  * engine-neutral SQL.
  */
object NearDup {

  private def md5hex(c: Column): Column = md5(c.cast("binary"))

  // ---- shingling -------------------------------------------------------

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(TextOps.normalize(text), " ")

  /** Word n-gram shingles (default 3). Texts shorter than n words get a
    * single whole-text shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) < n, array(concat_ws(" ", w)))
      .otherwise(transform(sequence(lit(1), size(w) - (n - 1)), i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  // ---- MinHash + LSH ---------------------------------------------------

  /** K-element MinHash signature: component j is the minimum md5 of
    * `"j:" + shingle` (lexicographic min over hex strings — the textbook
    * permutation-hash approximation, portable across engines).
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingleCol, s => md5hex(concat(j.cast("string"), lit(":"), s))))
    )

  /** (id, band_idx, band_key) rows: the signature split into
    * `k / bandRows` bands of `bandRows` components each.
    */
  private def bandRowsOf(sigs: DataFrame, idCol: String, k: Int, bandRows: Int): DataFrame = {
    val nBands = k / bandRows
    val bands = transform(
      sequence(lit(0), lit(nBands - 1)),
      j => concat_ws("|", slice(col("sig"), j * bandRows + 1, lit(bandRows)))
    )
    sigs.select(col(idCol), posexplode(bands).as(Seq("band_idx", "band_key")))
  }

  /** Distinct candidate pairs (`id_a < id_b`) sharing at least one band. */
  private def bandCandidates(bandRows: DataFrame, idCol: String): DataFrame =
    bandRows.as("a")
      .join(
        bandRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$idCol") < col(s"b.$idCol")
      )
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()

  /** MinHash-LSH near-duplicate pairs with estimated similarity
    * (fraction of matching signature components) at or above
    * `minEstSim`. Output: `id_a, id_b, est_sim`.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 32,
      bandRows: Int = 2,
      minEstSim: Double = 0.25
  ): DataFrame = {
    val sigs = df.select(col(idCol), minhashSignature(shingles(col(textCol)), k).as("sig"))
    val cand = bandCandidates(bandRowsOf(sigs, idCol, k, bandRows), idCol)
    val est = size(filter(
      sequence(lit(1), lit(k)),
      i => element_at(col("s1.sig"), i) === element_at(col("s2.sig"), i)
    )).cast("double") / k
    cand.as("c")
      .join(sigs.as("s1"), col("c.id_a") === col(s"s1.$idCol"))
      .join(sigs.as("s2"), col("c.id_b") === col(s"s2.$idCol"))
      .select(col("c.id_a"), col("c.id_b"), est.as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** Exact n-gram Jaccard over LSH candidates (single-component bands →
    * high recall); pairs with Jaccard ≥ `minJaccard`.
    * Output: `id_a, id_b, jaccard`.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      minJaccard: Double = 0.2
  ): DataFrame = {
    val sh = df.select(col(idCol), array_distinct(shingles(col(textCol))).as("sh"))
    val sigs = sh.select(col(idCol), minhashSignature(col("sh"), k).as("sig"))
    val cand = bandCandidates(bandRowsOf(sigs, idCol, k, 1), idCol)
    val jac = size(array_intersect(col("h1.sh"), col("h2.sh"))).cast("double") /
      size(array_union(col("h1.sh"), col("h2.sh")))
    cand.as("c")
      .join(sh.as("h1"), col("c.id_a") === col(s"h1.$idCol"))
      .join(sh.as("h2"), col("c.id_b") === col(s"h2.$idCol"))
      .select(col("c.id_a"), col("c.id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ---- SimHash ---------------------------------------------------------

  /** Value of hex digit `pos` (1-based) of `h` via character code —
    * integer arithmetic only, portable to any engine with `ascii()`.
    */
  private def hexNibble(h: Column, pos: Column): Column = {
    val a = ascii(h.substr(pos, lit(1)))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** ±1 contribution of token-hash `h` to simhash bit `i` (0..31):
    * bit i lives in hex digit `i / 4`, mask `2^(3 - i%4)`.
    */
  private def bitContribution(h: Column, i: Column): Column = {
    val nib = hexNibble(h, shiftright(i, 2) + 1)
    val mask = element_at(array(lit(8), lit(4), lit(2), lit(1)), i.bitwiseAND(lit(3)) + 1)
    lit(2) * ((nib / mask).cast("int") % 2) - 1
  }

  /** 32-bit SimHash over the token multiset (term frequency weighted):
    * one pass over the tokens with an array accumulator.
    */
  def simhash32(tokenCol: Column): Column = {
    val sums = aggregate(
      tokenCol,
      array_repeat(lit(0), 32),
      (acc, t) => {
        val h = md5hex(t)
        zip_with(acc, transform(sequence(lit(0), lit(31)), i => bitContribution(h, i)), _ + _)
      }
    )
    val powers = array((0 until 32).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L),
      _ + _
    )
  }

  /** SimHash near-duplicate pairs: 4 bands of 8 bits generate
    * candidates; pairs within `maxHamming` bits survive.
    * Output: `id_a, id_b, hamming`.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sims = df.select(col(idCol), simhash32(tokens(col(textCol))).as("sim"))
    val bands = transform(
      sequence(lit(0), lit(3)),
      j => (col("sim") / pow(lit(2), j * 8).cast("long")).cast("long") % 256
    )
    val bandRows = sims.select(col(idCol), posexplode(bands).as(Seq("band_idx", "band_key")))
    val cand = bandCandidates(bandRows, idCol)
    cand.as("c")
      .join(sims.as("m1"), col("c.id_a") === col(s"m1.$idCol"))
      .join(sims.as("m2"), col("c.id_b") === col(s"m2.$idCol"))
      .select(
        col("c.id_a"),
        col("c.id_b"),
        bit_count(col("m1.sim").bitwiseXOR(col("m2.sim"))).cast("int").as("hamming")
      )
      .filter(col("hamming") <= maxHamming)
  }

  /** Remove near-duplicates from the corpus given a candidate-pair
    * frame (`id_a < id_b` convention, as produced by the *Pairs ops):
    * every row whose id appears as the GREATER member of a pair is
    * dropped, so exactly the smallest id of each duplicate cluster
    * that is not itself dominated survives. Greedy-by-id (the
    * standard corpus-dedup rule — deterministic, one anti-join, no
    * iterative connected components).
    *
    * Scale: the pairs frame is tiny relative to the corpus (true
    * near-dups only), so Catalyst plans the anti-join as a broadcast.
    */
  def dropNearDuplicates(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(
      pairs.select(col("id_b").as("__drop_id")).distinct(),
      col(idCol) === col("__drop_id"),
      "left_anti"
    )

  // ---- embedding cosine --------------------------------------------------

  /** Deterministic pseudo-random hyperplane component for flat index
    * `idx`: LCG step mapped to [-0.5, 0.5). Exact in double arithmetic,
    * so any engine reproduces it.
    */
  private[ops] def planeComponent(idx: Column): Column =
    (((lit(1103515245L) * idx + 12345L) % 2147483648L) / lit(2147483648.0)) - 0.5

  /** Left-fold double dot product (deterministic summation order). */
  private[ops] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  /** `planes`-bit sign-LSH signature of double-array column `v`:
    * bit p is the sign of the dot product with deterministic
    * hyperplane p (components from [[planeComponent]]).
    */
  private[ops] def signSignature(v: Column, dim: Int, planes: Int): Column =
    aggregate(
      transform(
        sequence(lit(0), lit(planes - 1)),
        p => {
          val d = aggregate(
            sequence(lit(0), lit(dim - 1)),
            lit(0.0),
            (acc, j) => acc + element_at(v, j + 1) * planeComponent(p * dim + j)
          )
          when(d >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
        }
      ),
      lit(0L),
      _ + _
    )

  /** Embedding near-duplicate pairs via sign-LSH candidates + exact
    * cosine rescoring. `planes` random hyperplanes give a `planes`-bit
    * signature, split into bands of `bandBits`; candidates share a
    * band. Output: `id_a, id_b, cos_sim`.
    */
  def embedCosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      planes: Int = 16,
      bandBits: Int = 4,
      minCos: Double = 0.4
  ): DataFrame = {
    val vec = transform(col(vecCol), x => x.cast("double"))
    val base = df.select(col(idCol), vec.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val sigs = base.withColumn("sig", signSignature(col("v"), dim, planes))
    val nBands = planes / bandBits
    val bands = transform(
      sequence(lit(0), lit(nBands - 1)),
      j => (col("sig") / pow(lit(2), j * bandBits).cast("long")).cast("long") % (1 << bandBits)
    )
    val bandRows = sigs.select(col(idCol), posexplode(bands).as(Seq("band_idx", "band_key")))
    val cand = bandCandidates(bandRows, idCol)
    cand.as("c")
      .join(sigs.as("e1"), col("c.id_a") === col(s"e1.$idCol"))
      .join(sigs.as("e2"), col("c.id_b") === col(s"e2.$idCol"))
      .select(
        col("c.id_a"),
        col("c.id_b"),
        (dot(col("e1.v"), col("e2.v")) / (col("e1.nrm") * col("e2.nrm"))).as("cos_sim")
      )
      .filter(col("cos_sim") >= minCos)
  }
}
