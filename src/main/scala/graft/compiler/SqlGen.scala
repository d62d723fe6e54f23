package graft.compiler

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.parser._

/** Compiles a parsed PQL program into a SPARK SQL QUERY STRING — the
  * embedder-facing analogue of the reference's `Compile` (reference
  * pql.go:18-34 returns engine SQL text; graft's primary path compiles
  * straight to Catalyst plans, but an embedding host that ships SQL to
  * a cluster, logs it, or feeds a SQL-auditing pipeline needs the
  * text).
  *
  * Architecture mirrors the reference's emission — one CTE per
  * pipeline stage (`__s0`, `__s1`, …) — in the Spark SQL dialect.
  * Semantics CANNOT drift from the DataFrame path because every scalar
  * expression is compiled by the same [[Exprs]] into a Catalyst
  * [[Column]] and rendered with `Column.expr.sql`; only the stage
  * skeleton (SELECT/WHERE/GROUP BY/JOIN/ORDER BY/LIMIT) is authored
  * here. `SqlCompileSpec` proves `spark.sql(compileToSql(q))` ≡
  * `Pql.query(q)` on the reference's own golden corpus.
  *
  * Ordering: `sort` adjacent to `take`/`top` merges into one
  * `ORDER BY … LIMIT n` stage (subquery ordering does not survive a
  * CTE boundary in SQL), and a TRAILING sort/top attaches to the final
  * SELECT, so every ordering the language can observe is preserved. A
  * mid-pipeline sort not followed by `take` emits an ORDER BY stage
  * whose order — exactly as in SQL generally — is not guaranteed to
  * survive later stages.
  *
  * The graft EXTENSION operators emit as CTE chains wherever a single
  * SQL string can carry their semantics: sample, chunk, pack, decontam,
  * the asof/range joins, dedup kinds exact/minhash/lines and the
  * fixed-geometry embed/semantic, and ann kinds brute/lsh/ivf with
  * fixed indexes (native expressions ride the registered `graft_*`
  * function library). Forms whose PLAN depends on data read at compile
  * time (adaptive geometry/cells from a corpus count, `sample
  * budget=`'s crossover) or on genuinely multi-stage machinery
  * (simhash/substrings dedup) are rejected with a spanned pointer to
  * `Pql.query`.
  */
private[graft] final class SqlGen(
    sourceText0: String,
    catalog: String => DataFrame,
    params: Map[String, Column]
) {

  private val exprs = new Exprs(sourceText0)
  import exprs.{compile, fail, sourceText}

  private val scope = mutable.LinkedHashMap[String, Column]() ++= params
  private val letAsts = mutable.Map[String, Expr]()
  /** `| as Name` stages: name → (cte name, schema frame). */
  private val named = mutable.Map[String, (String, DataFrame)]()
  private val ctes = mutable.ArrayBuffer[(String, String)]()
  private var stageSeq = 0
  private var joinSeq = 0

  private def env: ExprEnv = ExprEnv(scope)

  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Column existence the way the ANALYZER resolves it — respecting
    * `spark.sql.caseSensitive` (default false), so the text backend
    * accepts exactly the pipelines the plan path accepts (advice,
    * round 15: a case-sensitive contains() here rejected `dedup Text
    * by doc_id` that Pql.query ran fine).
    */
  private def hasColumn(df: DataFrame, name: String): Boolean = {
    val caseSensitive = df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    if (caseSensitive) df.columns.contains(name)
    else df.columns.exists(_.equalsIgnoreCase(name))
  }

  private def sqlOf(c: Column): String =
    org.apache.spark.sql.graftglue.Bridge.resolvedExpression(c).sql

  private def newStage(sql: String): String = {
    val n = s"__s$stageSeq"
    stageSeq += 1
    ctes += n -> sql
    n
  }

  /** A pipeline stage: the CTE it lives in plus the schema-tracking
    * frame (never executed — schemas drive `*`-expansion and join
    * collision renaming, exactly like the DataFrame compiler).
    */
  private final case class Stage(cte: String, df: DataFrame)

  def run(stmts: List[Statement]): String = {
    var tabular: Option[TabularExpr] = None
    stmts.foreach {
      case let: LetStatement =>
        if (tabular.isEmpty) {
          scope(let.name.name) = compile(let.x, env.copy(letMode = true))
          letAsts(let.name.name) = let.x
        }
      case t: TabularExpr =>
        if (tabular.isDefined) fail("batch queries not supported", t.span)
        tabular = Some(t)
    }
    val t = tabular.getOrElse(
      throw new PqlCompileException("missing tabular query", Span.none, sourceText0))

    // trailing sort/top/sort+take binds to the final SELECT — an outer
    // `SELECT * FROM cte` would discard a CTE's ordering
    val (bodyOps, finalClause) = splitTrailingOrder(t.operators)
    val last = foldOps(sourceStage(t.source), bodyOps)
    val sql = new StringBuilder
    if (ctes.nonEmpty)
      sql ++= ctes.map { case (n, s) => s"$n AS (\n  $s\n)" }.mkString("WITH ", ",\n", "\n")
    sql ++= s"SELECT * FROM ${last.cte}"
    finalClause.foreach(f => sql ++= f(last))
    sql.result()
  }

  /** Peel a trailing `sort` / `top` / `sort take` off the operator
    * list; returns the remaining ops plus a renderer for the final
    * ORDER BY/LIMIT clause.
    */
  private def splitTrailingOrder(
      ops: List[TabularOperator]): (List[TabularOperator], Option[Stage => String]) =
    ops.reverse match {
      case (s: SortOp) :: rest =>
        (rest.reverse, Some(_ => s"\nORDER BY ${orderText(s.terms)}"))
      case (tk: TakeOp) :: (s: SortOp) :: rest =>
        (rest.reverse, Some(_ => s"\nORDER BY ${orderText(s.terms)} LIMIT ${rowCount(tk.rowCount)}"))
      case (tp: TopOp) :: rest =>
        (rest.reverse, Some(_ => s"\nORDER BY ${orderText(List(tp.col))} LIMIT ${rowCount(tp.rowCount)}"))
      case _ => (ops, None)
    }

  private def sourceStage(src: TableRef): Stage =
    named.get(src.table.name) match {
      case Some((cte, df)) => Stage(cte, df)
      case None =>
        val df =
          try catalog(src.table.name)
          catch {
            case e: Exception =>
              fail(s"unknown table ${src.table.name}: ${e.getMessage}", src.span)
          }
        Stage(newStage(s"SELECT * FROM ${q(src.table.name)}"), df)
    }

  private def foldOps(start: Stage, ops: List[TabularOperator]): Stage = ops match {
    case Nil => start
    // sort immediately followed by take: one ORDER BY … LIMIT stage
    // (the DataFrame path's orderBy().limit() → TakeOrderedAndProject)
    case (s: SortOp) :: (t: TakeOp) :: rest =>
      val cte = newStage(
        s"SELECT * FROM ${start.cte} ORDER BY ${orderText(s.terms)} LIMIT ${rowCount(t.rowCount)}")
      foldOps(Stage(cte, start.df), rest)
    case op :: rest => foldOps(applyOp(start, op), rest)
  }

  private def applyOp(prev: Stage, op: TabularOperator): Stage = op match {
    case WhereOp(pred, _) =>
      Stage(
        newStage(s"SELECT * FROM ${prev.cte} WHERE ${sqlOf(compile(pred, env))}"),
        prev.df.filter(compile(pred, env)))

    case ProjectOp(cols, _) =>
      val items = cols.map { c =>
        val column = c.x match {
          case Some(x)               => compile(x, env)
          case None if c.name.quoted => exprs.attr(c.name.name)
          case None                  => compile(c.name.asQualified, env)
        }
        s"${sqlOf(column)} AS ${q(c.name.name)}" -> column.as(c.name.name)
      }
      Stage(
        newStage(s"SELECT ${items.map(_._1).mkString(", ")} FROM ${prev.cte}"),
        prev.df.select(items.map(_._2): _*))

    case ExtendOp(cols, _) =>
      val items = cols.map(computedItem)
      Stage(
        newStage(s"SELECT *, ${items.map(_._1).mkString(", ")} FROM ${prev.cte}"),
        prev.df.select(col("*") +: items.map(_._2): _*))

    case SummarizeOp(aggs, by, span) =>
      val aggItems = aggs.map(computedItem)
      val keyItems = by.map(computedItem)
      if (aggItems.isEmpty) {
        Stage(
          newStage(s"SELECT DISTINCT ${keyItems.map(_._1).mkString(", ")} FROM ${prev.cte}"),
          prev.df.select(keyItems.map(_._2): _*).distinct())
      } else if (keyItems.isEmpty) {
        Stage(
          newStage(s"SELECT ${aggItems.map(_._1).mkString(", ")} FROM ${prev.cte}"),
          prev.df.agg(aggItems.head._2, aggItems.tail.map(_._2): _*))
      } else {
        val keyExprTexts = by.map(c => sqlOf(compile(c.x, env)))
        Stage(
          newStage(
            s"SELECT ${(keyItems ++ aggItems).map(_._1).mkString(", ")} FROM ${prev.cte}" +
              s" GROUP BY ${keyExprTexts.mkString(", ")}"),
          prev.df.groupBy(keyItems.map(_._2): _*).agg(aggItems.head._2, aggItems.tail.map(_._2): _*))
      }

    case s: SortOp =>
      // mid-pipeline sort (not adjacent to take, not trailing): SQL
      // gives no cross-stage ordering guarantee — same caveat as any
      // SQL engine; emitted for the cases where it is observable
      Stage(
        newStage(s"SELECT * FROM ${prev.cte} ORDER BY ${orderText(s.terms)}"),
        prev.df.orderBy(s.terms.map(sortColumn): _*))

    case TakeOp(n, _) =>
      Stage(newStage(s"SELECT * FROM ${prev.cte} LIMIT ${rowCount(n)}"), prev.df.limit(rowCount(n)))

    case TopOp(n, term, _) =>
      Stage(
        newStage(s"SELECT * FROM ${prev.cte} ORDER BY ${orderText(List(term))} LIMIT ${rowCount(n)}"),
        prev.df.orderBy(sortColumn(term)).limit(rowCount(n)))

    case CountOp(_) =>
      Stage(
        newStage(s"SELECT count(1) AS ${q("count()")} FROM ${prev.cte}"),
        prev.df.agg(count(lit(1)).as("count()")))

    case j: JoinOp => applyJoin(prev, j)

    case AsOp(name, _) =>
      named(name.name) = (prev.cte, prev.df)
      prev

    case RenderOp(chartType, props, _) =>
      val lits = (s"'${chartType.name.replace("'", "''")}' AS ${q("render_type")}" ::
        props.map(p => s"'${renderValue(p.value).replace("'", "''")}' AS ${q(s"render_prop_${p.name.name}")}"))
      val df = props.foldLeft(prev.df.withColumn("render_type", lit(chartType.name))) { (acc, p) =>
        acc.withColumn(s"render_prop_${p.name.name}", lit(renderValue(p.value)))
      }
      Stage(newStage(s"SELECT *, ${lits.mkString(", ")} FROM ${prev.cte}"), df)

    case op: AsofJoinOp  => applyAsofJoin(prev, op)
    case op: RangeJoinOp => applyRangeJoin(prev, op)
    case op: AnnOp if op.kind == "brute" => applyAnnBrute(prev, op)
    case op: AnnOp if op.kind == "lsh"   => applyAnnLsh(prev, op)
    case op: AnnOp if op.kind == "ivf"   => applyAnnIvf(prev, op)

    // `| sample 0.25 by id` (round 15): the deterministic Bernoulli
    // keep is ONE codegen filter (md5-derived [0,1) hash of the id),
    // so it IS a single SQL predicate — rendered from the library's
    // own Column (Sampling.keepPredicate), not a lookalike
    case SampleOp(rate, rateSpan, id, _) =>
      val r =
        try rate.toDouble
        catch { case _: NumberFormatException => fail(s"invalid sample rate $rate", rateSpan) }
      if (r < 0.0 || r > 1.0) fail(s"sample rate must be in [0, 1], got $rate", rateSpan)
      Stage(
        newStage(s"SELECT * FROM ${prev.cte} " +
          s"WHERE ${sqlOf(graft.ops.Sampling.keepPredicate(col(id.name), r))}"),
        graft.ops.Sampling.bernoulli(prev.df, id.name, r))

    // `| dedup kind=exact text by id` (round 15): corpus-wide
    // keep-first-id per normalized-text digest — one window, so it IS
    // a single SQL query (the digest expression is rendered from the
    // library's own Column). The other batch kinds stay rejected:
    // multi-stage banded plans / plan-time corpus counts.
    case DedupOp("exact", opts, text, id, span) =>
      new OpOptionsBase(opts, span, Set.empty, "dedup kind=exact", fail).finish()
      exactDedupStage(prev, text.name, id.name, span)

    // `| dedup kind=minhash text by id` (round 16): the production
    // pipeline (exact dedup → MinHash-LSH near-dup drop,
    // NearDup.deduplicateCorpus) as CTE text — see [[applyDedupMinhash]]
    case DedupOp("minhash", opts, text, id, span) =>
      new OpOptionsBase(opts, span, Set.empty, "dedup kind=minhash", fail).finish()
      applyDedupMinhash(prev, text.name, id.name, span)

    case DedupOp("lines", opts, text, id, span) =>
      new OpOptionsBase(opts, span, Set.empty, "dedup kind=lines", fail).finish()
      applyDedupLines(prev, text.name, id.name, span)

    case DedupOp("simhash", opts, text, id, span) =>
      new OpOptionsBase(opts, span, Set.empty, "dedup kind=simhash", fail).finish()
      applyDedupSimhash(prev, text.name, id.name, span)

    case DedupOp("substrings", opts, text, id, span) =>
      new OpOptionsBase(opts, span, Set.empty, "dedup kind=substrings", fail).finish()
      applyDedupSubstrings(prev, text.name, id.name, span)

    case op @ DedupOp("embed", _, _, _, _)    => applyDedupEmbed(prev, op)
    case op @ DedupOp("semantic", _, _, _, _) => applyDedupSemantic(prev, op)
    case op: PackOp                           => applyPack(prev, op)
    case op: DecontamOp                       => applyDecontam(prev, op)

    // `| chunk 64 text by id` (round 15): one projection + posexplode
    // — a single LATERAL VIEW query (the split expression is rendered
    // from the library's own Column)
    case ChunkOp(n, text, id, span) =>
      val missing = Seq(text.name, id.name).filterNot(hasColumn(prev.df, _))
      if (missing.nonEmpty)
        fail(s"chunk column ${missing.head} not found", span)
      val chunkTokens = rowCount(n)
      val arr = sqlOf(graft.ops.TextOps.chunkArray(col(text.name), chunkTokens))
      val nTok = sqlOf(graft.ops.TextOps.chunkTokenCount(col("chunk_text")))
      val out = newStage(
        s"SELECT ${q(id.name)}, chunk_idx, chunk_text, $nTok AS n_tokens FROM ${prev.cte} " +
          s"LATERAL VIEW posexplode($arr) __c AS chunk_idx, chunk_text")
      Stage(out, graft.ops.TextOps.chunk(prev.df, text.name, id.name, chunkTokens))

    case other =>
      val name = other match {
        case d: DedupOp     => s"dedup kind=${d.kind}" // simhash / substrings
        case _: SampleBudgetOp => "sample budget="
        case a: AnnOp       => s"ann kind=${a.kind}" // unreachable: all kinds emit
        case _              => "this"
      }
      fail(
        s"operator '$name' compiles to a multi-stage library plan, not a single SQL query; " +
          "use Pql.query for pipelines with graft extension operators",
        other.span)
  }

  /** The `dedup kind=exact` emission (round 15): corpus-wide
    * keep-first-id per normalized-text digest — one window, the digest
    * expression rendered from the library's own Column. Shared by the
    * `exact` case and [[applyDedupMinhash]]'s first stage (the library
    * pipeline composes the same way: `NearDup.deduplicateCorpus` =
    * `Dedup.exact` → near-dup drop).
    */
  private def exactDedupStage(prev: Stage, text: String, id: String, span: Span): Stage = {
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", span)
    val digest = sqlOf(md5(graft.ops.TextOps.normalize(col(text)).cast("binary")))
    val cols = prev.df.columns.toSeq.map(q).mkString(", ")
    val out = newStage(
      s"SELECT $cols FROM (SELECT *, row_number() OVER (" +
        s"PARTITION BY $digest ORDER BY ${q(id)}) AS __graft_rn FROM ${prev.cte}" +
        s") WHERE __graft_rn = 1")
    Stage(out, graft.ops.Dedup.exact(prev.df, text, id))
  }

  /** `| dedup kind=minhash` as SQL text (round 16): the production
    * corpus pipeline — exact dedup first, then MinHash-LSH near-dup
    * removal over the survivors ([[graft.ops.NearDup.deduplicateCorpus]]
    * at its k=32 / bandRows=2 / est≥0.25 defaults) — as one CTE chain:
    * hashed 3-gram shingles (`graft_shingle_hashes`, the SAME native
    * [[graft.functions.ShingleHashes]] expression the plan path
    * explodes, so the host session must carry graft's function
    * registry like the ann emissions), 32 permutation-min aggregates
    * and the match-fraction estimator rendered from the library's own
    * Columns ([[graft.ops.NearDup.minhashAggColumns]] /
    * `minhashEstSim` — one definition, two spellings), the banded
    * self-join in `bandKeysOfSig`'s exact string-key form, and the
    * drop as a LEFT ANTI JOIN on the greater pair member. Internals
    * are `__graft_mh_*`-namespaced so user schemas with single-letter
    * or colliding names compile (the ann rule).
    */
  private def applyDedupMinhash(prev: Stage, text: String, id: String, span: Span): Stage = {
    val e = exactDedupStage(prev, text, id, span)
    val (k, bandRows, minEstSim) = (32, 2, 0.25) // deduplicateCorpus → minhashPairs defaults
    val shingleArr = s"graft_shingle_hashes(${sqlOf(graft.ops.NearDup.tokens(col(text)))}, 3)"
    val hs = newStage(
      s"SELECT ${q(id)} AS __graft_mh_id, __graft_mh_h FROM ${e.cte} " +
        s"LATERAL VIEW explode($shingleArr) __g AS __graft_mh_h")
    // the aggregates run over a column literally named `h` in the
    // library ([[NearDup.minhashAggColumns]]); alias it back for the
    // rendered text so the expressions match verbatim
    val aggs = graft.ops.NearDup.minhashAggColumns(k).zipWithIndex
      .map { case (c, j) => s"${sqlOf(c)} AS __g$j" }
    val sig = (0 until k).map(j => s"__g$j").mkString("array(", ", ", ")")
    val sg = newStage(
      s"SELECT __graft_mh_id, $sig AS __graft_mh_sig FROM (" +
        s"SELECT __graft_mh_id, ${aggs.mkString(", ")} " +
        s"FROM (SELECT __graft_mh_id, __graft_mh_h AS h FROM $hs) GROUP BY __graft_mh_id)")
    // hand-authored band keys (a rendered Column lambda prints a
    // non-parseable `lambdafunction(...)` — same constraint as the
    // brute/lsh emissions' transform calls): element j = components
    // [j·bandRows, (j+1)·bandRows) cast to string, pipe-joined —
    // exactly NearDup.bandKeysOfSig's construction
    val bandArr = (0 until k / bandRows)
      .map(j => s"array_join(transform(slice(__graft_mh_sig, ${j * bandRows + 1}, $bandRows), " +
        s"x -> CAST(x AS STRING)), '|')")
      .mkString("array(", ", ", ")")
    val bd = newStage(
      s"SELECT __graft_mh_id, __graft_mh_bi, __graft_mh_bk FROM $sg " +
        s"LATERAL VIEW posexplode($bandArr) __b AS __graft_mh_bi, __graft_mh_bk")
    // join-back candidate form (minhashPairs' k=32 stance: narrow band
    // rows + DISTINCT, signatures joined back only for the estimator)
    val cand = newStage(
      s"SELECT DISTINCT a.__graft_mh_id AS __graft_mh_ida, b.__graft_mh_id AS __graft_mh_idb " +
        s"FROM $bd a JOIN $bd b ON a.__graft_mh_bi = b.__graft_mh_bi " +
        s"AND a.__graft_mh_bk = b.__graft_mh_bk AND a.__graft_mh_id < b.__graft_mh_id")
    val est = sqlOf(graft.ops.NearDup.minhashEstSim(col("__graft_mh_siga"), col("__graft_mh_sigb"), k))
    val drops = newStage(
      s"SELECT DISTINCT __graft_mh_idb FROM (" +
        s"SELECT c.__graft_mh_idb, $est AS __graft_mh_est FROM $cand c " +
        s"JOIN (SELECT __graft_mh_id, __graft_mh_sig AS __graft_mh_siga FROM $sg) sa " +
        s"ON c.__graft_mh_ida = sa.__graft_mh_id " +
        s"JOIN (SELECT __graft_mh_id, __graft_mh_sig AS __graft_mh_sigb FROM $sg) sb " +
        s"ON c.__graft_mh_idb = sb.__graft_mh_id" +
        s") WHERE __graft_mh_est >= $minEstSim")
    val out = newStage(
      s"SELECT e.* FROM ${e.cte} e LEFT ANTI JOIN $drops d ON e.${q(id)} = d.__graft_mh_idb")
    Stage(out, graft.ops.NearDup.deduplicateCorpus(prev.df, text, id))
  }

  /** `| dedup kind=simhash` as SQL text (round 16):
    * [[graft.ops.NearDup.simhashPairs]] (60-bit TF-weighted SimHash,
    * four 15-bit bands, hamming ≤ 3) → drop the greater pair member.
    * The 60 per-bit ±1 sums and the sign-bit packing render from the
    * library's own Columns ([[graft.ops.NearDup.simhashBitSums]] /
    * `simhashPacked`), bands are the exact `shiftrightunsigned`
    * integer form, and the hamming test is `bit_count(a ^ b)` — all
    * builtin SQL, so unlike the other near-dup emissions this one
    * needs no registered graft functions.
    */
  private def applyDedupSimhash(prev: Stage, text: String, id: String, span: Span): Stage = {
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", span)
    val simBits = graft.ops.NearDup.SimBits
    val bandBits = graft.ops.NearDup.SimBandBits
    val tokensSql = sqlOf(graft.ops.NearDup.tokens(col(text)))
    val h60 = sqlOf(graft.ops.NearDup.hash60(col("__graft_sh_t")))
    val h0 = newStage(
      s"SELECT ${q(id)} AS __graft_sh_id, $h60 AS __graft_sh_h FROM ${prev.cte} " +
        s"LATERAL VIEW explode($tokensSql) __t AS __graft_sh_t")
    val aggs = graft.ops.NearDup.simhashBitSums.zipWithIndex
      .map { case (c, i) => s"${sqlOf(c)} AS __g$i" }
    val packed = sqlOf(graft.ops.NearDup.simhashPacked(i => col(s"__g$i")))
    val sim = newStage(
      s"SELECT __graft_sh_id, $packed AS __graft_sh_sim FROM (" +
        s"SELECT __graft_sh_id, ${aggs.mkString(", ")} " +
        s"FROM (SELECT __graft_sh_id, __graft_sh_h AS h FROM $h0) GROUP BY __graft_sh_id)")
    val bandArr = (0 until simBits / bandBits)
      .map(j => s"shiftrightunsigned(__graft_sh_sim, ${j * bandBits}) % ${1 << bandBits}")
      .mkString("array(", ", ", ")")
    val bd = newStage(
      s"SELECT __graft_sh_id, __graft_sh_sim, __graft_sh_bi, __graft_sh_bk FROM $sim " +
        s"LATERAL VIEW posexplode($bandArr) __b AS __graft_sh_bi, __graft_sh_bk")
    val drops = newStage(
      s"SELECT DISTINCT b.__graft_sh_id AS __graft_sh_drop FROM $bd a JOIN $bd b " +
        s"ON a.__graft_sh_bi = b.__graft_sh_bi AND a.__graft_sh_bk = b.__graft_sh_bk " +
        s"AND a.__graft_sh_id < b.__graft_sh_id " +
        s"AND bit_count(a.__graft_sh_sim ^ b.__graft_sh_sim) <= 3")
    val out = newStage(
      s"SELECT e.* FROM ${prev.cte} e LEFT ANTI JOIN $drops d ON e.${q(id)} = d.__graft_sh_drop")
    val mirror = graft.ops.NearDup.dropNearDuplicates(
      prev.df, graft.ops.NearDup.simhashPairs(prev.df, text, id), id)
    Stage(out, mirror)
  }

  /** `| dedup kind=substrings` as SQL text (round 16): ExactSubstr
    * span removal ([[graft.ops.Dedup.dedupSubstrings]] at its k=8
    * default) — k-token rolling shingle hashes
    * (`graft_shingle_hashes(w, 8)`, the identical native expression),
    * keep-first window over the corpus-wide hash space, covered
    * positions exploded from repeat spans, token-level anti-join, and
    * position-ordered reassembly (the lines emission's struct-sort).
    * Output: `(id, text_clean, n_removed)`, row-preserving.
    */
  private def applyDedupSubstrings(prev: Stage, text: String, id: String, span: Span): Stage = {
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", span)
    val k = 8 // the grammar route's width (Dedup.dedupSubstrings default)
    val tokensSql = sqlOf(graft.ops.NearDup.tokens(col(text)))
    val b0 = newStage(
      s"SELECT ${q(id)} AS __graft_ss_id, $tokensSql AS __graft_ss_w FROM ${prev.cte}")
    val ne = newStage(
      s"SELECT * FROM $b0 WHERE NOT (size(__graft_ss_w) = 1 AND element_at(__graft_ss_w, 1) = '')")
    val kg = newStage(
      s"SELECT __graft_ss_id, __graft_ss_pos, __graft_ss_h FROM $ne " +
        s"LATERAL VIEW posexplode(graft_shingle_hashes(__graft_ss_w, $k)) __g " +
        s"AS __graft_ss_pos, __graft_ss_h")
    val rs = newStage(
      s"SELECT __graft_ss_id, __graft_ss_pos FROM (" +
        s"SELECT *, row_number() OVER (PARTITION BY __graft_ss_h " +
        s"ORDER BY __graft_ss_id, __graft_ss_pos) AS __graft_ss_rn FROM $kg" +
        s") WHERE __graft_ss_rn >= 2")
    val cv = newStage(
      s"SELECT DISTINCT __graft_ss_id AS __graft_ss_cid, __graft_ss_tp FROM $rs " +
        s"LATERAL VIEW explode(sequence(__graft_ss_pos, __graft_ss_pos + ${k - 1})) __e " +
        s"AS __graft_ss_tp")
    val tok = newStage(
      s"SELECT __graft_ss_id, __graft_ss_pos, __graft_ss_tk FROM $ne " +
        s"LATERAL VIEW posexplode(__graft_ss_w) __t AS __graft_ss_pos, __graft_ss_tk")
    val kept = newStage(
      s"SELECT t.* FROM $tok t LEFT ANTI JOIN $cv c " +
        s"ON t.__graft_ss_id = c.__graft_ss_cid AND t.__graft_ss_pos = c.__graft_ss_tp")
    val re = newStage(
      s"SELECT __graft_ss_id, array_join(transform(array_sort(" +
        s"collect_list(struct(__graft_ss_pos, __graft_ss_tk))), s -> s.__graft_ss_tk), ' ') " +
        s"AS __graft_ss_tc, count(1) AS __graft_ss_nk FROM $kept GROUP BY __graft_ss_id")
    val tl = newStage(
      s"SELECT __graft_ss_id, CAST(size(__graft_ss_w) AS BIGINT) AS __graft_ss_nt FROM $ne")
    val out = newStage(
      s"SELECT d.${q(id)}, coalesce(r.__graft_ss_tc, '') AS text_clean, " +
        s"(coalesce(t.__graft_ss_nt, 0) - coalesce(r.__graft_ss_nk, 0)) AS n_removed " +
        s"FROM (SELECT ${q(id)} FROM ${prev.cte}) d " +
        s"LEFT JOIN $re r ON d.${q(id)} = r.__graft_ss_id " +
        s"LEFT JOIN $tl t ON d.${q(id)} = t.__graft_ss_id")
    Stage(out, graft.ops.Dedup.dedupSubstrings(prev.df, text, id))
  }

  /** `| dedup kind=lines` as SQL text (round 16): RefinedWeb-style
    * fragment dedup ([[graft.ops.Dedup.dedupLines]]) — split on
    * `". "`, keep each fragment's first corpus-wide occurrence
    * (smallest (id, pos) via one digest-keyed window), reassemble in
    * document order. The split/normalize expressions render from the
    * library's own Columns; the reassembly lambda is hand-authored
    * (`array_sort(collect_list(struct(pos, frag)))` — pos is unique
    * per document, so the struct sort IS position order).
    * Output: `(id, text)`, row-preserving (empty string for a fully
    * deduplicated document), exactly the plan path's.
    */
  private def applyDedupLines(prev: Stage, text: String, id: String, span: Span): Stage = {
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", span)
    val fragArr = sqlOf(split(graft.ops.TextOps.normalize(col(text)), "\\. "))
    val frags = newStage(
      s"SELECT __graft_ln_id, __graft_ln_pos, __graft_ln_frag FROM (" +
        s"SELECT ${q(id)} AS __graft_ln_id, __graft_ln_pos, __graft_ln_frag FROM ${prev.cte} " +
        s"LATERAL VIEW posexplode($fragArr) __f AS __graft_ln_pos, __graft_ln_frag" +
        s") WHERE length(__graft_ln_frag) > 0")
    val kept = newStage(
      s"SELECT __graft_ln_id, __graft_ln_pos, __graft_ln_frag FROM (" +
        s"SELECT *, row_number() OVER (PARTITION BY md5(CAST(__graft_ln_frag AS BINARY)) " +
        s"ORDER BY __graft_ln_id, __graft_ln_pos) AS __graft_ln_rn FROM $frags" +
        s") WHERE __graft_ln_rn = 1")
    val re = newStage(
      s"SELECT __graft_ln_id, array_join(transform(array_sort(" +
        s"collect_list(struct(__graft_ln_pos, __graft_ln_frag))), s -> s.__graft_ln_frag), '. ') " +
        s"AS __graft_ln_text FROM $kept GROUP BY __graft_ln_id")
    val out = newStage(
      s"SELECT p.${q(id)}, coalesce(r.__graft_ln_text, '') AS text " +
        s"FROM (SELECT ${q(id)} FROM ${prev.cte}) p " +
        s"LEFT JOIN $re r ON p.${q(id)} = r.__graft_ln_id")
    Stage(out, graft.ops.Dedup.dedupLines(prev.df, text, id))
  }

  /** `| dedup kind=embed` as SQL text (round 16): sign-LSH
    * near-duplicate removal over embeddings
    * ([[graft.ops.NearDup.embedCosinePairs]] → drop the greater pair
    * member), FIXED geometry only (`planes=`/`bits=` together — the
    * adaptive default sizes bands from a plan-time corpus count, same
    * stance as ann kind=lsh). The signature is `graft_sign_sig` (the
    * identical native expression), band keys and the first-collision
    * XOR predicate are the exact integer forms of `signBandKeys` /
    * `embedCosinePairs`, the rescore is `graft_dot`, and the cosine
    * threshold sits in the join condition exactly where the plan path
    * puts it — so the emitted text is bit-identical on every input,
    * degenerate vectors included (signature 0, NULL norm → no pairs).
    */
  private def applyDedupEmbed(prev: Stage, op: DedupOp): Stage = {
    val (text, id) = (op.textCol.name, op.idCol.name)
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", op.span)
    val o = new OpOptionsBase(op.opts, op.span,
      Set("dim", "cos", "occupancy", "planes", "bits"), "dedup kind=embed", fail)
    val dim = o.requiredInt("dim", min = 1)
    val minCos = o.double("cos", 0.4, min = -1.0, max = 1.0)
    val (planes, bits) =
      (o.intOpt("planes", min = 1), o.intOpt("bits", min = 1),
        o.intOpt("occupancy", min = 1)) match {
        case (Some(_), Some(_), Some(_)) | (Some(_), None, Some(_)) |
            (None, Some(_), Some(_)) =>
          fail("dedup kind=embed takes planes=/bits= or occupancy=, not both", op.span)
        case (Some(p), Some(b), None) =>
          if (b > 62) fail(s"option bits must be in [1, 62], got $b", op.span)
          if (p > 62) fail(s"option planes must be in [1, 62], got $p", op.span)
          if (p < b) fail(s"planes ($p) must be at least bits ($b) — one band minimum", op.span)
          (p, b)
        case (None, None, _) =>
          fail("dedup kind=embed compiles to SQL text only with a fixed geometry — " +
            "pass planes= and bits= together; the adaptive default sizes its bands " +
            "from a plan-time corpus count a single SQL query cannot carry " +
            "(use Pql.query for the adaptive form)", op.span)
        case _ =>
          fail("dedup kind=embed needs planes= and bits= together", op.span)
      }
    o.finish()
    val nBands = planes / bits
    val sg = newStage(
      s"SELECT ${q(id)} AS __graft_eb_id, CAST(${q(text)} AS ARRAY<DOUBLE>) AS __v FROM ${prev.cte}")
    val sn = newStage(
      s"SELECT __graft_eb_id, __v, sqrt(graft_dot(__v, __v)) AS __nrm, " +
        s"graft_sign_sig(__v, $dim, $planes) AS __sig FROM $sg")
    val bandArr = (0 until nBands)
      .map(j => s"shiftrightunsigned(__sig, ${j * bits}) % ${1L << bits}L")
      .mkString("array(", ", ", ")")
    val br = newStage(
      s"SELECT __graft_eb_id, __v, __nrm, __sig, __bi, __bk FROM $sn " +
        s"LATERAL VIEW posexplode($bandArr) __b AS __bi, __bk")
    // first-collision index over sig_a XOR sig_b — the codegen'd
    // integer predicate that emits each pair once, in its first
    // colliding band (embedCosinePairs' exact form)
    val fc = (0 until nBands)
      .map(i => s"WHEN shiftrightunsigned(a.__sig ^ b.__sig, ${i * bits}) % ${1L << bits}L = 0 THEN $i")
      .mkString("CASE ", " ", s" ELSE $nBands END")
    val cos = "graft_dot(a.__v, b.__v) / (a.__nrm * b.__nrm)"
    val drops = newStage(
      s"SELECT DISTINCT b.__graft_eb_id AS __graft_eb_drop FROM $br a JOIN $br b " +
        s"ON a.__bi = b.__bi AND a.__bk = b.__bk AND a.__graft_eb_id < b.__graft_eb_id " +
        s"AND ($fc) = a.__bi AND $cos >= $minCos")
    val out = newStage(
      s"SELECT e.* FROM ${prev.cte} e LEFT ANTI JOIN $drops d ON e.${q(id)} = d.__graft_eb_drop")
    val mirror = graft.ops.NearDup.dropNearDuplicates(
      prev.df,
      graft.ops.NearDup.embedCosinePairs(prev.df, text, id, dim,
        planes = planes, bandBits = bits, minCos = minCos),
      id)
    Stage(out, mirror)
  }

  /** `| dedup kind=semantic` as SQL text (round 16): SemDeDup's
    * cluster-then-prune ([[graft.ops.SemDedup.deduplicate]]), FIXED
    * cell count only (`cells=` — the adaptive default and `occupancy=`
    * resolve the count from a plan-time corpus count, same stance as
    * ann kind=ivf). The hash-seeded Voronoi machinery is the ivf
    * emission's: seed set re-derived in the text (ORDER BY hash32
    * LIMIT), corpus assignment via `graft_argmax_cell`, then the
    * within-cell exact-cosine self-join with the threshold beside the
    * cell equality, and the greater pair member dropped.
    */
  private def applyDedupSemantic(prev: Stage, op: DedupOp): Stage = {
    val (text, id) = (op.textCol.name, op.idCol.name)
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"dedup column ${missing.head} not found", op.span)
    val o = new OpOptionsBase(op.opts, op.span,
      Set("cells", "cos", "occupancy"), "dedup kind=semantic", fail)
    val minCos = o.double("cos", 0.9, min = -1.0, max = 1.0)
    val nCells = (o.intOpt("occupancy", min = 1), o.intOpt("cells", min = 1)) match {
      case (Some(_), Some(_)) =>
        fail("dedup kind=semantic takes cells= or occupancy=, not both", op.span)
      case (None, Some(c)) => c
      case _ =>
        fail("dedup kind=semantic compiles to SQL text only with a fixed index — " +
          "pass cells=; the adaptive default (and occupancy=) sizes its cell count " +
          "from a plan-time corpus count a single SQL query cannot carry " +
          "(use Pql.query for the adaptive form)", op.span)
    }
    o.finish()
    val c0 = newStage(
      s"SELECT ${q(id)} AS __graft_sd_id, transform(${q(text)}, x -> CAST(x AS DOUBLE)) AS __v " +
        s"FROM ${prev.cte}")
    val h32 = sqlOf(graft.ops.NearDup.hash32(col("__graft_sd_id").cast("string")))
    val sd = newStage(
      s"SELECT __graft_sd_id, __v, $h32 AS __h FROM $c0 ORDER BY __h, __graft_sd_id LIMIT $nCells")
    val ct = newStage(
      s"SELECT CAST(row_number() OVER (ORDER BY __h, __graft_sd_id) - 1 AS INT) AS __c, __v AS __sv FROM $sd")
    val mat = s"(SELECT transform(array_sort(collect_list(struct(__c, __sv))), s -> s.__sv) FROM $ct)"
    val cells = newStage(
      s"SELECT __graft_sd_id, __cell FROM (SELECT ${q(id)} AS __graft_sd_id, " +
        s"graft_argmax_cell(CAST(${q(text)} AS ARRAY<DOUBLE>), $mat) AS __cell FROM ${prev.cte}" +
        s") WHERE __cell IS NOT NULL")
    val base = newStage(
      s"SELECT c.__graft_sd_id, c.__v, sqrt(graft_dot(c.__v, c.__v)) AS __nrm, k.__cell " +
        s"FROM $c0 c JOIN $cells k ON c.__graft_sd_id = k.__graft_sd_id")
    val drops = newStage(
      s"SELECT DISTINCT b.__graft_sd_id AS __graft_sd_drop FROM $base a JOIN $base b " +
        s"ON a.__cell = b.__cell AND a.__graft_sd_id < b.__graft_sd_id " +
        s"AND graft_dot(a.__v, b.__v) / (a.__nrm * b.__nrm) >= $minCos")
    val out = newStage(
      s"SELECT e.* FROM ${prev.cte} e LEFT ANTI JOIN $drops d ON e.${q(id)} = d.__graft_sd_drop")
    val mirror = graft.ops.SemDedup.deduplicate(prev.df, text, id, nCells = nCells, minCos = minCos)
    Stage(out, mirror)
  }

  /** `| pack <budget> tokens by id, idx` as SQL text (round 16):
    * shard-parallel next-fit packing ([[graft.ops.Packing.packSequences]])
    * — ONE windowed running sum per shard, every expression (shard
    * hash, running start, seq label) rendered from the library's own
    * Columns (`Packing.shardOf/packStart/seqIdOf` — one definition,
    * two spellings).
    */
  private def applyPack(prev: Stage, op: PackOp): Stage = {
    val o = new OpOptionsBase(op.opts, op.span, Set("shards"), "pack", fail)
    val nShards = o.int("shards", 64, min = 1)
    o.finish()
    val budget = rowCount(op.budget)
    if (budget <= 0) fail(s"pack budget must be positive, got $budget", op.budget.span)
    val (tk, id, idx) = (op.tokensCol.name, op.idCol.name, op.idxCol.name)
    val missing = Seq(tk, id, idx).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"pack column ${missing.head} not found", op.span)
    val shardSql = sqlOf(graft.ops.Packing.shardOf(col(id), nShards))
    val startSql = sqlOf(graft.ops.Packing.packStart(
      col(tk), col("__graft_pk_shard"), col(id), col(idx)))
    val seqSql = sqlOf(graft.ops.Packing.seqIdOf(
      col("__graft_pk_shard"), col("__graft_pk_start"), budget))
    val s1 = newStage(s"SELECT *, $shardSql AS __graft_pk_shard FROM ${prev.cte}")
    val s2 = newStage(s"SELECT *, $startSql AS __graft_pk_start FROM $s1")
    val cols = prev.df.columns.toSeq.map(q).mkString(", ")
    val out = newStage(s"SELECT $cols, $seqSql AS seq_id FROM $s2")
    Stage(out, graft.ops.Packing.packSequences(prev.df, id, idx, tk, budget, nShards))
  }

  /** `| decontam against (Evals) text by id` as SQL text (round 16):
    * the EXACT-join form of [[graft.ops.Decontam.decontaminate]] —
    * distinct eval shingles broadcast against the corpus shingle
    * stream, per-document distinct-hit count, drop at `hits=` — with
    * the eval sub-pipeline compiled into its own CTE chain like any
    * join right side. The adaptive Bloom pre-filter is a PHYSICAL
    * plan-time lever (two eager driver jobs + a byte-array literal no
    * SQL string can carry) whose output is IDENTICAL by construction
    * (false positives die in the exact join — OpsSpec asserts it), so
    * the emitted text is the exact form — the same stance as the asof
    * emission's skew-bucket split.
    */
  private def applyDecontam(prev: Stage, op: DecontamOp): Stage = {
    val o = new OpOptionsBase(op.opts, op.span, Set("hits", "ngram"), "decontam", fail)
    val minHits = o.int("hits", 2, min = 1)
    val n = o.int("ngram", 3, min = 1)
    o.finish()
    val (text, id) = (op.textCol.name, op.idCol.name)
    val evalStage = foldOps(sourceStage(op.eval.source), op.eval.operators)
    val missing = Seq(text, id).filterNot(hasColumn(prev.df, _))
    if (missing.nonEmpty)
      fail(s"decontam column ${missing.head} not found", op.span)
    val missingEval = Seq(text, id).filterNot(hasColumn(evalStage.df, _))
    if (missingEval.nonEmpty)
      fail(s"decontam column ${missingEval.head} not found on the eval side", op.span)
    val shingleArr = s"graft_shingle_hashes(${sqlOf(graft.ops.NearDup.tokens(col(text)))}, $n)"
    val ev = newStage(
      s"SELECT DISTINCT __graft_dc_h, __graft_dc_eid FROM (" +
        s"SELECT ${q(id)} AS __graft_dc_eid, __graft_dc_h FROM ${evalStage.cte} " +
        s"LATERAL VIEW explode($shingleArr) __g AS __graft_dc_h)")
    val cs = newStage(
      s"SELECT ${q(id)} AS __graft_dc_id, __graft_dc_h FROM ${prev.cte} " +
        s"LATERAL VIEW explode($shingleArr) __g AS __graft_dc_h")
    val bad = newStage(
      s"SELECT __graft_dc_id FROM (" +
        s"SELECT /*+ BROADCAST(e) */ c.__graft_dc_id, " +
        s"count(DISTINCT c.__graft_dc_h) AS __graft_dc_nh " +
        s"FROM $cs c JOIN $ev e ON c.__graft_dc_h = e.__graft_dc_h " +
        s"GROUP BY c.__graft_dc_id) WHERE __graft_dc_nh >= $minHits")
    val out = newStage(
      s"SELECT c.* FROM ${prev.cte} c LEFT ANTI JOIN $bad b ON c.${q(id)} = b.__graft_dc_id")
    val mirror = graft.ops.Decontam.decontaminate(
      prev.df, evalStage.df, text, id, minHits = minHits, shingleN = n)
    Stage(out, mirror)
  }

  /** `| join kind=asof` as SQL text (round 15): the UNION + KEYED
    * WINDOW form — the same lowering as [[graft.ops.AsOf.joinAsOf]]
    * minus the hot-key time-bucket split (a PHYSICAL skew lever the
    * SQL dialect cannot carry; results are bit-identical by
    * construction — AsOf.scala's bucket passes reproduce the exact
    * single-window order). Validation is shared with the DataFrame
    * path via [[ExtJoins]].
    */
  private def applyAsofJoin(prev: Stage, op: AsofJoinOp): Stage = {
    val right = foldOps(sourceStage(op.right.source), op.right.operators)
    val p = ExtJoins.asofParts(
      prev.df.columns.toSeq, right.df.columns.toSeq, op.onCols, op.span, fail)
    val tolMs = op.tolerance.map(o => exprs.parseDurationMillis(o.value, o.valueSpan))
    // tolerance rides the right timestamp inside the struct, exactly
    // like AsOf.joinAsOfTolerant's __right_ts
    val structCols = if (tolMs.isDefined) p.valueCols :+ "__right_ts" else p.valueCols
    val valsType = org.apache.spark.sql.types.StructType(structCols.map { c =>
      if (c == "__right_ts") right.df.schema(p.ts).copy(name = "__right_ts")
      else right.df.schema(c)
    })
    val leftCols = prev.df.columns.toSeq
    val namedStruct = structCols
      .map(c => s"'${c.replace("'", "''")}', ${q(if (c == "__right_ts") p.ts else c)}")
      .mkString("named_struct(", ", ", ")")
    val rightSelect = leftCols.map { c =>
      if (p.keys.contains(c) || c == p.ts) q(c)
      else s"CAST(NULL AS ${prev.df.schema(c).dataType.sql}) AS ${q(c)}"
    }
    val u = newStage(
      s"SELECT ${leftCols.map(q).mkString(", ")}, CAST(NULL AS ${valsType.sql}) AS __vals, 1 AS __side FROM ${prev.cte}" +
        s"\n  UNION ALL SELECT ${rightSelect.mkString(", ")}, $namedStruct AS __vals, 0 AS __side" +
        s" FROM ${right.cte} WHERE ${q(p.ts)} IS NOT NULL")
    val win = s"PARTITION BY ${p.keys.map(q).mkString(", ")} ORDER BY ${q(p.ts)} ASC, __side ASC" +
      " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val f = newStage(
      s"SELECT ${leftCols.map(q).mkString(", ")}, last(__vals, true) OVER ($win) AS __vals, __side FROM $u")
    // schema mirror: the library op on the (never-executed) schema
    // frames — its column ORDER is the plan path's output order (the
    // bucketed join puts keys first), and the final select follows it
    val mirror = tolMs match {
      case None     => graft.ops.AsOf.joinAsOf(prev.df, right.df, p.keys, p.ts, p.valueCols)
      case Some(ms) => graft.ops.AsOf.joinAsOfTolerant(prev.df, right.df, p.keys, p.ts, p.valueCols, s"$ms milliseconds")
    }
    val items = mirror.columns.toSeq.map { c =>
      if (!p.valueCols.contains(c)) q(c)
      else {
        val v = s"__vals.${q(c)}"
        tolMs match {
          case None => s"$v AS ${q(c)}"
          case Some(ms) =>
            // stale match (older than the tolerance) → NULL, fresh → value
            s"CASE WHEN __vals.${q("__right_ts")} >= ${q(p.ts)} - INTERVAL $ms milliseconds THEN $v END AS ${q(c)}"
        }
      }
    }
    val out = newStage(s"SELECT ${items.mkString(", ")} FROM $f WHERE __side = 1")
    Stage(out, mirror)
  }

  /** `| ann kind=brute` as SQL text (round 15): exact cosine top-k —
    * normalize both sides, broadcast-join the (small by construction)
    * query set against the corpus, `row_number() <= k`. The dot
    * product is `graft_dot`, graft's native left-fold expression, so
    * the emitted text is bit-identical to the plan path — the HOST
    * SESSION must therefore carry graft's functions
    * (`spark.sql.extensions=graft.functions.GraftExtensions`, or
    * `GraftExtensions.register(spark)`), the same way the reference's
    * emitted SQL assumes its engine's function library. The indexed
    * kinds (lsh/ivf) stay plan-path-only: their adaptive geometry is
    * resolved from a plan-time corpus count that a SQL string cannot
    * carry.
    */
  private def applyAnnBrute(prev: Stage, op: AnnOp): Stage = {
    val right = foldOps(sourceStage(op.queries.source), op.queries.operators)
    ExtJoins.annCheck(prev.df.columns.toSeq, right.df.columns.toSeq, op.vecCol, op.idCol, fail)
    val o = new OpOptionsBase(op.opts, op.span, Set("k"), "ann kind=brute", fail)
    val k = o.int("k", 5, min = 1)
    o.finish()
    val (vecQ, idQ) = (q(op.vecCol.name), q(op.idCol.name))
    val c = newStage(
      s"SELECT $idQ AS __graft_ann_id, transform($vecQ, x -> CAST(x AS DOUBLE)) AS __v FROM ${prev.cte}")
    val cn = newStage(
      s"SELECT __graft_ann_id, __v, sqrt(graft_dot(__v, __v)) AS __nrm FROM $c")
    val qv = newStage(
      s"SELECT $idQ AS query_id, transform($vecQ, x -> CAST(x AS DOUBLE)) AS __qv FROM ${right.cte}")
    val qn = newStage(
      s"SELECT query_id, __qv, sqrt(graft_dot(__qv, __qv)) AS __qn FROM $qv")
    val scored = newStage(
      s"SELECT /*+ BROADCAST(q) */ q.query_id, c.__graft_ann_id, " +
        s"graft_dot(c.__v, q.__qv) / (c.__nrm * q.__qn) AS cos_sim " +
        s"FROM $cn c JOIN $qn q ON c.__graft_ann_id != q.query_id")
    val ranked = newStage(
      s"SELECT query_id, __graft_ann_id AS $idQ, cos_sim, rank FROM (" +
        s"SELECT query_id, __graft_ann_id, cos_sim, row_number() OVER (" +
        s"PARTITION BY query_id ORDER BY cos_sim DESC, __graft_ann_id ASC) AS rank FROM $scored" +
        s") WHERE rank <= $k")
    // schema mirror: exactly the DataFrame compiler's construction
    val safeVec = "__graft_ann_vec"
    val safeId = "__graft_ann_id"
    val mirror = graft.ops.Ann.bruteTopK(
      prev.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      right.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      safeVec, safeId, k = k
    ).withColumnRenamed(safeId, op.idCol.name)
    Stage(ranked, mirror)
  }

  /** `| ann kind=lsh` as SQL text (round 15): the banded sign-LSH
    * top-k, FIXED geometry only (`planes=`/`bits=` both given). The
    * signature is `graft_sign_sig(vec, dim, planes)` — the SAME
    * native [[graft.functions.PackedSignSig]] expression the plan
    * path evaluates (the registered builder derives the identical
    * plane matrix from the two literals), band keys are the same
    * integer `shiftrightunsigned % 2^bits` arithmetic, and the
    * rescore is `graft_dot` — so the emitted text is bit-identical to
    * [[graft.ops.Ann.lshTopK]] on EVERY input, ragged vectors
    * included. The adaptive default (no geometry, or `occupancy=`)
    * sizes its bands from a plan-time corpus count that a single SQL
    * string cannot carry, and is rejected with a pointer to the fixed
    * spelling. Like the brute emission, the host session must carry
    * graft's function registry (GraftExtensions).
    */
  private def applyAnnLsh(prev: Stage, op: AnnOp): Stage = {
    val right = foldOps(sourceStage(op.queries.source), op.queries.operators)
    ExtJoins.annCheck(prev.df.columns.toSeq, right.df.columns.toSeq, op.vecCol, op.idCol, fail)
    val o = new OpOptionsBase(op.opts, op.span,
      Set("k", "dim", "planes", "bits", "occupancy"), "ann kind=lsh", fail)
    val k = o.int("k", 5, min = 1)
    val dim = o.requiredInt("dim", min = 1)
    val (planes, bits) =
      (o.intOpt("planes", min = 1), o.intOpt("bits", min = 1),
        o.intOpt("occupancy", min = 1)) match {
        case (Some(_), Some(_), Some(_)) | (Some(_), None, Some(_)) |
            (None, Some(_), Some(_)) =>
          fail("ann kind=lsh takes planes=/bits= or occupancy=, not both", op.span)
        case (Some(p), Some(b), None) =>
          if (b > 62) fail(s"option bits must be in [1, 62], got $b", op.span)
          // 62-bit signature cap as a spanned error (advice, round 15:
          // planes=63 escaped to a raw require in NearDup.signSigs) —
          // same check as the plan path's ann kind=lsh case
          if (p > 62) fail(s"option planes must be in [1, 62], got $p", op.span)
          if (p < b) fail(s"planes ($p) must be at least bits ($b) — one band minimum", op.span)
          (p, b)
        case (None, None, _) =>
          fail("ann kind=lsh compiles to SQL text only with a fixed geometry — " +
            "pass planes= and bits= together; the adaptive default sizes its bands " +
            "from a plan-time corpus count a single SQL query cannot carry " +
            "(use Pql.query for the adaptive form)", op.span)
        case _ =>
          fail("ann kind=lsh needs planes= and bits= together", op.span)
      }
    o.finish()
    val (vecQ, idQ) = (q(op.vecCol.name), q(op.idCol.name))
    val nBands = planes / bits
    // same cast as NearDup.signSigs (array-level cast, not transform)
    val c = newStage(
      s"SELECT $idQ AS __graft_ann_id, CAST($vecQ AS ARRAY<DOUBLE>) AS __v FROM ${prev.cte}")
    val cn = newStage(
      s"SELECT __graft_ann_id, __v, sqrt(graft_dot(__v, __v)) AS __nrm, " +
        s"graft_sign_sig(__v, $dim, $planes) AS __sig FROM $c")
    val qv = newStage(
      s"SELECT $idQ AS query_id, CAST($vecQ AS ARRAY<DOUBLE>) AS __qv FROM ${right.cte}")
    val qn = newStage(
      s"SELECT query_id, __qv, sqrt(graft_dot(__qv, __qv)) AS __qn, " +
        s"graft_sign_sig(__qv, $dim, $planes) AS __sig FROM $qv")
    // element j = bits [j·bits, (j+1)·bits) of the signature — the
    // exact integer form of NearDup.signBandKeys (leftover bits that
    // don't fill a band are dropped, same as the library)
    def bandArr(sig: String) = (0 until nBands)
      .map(j => s"shiftrightunsigned($sig, ${j * bits}) % ${1L << bits}L")
      .mkString("array(", ", ", ")")
    val cb = newStage(
      s"SELECT __graft_ann_id, band_idx, band_key FROM $cn " +
        s"LATERAL VIEW posexplode(${bandArr("__sig")}) __b AS band_idx, band_key")
    val qb = newStage(
      s"SELECT query_id, band_idx, band_key FROM $qn " +
        s"LATERAL VIEW posexplode(${bandArr("__sig")}) __b AS band_idx, band_key")
    // band rows carry only (id, band): the candidate shuffle moves two
    // longs per row (lshTopK's shape); DISTINCT = its dropDuplicates
    val cand = newStage(
      s"SELECT /*+ BROADCAST(q) */ DISTINCT q.query_id, c.__graft_ann_id " +
        s"FROM $cb c JOIN $qb q ON c.band_idx = q.band_idx AND c.band_key = q.band_key " +
        s"AND c.__graft_ann_id != q.query_id")
    val scored = newStage(
      s"SELECT /*+ BROADCAST(q) */ cand.query_id, cand.__graft_ann_id, " +
        s"graft_dot(c.__v, q.__qv) / (c.__nrm * q.__qn) AS cos_sim " +
        s"FROM $cand cand JOIN $cn c ON cand.__graft_ann_id = c.__graft_ann_id " +
        s"JOIN $qn q ON cand.query_id = q.query_id")
    val ranked = newStage(
      s"SELECT query_id, __graft_ann_id AS $idQ, cos_sim, rank FROM (" +
        s"SELECT query_id, __graft_ann_id, cos_sim, row_number() OVER (" +
        s"PARTITION BY query_id ORDER BY cos_sim DESC, __graft_ann_id ASC) AS rank FROM $scored" +
        s") WHERE rank <= $k")
    // schema mirror: exactly the DataFrame compiler's construction
    val safeVec = "__graft_ann_vec"
    val safeId = "__graft_ann_id"
    val mirror = graft.ops.Ann.lshTopK(
      prev.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      right.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      safeVec, safeId, dim, k, planes = planes, bandBits = bits
    ).withColumnRenamed(safeId, op.idCol.name)
    Stage(ranked, mirror)
  }

  /** `| ann kind=ivf` as SQL text (round 16): the hash-seeded IVF
    * ([[graft.ops.Ann.ivfTopKSeeded]]), FIXED cell count only
    * (`cells=` required — the adaptive default resolves √n cells from
    * a plan-time corpus count a SQL string cannot carry, same stance
    * as lsh's adaptive geometry).
    *
    * What the plan path bakes, the text re-derives in place:
    *   - the seed set is `ORDER BY hash32(id), id LIMIT cells` (the
    *     hash rendered from [[graft.ops.NearDup.hash32]]'s own Column);
    *   - the corpus assignment is `graft_argmax_cell(vec, seeds)` —
    *     [[graft.functions.ArgmaxDotDyn]], the SAME Double.compare
    *     argmax loop as the plan path's baked
    *     [[graft.functions.ArgmaxDot]], with the cell-ordered seed set
    *     arriving as a scalar subquery instead of a plan-time constant
    *     (stride derived from the seed vectors, like the plan path);
    *   - query probes mirror `Ann.cellRanks` stage for stage (explode
    *     ⋈ seed components → per-(query, cell) sum → rank ≤ probes);
    *     the grouped double sum is left-fold exact here for the same
    *     reason it is in the plan path — each query row's exploded
    *     components live in one partition, and query ids are unique;
    *   - rescore + top-k are the brute emission's tail (`graft_dot`).
    * Like the other ann emissions the host session must carry graft's
    * function registry. NOTE: building the schema mirror calls the
    * library op, which collects the (bounded, ≤cells·dim) seed matrix —
    * compileToSql on an ivf pipeline therefore runs one small Spark
    * job, exactly as Pql.query on the same text does.
    */
  private def applyAnnIvf(prev: Stage, op: AnnOp): Stage = {
    val right = foldOps(sourceStage(op.queries.source), op.queries.operators)
    ExtJoins.annCheck(prev.df.columns.toSeq, right.df.columns.toSeq, op.vecCol, op.idCol, fail)
    val o = new OpOptionsBase(op.opts, op.span,
      Set("k", "dim", "cells", "probes"), "ann kind=ivf", fail)
    val k = o.int("k", 5, min = 1)
    val dim = o.requiredInt("dim", min = 1)
    val nProbe = o.int("probes", 2, min = 1)
    val nCells = o.intOpt("cells", min = 1).getOrElse(
      fail("ann kind=ivf compiles to SQL text only with a fixed index — pass cells=; " +
        "the adaptive default sizes its cell count from a plan-time corpus count " +
        "a single SQL query cannot carry (use Pql.query for the adaptive form)", op.span))
    o.finish()
    val (vecQ, idQ) = (q(op.vecCol.name), q(op.idCol.name))
    // prep mirror: transform-cast vectors + fold norms (Ann.prep)
    val c = newStage(
      s"SELECT $idQ AS __graft_ann_id, transform($vecQ, x -> CAST(x AS DOUBLE)) AS __v FROM ${prev.cte}")
    val cn = newStage(
      s"SELECT __graft_ann_id, __v, sqrt(graft_dot(__v, __v)) AS __nrm FROM $c")
    val h32 = sqlOf(graft.ops.NearDup.hash32(col("__graft_ann_id").cast("string")))
    val sd = newStage(
      s"SELECT __graft_ann_id, __v, $h32 AS __h FROM $c ORDER BY __h, __graft_ann_id LIMIT $nCells")
    val ct = newStage(
      s"SELECT CAST(row_number() OVER (ORDER BY __h, __graft_ann_id) - 1 AS INT) AS __c, __v AS __sv FROM $sd")
    // seed set in cell order as ONE array value: array_sort on (c, v)
    // structs orders by the unique int c; the argmax stride comes from
    // the seed vectors themselves, exactly like the plan path's
    // seededCentroidMatrix (a dim= that disagrees with the actual
    // vector width cannot skew the assignment)
    val mat = s"(SELECT transform(array_sort(collect_list(struct(__c, __sv))), s -> s.__sv) FROM $ct)"
    val cc = newStage(
      s"SELECT __graft_ann_id, __cell FROM (SELECT $idQ AS __graft_ann_id, " +
        s"graft_argmax_cell(CAST($vecQ AS ARRAY<DOUBLE>), $mat) AS __cell FROM ${prev.cte}" +
        s") WHERE __cell IS NOT NULL")
    val qv = newStage(
      s"SELECT $idQ AS query_id, transform($vecQ, x -> CAST(x AS DOUBLE)) AS __qv FROM ${right.cte}")
    val qn = newStage(
      s"SELECT query_id, __qv, sqrt(graft_dot(__qv, __qv)) AS __qn FROM $qv")
    // cellRanks mirror: component explode ⋈ seed components → sum → rank
    val qx = newStage(
      s"SELECT query_id, __j, __x FROM $qv LATERAL VIEW posexplode(__qv) __p AS __j, __x")
    val ctc = newStage(
      s"SELECT __c, __j, __w FROM $ct LATERAL VIEW posexplode(__sv) __p AS __j, __w")
    val qd = newStage(
      s"SELECT query_id, __c, sum(__x * __w) AS __d FROM $qx JOIN $ctc ON $qx.__j = $ctc.__j " +
        s"GROUP BY query_id, __c")
    val qc = newStage(
      s"SELECT query_id, __c FROM (SELECT query_id, __c, row_number() OVER (" +
        s"PARTITION BY query_id ORDER BY __d DESC, __c) AS __r FROM $qd) WHERE __r <= $nProbe")
    val cand = newStage(
      s"SELECT /*+ BROADCAST(q) */ q.query_id, c.__graft_ann_id " +
        s"FROM $cc c JOIN $qc q ON c.__cell = q.__c AND c.__graft_ann_id != q.query_id")
    val scored = newStage(
      s"SELECT /*+ BROADCAST(q) */ cand.query_id, cand.__graft_ann_id, " +
        s"graft_dot(c.__v, q.__qv) / (c.__nrm * q.__qn) AS cos_sim " +
        s"FROM $cand cand JOIN $cn c ON cand.__graft_ann_id = c.__graft_ann_id " +
        s"JOIN $qn q ON cand.query_id = q.query_id")
    val ranked = newStage(
      s"SELECT query_id, __graft_ann_id AS $idQ, cos_sim, rank FROM (" +
        s"SELECT query_id, __graft_ann_id, cos_sim, row_number() OVER (" +
        s"PARTITION BY query_id ORDER BY cos_sim DESC, __graft_ann_id ASC) AS rank FROM $scored" +
        s") WHERE rank <= $k")
    // schema mirror: exactly the DataFrame compiler's construction
    val safeVec = "__graft_ann_vec"
    val safeId = "__graft_ann_id"
    val mirror = graft.ops.Ann.ivfTopKSeeded(
      prev.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      right.df.select(col(op.vecCol.name).as(safeVec), col(op.idCol.name).as(safeId)),
      safeVec, safeId, dim, k, nCells = nCells, nProbe = nProbe
    ).withColumnRenamed(safeId, op.idCol.name)
    Stage(ranked, mirror)
  }

  /** `| join kind=range` as SQL text (round 15): the BUCKETED
    * EQUI-JOIN form — interval rows exploded to the buckets they
    * overlap, points bucketed once, equi-join + exact filter — the
    * same lowering as [[graft.ops.RangeJoin.pointInInterval]] (never
    * a raw BETWEEN join, which Spark would plan as a
    * broadcast-nested-loop).
    */
  private def applyRangeJoin(prev: Stage, op: RangeJoinOp): Stage = {
    val right = foldOps(sourceStage(op.right.source), op.right.operators)
    val rp = ExtJoins.rangeParts(
      prev.df.columns.toSeq, right.df.columns.toSeq, op.onCols, op.span, fail)
    val micros = op.bucket match {
      case Some(o) => exprs.parseDurationMillis(o.value, o.valueSpan) * 1000L
      case None    => 3600000000L
    }
    // SQL text cannot express a duplicate output name — the DataFrame
    // path tolerates one (out-of-contract input), the text backend
    // rejects it here
    val dupOut = prev.df.columns.toSeq.filterNot(rp.keys.contains)
      .intersect(right.df.columns.toSeq.filterNot(rp.keys.contains))
    if (dupOut.nonEmpty)
      fail(s"range join would output duplicate column${if (dupOut.sizeIs > 1) "s" else ""} " +
        s"${dupOut.mkString(", ")} — project or rename one side", op.span)
    // floorDiv: exact for negative epochs (see RangeJoin.floorDiv)
    def fdiv(us: String) =
      s"CAST((($us) - pmod($us, ${micros}L)) / ${micros}L AS BIGINT)"
    val lb = newStage(
      s"SELECT *, ${fdiv(s"unix_micros(${q(rp.ts.name)})")} AS __bucket FROM ${prev.cte}")
    val rb = newStage(
      s"SELECT *, explode(sequence(${fdiv(s"unix_micros(${q(rp.start.name)})")}, " +
        s"${fdiv(s"unix_micros(${q(rp.end.name)}) - 1")})) AS __bucket" +
        s" FROM ${right.cte} WHERE ${q(rp.end.name)} > ${q(rp.start.name)}")
    val mirror = graft.ops.RangeJoin.pointInInterval(
      prev.df, right.df, rp.keys, rp.ts.name, rp.start.name, rp.end.name, micros)
    val items = mirror.columns.map(q).mkString(", ")
    val usingCols = (rp.keys :+ "__bucket").map(q).mkString(", ")
    val out = newStage(
      s"SELECT $items FROM $lb JOIN $rb USING ($usingCols)" +
        s" WHERE ${q(rp.ts.name)} >= ${q(rp.start.name)} AND ${q(rp.ts.name)} < ${q(rp.end.name)}")
    Stage(out, mirror)
  }

  private def applyJoin(prev: Stage, j: JoinOp): Stage = {
    joinSeq += 1
    val (la, ra) = (s"__l$joinSeq", s"__r$joinSeq")
    val leftStage =
      if (j.flavor == "innerunique")
        Stage(newStage(s"SELECT DISTINCT * FROM ${prev.cte}"), prev.df.dropDuplicates())
      else prev
    val right = foldOps(sourceStage(j.right.source), j.right.operators)
    val joinKw = j.flavor match {
      case "inner" | "innerunique" => "JOIN"
      case "leftouter"             => "LEFT JOIN"
      case other                   => fail(s"unhandled join type \"$other\"", j.span)
    }
    val ctx = JoinCtx(leftStage.df, right.df, la, ra)
    val joinEnv = env.copy(join = Some(ctx))
    val condCols = j.conditions.map(c => joinCondition(c, joinEnv, ctx))
    val cond = condCols.reduceOption(_ && _).getOrElse(lit(true))

    val taken = leftStage.df.columns.toSet
    val items = leftStage.df.columns.map(n => s"${sqlOf(ctx.leftCol(n))} AS ${q(n)}") ++
      right.df.columns.map { n =>
        val out = if (taken(n)) s"$$right.$n" else n
        s"${sqlOf(ctx.rightCol(n))} AS ${q(out)}"
      }
    val sqlText =
      s"SELECT ${items.mkString(", ")} FROM ${leftStage.cte} AS $la $joinKw ${right.cte} AS $ra" +
        s" ON ${sqlOf(cond)}"

    // schema frame: mirror the DataFrame compiler's output columns
    val joined = leftStage.df.as(la).join(right.df.as(ra), cond, if (joinKw == "JOIN") "inner" else "left")
    val outCols = leftStage.df.columns.map(n => ctx.leftCol(n).as(n)) ++
      right.df.columns.map(n => ctx.rightCol(n).as(if (taken(n)) s"$$right.$n" else n))
    Stage(newStage(sqlText), joined.select(outCols.toIndexedSeq: _*))
  }

  private def joinCondition(c: Expr, joinEnv: ExprEnv, ctx: JoinCtx): Column = c match {
    case QualifiedIdent(List(p))
        if !p.quoted && !scope.contains(p.name) &&
          p.name != "true" && p.name != "false" && p.name != "null" =>
      ctx.leftCol(p.name) === ctx.rightCol(p.name)
    case other => compile(other, joinEnv)
  }

  private def computedItem(c: ComputedColumn): (String, Column) = {
    val name = c.name.map(_.name).getOrElse(sourceText(c.x.span))
    val column = compile(c.x, env)
    s"${sqlOf(column)} AS ${q(name)}" -> column.as(name)
  }

  private def renderValue(e: Expr): String = e match {
    case BasicLit(_, v, _)     => v
    case QualifiedIdent(parts) => parts.head.name
    case other                 => sourceText(other.span)
  }

  private def rowCount(e: Expr): Int = {
    val n = exprs.evalRowCount(e, letAsts)
    if (n < 0 || n > Int.MaxValue) fail(s"row count $n out of range", e.span)
    n.toInt
  }

  private def orderText(terms: List[SortTerm]): String =
    terms.map(t => sqlOf(sortColumn(t))).mkString(", ")

  private def sortColumn(t: SortTerm): Column = {
    val c = compile(t.x, env)
    (t.asc, t.nullsFirst) match {
      case (true, true)   => c.asc_nulls_first
      case (true, false)  => c.asc_nulls_last
      case (false, true)  => c.desc_nulls_first
      case (false, false) => c.desc_nulls_last
    }
  }
}
