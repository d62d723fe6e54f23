package graft.compiler

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.parser._

/** Compiles a parsed PQL program into a Spark [[DataFrame]].
  *
  * Where the reference emits one SQL CTE per pipeline stage
  * (/root/reference/pql.go:120-530), graft folds each tabular operator
  * directly onto the DataFrame, producing a single declarative Catalyst
  * plan — predicate pushdown, column pruning, join strategy selection
  * and AQE all apply to the whole pipeline. `sort | take` pairs become
  * `orderBy().limit()`, which Spark plans as TakeOrderedAndProject
  * (per-partition top-K + merge; no global sort).
  *
  * @param source  original query text (for error positions and naming
  *                unnamed computed columns after their source text).
  * @param catalog resolves a table name to a DataFrame.
  * @param params  external parameter bindings (name → Column).
  */
private[graft] final class Compiler(
    source: String,
    catalog: String => DataFrame,
    params: Map[String, Column]
) {

  private val exprs = new Exprs(source)
  import exprs.{attr, compile, fail, sourceText}

  /** `let` bindings + params, visible to scalar expressions. */
  private val scope = mutable.LinkedHashMap[String, Column]() ++= params
  /** AST forms of `let` bindings, for constant row-count evaluation. */
  private val letAsts = mutable.Map[String, Expr]()
  /** Pipeline stages named via `| as Name`. */
  private val namedResults = mutable.Map[String, DataFrame]()

  private def env: ExprEnv = ExprEnv(scope)

  def run(stmts: List[Statement]): DataFrame = {
    var tabular: Option[TabularExpr] = None
    stmts.foreach {
      case let: LetStatement =>
        // Let statements after the query are out of scope (reference
        // behavior: /root/reference/pql.go:57-62).
        if (tabular.isEmpty) {
          scope(let.name.name) = compile(let.x, env.copy(letMode = true))
          letAsts(let.name.name) = let.x
        }
      case t: TabularExpr =>
        if (tabular.isDefined) fail("batch queries not supported", t.span)
        tabular = Some(t)
    }
    tabular match {
      case Some(t) => compileTabular(t)
      case None    => throw new PqlCompileException("missing tabular query", Span.none, source)
    }
  }

  private def resolveTable(name: Ident): DataFrame =
    namedResults.get(name.name) match {
      case Some(df) => df
      case None =>
        try catalog(name.name)
        catch {
          case e: Exception => fail(s"unknown table ${name.name}: ${e.getMessage}", name.span)
        }
    }

  def compileTabular(t: TabularExpr): DataFrame =
    t.operators.foldLeft(resolveTable(t.source.table))(applyOp)

  // ---- operators -----------------------------------------------------

  /** Structured Streaming allows at most ONE event-time column per
    * STATEFUL operator: a project/extend alias that merely COPIES the
    * watermarked column inherits its watermark metadata (Alias
    * propagates NamedExpression metadata), and a downstream stateful
    * operator aborts with `STREAM_FAILED … more than one event time
    * column` — for a query that runs fine in batch (found by
    * StreamFuzz seed 36: `embeddings | extend x1 = ts | dedup
    * kind=embed …`). Copies are legal through any number of STATELESS
    * transforms, and a copy-then-drop-original pipeline (`extend t2 =
    * ts | project t2, … | summarize … by bin(t2, …)`) NEEDS the copy
    * to keep its metadata until the original is projected away — so
    * the strip happens here, at the point a stateful operator is
    * compiled, never eagerly at extend/project. `preferred` is the
    * column the stateful operator actually binds to (the `bin()`
    * argument for windowed aggregation); every watermarked column is a
    * per-row copy of the same source event time (Alias only inherits
    * metadata from a bare attribute), so when no preference applies,
    * keeping the first in schema order is deterministic and
    * value-identical. Only the watermark key is removed — other field
    * metadata (e.g. parquet comments) rides through — and names are
    * backtick-quoted so dotted/quoted PQL identifiers survive the
    * re-select.
    */
  private def singleEventTime(df: DataFrame, preferred: Option[String]): DataFrame = {
    if (!df.isStreaming) return df
    val key = "spark.watermarkDelayMs"
    val wm = df.schema.fields.filter(_.metadata.contains(key)).map(_.name)
    if (wm.length <= 1) return df
    val keep = preferred.filter(wm.contains).getOrElse(wm.head)
    df.select(df.columns.toIndexedSeq.map { c =>
      if (c == keep || !wm.contains(c)) attr(c)
      else {
        val stripped = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(df.schema(c).metadata).remove(key).build()
        attr(c).as(c, stripped)
      }
    }: _*)
  }

  private def applyOp(df: DataFrame, op: TabularOperator): DataFrame = op match {
    case WhereOp(pred, _) => df.filter(compile(pred, env))

    case ProjectOp(cols, _) =>
      // A bare unquoted name resolves through the expression path so
      // `let`/parameter bindings and builtins shadow table columns,
      // matching the reference (/root/reference/pql.go:374-384,603-610);
      // quoted names are always plain column references.
      df.select(cols.map { c =>
        c.x match {
          case Some(x)                 => compile(x, env).as(c.name.name)
          case None if c.name.quoted   => attr(c.name.name).as(c.name.name)
          case None                    => compile(c.name.asQualified, env).as(c.name.name)
        }
      }: _*)

    case ExtendOp(cols, _) =>
      df.select(col("*") +: cols.map(computed): _*)

    case SummarizeOp(aggs, by, _) =>
      val aggCols = aggs.map(computed)
      // Streaming: a `bin(ts, "dur")` group key becomes a native
      // tumbling window() struct, so the analyzer sees the event-time
      // column and the aggregation runs append-mode with bounded state
      // (watermark-evictable). Values are identical to bin() — both
      // floor to epoch-aligned multiples — and the struct is replaced
      // by its `start` after the agg, keeping the batch output schema.
      val binKey: Option[(ComputedColumn, Int, Expr, Long)] =
        if (!df.isStreaming) None
        else by.zipWithIndex.collectFirst {
          case (cc @ ComputedColumn(_, CallExpr(f, List(ts, BasicLit(TokenKind.Str, dur, sp)), _)), idx)
              if f.name == "bin" =>
            (cc, idx, ts, exprs.parseDurationMillis(dur, sp))
        }
      binKey match {
        case Some((cc, idx, ts, ms)) =>
          val name = cc.name.map(_.name).getOrElse(sourceText(cc.x.span))
          // the stateful op binds to the bin() argument — when copies
          // of the event-time column are in flight, keep that one
          val preferred = ts match {
            case QualifiedIdent(List(id)) => Some(id.name)
            case _                        => None
          }
          val dfS = singleEventTime(df, preferred)
          // no cast here: casting the event-time attribute strips the
          // watermark metadata and append mode stops resolving
          val win = window(compile(ts, env), s"$ms milliseconds").as(name)
          val keyCols = by.map(computed).patch(idx, Seq(win), 1)
          val agged =
            if (aggCols.isEmpty)
              // distinct form: a keys-only streaming aggregation keeps
              // the watermark-evictable window state (a .distinct()
              // here would be an unbounded streaming Deduplicate)
              dfS.groupBy(keyCols: _*).agg(max(lit(1)).as("__g")).drop("__g")
            else dfS.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          agged.withColumn(name, col(name).getField("start"))
        case None =>
          val keyCols = by.map(computed)
          if (aggCols.isEmpty) df.select(keyCols: _*).distinct()
          else if (keyCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
          else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      }

    case SortOp(terms, _) => df.orderBy(terms.map(sortColumn): _*)

    case TakeOp(n, _) => df.limit(rowCount(n))

    case TopOp(n, term, _) => df.orderBy(sortColumn(term)).limit(rowCount(n))

    case CountOp(_) => df.agg(count(lit(1)).as("count()"))

    case j: JoinOp => compileJoin(df, j)

    case AsOp(name, _) =>
      namedResults(name.name) = df
      df

    case RenderOp(chartType, props, _) =>
      val withType = df.withColumn("render_type", lit(chartType.name))
      props.foldLeft(withType) { (acc, p) =>
        acc.withColumn(s"render_prop_${p.name.name}", lit(renderValue(p.value)))
      }

    // graft extensions: the §2.4 pipeline operators, in-language ------
    case DedupOp(kind, opts, text, id, span) if df.isStreaming =>
      // STREAMING mapping (round 14): the kinds whose state contract
      // survives an unbounded input compile to their
      // dropDuplicatesWithinWatermark forms (first-arrival state per
      // digest / band key, bounded by the event-time watermark — the
      // graft.streaming library's *On forms); the rest are batch-only
      // semantics (corpus-wide keep-lowest-id, plan-time corpus
      // counts, within-cell pair scans) and are rejected with a span.
      // The catalog owns the watermark (Streaming.withEventTime): the
      // stateful operator needs one, so its absence is a compile
      // error here, not an AnalysisException at start().
      val wm = df.queryExecution.analyzed.collectFirst {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
      }
      if (wm.isEmpty)
        fail("streaming dedup needs an event-time watermark on the input " +
          "(apply withWatermark in the catalog — Streaming.withEventTime)", span)
      // dropDuplicatesWithinWatermark is stateful: collapse event-time
      // copies to one column here (never eagerly at extend/project —
      // copy-then-drop-original pipelines need the copy to keep its
      // metadata until the original is projected away)
      val df1 = singleEventTime(df, None)
      kind match {
        case "exact" =>
          new OpOptions(opts, span, Set.empty, "streaming dedup kind=exact").finish()
          graft.streaming.Streaming.dedupExactOn(df1, text.name)
        case "minhash" =>
          new OpOptions(opts, span, Set.empty, "streaming dedup kind=minhash").finish()
          graft.streaming.Streaming.dedupMinhashBandsOn(df1, text.name)
        case "embed" =>
          // fixed geometry only: the adaptive default sizes bands from
          // a plan-time corpus count, which an unbounded stream cannot
          // provide (occupancy= and the cos= rescore are batch-only)
          val o = new OpOptions(opts, span, Set("dim", "planes", "bits"),
            "streaming dedup kind=embed")
          val dim = o.requiredInt("dim", min = 1)
          val out = graft.streaming.Streaming.dedupEmbedBandsOn(
            df1, text.name, dim,
            planes = o.int("planes", 32, min = 1),
            bandBits = o.int("bits", 8, min = 1))
          o.finish()
          out
        case other =>
          fail(s"dedup kind=$other is not available on a streaming input " +
            "(streaming kinds: embed, exact, minhash)", span)
      }

    case DedupOp(kind, opts, text, id, span) =>
      val o = new OpOptions(opts, span, allowedFor(kind), s"dedup kind=$kind")
      val out = kind match {
        case "exact"      => graft.ops.Dedup.exact(df, text.name, id.name)
        case "lines"      => graft.ops.Dedup.dedupLines(df, text.name, id.name)
        case "substrings" => graft.ops.Dedup.dedupSubstrings(df, text.name, id.name)
        case "minhash"    => graft.ops.NearDup.deduplicateCorpus(df, text.name, id.name)
        case "simhash" =>
          graft.ops.NearDup.dropNearDuplicates(
            df, graft.ops.NearDup.simhashPairs(df, text.name, id.name), id.name)
        case "embed" =>
          // the embedding dimension is a plan parameter (hyperplane
          // count per signature bit), not derivable from the array
          // column's type — required in the query text
          val dim = o.requiredInt("dim", min = 1)
          val cos = o.double("cos", 0.4, min = -1.0, max = 1.0)
          // The DEFAULT band geometry is ADAPTIVE (round 13): the
          // corpus is counted once at compile time and bandBits sized
          // so expected bucket occupancy stays at or below occupancy=
          // (64 unset) — NearDup.autoGeometry, the 100-TB form, where
          // a fixed geometry makes candidate pairs quadratic in corpus
          // size. planes=/bits= pin a FIXED geometry (the regression
          // sentry / reproduce-an-old-run path; both together,
          // exclusive with occupancy=).
          val pairs =
            (o.intOpt("planes", min = 1), o.intOpt("bits", min = 1),
              o.intOpt("occupancy", min = 1)) match {
              // occupancy with full OR partial fixed geometry: same
              // conflict, same message (the ann kind=lsh rule)
              case (Some(_), Some(_), Some(_)) | (Some(_), None, Some(_)) |
                  (None, Some(_), Some(_)) =>
                fail("dedup kind=embed takes planes=/bits= or occupancy=, not both", span)
              case (Some(p), Some(b), None) =>
                // spanned range errors, not raw requires from the op
                // (the r16 ann kind=lsh advice fix, mirrored here);
                // p < b would silently make zero bands — name it
                if (b > 62) fail(s"option bits must be in [1, 62], got $b", span)
                if (p > 62) fail(s"option planes must be in [1, 62], got $p", span)
                if (p < b) fail(s"planes ($p) must be at least bits ($b) — one band minimum", span)
                graft.ops.NearDup.embedCosinePairs(
                  df, text.name, id.name, dim, planes = p, bandBits = b, minCos = cos)
              case (None, None, t) =>
                graft.ops.NearDup.embedCosinePairsAuto(
                  df, text.name, id.name, dim, targetOccupancy = t.getOrElse(64), minCos = cos)
              case _ =>
                fail("dedup kind=embed needs planes= and bits= together", span)
            }
          graft.ops.NearDup.dropNearDuplicates(df, pairs, id.name)
        case "semantic" =>
          val cos = o.double("cos", 0.9, min = -1.0, max = 1.0)
          // occupancy=<n> = target CELL SIZE, resolving nCells from
          // the corpus count at compile time (SemDedup.autoCellCount —
          // within-cell work is quadratic in cell size, so cells must
          // scale linearly with the corpus); exclusive with cells=.
          // The DEFAULT (neither option) is ADAPTIVE at target 64
          // (round 13 — sf10 measured fixed 32 cells at 22.0 s vs
          // 4.94 s sized); cells= pins a fixed index (sentry path).
          (o.intOpt("occupancy", min = 1), o.intOpt("cells", min = 1)) match {
            case (Some(_), Some(_)) =>
              fail("dedup kind=semantic takes cells= or occupancy=, not both", span)
            case (occ, None) =>
              graft.ops.NearDup.dropNearDuplicates(
                df, graft.ops.SemDedup.pairsAuto(df, text.name, id.name, occ.getOrElse(64), cos),
                id.name)
            case (None, Some(c)) =>
              graft.ops.SemDedup.deduplicate(
                df, text.name, id.name, nCells = c, minCos = cos)
          }
      }
      o.finish()
      out

    case DecontamOp(eval, opts, text, id, span) =>
      val o = new OpOptions(opts, span, Set("hits", "ngram"), "decontam")
      val evalDf = compileTabular(eval)
      val out = graft.ops.Decontam.decontaminate(
        df, evalDf, text.name, id.name,
        minHits = o.int("hits", 2, min = 1),
        shingleN = o.int("ngram", 3, min = 1))
      o.finish()
      out

    case ChunkOp(n, text, id, _) =>
      graft.ops.TextOps.chunk(df, text.name, id.name, chunkTokens = rowCount(n))

    case PackOp(budget, opts, tokens, id, idx, span) =>
      val o = new OpOptions(opts, span, Set("shards"), "pack")
      val out = graft.ops.Packing.packSequences(
        df, id.name, idx.name, tokens.name,
        budgetTokens = rowCount(budget),
        nShards = o.int("shards", 64, min = 1))
      o.finish()
      out

    case SampleBudgetOp(opts, text, id, strata, span) =>
      // `| sample budget=N [bits=b] text by id, strata` → the
      // auto-switching token budget: ONE plan-time strata-count job
      // (narrow column — the text column is never read by the
      // decision) picks the exact running-total window below the
      // 100k-rows-per-stratum floor, the histogram threshold selection
      // above it. Output (id, strata, n_tok) is schema-stable across
      // the crossover. The count job needs a bounded input — reject
      // streams up front with a span instead of a raw AnalysisException.
      if (df.isStreaming)
        fail("sample budget= sizes its plan from a stratum count and is not available on a streaming input", span)
      val o = new OpOptions(opts, span, Set("budget", "bits"), "sample budget=")
      val budget = o.requiredLong("budget", min = 0L)
      val bits = o.int("bits", 12, min = 1)
      if (bits > 31) fail(s"option bits must be in [1, 31], got $bits", span)
      val out = graft.ops.Sampling.tokenBudgetAuto(
        df, text.name, id.name, strata.name, budgetTokens = budget, bucketBits = bits)
      o.finish()
      out

    case SampleOp(rate, rateSpan, id, _) =>
      val r =
        try rate.toDouble
        catch { case _: NumberFormatException => fail(s"invalid sample rate $rate", rateSpan) }
      if (r < 0.0 || r > 1.0) fail(s"sample rate must be in [0, 1], got $rate", rateSpan)
      graft.ops.Sampling.bernoulli(df, id.name, r)

    case AsofJoinOp(right, onCols, tol, span) =>
      // last `on` column = shared event time; the rest = equi-key.
      // Value columns are everything else the right side carries — the
      // library operator's union+keyed-window plan (AsOf.joinAsOf) does
      // the rest: one shuffle on the key, no range condition, hot keys
      // split across time buckets.
      val rightDf = compileTabular(right)
      // validation (duplicate on-columns, existence, value/reserved
      // collisions) is shared with the SQL-text backend — ExtJoins
      val p = ExtJoins.asofParts(df.columns.toSeq, rightDf.columns.toSeq, onCols, span, fail)
      tol match {
        case None => graft.ops.AsOf.joinAsOf(df, rightDf, p.keys, p.ts, p.valueCols)
        case Some(o) =>
          val ms = exprs.parseDurationMillis(o.value, o.valueSpan)
          graft.ops.AsOf.joinAsOfTolerant(df, rightDf, p.keys, p.ts, p.valueCols, s"$ms milliseconds")
      }

    case RangeJoinOp(right, onCols, bucket, span) =>
      // last three `on` columns = left point, right interval start/end
      // (half-open); the rest = equi-key. Compiles to the bucketed
      // equi-join form (RangeJoin.pointInInterval) — never the
      // broadcast-nested-loop a raw BETWEEN join would plan to.
      val rightDf = compileTabular(right)
      // shared validation — see ExtJoins (the SQL-text backend uses
      // the same splitter, so rejections cannot drift between paths)
      val rp = ExtJoins.rangeParts(df.columns.toSeq, rightDf.columns.toSeq, onCols, span, fail)
      val (keys, tsC, startC, endC) = (rp.keys, rp.ts, rp.start, rp.end)
      val micros = bucket match {
        case Some(o) => exprs.parseDurationMillis(o.value, o.valueSpan) * 1000L
        case None    => 3600000000L // 1h — right for hour-scale intervals
      }
      graft.ops.RangeJoin.pointInInterval(
        df, rightDf, keys, tsC.name, startC.name, endC.name, bucketMicros = micros)

    case AnnOp(kind, opts, queries, vec, id, span) =>
      // `| ann [kind=..] [opts] (Queries) on Vec by Id` → graft.ops.Ann
      // top-k of the piped corpus against the query sub-pipeline. The
      // indexed kinds size their geometry from a plan-time corpus
      // count (adaptive default, round 13) and the query side is
      // always broadcast — both need bounded inputs, so streams are
      // rejected here with a span, not as an AnalysisException later.
      if (df.isStreaming)
        fail("ann indexes a bounded corpus and is not available on a streaming input", span)
      val qDf = compileTabular(queries)
      if (qDf.isStreaming)
        fail("ann query side must be a bounded input, got a stream", span)
      // Only the operator's OUTPUT columns (query_id, cos_sim, rank)
      // are reserved: the id column rides through to the output under
      // its own name. Internal projection names are NOT reserved —
      // Ann.prep drops every corpus column except vec/id on entry, and
      // both are aliased to `__graft_ann_*` below before any internal
      // name exists, so real single-letter schemas (`c`, `d`, `r`, …)
      // compile (round-15; was a 15-name reserved wall). Checks shared
      // with the SQL-text backend (ExtJoins.annCheck).
      ExtJoins.annCheck(df.columns.toSeq, qDf.columns.toSeq, vec, id, fail)
      val safeVec = "__graft_ann_vec"
      val safeId = "__graft_ann_id"
      val corpusSafe = df.select(col(vec.name).as(safeVec), col(id.name).as(safeId))
      val qSafe = qDf.select(col(vec.name).as(safeVec), col(id.name).as(safeId))
      def restoreId(out: DataFrame): DataFrame =
        out.withColumnRenamed(safeId, id.name)
      kind match {
        case "brute" =>
          val o = new OpOptions(opts, span, Set("k"), "ann kind=brute")
          val out = graft.ops.Ann.bruteTopK(corpusSafe, qSafe, safeVec, safeId,
            k = o.int("k", 5, min = 1))
          o.finish()
          restoreId(out)
        case "lsh" =>
          val o = new OpOptions(opts, span,
            Set("k", "dim", "planes", "bits", "occupancy"), "ann kind=lsh")
          val k = o.int("k", 5, min = 1)
          val dim = o.requiredInt("dim", min = 1)
          val out =
            (o.intOpt("planes", min = 1), o.intOpt("bits", min = 1),
              o.intOpt("occupancy", min = 1)) match {
              // any mix of occupancy with fixed geometry (full OR
              // partial) is the same conflict — naming it beats the
              // catch-all "needs planes= and bits= together" (which is
              // true but hides the real problem when occupancy= is
              // present; advice, round 14)
              case (Some(_), Some(_), Some(_)) | (Some(_), None, Some(_)) |
                  (None, Some(_), Some(_)) =>
                fail("ann kind=lsh takes planes=/bits= or occupancy=, not both", span)
              case (Some(p), Some(b), None) =>
                if (b > 62) fail(s"option bits must be in [1, 62], got $b", span)
                // the 62-bit signature cap (PackedSignSig) as a spanned
                // compile error, not a raw require from the op (advice,
                // round 15: planes=63 escaped unspanned)
                if (p > 62) fail(s"option planes must be in [1, 62], got $p", span)
                if (p < b) fail(s"planes ($p) must be at least bits ($b) — one band minimum", span)
                graft.ops.Ann.lshTopK(corpusSafe, qSafe, safeVec, safeId, dim, k,
                  planes = p, bandBits = b)
              case (None, None, t) =>
                graft.ops.Ann.lshTopKAuto(corpusSafe, qSafe, safeVec, safeId, dim, k,
                  targetOccupancy = t.getOrElse(64))
              case _ =>
                fail("ann kind=lsh needs planes= and bits= together", span)
            }
          o.finish()
          restoreId(out)
        case "ivf" =>
          // the SEEDED centroid family (hash-sampled from the corpus —
          // the data-dependent policy ivfTopKSeeded's doc argues for at
          // scale); cells=0 (unset) resolves √n cells at plan time
          val o = new OpOptions(opts, span, Set("k", "dim", "cells", "probes"), "ann kind=ivf")
          val out = graft.ops.Ann.ivfTopKSeeded(corpusSafe, qSafe, safeVec, safeId,
            dim = o.requiredInt("dim", min = 1),
            k = o.int("k", 5, min = 1),
            nCells = o.intOpt("cells", min = 1).getOrElse(0),
            nProbe = o.int("probes", 2, min = 1))
          o.finish()
          restoreId(out)
        case other =>
          fail(s"unknown ann kind $other", span)
      }
  }

  /** Option names valid for each dedup kind: an option the op would
    * silently ignore is a compile error, not noise.
    */
  private def allowedFor(kind: String): Set[String] = kind match {
    case "embed"    => Set("dim", "cos", "occupancy", "planes", "bits")
    case "semantic" => Set("cells", "cos", "occupancy")
    case _          => Set.empty
  }

  /** Validated accessor over an extension operator's literal
    * `name=<number>` options: rejects unknown/duplicate names at
    * construction, parses per accessor.
    */
  /** [[OpOptionsBase]] bound to this compiler's spanned `fail`. */
  private final class OpOptions(
      opts: List[OpOption],
      opSpan: Span,
      allowed: Set[String],
      opName: String
  ) extends OpOptionsBase(opts, opSpan, allowed, opName, fail)

  /** Render property values are presentation instructions: literals
    * stringify to their text, identifiers to their name.
    */
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

  private def computed(c: ComputedColumn): Column = {
    val name = c.name.map(_.name).getOrElse(sourceText(c.x.span))
    compile(c.x, env).as(name)
  }

  private def sortColumn(t: SortTerm): Column = {
    val c = compile(t.x, env)
    (t.asc, t.nullsFirst) match {
      case (true, true)   => c.asc_nulls_first
      case (true, false)  => c.asc_nulls_last
      case (false, true)  => c.desc_nulls_first
      case (false, false) => c.desc_nulls_last
    }
  }

  // ---- join ----------------------------------------------------------

  /** Join semantics follow the reference (/root/reference/pql.go:186-361):
    *
    *   - default flavor `innerunique` deduplicates the left side
    *     (`SELECT DISTINCT *`) before an inner join;
    *   - a bare column condition `on Col` means
    *     `\$left.Col == \$right.Col`;
    *   - output keeps every column of both sides; right-side columns
    *     whose name collides with a left column are renamed
    *     `\$right.<name>` (the engine-assigned disambiguation the
    *     reference relies on).
    *
    * Equality conditions across sides compile to plain `===` conjuncts
    * so Catalyst recognizes the equi-join (broadcast/sort-merge + AQE
    * skew handling at scale).
    */
  /** Unique per-join alias counter (nested joins must not collide). */
  private var joinSeq = 0

  private def compileJoin(df: DataFrame, j: JoinOp): DataFrame = {
    // Alias both sides and reference columns by qualified name
    // (`alias.col`): a self-join (`T | join (T) on k`) otherwise trips
    // Spark's AMBIGUOUS_SELF_JOIN detection because both legs share one
    // Dataset lineage. With string-qualified references, Catalyst's
    // DeduplicateRelations regenerates the right side's expression ids
    // and resolution goes through the subquery aliases — the pattern
    // the Spark docs prescribe (df.as("a").join(df.as("b"), $"a.x"...)).
    joinSeq += 1
    // 100-TB note: innerunique's all-column dropDuplicates is a
    // full-row shuffle — the cost the reference's `SELECT DISTINCT *`
    // pays too; it is semantic, not incidental. AQE coalesces the
    // exchange; users who only need key-distinctness should
    // `summarize by key` first (narrower shuffle payload).
    val leftRaw = if (j.flavor == "innerunique") df.dropDuplicates() else df
    val joinType = j.flavor match {
      case "inner" | "innerunique" => "inner"
      case "leftouter"             => "left"
      case other                   => fail(s"unhandled join type \"$other\"", j.span)
    }
    // capture alias names BEFORE compiling the right side: a join
    // nested inside j.right bumps joinSeq, and evaluating the
    // interpolations afterwards would reuse the inner join's aliases
    val (leftAlias, rightAlias) = (s"__graft_l$joinSeq", s"__graft_r$joinSeq")
    val ctx = JoinCtx(leftRaw, compileTabular(j.right), leftAlias, rightAlias)

    val joinEnv = env.copy(join = Some(ctx))
    val cond = j.conditions
      .map(c => compileJoinCondition(c, joinEnv))
      .reduceOption(_ && _)
      .getOrElse(lit(true))

    val joined = ctx.left.as(ctx.leftAlias).join(ctx.right.as(ctx.rightAlias), cond, joinType)

    val taken = ctx.left.columns.toSet
    val out = ctx.left.columns.map(n => ctx.leftCol(n).as(n)) ++
      ctx.right.columns.map { n =>
        // Right-side name collisions are disambiguated `$right.<name>`,
        // the engine-assigned naming the reference relies on
        // (/root/reference/pql.go:330-361).
        ctx.rightCol(n).as(if (taken(n)) s"$$right.$n" else n)
      }
    joined.select(out.toIndexedSeq: _*)
  }

  /** A bare unqualified identifier as a join condition is shorthand for
    * `\$left.Col == \$right.Col`.
    */
  private def compileJoinCondition(c: Expr, joinEnv: ExprEnv): Column = c match {
    case QualifiedIdent(List(p))
        if !p.quoted && !scope.contains(p.name) &&
          p.name != "true" && p.name != "false" && p.name != "null" =>
      val ctx = joinEnv.join.get
      ctx.leftCol(p.name) === ctx.rightCol(p.name)
    case other => compile(other, joinEnv)
  }
}
