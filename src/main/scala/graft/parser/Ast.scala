package graft.parser

/** PQL abstract syntax tree.
  *
  * Shapes mirror the reference language's grammar
  * (/root/reference/parser/ast.go:13-600) but are plain Scala case
  * classes; every node keeps a [[Span]] so the compiler can name
  * unnamed computed columns after their exact source text.
  */
sealed trait Node { def span: Span }

sealed trait Statement extends Node

sealed trait Expr extends Node

/** An identifier; `quoted` marks backtick-quoted identifiers, which are
  * never treated as keywords, scope references, or builtins.
  */
final case class Ident(name: String, span: Span, quoted: Boolean = false) extends Node {
  def asQualified: QualifiedIdent = QualifiedIdent(List(this))
}

/** Dot-separated identifier chain (`a.b.c`, `$left.Col`). */
final case class QualifiedIdent(parts: List[Ident]) extends Expr {
  def span: Span = parts.head.span.union(parts.last.span)
}

/** Literal; `kind` is [[TokenKind.Number]] or [[TokenKind.Str]] and
  * `value` the normalized token text.
  */
final case class BasicLit(kind: TokenKind, value: String, span: Span) extends Expr {
  def isInteger: Boolean =
    kind == TokenKind.Number && !value.exists(c => c == '.' || c == 'e' || c == 'E')
}

final case class UnaryExpr(op: TokenKind, x: Expr, span: Span) extends Expr

final case class BinaryExpr(x: Expr, op: TokenKind, opSpan: Span, y: Expr) extends Expr {
  def span: Span = x.span.union(y.span)
}

final case class InExpr(x: Expr, vals: List[Expr], span: Span) extends Expr

final case class ParenExpr(x: Expr, span: Span) extends Expr

final case class CallExpr(func: Ident, args: List[Expr], span: Span) extends Expr

final case class IndexExpr(x: Expr, index: Expr, span: Span) extends Expr

/** `let name = expr;` — binds a scalar expression for later queries. */
final case class LetStatement(name: Ident, x: Expr, span: Span) extends Statement

final case class TableRef(table: Ident) { def span: Span = table.span }

/** A pipeline: source table followed by `|`-chained operators. */
final case class TabularExpr(source: TableRef, operators: List[TabularOperator]) extends Statement {
  def span: Span =
    operators.lastOption.fold(source.span)(op => source.span.union(op.span))
}

sealed trait TabularOperator extends Node

/** `| count` — single row, column named `count()`. */
final case class CountOp(span: Span) extends TabularOperator

/** `| where predicate` (alias `filter`). */
final case class WhereOp(predicate: Expr, span: Span) extends TabularOperator

/** One term of a sort: default ordering is `desc` with nulls last;
  * `asc` implies nulls first. Explicit `nulls first|last` overrides.
  */
final case class SortTerm(x: Expr, asc: Boolean, nullsFirst: Boolean)

/** `| sort by t1, t2, ...` (alias `order`). */
final case class SortOp(terms: List[SortTerm], span: Span) extends TabularOperator

/** `| take n` (alias `limit`). */
final case class TakeOp(rowCount: Expr, span: Span) extends TabularOperator

/** `| top n by term`. */
final case class TopOp(rowCount: Expr, col: SortTerm, span: Span) extends TabularOperator

/** One `project` column: bare `Name` or `Name = expr`. */
final case class ProjectColumn(name: Ident, x: Option[Expr])

/** `| project col1, col2 = expr, ...` — keeps only the listed columns. */
final case class ProjectOp(cols: List[ProjectColumn], span: Span) extends TabularOperator

/** One `extend`/`summarize` column: `Name = expr` or a bare expression
  * (then the output column is named after the expression source text).
  */
final case class ComputedColumn(name: Option[Ident], x: Expr)

/** `| extend c1 = expr, ...` — appends computed columns. */
final case class ExtendOp(cols: List[ComputedColumn], span: Span) extends TabularOperator

/** `| summarize aggs by keys`. */
final case class SummarizeOp(
    aggs: List[ComputedColumn],
    by: List[ComputedColumn],
    span: Span
) extends TabularOperator

/** `| join kind=flavor (right) on conds`; flavor defaults to
  * `innerunique` (left side deduplicated before an inner join).
  */
final case class JoinOp(
    flavor: String,
    right: TabularExpr,
    conditions: List[Expr],
    span: Span
) extends TabularOperator

/** `| as Name` — names the intermediate result for later reference. */
final case class AsOp(name: Ident, span: Span) extends TabularOperator

final case class RenderProperty(name: Ident, value: Expr)

/** `| render charttype with (k = v, ...)` — appends literal metadata
  * columns `render_type` and `render_prop_<k>` for the presentation
  * layer.
  */
final case class RenderOp(chartType: Ident, props: List[RenderProperty], span: Span)
    extends TabularOperator

/** A literal `name=<number>` operator option on a graft extension
  * operator (e.g. `dim=64` on `dedup kind=embed`). The value keeps its
  * token text; the compiler parses/validates it per option.
  */
final case class OpOption(name: Ident, value: String, valueSpan: Span)

/** `| dedup [kind=<kind>] [opt=<n> ...] TextCol by IdCol` — graft
  * EXTENSION (no counterpart in the reference grammar): corpus
  * deduplication as a first-class pipeline operator.
  *
  *   - `exact`, `minhash`, `simhash` keep surviving full rows keyed on
  *     the text column;
  *   - `lines` and `substrings` rewrite the text column
  *     (row-preserving);
  *   - `embed` (requires `dim=<n>`; optional `cos=<t>`) and `semantic`
  *     (optional `cells=<n>`, `cos=<t>`) treat TextCol as an embedding
  *     array column and keep surviving full rows.
  */
final case class DedupOp(
    kind: String,
    opts: List[OpOption],
    textCol: Ident,
    idCol: Ident,
    span: Span
) extends TabularOperator

/** `| decontam against (EvalPipeline) [hits=<n>] [ngram=<n>] TextCol by
  * IdCol` — graft EXTENSION: drops documents whose hashed n-gram
  * shingle overlap with the eval pipeline's result reaches `hits`
  * (default 2) shared shingles; `ngram` (default 3) is the shingle
  * order. The eval side must expose the same text/id column names.
  */
final case class DecontamOp(
    eval: TabularExpr,
    opts: List[OpOption],
    textCol: Ident,
    idCol: Ident,
    span: Span
) extends TabularOperator

/** `| chunk <tokens> TextCol by IdCol` — graft EXTENSION: splits each
  * document into fixed-size token chunks; output is
  * `(IdCol, chunk_idx, chunk_text, n_tokens)`.
  */
final case class ChunkOp(sizeTokens: Expr, textCol: Ident, idCol: Ident, span: Span)
    extends TabularOperator

/** `| pack <budget> [shards=<n>] TokensCol by IdCol, IdxCol` — graft
  * EXTENSION: next-fit sequence packing of chunk rows into
  * `budget`-token training sequences (appends `seq_id`). Composes
  * after `| chunk`: `documents | chunk 64 text by doc_id
  * | pack 256 n_tokens by doc_id, chunk_idx`.
  */
final case class PackOp(
    budget: Expr,
    opts: List[OpOption],
    tokensCol: Ident,
    idCol: Ident,
    idxCol: Ident,
    span: Span
) extends TabularOperator

/** `| sample 0.25 by IdCol` — graft EXTENSION: deterministic
  * hash-of-id Bernoulli sample (reproducible membership on any
  * engine/partitioning; the literal rate is required at parse time).
  */
final case class SampleOp(rate: String, rateSpan: Span, idCol: Ident, span: Span)
    extends TabularOperator

/** `| sample budget=<tokens> [bits=<n>] TextCol by IdCol, StrataCol` —
  * graft EXTENSION (round 14): per-stratum token-budget selection
  * ([[graft.ops.Sampling.tokenBudgetAuto]] — keep each stratum's first
  * ~budget tokens in deterministic hash order). The engine picks the
  * form from a plan-time stratum count: the exact running-total window
  * while every stratum is small, the histogram threshold selection
  * (`bits` buckets exponent, default 12) once any stratum crosses the
  * row floor. Output is `(IdCol, StrataCol, n_tok)` at every scale.
  * Distinguished from the rate form by the literal `budget=`.
  */
final case class SampleBudgetOp(
    opts: List[OpOption],
    textCol: Ident,
    idCol: Ident,
    strataCol: Ident,
    span: Span
) extends TabularOperator

/** `| join kind=asof [tolerance="1h"] (Right) on Key, ..., TsCol` —
  * graft EXTENSION (round 13): most-recent-prior join, the first query
  * an event-analytics user writes after plain `join`. The LAST `on`
  * column is the shared event-time column; everything before it is the
  * equi-key. The joined value columns are the right side's remaining
  * columns (right − keys − ts). With `tolerance`, matches older than
  * the duration are nulled out ([[graft.ops.AsOf.joinAsOfTolerant]]).
  */
final case class AsofJoinOp(
    right: TabularExpr,
    onCols: List[Ident],
    tolerance: Option[OpOption],
    span: Span
) extends TabularOperator

/** `| join kind=range [bucket="1h"] (Right) on Key, ..., TsCol,
  * StartCol, EndCol` — graft EXTENSION (round 13): point-in-interval
  * join. The last three `on` columns are the left point column and the
  * right side's half-open interval `[start, end)`; preceding columns
  * are the equi-key. `bucket` tunes the interval-explode width
  * ([[graft.ops.RangeJoin.pointInInterval]]; default 1h).
  */
final case class RangeJoinOp(
    right: TabularExpr,
    onCols: List[Ident],
    bucket: Option[OpOption],
    span: Span
) extends TabularOperator

/** `| ann [kind=brute|lsh|ivf] [k=5] [dim=64] ... (Queries) on VecCol
  * by IdCol` — graft EXTENSION (round 14): approximate-nearest-neighbor
  * top-k of the piped corpus against a query sub-pipeline
  * ([[graft.ops.Ann]]). The corpus is the left input; `Queries` is a
  * tabular expression carrying the same vector/id columns (small by
  * construction — it is always broadcast). Output is
  * `(query_id, IdCol, cos_sim, rank)`, ≤ k rows per query.
  *
  * `kind=brute` (default) is the exact cosine top-k; `lsh`/`ivf` are
  * the indexed paths whose geometry defaults to the adaptive plan-time
  * sizing (round 13) — `planes=`/`bits=` (lsh) or `cells=` (ivf) pin a
  * fixed index, `probes=` sets the IVF probe width, `dim=` is required
  * for the indexed kinds (a plan parameter, not derivable from the
  * array column type).
  */
final case class AnnOp(
    kind: String,
    opts: List[OpOption],
    queries: TabularExpr,
    vecCol: Ident,
    idCol: Ident,
    span: Span
) extends TabularOperator
