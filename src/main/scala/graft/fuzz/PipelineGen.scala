package graft.fuzz

import scala.collection.mutable
import scala.util.Random

/** A generated differential-test query.
  *
  * @param seed         generator seed (reproduce with `PipelineGen(seed)`)
  * @param pql          the PQL pipeline text
  * @param duckSql      equivalent DuckDB SQL over the same parquet tables
  *                     (bare table names; the runner registers views) —
  *                     defined only when every generated construct has an
  *                     exact DuckDB translation (pure-tabular pipelines)
  * @param sqlEmittable whether `Pql.compileToSql` must ACCEPT this
  *                     pipeline (all tabular operators and the
  *                     fixed-geometry extension forms) — when false the
  *                     text backend must REJECT it with a spanned compile
  *                     error (adaptive geometry / `sample budget=`)
  */
final case class GenQuery(
    seed: Long,
    pql: String,
    duckSql: Option[String],
    sqlEmittable: Boolean
)

/** A generated STREAMING differential-test query (StreamFuzz): the
  * same pipeline text runs over a batch catalog and over a
  * micro-batched file-stream catalog, and the gated results must
  * match.
  *
  * @param seed     generator seed (reproduce with `PipelineGen.stream(seed)`)
  * @param base     source table (the harness registers it as a stream)
  * @param prePql   the pipeline UP TO the terminal operator — the
  *                 terminal's input, used by the band/digest gates to
  *                 recompute the expected state keys batch-side
  * @param pql      the full pipeline text
  * @param terminal which gate applies: "stateless" | "window" (both:
  *                 full-row batch ≡ stream parity) | "exact" (digest
  *                 set) | "minhash" | "embed" (band set)
  */
final case class StreamGenQuery(
    seed: Long,
    base: String,
    prePql: String,
    pql: String,
    terminal: String
)

/** Grammar-driven random PQL pipeline generator for differential
  * testing (DiffFuzzSpec / graft.fuzz.DiffFuzz — round-18 top ask).
  *
  * The fixed correctness gate pins each operator in isolation; what it
  * cannot find is operator × operator × expression COMPOSITION bugs
  * (a dedup after a join after an extend with a let-shadowed column).
  * This generator produces seeded, deterministic, schema-tracked
  * random pipelines over the driver's test tables and, alongside each
  * PQL text, an independently-authored DuckDB rendering of the same
  * semantics for the pure-tabular subset — so one random query has
  * three executable forms: `Pql.query` (Catalyst plan),
  * `Pql.compileToSql` (Spark SQL text), and a DuckDB oracle.
  *
  * Determinism rules the generator enforces so a multiset compare is
  * sound across engines and plans:
  *   - `take`/`top` truncate only under a TOTAL order (sort terms end
  *     with the tracked unique tiebreak columns), or with a row count
  *     above any reachable intermediate size;
  *   - no `now()`/`ago()` (wall-clock) and no non-deterministic
  *     functions;
  *   - division only by non-zero literals (DuckDB errors on x/0 where
  *     Spark yields null);
  *   - string casts only from integral types (double→string renders
  *     differently across engines);
  *   - sort terms / group keys always reference at least one column
  *     (a bare integer literal is an ORDINAL in SQL text but a
  *     constant in the plan path — not a common subset).
  *
  * Semantics encoded in the DuckDB rendering (mirrors
  * [[graft.compiler.Exprs]] — reference semantics, pql.go:563-1054):
  * `==`/`!=` are null→FALSE (`COALESCE(x = y, FALSE)`), `=~` compares
  * lowercased, `iff` coalesces its condition, `countif` counts
  * null-as-false, `strcat` is null-propagating (DuckDB `||`, NOT its
  * null-ignoring `concat()`), innerunique DISTINCTs the left side
  * first, and colliding right-side join columns are renamed
  * `$right.<name>` (Compiler.compileJoin).
  */
object PipelineGen {

  def apply(seed: Long): GenQuery = new PipelineGen(seed).generate()

  /** Every-seed extension-anchored pipeline (see
    * [[PipelineGen!.generateExtensionQuery]]).
    */
  def extension(seed: Long, takeAllRows: Int = 2000000): GenQuery =
    new PipelineGen(seed, takeAllRows).generateExtensionQuery()

  /** Generate with an explicit `take`-no-op bound — REQUIRED above
    * sf0.01: the bound must exceed every reachable intermediate row
    * count or truncating takes slice engine-dependently (the sf0.1
    * campaign's events self-join reaches 6.77M rows; seeds 10/511
    * diffed against the default 2M bound before this knob existed).
    * The bound only changes the emitted `take N` literal, not the
    * random stream — same seed, same pipeline shape at any bound.
    */
  def apply(seed: Long, takeAllRows: Int): GenQuery =
    new PipelineGen(seed, takeAllRows).generate()

  /** A stream-safe pipeline for the streaming differential fuzz
    * (StreamFuzzSpec / graft.fuzz.StreamFuzz).
    */
  def stream(seed: Long): StreamGenQuery = new PipelineGen(seed).generateStream()

  // ---- schema model ----------------------------------------------------

  sealed trait Kind
  case object KInt extends Kind
  case object KLong extends Kind
  case object KDouble extends Kind
  case object KStr extends Kind
  case object KTs extends Kind
  case object KBool extends Kind

  /** Opaque (array) columns ride through `*` but are not usable in
    * generated scalar expressions.
    */
  case object KOther extends Kind

  final case class Col(name: String, kind: Kind)

  /** @param tiebreak column names whose COMBINATION is unique across
    *                 rows (empty when uniqueness was lost — e.g. a
    *                 project that dropped the key)
    */
  final case class Schema(cols: Vector[Col], tiebreak: List[String]) {
    def names: Set[String] = cols.map(_.name).toSet
    def of(kinds: Set[Kind]): Vector[Col] = cols.filter(c => kinds(c.kind))
  }

  private[fuzz] val numKinds: Set[Kind] = Set(KInt, KLong, KDouble)

  /** The driver's test tables (TESTDATA.md — stable across rounds). */
  val tables: Map[String, Schema] = Map(
    "region" -> Schema(
      Vector(Col("r_regionkey", KInt), Col("r_name", KStr)),
      List("r_regionkey")),
    "nation" -> Schema(
      Vector(Col("n_nationkey", KInt), Col("n_name", KStr), Col("n_regionkey", KInt)),
      List("n_nationkey")),
    "customer" -> Schema(
      Vector(Col("c_custkey", KLong), Col("c_name", KStr), Col("c_nationkey", KInt),
        Col("c_acctbal", KDouble), Col("c_mktsegment", KStr)),
      List("c_custkey")),
    "supplier" -> Schema(
      Vector(Col("s_suppkey", KLong), Col("s_name", KStr), Col("s_nationkey", KInt),
        Col("s_acctbal", KDouble)),
      List("s_suppkey")),
    "part" -> Schema(
      Vector(Col("p_partkey", KLong), Col("p_name", KStr), Col("p_brand", KStr),
        Col("p_type", KStr), Col("p_size", KInt), Col("p_retailprice", KDouble)),
      List("p_partkey")),
    "orders" -> Schema(
      Vector(Col("o_orderkey", KLong), Col("o_custkey", KLong), Col("o_orderstatus", KStr),
        Col("o_totalprice", KDouble), Col("o_orderdate", KTs), Col("o_orderpriority", KStr)),
      List("o_orderkey")),
    "lineitem" -> Schema(
      Vector(Col("l_orderkey", KLong), Col("l_partkey", KLong), Col("l_suppkey", KLong),
        Col("l_linenumber", KInt), Col("l_quantity", KDouble), Col("l_extendedprice", KDouble),
        Col("l_discount", KDouble), Col("l_tax", KDouble), Col("l_returnflag", KStr),
        Col("l_linestatus", KStr), Col("l_shipdate", KTs)),
      // NO tiebreak: the driver's lineitem has DUPLICATE
      // (l_orderkey, l_linenumber) pairs at every SF (max ×6 at
      // sf0.01) — found by this fuzzer's own sf0.01 DuckDB leg, seed
      // 316: a take-3 boundary tie selected engine-dependently. A
      // truncating take over lineitem is only sound at take-all size.
      Nil),
    "events" -> Schema(
      Vector(Col("event_id", KLong), Col("ts", KTs), Col("user_id", KLong),
        Col("event_type", KStr), Col("value", KDouble), Col("props", KStr)),
      List("event_id")),
    "documents" -> Schema(
      Vector(Col("doc_id", KLong), Col("text", KStr), Col("lang", KStr),
        Col("source", KStr), Col("n_chars", KLong)),
      List("doc_id")),
    "embeddings" -> Schema(
      Vector(Col("vec_id", KLong), Col("embedding", KOther), Col("label", KInt)),
      List("vec_id"))
  )

  /** The streaming-fuzz catalog's table schemas: documents and
    * embeddings carry the event-time column the harness synthesizes
    * (StreamFuzz.prepare — ts from the id, same formula as the
    * stream_dedup_* gate entries); events has a real one.
    */
  private[fuzz] val streamTables: Map[String, Schema] = Map(
    "documents" -> Schema(tables("documents").cols :+ Col("ts", KTs), List("doc_id")),
    "events" -> tables("events"),
    "embeddings" -> Schema(tables("embeddings").cols :+ Col("ts", KTs), List("vec_id"))
  )

  /** Per-column literal pools — values that actually occur, so string
    * equality / IN predicates are selective rather than vacuous.
    */
  private[fuzz] val strPools: Map[String, Vector[String]] = Map(
    "l_returnflag" -> Vector("A", "N", "R"),
    "l_linestatus" -> Vector("F", "O"),
    "o_orderstatus" -> Vector("F", "O", "P"),
    "o_orderpriority" -> Vector("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"),
    "c_mktsegment" -> Vector("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
    "event_type" -> Vector("click", "error", "purchase", "signup", "view"),
    "lang" -> Vector("de", "en", "es", "fr", "zh"),
    "source" -> Vector("src0", "src1", "src3", "src7", "src12"),
    "r_name" -> Vector("ASIA", "EUROPE", "AMERICA"),
    "p_brand" -> Vector("Brand#11", "Brand#13", "Brand#22", "Brand#34")
  )

  private val tsPool = Vector(
    "1995-06-17 00:00:00", "1996-01-01 00:00:00", "1997-07-04 12:00:00",
    "1998-11-30 00:00:00", "2024-01-05 00:00:00", "2024-01-15 06:30:00",
    "2024-01-25 18:00:00")

  /** Equi-join relations, keyed by the LEFT column that must still be
    * in scope (the right side is always a fresh sub-pipeline).
    * `fanout` marks one-to-many rels (row-multiplying) so the
    * generator can bound intermediate sizes.
    */
  private final case class Rel(
      leftKey: String, rightTable: String, rightKey: String, fanout: Boolean)
  private val rels = Vector(
    Rel("o_custkey", "customer", "c_custkey", fanout = false),
    Rel("l_orderkey", "orders", "o_orderkey", fanout = false),
    Rel("l_partkey", "part", "p_partkey", fanout = false),
    Rel("l_suppkey", "supplier", "s_suppkey", fanout = false),
    Rel("c_nationkey", "nation", "n_nationkey", fanout = false),
    Rel("s_nationkey", "nation", "n_nationkey", fanout = false),
    Rel("n_regionkey", "region", "r_regionkey", fanout = false),
    Rel("user_id", "events", "user_id", fanout = true),
    Rel("c_custkey", "orders", "o_custkey", fanout = true),
    Rel("doc_id", "embeddings", "vec_id", fanout = false)
  )

  /** PQL keywords and operator names an unquoted identifier must not
    * collide with (quote instead).
    */
  private val keywords = Set(
    "where", "filter", "project", "extend", "summarize", "sort", "order", "take",
    "limit", "top", "count", "join", "as", "render", "let", "by", "on", "kind",
    "and", "or", "in", "true", "false", "null", "not", "asc", "desc", "nulls",
    "first", "last", "dedup", "sample", "decontam", "chunk", "pack", "ann",
    "against", "budget", "with", "between")

  private val identRe = "[A-Za-z_][A-Za-z_0-9]*".r
}

final class PipelineGen(seed: Long, takeAllRows: Int = 2000000) {
  import PipelineGen._

  private val rnd = new Random(seed)

  /** True while every construct so far has an exact DuckDB rendering. */
  private var duckOk = true
  /** False once an operator only `Pql.query` can run is emitted. */
  private var emittable = true
  private var nameSeq = 0
  private def fresh(prefix: String): String = { nameSeq += 1; s"$prefix$nameSeq" }

  /** `let` bindings: name → (pql literal text, duck literal text, kind).
    * A let may deliberately SHADOW a column name — unquoted references
    * then resolve to the let (reference scope rules), quoted ones to
    * the column.
    */
  private val lets = mutable.LinkedHashMap[String, (String, String, Kind)]()

  /** `| as Name` stages available for reuse as a join right side:
    * name → (schema, duck SQL of the stage).
    */
  private val asStages = mutable.LinkedHashMap[String, (Schema, String)]()

  // ---- identifier rendering -------------------------------------------

  private def pqlIdent(name: String): String =
    if (identRe.matches(name) && !keywords(name) && !lets.contains(name)) name
    else "`" + name.replace("`", "``") + "`"

  private def duckIdent(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** A typed expression: PQL text, DuckDB text, result kind. */
  private final case class Ex(pql: String, duck: String, kind: Kind)

  private def colRef(c: Col): Ex = Ex(pqlIdent(c.name), duckIdent(c.name), c.kind)

  // ---- literals ---------------------------------------------------------

  private def intLit(): Ex = {
    val v = rnd.nextInt(5) match {
      case 0 => rnd.nextInt(5)
      case 1 => rnd.nextInt(50)
      case 2 => rnd.nextInt(1000)
      case 3 => rnd.nextInt(100000)
      case _ => Vector(0, 1, 2, 7, 10, 42)(rnd.nextInt(6))
    }
    Ex(v.toString, v.toString, KInt)
  }

  private def doubleLit(): Ex = {
    val v = Vector("0.5", "1.5", "2.25", "100.0", "0.1", "2500.75", "9.99")(rnd.nextInt(7))
    Ex(v, v, KDouble)
  }

  private def strLitFor(schema: Schema): Ex = {
    val pooled = schema.cols.collect { case Col(n, KStr) if strPools.contains(n) => n }
    val v =
      if (pooled.nonEmpty && rnd.nextBoolean()) {
        val pool = strPools(pooled(rnd.nextInt(pooled.size)))
        pool(rnd.nextInt(pool.size))
      } else Vector("en", "x", "Brand#11", "click", "ASIA", "a b", "Z")(rnd.nextInt(7))
    Ex("\"" + v + "\"", "'" + v.replace("'", "''") + "'", KStr)
  }

  private def tsLit(): Ex = {
    val v = tsPool(rnd.nextInt(tsPool.size))
    Ex(s"""todatetime("$v")""", s"TIMESTAMP '$v'", KTs)
  }

  // ---- typed expression generation --------------------------------------

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  private def numCols(s: Schema): Vector[Col] = s.of(numKinds)
  private def strCols(s: Schema): Vector[Col] = s.of(Set(KStr))
  private def tsCols(s: Schema): Vector[Col] = s.of(Set(KTs))

  /** Let bindings of the given kinds, as atoms. */
  private def letAtoms(kinds: Set[Kind]): Vector[Ex] =
    lets.collect { case (n, (_, duck, k)) if kinds(k) => Ex(n, duck, k) }.toVector

  private def numAtom(s: Schema): Ex = {
    val cols = numCols(s)
    val atoms = letAtoms(numKinds)
    rnd.nextInt(4) match {
      case 0 | 1 if cols.nonEmpty => colRef(pick(cols))
      case 2 if atoms.nonEmpty    => pick(atoms)
      case 3                      => if (rnd.nextBoolean()) doubleLit() else intLit()
      case _ if cols.nonEmpty     => colRef(pick(cols))
      case _                      => intLit()
    }
  }

  private def widen(a: Kind, b: Kind): Kind =
    if (a == KDouble || b == KDouble) KDouble
    else if (a == KLong || b == KLong) KLong
    else KInt

  private def genNum(s: Schema, depth: Int): Ex =
    if (depth <= 0) numAtom(s)
    else rnd.nextInt(10) match {
      case 0 | 1 | 2 => numAtom(s)
      case 3 =>
        val (x, y) = (genNum(s, depth - 1), numAtom(s))
        val op = pick(Seq("+", "-"))
        Ex(s"(${x.pql} $op ${y.pql})", s"(${x.duck} $op ${y.duck})", widen(x.kind, y.kind))
      case 4 =>
        // multiply by a small literal (keeps values in range)
        val x = numAtom(s)
        val m = rnd.nextInt(9) + 2
        Ex(s"(${x.pql} * $m)", s"(${x.duck} * $m)", x.kind)
      case 5 =>
        // divide by a NON-ZERO literal only: Spark yields null on /0,
        // DuckDB errors — zero divisors are outside the common subset
        val x = genNum(s, depth - 1)
        val d = rnd.nextInt(9) + 2
        Ex(s"(${x.pql} / $d)", s"(${x.duck} / $d)", KDouble)
      case 6 =>
        // modulo on integral kinds (both engines: sign of the dividend)
        val ints = s.cols.filter(c => c.kind == KInt || c.kind == KLong)
        if (ints.isEmpty) numAtom(s)
        else {
          val x = colRef(pick(ints))
          val m = rnd.nextInt(19) + 2
          Ex(s"(${x.pql} % $m)", s"(${x.duck} % $m)", x.kind)
        }
      case 7 =>
        val str = strCols(s)
        if (str.isEmpty) numAtom(s)
        else {
          val x = colRef(pick(str))
          Ex(s"strlen(${x.pql})", s"length(${x.duck})", KInt)
        }
      case 8 =>
        val b = genBool(s, depth - 1)
        val (t, e) = (numAtom(s), numAtom(s))
        Ex(
          s"iff(${b.pql}, ${t.pql}, ${e.pql})",
          s"(CASE WHEN COALESCE(${b.duck}, FALSE) THEN ${t.duck} ELSE ${e.duck} END)",
          widen(t.kind, e.kind))
      case _ =>
        val x = genNum(s, depth - 1)
        Ex(s"(- ${x.pql})", s"(- ${x.duck})", x.kind)
    }

  private def genStr(s: Schema, depth: Int): Ex = {
    val cols = strCols(s)
    if (depth <= 0 || cols.isEmpty)
      return if (cols.nonEmpty && rnd.nextBoolean()) colRef(pick(cols)) else strLitFor(s)
    rnd.nextInt(8) match {
      case 0 | 1 | 2 => colRef(pick(cols))
      case 3         => strLitFor(s)
      case 4 =>
        val x = genStr(s, depth - 1)
        val y = if (rnd.nextBoolean()) colRef(pick(cols)) else strLitFor(s)
        // strcat ≡ concat: null-propagating — DuckDB's || matches
        // (its concat() function IGNORES nulls; do not use it here)
        Ex(s"strcat(${x.pql}, ${y.pql})", s"(${x.duck} || ${y.duck})", KStr)
      case 5 =>
        val x = genStr(s, depth - 1)
        val f = pick(Seq("tolower", "toupper"))
        val d = if (f == "tolower") "lower" else "upper"
        Ex(s"$f(${x.pql})", s"$d(${x.duck})", KStr)
      case 6 =>
        // tostring of INTEGRAL values only (double/timestamp casts
        // format differently across engines)
        val ints = s.cols.filter(c => c.kind == KInt || c.kind == KLong)
        if (ints.isEmpty) colRef(pick(cols))
        else {
          val x = colRef(pick(ints))
          Ex(s"tostring(${x.pql})", s"CAST(${x.duck} AS VARCHAR)", KStr)
        }
      case _ =>
        // substring: 1-based with the same clamping in both engines
        val x = colRef(pick(cols))
        val start = rnd.nextInt(3) + 1
        val len = rnd.nextInt(6) + 1
        Ex(s"substring(${x.pql}, $start, $len)", s"substring(${x.duck}, $start, $len)", KStr)
    }
  }

  private def tsExpr(s: Schema): Ex = {
    val cols = tsCols(s)
    if (cols.isEmpty) tsLit()
    else {
      val c = colRef(pick(cols))
      if (rnd.nextInt(3) == 0) {
        val (dur, ms) = pick(Seq(("15m", 900000L), ("1h", 3600000L), ("1d", 86400000L)))
        Ex(
          s"""bin(${c.pql}, "$dur")""",
          s"make_timestamp((epoch_ms(${c.duck}) - epoch_ms(${c.duck}) % $ms) * 1000)",
          KTs)
      } else c
    }
  }

  private def genBool(s: Schema, depth: Int): Ex = {
    def cmp(): Ex = rnd.nextInt(6) match {
      case 0 | 1 =>
        // numeric comparison (null → null → false under WHERE)
        val x = genNum(s, math.max(depth - 1, 0))
        val y = numAtom(s)
        val op = pick(Seq("<", "<=", ">", ">="))
        Ex(s"(${x.pql} $op ${y.pql})", s"(${x.duck} $op ${y.duck})", KBool)
      case 2 =>
        // ==/!= : reference semantics null→FALSE — COALESCE in DuckDB
        val cols = strCols(s)
        val (x, y) =
          if (cols.nonEmpty && rnd.nextBoolean()) (colRef(pick(cols)), strLitFor(s))
          else (genNum(s, math.max(depth - 1, 0)), numAtom(s))
        val eq = rnd.nextBoolean()
        val op = if (eq) "==" else "!="
        val dop = if (eq) "=" else "<>"
        Ex(s"(${x.pql} $op ${y.pql})", s"COALESCE((${x.duck} $dop ${y.duck}), FALSE)", KBool)
      case 3 =>
        // =~ / !~ : case-insensitive — plain equality on lowercased
        // forms (null → null, NOT coalesced: Exprs.scala CiEq)
        val cols = strCols(s)
        if (cols.isEmpty) {
          val x = numAtom(s)
          Ex(s"isnotnull(${x.pql})", s"(${x.duck} IS NOT NULL)", KBool)
        } else {
          val x = colRef(pick(cols))
          val y = strLitFor(s)
          val ci = rnd.nextBoolean()
          val op = if (ci) "=~" else "!~"
          val dop = if (ci) "=" else "<>"
          Ex(s"(${x.pql} $op ${y.pql})", s"(lower(${x.duck}) $dop lower(${y.duck}))", KBool)
        }
      case 4 =>
        // IN over a literal pool (SQL three-valued IN in both engines)
        val cols = strCols(s).filter(c => strPools.contains(c.name))
        if (cols.nonEmpty) {
          val c = pick(cols)
          val pool = strPools(c.name)
          val n = rnd.nextInt(math.min(3, pool.size)) + 1
          val vals = rnd.shuffle(pool).take(n)
          Ex(
            s"(${pqlIdent(c.name)} in (${vals.map("\"" + _ + "\"").mkString(", ")}))",
            s"(${duckIdent(c.name)} IN (${vals.map("'" + _ + "'").mkString(", ")}))",
            KBool)
        } else {
          val ints = s.cols.filter(c => c.kind == KInt || c.kind == KLong)
          if (ints.isEmpty) cmp()
          else {
            val c = pick(ints)
            val vals = Vector.fill(rnd.nextInt(3) + 1)(rnd.nextInt(20))
            Ex(
              s"(${pqlIdent(c.name)} in (${vals.mkString(", ")}))",
              s"(${duckIdent(c.name)} IN (${vals.mkString(", ")}))",
              KBool)
          }
        }
      case _ =>
        // timestamp comparison
        val cols = tsCols(s)
        if (cols.isEmpty) cmp()
        else {
          val x = colRef(pick(cols))
          val y = if (rnd.nextInt(4) == 0) tsExpr(s) else tsLit()
          val op = pick(Seq("<", "<=", ">", ">="))
          Ex(s"(${x.pql} $op ${y.pql})", s"(${x.duck} $op ${y.duck})", KBool)
        }
    }
    if (depth <= 0) cmp()
    else rnd.nextInt(8) match {
      case 0 =>
        val (x, y) = (genBool(s, depth - 1), genBool(s, depth - 1))
        val op = pick(Seq("and", "or"))
        Ex(s"(${x.pql} $op ${y.pql})", s"(${x.duck} ${op.toUpperCase} ${y.duck})", KBool)
      case 1 =>
        val x = genBool(s, depth - 1)
        Ex(s"not(${x.pql})", s"(NOT ${x.duck})", KBool)
      case 2 =>
        val usable = s.cols.filter(_.kind != KOther)
        if (usable.isEmpty) cmp()
        else {
          val c = colRef(pick(usable))
          val f = if (rnd.nextBoolean()) ("isnull", "IS NULL") else ("isnotnull", "IS NOT NULL")
          Ex(s"${f._1}(${c.pql})", s"(${c.duck} ${f._2})", KBool)
        }
      case _ => cmp()
    }
  }

  // ---- aggregate generation ----------------------------------------------

  /** One named aggregate; returns (name, pql `n = agg`, duck `agg AS "n"`, kind). */
  private def genAgg(s: Schema): (String, String, String, Kind) = {
    val name = fresh("a")
    rnd.nextInt(6) match {
      case 0 =>
        (name, s"$name = count()", s"count(*) AS ${duckIdent(name)}", KLong)
      case 1 =>
        val p = genBool(s, 1)
        (name, s"$name = countif(${p.pql})",
          s"count(*) FILTER (WHERE COALESCE(${p.duck}, FALSE)) AS ${duckIdent(name)}", KLong)
      case 2 =>
        val x = genNum(s, 1)
        val k = if (x.kind == KDouble) KDouble else KLong
        (name, s"$name = sum(${x.pql})", s"sum(${x.duck}) AS ${duckIdent(name)}", k)
      case 3 =>
        val x = genNum(s, 1)
        (name, s"$name = avg(${x.pql})", s"avg(${x.duck}) AS ${duckIdent(name)}", KDouble)
      case _ =>
        val f = if (rnd.nextBoolean()) "min" else "max"
        val usable = s.cols.filter(_.kind != KOther)
        if (usable.isEmpty) (name, s"$name = count()", s"count(*) AS ${duckIdent(name)}", KLong)
        else {
          val c = colRef(pick(usable))
          (name, s"$name = $f(${c.pql})", s"$f(${c.duck}) AS ${duckIdent(name)}", c.kind)
        }
    }
  }

  // ---- pipeline state ---------------------------------------------------

  private val pqlPrefix = mutable.ArrayBuffer[String]() // let statements
  private val pqlOps = mutable.ArrayBuffer[String]()
  private var baseTable: String = _
  private var schema: Schema = _
  private var duck: String = _
  private var joinCount = 0
  private var selfJoined = false

  private def addOp(pqlText: String, duckWrapped: String, newSchema: Schema): Unit = {
    pqlOps += pqlText
    duck = duckWrapped
    schema = newSchema
  }

  /** Row-count ceiling no generated pipeline can exceed at the fuzz
    * scale factor — `take` below a total order uses this to stay a
    * no-op. The default covers sf0.001/sf0.01; bigger SFs pass a
    * bigger bound (companion apply overload): the dominating
    * intermediate is the events self-join (sum of per-user count², =
    * 6.77M at sf0.1, ~68M at sf1).
    */
  private val takeAll = takeAllRows

  // ---- operators ----------------------------------------------------------

  private def opWhere(): Unit = {
    val p = genBool(schema, 2)
    addOp(s"where ${p.pql}", s"SELECT * FROM ($duck) WHERE ${p.duck}", schema)
  }

  private def opExtend(): Unit = {
    val n = rnd.nextInt(2) + 1
    val items = Vector.fill(n) {
      val name = fresh("x")
      val e = rnd.nextInt(4) match {
        case 0 => genStr(schema, 2)
        case 1 => tsExpr(schema)
        case _ => genNum(schema, 2)
      }
      (name, e)
    }
    val pqlTxt = items.map { case (n0, e) => s"$n0 = ${e.pql}" }.mkString("extend ", ", ", "")
    val duckTxt = s"SELECT *, ${items
        .map { case (n0, e) => s"${e.duck} AS ${duckIdent(n0)}" }
        .mkString(", ")} FROM ($duck)"
    addOp(pqlTxt, duckTxt,
      Schema(schema.cols ++ items.map { case (n0, e) => Col(n0, e.kind) }, schema.tiebreak))
  }

  private def opProject(): Unit = {
    val usable = schema.cols.filter(_.kind != KOther)
    if (usable.isEmpty) return
    // keep-probability high enough that tiebreak columns usually survive
    val kept0 = usable.filter(_ => rnd.nextInt(10) < 7)
    val kept = if (kept0.isEmpty) Vector(pick(usable)) else kept0
    // name, pql item, duck item, kind, valueIntact (same values as source col)
    val items = mutable.ArrayBuffer[(String, String, String, Kind, Boolean)]()
    kept.foreach { c =>
      rnd.nextInt(10) match {
        case 0 =>
          // rename (value-preserving; pqlIdent quotes if a let shadows,
          // which still reaches the COLUMN, keeping values intact)
          val n0 = fresh("r")
          items += ((n0, s"$n0 = ${pqlIdent(c.name)}",
            s"${duckIdent(c.name)} AS ${duckIdent(n0)}", c.kind, true))
        case 1 | 2 =>
          // bare unquoted name: resolves through the EXPRESSION path,
          // so a shadowing let wins over the column (reference scope)
          lets.get(c.name) match {
            case Some((_, duckLit, k)) =>
              items += ((c.name, c.name, s"$duckLit AS ${duckIdent(c.name)}", k, false))
            case None =>
              items += ((c.name, pqlIdent(c.name),
                s"${duckIdent(c.name)} AS ${duckIdent(c.name)}", c.kind, true))
          }
        case _ =>
          items += ((c.name, pqlIdent(c.name),
            s"${duckIdent(c.name)} AS ${duckIdent(c.name)}", c.kind, true))
      }
    }
    val renamed: Map[String, String] = kept.zip(items).collect {
      case (c, (outName, _, _, _, intact)) if intact => c.name -> outName
    }.toMap
    // optionally one computed column
    if (rnd.nextInt(3) == 0) {
      val n0 = fresh("p")
      val e = if (rnd.nextBoolean()) genNum(schema, 2) else genStr(schema, 2)
      items += ((n0, s"$n0 = ${e.pql}", s"${e.duck} AS ${duckIdent(n0)}", e.kind, false))
    }
    // tiebreak survives only if every tiebreak column was kept value-intact
    val tb =
      if (schema.tiebreak.nonEmpty && schema.tiebreak.forall(renamed.contains))
        schema.tiebreak.map(renamed)
      else Nil
    addOp(
      items.map(_._2).mkString("project ", ", ", ""),
      s"SELECT ${items.map(_._3).mkString(", ")} FROM ($duck)",
      Schema(items.map(i => Col(i._1, i._4)).toVector, tb))
  }

  /** A sort term must be anchored on a COLUMN reference: a bare
    * integer literal (or a let that folds to one) is an ORDINAL in
    * ORDER BY — Spark's SubstituteUnresolvedOrdinals rewrites integer
    * literals in Sort even on the DataFrame path — so constants are
    * not a safe sort term. Built from an explicit colRef, never a
    * free expression.
    */
  private def colAnchoredNum(s: Schema): Option[Ex] = {
    val cols = numCols(s)
    if (cols.isEmpty) None
    else {
      val c = colRef(pick(cols))
      rnd.nextInt(4) match {
        case 0 if c.kind != KDouble =>
          val m = rnd.nextInt(19) + 2
          Some(Ex(s"(${c.pql} % $m)", s"(${c.duck} % $m)", c.kind))
        case 1 =>
          val m = rnd.nextInt(9) + 2
          Some(Ex(s"(${c.pql} * $m)", s"(${c.duck} * $m)", c.kind))
        case _ => Some(c)
      }
    }
  }

  private def opSummarize(): Unit = {
    val nKeys = rnd.nextInt(3)
    val nAggs = if (nKeys == 0) rnd.nextInt(2) + 1 else rnd.nextInt(3)
    val keys = Vector.fill(nKeys) {
      val groupable = schema.cols.filter(c => c.kind == KStr || c.kind == KInt || c.kind == KLong)
      if (groupable.nonEmpty && rnd.nextInt(4) > 0) {
        val c = pick(groupable)
        if (pqlIdent(c.name) == c.name)
          (c.name, c.name, duckIdent(c.name), c.kind) // bare key keeps its name
        else if (identRe.matches(c.name) && !keywords(c.name))
          // a quoting-required BARE key would be NAMED by its raw
          // source text INCLUDING the quote marks (reference behavior,
          // pql.go:405 — graft matches); use the named form so the
          // tracked schema name stays clean
          (c.name, s"${c.name} = ${pqlIdent(c.name)}", duckIdent(c.name), c.kind)
        else {
          val n0 = fresh("k")
          (n0, s"$n0 = ${pqlIdent(c.name)}", duckIdent(c.name), c.kind)
        }
      } else {
        val n0 = fresh("k")
        val e = rnd.nextInt(3) match {
          case 0 => tsExpr(schema)
          case 1 => genStr(schema, 1)
          case _ => colAnchoredNum(schema).getOrElse(genStr(schema, 1))
        }
        (n0, s"$n0 = ${e.pql}", e.duck, e.kind)
      }
    }.distinctBy(_._1)
    val aggs = Vector.fill(nAggs)(genAgg(schema))
    if (keys.isEmpty && aggs.isEmpty) return
    val pqlTxt =
      if (aggs.isEmpty) s"summarize by ${keys.map(_._2).mkString(", ")}"
      else if (keys.isEmpty) s"summarize ${aggs.map(_._2).mkString(", ")}"
      else s"summarize ${aggs.map(_._2).mkString(", ")} by ${keys.map(_._2).mkString(", ")}"
    val duckKeys = keys.map(k => s"${k._3} AS ${duckIdent(k._1)}")
    val duckTxt =
      if (aggs.isEmpty) s"SELECT DISTINCT ${duckKeys.mkString(", ")} FROM ($duck)"
      else if (keys.isEmpty) s"SELECT ${aggs.map(_._3).mkString(", ")} FROM ($duck)"
      else
        s"SELECT ${(duckKeys ++ aggs.map(_._3)).mkString(", ")} FROM ($duck) " +
          s"GROUP BY ${keys.indices.map(_ + 1).mkString(", ")}"
    val outCols = keys.map(k => Col(k._1, k._4)) ++ aggs.map(a => Col(a._1, a._4))
    // group keys are unique in combination; a keyless aggregate is one row
    val tb = if (keys.nonEmpty) keys.map(_._1).toList else aggs.map(_._1).toList
    addOp(pqlTxt, duckTxt, Schema(outCols, tb))
  }

  private def sortTermFor(e: Ex): (String, String) = {
    val asc = rnd.nextBoolean()
    // PQL defaults: desc→nulls last, asc→nulls first (Parser.scala:329)
    if (asc) (e.pql + " asc", e.duck + " ASC NULLS FIRST")
    else (e.pql + " desc", e.duck + " DESC NULLS LAST")
  }

  /** Mid-pipeline sort: order is not observable through a multiset
    * compare — exercises the SQL backend's ORDER BY stage emission.
    */
  private def opSort(): Unit = {
    val term = colAnchoredNum(schema).orElse {
      val s = strCols(schema)
      if (s.nonEmpty) Some(colRef(pick(s))) else None
    }
    term.foreach { e =>
      val (p, d) = sortTermFor(e)
      addOp(s"sort by $p", s"SELECT * FROM ($duck) ORDER BY $d", schema)
    }
  }

  /** Total-order sort + small take: the ONLY truncating form the
    * multiset compare is sound for — terms end with the tracked
    * unique tiebreak columns.
    */
  private def opSortTake(): Unit = {
    if (schema.tiebreak.isEmpty) { opTakeAll(); return }
    val leading = if (rnd.nextBoolean()) colAnchoredNum(schema).toList else Nil
    val terms = leading ++
      schema.tiebreak.map(t => Ex(pqlIdent(t), duckIdent(t), KOther))
    val rendered = terms.map(sortTermFor)
    val n = rnd.nextInt(20) + 1
    val (nPql, nDuck) =
      if (rnd.nextInt(4) == 0) {
        // row count through a let binding (AST constant-folding path);
        // a let AFTER the query would be out of scope — prefix only
        val ln = fresh("lim")
        lets(ln) = (n.toString, n.toString, KInt)
        pqlPrefix += s"let $ln = $n;"
        (ln, n.toString)
      } else (n.toString, n.toString)
    addOp(
      s"sort by ${rendered.map(_._1).mkString(", ")} | take $nPql",
      s"SELECT * FROM ($duck) ORDER BY ${rendered.map(_._2).mkString(", ")} LIMIT $nDuck",
      schema)
  }

  /** `take` above any reachable row count — deterministic no-op. */
  private def opTakeAll(): Unit =
    addOp(s"take $takeAll", s"SELECT * FROM ($duck) LIMIT $takeAll", schema)

  private def opTop(): Unit = {
    if (schema.tiebreak.size != 1) { opSortTake(); return }
    val t = schema.tiebreak.head
    val n = rnd.nextInt(15) + 1
    val asc = rnd.nextBoolean()
    val (pqlDir, duckDir) = if (asc) (" asc", " ASC NULLS FIRST") else ("", " DESC NULLS LAST")
    addOp(
      s"top $n by ${pqlIdent(t)}$pqlDir",
      s"SELECT * FROM ($duck) ORDER BY ${duckIdent(t)}$duckDir LIMIT $n",
      schema)
  }

  private def opCount(): Unit =
    addOp("count", s"""SELECT count(*) AS "count()" FROM ($duck)""",
      Schema(Vector(Col("count()", KLong)), List("count()")))

  /** `| as Name` — remember the stage for a later named-join reuse. */
  private def opAs(): Unit = {
    val name = fresh("St")
    asStages(name) = (schema, duck)
    addOp(s"as $name", duck, schema)
  }

  // ---- join ----------------------------------------------------------------

  private def opJoin(): Boolean = {
    if (joinCount >= 2) return false
    val candidates = rels.filter { r =>
      schema.names.contains(r.leftKey) &&
        // at most one row-multiplying join per pipeline, and never two
        // self-joins (bounds the collect size at fuzz scale)
        (!r.fanout || (!selfJoined && joinCount == 0))
    }
    val named = asStages.toVector
    // a named stage re-join is a self-join — same fanout bound
    val useNamed = named.nonEmpty && !selfJoined && rnd.nextInt(5) == 0
    if (candidates.isEmpty && !useNamed) return false

    val flavor = rnd.nextInt(10) match {
      case 0 | 1 | 2 => "inner"
      case 3 | 4     => "leftouter"
      case 5 | 6     => "innerunique"
      case _         => "" // bare join — reference default innerunique
    }
    val flavorTxt = if (flavor.isEmpty) "" else s" kind=$flavor"
    val effective = if (flavor.isEmpty) "innerunique" else flavor

    // right side: a named `as` stage or a fresh mini-pipeline
    val picked: Option[(String, String, Schema, String, String)] =
      if (useNamed) {
        val (name, (sch, dsql)) = pick(named)
        // the bare `on k` shorthand needs a PLAIN identifier that no
        // let shadows (a shadowed name resolves to the let in a join
        // condition and is no longer the column shorthand)
        sch.cols.find(c =>
          schema.names.contains(c.name) && c.kind != KOther && c.kind != KDouble &&
            c.kind != KTs && identRe.matches(c.name) && !keywords(c.name) &&
            !lets.contains(c.name))
          .map { k =>
            selfJoined = true
            (s"($name)", dsql, sch, k.name,
              s"lj.${duckIdent(k.name)} = rj.${duckIdent(k.name)}")
          }
      } else {
        val rel = pick(candidates)
        if (rel.fanout) selfJoined = true
        val sub = new PipelineGen(rnd.nextLong(), takeAllRows)
        // the right side compiles in the PARENT query's scope: the
        // sub-generator must know the parent's lets so shadowed names
        // render quoted (column) rather than silently rebinding; the
        // fresh-name counter is shared so a right-side x2 can never
        // collide with a later parent x2 (duplicate-column ambiguity)
        sub.lets ++= lets
        sub.nameSeq = nameSeq
        val (subPql, subDuck, subSchema) = sub.generateMini(rel.rightTable, rel.rightKey)
        nameSeq = sub.nameSeq
        if (!sub.duckOk) duckOk = false
        val cp =
          if (rel.leftKey == rel.rightKey && !lets.contains(rel.leftKey) && rnd.nextBoolean())
            rel.leftKey
          else s"$$left.${pqlIdent(rel.leftKey)} == $$right.${pqlIdent(rel.rightKey)}"
        val cd = s"lj.${duckIdent(rel.leftKey)} = rj.${duckIdent(rel.rightKey)}"
        Some((s"($subPql)", subDuck, subSchema, cp, cd))
      }
    val (rightPql, rightDuck, rightSchema, condPql, condDuck) = picked match {
      case Some(t) => t
      case None    => return false
    }

    // optional extra one-side conjunct: join conditions are a
    // COMMA-separated list (an `and` would glue onto a bare-column
    // shorthand and change its meaning); rides the JOIN condition, so
    // it sits in the duck ON clause too — matters for leftouter
    val (extraPql, extraDuck) = {
      val nums = rightSchema.of(numKinds)
      if (rnd.nextInt(5) == 0 && nums.nonEmpty) {
        val c = pick(nums)
        val lit0 = intLit()
        val op = pick(Seq(">", "<", ">="))
        (s", $$right.${pqlIdent(c.name)} $op ${lit0.pql}",
          s" AND rj.${duckIdent(c.name)} $op ${lit0.duck}")
      } else ("", "")
    }

    val joinTypeDuck = if (effective == "leftouter") "LEFT JOIN" else "JOIN"
    val leftDuck = if (effective == "innerunique") s"SELECT DISTINCT * FROM ($duck)" else duck

    // output schema: left columns, then right columns with collisions
    // renamed `$right.<name>` (Compiler.compileJoin)
    val taken = schema.names
    val rightOut = rightSchema.cols.map { c =>
      (c, if (taken.contains(c.name)) s"$$right.${c.name}" else c.name)
    }
    val duckSelect =
      schema.cols.map(c => s"lj.${duckIdent(c.name)} AS ${duckIdent(c.name)}") ++
        rightOut.map { case (c, out) => s"rj.${duckIdent(c.name)} AS ${duckIdent(out)}" }
    val newCols = schema.cols ++ rightOut.map { case (c, out) => Col(out, c.kind) }
    // tiebreak: left ++ right (through renaming) stays unique for an
    // equi-join of unique-keyed sides; unknown when either side lost it
    val rightRename = rightOut.map { case (c, out) => c.name -> out }.toMap
    val tb =
      if (schema.tiebreak.nonEmpty && rightSchema.tiebreak.nonEmpty)
        schema.tiebreak ++ rightSchema.tiebreak.map(rightRename)
      else Nil

    joinCount += 1
    addOp(
      s"join$flavorTxt $rightPql on $condPql$extraPql",
      s"SELECT ${duckSelect.mkString(", ")} FROM ($leftDuck) lj $joinTypeDuck ($rightDuck) rj " +
        s"ON $condDuck$extraDuck",
      Schema(newCols, tb))
    true
  }

  // ---- mini right-side pipelines ---------------------------------------

  /** A small right side for a join: base table plus up to two ops that
    * keep `keepCol`. Returns (pql text, duck SQL, schema).
    */
  private def generateMini(table: String, keepCol: String): (String, String, Schema) = {
    schema = tables(table)
    duck = s"SELECT * FROM ${duckIdent(table)}"
    val n = rnd.nextInt(3)
    var i = 0
    while (i < n) {
      rnd.nextInt(3) match {
        case 0 => opWhere()
        case 1 => opExtend()
        case _ =>
          // project keeping the join key: bare columns only
          val usable = schema.cols.filter(_.kind != KOther)
          val kept = (schema.cols.filter(_.name == keepCol) ++
            usable.filter(c => c.name != keepCol && rnd.nextBoolean())).distinctBy(_.name)
          addOp(
            kept.map(c => pqlIdent(c.name)).mkString("project ", ", ", ""),
            s"SELECT ${kept.map(c => s"${duckIdent(c.name)} AS ${duckIdent(c.name)}").mkString(", ")} FROM ($duck)",
            Schema(kept,
              if (schema.tiebreak.nonEmpty && schema.tiebreak.forall(t => kept.exists(_.name == t)))
                schema.tiebreak
              else Nil))
      }
      i += 1
    }
    ((table +: pqlOps).mkString(" | "), duck, schema)
  }

  // ---- extension-anchored pipelines --------------------------------------

  /** Extension-anchored pipeline: random pre-ops, one §2.4 operator in
    * the grammar, random tail ops over its (pinned) output schema.
    * Anchors at FIXED geometry render a DuckDB leg built from the gate
    * entries' own oracle blocks ([[graft.SparkEntry.FuzzOracles]]) —
    * three-way differential; the plan-time adaptive forms stay
    * two-way (plan path vs SQL-text path) with duckOk = false.
    */
  private def generateExtension(): Unit = {
    val FO = graft.SparkEntry.FuzzOracles
    val docAnchors: Vector[() => Unit] = Vector(
      () => {
        val kind = pick(Seq("", "kind=exact", "kind=lines", "kind=minhash",
          "kind=simhash", "kind=substrings"))
        val k = if (kind.isEmpty) "" else s" $kind"
        // lines/substrings REBUILD the text from surviving fragments:
        // lines → (id, text); substrings → (id, text_clean, n_removed);
        // the row-dropping kinds keep the input schema intact
        val out =
          if (kind == "kind=lines")
            Schema(Vector(Col("doc_id", KLong), Col("text", KStr)), List("doc_id"))
          else if (kind == "kind=substrings")
            Schema(Vector(Col("doc_id", KLong), Col("text_clean", KStr),
              Col("n_removed", KLong)), List("doc_id"))
          else schema
        addOp(s"dedup$k text by doc_id", FO.dedup(kind, duck), out)
      },
      () => {
        val f = rnd.nextInt(9) + 1
        addOp(s"sample 0.$f by doc_id", FO.sample(duck, s"0.$f"), schema)
      },
      () => {
        val n = pick(Seq(32, 64, 128))
        addOp(s"chunk $n text by doc_id", FO.chunk(duck, n),
          Schema(Vector(Col("doc_id", KLong), Col("chunk_idx", KInt),
            Col("chunk_text", KStr), Col("n_tokens", KLong)), List("doc_id", "chunk_idx")))
      },
      () => {
        val n = pick(Seq(32, 64))
        val b = pick(Seq(128, 256, 512))
        addOp(s"chunk $n text by doc_id | pack $b shards=8 n_tokens by doc_id, chunk_idx",
          FO.chunkPack(duck, n, b),
          Schema(Vector(Col("doc_id", KLong), Col("chunk_idx", KInt), Col("chunk_text", KStr),
            Col("n_tokens", KLong), Col("seq_id", KStr)), List("doc_id", "chunk_idx")))
      },
      () => {
        val m = rnd.nextInt(17) + 3
        val hits = rnd.nextInt(3) + 1
        // grammar: options come AFTER the eval sub-pipeline
        // (`decontam against (Eval) [hits=n] [ngram=n] Text by Id`)
        addOp(s"decontam against (documents | where (doc_id % $m) == 0) hits=$hits text by doc_id",
          FO.decontam(duck, m, hits), schema)
      },
      () => {
        emittable = false // plan-time crossover — the text backend rejects
        duckOk = false // crossover recomputation is the gate oracle's job
        addOp("sample budget=800 text by doc_id, source", duck,
          Schema(Vector(Col("doc_id", KLong), Col("source", KStr), Col("n_tok", KLong)),
            List("doc_id")))
      }
    )
    val embAnchors: Vector[() => Unit] = Vector(
      () => {
        val fixed = rnd.nextBoolean()
        if (!fixed) { emittable = false; duckOk = false } // adaptive geometry — rejected by SqlGen
        val geo = if (fixed) " planes=32 bits=8" else ""
        addOp(s"dedup kind=embed dim=64$geo embedding by vec_id",
          if (fixed) FO.dedupEmbed(duck) else duck, schema)
      },
      () => {
        val fixed = rnd.nextBoolean()
        if (!fixed) { emittable = false; duckOk = false }
        val cells = if (fixed) " cells=16" else ""
        addOp(s"dedup kind=semantic cos=0.4$cells embedding by vec_id",
          if (fixed) FO.dedupSemantic(duck, 16) else duck, schema)
      },
      () => {
        val m = pick(Seq(25, 50, 100))
        val (kindTxt, fixed, annKind) = rnd.nextInt(3) match {
          case 0 => ("", true, "brute") // brute: no index to size
          case 1 =>
            if (rnd.nextBoolean()) (" kind=lsh dim=64 planes=32 bits=8", true, "lsh")
            else (" kind=lsh dim=64", false, "lsh")
          case _ =>
            if (rnd.nextBoolean()) (" kind=ivf dim=64 cells=16 probes=2", true, "ivf")
            else (" kind=ivf dim=64", false, "ivf")
        }
        if (!fixed) { emittable = false; duckOk = false }
        addOp(s"ann$kindTxt (embeddings | where (vec_id % $m) == 0) on embedding by vec_id",
          if (fixed) FO.ann(duck, m, annKind) else duck,
          Schema(Vector(Col("query_id", KLong), Col("vec_id", KLong),
            Col("cos_sim", KDouble), Col("rank", KInt)), List("query_id", "rank")))
      }
    )
    val evAnchors: Vector[() => Unit] = Vector(
      () => {
        val tolPql = if (rnd.nextBoolean()) Some(pick(Seq("15m", "1h", "6h"))) else None
        val tol = tolPql.map(t => s""" tolerance="$t"""").getOrElse("")
        val tolIv = tolPql.map {
          case "15m" => "15 MINUTE"
          case "1h"  => "1 HOUR"
          case _     => "6 HOUR"
        }
        val t = pick(strPools("event_type"))
        addOp(
          s"""join kind=asof$tol (events | where event_type == "$t" | summarize v0 = max(value) by user_id, ts) on user_id, ts""",
          FO.asofJoin(duck, t, tolIv),
          Schema(Vector(Col("user_id", KLong), Col("event_id", KLong), Col("ts", KTs),
            Col("event_type", KStr), Col("value", KDouble), Col("props", KStr),
            Col("v0", KDouble)), schema.tiebreak))
      },
      () => {
        val bucket = pick(Seq("15m", "30m", "2h"))
        val spanUs = pick(Seq(900000000L, 1800000000L, 7200000000L))
        val t = pick(strPools("event_type"))
        addOp(
          s"""join kind=range bucket="$bucket" (events | where event_type == "$t" | project user_id, s = ts, e = timestamp_micros(unix_micros(ts) + $spanUs), iid = event_id) on user_id, ts, s, e""",
          FO.rangeJoin(duck, t, spanUs),
          Schema(Vector(Col("user_id", KLong), Col("event_id", KLong), Col("ts", KTs),
            Col("event_type", KStr), Col("value", KDouble), Col("props", KStr),
            Col("s", KTs), Col("e", KTs), Col("iid", KLong)),
            if (schema.tiebreak.nonEmpty) schema.tiebreak :+ "iid" else Nil))
      }
    )

    val (base, anchor) = rnd.nextInt(10) match {
      case 0 | 1 | 2 | 3 | 4 => ("documents", pick(docAnchors))
      case 5 | 6 | 7         => ("embeddings", pick(embAnchors))
      case _                 => ("events", pick(evAnchors))
    }
    baseTable = base
    schema = tables(base)
    duck = s"SELECT * FROM ${duckIdent(base)}"

    // pre-ops that keep the anchor's required columns intact
    if (base != "embeddings" && rnd.nextInt(3) == 0) opWhere()
    if (rnd.nextInt(4) == 0) {
      val name = fresh("h")
      val e = genNum(schema, 1)
      addOp(s"extend $name = ${e.pql}",
        s"SELECT *, ${e.duck} AS ${duckIdent(name)} FROM ($duck)",
        Schema(schema.cols :+ Col(name, e.kind), schema.tiebreak))
    }

    anchor()

    // tail ops over the anchor's output schema
    var i = 0
    val nTail = rnd.nextInt(3)
    while (i < nTail) {
      rnd.nextInt(6) match {
        case 0 => opWhere()
        case 1 => opProject()
        case 2 => opSummarize()
        case 3 => opSortTake()
        case 4 => opSort()
        case _ => opExtend()
      }
      i += 1
    }
  }

  // ---- streaming pipelines -------------------------------------------------

  /** Stream-safe pipeline: random stateless pre-ops (where / extend /
    * project), then one of the terminals Structured Streaming can run
    * — nothing (pure stateless parity), a windowed summarize (`bin`
    * group key → tumbling window, complete mode), or one of the three
    * streaming dedup kinds. The gates that make a cross-run compare
    * sound mirror the fixed stream_dedup_* gate entries: full rows for
    * the deterministic terminals, the digest set for kind=exact, the
    * emitted band SET for the band kinds (which row owns a contested
    * band follows arrival order — not comparable; the set is).
    */
  private[fuzz] def generateStream(): StreamGenQuery = {
    val terminal = rnd.nextInt(20) match {
      case 0 | 1 | 2 | 3 | 4 | 5 | 6 | 7 => "stateless"
      case 8 | 9 | 10 | 11 | 12          => "window"
      case 13 | 14 | 15                  => "exact"
      case 16 | 17                       => "minhash"
      case _                             => "embed"
    }
    baseTable = terminal match {
      case "stateless"          => pick(Seq("documents", "events"))
      case "window"             => "events"
      case "exact" | "minhash"  => "documents"
      case _                    => "embeddings"
    }
    schema = streamTables(baseTable)
    duck = "" // no DuckDB leg: the oracle is the batch Spark run

    // fresh-named lets only (a let shadowing `text`/`ts`/the id would
    // change what the TERMINAL's by-clause resolves to — composition
    // the batch oracle shares, but keep the anchors stable)
    if (rnd.nextInt(3) == 0) {
      val name = fresh("v")
      val l = if (rnd.nextBoolean()) intLit() else {
        val v = pick(Vector("en", "click", "A", "zz"))
        Ex("\"" + v + "\"", "'" + v + "'", KStr)
      }
      lets(name) = (l.pql, l.duck, l.kind)
      pqlPrefix += s"let $name = ${l.pql};"
    }

    // stateless pre-ops; the stateful terminals need their anchor
    // columns intact, so project is reserved for the stateless variant
    val nPre =
      if (terminal == "stateless") rnd.nextInt(4) + 1
      else rnd.nextInt(3)
    var i = 0
    while (i < nPre) {
      rnd.nextInt(5) match {
        case 0 | 1      => opWhere()
        case 2 | 3      => opExtend()
        case _          => if (terminal == "stateless") opProject() else opWhere()
      }
      i += 1
    }
    val prePql = (pqlPrefix :+ (baseTable +: pqlOps).mkString("\n| ")).mkString("\n")

    terminal match {
      case "stateless" => ()
      case "window" =>
        val nAggs = rnd.nextInt(2) + 1
        val aggs = Vector.fill(nAggs)(genAgg(schema))
        val dur = pick(Seq("15m", "1h", "6h", "1d"))
        val binName = fresh("w")
        val keyParts = mutable.ArrayBuffer[(String, Col)](
          (s"""$binName = bin(ts, "$dur")""", Col(binName, KTs)))
        if (rnd.nextBoolean()) {
          if (rnd.nextBoolean())
            keyParts += (("event_type", Col("event_type", KStr)))
          else {
            val k2 = fresh("k")
            val m = rnd.nextInt(7) + 2
            keyParts += ((s"$k2 = (user_id % $m)", Col(k2, KLong)))
          }
        }
        val keys = if (rnd.nextBoolean()) keyParts.toVector else keyParts.toVector.reverse
        addOp(
          s"summarize ${aggs.map(_._2).mkString(", ")} by ${keys.map(_._1).mkString(", ")}",
          "",
          Schema(keys.map(_._2) ++ aggs.map(a => Col(a._1, a._4)), Nil))
        // optional stateless tail over the aggregate (complete mode
        // allows it); post-aggregation double columns differ between
        // the batch and incremental partial-sum trees by float
        // summation order, so tail PREDICATES stay off them — a
        // boundary-straddling 1-ulp diff would flip row membership,
        // which no output tolerance can absorb
        if (rnd.nextInt(3) == 0) {
          val safe = Schema(schema.cols.filterNot(_.kind == KDouble), Nil)
          if (safe.cols.exists(_.kind != KOther)) {
            val p = genBool(safe, 1)
            addOp(s"where ${p.pql}", "", schema)
          }
        }
        if (rnd.nextInt(3) == 0) opExtend()
      case "exact" =>
        addOp("dedup kind=exact text by doc_id", "", schema)
      case "minhash" =>
        addOp("dedup kind=minhash text by doc_id", "",
          Schema(schema.cols ++ Vector(Col("band_idx", KInt), Col("band_key", KStr)),
            Nil))
      case _ =>
        addOp("dedup kind=embed dim=64 planes=32 bits=8 embedding by vec_id", "",
          Schema(schema.cols ++ Vector(Col("band_idx", KInt), Col("band_key", KLong)),
            Nil))
    }

    val pql = (pqlPrefix :+ (baseTable +: pqlOps).mkString("\n| ")).mkString("\n")
    StreamGenQuery(seed, baseTable, prePql, pql, terminal)
  }

  // ---- top-level -----------------------------------------------------------

  private def generateTabular(): Unit = {
    baseTable = pick(tables.keys.toVector.sorted)
    schema = tables(baseTable)
    duck = s"SELECT * FROM ${duckIdent(baseTable)}"

    // optional lets, sometimes deliberately shadowing a column name
    val nLets = rnd.nextInt(4) match {
      case 0 => 1
      case 1 => 2
      case _ => 0
    }
    var li = 0
    while (li < nLets) {
      val shadowable = schema.cols.filter(c =>
        c.kind == KInt || c.kind == KLong || c.kind == KStr)
      val name =
        if (rnd.nextInt(3) == 0 && shadowable.nonEmpty) pick(shadowable).name
        else fresh("v")
      val (p, d, k) =
        if (rnd.nextBoolean()) { val l = intLit(); (l.pql, l.duck, l.kind) }
        else {
          val v = pick(Vector("en", "click", "A", "zz"))
          ("\"" + v + "\"", "'" + v + "'", KStr)
        }
      if (!lets.contains(name)) {
        lets(name) = (p, d, k)
        pqlPrefix += s"let $name = $p;"
      }
      li += 1
    }

    val nOps = rnd.nextInt(5) + 1
    var i = 0
    var done = false
    while (i < nOps && !done) {
      rnd.nextInt(20) match {
        case 0 | 1 | 2 | 3 => opWhere()
        case 4 | 5         => opExtend()
        case 6 | 7         => opProject()
        case 8 | 9 | 10    => opSummarize()
        case 11 | 12 | 13  => if (!opJoin()) opWhere()
        case 14            => opSort()
        case 15            => opSortTake()
        case 16            => opTop()
        case 17            => opTakeAll()
        case 18            => if (rnd.nextInt(3) == 0) opAs() else opWhere()
        case _             => opCount(); done = true
      }
      i += 1
    }
  }

  def generate(): GenQuery = {
    if (seed % 10 < 7) generateTabular() else generateExtension()
    assemble()
  }

  /** Force the extension-anchored branch for every seed (the DuckDB
    * campaign over extension-terminal compositions; organic seeds hit
    * it only 3 in 10).
    */
  private[fuzz] def generateExtensionQuery(): GenQuery = {
    generateExtension()
    assemble()
  }

  private def assemble(): GenQuery = {
    val body = (baseTable +: pqlOps).mkString("\n| ")
    val pql = (pqlPrefix :+ body).mkString("\n")
    GenQuery(seed, pql, if (duckOk) Some(duck) else None, emittable)
  }
}
