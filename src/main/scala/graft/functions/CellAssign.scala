package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment against a PLAN-TIME centroid matrix:
  * `argmax_c dot(v, centroid_c)`, ties to the smallest `c`.
  *
  * Replaces the explode → broadcast-join-on-dimension → groupBy-sum →
  * window-rank assignment shape ([[graft.ops.Ann]].cellRanks) wherever
  * only the WINNING cell is needed: that shape materializes
  * `n · dim · nCells` joined rows before the aggregate — 40G rows for
  * the sf10 SemDeDup auto sizing (200k vectors × 64 dims × 3125
  * cells), measured ~16 min — while this expression is one fused
  * dot-product loop per row inside whole-stage codegen, no join, no
  * aggregate, no shuffle. The matrix rides the generated class as a
  * single reference object (`ctx.addReferenceObj`), NOT per-component
  * literals: 200k doubles as literals would blow janino's
  * per-class constant pool.
  *
  * Semantics mirror cellRanks' `row_number() OVER (ORDER BY d DESC, c)
  * = 1` exactly:
  *   - per-cell dot is the j-ascending left fold over positions
  *     present in BOTH the vector and the matrix row (the dimension
  *     join), skipping null vector elements (SQL `sum` skips nulls);
  *   - the strict `Double.compare(d, best) > 0` replacement rule keeps
  *     the smallest winning `c` on exact ties and ranks NaN largest —
  *     both exactly Spark's descending sort order;
  *   - an EMPTY vector assigns NULL (posexplode of an empty array
  *     produced no assignment rows), as does an empty matrix.
  */
case class ArgmaxDot(child: Expression, matrix: Array[Double], dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(matrix.length % dim == 0,
    s"matrix length ${matrix.length} is not a multiple of dim=$dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // Can return null even for a NON-null child (empty vector/matrix) —
  // the default child-follows nullability would make nullSafeCodeGen
  // emit a constant-false isNull and the `isNull = true` assignment
  // below a compile error (caught live: janino "isNull_1 is not an
  // rvalue" → silent interpreted fallback).
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_dot"

  override def nullSafeEval(a: Any): Any = {
    val c = ArgmaxDot.compute(a.asInstanceOf[ArrayData], matrix, dim)
    if (c < 0) null else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("argmaxMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("cell")
      s"""
         |final int $c = graft.functions.ArgmaxDot.compute($v, $matRef, $dim);
         |if ($c < 0) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed sign-LSH signature against a PLAN-TIME hyperplane matrix:
  * bit `p` of the Long result is `fold_j(v[j]·m[p·dim+j]) >= 0`.
  *
  * Replaces the explode → groupBy(`planes`+1 double-sum aggregates) →
  * join-back signature shape: that pays an n-row shuffle plus a join
  * per signature pass, and grouped double sums are only
  * left-fold-exact while each group stays in one aggregation partial
  * (the spill-order hazard [[ArgmaxDot]]'s swap measured at sf10 —
  * 99/12.19M drifted rows). This is one fused planes×dim loop per row
  * in whole-stage codegen, shuffle-free, fold-order fixed by
  * construction.
  *
  * Null semantics match the DuckDB oracle (which indexes
  * `v[1..dim]`, so any missing/NULL component nulls EVERY plane's
  * sum and `CASE NULL >= 0` is false): a vector shorter than `dim`
  * or with a null component in its first `dim` positions → signature
  * 0 (all bits clear). A NaN plane sum clears its bit (`NaN >= 0` is
  * false in Java, Spark, and SQL alike). A null ARRAY → null
  * signature (null band keys join nothing, like the dropped row of
  * the aggregate shape).
  */
case class PackedSignSig(child: Expression, matrix: Array[Double], dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(matrix.length % dim == 0,
    s"matrix length ${matrix.length} is not a multiple of dim=$dim")
  require(matrix.length / dim >= 1 && matrix.length / dim <= 62,
    s"planes must be in [1, 62], got ${matrix.length / dim}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_sig"

  override def nullSafeEval(a: Any): Any =
    PackedSignSig.compute(a.asInstanceOf[ArrayData], matrix, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("signPlanes", matrix, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PackedSignSig.compute($v, $matRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedSignSig {

  /** Packed signature; 0L when the vector cannot support a full plane
    * sum (short vector / null component — the oracle's NULL-sum
    * semantics). Called from generated code.
    */
  def compute(v: ArrayData, m: Array[Double], dim: Int): Long = {
    val planes = m.length / dim
    if (v.numElements() < dim) return 0L
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return 0L
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) { s += v.getDouble(i) * m(off + i); i += 1 }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Column-side entry point. */
  def apply(v: Column, matrix: Array[Double], dim: Int): Column =
    Bridge.column(PackedSignSig(Bridge.expression(v), matrix, dim))
}

/** Nearest-centroid assignment by the LLOYD score `cc_c − 2·dot(v,
  * centroid_c)` against a PLAN-TIME centroid matrix: argmin over
  * cells, ties to the smallest index — [[graft.ops.Kmeans]]'s
  * assignment as ONE fused codegen loop per row.
  *
  * Replaces the one-row-broadcast + `zip_with(cents, ccs, …)` +
  * `array_min`/`array_position` shape: higher-order lambdas evaluate
  * INTERPRETED (one closure call per cell per row), and the broadcast
  * pack costs a 1-row aggregate + exchange per assignment pass. The
  * semantics of that composition are mirrored exactly so assignments
  * are bit-identical:
  *   - per-cell dot is [[graft.functions.DotProduct]]'s: NULL score on
  *     length mismatch, a null vector element, or a null centroid
  *     component (`nullCell`); in-index-order left fold otherwise;
  *   - `score = cc − 2.0·dot` with the centroid's squared norm `cc`
  *     precomputed by the same left fold (driver-side, same IEEE ops);
  *   - argmin skips NULL scores (like `array_min`) and compares via
  *     Spark's double ordering (`-0.0 == 0.0`, NaN greatest — the
  *     `SQLOrderingUtil.compareDoubles` rule), first minimum wins
  *     (like `array_position`'s first match);
  *   - every score NULL (or no cells) → NULL cell.
  * Centroids may be ragged (`offsets` has nCells+1 entries; cell c is
  * `matrix[offsets(c) until offsets(c+1))`) — mirroring per-cell dot
  * null semantics for ragged seed corpora.
  */
case class ArgminScore(
    child: Expression,
    matrix: Array[Double],
    offsets: Array[Int],
    ccs: Array[Double],
    nullCell: Array[Boolean])
    extends UnaryExpression
    with ExpectsInputTypes {

  require(offsets.length >= 1 && offsets.head == 0 && offsets.last == matrix.length,
    s"offsets must span the matrix: ${offsets.mkString(",")} vs ${matrix.length}")
  require(ccs.length == offsets.length - 1 && nullCell.length == ccs.length,
    s"per-cell arrays must have ${offsets.length - 1} entries")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // null on empty cell set / all-null scores even with a non-null
  // child — same janino constant-isNull hazard as ArgmaxDot
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_score"

  override def nullSafeEval(a: Any): Any = {
    val c = ArgminScore.compute(
      a.asInstanceOf[ArrayData], matrix, offsets, ccs, nullCell)
    if (c < 0) null else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("argminMatrix", matrix, "double[]")
    val offRef = ctx.addReferenceObj("argminOffsets", offsets, "int[]")
    val ccsRef = ctx.addReferenceObj("argminCcs", ccs, "double[]")
    val nulRef = ctx.addReferenceObj("argminNullCell", nullCell, "boolean[]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("cell")
      s"""
         |final int $c = graft.functions.ArgminScore.compute(
         |  $v, $matRef, $offRef, $ccsRef, $nulRef);
         |if ($c < 0) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArgminScore {

  /** Winning cell, or -1 for "no assignment" (no cells, or every
    * score NULL). Called from generated code.
    */
  def compute(
      v: ArrayData,
      m: Array[Double],
      offsets: Array[Int],
      ccs: Array[Double],
      nullCell: Array[Boolean]): Int = {
    val nCells = offsets.length - 1
    val vlen = v.numElements()
    var vHasNull = false
    var i = 0
    while (i < vlen && !vHasNull) { vHasNull = v.isNullAt(i); i += 1 }
    var bestC = -1
    var best = 0.0
    var c = 0
    while (c < nCells) {
      val off = offsets(c)
      val len = offsets(c + 1) - off
      // NULL score (skipped, like array_min over nulls) unless the
      // lengths match and neither side has a null element
      if (!nullCell(c) && len == vlen && !vHasNull) {
        var s = 0.0
        var j = 0
        while (j < len) { s += v.getDouble(j) * m(off + j); j += 1 }
        val score = ccs(c) - 2.0 * s
        // Spark's double ordering: ±0.0 equal, NaN greatest; strict <
        // keeps the FIRST minimum (array_position's first match)
        if (bestC < 0 ||
            (!(score == best) && java.lang.Double.compare(score, best) < 0)) {
          best = score
          bestC = c
        }
      }
      c += 1
    }
    bestC
  }

  /** Column-side entry point. */
  def apply(
      v: Column,
      matrix: Array[Double],
      offsets: Array[Int],
      ccs: Array[Double],
      nullCell: Array[Boolean]): Column =
    Bridge.column(ArgminScore(Bridge.expression(v), matrix, offsets, ccs, nullCell))
}

/** Top-N centroid cells by dot product against a PLAN-TIME centroid
  * matrix: the `nProbe` best cells ordered by `(dot desc, c asc)` as
  * an `array<int>` — [[graft.ops.Ann]]'s QUERY-side probe selection
  * as one fused codegen loop per row.
  *
  * Replaces the `cellRanks` explode → broadcast-join-on-dimension →
  * groupBy-sum → window-rank shape for the probe list (round 19): the
  * query side is small, but that shape still costs a centroid
  * component frame, a broadcast build, an aggregate exchange, and a
  * window per query batch. Its semantics are mirrored exactly:
  *   - per-cell dot sums `x_j·w_cj` over `j < min(len(v), dim)` in
  *     index order, SKIPPING null vector elements (SQL `sum` skips
  *     nulls — unlike [[DotProduct]]'s null-poisoning, which is the
  *     PAIR operators' contract, not this one);
  *   - a vector with no non-null element in range has d = NULL for
  *     every cell (an all-null SUM), which ranks AFTER every non-null
  *     d (`desc` = NULLS LAST) with ties by c — so such rows probe
  *     cells 0..nProbe-1, like the window form;
  *   - NaN sums rank FIRST (Spark's double ordering: NaN greatest);
  *     equal sums tie-break by the smaller cell;
  *   - an EMPTY vector yields NULL (posexplode produced no rows, so
  *     the query vanished from the ranked frame; callers explode,
  *     which drops the null).
  */
case class TopCellsDot(child: Expression, matrix: Array[Double], dim: Int, nProbe: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  require(matrix.length % dim == 0,
    s"matrix length ${matrix.length} is not a multiple of dim=$dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null on an empty vector / empty matrix even with a non-null child
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_cells_dot"

  override def nullSafeEval(a: Any): Any =
    TopCellsDot.compute(a.asInstanceOf[ArrayData], matrix, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("topCellsMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val o = ctx.freshName("cells")
      s"""
         |final ArrayData $o = graft.functions.TopCellsDot.compute($v, $matRef, $dim, $nProbe);
         |if ($o == null) { ${ev.isNull} = true; } else { ${ev.value} = $o; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopCellsDot {

  /** The nProbe best cells, or null for an empty vector/matrix.
    * Called from generated code.
    */
  def compute(v: ArrayData, m: Array[Double], dim: Int, nProbe: Int): ArrayData = {
    val nCells = m.length / dim
    if (v.numElements() == 0 || nCells == 0) return null
    val n = math.min(v.numElements(), dim)
    val ds = new Array[Double](nCells)
    val dNull = new Array[Boolean](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var any = false
      var j = 0
      val off = c * dim
      while (j < n) {
        if (!v.isNullAt(j)) { s += v.getDouble(j) * m(off + j); any = true }
        j += 1
      }
      ds(c) = s
      dNull(c) = !any // SUM over zero non-null terms is NULL
      c += 1
    }
    // (d desc — Spark double ordering: ±0.0 equal, NaN greatest, nulls
    // last — then c asc), like row_number over the window
    val idx = Array.range(0, nCells)
    val ord = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val (na, nb) = (dNull(a), dNull(b))
        if (na && nb) Integer.compare(a, b)
        else if (na) 1
        else if (nb) -1
        else {
          val cmp =
            if (ds(a) == ds(b)) 0 else java.lang.Double.compare(ds(b), ds(a))
          if (cmp != 0) cmp else Integer.compare(a, b)
        }
      }
    }
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, ord)
    new GenericArrayData(boxed.take(math.min(nProbe, nCells)).map(_.intValue))
  }

  /** Column-side entry point. */
  def apply(v: Column, matrix: Array[Double], dim: Int, nProbe: Int): Column =
    Bridge.column(TopCellsDot(Bridge.expression(v), matrix, dim, nProbe))
}

/** [[ArgmaxDot]] with the centroid set as a RUNTIME argument (an
  * `array<array<double>>` value, one element per cell in cell order)
  * instead of a plan-time flat matrix — the SQL-text backend's
  * spelling: a plan-time matrix cannot ride a SQL string, but a
  * scalar subquery producing the SAME cell-ordered seed set can
  * (`transform(array_sort(collect_list(struct(c, v))), s -> s.v)`
  * over the seed CTE). Registered as `graft_argmax_cell(vec, seeds)`.
  *
  * The stride (`dim`) is derived from the seed vectors exactly like
  * the plan path (`Ann.seededCentroidMatrix` takes the first seed's
  * length) — NOT from a user option, so a `dim=` that disagrees with
  * the actual vector width cannot skew the assignment. The comparison
  * loop mirrors [[ArgmaxDot.compute]] statement for statement (same
  * strict `Double.compare(d, best) > 0` replacement rule, same
  * `min(len, dim)` bound, same skip-null vector rule), and
  * `CellAssignSpec` asserts the two spellings agree on ties, NaN,
  * ragged and null-element vectors so they cannot drift. Ragged or
  * null-component seed vectors throw (the plan path rejects them at
  * compile time in `Ann.seededCentroidMatrix`; this spelling meets
  * them at eval time, same messages). A null seed set, like a null
  * vector, is null.
  */
case class ArgmaxDotDyn(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // null on empty vector / empty seed set even with non-null children —
  // same janino constant-isNull hazard as ArgmaxDot
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val c = ArgmaxDot.computeDyn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (c < 0) null else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val c = ctx.freshName("cell")
      s"""
         |final int $c = graft.functions.ArgmaxDot.computeDyn($v, $m);
         |if ($c < 0) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgmaxDotDyn {
  /** Column-side entry point. */
  def apply(v: Column, m: Column): Column =
    Bridge.column(ArgmaxDotDyn(Bridge.expression(v), Bridge.expression(m)))
}

object ArgmaxDot {

  /** Winning cell index, or -1 for "no assignment" (empty vector or
    * empty matrix). Called from generated code.
    */
  def compute(v: ArrayData, m: Array[Double], dim: Int): Int = {
    val nCells = m.length / dim
    val n = math.min(v.numElements(), dim)
    if (v.numElements() == 0 || nCells == 0) return -1
    var bestC = 0
    var best = cellDot(v, m, 0, n)
    var c = 1
    while (c < nCells) {
      val d = cellDot(v, m, c * dim, n)
      if (java.lang.Double.compare(d, best) > 0) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  private def cellDot(v: ArrayData, m: Array[Double], off: Int, n: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < n) {
      if (!v.isNullAt(j)) s += v.getDouble(j) * m(off + j)
      j += 1
    }
    s
  }

  /** [[compute]] with the seed set as nested ArrayData (see
    * [[ArgmaxDotDyn]]): stride = first seed's length, ragged or
    * null-component seeds throw with the plan path's messages.
    * Called from generated code.
    */
  def computeDyn(v: ArrayData, m: ArrayData): Int = {
    val nCells = m.numElements()
    if (v.numElements() == 0 || nCells == 0) return -1
    val first = seedRow(m, 0)
    val dim = first.numElements()
    require(dim >= 1, s"seed vectors must be non-empty, got dim=$dim")
    val n = math.min(v.numElements(), dim)
    var bestC = 0
    var best = cellDotDyn(v, first, dim, n)
    var c = 1
    while (c < nCells) {
      val row = seedRow(m, c)
      require(row.numElements() == dim, s"ragged seed vectors: ${row.numElements()} vs $dim")
      val d = cellDotDyn(v, row, dim, n)
      if (java.lang.Double.compare(d, best) > 0) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  private def seedRow(m: ArrayData, c: Int): ArrayData = {
    if (m.isNullAt(c))
      throw new IllegalArgumentException(
        s"seed vector $c is null — clean the corpus vectors before indexing")
    m.getArray(c)
  }

  private def cellDotDyn(v: ArrayData, row: ArrayData, dim: Int, n: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < n) {
      if (row.isNullAt(j))
        throw new IllegalArgumentException(
          "seed vector has null components — clean the corpus vectors before indexing")
      if (!v.isNullAt(j)) s += v.getDouble(j) * row.getDouble(j)
      j += 1
    }
    s
  }

  /** Column-side entry point. */
  def apply(v: Column, matrix: Array[Double], dim: Int): Column =
    Bridge.column(ArgmaxDot(Bridge.expression(v), matrix, dim))
}
