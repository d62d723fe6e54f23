package graft.compiler

import graft.parser.{Ident, Span}

/** Shared compile-time validation for the asof/range join extension
  * operators — ONE implementation of the key/timestamp split and the
  * collision rules, used by BOTH the DataFrame compiler and the
  * SQL-text backend (round 15: SqlGen now emits these operators'
  * CTE forms, and the two paths must reject exactly the same inputs
  * with exactly the same spans).
  */
private[compiler] object ExtJoins {

  final case class AsofParts(keys: Seq[String], ts: String, valueCols: Seq[String])
  final case class RangeParts(keys: Seq[String], ts: Ident, start: Ident, end: Ident)

  /** Split + validate `| join kind=asof … on k1, …, ts`: last on-column
    * is the shared event time, the rest the equi-key; value columns are
    * whatever else the right side carries. All precondition failures
    * are spanned compile errors (the library op's raw
    * IllegalArgumentExceptions never surface).
    */
  def asofParts(
      leftCols: Seq[String],
      rightCols: Seq[String],
      onCols: List[Ident],
      span: Span,
      fail: (String, Span) => Nothing
  ): AsofParts = {
    onCols.groupBy(_.name).collectFirst { case (_, cs) if cs.sizeIs > 1 => cs(1) }
      .foreach(c => fail(s"duplicate asof join column ${c.name}", c.span))
    val keys = onCols.init.map(_.name)
    val ts = onCols.last.name
    onCols.init.find(c => !leftCols.contains(c.name)).foreach(c =>
      fail(s"asof join column ${c.name} not found on the left side", c.span))
    if (!leftCols.contains(ts))
      fail(s"asof join timestamp $ts not found on the left side", onCols.last.span)
    (keys :+ ts).find(n => !rightCols.contains(n)).foreach(n =>
      fail(s"asof join column $n not found on the right side", span))
    val valueCols = rightCols.filterNot(c => keys.contains(c) || c == ts)
    if (valueCols.isEmpty)
      fail("asof join right side carries no value columns beyond the key and timestamp", span)
    val collide = valueCols.intersect(leftCols)
    if (collide.nonEmpty)
      fail(s"asof join right-side value column${if (collide.sizeIs > 1) "s" else ""} " +
        s"${collide.mkString(", ")} already exist${if (collide.sizeIs > 1) "" else "s"} on the " +
        "left side — project or rename on the right side", span)
    val reserved = Seq("__vals", "__side", "__bucket", "__carry")
    val badReserved = (leftCols ++ valueCols).distinct.intersect(reserved)
    if (badReserved.nonEmpty)
      fail(s"asof join input column${if (badReserved.sizeIs > 1) "s" else ""} " +
        s"${badReserved.mkString(", ")} collide${if (badReserved.sizeIs > 1) "" else "s"} " +
        "with the operator's internal columns — rename before joining", span)
    AsofParts(keys, ts, valueCols)
  }

  /** Validate `| ann … (Q) on Vec by Id` column preconditions —
    * existence on both sides, vec ≠ id, and the OUTPUT-column
    * reserved set (the id rides through to the output under its own
    * name; internals are `__graft_ann_*`-aliased and never reserved).
    * Shared by the DataFrame compiler and the SQL-text backend.
    */
  def annCheck(
      corpusCols: Seq[String],
      queryCols: Seq[String],
      vec: Ident,
      id: Ident,
      fail: (String, Span) => Nothing
  ): Unit = {
    Seq(vec, id).find(c => !corpusCols.contains(c.name)).foreach(c =>
      fail(s"ann column ${c.name} not found on the corpus side", c.span))
    Seq(vec, id).find(c => !queryCols.contains(c.name)).foreach(c =>
      fail(s"ann column ${c.name} not found on the query side", c.span))
    if (vec.name == id.name)
      fail("ann vector and id columns must differ", id.span)
    val annReserved = Set("query_id", "cos_sim", "rank")
    if (annReserved.contains(id.name))
      fail(s"ann column ${id.name} collides with the operator's output " +
        "columns — rename before indexing", id.span)
  }

  /** Split + validate `| join kind=range … on k1, …, ts, start, end`:
    * last three on-columns are the left point and the right half-open
    * interval; the rest the equi-key.
    */
  def rangeParts(
      leftCols: Seq[String],
      rightCols: Seq[String],
      onCols: List[Ident],
      span: Span,
      fail: (String, Span) => Nothing
  ): RangeParts = {
    onCols.groupBy(_.name).collectFirst { case (_, cs) if cs.sizeIs > 1 => cs(1) }
      .foreach(c => fail(s"duplicate range join column ${c.name}", c.span))
    val keys = onCols.dropRight(3).map(_.name)
    val Seq(tsC, startC, endC) = onCols.takeRight(3)
    if (!leftCols.contains(tsC.name))
      fail(s"range join point column ${tsC.name} not found on the left side", tsC.span)
    Seq(startC, endC).find(c => !rightCols.contains(c.name)).foreach(c =>
      fail(s"range join interval column ${c.name} not found on the right side", c.span))
    keys.find(n => !leftCols.contains(n) || !rightCols.contains(n)).foreach(n =>
      fail(s"range join key column $n must exist on both sides", span))
    if (rightCols.contains(tsC.name))
      fail(s"range join right side also carries the point column ${tsC.name} — " +
        "project or rename it on the right side", tsC.span)
    Seq(startC, endC).find(c => leftCols.contains(c.name)).foreach(c =>
      fail(s"range join left side also carries the interval column ${c.name} — " +
        "project or rename it on the left side", c.span))
    if ((leftCols ++ rightCols).contains("__bucket"))
      fail("range join input column __bucket collides with the operator's internal column — rename before joining", span)
    RangeParts(keys, tsC, startC, endC)
  }
}
