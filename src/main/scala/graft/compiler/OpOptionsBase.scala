package graft.compiler

import graft.parser.{OpOption, Span}

/** Validated accessor over an extension operator's literal
  * `name=<number>` options: rejects unknown/duplicate names at
  * construction, parses per accessor. Shared by the DataFrame
  * compiler and the SQL-text backend (round 15 — SqlGen emits the
  * SQL-expressible extension operators and must reject option misuse
  * with the same spans and messages).
  */
private[compiler] class OpOptionsBase(
    opts: List[OpOption],
    opSpan: Span,
    allowed: Set[String],
    opName: String,
    fail: (String, Span) => Nothing
) {
  opts.groupBy(_.name.name).collectFirst { case (n, os) if os.sizeIs > 1 => os(1) }
    .foreach(o => fail(s"duplicate option ${o.name.name}", o.name.span))
  opts.find(o => !allowed.contains(o.name.name)).foreach { o =>
    val hint = if (allowed.isEmpty) "takes no options" else s"allows ${allowed.toList.sorted.mkString(", ")}"
    fail(s"option ${o.name.name} not valid for $opName ($opName $hint)", o.name.span)
  }
  private val byName = opts.map(o => o.name.name -> o).toMap

  def int(name: String, default: Int, min: Int): Int = byName.get(name) match {
    case None => default
    case Some(o) =>
      val v = try o.value.toInt
        catch { case _: NumberFormatException => fail(s"option $name must be an integer, got ${o.value}", o.valueSpan) }
      if (v < min) fail(s"option $name must be >= $min, got $v", o.valueSpan)
      v
  }

  def intOpt(name: String, min: Int): Option[Int] =
    if (byName.contains(name)) Some(int(name, default = min, min = min)) else None

  def requiredInt(name: String, min: Int): Int = {
    if (!byName.contains(name)) fail(s"$opName requires option $name=<n>", opSpan)
    int(name, default = min, min = min)
  }

  def requiredLong(name: String, min: Long): Long = byName.get(name) match {
    case None => fail(s"$opName requires option $name=<n>", opSpan)
    case Some(o) =>
      val v = try o.value.toLong
        catch { case _: NumberFormatException => fail(s"option $name must be an integer, got ${o.value}", o.valueSpan) }
      if (v < min) fail(s"option $name must be >= $min, got $v", o.valueSpan)
      v
  }

  def double(name: String, default: Double, min: Double = Double.NegativeInfinity,
             max: Double = Double.PositiveInfinity): Double = byName.get(name) match {
    case None => default
    case Some(o) =>
      val v = try o.value.toDouble
        catch { case _: NumberFormatException => fail(s"option $name must be a number, got ${o.value}", o.valueSpan) }
      if (v < min || v > max)
        fail(s"option $name must be in [$min, $max], got $v", o.valueSpan)
      v
  }

  /** Construction-time checks are the whole contract; kept as an
    * explicit terminator so call sites read as a validation scope.
    */
  def finish(): Unit = ()
}
