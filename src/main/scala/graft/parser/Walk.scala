package graft.parser

/** Pre-order AST traversal — the embedder-facing visitor the reference
  * exposes as `parser.Walk` (reference parser/ast.go): linters, query
  * rewriters, and table-reference extractors walk the tree without
  * pattern-matching every node type themselves.
  *
  * `f` receives each node before its children; returning `false`
  * prunes that node's subtree (the reference's visitor-nil contract).
  */
object Walk {

  def apply(node: Node)(f: Node => Boolean): Unit =
    if (f(node)) children(node).foreach(c => apply(c)(f))

  /** Visit every node (no pruning). */
  def all(node: Node)(f: Node => Unit): Unit =
    apply(node) { n => f(n); true }

  /** Direct children of a node, in source order. */
  def children(node: Node): List[Node] = node match {
    case _: Ident | _: BasicLit          => Nil
    case QualifiedIdent(parts)           => parts
    case UnaryExpr(_, x, _)              => List(x)
    case BinaryExpr(x, _, _, y)          => List(x, y)
    case InExpr(x, vals, _)              => x :: vals
    case ParenExpr(x, _)                 => List(x)
    case CallExpr(func, args, _)         => func :: args
    case IndexExpr(x, index, _)          => List(x, index)
    case LetStatement(name, x, _)        => List(name, x)
    case t: TabularExpr                  => t.source.table :: t.operators
    case CountOp(_)                      => Nil
    case WhereOp(p, _)                   => List(p)
    case SortOp(terms, _)                => terms.map(_.x)
    case TakeOp(n, _)                    => List(n)
    case TopOp(n, term, _)               => List(n, term.x)
    case ProjectOp(cols, _)              => cols.flatMap(c => c.name :: c.x.toList)
    case ExtendOp(cols, _)               => cols.flatMap(c => c.name.toList ::: List(c.x))
    case SummarizeOp(aggs, by, _)        => (aggs ++ by).flatMap(c => c.name.toList ::: List(c.x))
    case JoinOp(_, right, conds, _)      => right :: conds
    case AsOp(name, _)                   => List(name)
    case RenderOp(chart, props, _)       => chart :: props.flatMap(p => List(p.name, p.value))
    case AsofJoinOp(right, cols, tol, _)   => right :: (cols ::: tol.map(_.name).toList)
    case RangeJoinOp(right, cols, buck, _) => right :: (cols ::: buck.map(_.name).toList)
    case DedupOp(_, opts, text, id, _)   => opts.map(_.name) ::: List(text, id)
    case SampleOp(_, _, id, _)           => List(id)
    case SampleBudgetOp(opts, text, id, strata, _) =>
      opts.map(_.name) ::: List(text, id, strata)
    case DecontamOp(ev, opts, text, id, _) => ev :: opts.map(_.name) ::: List(text, id)
    case AnnOp(_, opts, qs, vec, id, _)  => qs :: opts.map(_.name) ::: List(vec, id)
    case ChunkOp(n, text, id, _)         => List(n, text, id)
    case PackOp(b, opts, tok, id, idx, _) => b :: opts.map(_.name) ::: List(tok, id, idx)
  }
}
