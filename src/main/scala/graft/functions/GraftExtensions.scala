package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftglue.Bridge

/** Registers graft's native expressions as SQL functions.
  *
  * Cluster path: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) —
  * every session on the cluster then resolves the functions in
  * `spark.sql(...)` / `expr(...)`.
  *
  * Existing-session path: [[GraftExtensions.register]] installs the
  * same functions into a live session's registry (temp functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(extensions.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot expects 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }
    )
  )

  /** Install every graft function into an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      Bridge.registerTempFunction(spark, ident.funcName, builder)
    }
}
