package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production wiring for the engine's Catalyst additions: set
  * `spark.sql.extensions=graft.GraftExtensions` and every session
  * created from that config plans graft's custom operators natively —
  * no per-session `register()` calls in user code.
  *
  * Currently injected:
  *  - [[graft.plans.AsOfJoin.AsOfStrategy]] — plans the as-of join
  *    LogicalPlan node into its co-partitioned merge ExecNode.
  *  - `graft_dot(a, b)` — the codegen'd [[graft.expr.DotProduct]]
  *    kernel as a SQL function, so pure-SQL users (spark.sql, JDBC,
  *    SQL files) get the same primitive-loop inner product the
  *    DataFrame API uses, not an interpreted zip_with fold.
  *
  * The programmatic [[graft.plans.AsOfJoin.register]] path stays for
  * notebook/REPL sessions that already exist; both are idempotent
  * (planner strategies tolerate duplicates, the strategy matches only
  * its own node; function registration overwrites by name).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.expr.DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes two arguments")
        graft.expr.DotProduct(args.head, args(1))
      }))
  }
}
