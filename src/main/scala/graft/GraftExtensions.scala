package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Production wiring for the engine's Catalyst additions: set
  * `spark.sql.extensions=graft.GraftExtensions` and every session
  * created from that config plans graft's custom operators natively —
  * no per-session `register()` calls in user code.
  *
  * Currently injected:
  *  - [[graft.plans.AsOfJoin.AsOfStrategy]] — plans the as-of join
  *    LogicalPlan node into its co-partitioned merge ExecNode.
  *
  * The programmatic [[graft.plans.AsOfJoin.register]] path stays for
  * notebook/REPL sessions that already exist; both are idempotent
  * (planner strategies tolerate duplicates, the strategy matches only
  * its own node).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfStrategy)
  }
}
