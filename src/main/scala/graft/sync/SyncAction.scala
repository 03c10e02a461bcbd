package graft.sync

import graft.model.Identifiers

/** The reference engine's one non-trivial "query": the full-refresh
  * snapshot sync decision (`app/data.py:120-131` Redshift,
  * `:231-241` Snowflake; Azure always drops, `:179-186`).
  *
  * If the existing table's column *set* — case-folded, order-ignored —
  * equals the incoming (sanitized) header's, TRUNCATE + load (keeps
  * grants/views, cheaper); else DROP + CREATE + load.
  */
sealed trait SyncAction { def pastTense: String }
case object Truncate extends SyncAction { val pastTense = "Truncated" }
case object DropCreate extends SyncAction { val pastTense = "Dropped" }

object SyncAction {

  /** `Truncate` iff sorted(lower(existing)) matches the sanitized
    * incoming header. The incoming side goes through the SAME
    * uniquification the DDL uses (`SheetMatrix.headerNames`, not bare
    * to_alnum): a header with duplicate or empty cells creates
    * uniquified columns, and comparing against the raw to_alnum names
    * would mismatch on every later sync — a permanent DropCreate loop
    * that defeats the Truncate path's whole purpose (preserving
    * grants/views). `forceDropCreate` models the Azure DW path, which
    * never truncates.
    */
  def decide(
      existingCols: Seq[String],
      incomingHeader: Seq[String],
      forceDropCreate: Boolean = false): SyncAction = {
    if (forceDropCreate) DropCreate
    else {
      val existing = existingCols.map(_.toLowerCase).sorted
      val incoming = graft.model.SheetMatrix.headerNames(incomingHeader)
        .map(_.toLowerCase).sorted
      if (existing == incoming) Truncate else DropCreate
    }
  }
}
