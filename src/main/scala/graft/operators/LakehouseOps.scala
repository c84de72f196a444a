package graft.operators

import graft.QueryDef

/** IceLite lakehouse operators (SURVEY.md §2.8) — filled in Phase 3. */
object LakehouseOps {
  val defs: Seq[QueryDef] = Seq()
}
