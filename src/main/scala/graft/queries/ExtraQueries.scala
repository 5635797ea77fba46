package graft.queries

import graft.QueryDef

/** Large-scale training-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) — populated incrementally. */
object ExtraQueries {
  val defs: Seq[QueryDef] = Seq()
}
