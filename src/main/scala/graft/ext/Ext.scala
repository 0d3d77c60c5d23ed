package graft.ext

import graft.queries.QueryDef

/** North-star extension operators (SURVEY.md §2.4): dedup, similarity
  * search, text analysis, multimodal plumbing. Populated incrementally. */
object Ext {
  def all: Seq[QueryDef] = Seq.empty
}
