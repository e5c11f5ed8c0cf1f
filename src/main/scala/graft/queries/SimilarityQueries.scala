package graft.queries

import graft.QDef

object SimilarityQueries {
  val defs: Seq[QDef] = Seq()
}
