package graft.queries

import graft.QDef

object WindowQueries {
  val defs: Seq[QDef] = Seq()
}
