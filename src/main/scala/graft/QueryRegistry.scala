package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle that must produce an
  * identical result on the same parquet tables. Keeping both halves in one
  * place is what keeps column aliases / rounding / ordering in lock-step —
  * the driver hash-compares values after sorting columns by name.
  */
final case class QDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  lazy val all: Seq[QDef] = Seq(
    queries.RelationalQueries.defs,
    queries.TextQueries.defs,
    queries.SimilarityQueries.defs,
    queries.WindowQueries.defs,
    queries.PipelineQueries.defs,
    queries.GraphQueries.defs
  ).flatten
}
