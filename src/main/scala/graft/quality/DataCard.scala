package graft.quality

import graft.functions.TextFns
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** One-call corpus data card: the summary block a training-data release
  * ships with (composition, language mix, quality, duplication). Composes
  * the engine's profiling operators into a single small DataFrame of
  * (metric, value) rows — every input is an aggregate; nothing text-sized
  * reaches the driver.
  */
object DataCard {

  def build(docs: DataFrame, idCol: String, textCol: String,
            langCol: String, sourceCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // one pass over the text: composition + quality gate in a single agg
    val base = docs.agg(
      count(lit(1)).cast("long").as("n_docs"),
      countDistinct(col(sourceCol)).cast("long").as("n_sources"),
      countDistinct(col(langCol)).cast("long").as("n_langs"),
      coalesce(sum(TextFns.tokenCount(col(textCol))), lit(0L)).cast("long")
        .as("n_tokens"),
      coalesce(sum(length(col(textCol))), lit(0L)).cast("long").as("n_chars"),
      coalesce(avg(length(col(textCol))), lit(0.0)).as("avg_chars"),
      coalesce(sum(when(TextFns.qualityScore(col(textCol)) >= 500000L, 1L)
        .otherwise(0L)), lit(0L)).cast("long").as("n_quality")).head()

    val topLang = docs.groupBy(col(langCol)).count()
      .orderBy(col("count").desc, col(langCol))
      .head(1).headOption.map(_.getAs[Long]("count")).getOrElse(0L)

    val dupGroups = DedupOps.exactDupGroups(docs, idCol,
      TextFns.fingerprint(col(textCol)))
    val dupStats = dupGroups.agg(
      coalesce(sum(col("n_dups") - 1), lit(0L)).cast("long").as("n_redundant"),
      count(lit(1)).cast("long").as("n_groups")).head()

    // packing readiness at the default 2048-token context: window count,
    // padding burn, oversize docs needing the chunker (q184's audit,
    // folded to corpus level for the card)
    val pack = graft.operators.DataSelection
      .packingStats(docs, idCol, textCol, budget = 2048L, nShards = 64)
      .agg(coalesce(sum(col("n_bins")), lit(0L)).cast("long").as("bins"),
        coalesce(sum(col("n_oversize")), lit(0L)).cast("long").as("oversize"),
        coalesce(sum(col("packed_tokens")), lit(0L)).cast("long").as("packed"))
      .head()
    val packFill =
      if (pack.getAs[Long]("bins") == 0L) 0L
      else math.floor(pack.getAs[Long]("packed") * 10000.0
        / (pack.getAs[Long]("bins") * 2048L) + 0.5).toLong

    def row(metric: String, value: Long) = (metric, value)
    Seq(
      row("n_docs", base.getAs[Long]("n_docs")),
      row("n_sources", base.getAs[Long]("n_sources")),
      row("n_languages", base.getAs[Long]("n_langs")),
      row("n_tokens", base.getAs[Long]("n_tokens")),
      row("n_chars", base.getAs[Long]("n_chars")),
      row("avg_chars_x100", math.round(base.getAs[Double]("avg_chars") * 100)),
      row("top_lang_docs", topLang),
      row("exact_dup_redundant_docs", dupStats.getAs[Long]("n_redundant")),
      row("exact_dup_groups", dupStats.getAs[Long]("n_groups")),
      row("quality_pass_docs", base.getAs[Long]("n_quality")),
      row("pack_windows_b2048", pack.getAs[Long]("bins")),
      row("pack_oversize_docs", pack.getAs[Long]("oversize")),
      row("pack_fill_x1e4", packFill)
    ).toDF("metric", "value")
  }
}
