package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metadata-enrichment derivations (reference P10-P12,
  * `preprocessing/metadata_enricher.py:56-170`): importance scoring,
  * keyword-priority domain classification, decade bucketing. Pure column
  * arithmetic — no UDFs, fully codegen'd.
  */
object Enrichment {

  /** Importance score (P10 `metadata_enricher.py:91-129`):
    * `min(100, 10·log10(value+1) · recency)` with
    * `recency = max(0.5, 1 - age/50)`. Emitted fixed-point ×10⁴ (see
    * TextFns.qualityScore for why floor-scale, not round).
    */
  def importanceScore(value: Column, yearCol: Column, nowYear: Int): Column = {
    val recency = greatest(lit(0.5), lit(1.0) - (lit(nowYear) - yearCol) / 50.0)
    val raw = least(lit(100.0), lit(10.0) * log10(value + 1.0) * recency)
    floor(raw * 10000 + 0.5).cast("long")
  }

  /** Decade bucket (P12): `year // 10 * 10`. */
  def decade(yearCol: Column): Column =
    (floor(yearCol / 10) * 10).cast("long")

  /** Keyword-priority classification (P11 `metadata_enricher.py:131-170`):
    * first keyword group that matches wins; fallback label otherwise.
    */
  def classify(c: Column, rules: Seq[(String, String)], fallback: String): Column =
    rules.foldRight(lit(fallback): Column) { case ((kw, label), acc) =>
      when(c.contains(kw), label).otherwise(acc)
    }
}
