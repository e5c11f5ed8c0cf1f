package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Exact frequent-token mining via a count-min-sketch candidate pass.
  *
  * Pass 1 folds every token into a fixed-size CMS (depth×width longs) —
  * a narrow, shuffle-free partial/final aggregation whose merged state is
  * KBs regardless of vocabulary size. Because CMS only ever OVERcounts,
  * every truly-frequent token is a candidate (no false negatives); pass 2
  * exact-counts candidates only and drops the false positives, so the
  * result is EXACTLY the tokens with true count ≥ minCount.
  *
  * Scale: the naive form shuffles every distinct token of a 100 TB corpus
  * to count it; here the shuffle carries only tokens whose sketch estimate
  * clears the threshold — for a heavy-hitter query that is a vanishing
  * fraction of the stream. Driver state is the depth×width sketch
  * (e.g. 4×8192 longs = 256 KB), broadcast back as the candidate filter.
  * (Cormode & Muthukrishnan, "An Improved Data Stream Summary: the
  * Count-Min Sketch and its Applications".)
  */
object HeavyHitters {

  final case class CmsBuf(cells: Array[Long])

  private def slot(d: Int, w: String, width: Int): Int = {
    val h = MurmurHash3.stringHash(w, 0x9e3779b9 * (d + 1))
    ((h % width) + width) % width
  }

  /** CMS point estimate: min over rows (upper bound on the true count). */
  def estimate(cells: Array[Long], depth: Int, width: Int, w: String): Long = {
    var m = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = cells(d * width + slot(d, w, width))
      if (c < m) m = c
      d += 1
    }
    m
  }

  def cmsAggregator(depth: Int, width: Int): Aggregator[String, CmsBuf, CmsBuf] =
    new Aggregator[String, CmsBuf, CmsBuf] {
      override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

      override def reduce(b: CmsBuf, w: String): CmsBuf = {
        if (w != null) {
          var d = 0
          while (d < depth) {
            b.cells(d * width + slot(d, w, width)) += 1L
            d += 1
          }
        }
        b
      }

      override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
        val out = a.cells
        var i = 0
        while (i < out.length) { out(i) += b.cells(i); i += 1 }
        CmsBuf(out)
      }

      override def finish(b: CmsBuf): CmsBuf = b

      override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
      override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    }

  /** Tokens of `textCol` with exact count ≥ minCount, as (w, cnt) rows. */
  def frequentTokens(df: DataFrame, textCol: String, minCount: Long,
                     depth: Int = 4, width: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(DedupOps.tokens(col(textCol))).as("w"))
    val sketch = toks.as[String]
      .select(cmsAggregator(depth, width).toColumn).head().cells
    val bc = spark.sparkContext.broadcast(sketch)
    val isCandidate = udf { w: String =>
      w != null && estimate(bc.value, depth, width, w) >= minCount
    }
    toks.filter(isCandidate(col("w")))
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
