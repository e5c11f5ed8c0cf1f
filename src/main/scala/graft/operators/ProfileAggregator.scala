package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass text-profile aggregation as a typed `Aggregator` (SURVEY.md
  * §2.11's reserved custom-UDAF slot): a single shuffle-free partial/final
  * pass produces count, null count, char totals and extrema — the profile
  * the reference assembled with several pandas passes
  * (`schema_validator.py:289-350`).
  */
object ProfileAggregator {

  final case class Buf(n: Long, nulls: Long, chars: Long,
                       minLen: Long, maxLen: Long)
  final case class Profile(n_rows: Long, n_nulls: Long, total_chars: Long,
                           min_len: Long, max_len: Long, avg_len: Double)

  val textProfile: Aggregator[String, Buf, Profile] =
    new Aggregator[String, Buf, Profile] {
      override def zero: Buf = Buf(0, 0, 0, Long.MaxValue, Long.MinValue)

      override def reduce(b: Buf, s: String): Buf =
        if (s == null) b.copy(n = b.n + 1, nulls = b.nulls + 1)
        else Buf(b.n + 1, b.nulls, b.chars + s.length,
          math.min(b.minLen, s.length), math.max(b.maxLen, s.length))

      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.nulls + b.nulls, a.chars + b.chars,
          math.min(a.minLen, b.minLen), math.max(a.maxLen, b.maxLen))

      override def finish(b: Buf): Profile = {
        val nonNull = b.n - b.nulls
        Profile(b.n, b.nulls, b.chars,
          if (nonNull == 0) 0 else b.minLen,
          if (nonNull == 0) 0 else b.maxLen,
          if (nonNull == 0) 0.0 else b.chars.toDouble / nonNull)
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Profile] = Encoders.product[Profile]
    }
}
