package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions (reference O2 cosine top-k,
  * `embeddings/local_embedder.py:92-142`).
  *
  * `dot` uses the codegen'd Catalyst expression [[DotProductExpr]]; the
  * `dotHof` higher-order-function form is kept for cross-checking and as the
  * pure-builtin fallback. Both widen elements to double before multiplying,
  * so results are bit-identical to a double-precision oracle.
  */
object VectorFns {

  /** Dot product via the native codegen expression. */
  def dot(a: Column, b: Column): Column = DotProductExpr.dot(a, b)

  /** Dot product via builtins (zip_with + aggregate) — slower (lambda frame
    * per element, breaks whole-stage codegen) but dependency-free; used in
    * tests to cross-validate the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers with a precomputed norm column should use
    * dot(a,b)/(normA*normB) directly to avoid recomputing norms per pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
