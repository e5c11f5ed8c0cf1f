package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text chunking for embedding pipelines (reference P8,
  * `preprocessing/chunker.py:26-214`): sentence-split, greedily pack
  * sentences to a token budget (estimated chars/4), carry a token-overlap
  * tail between chunks, hard-split sentences that exceed the budget on
  * their own, and drop sub-minimum fragments.
  *
  * Re-expressed (not ported): the semantics below are defined from the
  * reference's observable behavior — budget 512 est. tokens, 50-token
  * overlap, 100-char minimum (`embeddings/config.py:63-64`).
  *
  * Execution shape: a pure per-row expansion — `udf` returning
  * `array<struct>` + `explode`. No shuffle, fully parallel; at 100 TB this
  * is a narrow map stage whose output is ~1-3× the input rows.
  */
object Chunking {

  case class Chunk(
      chunk_id: String,
      position: Int,
      text: String,
      token_count: Int,
      start_char: Int,
      end_char: Int)

  val maxTokens = 512
  val overlapTokens = 50
  val minChars = 100

  private def estTokens(s: String): Int = s.length / 4

  /** Split into sentences at `.!?` + whitespace (reference sentence regex
    * `(?<=[.!?])\s+`, re-expressed without lookbehind), each with its
    * document start offset.
    */
  private[operators] def sentencesWithOffsets(text: String): Seq[(String, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var start = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      val isEnd = (ch == '.' || ch == '!' || ch == '?') &&
        i + 1 < text.length && text.charAt(i + 1).isWhitespace
      if (isEnd) {
        out += ((text.substring(start, i + 1), start))
        i += 1
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        start = i
      } else i += 1
    }
    if (start < text.length) out += ((text.substring(start), start))
    out.toSeq
  }

  private[operators] def sentences(text: String): Seq[String] =
    sentencesWithOffsets(text).map(_._1)

  /** Chunk one document. Deterministic, no clock/random — safe for
    * oracle-stable tests.
    *
    * Offset semantics: `start_char` is the DOCUMENT offset of the chunk's
    * first *new* piece (the seeded overlap text belongs to the previous
    * chunk's range); `end_char` is the document offset just past its last
    * piece. Both always lie within [0, text.length] — chunk text itself is
    * whitespace-normalized at piece joins, so it is not guaranteed to be a
    * verbatim substring of the document.
    */
  def chunk(docId: String, text: String): Seq[Chunk] = {
    if (text == null || text.isEmpty) return Seq.empty
    val maxChars = maxTokens * 4
    val overlapChars = overlapTokens * 4

    // Hard-split any single sentence that exceeds the budget by itself,
    // preserving document offsets.
    val pieces = sentencesWithOffsets(text).flatMap { case (s, off) =>
      if (s.length <= maxChars) Seq((s, off))
      else s.grouped(maxChars).toSeq.zipWithIndex
        .map { case (p, j) => (p, off + j * maxChars) }
    }

    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    val sb = new StringBuilder
    var firstStart = 0
    var lastEnd = 0
    pieces.foreach { case (s, off) =>
      val candidate = if (sb.isEmpty) s else sb.toString + " " + s
      if (estTokens(candidate) <= maxTokens || sb.isEmpty) {
        if (sb.isEmpty) firstStart = off
        sb.clear(); sb.append(candidate)
        lastEnd = off + s.length
      } else {
        chunks += ((sb.toString, firstStart, lastEnd))
        // overlap: last overlapChars of the finished chunk seed the next
        val tail = sb.toString.takeRight(overlapChars)
        sb.clear(); sb.append(tail + " " + s)
        firstStart = off
        lastEnd = off + s.length
      }
    }
    if (sb.nonEmpty) chunks += ((sb.toString, firstStart, lastEnd))

    chunks.toSeq.zipWithIndex.flatMap { case ((c, s0, e0), i) =>
      if (c.length >= minChars)
        Some(Chunk(s"${docId}_chunk_$i", i, c, estTokens(c), s0, e0))
      else None
    }
  }

  /** DataFrame operator: expand `textCol` into chunk rows, keeping `idCol`. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chunkUdf = udf((id: String, text: String) => chunk(id, text))
    df.withColumn("__chunks", chunkUdf(col(idCol).cast("string"), col(textCol)))
      .select(col(idCol), explode(col("__chunks")).as("chunk"))
      .select(
        col(idCol),
        col("chunk.chunk_id").as("chunk_id"),
        col("chunk.position").as("position"),
        col("chunk.text").as("chunk_text"),
        col("chunk.token_count").as("token_count"),
        col("chunk.start_char").as("start_char"),
        col("chunk.end_char").as("end_char"))
  }

  /** Re-estimated token count as a column (for budget accounting). */
  def estTokensCol(c: Column): Column = (length(c) / 4).cast("int")

  /** Catalyst Generator form of the chunker (SURVEY.md §4.3(b)): a true
    * UDTF — rows stream out of `eval` without materializing the
    * per-document chunk array the UDF+explode form builds. Same `chunk`
    * semantics; equality asserted in ChunkingSpec.
    */
  def chunkDocumentsGen(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val gen = ChunkGenerator(
      GraftBridge.expression(col(idCol).cast("string")),
      GraftBridge.expression(col(textCol)))
    df.select(col(idCol), GraftBridge.column(gen).as(
      Seq("chunk_id", "position", "chunk_text", "token_count",
        "start_char", "end_char")))
  }
}

/** Generator expression backing [[Chunking.chunkDocumentsGen]]. */
case class ChunkGenerator(idExpr: org.apache.spark.sql.catalyst.expressions.Expression,
                          textExpr: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(idExpr, textExpr)

  override def elementSchema: StructType = new StructType()
    .add("chunk_id", StringType)
    .add("position", IntegerType)
    .add("chunk_text", StringType)
    .add("token_count", IntegerType)
    .add("start_char", IntegerType)
    .add("end_char", IntegerType)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val id = idExpr.eval(input)
    val text = textExpr.eval(input)
    if (id == null || text == null) Iterator.empty
    else Chunking.chunk(id.toString, text.toString).iterator.map { c =>
      InternalRow(UTF8String.fromString(c.chunk_id), c.position,
        UTF8String.fromString(c.text), c.token_count, c.start_char, c.end_char)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkGenerator =
    copy(idExpr = newChildren(0), textExpr = newChildren(1))
}
