package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Readability raw counts as ONE native codegen byte walk:
  * `struct<n_words long, n_sentences long, n_syllables long>`.
  *
  * The declarative form ([[graft.ops.TextAnalysis.readability]] pre-r18)
  * paid an INTERPRETED `regexp_count(w, '[aeiouy]+')` lambda PER WORD
  * inside `aggregate(transform(...))` plus a full-text `regexp_count`
  * for sentences and a `ws_split` for the word count — three independent
  * passes, the per-word one through java.util.regex with a fresh matcher
  * per token (~150 µs/doc measured at sf0.1). Every byte class here is
  * ASCII and UTF-8 continuation bytes have the high bit set, so one
  * byte walk reproduces all three counts exactly.
  *
  * EXACT declarative semantics (TextStatsSpec pins equivalence):
  *  - n_words = `size(ws_split(trim(lower(text))))`: `trim` strips
  *    0x20 ONLY (Spark's trim), `ws_split` splits on runs of
  *    `[ \t\n\x0B\f\r]` keeping boundary empties — so the count is
  *    (whitespace runs inside the trimmed text) + 1;
  *  - n_sentences = `greatest(regexp_count(text, '[.!?]+'), 1)`: maximal
  *    runs of the class over the WHOLE text (leading/trailing spaces
  *    carry no [.!?], so counting on the trimmed bytes is identical);
  *  - n_syllables = Σ over ws_split tokens of
  *    `greatest(regexp_count(token, '[aeiouy]+'), 1)`: maximal vowel
  *    runs per token, floored at 1 — boundary empty tokens contribute 1
  *    exactly as the declarative fold does.
  *
  * The child must be the LOWERED text (the wrapper passes
  * `lower(text)`): the declarative word/syllable side tokenizes
  * `lower(text)` and `[.!?]` is case-invariant, so one lowered walk
  * serves all three counts. */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    TextStatsExpr.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = TextStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = (InternalRow) $helper.scan(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
  private def isVowel(b: Byte): Boolean =
    b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u' || b == 'y'
  private def isSent(b: Byte): Boolean =
    b == '.' || b == '!' || b == '?'

  /** Static entry for both interpreted and generated code paths. */
  def scan(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    // Spark trim(): leading/trailing 0x20 only
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    var words = 1L       // segments = ws runs + 1
    var sentences = 0L
    var syllables = 0L
    var tokVowelRuns = 0L
    var inWs = false
    var inVowel = false
    var inSent = false
    var i = lo
    while (i < hi) {
      val b = bytes(i)
      val ws = isWs(b)
      if (ws && !inWs) {
        words += 1L
        // close the current token: zero vowel runs still counts 1
        syllables += (if (tokVowelRuns == 0L) 1L else tokVowelRuns)
        tokVowelRuns = 0L
      }
      inWs = ws
      val v = !ws && isVowel(b)
      if (v && !inVowel) tokVowelRuns += 1L
      inVowel = v
      val sn = isSent(b)
      if (sn && !inSent) sentences += 1L
      inSent = sn
      i += 1
    }
    syllables += (if (tokVowelRuns == 0L) 1L else tokVowelRuns)
    if (sentences == 0L) sentences = 1L
    new GenericInternalRow(Array[Any](words, sentences, syllables))
  }

  /** Column wrapper over RAW text: lowering stays Spark's `lower`. */
  def textStats(text: Column): Column =
    GraftColumnBridge.column(TextStatsExpr(
      GraftColumnBridge.expression(org.apache.spark.sql.functions.lower(text))))
}
