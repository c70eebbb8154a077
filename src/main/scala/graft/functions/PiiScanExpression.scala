package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII scan as one native codegen expression: emits
  * `struct<n_emails int, n_phones int, redacted string>` — the three
  * outputs [[graft.ops.TextAnalysis.piiFeatures]] previously paid FOUR
  * `java.util.regex` passes for (2 × `regexp_count` + 2 nested
  * `regexp_replace` over the full text; 15.3× the DuckDB oracle at
  * sf10 — r17 VERDICT "What's wrong" #3). Here the text is byte-scanned
  * three times with no regex machinery (emails: count+redact in one
  * walk; phones: count on the ORIGINAL text, redact on the
  * email-redacted text — the declared semantics count phones before
  * redaction but replace after emails are gone), allocating only the
  * output buffer. The `WsSplitExpr` treatment applied to the PII
  * surface.
  *
  * EXACT `java.util.regex` find()/replaceAll semantics for the two
  * declared patterns (which are also RE2-compatible — no backrefs or
  * lookaround — so the DuckDB oracle replays them; PiiScanSpec pins
  * equivalence against the Spark regexp_* forms property-style):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: the
  *    local-part run is unambiguous ('@' is outside the class, so the
  *    maximal run either ends at '@' or the start fails); the greedy
  *    domain backtracks to the LAST '.' in the maximal domain run that
  *    is followed by ≥2 letters, and the TLD run is maximal — both
  *    exactly what the backward dot scan below computes.
  *  - phone `\+?[0-9][0-9()\- ]{7,}[0-9]`: greedy middle + final digit
  *    ⇒ the match ends at the LAST digit of the maximal middle-class
  *    run that sits ≥ 8 positions after the first digit. Every byte
  *    class is ASCII and UTF-8 continuation bytes have the high bit
  *    set, so byte scanning can never split a code point into a match.
  *
  * Failed-start advance is amortized linear: a failed local run skips
  * to its end (every inner start shares the same non-'@' terminator), a
  * failed middle run skips to its end (inner starts need a later final
  * digit that cannot exist), so no position is rescanned more than a
  * constant number of times. */
case class PiiScanExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiScanExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scan requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    PiiScanExpr.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = PiiScanExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = (InternalRow) $helper.scan(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)
}

object PiiScanExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  // ASCII byte classes of the two declared patterns
  private def isLocal(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  private def isDomain(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '-'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isPhoneMid(b: Byte): Boolean =
    isDigit(b) || b == '(' || b == ')' || b == '-' || b == ' '

  /** Leftmost email match at-or-after `from`: packs (start, end) as
    * (start.toLong << 32) | end, or -1 when none. */
  private def findEmail(s: Array[Byte], from: Int): Long = {
    val n = s.length
    var p = from
    while (p < n) {
      if (!isLocal(s(p))) { p += 1 }
      else {
        // maximal local run [p, q); '@' is not local-class, so every
        // start inside a run that fails shares the same failure
        var q = p + 1
        while (q < n && isLocal(s(q))) q += 1
        if (q >= n || s(q) != '@') p = q
        else {
          // domain run [q+1, d1); find the LAST '.' with >= 2 letters
          // after it (greedy `[A-Za-z0-9.-]+` backtracking order), with
          // a non-empty domain part before the dot (j > q+1)
          var d1 = q + 1
          while (d1 < n && isDomain(s(d1))) d1 += 1
          var j = d1 - 1
          var end = -1
          while (end < 0 && j > q + 1) {
            if (s(j) == '.' && j + 1 < d1 && isAlpha(s(j + 1))) {
              var e = j + 1
              while (e < d1 && isAlpha(s(e))) e += 1
              if (e - (j + 1) >= 2) end = e
            }
            if (end < 0) j -= 1
          }
          if (end >= 0) return (p.toLong << 32) | end.toLong
          // local-part extensions from q+1 may reach past d1 (e.g. '_'
          // terminates the domain but continues a local run) — restart
          // the generic scan just after the '@'
          p = q + 1
        }
      }
    }
    -1L
  }

  /** Leftmost phone match at-or-after `from`, packed as findEmail. */
  private def findPhone(s: Array[Byte], from: Int): Long = {
    val n = s.length
    var p = from
    while (p < n) {
      val i0 = if (s(p) == '+') p + 1 else p
      if (i0 >= n || !isDigit(s(i0))) p += 1
      else {
        // maximal middle-class run [i0+1, m1); the final digit is the
        // last digit of the run at position >= i0+8 (middle {7,})
        var m1 = i0 + 1
        while (m1 < n && isPhoneMid(s(m1))) m1 += 1
        var j = m1 - 1
        while (j >= i0 + 8 && !isDigit(s(j))) j -= 1
        if (j >= i0 + 8) return (p.toLong << 32) | (j + 1).toLong
        // no inner start can need a LATER final digit than this run had
        p = math.max(p + 1, m1)
      }
    }
    -1L
  }

  private val EMAIL = "[EMAIL]".getBytes("US-ASCII")
  private val PHONE = "[PHONE]".getBytes("US-ASCII")

  /** Replace every match of `find` with `tag` in one walk; returns the
    * rewritten bytes (the input array itself when nothing matched) and
    * the match count. */
  private def replaceCount(s: Array[Byte], find: (Array[Byte], Int) => Long,
      tag: Array[Byte]): (Array[Byte], Int) = {
    var m = find(s, 0)
    if (m < 0) return (s, 0)
    val out = new java.io.ByteArrayOutputStream(s.length + 16)
    var last = 0
    var c = 0
    while (m >= 0) {
      val start = (m >>> 32).toInt
      val end = (m & 0xffffffffL).toInt
      out.write(s, last, start - last)
      out.write(tag, 0, tag.length)
      c += 1
      last = end
      m = if (end < s.length) find(s, end) else -1L
    }
    out.write(s, last, s.length - last)
    (out.toByteArray, c)
  }

  private def countAll(s: Array[Byte], find: (Array[Byte], Int) => Long): Int = {
    var c = 0
    var m = find(s, 0)
    while (m >= 0) {
      c += 1
      val end = (m & 0xffffffffL).toInt
      m = if (end < s.length) find(s, end) else -1L
    }
    c
  }

  /** Static entry for both interpreted and generated code paths.
    * Three byte walks: emails count+redact fused, phones counted on the
    * ORIGINAL text, phones redacted on the email-redacted text (the
    * declared order — a digit run inside a removed email address still
    * counts but is already gone before phone redaction). */
  def scan(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val (eRed, nEmails) = replaceCount(bytes, findEmail, EMAIL)
    val nPhones = countAll(bytes, findPhone)
    val (redacted, _) = replaceCount(eRed, findPhone, PHONE)
    new GenericInternalRow(Array[Any](nEmails, nPhones,
      if (redacted eq bytes) s else UTF8String.fromBytes(redacted)))
  }

  /** Column wrapper. */
  def piiScan(c: Column): Column =
    GraftColumnBridge.column(PiiScanExpr(GraftColumnBridge.expression(c)))
}
