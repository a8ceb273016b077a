package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing rolling-hash fingerprint as a native Catalyst expression.
  *
  * Semantics identical to the relational form in
  * [[graft.ops.Text.fingerprint]] (and the DuckDB oracle): word value =
  * 60-bit md5 (`conv(substr(md5(w),1,15),16,10)`) mod `mod`; polynomial
  * Rabin–Karp hash of every `k`-word window (base `base`, modulus `mod`);
  * result = minimum window hash, or NULL for documents shorter than `k`
  * words.
  *
  * Why a custom expression: built-ins can only express the k-word rolling
  * window by exploding every word into k offset copies and re-aggregating
  * twice (k-fold row blowup + two shuffles per document batch). This
  * computes the same value in ONE streaming pass over the words array —
  * per-row, no explode, no shuffle — and participates in whole-stage
  * codegen via a static call (no boxing, no interpreter fallback).
  * Preference order per the engine's design rules: compose built-ins
  * where possible (the relational form remains, cross-checked in tests);
  * drop to a custom Expression only where built-ins force a blowup —
  * this is that case.
  */
case class WinnowFingerprint(child: Expression, k: Int, base: Long,
                             mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val r = WinnowFingerprint.compute(
      input.asInstanceOf[ArrayData], k, base, mod)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("winnowResult")
      s"""
         |long $r = graft.functions.WinnowFingerprint.compute(
         |  $c, $k, ${base}L, ${mod}L);
         |if ($r == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprint = copy(child = newChild)
}

object WinnowFingerprint {

  // one digest per executor thread, not per row — compute() sits inside
  // whole-stage codegen's per-row loop
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 60-bit value of the first 15 hex chars of md5(word) — byte-level
    * equivalent of `conv(substr(md5(w), 1, 15), 16, 10)`.
    */
  private def hash60(md: MessageDigest, word: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(word)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** One-pass winnowing over the words array. Returns Long.MinValue as
    * the "no fingerprint" sentinel (true fingerprints are in [0, mod)).
    */
  def compute(words: ArrayData, k: Int, base: Long, mod: Long): Long = {
    val n = words.numElements()
    if (n < k) return Long.MinValue
    val md = digests.get()
    // word hashes mod `mod`
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null array elements cannot occur for split() output; treat
      // defensively as empty string
      val w = words.getUTF8String(i)
      val bytes = if (w == null) Array.emptyByteArray else w.getBytes
      wh(i) = hash60(md, bytes) % mod
      i += 1
    }
    // powers base^(k-1-j) mod `mod`; the first window is summed
    // directly, every later one by the O(1) Rabin–Karp rolling update
    // h' = (h − wh[s]·base^(k−1))·base + wh[s+k]  (all mod `mod`) —
    // O(n) total, not O(n·k). Safe in longs because the extension
    // registration caps mod at floor(sqrt(2^63)), so every product of
    // two residues fits.
    val pow = new Array[Long](k)
    var j = k - 1
    var p = 1L
    while (j >= 0) { pow(j) = p; p = p * base % mod; j -= 1 }
    val powK1 = pow(0) // base^(k-1) mod `mod`
    var h = 0L
    var t = 0
    while (t < k) { h += wh(t) * pow(t) % mod; t += 1 }
    h %= mod
    var best = h
    var start = 1
    while (start + k <= n) {
      h = (h + mod - wh(start - 1) * powK1 % mod) % mod
      h = h * base % mod
      h = (h + wh(start - 1 + k)) % mod
      if (h < best) best = h
      start += 1
    }
    best
  }
}
