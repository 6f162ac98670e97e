package graft.functions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word and per-window hashing for the duplicated-span statistics
  * (Lee et al. 2022, arXiv:2107.06499 — see [[graft.ops.Dedup.dupSpanStats]]).
  *
  * Tokenization is the dedup family's contract, byte-for-byte: replace
  * `[^a-zA-Z0-9]+` runs with a space FIRST, then lowercase (post-replace
  * text is pure ASCII, so Locale.ROOT lowercasing is exact), split,
  * drop empties. Word hash is FNV-1a 64 over the ASCII bytes; the k-word
  * window hash folds the word hashes through a murmur-style 64-bit
  * finalizer per step (full avalanche — no polynomial structure for
  * near-identical windows to exploit). The hash is an INTERNAL grouping
  * key only: any injective-in-practice function preserves the group
  * counts the operator reports, which is why the DuckDB oracle (which
  * groups by the window string itself) stays hash-green. 64 bits are
  * collision-safe to ~10^9 windows; a 10^12-window corpus should widen
  * to two independent lanes (second seed) — noted, not needed here.
  */
object SpanHash {
  private val NonAlnum = Pattern.compile("[^a-zA-Z0-9]+")

  /** murmur3 fmix64 — full-avalanche 64-bit finalizer. */
  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33); x
  }

  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Tokens of `text` under the dedup-family contract. */
  def tokens(text: String): Array[String] =
    NonAlnum.split(text).iterator
      .filter(_.nonEmpty).map(_.toLowerCase(Locale.ROOT)).toArray

  /** All k-word window hashes of `text`, in order; empty when the text
    * has fewer than k tokens. One compiled pass — no per-element
    * interpreted lambdas (the HOF formulation this replaced spent ~50x
    * the CPU in boxed `aggregate`/`slice` evaluation). */
  def windowHashes(text: UTF8String, k: Int): ArrayData = {
    val ws = tokens(text.toString)
    if (ws.length < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = fnv64(ws(i)); i += 1 }
    val out = new Array[Long](ws.length - k + 1)
    var s = 0
    while (s < out.length) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < k) { h = fmix64(h ^ wh(s + j)); j += 1 }
      out(s) = h
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `span_hashes(text, k)`: array<long> of the text's k-word window
  * hashes (codegen'd — the static call stays inside the enclosing
  * whole-stage span; the heavy loop is compiled JVM code either way). */
case class SpanHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName window size must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(t: Any): Any =
    SpanHash.windowHashes(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHash.windowHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  /** Column form for the DataFrame API. */
  def apply(text: Column, k: Int): Column =
    GraftShims.column(SpanHashes(GraftShims.expression(text), k))

  val functionName = "span_hashes"

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$functionName expects 2 arguments")
    // eval() of a foldable expression can be NULL (CAST(NULL AS INT)) or an
    // out-of-int-range long — both must surface as the same clear argument
    // error as a non-literal, not a bare NPE/NumberFormatException
    val k = children(1) match {
      case e if e.foldable && (e.dataType == IntegerType || e.dataType == LongType) =>
        e.eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue()
          case v => throw new IllegalArgumentException(
            s"$functionName window size must be a non-null int-range literal, got $v")
        }
      case other => throw new IllegalArgumentException(
        s"$functionName window size must be an integer literal, got $other")
    }
    SpanHashes(children.head, k)
  }

  val info = new ExpressionInfo(classOf[SpanHashes].getName, functionName)
}
