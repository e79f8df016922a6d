package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass shingle preparation for the near-dup family.
  *
  * The declarative forms these replace ran a STACK of interpreted
  * higher-order lambdas per document — n-gram concat via
  * `transform(sequence(...))`, a second `transform` for xxhash64, a
  * third for md5, then EIGHT `array_min(transform(substring))` walks
  * for the minhash windows: ~11 interpreted array traversals with
  * per-element lambda invocation and boxing, repeated for every
  * document of the corpus. Here each document is prepared in ONE
  * compiled method call (the CharBigramsUtil static-call pattern —
  * the expression stays inside whole-stage codegen).
  *
  * Exact-equivalence contract (the DuckDB oracles hash against it):
  *  - n-gram strings are `concat_ws(' ', t[i], ..., t[i+n-1])` —
  *    UTF8String.concatWs, byte-identical to the SQL form;
  *  - hashes are XxHash64Function.hash(_, StringType, seed=42) —
  *    the exact function SQL `xxhash64(str)` evaluates;
  *  - md5 windows replicate `substr(md5(shingle), 3i+1, 8)` on the
  *    lowercase-hex md5 (ASCII, so Java String ordering == UTF8
  *    binary ordering for the per-window minimum);
  *  - the hash set is distinct-by-HASH, sorted ascending — exactly
  *    `sort_array(array_distinct(transform(sh, xxhash64)))`. (A
  *    64-bit collision between two distinct shingles of one document
  *    would collapse to one entry — the same accepted risk the
  *    declarative array_distinct-on-hashes form carries.)
  */
object ShingleUtil {
  private val emptyLongs = new GenericArrayData(Array.empty[Long])

  /** Distinct n-gram strings of one token array (insertion order). */
  private def distinctNgrams(arr: ArrayData, n: Int): java.util.LinkedHashSet[UTF8String] = {
    val len = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (len < n) return out
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val window = new Array[UTF8String](n)
    var k = 0
    while (k <= len - n) {
      System.arraycopy(toks, k, window, 0, n)
      out.add(if (n == 1) toks(k) else UTF8String.concatWs(space, window: _*))
      k += 1
    }
    out
  }

  /** Sorted distinct xxhash64 longs of the n-gram set. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val grams = distinctNgrams(arr, n)
    if (grams.isEmpty) return emptyLongs
    val hs = new Array[Long](grams.size)
    val it = grams.iterator()
    var i = 0
    while (it.hasNext) { hs(i) = XxHash64Function.hash(it.next(), StringType, 42L); i += 1 }
    java.util.Arrays.sort(hs)
    // dedup-by-hash in place (collisions only; usually a no-op)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** (sorted distinct shingle hashes, 8 minhash window minima) in one
    * pass: md5 computed ONCE per distinct shingle, windows compared
    * as they stream by. */
  def minhashPrep(arr: ArrayData, n: Int): GenericInternalRow = {
    val grams = distinctNgrams(arr, n)
    val mins = new Array[String](8)
    val hs = new Array[Long](grams.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = grams.iterator()
    var i = 0
    while (it.hasNext) {
      val g = it.next()
      hs(i) = XxHash64Function.hash(g, StringType, 42L)
      i += 1
      md.reset()
      val hex = hexLower(md.digest(g.getBytes))
      var w = 0
      while (w < 8) {
        val win = hex.substring(3 * w, 3 * w + 8)
        if (mins(w) == null || win.compareTo(mins(w)) < 0) mins(w) = win
        w += 1
      }
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    val sl: ArrayData =
      if (hs.isEmpty) emptyLongs
      else new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
    val minsAny = new Array[Any](8)
    var mi = 0
    while (mi < 8) {
      minsAny(mi) = if (mins(mi) == null) null else UTF8String.fromString(mins(mi))
      mi += 1
    }
    new GenericInternalRow(Array[Any](sl, new GenericArrayData(minsAny)))
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hexLower(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** `graft_shingle_hashes(array<string>, n) -> array<long>` — sorted
  * distinct xxhash64 of the space-joined n-token windows. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_minhash_prep(array<string>, n) ->
  * struct<sl: array<long>, mins: array<string>>` — the shingle hash
  * set plus the 8 md5-window minhash minima, one pass. */
case class MinhashPrep(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_minhash_prep: n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("sl", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("mins", ArrayType(StringType, containsNull = true), nullable = false)))
  override def prettyName: String = "graft_minhash_prep"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_prep expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.minhashPrep(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.minhashPrep($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinhashPrep =
    copy(child = newChild)
}
