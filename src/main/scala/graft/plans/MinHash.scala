package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel: MinHash signature + LSH band hashes over a shingle array, in ONE
  * pass. Each shingle is string-hashed once (xxhash64, seed 42); the k
  * minhash functions are integer re-hashes (XXH64.hashLong) of that value;
  * band j's hash chains its band's minhashes. Returns array<long> of
  * numHashes/bandSize band hashes.
  *
  * Exists as a native expression because the SQL formulation (16 projection
  * columns each referencing a shared `transform(...)` column) gets its
  * shared subexpression inlined into every column by CollapseProject —
  * recomputing the shingle hashing 16× in interpreted higher-order lambdas.
  * Here the whole signature is one codegen-callable loop per row.
  */
object MinHashImpl {
  def bands(arr: ArrayData, numHashes: Int, bandSize: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(h, j.toLong)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      t += 1
    }
    val nBands = numHashes / bandSize
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 42L
      var r = 0
      while (r < bandSize) { acc = XXH64.hashLong(mins(b * bandSize + r), acc); r += 1 }
      out(b) = acc
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** minhash_bands(array<string>, numHashes, bandSize) → array<bigint>. */
case class MinHashBands(child: Expression, numHashes: Int, bandSize: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 && bandSize > 0 &&
      numHashes % bandSize == 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"numHashes ($numHashes) must be a positive multiple of bandSize ($bandSize)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.bands(input.asInstanceOf[ArrayData], numHashes, bandSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashImpl.bands($c, $numHashes, $bandSize)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The DuckDB-mirrorable MinHash twin (same role as [[Md5SimHashImpl]] for
  * SimHash): minhash function j of shingle t is the 60-bit md5-nibble hash
  * of the decorated string `"<j>#<t>"`, and band b's hash is the same
  * md5-nibble hash of its 4 minhashes joined with `#` in decimal — every
  * step is `CAST('0x' || substr(md5(…), 1, 15) AS BIGINT)` in SQL, so the
  * whole signature is recomputable in DuckDB. k× slower than
  * [[MinHashImpl]] (k string md5s per shingle instead of one xxhash64 plus
  * k integer re-hashes): q41 keeps the fast kernel, q41b binds this one to
  * put the LSH pipeline under the cross-engine differential gate.
  * Returns null for an empty shingle array (a min over nothing is
  * undefined in both engines).
  */
object Md5MinHashImpl {
  /** hash functions 2k and 2k+1 come from ONE digest of `"<k>#<tok>"`:
    * the first 15 and the 17th–31st hex digits (skipping the 16th keeps
    * both slices independent 60-bit views and both trivially SQL-mirrorable
    * as `substr(md5(…), 1, 15)` / `substr(md5(…), 17, 15)` — the shared
    * [[Md5SimHashImpl.parse60]]). Halves the md5 count per shingle vs one
    * digest per hash function — measured on the q41b twin, the only
    * caller. */
  def bands(arr: ArrayData, numHashes: Int, bandSize: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val digest = Md5SimHashImpl.digester // hoisted out of the hot loops
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t).toString
      var k = 0
      while (k * 2 < numHashes) {
        val dg = digest.digest((k.toString + "#" + tok).getBytes("UTF-8"))
        val m0 = Md5SimHashImpl.parse60(dg, 0)
        val m1 = Md5SimHashImpl.parse60(dg, 8)
        if (m0 < mins(k * 2)) mins(k * 2) = m0
        if (k * 2 + 1 < numHashes && m1 < mins(k * 2 + 1)) mins(k * 2 + 1) = m1
        k += 1
      }
      t += 1
    }
    val nBands = numHashes / bandSize
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      val joined = mins.slice(b * bandSize, (b + 1) * bandSize).mkString("#")
      out(b) = Md5SimHashImpl.tokenHash(joined.getBytes("UTF-8"))
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** minhash_bands_md5(array<string>, numHashes, bandSize) → array<bigint>. */
case class Md5MinHashBands(child: Expression, numHashes: Int, bandSize: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_bands_md5"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 && bandSize > 0 &&
      numHashes % bandSize == 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"numHashes ($numHashes) must be a positive multiple of bandSize ($bandSize)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands_md5 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5MinHashImpl.bands(input.asInstanceOf[ArrayData], numHashes, bandSize)

  // NOT defineCodeGen: the kernel returns null for an EMPTY shingle array
  // (a min over nothing is undefined — mirrors DuckDB's list_min([])), and
  // defineCodeGen never re-checks the result's nullness, so the raw null
  // ArrayData would NPE downstream codegen (posexplode). Set the null flag
  // explicitly instead of calling the kernel on empty input.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Md5MinHashImpl.bands($c, $numHashes, $bandSize);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig_md5(array<string>, numHashes) → the k minhash VALUES
  * (not bands): minhash i of token t = the first-8-hex-digit 32-bit
  * parse of md5("<i>#<t>"), i = 1..k — exactly
  * `('0x' || substr(md5(CAST(i AS VARCHAR) || '#' || t), 1, 8))::BIGINT`
  * in SQL, the q187 calibration family. The native loop replaces a
  * k-wide interpreted transform/array_min/conv chain (measured 7.7 s →
  * sub-second on the q187 sf0.1 scan). Empty input → null (list_min([])
  * semantics, the minhash_bands_md5 convention).
  */
object Md5MinHashSigImpl {
  def sig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val digest = Md5SimHashImpl.digester
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t).toString
      var i = 0
      while (i < numHashes) {
        val dg = digest.digest(((i + 1).toString + "#" + tok).getBytes("UTF-8"))
        val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
          ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    ArrayData.toArrayData(mins)
  }
}

case class Md5MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_sig_md5"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"numHashes ($numHashes) must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_md5 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5MinHashSigImpl.sig(input.asInstanceOf[ArrayData], numHashes)

  // kernel returns null on empty input — nullSafeCodeGen with an explicit
  // flag, never defineCodeGen (the minhash_bands_md5 NPE gotcha)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Md5MinHashSigImpl.sig($c, $numHashes);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
