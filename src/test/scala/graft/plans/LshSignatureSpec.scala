package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions.lshSigNative
import graft.operators.VectorQueries
import org.apache.spark.sql.functions._

/** Pins the native [[LshSignature]] kernel bit-identical to its SQL twin
  * [[VectorQueries.lshSigExpr]] — the twin is the semantic reference; the
  * native kernel is what q43/q70/AnnStorage run.
  */
class LshSignatureSpec extends SparkSpec {

  test("native signature matches the SQL twin on every fixture vector") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        lshSigNative(col("embedding")).as("native"),
        expr(VectorQueries.lshSigExpr("embedding")).as("twin"))
    assert(e.count() > 0)
    val diff = e.filter(!(col("native") <=> col("twin")))
    assert(diff.isEmpty, s"diverging rows: ${diff.collect().mkString(", ")}")
    // signatures actually spread over buckets (not a degenerate constant)
    assert(e.select(col("native")).distinct().count() > 1)
  }

  test("degenerate shapes match the twin: short vector, null element, >64 dims") {
    import spark.implicits._
    val cases = Seq(
      Seq.fill(63)(Some(0.5f)),                       // short → NULL
      Seq.fill(64)(Some(0.5f)).updated(7, None),      // null element → NULL
      Seq.fill(64)(Some(0.5f)),                       // nominal
      Seq.fill(70)(Some(0.25f)),                      // twin pads planes ≥ 64
      Seq.fill(64)(Some(0.0f)),                       // all-zero: every dot = 0
    ).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val out = cases.select(
      lshSigNative(col("embedding")).as("native"),
      expr(VectorQueries.lshSigExpr("embedding")).as("twin"))
    assert(out.filter(!(col("native") <=> col("twin"))).isEmpty)
    val rows = out.collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(!rows(2).isNullAt(0) && !rows(3).isNullAt(0))
  }

  test("null input and the interpreted eval path match codegen") {
    import spark.implicits._
    val df = Seq(Option.empty[Seq[Float]], Some(Seq.fill(64)(1.0f)))
      .toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val cg = df.select(lshSigNative(col("embedding")).as("s")).collect()
    assert(cg(0).isNullAt(0))
    // interpreted path (nullSafeEval) — evaluate the expression directly
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(64)(1.0f))
    val interp = LshSignatureImpl.sig(arr)
    assert(interp != null && interp.intValue() == cg(1).getInt(0))
  }
}

/** Pins [[Md5LshSignature]] — the DuckDB-mirrorable md5-plane twin behind
  * q43b. The end-to-end pipeline oracle runs in the driver's DuckDB gate;
  * here the null contract, the >64-dim cap, the plane-constant derivation,
  * and interpreted≡codegen are pinned engine-side.
  */
class Md5LshSignatureSpec extends SparkSpec {
  import graft.functions.VectorFunctions.md5LshSigNative

  test("plane constants derive from the md5 hex prefix convention") {
    // independently recompute plane(1)(3) from the documented formula:
    // first 15 hex digits of md5("p1#3") as a 60-bit long, % 1000 / 1000 - .5
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("p1#3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val expected = (h % 1000L).toDouble / 1000.0 - 0.5
    assert(Md5LshSignatureImpl.planes(1)(3) == expected)
  }

  test("null contract: short vector and null element → NULL; >64 dims uses first 64") {
    import spark.implicits._
    val cases = Seq(
      Seq.fill(63)(Some(0.5f)),                  // short → NULL
      Seq.fill(64)(Some(0.5f)).updated(7, None), // null element → NULL
      Seq.fill(64)(Some(0.5f)),                  // nominal
      Seq.fill(70)(Some(0.5f)),                  // extra dims ignored
    ).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val rows = cases.select(md5LshSigNative(col("embedding")).as("s")).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(!rows(2).isNullAt(0))
    // dims beyond 64 contribute nothing: same signature as the 64-dim prefix
    assert(rows(3).getInt(0) == rows(2).getInt(0))
  }

  test("interpreted eval matches codegen and signatures spread over buckets") {
    val e = Tables.embeddings(spark, sfDir)
      .select(md5LshSigNative(col("embedding")).as("s"))
    assert(e.select("s").distinct().count() > 1)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(64)(1.0f))
    val interp = Md5LshSignatureImpl.sig(arr)
    import spark.implicits._
    val cg = Seq(Seq.fill(64)(1.0f)).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
      .select(md5LshSigNative(col("embedding"))).collect()(0).getInt(0)
    assert(interp != null && interp.intValue() == cg)
  }
}
