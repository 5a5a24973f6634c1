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
