package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for dense-vector math over `array<float>` columns.
  *
  * Everything is expressed with codegen'd higher-order functions (zip_with /
  * aggregate) — no UDFs — so whole-stage codegen keeps the hot loop fused.
  * Floats are cast to double per element BEFORE multiplication and the fold is
  * strictly sequential, making results bit-identical across engines/runs
  * regardless of partitioning (the fold is per-row, not an aggregation).
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Sequential left-fold sum of a double-array column. */
  def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => d(x) * d(y)))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = fsum(transform(a, x => d(x) * d(x)))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Native codegen'd cosine (graft.plans.CosineSimilarity) — bit-identical
    * to [[cosine]], but a primitive loop inside whole-stage codegen instead
    * of interpreted higher-order lambdas. Requires GraftExtensions. */
  def cosineNative(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Native codegen'd dot product (graft.plans.DotProduct). */
  def dotNative(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Native codegen'd 6-bit LSH hyperplane signature
    * (graft.plans.LshSignature) — bit-identical to the SQL twin
    * [[graft.operators.VectorQueries.lshSigExpr]], but the plane matrix is
    * built once at class load instead of 6×64 string hashes per row in
    * interpreted lambdas. Requires GraftExtensions. */
  def lshSigNative(emb: Column): Column =
    call_function("lsh_sig", emb)

  /** The md5-plane twin of [[lshSigNative]] (graft.plans.Md5LshSignature):
    * same 6-bit hyperplane bucketing, plane constants derived from md5 so
    * DuckDB can recompute the signature — the q43b end-to-end ANN oracle. */
  def md5LshSigNative(emb: Column): Column =
    call_function("lsh_sig_md5", emb)

  /** DuckDB oracle fragment mirroring [[dot]] exactly (sequential double
    * fold over per-element products). The index bound derives from
    * len() so a fixture-dimension change can't silently skew the oracle;
    * fragments that can't express len() (DuckDB's generate_series takes no
    * lateral column refs) are guarded by the dimension pin in
    * TablesSchemaSpec instead. */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** DuckDB oracle fragment mirroring [[norm2]]. */
  def sqlNorm2(a: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x)"

  /** DuckDB oracle fragment mirroring [[cosine]]. */
  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlNorm2(a)}) * sqrt(${sqlNorm2(b)}))"
}
