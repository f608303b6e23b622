package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `array<float>` embedding columns.
  * Dot products are sequential left folds over exactly-widened floats
  * (float→double is lossless), so results are bit-identical to the DuckDB
  * `list_reduce` twin — no UDFs, no MLlib dependency.
  */
object VectorFns {
  /** Σ aᵢ·bᵢ in double precision (left fold, deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** DuckDB twin of [[dot]]. */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin.replace("\n", " ")

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"
}
