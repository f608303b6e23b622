// A deliberate package escape hatch (cf. SNIPPETS.md [2], the pattern
// Spark's own `package object sql` uses): `ExpressionUtils.column` — the
// only public-API-free way to wrap a custom Catalyst Expression into a
// Column in Spark 4 — is `private[sql]`, so this one-object bridge lives in
// a subpackage of org.apache.spark.sql. Nothing else in the engine leaves
// the graft namespace.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression from a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
