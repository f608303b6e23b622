// A deliberate package escape hatch (cf. SNIPPETS.md [2], the pattern
// Spark's own `package object sql` uses): `ExpressionUtils.column` — the
// only public-API-free way to wrap a custom Catalyst Expression into a
// Column in Spark 4 — is `private[sql]`, so this one-object bridge lives in
// a subpackage of org.apache.spark.sql. Nothing else in the engine leaves
// the graft namespace.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

object SqlBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression from a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager localCheckpoint with MEASURED statistics instead of the
    * symbolic stats rewrite `Dataset.checkpoint` performs.
    *
    * The default rewrite (`LogicalRDD.fromDataset`) carries the source
    * plan's sizeInBytes ESTIMATE through the checkpoint — a product of
    * the join children's estimates. In an iterative algorithm whose
    * loop state feeds back into the next round's joins (pointer
    * doubling, label propagation), those products COMPOUND: k
    * checkpointed self-joins yield a BigInteger with ~2^k digits, and
    * past a few dozen squarings the driver stalls for minutes inside
    * BigInteger.multiply while planning — a pure bookkeeping artifact,
    * the data itself is tiny. This helper severs that lineage: it
    * materializes the frame, then rebuilds it as a bare [[LogicalRDD]]
    * whose statistics are the REAL measured row count times the
    * schema's default row width, so downstream broadcast decisions
    * still see honest sizes and the estimate chain restarts from
    * ground truth at every checkpoint.
    */
  def pinned(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    // LAZY checkpoint + count = ONE job (the count materializes the
    // checkpoint); the eager form runs an internal count to
    // materialize and we'd count again — two jobs for the same state.
    val ck = ds.localCheckpoint(eager = false)
    val rows = ck.count()
    rebuilt(ck, rows)
  }

  /** [[pinned]] fused with an iterative loop's integer convergence
    * probe: ONE Spark job materializes the lazy local checkpoint and
    * computes `count(*)` + `sum(probeCol)` together, instead of the
    * two the pin-then-probe pattern costs per round. Driver actions
    * are the wall clock of high-round loops (the r12 coloring lesson),
    * so fixpoint loops probing a monotone column sum each round should
    * use this. Returns (pinned frame, rows, sum — 0 when empty).
    */
  def pinnedSum(df: DataFrame, probeCol: String):
      (DataFrame, Long, Long) = {
    import org.apache.spark.sql.functions.col
    pinnedSum(df, col(probeCol))
  }

  /** [[pinnedSum]] with an arbitrary integer probe EXPRESSION (e.g.
    * `when(col("color").isNull, 1L).otherwise(0L)` for a drain test) —
    * still one Spark job for checkpoint + stats + probe.
    */
  def pinnedSum(df: DataFrame, probe: Column):
      (DataFrame, Long, Long) = {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val ck = ds.localCheckpoint(eager = false)
    val r = ck.agg(count(lit(1)).as("n"), sum(probe).as("s"))
      .first()
    val rows = r.getLong(0)
    val s = if (r.isNullAt(1)) 0L else r.getLong(1)
    (rebuilt(ck, rows), rows, s)
  }

  private def rebuilt(ck: org.apache.spark.sql.classic.Dataset[Row],
      rows: Long): DataFrame = {
    val out = ck.queryExecution.analyzed.output
    val width = 8L + out.map(_.dataType.defaultSize.toLong).sum
    val stats = Statistics(
      sizeInBytes = BigInt(math.max(rows, 1L)) * width,
      rowCount = Some(BigInt(rows)))
    val plan = LogicalRDD(out, ck.queryExecution.toRdd)(
      ck.sparkSession, Some(stats), None)
    org.apache.spark.sql.classic.Dataset.ofRows(ck.sparkSession, plan)
  }
}
