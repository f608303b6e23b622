package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable graph validation — the reference's abstract `GraphValidator`
  * ([GH] flink/graphs/validation/GraphValidator.java), whose shipped
  * instance is `InvalidVertexIdsValidator`. A validator reports VIOLATION
  * rows (empty result ⇒ valid) rather than a bare boolean, so the check
  * stays fully distributed — no driver-side collect — and callers can
  * count, inspect, or sink the offending rows. Run via
  * [[Graph.validate]].
  */
trait GraphValidator {
  /** Violation rows for `g`; empty ⇒ the graph passes this validator. */
  def validate(g: Graph): DataFrame
}

/** Edge endpoints missing from the vertex set ([GH]
  * validation/InvalidVertexIdsValidator.java) — LEFT ANTI join, never
  * materializing the valid majority.
  */
object InvalidVertexIdsValidator extends GraphValidator {
  def validate(g: Graph): DataFrame = g.invalidEndpoints
}

/** Self-loop edges (src == dst) — a pushdown-able scan filter. */
object SelfLoopValidator extends GraphValidator {
  def validate(g: Graph): DataFrame =
    g.edges.filter(col("src") === col("dst"))
}

/** Parallel edges: (src, dst) pairs appearing more than once, with their
  * multiplicity — one hash aggregation with map-side partial combine.
  */
object DuplicateEdgeValidator extends GraphValidator {
  def validate(g: Graph): DataFrame =
    g.edges.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)
}
