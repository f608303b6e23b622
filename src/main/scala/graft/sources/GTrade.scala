package graft.sources

import graft.Graph
import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** The canonical test graph **G_trade** (SURVEY §2 preamble): bipartite
  * customer→supplier graph derived from the star schema.
  *
  *  - vertices: customers (`id = c_custkey`, value = `c_acctbal`) ∪
  *    suppliers (`id = 1_000_000 + s_suppkey`, value = `s_acctbal`).
  *    The offset is required: both key ranges start at 0 (FIXTURES.md).
  *  - edges: `(o_custkey, 1_000_000 + l_suppkey,
  *    SUM(l_extendedprice))` from `orders ⋈ lineitem`, grouped by pair.
  *
  * The edge weight uses [[Det.decSum]] (exact DECIMAL accumulation) so the
  * value is bit-identical regardless of aggregation order — the foundation
  * of every downstream oracle check (SSSP path sums etc.).
  *
  * Scale notes: the orders⋈lineitem join is a shuffle join on orderkey at
  * scale (AQE-planned); the pair aggregation is hash agg with map-side
  * partial combine. The resulting vertex/edge sets are many orders of
  * magnitude smaller than the fact table, so we persist them — at 100 TB the
  * fact scan happens once, and all ~30 graph operators reuse the compact
  * graph.
  */
object GTrade {
  final val Offset = 1000000L

  private val cache = TrieMap.empty[(SparkSession, String), (Graph, DataFrame)]

  /** The persisted (graph, edgesWithCounts) pair; the fact-table join runs
    * once per (session, sfDir) and every graph operator reuses it.
    */
  private def build(spark: SparkSession, dir: String): (Graph, DataFrame) =
    cache.getOrElseUpdate((spark, dir), {
      val customer = Tables(spark, dir, "customer")
      val supplier = Tables(spark, dir, "supplier")
      val orders   = Tables(spark, dir, "orders")
      val lineitem = Tables(spark, dir, "lineitem")
      val vertices = customer
        .select(col("c_custkey").as("id"), col("c_acctbal").as("value"))
        .unionAll(supplier.select((col("s_suppkey") + Offset).as("id"),
          col("s_acctbal").as("value")))
      val edgesFull = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + Offset).as("dst"))
        .agg(Det.decSum(col("l_extendedprice")).as("value"),
          count(lit(1)).as("n_items"))
        .persist()
      val edges = edgesFull.select(col("src"), col("dst"), col("value"))
      (Graph(vertices.persist(), edges), edgesFull)
    })

  def apply(spark: SparkSession, dir: String): Graph = build(spark, dir)._1

  /** (src, dst, value, n_items) — the per-pair lineitem count, sharing the
    * persisted fact join (used as the J2 auxiliary dataset).
    */
  def edgesWithCounts(spark: SparkSession, dir: String): DataFrame =
    build(spark, dir)._2

  /** DuckDB CTE prefix defining the same graph for every graph-query oracle.
    * Must stay semantically identical to [[apply]].
    */
  val SqlPrefix: String =
    """WITH vertices AS (
      |  SELECT c_custkey AS id, c_acctbal AS value FROM customer
      |  UNION ALL
      |  SELECT 1000000 + s_suppkey AS id, s_acctbal AS value FROM supplier
      |), edges AS (
      |  SELECT o_custkey AS src, 1000000 + l_suppkey AS dst,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Undirected view (edges ∪ reversed) used by SSSP/CC oracles. */
  val SqlPrefixUndirected: String = SqlPrefix +
    """, uedges AS (
      |  SELECT src, dst, value FROM edges
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, value FROM edges
      |)""".stripMargin
}
