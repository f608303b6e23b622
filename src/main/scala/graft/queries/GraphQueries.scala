package graft.queries

import graft.{EdgeDirection, Graph}
import graft.sources.GTrade
import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operator inventory S1–S4, P1–P6, J1–J8, A1–A6, G1–G4 (SURVEY
  * §2.1–§2.5), each exercised on the canonical G_trade graph (built per
  * sfDir by [[GTrade]]) and oracle-checked against the same graph derived in
  * pure SQL ([[GTrade.SqlPrefix]]).
  */
object GraphQueries {
  private val P = GTrade.SqlPrefix

  private def g(s: SparkSession, dir: String): Graph = GTrade(s, dir)

  private def orderedEdges(df: DataFrame): DataFrame =
    df.orderBy(col("src"), col("dst"), col("value"))
  private def orderedVertices(df: DataFrame): DataFrame =
    df.orderBy(col("id"))

  // ---- S: sources / sinks ----

  /** S1 scan_graph — construct G_trade, emit its edge set. */
  private def s1(s: SparkSession, dir: String) = orderedEdges(g(s, dir).edges)
  private val s1Sql =
    s"$P SELECT src, dst, value FROM edges ORDER BY src, dst, value"

  /** S2 scan_edges_infer_vertices — vertex set inferred as distinct edge
    * endpoints, initializer value 0 ([GH] Graph.java#fromDataSet(edges,mapper)).
    */
  private def s2(s: SparkSession, dir: String) =
    orderedVertices(Graph.fromEdges(g(s, dir).edges, _ => lit(0.0)).vertices)
  private val s2Sql =
    s"""$P SELECT id, CAST(0.0 AS DOUBLE) AS value FROM (
       |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)
       |ORDER BY id""".stripMargin

  /** S3 scan_collection — graph from a local literal collection (the §5.1
    * fixture graph), reference `Graph.fromCollection`.
    */
  private def s3(s: SparkSession, dir: String) = {
    import s.implicits._
    val edges = Seq((1L, 2L, 12L), (1L, 3L, 13L), (2L, 3L, 23L),
      (3L, 4L, 34L), (3L, 5L, 35L), (4L, 5L, 45L), (5L, 1L, 51L))
    orderedEdges(edges.toDF("src", "dst", "value"))
  }
  private val s3Sql =
    """SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
      |       CAST(value AS BIGINT) AS value
      |FROM (VALUES (1,2,12),(1,3,13),(2,3,23),(3,4,34),(3,5,35),(4,5,45),
      |             (5,1,51)) t(src, dst, value)
      |ORDER BY src, dst, value""".stripMargin

  /** S4 sink_tuples — materialize the vertex set as tuples (the Verify
    * parquet dump IS the sink path).
    */
  private def s4(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).vertices)
  private val s4Sql = s"$P SELECT id, value FROM vertices ORDER BY id"

  // ---- P: projections / filters ----

  /** P1 map_vertices — value transform, id preserved. */
  private def p1(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).mapVertices(v => v * 2.0).vertices)
  private val p1Sql =
    s"$P SELECT id, value * 2.0 AS value FROM vertices ORDER BY id"

  /** P2 map_edges. */
  private def p2(s: SparkSession, dir: String) =
    orderedEdges(g(s, dir).mapEdges(v => v * 0.5).edges)
  private val p2Sql =
    s"$P SELECT src, dst, value * 0.5 AS value FROM edges ORDER BY src, dst, value"

  /** P3 filter_on_vertices — edges survive iff BOTH endpoints survive. */
  private def p3(s: SparkSession, dir: String) =
    orderedEdges(g(s, dir).filterOnVertices(col("value") > 0).edges)
  private val p3Sql =
    s"""$P SELECT src, dst, value FROM edges
       |WHERE src IN (SELECT id FROM vertices WHERE value > 0)
       |  AND dst IN (SELECT id FROM vertices WHERE value > 0)
       |ORDER BY src, dst, value""".stripMargin

  /** P4 filter_on_edges — vertex set unchanged, so emit surviving edges. */
  private def p4(s: SparkSession, dir: String) =
    orderedEdges(g(s, dir).filterOnEdges(col("value") > 100000).edges)
  private val p4Sql =
    s"""$P SELECT src, dst, value FROM edges WHERE value > 100000
       |ORDER BY src, dst, value""".stripMargin

  /** P5 subgraph — both filters composed. */
  private def p5(s: SparkSession, dir: String) =
    orderedEdges(
      g(s, dir).subgraph(col("value") > 0, col("value") > 100000).edges)
  private val p5Sql =
    s"""$P SELECT src, dst, value FROM edges
       |WHERE value > 100000
       |  AND src IN (SELECT id FROM vertices WHERE value > 0)
       |  AND dst IN (SELECT id FROM vertices WHERE value > 0)
       |ORDER BY src, dst, value""".stripMargin

  /** P6 vertex_ids — id projection only (column pruning). */
  private def p6(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).vertexIds)
  private val p6Sql = s"$P SELECT id FROM vertices ORDER BY id"

  // ---- J: joins ----

  /** J1 join_with_vertices — matched vertices take f(value,t)=t (order
    * count), unmatched KEEP old value (left-outer coGroup semantics).
    */
  private def j1(s: SparkSession, dir: String) = {
    val aux = graft.sources.Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("id"))
      .agg(count(lit(1)).cast("double").as("t"))
    orderedVertices(
      g(s, dir).joinWithVertices(aux, (_, t) => t).vertices)
  }
  private val j1Sql =
    s"""$P, aux AS (
       |  SELECT o_custkey AS id, CAST(COUNT(*) AS DOUBLE) AS t
       |  FROM orders GROUP BY o_custkey)
       |SELECT v.id, CASE WHEN a.id IS NULL THEN v.value ELSE a.t END AS value
       |FROM vertices v LEFT JOIN aux a ON v.id = a.id
       |ORDER BY v.id""".stripMargin

  /** J2 join_with_edges — aux keyed on (src,dst): lineitem count per pair;
    * matched edges take value/t (mean price per item).
    */
  private def j2(s: SparkSession, dir: String) = {
    val aux = GTrade.edgesWithCounts(s, dir)
      .select(col("src"), col("dst"), col("n_items").cast("double").as("t"))
    orderedEdges(g(s, dir).joinWithEdges(aux, (v, t) => v / t).edges)
  }
  private val j2Sql =
    s"""$P, aux AS (
       |  SELECT o_custkey AS src, ${GTrade.OffSql} + l_suppkey AS dst,
       |         CAST(COUNT(*) AS DOUBLE) AS t
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2)
       |SELECT e.src, e.dst,
       |       CASE WHEN a.src IS NULL THEN e.value ELSE e.value / a.t END AS value
       |FROM edges e LEFT JOIN aux a ON e.src = a.src AND e.dst = a.dst
       |ORDER BY e.src, e.dst, value""".stripMargin

  /** J3 join_with_edges_on_source — one aux row (customer acctbal) updates
    * all out-edges of that src.
    */
  private def j3(s: SparkSession, dir: String) = {
    val aux = graft.sources.Tables(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_acctbal").as("t"))
    orderedEdges(g(s, dir).joinWithEdgesOnSource(aux, (_, t) => t).edges)
  }
  private val j3Sql =
    s"""$P, aux AS (SELECT c_custkey AS id, c_acctbal AS t FROM customer)
       |SELECT e.src, e.dst,
       |       CASE WHEN a.id IS NULL THEN e.value ELSE a.t END AS value
       |FROM edges e LEFT JOIN aux a ON e.src = a.id
       |ORDER BY src, dst, value""".stripMargin

  /** J4 join_with_edges_on_target — symmetric on dst (supplier acctbal). */
  private def j4(s: SparkSession, dir: String) = {
    val aux = graft.sources.Tables(s, dir, "supplier")
      .select((col("s_suppkey") + GTrade.offset(s, dir)).as("id"),
        col("s_acctbal").as("t"))
    orderedEdges(g(s, dir).joinWithEdgesOnTarget(aux, (_, t) => t).edges)
  }
  private val j4Sql =
    s"""$P, aux AS (
       |  SELECT ${GTrade.OffSql} + s_suppkey AS id, s_acctbal AS t FROM supplier)
       |SELECT e.src, e.dst,
       |       CASE WHEN a.id IS NULL THEN e.value ELSE a.t END AS value
       |FROM edges e LEFT JOIN aux a ON e.dst = a.id
       |ORDER BY src, dst, value""".stripMargin

  /** J5 triplets — edge–vertex–vertex 3-way join. */
  private def j5(s: SparkSession, dir: String) =
    g(s, dir).triplets.orderBy(col("src"), col("dst"))
  private val j5Sql =
    s"""$P SELECT e.src, e.dst, sv.value AS src_value, dv.value AS dst_value,
       |       e.value AS edge_value
       |FROM edges e JOIN vertices sv ON e.src = sv.id
       |JOIN vertices dv ON e.dst = dv.id
       |ORDER BY src, dst""".stripMargin

  /** J6 validate_ids — anti-join endpoint check, run through the pluggable
    * [[graft.GraphValidator]] trait (reference
    * `validate(InvalidVertexIdsValidator)`): count of dangling endpoints,
    * validity flag.
    */
  private def j6(s: SparkSession, dir: String) =
    g(s, dir).validate(graft.InvalidVertexIdsValidator)
      .agg(count(lit(1)).as("n_invalid"))
      .select(col("n_invalid"),
        (col("n_invalid") === 0).cast("int").as("is_valid"))
  private val j6Sql =
    s"""$P SELECT COUNT(*) AS n_invalid, CAST(COUNT(*) = 0 AS INT) AS is_valid
       |FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) e
       |WHERE id NOT IN (SELECT id FROM vertices)""".stripMargin

  /** validate_dup_edges — the second shipped validator through the same
    * trait ([[graft.DuplicateEdgeValidator]]): re-add the 10 heaviest edges
    * (total order: value DESC, src, dst) and report the resulting parallel
    * (src, dst) pairs with multiplicity. G_trade's edges are grouped by
    * pair at build time, so exactly those 10 duplicates must surface.
    */
  private def j6b(s: SparkSession, dir: String) = {
    val base = g(s, dir)
    val extra = base.edges
      .orderBy(col("value").desc, col("src"), col("dst")).limit(10)
    base.addEdges(extra).validate(graft.DuplicateEdgeValidator)
      .orderBy(col("src"), col("dst"))
  }
  private val j6bSql =
    s"""$P, extra AS (
       |  SELECT src, dst, value FROM edges
       |  ORDER BY value DESC, src, dst LIMIT 10),
       |all_edges AS (
       |  SELECT src, dst FROM edges UNION ALL SELECT src, dst FROM extra)
       |SELECT src, dst, COUNT(*) AS multiplicity FROM all_edges
       |GROUP BY 1, 2 HAVING COUNT(*) > 1 ORDER BY src, dst""".stripMargin

  /** validate_self_loops — third validator instance
    * ([[graft.SelfLoopValidator]]): inject a unit-weight self-loop on the 5
    * smallest vertex ids; exactly those must be reported (the bipartite
    * G_trade has none of its own).
    */
  private def j6c(s: SparkSession, dir: String) = {
    val base = g(s, dir)
    val loops = base.vertices.orderBy(col("id")).limit(5)
      .select(col("id").as("src"), col("id").as("dst"),
        lit(1.0).as("value"))
    base.addEdges(loops).validate(graft.SelfLoopValidator)
      .orderBy(col("src"))
  }
  private val j6cSql =
    s"""$P, loops AS (
       |  SELECT id AS src, id AS dst, CAST(1.0 AS DOUBLE) AS value
       |  FROM vertices ORDER BY id LIMIT 5),
       |all_edges AS (
       |  SELECT src, dst, value FROM edges
       |  UNION ALL SELECT src, dst, value FROM loops)
       |SELECT src, dst, value FROM all_edges WHERE src = dst
       |ORDER BY src""".stripMargin

  /** J7 remove_vertex + remove_edge — delete vertex 0 with incident edges,
    * and the specific edge (1, offset) — customer 1 → supplier 0.
    */
  private def j7(s: SparkSession, dir: String) = {
    import s.implicits._
    val victims = Seq(0L).toDF("id")
    val edgeVictims = Seq((1L, GTrade.offset(s, dir))).toDF("src", "dst")
    orderedEdges(g(s, dir).removeVertices(victims).removeEdges(edgeVictims)
      .edges)
  }
  private val j7Sql =
    s"""$P SELECT src, dst, value FROM edges
       |WHERE src <> 0 AND dst <> 0
       |  AND NOT (src = 1 AND dst = ${GTrade.OffSql})
       |ORDER BY src, dst, value""".stripMargin

  /** J8 add_vertex / add_edge — append a new vertex with one incident edge;
    * emit resulting graph size.
    */
  private def j8(s: SparkSession, dir: String) = {
    import s.implicits._
    val v = Seq((9999999L, 0.0)).toDF("id", "value")
    val e = Seq((9999999L, GTrade.offset(s, dir), 1.0)).toDF("src", "dst", "value")
    val g2 = g(s, dir).addVertex(v, e)
    g2.vertices.agg(count(lit(1)).as("n_vertices"))
      .crossJoin(g2.edges.agg(count(lit(1)).as("n_edges")))
  }
  private val j8Sql =
    s"""$P SELECT
       |  (SELECT COUNT(*) + 1 FROM vertices) AS n_vertices,
       |  (SELECT COUNT(*) + 1 FROM edges) AS n_edges""".stripMargin

  // ---- A: aggregations ----

  /** A1 out_degrees — zero-filled via left-outer against the vertex set. */
  private def a1(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).outDegrees)
  private val a1Sql =
    s"""$P SELECT v.id, COALESCE(d.n, 0) AS degree
       |FROM vertices v LEFT JOIN (
       |  SELECT src, COUNT(*) AS n FROM edges GROUP BY src) d ON v.id = d.src
       |ORDER BY id""".stripMargin

  /** A2 in_degrees. */
  private def a2(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).inDegrees)
  private val a2Sql =
    s"""$P SELECT v.id, COALESCE(d.n, 0) AS degree
       |FROM vertices v LEFT JOIN (
       |  SELECT dst, COUNT(*) AS n FROM edges GROUP BY dst) d ON v.id = d.dst
       |ORDER BY id""".stripMargin

  /** A3 degrees — in+out. */
  private def a3(s: SparkSession, dir: String) =
    orderedVertices(g(s, dir).degrees)
  private val a3Sql =
    s"""$P SELECT v.id, COALESCE(d.n, 0) AS degree
       |FROM vertices v LEFT JOIN (
       |  SELECT id, COUNT(*) AS n FROM (
       |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) e
       |  GROUP BY id) d ON v.id = d.id
       |ORDER BY v.id""".stripMargin

  /** A3b (extension) — degree distribution: vertices per total-degree
    * value. THE summary statistic of a graph's shape (power-law
    * detection, and the skew evidence behind salting/AQE-skew-join
    * decisions at 100 TB); two hash aggregations with partial combine,
    * output |distinct degrees| rows — tiny at any scale.
    */
  private def a3b(s: SparkSession, dir: String) =
    g(s, dir).degrees.groupBy(col("degree"))
      .agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("degree"))
  private val a3bSql =
    s"""$P SELECT degree, COUNT(*) AS n_vertices FROM (
       |  SELECT v.id, COALESCE(d.n, 0) AS degree
       |  FROM vertices v LEFT JOIN (
       |    SELECT id, COUNT(*) AS n FROM (
       |      SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) e
       |    GROUP BY id) d ON v.id = d.id)
       |GROUP BY degree ORDER BY degree""".stripMargin

  /** A4 num_vertices / num_edges — global counts as one row. */
  private def a4(s: SparkSession, dir: String) = {
    val gr = g(s, dir)
    gr.vertices.agg(count(lit(1)).as("n_vertices"))
      .crossJoin(gr.edges.agg(count(lit(1)).as("n_edges")))
  }
  private val a4Sql =
    s"""$P SELECT (SELECT COUNT(*) FROM vertices) AS n_vertices,
       |          (SELECT COUNT(*) FROM edges) AS n_edges""".stripMargin

  /** A5 reduce_on_edges (OUT) — per-vertex reduce over incident edge
    * values; only vertices with out-edges appear (reference group-reduce).
    */
  private def a5(s: SparkSession, dir: String) =
    g(s, dir).reduceOnEdges(EdgeDirection.Out)(
      max(col("value")).as("max_out"),
      min(col("value")).as("min_out"),
      count(lit(1)).as("n_out"))
      .orderBy(col("id"))
  private val a5Sql =
    s"""$P SELECT src AS id, MAX(value) AS max_out, MIN(value) AS min_out,
       |       COUNT(*) AS n_out
       |FROM edges GROUP BY src ORDER BY id""".stripMargin

  /** A6 reduce_on_neighbors (IN) — per-vertex reduce over neighbor VERTEX
    * values (triplet join first): sum of in-neighbor account balances.
    */
  private def a6(s: SparkSession, dir: String) =
    g(s, dir).reduceOnNeighbors(EdgeDirection.In)(
      Det.decSum(col("nbr_value")).as("nbr_sum"),
      count(lit(1)).as("n_nbr"))
      .orderBy(col("id"))
  private val a6Sql =
    s"""$P SELECT e.dst AS id, ${Det.decSumSql("v.value")} AS nbr_sum,
       |       COUNT(*) AS n_nbr
       |FROM edges e JOIN vertices v ON e.src = v.id
       |GROUP BY e.dst ORDER BY id""".stripMargin

  /** A5b reduce_on_edges_all — EdgeDirection.All branch: per-vertex reduce
    * over ALL incident edge values (in- and out-, multiplicity kept; a
    * self-loop would count twice, matching the reference's ALL coGroup).
    */
  private def a5all(s: SparkSession, dir: String) =
    g(s, dir).reduceOnEdges(EdgeDirection.All)(
      Det.decSum(col("value")).as("sum_all"),
      count(lit(1)).as("n_all"))
      .orderBy(col("id"))
  private val a5allSql =
    s"""$P SELECT id, ${Det.decSumSql("value")} AS sum_all,
       |       COUNT(*) AS n_all
       |FROM (SELECT src AS id, value FROM edges
       |      UNION ALL SELECT dst AS id, value FROM edges)
       |GROUP BY id ORDER BY id""".stripMargin

  /** A6b reduce_on_neighbors_all — EdgeDirection.All branch: per-vertex
    * reduce over in- AND out-neighbor vertex values.
    */
  private def a6all(s: SparkSession, dir: String) =
    g(s, dir).reduceOnNeighbors(EdgeDirection.All)(
      Det.decSum(col("nbr_value")).as("nbr_sum_all"),
      count(lit(1)).as("n_nbr_all"))
      .orderBy(col("id"))
  private val a6allSql =
    s"""$P SELECT id, ${Det.decSumSql("nbr")} AS nbr_sum_all,
       |       COUNT(*) AS n_nbr_all
       |FROM (
       |  SELECT e.dst AS id, v.value AS nbr
       |  FROM edges e JOIN vertices v ON e.src = v.id
       |  UNION ALL
       |  SELECT e.src AS id, v.value AS nbr
       |  FROM edges e JOIN vertices v ON e.dst = v.id)
       |GROUP BY id ORDER BY id""".stripMargin

  /** A7 reduce_on_neighbors_with_value — the WithVertexValue overload: the
    * center vertex's own value participates (in-neighbor balance sum minus
    * own balance).
    */
  private def a7(s: SparkSession, dir: String) =
    g(s, dir).reduceOnNeighborsWithVertexValue(EdgeDirection.In)(
      Det.decSum(col("nbr_value")).as("nbr_sum"),
      count(lit(1)).as("n_nbr"))
      .select(col("id"), col("own_value"),
        (col("nbr_sum") - col("own_value")).as("nbr_minus_own"),
        col("n_nbr"))
      .orderBy(col("id"))
  private val a7Sql =
    s"""$P SELECT e.dst AS id, c.value AS own_value,
       |       ${Det.decSumSql("v.value")} - c.value AS nbr_minus_own,
       |       COUNT(*) AS n_nbr
       |FROM edges e JOIN vertices v ON e.src = v.id
       |JOIN vertices c ON e.dst = c.id
       |GROUP BY e.dst, c.value ORDER BY id""".stripMargin

  // ---- G: structural ----

  /** G1 reverse. */
  private def g1(s: SparkSession, dir: String) =
    orderedEdges(g(s, dir).reverse.edges)
  private val g1Sql =
    s"""$P SELECT dst AS src, src AS dst, value FROM edges
       |ORDER BY src, dst, value""".stripMargin

  /** G2 undirected — UNION ALL with reversals, duplicates kept. */
  private def g2q(s: SparkSession, dir: String) =
    orderedEdges(g(s, dir).undirected.edges)
  private val g2Sql =
    s"""$P SELECT src, dst, value FROM (
       |  SELECT src, dst, value FROM edges
       |  UNION ALL SELECT dst AS src, src AS dst, value FROM edges)
       |ORDER BY src, dst, value""".stripMargin

  /** G3 union_graphs — UNION ALL of vertex multisets (G ∪ high-balance
    * subgraph); emit per-id multiplicity to pin the ALL semantics.
    */
  private def g3(s: SparkSession, dir: String) = {
    val gr = g(s, dir)
    val sub = gr.filterOnVertices(col("value") > 5000)
    gr.union(sub).vertices.groupBy(col("id"))
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("id"))
  }
  private val g3Sql =
    s"""$P SELECT id, COUNT(*) AS multiplicity FROM (
       |  SELECT id FROM vertices
       |  UNION ALL SELECT id FROM vertices WHERE value > 5000)
       |GROUP BY id ORDER BY id""".stripMargin

  /** G4 distinct_endpoints — the distinct() substrate op on endpoints. */
  private def g4(s: SparkSession, dir: String) = {
    val e = g(s, dir).edges
    orderedVertices(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
  }
  private val g4Sql =
    s"""$P SELECT DISTINCT id FROM (
       |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
       |ORDER BY id""".stripMargin

  /** Generic-key support (reference `Graph<K,VV,EV>` allows any comparable
    * key; SURVEY §1.3/§7.3.3): build a STRING-keyed customer→nation graph,
    * dictionary-encode the keys to dense Long ids ([[graft.sources.IdEncoder]]),
    * run a Long-id operator (degrees), decode back. The oracle reproduces
    * the encoding with `dense_rank() OVER (ORDER BY key) - 1`.
    */
  private def encodeStringIds(s: SparkSession, dir: String) = {
    val customer = graft.sources.Tables(s, dir, "customer")
    val nation   = graft.sources.Tables(s, dir, "nation")
    val verts = customer.select(col("c_name").as("key"),
        col("c_acctbal").as("value"))
      .unionAll(nation.select(col("n_name").as("key"), lit(0.0).as("value")))
    val edges = customer.join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_name").as("src_key"), col("n_name").as("dst_key"),
        lit(1.0).as("value"))
    val (dict, g) = graft.sources.IdEncoder.encode(s, verts, edges)
    graft.sources.IdEncoder.decode(g.degrees, dict, "id", "key")
      .select(col("id"), col("key"), col("degree"))
      .orderBy(col("id"))
  }
  private val encodeStringIdsSql =
    """WITH verts AS (
      |  SELECT c_name AS key FROM customer
      |  UNION ALL SELECT n_name FROM nation),
      |e AS (
      |  SELECT c.c_name AS src_key, n.n_name AS dst_key
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |keys AS (
      |  SELECT DISTINCT key FROM (
      |    SELECT key FROM verts
      |    UNION ALL SELECT src_key FROM e
      |    UNION ALL SELECT dst_key FROM e)),
      |dict AS (
      |  SELECT key, dense_rank() OVER (ORDER BY key) - 1 AS id FROM keys),
      |deg AS (
      |  SELECT id, COUNT(*) AS degree FROM (
      |    SELECT src_key AS key FROM e
      |    UNION ALL SELECT dst_key FROM e) ends
      |  JOIN dict USING (key) GROUP BY id)
      |SELECT d.id, d.key, COALESCE(deg.degree, 0) AS degree
      |FROM dict d LEFT JOIN deg USING (id) ORDER BY id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("scan_graph", s1, Some(s1Sql)),
    Q("encode_string_ids", encodeStringIds, Some(encodeStringIdsSql)),
    Q("scan_edges_infer_vertices", s2, Some(s2Sql)),
    Q("scan_collection", s3, Some(s3Sql)),
    Q("sink_tuples", s4, Some(s4Sql)),
    Q("map_vertices", p1, Some(p1Sql)),
    Q("map_edges", p2, Some(p2Sql)),
    Q("filter_on_vertices", p3, Some(p3Sql)),
    Q("filter_on_edges", p4, Some(p4Sql)),
    Q("subgraph", p5, Some(p5Sql)),
    Q("vertex_ids", p6, Some(p6Sql)),
    Q("join_with_vertices", j1, Some(j1Sql)),
    Q("join_with_edges", j2, Some(j2Sql)),
    Q("join_with_edges_on_source", j3, Some(j3Sql)),
    Q("join_with_edges_on_target", j4, Some(j4Sql)),
    Q("triplets", j5, Some(j5Sql)),
    Q("validate_ids", j6, Some(j6Sql)),
    Q("validate_dup_edges", j6b, Some(j6bSql)),
    Q("validate_self_loops", j6c, Some(j6cSql)),
    Q("remove_vertex", j7, Some(j7Sql)),
    Q("add_vertex_edge", j8, Some(j8Sql)),
    Q("out_degrees", a1, Some(a1Sql)),
    Q("in_degrees", a2, Some(a2Sql)),
    Q("degrees", a3, Some(a3Sql)),
    Q("degree_histogram", a3b, Some(a3bSql)),
    Q("num_vertices_edges", a4, Some(a4Sql)),
    Q("reduce_on_edges", a5, Some(a5Sql)),
    Q("reduce_on_edges_all", a5all, Some(a5allSql)),
    Q("reduce_on_neighbors", a6, Some(a6Sql)),
    Q("reduce_on_neighbors_all", a6all, Some(a6allSql)),
    Q("reduce_on_neighbors_with_value", a7, Some(a7Sql)),
    Q("reverse", g1, Some(g1Sql)),
    Q("undirected", g2q, Some(g2Sql)),
    Q("union_graphs", g3, Some(g3Sql)),
    Q("distinct_endpoints", g4, Some(g4Sql)),
  )
}
