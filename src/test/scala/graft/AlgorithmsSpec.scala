package graft

import graft.algorithms.GraphAlgorithms
import org.apache.spark.sql.functions._

/** End-to-end goldens for the iterative algorithms (SURVEY §2.6) on the
  * fixture graph — the Spark twin of the reference's library-algorithm
  * tests (SingleSourceShortestPaths / ConnectedComponents / PageRank /
  * LabelPropagation on small graphs with exact expected outputs).
  */
class AlgorithmsSpec extends GraftSuite {
  import spark.implicits._

  private lazy val gx = GraphAlgorithms.toGraphX(fixture)

  test("SSSP from vertex 1 (reference golden: 0,12,13,47,48)") {
    val d = GraphAlgorithms.ssspBounded(spark, gx, source = 1L,
      maxIterations = 10)
    val got = d.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(got === Seq((1L, 0.0), (2L, 12.0), (3L, 13.0), (4L, 47.0), (5L, 48.0)))
  }

  test("SSSP respects the iteration bound (level-synchronous)") {
    // 1 round: only direct successors of the source are reached.
    val d = GraphAlgorithms.ssspBounded(spark, gx, source = 1L,
      maxIterations = 1)
    val got = d.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(got === Seq((1L, 0.0), (2L, 12.0), (3L, 13.0)))
  }

  test("connected components: cycle graph collapses to min id 1") {
    val cc = GraphAlgorithms.connectedComponents(spark,
      GraphAlgorithms.toGraphX(fixture.undirected), maxIterations = 10)
    val got = cc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got === (1L to 5L).map(i => (i, 1L)))
  }

  test("connected components separates disjoint subgraphs") {
    val v = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "value")
    val e = Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "value")
    val g = Graph(v, e).undirected
    val cc = GraphAlgorithms.connectedComponents(spark,
      GraphAlgorithms.toGraphX(g), maxIterations = 10)
    val got = cc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
  }

  test("pageRank: no dangling vertices ⇒ ranks sum to 1; deterministic") {
    val pr = GraphAlgorithms.pageRank(spark, fixture, iterations = 10,
      beta = 0.85)
    val ranks = pr.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ranks.size === 5)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-4)
    // Vertex 5 receives from 3 (weight 35/69) and 4 (45/45): highest rank.
    assert(ranks(5L) === ranks.values.max)
    val again = GraphAlgorithms.pageRank(spark, fixture, iterations = 10,
      beta = 0.85).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(again === ranks)
  }

  test("personalized pageRank: teleport only to {id < 2}, mass conserved") {
    val pr = GraphAlgorithms.personalizedPageRank(spark, fixture,
      iterations = 10, beta = 0.85, srcBound = 2L)
    val ranks = pr.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ranks.size === 5)
    // No dangling vertices ⇒ total mass still 1 (teleport just lands on
    // the single source instead of uniformly).
    assert(math.abs(ranks.values.sum - 1.0) < 1e-4)
    // The fixture cycle makes every vertex reachable from 1, but the
    // source holds the whole teleport share plus 5→1's return flow:
    // strictly the max, and strictly above its uniform-teleport rank.
    assert(ranks(1L) === ranks.values.max)
    val uniform = GraphAlgorithms.pageRank(spark, fixture, iterations = 10,
      beta = 0.85).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ranks(1L) > uniform(1L))
    // Empty source set fails loudly, never silently zeroes every rank.
    val e = intercept[IllegalArgumentException] {
      GraphAlgorithms.personalizedPageRank(spark, fixture,
        iterations = 2, beta = 0.85, srcBound = -1L)
    }
    assert(e.getMessage.contains("source set"))
  }

  test("HITS: L1-normalized, deterministic, highest authority = vertex 5") {
    val h = GraphAlgorithms.hits(spark, fixture, iterations = 5)
    val rows = h.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1) === (1L to 5L))
    // L1 normalization: scaled scores sum to ~1e9 (rounding ±5 ulp-of-1e-9)
    assert(math.abs(rows.map(_._2).sum - 1000000000L) <= 5)
    assert(math.abs(rows.map(_._3).sum - 1000000000L) <= 5)
    val auth = rows.map(t => t._1 -> t._3).toMap
    // In-degrees: 5←{3,4}, 3←{1,2}, 2←{1}, 4←{3}, 1←{5}; hubs 1 and 3
    // dominate (each points at two strong authorities), so 5 (fed by hub
    // 3 twice removed) and 3 (fed by hub 1) lead; vertex 5's feeders
    // include the strongest hub 3 → max authority.
    assert(auth(5L) === auth.values.max)
    // Deterministic: identical rerun
    val again = GraphAlgorithms.hits(spark, fixture, iterations = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(again === rows)
  }

  test("HITS fails loudly past the scaled-integer exactness bound") {
    // norm ≤ |E|·10⁹ must stay under 2⁵³ for the pinned double division to
    // be exact; one edge past the bound must throw, never silently round.
    val bound = (1L << 53) / 1000000000L
    val e = spark.range(bound + 1)
      .selectExpr("id AS src", "id + 1 AS dst", "1L AS value")
    val v = Seq((0L, 0L)).toDF("id", "value")
    val ex = intercept[IllegalArgumentException] {
      GraphAlgorithms.hits(spark, Graph(v, e), iterations = 1)
    }
    assert(ex.getMessage.contains("exactness"))
  }

  test("graph_cc_sizes: histogram and ppm shares on hand labels") {
    import spark.implicits._
    // Components: {1,2,3} (size 3), {4,5} and {6,7} (two of size 2),
    // {8} (size 1) → 8 vertices.
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 6L), (8L, 8L)).toDF("id", "comp").repartition(3)
    val out = graft.queries.IterQueries.ccSizesOf(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, 1000000L / 8),
      (2L, 2L, 4000000L / 8),
      (3L, 1L, 3000000L / 8)))
  }

  test("graph_modularity: hand-computed Q on a two-community graph") {
    import spark.implicits._
    // Two triangles {1,2,3} {4,5,6} joined by one bridge 3-4, undirected
    // multiset (both orientations): 2m = 14. Perfect partition:
    // within_pairs = 6 per community, d = 7 per community.
    // q_num = 6·14 − 49 = 35 each → Q = 70/196 ≈ 0.357143.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val ue = (und ++ und.map(_.swap)).toDF("src", "dst").repartition(3)
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "label")
    val out = graft.queries.IterQueries.modularityOf(labels, ue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.toSeq === Seq(
      (10L, 3L, 6L, 7L, 35L, q6(35.0 / 196.0)),
      (20L, 3L, 6L, 7L, 35L, q6(35.0 / 196.0))))
    // Anti-community control: swapping to the worst partition (odd/even)
    // must drive Q below the good partition's.
    val bad = Seq((1L, 10L), (3L, 10L), (5L, 10L), (2L, 20L), (4L, 20L),
      (6L, 20L)).toDF("id", "label")
    val qBad = graft.queries.IterQueries.modularityOf(bad, ue).collect()
      .map(_.getDouble(5)).sum
    assert(qBad < 2 * q6(35.0 / 196.0))
  }

  test("label propagation: pinned semantics converge to label 1 on fixture") {
    // Hand-derived (ties → smallest label, synchronous rounds on the
    // undirected fixture): round1 = (2,1,1,3,1), round2 = (1,1,1,1,1),
    // stable thereafter.
    val lp = GraphAlgorithms.labelPropagation(spark, fixture.undirected,
      maxIterations = 5)
    val got = lp.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got === (1L to 5L).map(i => (i, 1L)))
  }

  test("label propagation honors the tie→min rule after one round") {
    val lp = GraphAlgorithms.labelPropagation(spark, fixture.undirected,
      maxIterations = 1)
    val got = lp.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // Neighbors of 1 are {2,3,5}, all count 1 → tie broken to min = 2.
    assert(got(1L) === 2L)
    assert(got(3L) === 1L)
    assert(got(4L) === 3L)
  }
}
