package graft

import graft.queries.NetworkQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the co-purchase projection machinery behind
  * `graph_jaccard` / `triangle_count` — the fan cap (hub exclusion) and
  * the top-k triangle enumeration, on graphs small enough to check by
  * hand (the oracle keys check the production path end-to-end).
  */
class NetworkSpec extends GraftSuite {
  import spark.implicits._

  test("coPairsOf: shared customers are counted per supplier pair, " +
    "with the quantized Adamic-Adar weight riding the same row") {
    // customers 1,2 → suppliers 10,11 both; customer 3 → 10 only.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("src", "dst")
    val got = NetworkQueries.coPairsOf(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // both witnesses have fan 2: wq = floor(1e6/ln(2) + 0.5) = 1442695
    assert(got.toSeq === Seq((10L, 11L, 2L, 2 * 1442695L)))
  }

  test("coPairsOf: a hub customer past the fan cap contributes no pairs") {
    val hubFan = NetworkQueries.MaxCustFan + 1
    // hub customer 0 touches `hubFan` suppliers; customer 1 touches two.
    val hub = (0 until hubFan).map(i => (0L, 100L + i))
    val ok = Seq((1L, 100L), (1L, 101L))
    val got = NetworkQueries.coPairsOf((hub ++ ok).toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the in-cap customer's single pair survives — the hub's
    // O(fan²) pair product is excluded from the projection entirely.
    assert(got.toSeq === Seq((100L, 101L, 1L)))
  }

  test("coPairsOf: fan-3 witnesses weigh less than fan-2 witnesses") {
    // pair (10,11) shared by fan-2 customer 1; pair (20,21) shared by
    // fan-3 customer 2 — rarer witness ⇒ larger Adamic-Adar weight.
    val edges = Seq((1L, 10L), (1L, 11L),
      (2L, 20L), (2L, 21L), (2L, 22L)).toDF("src", "dst")
    val got = NetworkQueries.coPairsOf(edges)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
      .toMap
    assert(got((10L, 11L)) === 1442695L)          // 1/ln(2)
    val w3 = math.floor(1e6 / math.log(3.0) + 0.5).toLong
    assert(got((20L, 21L)) === w3 && w3 < 1442695L)
  }

  test("butterfliesOf: C(w,2) per supplier pair, hand-counted against " +
    "the brute-force 4-cycle enumeration") {
    // customers 1,2,3 → suppliers 10,11 all; customer 3 → 12 too.
    // Pair (10,11): w=3 shared customers → C(3,2) = 3 butterflies
    // (brute force: customer pairs (1,2),(1,3),(2,3) each close a
    // 4-cycle through 10 and 11). Pairs (10,12),(11,12): w=1 → 0.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 12L)).toDF("src", "dst")
    val got = NetworkQueries.butterfliesOf(NetworkQueries.coPairsOf(edges))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      (1, 10L, 3L, 2L, 4L, 3L, 3L),  // bf 3, partners {11,12}, wedges 3+1
      (2, 11L, 3L, 2L, 4L, 3L, 3L),
      (3, 12L, 0L, 2L, 2L, 3L, 3L))) // in 2 pairs, both w=1 → 0 bf
  }

  test("summarizeOf: super-edges carry counts, distinct members, " +
    "exact value sums") {
    // groups: src 1,2 → A; src 3 → B; dst 10 → X; dst 11 → Y
    val edges = Seq((1L, 10L, 5.25), (2L, 10L, 4.75), (1L, 11L, 1.0),
      (3L, 10L, 2.5)).toDF("src", "dst", "value")
    val sg = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("src", "src_nation")
    val dg = Seq((10L, "X"), (11L, "Y")).toDF("dst", "dst_nation")
    val got = NetworkQueries.summarizeOf(edges, sg, dg)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("A", "X", 2L, 2L, 1L, 10.0),
      ("A", "Y", 1L, 1L, 1L, 1.0),
      ("B", "X", 1L, 1L, 1L, 2.5)))
  }

  private def triOf(pairs: Seq[(Long, Long, Long)],
                    ids: Seq[Long]): Map[Long, Long] =
    NetworkQueries.triangleCountFrom(
        pairs.toDF("s1", "s2", "n_shared"),
        ids.toDF("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("triangleCountFrom: one triangle plus a path, zero-filled isolates") {
    // triangle 1-2-3, path 4-5, isolate 6 (in the vertex set, no pairs)
    val pairs = Seq((1L, 2L, 9L), (1L, 3L, 9L), (2L, 3L, 9L), (4L, 5L, 9L))
    val got = triOf(pairs, Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L,
      6L -> 0L))
  }

  test("triangleCountFrom: weak partners past top-k cannot close triangles") {
    // vertex 1 has TopK strong partners (100..) plus weak partners 2 and 3;
    // 2-3 is strong. The 1-2-3 triangle must NOT form: both 1-2 and 1-3
    // fall outside 1's top-k AND outside 2's/3's (which rank their mutual
    // strong edge and 1 below their own k-limit only if k is filled)...
    // here 2 and 3 each have just two partners, so THEIR lists keep 1 —
    // but an undirected edge is kept when EITHER endpoint ranks it, so
    // 1-2/1-3 survive via 2/3. To pin the semantics, give 2 and 3 enough
    // strong partners of their own to evict 1 from every list.
    val k = NetworkQueries.TopK
    val strong1 = (0 until k).map(i => (1L, 100L + i, 50L))
    val strong2 = (0 until k).map(i => (2L, 200L + i, 50L))
    val strong3 = (0 until k).map(i => (3L, 300L + i, 50L))
    val weak = Seq((1L, 2L, 1L), (1L, 3L, 1L))
    val mutual = Seq((2L, 3L, 50L))
    val got = triOf(strong1 ++ strong2 ++ strong3 ++ weak ++ mutual,
      Seq(1L, 2L, 3L))
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("clusteringCoeffFrom: triangle vertices 1.0, wedge center 1/3, " +
    "pendant and isolate 0.0") {
    // triangle 1-2-3 plus pendant 4 attached to 1: vertex 1 has deg 3
    // (one closed wedge of three) → 1/3; vertices 2,3 have deg 2 with
    // their wedge closed → 1.0; pendant 4 deg 1 → 0; isolate 5 → 0.
    val pairs = Seq((1L, 2L, 9L), (1L, 3L, 9L), (2L, 3L, 9L), (1L, 4L, 9L))
    val got = NetworkQueries.clusteringCoeffFrom(
        pairs.toDF("s1", "s2", "n_shared"),
        Seq(1L, 2L, 3L, 4L, 5L).toDF("id"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 0.333333)),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0)),
      4L -> ((1L, 0L, 0.0)),
      5L -> ((0L, 0L, 0.0))))
  }

  test("degree_assortativity: P3 path graph has textbook r = -1") {
    // a-b, b-c symmetrized; endpoint degrees correlate perfectly
    // negatively (every edge links the hub to a leaf)
    val u = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val out = NetworkQueries.degreeAssortativityOf(u).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 4L)
    assert(out.head.getDouble(1) === -1.0)
  }

  test("degree_assortativity: regular graph fails loudly (0/0 variance)") {
    // a 2-cycle is 1-regular: zero degree variance, the ratio is 0/0 —
    // the documented ANSI contract is a loud DIVIDE_BY_ZERO, never a
    // silent 0
    val u = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e = intercept[Exception] {
      NetworkQueries.degreeAssortativityOf(u).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("graph_edge_support: triangle edges count their triangles, " +
    "pendant edges report 0") {
    // Pair frame: triangle 1-2-3 plus pendant 3-4 (all within TopK=5, so
    // the sparsifier keeps everything). Triangle edges → support 1;
    // 3-4 → 0. Adding edge 2-4 closes a second triangle (2,3,4): then
    // 2-3 sits in two triangles.
    val pairs = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L),
      (3L, 4L, 5L), (2L, 4L, 5L))
      .toDF("s1", "s2", "n_shared").repartition(2)
    val out = NetworkQueries.edgeSupportFrom(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("recsys_item_cosine: hand-computed cosines, support prune, " +
    "top-k ordering") {
    // Baskets: o1={1,2,3}, o2={1,2}, o3={1,2}, o4={1,3} →
    // n1=4, n2=3, n3=2; pairs (1,2)=3, (1,3)=2, (2,3)=1 (pruned: <2).
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 2L), // duplicate line: baskets must dedup
      (4L, 1L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey").repartition(3)
    val out = NetworkQueries.itemCosineOf(li).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val c12 = q(3.0 / math.sqrt(12.0)) // 0.866025
    val c13 = q(2.0 / math.sqrt(8.0))  // 0.707107
    assert(out.toSeq === Seq(
      (1L, 1, 2L, 3L, 4L, 3L, c12),
      (1L, 2, 3L, 2L, 4L, 2L, c13),
      (2L, 1, 1L, 3L, 3L, 4L, c12),
      (3L, 1, 1L, 2L, 2L, 4L, c13)))
    // The pruned pair (2,3) appears nowhere.
    assert(!out.exists(o => (o._1 == 2L && o._3 == 3L) ||
      (o._1 == 3L && o._3 == 2L)))
  }

  test("recsys_ndcg: hand-computed leave-last-basket eval — scores, " +
    "train-item exclusion, single-order users dropped") {
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // Similarity model: 1→101 (.5), 1→102 (.25), 2→101 (.125).
    val topk = Seq((1L, 101L, 0.5), (1L, 102L, 0.25), (2L, 101L, 0.125))
      .toDF("part", "other", "cosine")
    // c1: train orders 10,20 (items 1,2), test order 30 (items 101,103).
    // c2: single order → no train → excluded.
    // c3: train item 1, test item 102 (hit at rank 2).
    // c4: train items 1 AND 101 → 101 excluded from candidates; test 102.
    val orders = Seq(
      (1L, 10L, t(1000)), (1L, 20L, t(2000)), (1L, 30L, t(3000)),
      (2L, 40L, t(1000)),
      (3L, 50L, t(1000)), (3L, 60L, t(2000)),
      (4L, 70L, t(1000)), (4L, 80L, t(2000)))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (10L, 1L), (20L, 2L), (30L, 101L), (30L, 103L),
      (40L, 1L),
      (50L, 1L), (60L, 102L),
      (70L, 1L), (70L, 101L), (80L, 102L))
      .toDF("l_orderkey", "l_partkey").repartition(3)
    val out = NetworkQueries.ndcgOf(topk, orders, lineitem).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // c1 candidates: 101 = 500000+125000, 102 = 250000 → hit at rank 1.
    // c3 candidates: 101, 102 → hit at rank 2 (disc 630930).
    // c4: only 102 (101 is a train item) → hit at rank 1, idcg = 1e6.
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, 2L, 1L, 1000000L, 1630930L,
        1000000L * 1000000L / 1630930L),
      (3L, 1L, 1L, 2L, 1L, 630930L, 1000000L, 630930L),
      (4L, 2L, 1L, 1L, 1L, 1000000L, 1000000L, 1000000L)))
  }
}
