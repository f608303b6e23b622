package graft

import graft.algorithms.GraphAlgorithms
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: operators must be total on empty vertex/edge
  * sets (a 100 TB pipeline will hit empty partitions and empty subgraphs
  * constantly — an operator that throws on empty input is a production
  * outage, and the reference's coGroup-based ops are all total).
  */
class EmptyGraphSpec extends GraftSuite {
  import spark.implicits._

  private def emptyGraph: Graph = {
    val v = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("value", LongType))))
    val e = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
        StructField("value", LongType))))
    Graph(v, e)
  }

  test("structural and aggregate ops are total on the empty graph") {
    val g = emptyGraph
    assert(g.numVertices === 0 && g.numEdges === 0)
    assert(g.outDegrees.count() === 0)
    assert(g.degrees.count() === 0)
    assert(g.triplets.count() === 0)
    assert(g.invalidEndpoints.count() === 0)
    assert(g.reverse.undirected.edges.count() === 0)
    assert(g.reduceOnEdges(EdgeDirection.All)(max(col("value"))).count() === 0)
    assert(g.reduceOnNeighbors(EdgeDirection.In)(sum(col("nbr_value")))
      .count() === 0)
  }

  test("edgeless graph: degrees are zero, CC is per-vertex, LP keeps labels") {
    val g = Graph(Seq((7L, 7L), (9L, 9L)).toDF("id", "value"),
      emptyGraph.edges)
    assert(pairs(g.degrees) === Seq((7L, 0L), (9L, 0L)))
    val cc = GraphAlgorithms.connectedComponents(spark,
      GraphAlgorithms.toGraphX(g), 5)
    assert(cc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === Seq((7L, 7L), (9L, 9L)))
    val lp = GraphAlgorithms.labelPropagation(spark, g, 3)
    assert(pairs(lp) === Seq((7L, 7L), (9L, 9L)))
  }

  test("filters that eliminate everything still compose") {
    val g = fixture.filterOnVertices(lit(false))
    assert(g.numVertices === 0 && g.numEdges === 0)
    assert(g.subgraph(lit(true), lit(true)).numEdges === 0)
  }

  test("round-13 iteratives are total on an empty edge frame") {
    import spark.implicits._
    import graft.queries.UserGraphQueries
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(UserGraphQueries.corenessOf(empty).count() === 0)
    assert(UserGraphQueries.partitionOf(empty).count() === 0)
    assert(UserGraphQueries.trussnessOf(empty).count() === 0)
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val hs = graft.queries.DedupQueries.shingleSetsOf(docs)
    assert(graft.queries.DedupQueries
      .streamDedupMinhashOf(spark, docs, hs).count() === 0)
  }

  test("round-14 seams are total on empty inputs") {
    import spark.implicits._
    import graft.queries.{StreamQueries, UserGraphQueries}
    val noEv = Seq.empty[(Long, Long, String)]
      .toDF("event_id", "user_id", "event_type")
    assert(StreamQueries.hllRegistersOf(noEv).count() === 0)
    assert(StreamQueries.hllEstimateFromRegisters(
      StreamQueries.hllRegistersOf(noEv)).count() === 0)
    val noVal = Seq.empty[(Long, Double, String)]
      .toDF("event_id", "value", "event_type")
    assert(StreamQueries.valueHistOf(noVal).count() === 0)
    assert(StreamQueries.quantilesFromHist(
      StreamQueries.valueHistOf(noVal)).count() === 0)
    // fresh maintainers expose empty-but-well-typed views
    val hm = new graft.streaming.Streams.HllMaintainer(spark)
    assert(hm.current.count() === 0 && hm.estimate.count() === 0)
    val vm = new graft.streaming.Streams.ValueHistMaintainer(spark)
    assert(vm.current.count() === 0 && vm.quantiles.count() === 0)
    // an empty micro-batch neither fails nor perturbs state
    vm.applyBatch(noVal); hm.applyBatch(noEv)
    assert(hm.current.count() === 0 && vm.quantiles.count() === 0)
    // leiden refinement: empty labels, and labels with an empty edge set
    val noLabs = Seq.empty[(Long, Long)].toDF("id", "lab")
    val noE = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(UserGraphQueries.leidenRefineOf(noE, noLabs).count() === 0)
    val labs = Seq(1L -> 10L, 2L -> 10L).toDF("id", "lab")
    val out = UserGraphQueries.leidenRefineOf(noE, labs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // no intra edges: every vertex is its own part
    assert(out.toSeq === Seq((10L, 1L, 1L, 2L), (10L, 2L, 1L, 2L)))
  }
}
