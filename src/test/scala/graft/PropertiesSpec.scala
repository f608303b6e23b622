package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Algebraic properties over seeded random graphs (SURVEY §5.2 layer 1).
  * Deterministic seeds keep the suite reproducible; each property runs on a
  * handful of random graphs rather than driving Spark through hundreds of
  * ScalaCheck cases.
  */
class PropertiesSpec extends GraftSuite {
  import spark.implicits._

  private def randomGraph(seed: Long): Graph = {
    val rnd = new Random(seed)
    val n = 3 + rnd.nextInt(6)
    val vs = (1L to n).map(i => (i, rnd.nextInt(100).toLong))
    val es = (0 until n * 2).map { _ =>
      (1L + rnd.nextInt(n), 1L + rnd.nextInt(n), rnd.nextInt(1000).toLong)
    }.distinct
    Graph(vs.toDF("id", "value"), es.toDF("src", "dst", "value"))
  }

  private val seeds = Seq(1L, 7L, 42L, 99L, 12345L)

  test("reverse ∘ reverse = identity") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      assert(triples(g.reverse.reverse.edges) === triples(g.edges))
    }
  }

  test("degrees = inDegrees + outDegrees pointwise") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      val in  = pairs(g.inDegrees).toMap
      val out = pairs(g.outDegrees).toMap
      pairs(g.degrees).foreach { case (id, d) =>
        assert(d === in(id) + out(id), s"vertex $id seed $s")
      }
    }
  }

  test("subgraph edges ⊆ original edges; vertices ⊆ original") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      val sub = g.subgraph(col("value") > 20, col("value") > 300)
      assert(triples(sub.edges).toSet.subsetOf(triples(g.edges).toSet))
      assert(pairs(sub.vertices).toSet.subsetOf(pairs(g.vertices).toSet))
      assert(sub.invalidEndpoints.count() === 0)
    }
  }

  test("undirected doubles the edge multiset") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      assert(g.undirected.numEdges === 2 * g.numEdges)
    }
  }

  test("fromEdges vertex set = distinct endpoints; graph validates") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      val inferred = Graph.fromEdges(g.edges, id => lit(0L))
      val endpoints = triples(g.edges).flatMap(e => Seq(e._1, e._2)).toSet
      assert(pairs(inferred.vertices).map(_._1).toSet === endpoints)
      assert(inferred.invalidEndpoints.count() === 0)
    }
  }

  test("filterOnVertices result validates (no dangling endpoints)") {
    seeds.foreach { s =>
      val g = randomGraph(s).filterOnVertices(col("value") % 2 === 0)
      assert(g.invalidEndpoints.count() === 0)
    }
  }

  test("mapVertices preserves cardinality and ids") {
    seeds.foreach { s =>
      val g = randomGraph(s)
      val m = g.mapVertices(v => v * 2 + 1)
      assert(pairs(m.vertices).map(_._1) === pairs(g.vertices).map(_._1))
    }
  }
}
