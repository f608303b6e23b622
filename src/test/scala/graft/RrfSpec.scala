package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X190 retrieval_rrf_fusion: hand-computed RRF arithmetic, the
  * symmetric-tie doc_id break, and the property the operator exists for —
  * fusion depends on the arms' RANKS only, so any order-preserving score
  * perturbation leaves the fused list bit-identical.
  */
class RrfSpec extends GraftSuite {
  import queries.SimQueries

  private def lexFrame(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("q_idx", "doc_id", "lex_rk")
  }
  private def denseFrame(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("q_idx", "doc_id", "dense_rk")
  }

  test("rrfFuse matches the hand-computed Cormack k=60 arithmetic, " +
    "including the cross-arm symmetric tie broken on doc_id") {
    // q0: lex = [10, 11, 13], dense = [12, 11].
    //   doc11 = 1/62 + 1/62 = 0.032258; doc10 = 1/61 = 0.016393;
    //   doc12 = 1/61 = 0.016393 (symmetric with doc10 — doc_id breaks);
    //   doc13 = 1/63 = 0.015873.
    val lex = lexFrame(Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 13L, 3L)))
    val dense = denseFrame(Seq((0L, 12L, 1L), (0L, 11L, 2L)))
    val got = SimQueries.rrfFuse(lex, dense)
      .select("q_idx", "fused_rk", "doc_id", "rrf")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(
      (0L, 1, 11L, 0.032258),
      (0L, 2, 10L, 0.016393), // ties doc12 exactly; lower id first
      (0L, 3, 12L, 0.016393),
      (0L, 4, 13L, 0.015873)))
  }

  test("fusion is invariant under order-preserving score perturbation " +
    "on both arms (the reason RAG stacks fuse ranks, not scores)") {
    import spark.implicits._
    // Two synthetic score tables over 3 queries × 20 docs, deterministic
    // but irregular (hash-derived), scores in wildly different scales.
    val base = (0L until 3L).flatMap { q =>
      (0L until 20L).map { d =>
        val h = (q * 31 + d * 17 + 7) % 101
        val g = (q * 13 + d * 29 + 3) % 97
        (q, d, h.toDouble / 3.0, g.toDouble * 42.0) // lexScore, denseScore
      }
    }.toDF("q_idx", "doc_id", "lex_score", "dense_score")

    def rankings(df: DataFrame): (DataFrame, DataFrame) = {
      val wl = Window.partitionBy(col("q_idx"))
        .orderBy(col("lex_score").desc, col("doc_id"))
      val wd = Window.partitionBy(col("q_idx"))
        .orderBy(col("dense_score").desc, col("doc_id"))
      val lex = df.withColumn("lex_rk", row_number().over(wl).cast("long"))
        .filter(col("lex_rk") <= 10)
        .select(col("q_idx"), col("doc_id"), col("lex_rk"))
      val dense = df
        .withColumn("dense_rk", row_number().over(wd).cast("long"))
        .filter(col("dense_rk") <= 10)
        .select(col("q_idx"), col("doc_id"), col("dense_rk"))
      (lex, dense)
    }

    val (lex0, dense0) = rankings(base)
    // Monotone perturbations: affine stretch on one arm, exp on the other
    // — order preserved, every score value changed.
    val perturbed = base.select(col("q_idx"), col("doc_id"),
      (col("lex_score") * 1000.0 + 5.0).as("lex_score"),
      exp(col("dense_score") / 500.0).as("dense_score"))
    val (lex1, dense1) = rankings(perturbed)

    val a = rows(SimQueries.rrfFuse(lex0, dense0))
    val b = rows(SimQueries.rrfFuse(lex1, dense1))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("registered key: 4 query bands, 10 fused rows each, term carried " +
    "on every row including dense-only candidates") {
    val df = queries.Registry.byKey("retrieval_rrf_fusion")
      .fn(spark, "/root/testdata/sf0.001")
    val got = df.collect()
    assert(got.length === 40)
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("term"))))
    // At least one candidate per board should be single-arm (NULL rank on
    // the other side) — otherwise the full-outer union isn't exercised.
    assert(got.exists(r => r.isNullAt(r.fieldIndex("lex_rk"))) ||
      got.exists(r => r.isNullAt(r.fieldIndex("dense_rk"))))
  }
  test("retrieval_eval_hybrid on the live sf0.001 fixture: structural " +
    "lexical saturation, fusion lifts the dense arm, exact integer " +
    "metric arithmetic") {
    import graft.sources.Tables
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val cent = SimQueries.centroidsOf(
      graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings"))
    val rows = SimQueries.evalHybridOf(docs, e, cent).collect()
    val arms = Seq("bm25", "dense", "ivf", "prf", "rrf", "rrf_ivf")
    // shape: 6 arms x (4 per-query rows + 1 summary row)
    assert(rows.length === 30)
    val summary = rows.filter(_.getLong(1) == -1L)
      .map(r => r.getString(0) -> r).toMap
    assert(summary.keySet === arms.toSet)
    // STRUCTURAL: every BM25-retrieved doc contains its query term, so
    // the lexical arm saturates hits@k and its first hit is rank 1
    // (the known-item-evaluation ceiling the scaladoc documents).
    assert(summary("bm25").getLong(4) === 40L)   // hits = k * nq
    assert(summary("bm25").getLong(6) === 1000000L) // mrr_micro
    // MEASURED fusion benefit (sf0.001/0.01/0.1 receipts in scaladoc):
    // fusing the arms strictly lifts the dense side and never costs it
    assert(summary("rrf").getLong(5) > summary("dense").getLong(5))
    assert(summary("rrf").getLong(6) >= summary("dense").getLong(6))
    // the serving (IVF-armed) fusion lifts the IVF arm the same way at
    // every checked SF; ivf-vs-dense is MEASURED per fixture, not a
    // theorem (the probe restriction lost recall here at sf0.001 but
    // WON at sf0.1 where label clusters correlate with relevance —
    // scaladoc records both directions)
    assert(summary("rrf_ivf").getLong(5) > summary("ivf").getLong(5))
    assert(summary("ivf").getLong(5) <= summary("dense").getLong(5))
    // exact integer metric arithmetic on every row
    rows.filter(_.getLong(1) >= 0).foreach { r =>
      assert(r.getLong(5) === r.getLong(4) * 1000000L / r.getLong(3))
      assert(r.getLong(4) <= 10L && r.getLong(3) > 0L)
    }
    // per-arm summary totals fold their per-query rows exactly
    arms.foreach { a =>
      val det = rows.filter(r => r.getString(0) == a && r.getLong(1) >= 0)
      assert(summary(a).getLong(4) === det.map(_.getLong(4)).sum)
      assert(summary(a).getLong(3) === det.map(_.getLong(3)).sum)
      assert(summary(a).getLong(6) ===
        det.map(_.getLong(6)).sum / det.length)
    }
  }
}
