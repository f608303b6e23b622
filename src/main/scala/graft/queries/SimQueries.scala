package graft.queries

import graft.functions.VectorFns
import graft.sources.Tables
import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + multimodal operators (north-star extensions):
  * brute-force cosine top-k (the correctness baseline), an IVF-style
  * partitioned variant (the 100 TB scale path), embedding-cosine near-dup,
  * and the multimodal binary-column pipeline with a stubbed decoder.
  */
object SimQueries {
  private val TopK       = 5
  private val NQueries   = 10
  private val NearThresh = 0.45 // synthetic embeddings are near-orthogonal;
                                // max pairwise cosine ≈ 0.51 (measured)

  /** Embeddings with precomputed norms. */
  private def withNorms(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))

  /** X3 — brute-force cosine top-k: queries = vec_id < NQueries, ranked by
    * quantized cosine with id tie-break. The query side is broadcast
    * (tiny); the candidate scan is embarrassingly parallel — this plan
    * scales linearly with the candidate count, which is exactly what a
    * 1000-executor brute-force ANN baseline should do.
    */
  private def simTopk(s: SparkSession, dir: String): DataFrame = {
    val e = withNorms(s, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        Det.qround(VectorFns.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= TopK)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val simTopkSql = {
    val dot = VectorFns.dotSql("q.embedding", "c.embedding")
    s"""WITH n AS (
       |  SELECT vec_id, embedding, ${VectorFns.normSql("embedding")} AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ${Det.qroundSql(s"$dot / (q.nrm * c.nrm)", 6)} AS cos
       |  FROM n q JOIN n c ON q.vec_id < $NQueries
       |   AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, rk, c_id, cos FROM ranked WHERE rk <= $TopK
       |ORDER BY q_id, rk""".stripMargin
  }

  /** IVF-style ANN (scale path): coarse centroids = per-label mean
    * vectors; each query probes its 2 nearest centroids and scores only
    * those inverted lists (~2/10 of the data). At 100 TB the lists are
    * bucketed/partitioned by centroid id, so a query touches only its
    * probed partitions.
    *
    * SQL-oracled: centroid means are computed over INTEGER-scaled
    * components — `floor(x·10⁶ + 0.5)` is pure IEEE (bit-identical in both
    * engines, like [[Det.qround]]), the BIGINT sum is order-independent,
    * and the final `sum/(10⁶·n)` division is a single deterministic IEEE
    * op. Every downstream dot/norm/ratio is then the same sequential fold
    * on both sides, so probe selection and final ranking match exactly.
    */
  private def simTopkIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorms(s, dir)
    // centroids: mean per label via posexplode + re-collect (distributed)
    val cent = Tables(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * 1000000.0 + 0.5)
        .cast("long")).as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sv").cast("double") / (lit(1000000.0) * col("n"))).as("v"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v"))))
        .as("pv"))
      .select(col("label").as("c_label"),
        transform(col("pv"), p => p.getField("v")).as("centroid"))
      .withColumn("c_nrm", VectorFns.norm(col("centroid")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_label"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_label"),
        (VectorFns.dot(col("q_emb"), col("centroid")) /
          (col("q_nrm") * col("c_nrm"))).as("c_cos"))
      .withColumn("c_rk", row_number().over(probeW))
      .filter(col("c_rk") <= 2)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_label"))
    val scored = e.join(broadcast(probes), col("label") === col("c_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        Det.qround(VectorFns.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= TopK)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  private val simTopkIvfSql = {
    val cdot = VectorFns.dotSql("q.q_emb", "c.centroid")
    val sdot = VectorFns.dotSql("p.q_emb", "c.embedding")
    s"""WITH n AS (
       |  SELECT vec_id, label, embedding,
       |    ${VectorFns.normSql("embedding")} AS nrm
       |  FROM embeddings),
       |comps AS (
       |  SELECT label,
       |    unnest(range(0, len(embedding))) AS pos,
       |    unnest(embedding) AS comp
       |  FROM embeddings),
       |centc AS (
       |  SELECT label, pos,
       |    CAST(SUM(CAST(FLOOR(CAST(comp AS DOUBLE) * 1000000.0 + 0.5)
       |             AS BIGINT)) AS DOUBLE) / (1000000.0 * COUNT(*)) AS v
       |  FROM comps GROUP BY label, pos),
       |centn AS (
       |  SELECT c_label, centroid,
       |    ${VectorFns.normSql("centroid")} AS c_nrm
       |  FROM (SELECT label AS c_label, list(v ORDER BY pos) AS centroid
       |        FROM centc GROUP BY label)),
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM n WHERE vec_id < $NQueries),
       |probe0 AS (
       |  SELECT q.q_id, q.q_emb, q.q_nrm, c.c_label,
       |    $cdot / (q.q_nrm * c.c_nrm) AS c_cos
       |  FROM q CROSS JOIN centn c),
       |probes AS (
       |  SELECT q_id, q_emb, q_nrm, c_label FROM (
       |    SELECT q_id, q_emb, q_nrm, c_label,
       |      row_number() OVER (PARTITION BY q_id
       |                         ORDER BY c_cos DESC, c_label) AS c_rk
       |    FROM probe0) WHERE c_rk <= 2),
       |scored AS (
       |  SELECT p.q_id, c.vec_id AS c_id,
       |    ${Det.qroundSql(s"$sdot / (p.q_nrm * c.nrm)", 6)} AS cos
       |  FROM n c JOIN probes p
       |    ON c.label = p.c_label AND c.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, c_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, rk, c_id, cos FROM ranked WHERE rk <= $TopK
       |ORDER BY q_id, rk""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs (dedup family): all pairs above
    * the cosine threshold — EXACT semantics (the oracle is all-pairs SQL).
    *
    * Physical plan: distributed block nested-loop. Rows are assigned to
    * `vec_id % nBlocks` blocks (nBlocks sized by data volume, not core
    * count); a tiny broadcast table of unordered block pairs replicates
    * each row to its ~nBlocks/2 partner pairs; the equi-join on the pair id
    * then evaluates the codegen'd [[VectorFns.dot]] kernel over each
    * |Li|×|Rj| block product. Nothing is collected to the driver and no
    * task ever holds more than two blocks (≈2·RowsPerBlock·64 floats) —
    * this is the shape an exact O(n²) scan must take on a 1000-executor
    * cluster. (At 100 TB an exact low-threshold all-pairs is inherently
    * quadratic; a production near-dup pass would first narrow candidates
    * with the LSH/IVF machinery in [[simTopkIvf]]/MinHash and run this same
    * block kernel per bucket.)
    *
    * The fold order (sequential over dims, float widened to double) matches
    * [[VectorFns.dot]] and the DuckDB twin bit-for-bit; dot and the norm
    * product are symmetric, so evaluating a pair in either operand order
    * yields bit-identical cosines.
    */
  private val RowsPerBlock = 1024

  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = withNorms(s, dir)
    val nBlocks = math.max(1L,
      (e.count() + RowsPerBlock - 1) / RowsPerBlock).toInt
    val blkPairs = (for { i <- 0 until nBlocks; j <- i until nBlocks }
      yield (i, j, i.toLong * nBlocks + j)).toDF("blk_l", "blk_r", "pid")
    val blocked = e.select(col("vec_id"), col("embedding"), col("nrm"),
      (col("vec_id") % nBlocks).cast("int").as("blk"))
    val lhs = blocked.join(broadcast(blkPairs), col("blk") === col("blk_l"))
      .select(col("pid"), col("blk_l"), col("blk_r"),
        col("vec_id").as("id_l"), col("embedding").as("emb_l"),
        col("nrm").as("nrm_l"))
    val rhs = blocked.join(broadcast(blkPairs), col("blk") === col("blk_r"))
      .select(col("pid").as("pid_r"), col("vec_id").as("id_r"),
        col("embedding").as("emb_r"), col("nrm").as("nrm_r"))
    lhs.join(rhs, col("pid") === col("pid_r") &&
        (col("blk_l") < col("blk_r") || col("id_l") < col("id_r")))
      .select(least(col("id_l"), col("id_r")).as("v1"),
        greatest(col("id_l"), col("id_r")).as("v2"),
        Det.qround(VectorFns.dot(col("emb_l"), col("emb_r")) /
          (col("nrm_l") * col("nrm_r")), 6).as("cos"))
      .filter(col("cos") >= NearThresh)
      .orderBy(col("v1"), col("v2"))
  }

  private val dedupEmbeddingSql = {
    val dot = VectorFns.dotSql("a.embedding", "b.embedding")
    s"""WITH n AS (
       |  SELECT vec_id, embedding, ${VectorFns.normSql("embedding")} AS nrm
       |  FROM embeddings)
       |SELECT v1, v2, cos FROM (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2,
       |    ${Det.qroundSql(s"$dot / (a.nrm * b.nrm)", 6)} AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id) t
       |WHERE cos >= $NearThresh ORDER BY v1, v2""".stripMargin
  }

  /** Multimodal pipeline: documents as opaque binary blobs with typed
    * metadata, "decoded" per partition. The decode step is a clearly marked
    * STUB (real image/audio libs are absent in this environment — north-star
    * contract); the Spark-side plumbing is real: typed Dataset, per-partition
    * batch processing via mapPartitions, deterministic feature schema.
    */
  private def multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions { iter =>
      iter.map { case (id, bytes) =>
        // STUB decoder: a real deployment would decode image/audio frames
        // here (e.g. JPEG → RGB tensor). We emit deterministic fake
        // features derived from the raw bytes so the pipeline stays
        // verifiable end-to-end.
        val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xffL)) % 65536L
        val nChunks  = (bytes.length + 1023) / 1024 // fake "frame" count
        (id, bytes.length.toLong, (bytes.head & 0xffL), (bytes.last & 0xffL),
          checksum, nChunks.toLong)
      }
    }.toDF("doc_id", "n_bytes", "first_byte", "last_byte", "checksum",
        "n_chunks")
      .orderBy(col("doc_id"))
  }

  // documents are ASCII (lowercase tokens), so byte values == code points.
  private val multimodalSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(unicode(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(unicode(substr(text, length(text), 1)) AS BIGINT) AS last_byte,
      |  CAST(list_sum(list_transform(string_split(text, ''),
      |    c -> CAST(unicode(c) AS BIGINT))) % 65536 AS BIGINT) AS checksum,
      |  CAST(FLOOR((octet_length(encode(text)) + 1023) / 1024.0) AS BIGINT) AS n_chunks
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal frame-sampling stage: chunk each blob into fixed 1 KiB
    * "frames" (the video/audio analogue: fixed-duration segments), SAMPLE
    * every 2nd frame, and feature-extract each sampled frame (stub
    * checksum — see [[multimodal]]'s STUB note). Output is exploded to one
    * row per sampled frame (doc_id, n_frames, frame_idx, checksum) — the
    * shape a real pipeline wants anyway: downstream stages join features
    * back by (doc_id, frame_idx), and a repartition on doc_id rebalances
    * decode work when blob sizes are skewed.
    */
  private val FrameBytes = 1024
  private val SampleRate = 2

  private def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions(_.flatMap { case (id, bytes) =>
      val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
      (0 until nFrames by SampleRate).iterator.map { f =>
        var acc = 0L
        var i = f * FrameBytes
        val end = math.min(i + FrameBytes, bytes.length)
        while (i < end) { acc += bytes(i) & 0xffL; i += 1 }
        (id, nFrames.toLong, f.toLong, acc % 65536L)
      }
    }).toDF("doc_id", "n_frames", "frame_idx", "checksum")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ASCII text ⇒ byte values == code points; frame f covers substr
  // [f*1024+1, 1024] (SQL is 1-based).
  private val multimodalFramesSql =
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    CAST(FLOOR((length(text) + $FrameBytes - 1) / $FrameBytes.0)
       |         AS BIGINT) AS n_frames
       |  FROM documents),
       |fx AS (
       |  SELECT doc_id, text, n_frames,
       |    unnest(range(0, n_frames, $SampleRate)) AS f
       |  FROM base)
       |SELECT doc_id, n_frames, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(list_sum(list_transform(
       |    string_split(substr(text, CAST(f * $FrameBytes + 1 AS INT), $FrameBytes), ''),
       |    c -> CAST(unicode(c) AS BIGINT))) % 65536 AS BIGINT) AS checksum
       |FROM fx ORDER BY doc_id, frame_idx""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("sim_topk", simTopk, Some(simTopkSql)),
    Q("sim_topk_ivf", simTopkIvf, Some(simTopkIvfSql)),
    Q("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql)),
    Q("multimodal_features", multimodal, Some(multimodalSql)),
    Q("multimodal_frames", multimodalFrames, Some(multimodalFramesSql)),
  )
}
