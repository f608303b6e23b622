package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Training-data pipeline plumbing: shard packing, splitting, quantization.
  * The load-bearing claim is determinism under re-partitioning — a 100 TB
  * run re-reads the same corpus with different splits/parallelism and must
  * get the same shard/split assignment every time.
  */
class PipelineSpec extends GraftSuite {

  private def docs(nParts: Int) = {
    import spark.implicits._
    // 200 docs, 1..50 tokens each, ~5100 tokens total — several 1000-token
    // shard boundaries, so the tests exercise boundary straddles and the
    // cross-partition offset seeding (not just shard 0).
    (0L until 200L).map { i =>
      (i, Seq.fill((i % 50).toInt + 1)("w" + (i % 7)).mkString(" "))
    }.toDF("doc_id", "text").repartition(nParts)
  }

  test("shard_pack is invariant under input partitioning") {
    val a = PipelineQueries.shardPackOf(spark, docs(1)).collect().toSeq
    val b = PipelineQueries.shardPackOf(spark, docs(7)).collect().toSeq
    val c = PipelineQueries.shardPackOf(spark, docs(32)).collect().toSeq
    assert(a.map(_.toSeq).sortBy(_.head.toString) ===
      b.map(_.toSeq).sortBy(_.head.toString))
    assert(a.map(_.toSeq).sortBy(_.head.toString) ===
      c.map(_.toSeq).sortBy(_.head.toString))
  }

  test("shard_pack_tar: container manifest is invariant under input " +
    "partitioning and matches a local tar model byte-for-byte") {
    import graft.functions.TarCodec
    val a = PipelineQueries.shardPackTarOf(spark, docs(1)).collect()
    val b = PipelineQueries.shardPackTarOf(spark, docs(13)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // Local model: pack the same docs with the same assignment rule,
    // encode locally, and recompute every manifest column from bytes.
    val local = PipelineQueries.shardPackOf(spark, docs(3))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val texts = (0L until 200L).map { i =>
      i -> Seq.fill((i % 50).toInt + 1)("w" + (i % 7)).mkString(" ")
    }.toMap
    val expected = local.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (shard, ds) =>
        val blob = TarCodec.encode(ds.map(_._1).sorted.map(id =>
          s"$id.txt" -> texts(id).getBytes("UTF-8")))
        val ms = TarCodec.decode(blob).toOption.get
        Seq(shard, ms.size.toLong, ds.map(_._1).min, ds.map(_._1).max,
          blob.length.toLong, blob.map(_ & 0xff).map(_.toLong).sum,
          ms.map(_.offset).sum)
    }
    assert(a.map(_.toSeq).toSeq === expected)
  }

  test("shard_tar_audit: member walk matches the layout plan; corrupt " +
    "subsets fail with their own measured class") {
    import spark.implicits._
    // bigger fixture than docs(): ~15k tokens -> 16 shards, so both
    // corrupt classes (shard % 13 = 5 and 7) occur
    val big = (0L until 600L).map { i =>
      (i, Seq.fill((i % 50).toInt + 1)("w" + (i % 7)).mkString(" "))
    }.toDF("doc_id", "text").repartition(5)
    val rows = PipelineQueries.shardTarAuditOf(spark, big).collect()
    val byShard = rows.groupBy(_.getLong(0))
    byShard.foreach { case (shard, rs) =>
      if (shard % 13 == 5) {
        assert(rs.length === 1 && !rs.head.getBoolean(1))
        assert(rs.head.getString(2) === "bad_magic")
        assert(rs.head.getLong(3) === -1L && rs.head.isNullAt(4))
      } else if (shard % 13 == 7) {
        assert(rs.length === 1 && !rs.head.getBoolean(1))
        assert(rs.head.getString(2) === "bad_checksum")
      } else {
        // valid shards: contiguous member_idx, doc-order offsets that
        // advance by exactly the member's block footprint
        val sorted = rs.sortBy(_.getLong(3))
        assert(sorted.map(_.getLong(3)).toSeq === sorted.indices.map(_.toLong))
        sorted.zip(sorted.drop(1)).foreach { case (m, n) =>
          val blocks = 1 + (m.getLong(6) + 511) / 512
          assert(n.getLong(5) === m.getLong(5) + 512 * blocks)
          assert(m.getLong(4) < n.getLong(4)) // doc order
        }
        assert(sorted.head.getLong(5) === 0L)
        assert(rs.forall(r => r.getBoolean(1) && r.getString(2) == "ok"))
      }
    }
    // both corrupt classes actually occur on this fixture
    assert(byShard.keys.exists(_ % 13 == 5))
    assert(byShard.keys.exists(_ % 13 == 7))
  }

  test("shard_pack_tgz: valid shards match the tar manifest exactly; " +
    "both gzip corrupt classes occur and null their manifests") {
    import spark.implicits._
    val big = (0L until 600L).map { i =>
      (i, Seq.fill((i % 50).toInt + 1)("w" + (i % 7)).mkString(" "))
    }.toDF("doc_id", "text").repartition(4)
    val tgz = PipelineQueries.shardPackTgzOf(spark, big).collect()
    val tar = PipelineQueries.shardPackTarOf(spark, big).collect()
      .map(r => r.getLong(0) -> r).toMap
    tgz.foreach { r =>
      val shard = r.getLong(0)
      if (shard % 11 == 3) {
        assert(!r.getBoolean(1) && r.getString(2) == "bad_magic" &&
          r.isNullAt(3))
      } else if (shard % 11 == 7) {
        assert(!r.getBoolean(1) && r.getString(2) == "bad_gzip" &&
          r.isNullAt(3))
      } else {
        // the gunzip round-trip reproduces the uncompressed manifest
        val t = tar(shard)
        assert(r.getBoolean(1) && r.getString(2) == "ok")
        assert((3 to 8).map(r.getLong) ===
          (1 to 6).map(t.getLong)) // n_members..offset_sum
      }
    }
    assert(tgz.exists(_.getLong(0) % 11 == 3))
    assert(tgz.exists(_.getLong(0) % 11 == 7))
  }

  test("corpus_pack_sequences: invariant under partitioning; exact " +
    "local concat-and-chunk model") {
    val a = PipelineQueries.packSequencesOf(spark, docs(1)).collect().toSeq
    val b = PipelineQueries.packSequencesOf(spark, docs(13)).collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq)) // ordered output, same rows
    // Local model: lay out the 200 docs' token counts in doc_id order and
    // chunk every 256 tokens.
    val lens = (0L until 200L).map(i => (i % 50) + 1)
    val starts = lens.scanLeft(0L)(_ + _)
    val L = 256L
    val total = lens.sum
    val nSeq = (total + L - 1) / L
    val model = (0L until nSeq).map { s =>
      val docsIn = lens.indices.filter { i =>
        starts(i) < (s + 1) * L && starts(i) + lens(i) > s * L
      }
      val spanning = docsIn.count(i => starts(i) + lens(i) > (s + 1) * L)
      val fill = docsIn.map { i =>
        math.min(starts(i) + lens(i), (s + 1) * L) -
          math.max(starts(i), s * L)
      }.sum
      Seq(s, docsIn.size.toLong, spanning.toLong, fill)
    }
    assert(a.map(_.toSeq) === model)
    // Every sequence is exactly full except possibly the last.
    val fills = a.map(_.getLong(3))
    assert(fills.init.forall(_ === L) && fills.last === total - (nSeq - 1) * L)
  }

  test("decontaminate finds a cross-split near-dup; exact arm empty under content-hash split") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(t: String): Long =
      graft.functions.TextKernels.stringHash(UTF8String.fromString(t)) % 100
    // Search the hash space for a train-split base text and a test-split
    // near-duplicate of it (same first 7 tokens → ≥ 5 shared 3-gram
    // shingles); the salt suffixes only vary the LAST token.
    val base7 = "alpha beta gamma delta epsilon zeta eta"
    val train = (0 until 1000).iterator
      .map(i => s"$base7 trainsalt$i").find(bucket(_) < 80).get
    val test = (0 until 1000).iterator
      .map(i => s"$base7 testsalt$i").find(bucket(_) >= 90).get
    val noise = "totally unrelated words with zero overlap whatsoever okay"
    val docs = Seq((0L, train), (1L, test), (2L, noise))
      .toDF("doc_id", "text")
    val rareSh = {
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(org.apache.spark.sql.graftbridge.SqlBridge
          .column(graft.functions.ShingleHash(
            org.apache.spark.sql.graftbridge.SqlBridge
              .expression(col("text")))))).as("shingle"))
      sh // tiny corpus: no df cap needed for the seam
    }
    val got = PipelineQueries.decontaminateFrom(docs, rareSh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 1 (test) leaks from doc 0 (train) via shared shingles — and the
    // exact arm CANNOT fire: identical texts hash to the same bucket, so
    // a content-hash split never separates exact copies (the invariant
    // the docstring claims).
    assert(got === Array((1L, 0L, "near")))
  }

  test("stratified_sample is invariant under input partitioning") {
    import spark.implicits._
    def corpus(nParts: Int) = (0L until 200L).map { i =>
      (i, Seq("en", "de", "es", "zh", "fr")((i % 5).toInt),
        s"doc $i body ${"x " * (i % 4).toInt}")
    }.toDF("doc_id", "lang", "text").repartition(nParts)
    val a = PipelineQueries.stratifiedSampleOf(corpus(1)).collect().toSeq
    val b = PipelineQueries.stratifiedSampleOf(corpus(13)).collect().toSeq
    assert(a.map(_.toSeq).sortBy(_.head.toString) ===
      b.map(_.toSeq).sortBy(_.head.toString))
    assert(a.nonEmpty)
    // every kept row respects its stratum's rate gate
    val langs = a.map(r => r.getString(1)).toSet
    assert(langs.contains("en")) // 100% stratum always present
  }

  test("sample_reservoir_weighted: A-Res keys match the hand formula, " +
    "ln(u)/w ordering equals u^(1/w) ordering, weights genuinely bias " +
    "the sample, and the result is partitioning-invariant") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    // the ln(u)/w surrogate is order-equivalent to A-Res's u^(1/w):
    // exp is monotone, so pairwise comparisons agree on ANY (u, w) grid
    val grid = for {
      u <- Seq(0.001, 0.137, 0.5, 0.923, 0.999999)
      w <- Seq(1L, 3L, 47L, 1000L)
    } yield (u, w)
    for (Seq(a, b) <- grid.combinations(2)) {
      val pow = math.pow(a._1, 1.0 / a._2)
        .compareTo(math.pow(b._1, 1.0 / b._2))
      val lnw = (math.log(a._1) / a._2)
        .compareTo(math.log(b._1) / b._2)
      assert(pow.sign === lnw.sign, s"$a vs $b")
    }
    // 200 docs: 10% heavy (len 1000), 90% light (len 10). Weighted
    // sampling must over-represent heavies far beyond their 10% share.
    val docs = (0L until 200L).map { i =>
      val ch = ('a' + (i % 26)).toChar
      val len = if (i % 10 == 0) 1000 else 10
      (i, ch.toString * len)
    }.toDF("doc_id", "text")
    val out = PipelineQueries.sampleReservoirWeightedOf(docs).collect()
    assert(out.length === 40)
    val heavies = out.count(_.getLong(2) === 1001L)
    // 20 heavy docs exist; expectation under w-proportional sampling is
    // near-total inclusion (w ratio 100:1). Uniform sampling would give
    // ~4. Deterministic given the salted hash — pin the measured count
    // loosely so a hash change fails loudly without over-fitting.
    assert(heavies >= 15, s"only $heavies heavy docs in the sample")
    // exact key arithmetic: recompute one row's key by hand from the
    // frame's own (u, w) ingredients
    val keyed = docs.select(col("doc_id"),
      graft.functions.TextFns.stringHash(
        concat(lit("wres:"), col("text"))).as("h"),
      (octet_length(col("text")) + 1).cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = keyed.map { case (id, h, w) =>
      val m = ((h % 1000000L) + 1000000L) % 1000000L
      val u = (m + 1).toDouble / 1000001.0
      val key = math.floor(math.log(u) / w.toDouble * 1000.0 * 1e6 + 0.5) / 1e6
      (id, w, key)
    }.sortBy(t => (-t._3, t._1)).take(40)
    val got = out.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === expect.map(t => (t._1, t._2, t._3)).toSeq)
    // partitioning invariance (the reproducibility contract)
    val out7 = PipelineQueries
      .sampleReservoirWeightedOf(docs.repartition(7)).collect()
    assert(out7.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("shard_pack matches a local exclusive-prefix-sum model") {
    val rows = PipelineQueries.shardPackOf(spark, docs(5))
      .orderBy(col("doc_id"))
      .select("doc_id", "n_tokens", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var acc = 0L
    rows.foreach { case (_, n, shard) =>
      assert(shard === acc / 1000L)
      acc += n
    }
    // shards are contiguous, non-decreasing, start at 0, and the corpus
    // actually spans several shards (guards against a vacuous all-zero run)
    assert(rows.head._3 === 0L)
    assert(rows.map(_._3).max >= 4L)
    assert(rows.map(_._3).sliding(2).forall(p =>
      p.length < 2 || p(1) - p(0) <= 1 && p(1) >= p(0)))
  }

  test("kmeans_step: complete partition of the vectors, full-dim centroids") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Registry.byKey("kmeans_step").fn(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val nVec = graft.sources.Tables(spark, sf, "embeddings").count()
    val byCluster = out.groupBy(_._1)
    // every emitted cluster carries all 64 components with one shared n
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (0 until 64), s"cluster $c")
      assert(rows.map(_._4).distinct.length === 1, s"cluster $c")
    }
    // assignments partition the vector set exactly
    assert(byCluster.values.map(_.head._4).sum === nVec)
    // centroid components stay in the data's value range
    assert(out.forall(r => r._3 >= -1.5 && r._3 <= 1.5))
  }

  test("kmeans_iterated: still a complete partition after K rounds, and " +
    "the iteration moves vectors vs one step") {
    val sf = "/root/testdata/sf0.001"
    def sizes(key: String): Seq[Long] = {
      val out = graft.queries.Registry.byKey(key).fn(spark, sf)
        .collect().map(r =>
          (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      val byCluster = out.groupBy(_._1)
      byCluster.foreach { case (c, rows) =>
        assert(rows.map(_._2).sorted.toSeq === (0 until 64), s"cluster $c")
        assert(rows.map(_._4).distinct.length === 1, s"cluster $c")
      }
      byCluster.values.map(_.head._4).toSeq
    }
    val it = sizes("kmeans_iterated")
    val step = sizes("kmeans_step")
    val nVec = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(it.sum === nVec)
    // matches the Python simulation's round-4 cluster sizes (the exact
    // arithmetic contract: µ-int sums, one IEEE division, qround cosine)
    assert(it.sorted.reverse ===
      Seq(56L, 55L, 54L, 53L, 52L, 49L, 47L, 46L, 46L, 42L))
    // and the composition bites: round-4 sizes differ from round-1's
    assert(it.sorted !== step.sorted)
  }

  test("bpe_merges: greedy run pairing, lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "b c"), (3L, "b c"),
      (4L, "d e d e f")).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.bpeMergesOf(docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // round 1: (a,a) counts 3 (adjacent positions, overlap included —
    // the HF convention); greedy merge pairs the run alternately
    assert(out(0) === ((1, "a a", 3L)))
    // round 2: "b c" and "d e" tie at 2 — lexicographic tie-break
    assert(out(1) === ((2, "b c", 2L)))
    // round 3: "d e" twice in doc 4
    assert(out(2) === ((3, "d e", 2L)))
    // round 4: doc 1 became "a_a a_a" — BOTH run pairs merged in round 1
    // (the single-space encoding would have left "a_a a a" and this pick
    // would be "a a"); "a_a a_a" < "d_e d_e" < "d_e f"
    assert(out(3) === ((4, "a_a a_a", 1L)))
  }

  test("bpe_encode: stats over the rewritten corpus match the merges") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "b c"), (3L, "b c"),
      (4L, "d e d e f")).toDF("doc_id", "text")
    val (_, rewritten) = graft.queries.TextQueries.bpeChainOf(docs)
    val out = graft.queries.TextQueries.bpeEncodeStats(rewritten)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // merges: r1 "a a", r2 "b c", r3 "d e", r4 "a_a a_a" (see the
    // bpe_merges test) ⇒ doc 1 collapses to the single token a_a_a_a,
    // docs 2/3 to b_c, doc 4 to "d_e d_e f" (3 tokens, 2 merged)
    assert(out.toSeq === Seq((1L, 1, 1), (2L, 1, 1), (3L, 1, 1),
      (4L, 3, 2)))
  }

  test("text_entropy: uniform and degenerate distributions are exact") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "a a b b"), (3L, "a b c d"),
      (4L, "a a a b")).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.textEntropyOf(docs)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // counts are exact; entropies carry the per-term 1e-6 quantization
    // (each -p·ln p term floors to 6 dp before the sum)
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Array((1L, 4L, 1L), (2L, 4L, 2L), (3L, 4L, 4L), (4L, 4L, 2L)))
    val want = Seq(0.0, 1.0, 2.0, 0.811278) // H in bits; doc 4 = 2 - 0.75·log2(3)
    out.map(_._4).zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) <= 5e-6, s"$got vs $w")
    }
  }

  test("corpus_temperature: sqrt-flattened shares and weights are exact") {
    import spark.implicits._
    // en: 3 tokens of 4 (p=0.75), de: 1 of 4 (p=0.25). α=0.5 flattening:
    // sq = floor(√p·1e9 + 0.5) → en 866025404, de 500000000;
    // q = sq/Σsq; weight = q/p — de (low-resource) up-weighted > 1,
    // en down-weighted < 1, all reproduced with the same quantization.
    val docs = Seq(("en", "a b c"), ("de", "x")).toDF("lang", "text")
    val out = graft.queries.TextQueries.corpusTemperatureOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val sqEn = math.floor(math.sqrt(0.75) * 1e9 + 0.5)
    val sqDe = math.floor(math.sqrt(0.25) * 1e9 + 0.5)
    val t = sqEn + sqDe
    assert(out.toSeq === Seq(
      ("de", 1L, 1L, q6(0.25), q6(sqDe / t), q6((sqDe / t) / 0.25)),
      ("en", 1L, 3L, q6(0.75), q6(sqEn / t), q6((sqEn / t) / 0.75))))
    assert(out(0)._6 > 1.0 && out(1)._6 < 1.0) // flattening direction
  }

  test("text_bigram_nll: hand-computed conditional LM; 1-token docs absent") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "x")).toDF("doc_id", "text")
    // doc 1 bigrams: (a,b) (b,a) (a,c); ctx a=2, b=1 ⇒
    // p(b|a)=p(c|a)=1/2, p(a|b)=1 ⇒ Σnll = 2·ln2, avg = 2·ln2/3.
    // doc 2 has no bigram and must be absent.
    val out = graft.queries.TextQueries.bigramNllOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 1)
    assert(out(0)._1 === 1L && out(0)._2 === 3L)
    assert(math.abs(out(0)._3 - 2 * math.log(2) / 3) <= 5e-6)
  }

  test("sim_knn_join: k well-formed self-excluding neighbors per vector") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Registry.byKey("sim_knn_join").fn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val nVec = emb.count()
    // The exact-k expectation is a property of the FIXTURE, not the code:
    // it holds iff every inverted list can fill k slots on its own
    // (list minus a possible self ≥ k). Derive it so a regenerated or
    // smaller fixture degrades this test to ≤ k + well-formedness
    // instead of failing without a code bug.
    val minList = emb.groupBy("label").count()
      .agg(org.apache.spark.sql.functions.min("count")).head().getLong(0)
    val fillable = minList - 1 >= 3
    val byQ = out.groupBy(_._1)
    // every vector gets a neighbor list (its own list is always probed,
    // so the candidate pool is nonempty whenever any list has ≥ 2)
    assert(byQ.size.toLong === nVec)
    byQ.foreach { case (q, rows) =>
      if (fillable) assert(rows.length === 3, s"vec $q")
      else assert(rows.length <= 3 && rows.nonEmpty, s"vec $q")
      // ranks are 1..len, never self, neighbors distinct, cosine
      // non-increasing in rank with the pinned id tie-break
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length), s"vec $q")
      assert(rows.forall(_._3 != q), s"vec $q")
      assert(rows.map(_._3).distinct.length === rows.length, s"vec $q")
      val byRank = rows.sortBy(_._2)
      assert(byRank.sliding(2).forall(p => p.length < 2 ||
        p(0)._4 > p(1)._4 ||
        (p(0)._4 == p(1)._4 && p(0)._3 < p(1)._3)), s"vec $q")
    }
  }

  // ---- Product quantization: exact local golden model. Recomputes the
  // codebook/assignment/ADC chain with the same sequential-left-fold
  // arithmetic the Catalyst expressions use, so every code and every
  // approximate distance must match BIT-EXACTLY (not approximately) —
  // any drift in slicing bounds, fold order, or the integer-priority
  // argmin encoding fails loudly.
  private val PqM = 8; private val PqDim = 8; private val PqK = 16

  private def pqModel(sf: String) = {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def subv(v: Array[Float], m: Int): Array[Float] =
      v.slice(m * PqDim, m * PqDim + PqDim)
    val cb: Map[(Int, Int), Array[Float]] = (for {
      (id, v) <- emb.takeWhile(_._1 < PqK); m <- 0 until PqM
    } yield (m, id.toInt) -> subv(v, m)).toMap
    def d2i(a: Array[Float], b: Array[Float]): Long =
      math.floor((dot(a, a) - 2.0 * dot(a, b) + dot(b, b)) * 1000000.0
        + 0.5).toLong
    val codes: Map[(Long, Int), Int] = (for {
      (id, v) <- emb; m <- 0 until PqM
    } yield (id, m) -> (0 until PqK).map(c =>
        d2i(subv(v, m), cb((m, c))) * PqK + c).min.toInt % PqK).toMap
    (emb, cb, codes, d2i _, subv _)
  }

  test("emb_pq_encode matches the exact local PQ model") {
    val sf = "/root/testdata/sf0.001"
    val (emb, _, codes, _, _) = pqModel(sf)
    val out = graft.queries.Registry.byKey("emb_pq_encode").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(out.size === emb.length * PqM)
    assert(out === codes)
    // seeds quantize to themselves (their own codeword is at distance 0)
    for (m <- 0 until PqM; c <- 0 until PqK)
      assert(out((c.toLong, m)) === c, s"seed $c sub $m")
  }

  test("sim_topk_pq matches the exact local ADC model") {
    val sf = "/root/testdata/sf0.001"
    val (emb, cb, codes, d2i, subv) = pqModel(sf)
    val nq = 10; val topK = 5
    val expected = (0L until nq.toLong).flatMap { q =>
      val qv = emb(q.toInt)._2
      val lut = (for (m <- 0 until PqM; c <- 0 until PqK)
        yield (m, c) -> d2i(subv(qv, m), cb((m, c)))).toMap
      emb.filter(_._1 != q).map { case (id, _) =>
        val ad = (0 until PqM).map(m => lut((m, codes((id, m))))).sum
          .toDouble / 1000000.0
        (q, id, ad)
      }.sortBy(t => (t._3, t._2)).take(topK).zipWithIndex
        .map { case ((qq, id, ad), i) => (qq, i + 1, id, ad) }
    }
    val out = graft.queries.Registry.byKey("sim_topk_pq").fn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out === expected)
  }

  test("sim_topk_ivfpq = IVF probe rule ∘ ADC rule (local model)") {
    val sf = "/root/testdata/sf0.001"
    val (emb, cb, codes, d2i, subv) = pqModel(sf)
    val labels = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // integer-scaled per-label centroid means (the centroids() contract)
    val byLabel = emb.groupBy { case (id, _) => labels(id) }
    val cents: Map[Long, Array[Double]] = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(64) { p =>
        vs.map { case (_, v) =>
          math.floor(v(p).toDouble * 1000000.0 + 0.5).toLong
        }.sum.toDouble / (1000000.0 * vs.length)
      }
    }
    def qr(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val nq = 10; val topK = 5
    val expected = (0L until nq.toLong).flatMap { q =>
      val qv = emb(q.toInt)._2.map(_.toDouble)
      val qn = math.sqrt(dot(qv, qv))
      val probed = cents.toSeq.map { case (l, c) =>
        (qr(dot(qv, c) / (qn * math.sqrt(dot(c, c)))), l)
      }.sortBy { case (cos, l) => (-cos, l) }.take(2).map(_._2).toSet
      val qvf = emb(q.toInt)._2
      val lut = (for (m <- 0 until PqM; c <- 0 until PqK)
        yield (m, c) -> d2i(subv(qvf, m), cb((m, c)))).toMap
      emb.filter { case (id, _) => id != q && probed(labels(id)) }
        .map { case (id, _) =>
          val ad = (0 until PqM).map(m => lut((m, codes((id, m))))).sum
            .toDouble / 1000000.0
          (q, id, ad)
        }.sortBy(t => (t._3, t._2)).take(topK).zipWithIndex
        .map { case ((qq, id, ad), i) => (qq, i + 1, id, ad) }
    }
    val out = graft.queries.Registry.byKey("sim_topk_ivfpq").fn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out === expected)
  }

  test("sim_recall_metrics: audit row per method, recall = hits/(nq*k)") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Registry.byKey("sim_recall_metrics")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // one row per approximate method, deterministic order
    assert(rows.map(_._1).toSeq ===
      Seq("ivf", "ivfpq", "ivfpq_rerank", "mrl", "pq"))
    val exact = graft.queries.Registry.byKey("sim_topk").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.foreach { case (m, nPairs, nHits, recall) =>
      // every method emits a full top-k result set (10 queries × k=5)
      assert(nPairs === 50L, m)
      assert(nHits >= 0L && nHits <= nPairs, m)
      assert(recall ===
        math.floor(nHits.toDouble / 50 * 1e6 + 0.5) / 1e6, m)
      // cross-check one arm against an independent recount
      if (m == "ivf") {
        val ivf = graft.queries.Registry.byKey("sim_topk_ivf").fn(spark, sf)
          .collect().map(r => (r.getLong(0), r.getLong(2)))
        assert(nHits === ivf.count(exact.contains).toLong)
      }
    }
  }

  test("text_span_dedup: min-id keeper, partial tails, within-doc repeats") {
    import spark.implicits._
    val boiler = (0 until 10).map("b" + _).mkString(" ")   // one full span
    val docs = Seq(
      (1L, boiler + " t1a t1b"),  // [boiler][t1a t1b] — boiler's keeper
      (2L, boiler + " t2a t2b"),  // boiler dup, not keeper → removed
      (3L, "u0 u1 u2 u3 u4 u5 u6"), // single partial span, unique
      (4L, boiler + " " + boiler))  // within-doc repeat: dup 2, keep 1st
      .toDF("doc_id", "text")
    val out = graft.queries.TextQueries.spanDedupOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // (doc_id, n_spans, dup_spans, removed_spans, tokens_total, tokens_kept)
    assert(out === Array(
      (1L, 2L, 1L, 0L, 12L, 12L),
      (2L, 2L, 1L, 1L, 12L, 2L),
      (3L, 1L, 0L, 0L, 7L, 7L),
      (4L, 2L, 2L, 2L, 20L, 0L)))
    // doc 4's spans both lose to doc 1's keeper occurrence (min doc_id)
  }

  test("corpus_resample: integer thresholds, under-represented sources " +
    "keep everything") {
    import spark.implicits._
    // source A: 30 tokens (over-represented), source B: 10 tokens.
    // tok_tot=40, K=2 → thresh_A = 1e5*40 div (2*30) = 66666 (thinned
    // toward uniform), thresh_B = 1e5*40 div (2*10) = 200000 → capped
    // at MixScale (a filter cannot upsample).
    val docs = Seq(
      (1L, "A", (1 to 12).map("a" + _).mkString(" ")),
      (2L, "A", (1 to 18).map("b" + _).mkString(" ")),
      (3L, "B", (1 to 4).map("c" + _).mkString(" ")),
      (4L, "B", (1 to 6).map("d" + _).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = graft.queries.PipelineQueries.corpusResampleOf(docs)
    assert(out.columns.toSeq ===
      Seq("doc_id", "source", "n_tokens", "thresh", "keep"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length === 4)
    assert(rows.filter(_._2 == "A").forall(_._4 == 66666L))
    assert(rows.filter(_._2 == "B").forall(r =>
      r._4 == 100000L && r._5)) // thresh = MixScale ⇒ every doc kept
  }

  test("substrate_window_frames: running/sliding/lag frames with a " +
    "date tie and a partition head") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val orders = Seq(
      (1L, 7L, 0.10, t(100)), (2L, 7L, 0.20, t(200)),
      (3L, 7L, 0.30, t(200)), // date tie with k=2 → orderkey breaks it
      (4L, 7L, 0.40, t(300)),
      (5L, 9L, 0.50, t(100))) // single-order partition
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .repartition(3)
    val out = graft.queries.Substrate.windowFramesOf(orders).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(out.toSeq === Seq(
      (1L, 10L, 10L, 10L, 1L, None),
      (2L, 20L, 30L, 30L, 2L, Some(10L)),
      (3L, 30L, 60L, 60L, 3L, Some(20L)),
      (4L, 40L, 100L, 90L, 3L, Some(30L)),
      (5L, 50L, 50L, 50L, 1L, None)))
  }

  test("substrate_merge_upsert: driver-modeled K/U/I/delete application") {
    import spark.implicits._
    import graft.functions.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    val ks = (1L to 30L)
    val orders = ks.map(k => (k, k * 10, 10.00 + k))
      .toDF("o_orderkey", "o_custkey", "o_totalprice").repartition(3)
    def m(k: Long): Long =
      TextKernels.stringHash(UTF8String.fromString(s"cdc:$k")) % 5
    // All three change classes must be exercised by the chosen keys.
    assert(Set(0L, 1L, 2L).subsetOf(ks.map(m).toSet))
    val expected = ks.flatMap { k =>
      val cents = 1000L + 100L * k
      m(k) match {
        case 0 => Seq((k, k * 10, cents + 100, "U"))
        case 1 => Seq.empty // deleted
        case 2 => Seq((k, k * 10, cents, "K"),
          (-k, k * 10, cents + 50, "I"))
        case _ => Seq((k, k * 10, cents, "K"))
      }
    }.sortBy(_._1)
    val out = graft.queries.Substrate.mergeUpsertOf(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === expected)
  }

  test("substrate_profile: nulls, distincts, canonical min/max on " +
    "hand-built rows") {
    import spark.implicits._
    import graft.functions.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    def t(ms: Long) = new java.sql.Timestamp(ms)
    def sh(x: String) = TextKernels.stringHash(UTF8String.fromString(x))
    // Nulls in custkey/totalprice/priority — the fixture tables carry none,
    // so the null-count column is proven here.
    val orders = Seq(
      (1L, None: Option[Long], "O", Some(10.5), t(1000), Some("1-URGENT")),
      (2L, Some(7L), "F", None: Option[Double], t(2000), None: Option[String]),
      (3L, Some(7L), "P", Some(2.25), t(500), Some("2-HIGH")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(2)
    val out = graft.queries.Substrate.profileOf(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("o_custkey", 3L, 1L, 1L, 7L, 7L),
      ("o_orderdate", 3L, 0L, 3L, 500000L, 2000000L),
      ("o_orderkey", 3L, 0L, 3L, 1L, 3L),
      ("o_orderpriority", 3L, 1L, 2L, sh("1-URGENT"), sh("2-HIGH")),
      ("o_orderstatus", 3L, 0L, 3L, sh("F"), sh("P")),
      ("o_totalprice", 3L, 1L, 2L, 225L, 1050L)))
  }

  test("substrate_pivot: pinned wide schema, zero counts, NULL empty sums") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 1.5), (1L, "click", 2.25), (1L, "view", 4.0),
      (2L, "error", 3.0)).toDF("user_id", "event_type", "value")
    val out = graft.queries.Substrate.pivotOf(ev)
    assert(out.columns.toSeq === Seq("user_id",
      "click_n", "click_val", "error_n", "error_val", "purchase_n",
      "purchase_val", "signup_n", "signup_val", "view_n", "view_val"))
    val rows = out.collect()
    val u1 = rows.find(_.getLong(0) == 1L).get
    assert(u1.getLong(1) === 2L && u1.getDouble(2) === 3.75)
    assert(u1.getLong(3) === 0L && u1.isNullAt(4)) // no error events
    assert(u1.getLong(9) === 1L && u1.getDouble(10) === 4.0)
    val u2 = rows.find(_.getLong(0) == 2L).get
    assert(u2.getLong(1) === 0L && u2.isNullAt(2))
    assert(u2.getLong(3) === 1L && u2.getDouble(4) === 3.0)
  }

  test("corpus_epoch_plan: integer budget identities per source") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Registry.byKey("corpus_epoch_plan")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, target, full, partial, planned) = (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(full >= 0L && full <= 4L)
      assert(partial >= 0L && partial <= tok)
      assert(planned === full * tok + partial)
      if (full < 4L) {
        // the budget binds: the plan fills the per-source target exactly,
        // and the remainder is a strict partial pass
        assert(planned === target && partial < tok)
      } else {
        // the repetition cap binds: no partial pass past 4 full epochs
        assert(partial === 0L && planned === 4L * tok)
      }
    }
    // All sources see the same uniform target.
    assert(rows.map(_.getLong(3)).distinct.length === 1)
  }

  test("sim_topk_mrl: k rows per query; truncation visibly reorders") {
    val sf = "/root/testdata/sf0.001"
    val mrl = graft.queries.Registry.byKey("sim_topk_mrl").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val full = graft.queries.Registry.byKey("sim_topk").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perQ = mrl.groupBy(_._1)
    assert(perQ.size === 10 && perQ.values.forall(_.length === 5))
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted === (1 to 5)) // dense ranks
      assert(rows.forall(_._3 !== q))            // self excluded
    }
    // On near-orthogonal synthetic embeddings, dropping 48 of 64 dims
    // must change at least one query's top-5 set (recall < 1 is the
    // measured, oracle-checked fact in sim_recall_metrics).
    assert(mrl.map(t => (t._1, t._3)).toSet !==
      full.map(t => (t._1, t._3)).toSet)
  }

  test("shard_skew_report: exact fills and imbalance on a hand packing") {
    import spark.implicits._
    // Shards with fills 900, 1100, 500 (greedy overflow on shard 1).
    val packed = Seq(
      (1L, 900L, 0L), (2L, 600L, 1L), (3L, 500L, 1L), (4L, 500L, 2L))
      .toDF("doc_id", "n_tokens", "shard").repartition(2)
    val out = PipelineQueries.shardSkewOf(packed).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4), out.getLong(5)) ===
      ((3L, 4L, 2500L, 500L, 1100L, 1100L * 1000000L * 3L / 2500L)))
  }

  test("sample_split_temporal: integer boundaries, ranges disjoint, " +
    "user-leakage audit counts train overlap") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // Range [0s, 100s] → t1 = 80s, t2 = 90s. u1 in train+valid, u2 only
    // test, u3 in train+test (the leaking user the audit must count).
    val ev = Seq(
      (1L, ts(10), "view", 0.0), (1L, ts(85), "view", 0.0),
      (2L, ts(95), "view", 0.0),
      (3L, ts(0), "view", 0.0), (3L, ts(100), "view", 0.0))
      .map { case (u, t0, ty, v) => (u * 100 + t0.getTime, t0, u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(3)
    val out = PipelineQueries.sampleSplitTemporalOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    def us(sec: Long) = sec * 1000000L
    assert(out.toSeq === Seq(
      ("test",  2L, 2L, 1L, us(95), us(100)),  // u3 leaks from train
      ("train", 2L, 2L, 2L, us(0),  us(10)),
      ("valid", 1L, 1L, 1L, us(85), us(85))))
    // Observed ranges must be disjoint and ordered train < valid < test.
    val byName = out.map(o => o._1 -> (o._5, o._6)).toMap
    assert(byName("train")._2 < byName("valid")._1 &&
      byName("valid")._2 < byName("test")._1)
  }
}
