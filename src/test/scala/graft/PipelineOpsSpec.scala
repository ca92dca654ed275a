package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** Invariant tests for the LLM-pipeline operators (dedup / similarity /
  * text). Exact values are pinned by the DuckDB oracle at sf0.01; these
  * guard the algebraic properties that must hold on any input.
  */
class PipelineOpsSpec extends SparkSpecBase {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val embs = Tables.load(spark, sfDir, "embeddings")

  test("dedup_exact: kept-count equals distinct-text count") {
    val out = DedupOps.exact(docs)
    val kept = out.filter(col("is_kept")).count()
    assert(kept == docs.select(col("text")).distinct().count())
    assert(out.count() == docs.count())
  }

  test("minhash: signature has 16 in-range entries; est_jaccard in [0,1]") {
    val sig = docs.limit(20)
      .select(DedupOps.minhashSignature(col("text")).as("sig"))
    sig.collect().foreach { r =>
      val s = r.getSeq[Long](0)
      assert(s.length == DedupOps.NumPerm)
      assert(s.forall(v => v >= 0 && v < DedupOps.MinHashP))
    }
    DedupOps.minhashLshPairs(docs).collect().foreach { r =>
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
    }
  }

  test("hot-shingle df cap prunes stop-phrase keys from the inverted index") {
    import spark.implicits._
    // 4 docs share the stop phrase "the end of it"; 2 docs additionally
    // share a discriminative phrase
    val fixture = Seq(
      (1L, "alpha beta gamma delta the end of it"),
      (2L, "alpha beta gamma delta the end of it"),
      (3L, "unrelated words entirely here the end of it"),
      (4L, "other content again completely the end of it")
    ).toDF("doc_id", "text")
    val uncapped = DedupOps.ngramJaccardPairs(fixture, minJaccard = 0.01)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // cap at df<=3: the 3-gram shingles of "the end of it" (df=4) leave the
    // index; only the discriminative alpha/beta pair survives
    val capped = DedupOps.ngramJaccardPairs(fixture, minJaccard = 0.01,
      maxDocFreq = 3L).select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((3L, 4L)), s"stop-phrase pair expected: $uncapped")
    assert(capped == Set((1L, 2L)), s"capped index must drop df>3 keys: $capped")
    // a cap above every fixture df is a no-op (the oracle contract)
    val wide = DedupOps.ngramJaccardPairs(fixture, minJaccard = 0.01,
      maxDocFreq = 100L).select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(wide == uncapped)
  }

  test("minhash band-bucket cap drops degenerate buckets") {
    import spark.implicits._
    // 6 identical docs → every band bucket has df 6
    val fixture = (1L to 6L).map(i => (i, "same exact text for everyone here"))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.minhashLshPairs(fixture)
    assert(uncapped.count() == 15) // C(6,2) pairs
    val capped = DedupOps.minhashLshPairs(fixture, maxBandFreq = 5L)
    assert(capped.count() == 0, "all buckets exceed the cap and must drop")
  }

  test("dedup clusters: identical texts share a cluster, singletons keep their id") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "completely different content with no overlap at all here")
    ).toDF("doc_id", "text")
    val rows = DedupOps.dedupClusters(fixture).collect()
    val clusters = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L,
      s"identical docs must share the min-id cluster: $clusters")
    assert(clusters(5L) == 5L, s"singleton keeps its own id: $clusters")
    assert(sizes(1L) == 2L && sizes(5L) == 1L, s"cluster sizes: $sizes")
    // curation view drops singletons
    val paired = DedupOps.dedupClusters(fixture, includeSingletons = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(paired == Set(1L, 2L), s"pair-participants only: $paired")
  }

  test("jaccard pairs: 0 < jaccard <= 1 and symmetric-free ordering") {
    DedupOps.ngramJaccardPairs(docs).collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.2 && j <= 1.0)
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
    }
  }

  test("simhash: values fit width; identical docs get identical hashes") {
    val sh = DedupOps.simhash(docs.limit(50))
    sh.collect().foreach { r =>
      val v = r.getAs[Long]("simhash")
      assert(v >= 0 && v < (1L << 48))
    }
    // duplicate a doc under a new id: pair must appear at hamming 0
    val dup = docs.limit(1).select((col("doc_id") + 1000000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val pairs = DedupOps.simhashPairs(DedupOps.simhash(docs.limit(1).union(dup)))
    val exact = pairs.filter(col("hamming") === 0).count()
    assert(exact == 1)
  }

  test("topk: ranks are 1..k, cosine within [-1,1], self excluded") {
    val out = SimilarityOps
      .topKBruteForce(embs, embs.filter(col("vec_id") % 100 === 0), 5)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5)
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Long]("qid") != r.getAs[Long]("nid"))
    }
  }

  test("lsh buckets: deterministic and within 2^8") {
    val b1 = SimilarityOps.lshBuckets(embs).select(col("nid"), col("bucket"))
    val b2 = SimilarityOps.lshBuckets(embs).select(col("nid"), col("bucket"))
    assert(b1.exceptAll(b2).isEmpty)
    b1.collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < (1L << SimilarityOps.LshBits))
    }
  }

  test("kmv sketch: exact below k, estimate within 20% above k, merge-stable") {
    import spark.implicits._
    import graft.operators.SketchOps
    // exact regime: 40 distinct values < k=64
    val small = (0 until 200).map(i => ("g", i % 40)).toDF("grp", "v")
    val ex = SketchOps.kmvDistinct(small, col("grp"), col("v"), k = 64)
      .head()
    assert(ex.getInt(1) == 40 && ex.getDouble(2) == 40.0)
    // estimate regime: 5000 distinct ≫ k; KMV with k=64 has ~12% rsd
    val big = (0 until 5000).map(i => ("g", i)).toDF("grp", "v")
      .repartition(8) // forces partial buffers + merge
    val est = SketchOps.kmvDistinct(big, col("grp"), col("v"), k = 64)
      .head().getDouble(2)
    assert(math.abs(est - 5000) / 5000.0 < 0.2, s"est=$est")
    // determinism across partitionings (merge associativity)
    val est2 = SketchOps.kmvDistinct(big.repartition(3), col("grp"), col("v"),
      k = 64).head().getDouble(2)
    assert(est == est2)
  }

  test("ivf with exhaustive probing equals brute force exactly") {
    // nprobe = cells means every cell is probed, so the candidate set is
    // the full corpus and the exact-cosine rerank must reproduce brute
    // force row for row — recall converges to 1 as nprobe → cells
    val qs = embs.filter(col("vec_id") % 100 === 0)
    val cells = 16
    val ivf = SimilarityOps.topKIvfProbe(embs, qs, k = 3, cells, nprobe = cells)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
    val bf = SimilarityOps.topKBruteForce(embs, qs, 3)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
    assert(ivf.exceptAll(bf).isEmpty && bf.exceptAll(ivf).isEmpty)
  }

  test("lsh topk is a subset-ranking consistent with brute force") {
    val qs = embs.filter(col("vec_id") % 100 === 0)
    val lsh = SimilarityOps.topKLsh(embs, qs, 3)
    // every LSH neighbor must share the query's bucket by construction;
    // ranks within a query strictly increase
    lsh.groupBy(col("qid")).agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
      .collect().foreach { r =>
        assert(r.getAs[Int]("mx") == r.getAs[Long]("n"))
      }
  }

  test("text quality: ratios in [0,1], quality in [0,1], langid stable") {
    TextOps.annotate(docs.limit(100)).collect().foreach { r =>
      Seq("stopword_ratio", "punct_ratio", "digit_ratio", "non_ascii_ratio",
        "quality").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
      assert(Seq("en", "unk", "non_latin").contains(r.getAs[String]("lang_pred")))
    }
  }

  test("fingerprint is order-sensitive") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = two.select(TextOps.docFingerprint(col("text")).as("fp"))
      .collect().map(_.getAs[Long]("fp"))
    assert(fps(0) != fps(1))
  }
}
