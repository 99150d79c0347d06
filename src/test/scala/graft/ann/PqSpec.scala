package graft.ann

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  test("codes are m bounded ids and reconstruction is the codeword concat") {
    val emb = Tables.embeddings(spark, sf)
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(cb.m == 8 && cb.k == 16 && cb.subDim == 8)
    assert(cb.books.flatten.forall(_.size == 8))
    val coded = emb.select(col("vec_id"), Pq.codes(col("embedding"), cb).as("codes"))
      .withColumn("rv", Pq.reconstruct(col("codes"), cb))
    val bad = coded.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16) || size(col("rv")) =!= 64).count()
    assert(bad == 0)
    // spot-pin the lookup arithmetic against a driver-side re-derivation
    val row = coded.orderBy("vec_id").select("codes", "rv").head()
    val codes = row.getSeq[Int](0)
    val rv = row.getSeq[Double](1)
    val expected = codes.zipWithIndex.flatMap { case (c, mi) => cb.books(mi)(c) }
    assert(rv == expected)
  }

  test("planted corpus: reranked PQ recall@10 >= 0.9; raw ADC shows the collapse") {
    // The measured-quality gate, same discipline as the IVF gates, on
    // the clustered corpus (the regime real embeddings live in). Raw ADC
    // ranking CANNOT pass here and the test pins why: a tight cluster's
    // members collapse to identical codes, so within-cluster order is an
    // id-tiebreak and recall@10 over ~15-member clusters caps near 10/15
    // ≈ 0.67. The production two-stage form (ADC shortlist of 30, exact
    // rerank — q126's shape) restores the true order because the
    // shortlist still contains the whole home cluster.
    val emb = Planted.corpus(Tables.embeddings(spark, sf),
      "vec_id", "embedding", nClusters = 32, eps = 0.15)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .localCheckpoint()
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val raw = Knn.recall(exact, Pq.pqTopK(emb, queries, "vec_id", "embedding", cb, k = 10))
    assert(raw >= 0.5 && raw < 0.9,
      s"raw ADC planted recall@10 = $raw — expected the code-collapse regime (~0.67)")
    val reranked = Knn.recall(exact,
      Pq.pqTopKRerank(emb, queries, "vec_id", "embedding", cb, k = 10, r = 30))
    assert(reranked >= 0.9, s"PQ 8x16 rerank-30 planted recall@10 = $reranked")
  }

  test("planted corpus: composed IVF x PQ x rerank recall@10 >= 0.9 at probe-4/16") {
    // q127's stack end to end on the clustered corpus: routing prunes to
    // a quarter of the cells, ADC ranks the survivors from 4-byte codes,
    // the exact stage reads only the 30-candidate shortlist at full
    // width. The composed recall must hold both components' gates —
    // cells keep the home cluster (IVF gate), the shortlist keeps the
    // true top-10 despite code collapse (PQ gate).
    val emb = Planted.corpus(Tables.embeddings(spark, sf),
      "vec_id", "embedding", nClusters = 32, eps = 0.15)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .localCheckpoint()
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val ivfpq = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding", cents, cb,
      k = 10, probes = 4, r = 30)
    val recall = Knn.recall(exact, ivfpq)
    assert(recall >= 0.9, s"IVFADC probe-4/16 rerank-30 planted recall@10 = $recall")
  }

  test("residual codes discriminate where raw codes collapse") {
    // The FAISS by_residual rationale, measured: raw-vector codes map a
    // tight cluster's members to (near-)identical codewords, so the ADC
    // shortlist inside the cluster is an id-tiebreak — survivable at 1×
    // only because rerank-30 still covers the ~15-member clusters, and
    // fatal at 10× (the decade probe records r=300 reaching only 0.52).
    // Residual encoding quantizes x − centroid(cell): the eps-scale
    // member differences land in the codebook's range, so the ADC
    // ordering itself must now separate cluster members — gated as
    // strictly better shortlist quality at the SAME r than raw codes'
    // id-tiebreak baseline.
    val emb = Planted.corpus(Tables.embeddings(spark, sf),
      "vec_id", "embedding", nClusters = 32, eps = 0.15)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .localCheckpoint()
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val cbRaw = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val cbRes = Pq.fitResidual(emb, "vec_id", "embedding", cents, m = 8, k = 16, iters = 2)
    // shortlist quality without the rerank's safety net: r = k exactly
    val raw = Knn.recall(exact, Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      cents, cbRaw, k = 10, probes = 4, r = 10))
    val res = Knn.recall(exact, Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      cents, cbRes, k = 10, probes = 4, r = 10, residual = true))
    assert(res > raw,
      f"residual ADC must beat collapsed raw codes: residual $res%.4f vs raw $raw%.4f")
    assert(res >= 0.5, f"residual ADC shortlist quality degenerate: $res%.4f")
  }

  test("encode -> parquet round-trip -> ivfPqTopKFromIndex equals the in-query search") {
    // the materialized-index path (q145) must stay exactly the in-query
    // path after the codes table passes through a real parquet write —
    // cell/codes types, column order, and the reconstruction arithmetic
    // all round-trip; a cold-cache oracle run is NOT the first place
    // this should surface
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val queries = emb.filter(col("vec_id") < 20)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.fitResidual(emb, "vec_id", "embedding", cents, m = 8, k = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_codes_").toString
    Pq.encode(emb, "vec_id", "embedding", cents, cb, residual = true)
      .write.mode("overwrite").parquet(dir)
    val fromIndex = Pq.ivfPqTopKFromIndex(spark.read.parquet(dir),
      emb, queries, "vec_id", "embedding", cents, cb,
      k = 5, probes = 6, r = 20, residual = true)
    val inQuery = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      cents, cb, k = 5, probes = 6, r = 20, residual = true)
    assert(fromIndex.collect().map(_.toSeq).toSet == inQuery.collect().map(_.toSeq).toSet)
  }
}
