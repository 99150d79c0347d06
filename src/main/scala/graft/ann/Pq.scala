package graft.ann

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) over an embedding column — the
  * compression layer that lets a 100 TB embedding store fit in cluster
  * RAM: each d-dim vector is split into `m` subvectors and every
  * subvector replaced by the id of its nearest codeword in a per-subspace
  * codebook of `k` entries, so the corpus side carries m·log2(k) bits per
  * vector (m=8, k=16 ⇒ 4 bytes) instead of d doubles (64 ⇒ 512 bytes), a
  * 128× cut — past SQ8's 4× (q79) and orthogonal to IVF cell routing
  * (q96): production stacks coarse-quantize THEN product-quantize.
  *
  * Sub-metric is angular (argmax cosine per subspace), matching the
  * engine's scoring metric and [[KMeans]]'s pinned determinism recipe —
  * init = the k lowest-id vectors' slices, assignment = argmax of
  * round(cosine, 6) with lowest-code tiebreak, codeword = per-dimension
  * mean rounded to 6, an emptied code keeps its previous codeword — so a
  * SQL engine replays training bit-for-bit (q126's oracle does).
  *
  * Scale shape: codebooks live on the driver (m·k·subDim doubles — 1024
  * for the 8×16×8 default) and enter plans as literals, so ENCODING IS
  * ROW-LOCAL. Each training iteration costs ONE partial-agg shuffle of
  * the (subspace, code, dim, value) rows — all m subspaces train in the
  * same pass (the per-subspace-loop alternative scans the corpus m times
  * for identical output). Search reconstructs candidates from codes via
  * literal-array lookup (8 element_ats, no vector column read) and ranks
  * by cosine(query, reconstruction) — arithmetically the ADC score with
  * the LUT inlined, written as one left-to-right fold so both engines
  * accumulate identically.
  */
object Pq {

  /** Version of the pinned PQ training recipe (init slicing, rounding,
    * tiebreaks, empty-code handling) — the [[KMeans.recipeVersion]]
    * contract for THIS trainer. Bump on any change to the arithmetic;
    * persisted-index cache keys that embed codebooks (q144) include it,
    * so a recipe change invalidates staged codebooks instead of
    * silently serving geometry trained under the old rules. */
  val recipeVersion = 1

  /** `books(mi)(code)` = codeword for subspace mi — m × k × subDim. */
  final case class Codebooks(subDim: Int, books: Seq[Seq[Seq[Double]]]) {
    def m: Int = books.size
    def k: Int = books.head.size
  }

  /** Nearest codeword id within subspace `mi` (a plan-time constant):
    * [[KMeans.nearestCentroid]]'s argmax over that subspace's book. */
  private def nearestCode(subvec: Column, book: Seq[Seq[Double]]): Column =
    graft.functions.VectorKernels.argmaxCosine(subvec, book)

  /** Nearest codeword id with the subspace carried in a COLUMN — the
    * fused-training form: the row's book is selected per row inside the
    * native argmax kernel (the [[KMeans.leafInBranch]] idiom), so one
    * expression assigns every subspace's rows in a single pass. */
  private def nearestCodeBy(subvec: Column, mi: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.VectorKernels.argmaxCosineBy(subvec, mi, books)

  /** One row per (vector, subspace): the fused training relation. */
  private def subRows(v: DataFrame, m: Int, subDim: Int): DataFrame =
    v.select(col("__id"), explode(array((0 until m).map(mi =>
        struct(lit(mi).as("__m"), slice(col("__v"), mi * subDim + 1, subDim).as("__sv"))): _*)).as("__s"))
      .select(col("__id"), col("__s.__m").as("__m"), col("__s.__sv").as("__sv"))

  /** The cell centroid as a plan-literal lookup by cell id (cents must
    * be cid-ordered 0..k-1, as [[KMeans.fit]] returns them). */
  private def centAt(cell: Column, cents: Seq[(Int, Seq[Double])]): Column =
    element_at(typedlit(cents.map(_._2)), (cell + 1).cast("int"))

  /** x − centroid(cell): the residual a coarse-quantized vector leaves
    * behind — what IVFADC actually product-quantizes. Encoding residuals
    * instead of raw vectors is what keeps PQ discriminative INSIDE a
    * tight cluster: members share the centroid, so their residuals are
    * the eps-scale individual differences the raw codes collapse away
    * (measured: the 10× planted probe's raw-code recall collapse,
    * SCALING.md). `cell` must already be a computed column so the k
    * routing cosines are paid once per row. Row-local — the centroid
    * table is a plan literal. */
  private def residualOf(v: Column, cell: Column, cents: Seq[(Int, Seq[Double])]): Column =
    zip_with(v, centAt(cell, cents), (x, c) => x - c)

  /** Train m codebooks of k codewords with `iters` Lloyd rounds. The
    * vector dimension must divide evenly by m. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): Codebooks = {
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    fitPrepared(v, m, k, iters)
  }

  /** [[fit]] over the RESIDUALS of `cents`' cells — the FAISS
    * `by_residual` training path; pair with
    * `ivfPqTopK(..., residual = true)`. */
  def fitResidual(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], m: Int, k: Int, iters: Int): Codebooks = {
    val v = corpus.select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__cell", KMeans.nearestCentroid(col("__v"), cents))
      .select(col("__id"),
        residualOf(col("__v"), col("__cell"), cents).as("__v"))
    fitPrepared(v, m, k, iters)
  }

  private def fitPrepared(v: DataFrame, m: Int, k: Int, iters: Int): Codebooks = {
    val dim = v.select(size(col("__v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    // init: the k lowest-id vectors, sliced — one collect seeds all m
    // books (each subspace's k lowest-id subvectors are slices of the
    // same k vectors, so no per-subspace scan is needed)
    val firstK: Seq[Seq[Double]] = v.orderBy("__id").limit(k).collect()
      .map(r => r.getSeq[Double](1): Seq[Double]).toSeq
    require(firstK.size == k, s"corpus has only ${firstK.size} of $k init rows")
    var books: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => firstK.map(_.slice(mi * subDim, (mi + 1) * subDim)))
    val sub = subRows(v, m, subDim)
    for (_ <- 1 to iters) {
      val means = sub
        .withColumn("__c", nearestCodeBy(col("__sv"), col("__m"), books))
        .select(col("__m"), col("__c"), posexplode(col("__sv")).as(Seq("__d", "__x")))
        .groupBy("__m", "__c", "__d").agg(avg("__x").as("__mu"))
        .groupBy("__m", "__c")
        .agg(transform(array_sort(collect_list(struct(col("__d"), col("__mu")))),
          t => round(t.getField("__mu"), 6)).as("__cent"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getSeq[Double](2): Seq[Double])).toMap
      books = books.zipWithIndex.map { case (cw, mi) =>
        cw.zipWithIndex.map { case (prev, cid) => means.getOrElse((mi, cid), prev) }
      }
    }
    Codebooks(subDim, books)
  }

  /** The m-element code array for a vector column — row-local; at rest
    * this is the ONLY per-vector state the index keeps. */
  def codes(vec: Column, cb: Codebooks): Column = {
    val v = transform(vec, x => x.cast("double"))
    array(cb.books.zipWithIndex.map { case (book, mi) =>
      nearestCode(slice(v, mi * cb.subDim + 1, cb.subDim), book)
    }: _*)
  }

  /** Reconstruction from a code array: codewords concatenated in
    * subspace order via literal-array lookup — no vector column read. */
  def reconstruct(codesCol: Column, cb: Codebooks): Column =
    flatten(transform(codesCol, (c, mi) =>
      element_at(element_at(typedlit(cb.books), (mi + 1).cast("int")), (c + 1).cast("int"))))

  /** Top-k by cosine(query, PQ reconstruction) — the ADC ranking. The
    * query side broadcasts with full-precision vectors (queries are few);
    * the corpus side is scored from its codes alone, so the scan reads
    * m codes per row, not d doubles. Same candidate plumbing and top-k
    * window as [[Knn.bruteForceTopK]]; compose with IVF cells to cut
    * candidates the way q96 does — the two quantizers are orthogonal. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), codes(col(vecCol), cb).as("__codes"))
      .withColumn("__rv", reconstruct(col("__codes"), cb))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("approx_cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_cosine", round(VectorFns.cosine(col("__qvec"), col("__rv")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "approx_cosine")
  }

  /** The production two-stage search: ADC shortlist of `r` candidates
    * per query, then EXACT cosine re-ranking of just those r — the FAISS
    * `IndexPQ + refine` shape. Needed because a tight cluster collapses
    * to identical codes (identical reconstructions), making the ADC
    * order inside it an id-tiebreak: measured on the planted corpus,
    * raw ADC recall@10 is 0.668 ≈ 10/15 (one cluster's members over the
    * shortlist cut) while the reranked form restores ≥0.9 (PqSpec).
    * The refetch joins the Q·r shortlist BROADCAST against the corpus,
    * so the full-precision side still never shuffles and only r vectors
    * per query are ever read at full width. */
  def pqTopKRerank(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int, r: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = pqTopK(corpus, queries, idCol, vecCol, cb, r)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("__cvec"))
    val qv = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", round(VectorFns.cosine(col("__qvec"), col("__cvec")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** The full production stack — IVF routing × PQ scoring × exact rerank
    * (FAISS IVFADC + refine, minus residual encoding, whose determinism
    * cost outweighs its precision gain at these code sizes): corpus rows
    * carry (cell, codes) — the complete at-rest index state, 4+4 bytes —
    * queries probe their `probes` nearest cells, ADC ranks the probed
    * cells' candidates from codes alone, and the exact stage re-ranks
    * the Q·r shortlist. Both quantizers assign row-locally off plan
    * literals; candidates come from the cell equi-join against the
    * BROADCAST query×probe side, so the corpus never shuffles at any
    * stage. The two top-k windows rewrite to bounded aggregates. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], cb: Codebooks,
      k: Int, probes: Int, r: Int, residual: Boolean = false): DataFrame =
    // residual = true is the FAISS by_residual path: codes (trained via
    // fitResidual) quantize x − centroid(cell), and the ADC
    // reconstruction is centroid + codeword concat — still row-local,
    // still m codes per vector at rest. The in-query path IS the
    // from-index path over an unmaterialized [[encode]] — one
    // assignment/encode/reconstruction definition, so the two can
    // never diverge (PqSpec pins the round-trip through parquet too).
    ivfPqTopKFromIndex(encode(corpus, idCol, vecCol, cents, cb, residual),
      corpus, queries, idCol, vecCol, cents, cb, k, probes, r, residual)

  /** The at-rest index table: one row per vector carrying EXACTLY the
    * persisted state — (vec_id, cell, codes), 4 + m bytes of content.
    * Materialize this once beside the corpus (q145's staging) and
    * search with [[ivfPqTopKFromIndex]]; encoding is row-local. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], cb: Codebooks,
      residual: Boolean = false): DataFrame = {
    val withCell = corpus.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("cell", KMeans.nearestCentroid(col("__v"), cents))
    (if (residual)
        withCell.withColumn("codes",
          codes(residualOf(col("__v"), col("cell"), cents), cb))
      else withCell.withColumn("codes", codes(col("__v"), cb)))
      .select("vec_id", "cell", "codes")
  }

  /** Rewrite any number of coded segments (each [[encode]]'s at-rest
    * rows — e.g. the standing segment plus appended deltas, q148's
    * shape) into ONE cell-clustered segment: repartitioned on the cell
    * and sorted by (cell, vec_id) within partitions, so every parquet
    * row group spans a narrow cell range and a cell-predicate scan
    * prunes row groups the probes never touch (the same footer-stats
    * mechanism q123's Z-order staging measures). Pure layout — the row
    * SET is the segments' union, so search results are identical by
    * construction (PqAppendSpec pins it); this is the LSM-style
    * maintenance step that keeps a daily-append index from decaying
    * into thousands of unclustered small files. `buckets` sizes the
    * output files: at corpus scale set it so each bucket is a few
    * hundred MB (cells ≫ buckets — each file then holds a contiguous
    * run of cells, except that the range boundaries are (cell, vec_id)
    * pairs, so the ONE cell at each bucket boundary may straddle two
    * files; footer min/max stats still prune correctly, a probe of the
    * straddling cell just reads both files). Note repartitionByRange
    * samples the input to pick boundaries, so the union is computed
    * twice (once for sampling, once for the shuffle) — at scale,
    * localCheckpoint or cache the union first if the segments are
    * expensive to recompute (here they are parquet scans, so the extra
    * read is cheaper than a materialization). */
  def compactIndex(segments: Seq[DataFrame], buckets: Int = 4,
      tombstones: Option[DataFrame] = None): DataFrame = {
    val union = segments.reduce(_ unionByName _)
    tombstones.fold(union)(withoutTombstones(union, _))
      .repartitionByRange(buckets, col("cell"), col("vec_id"))
      .sortWithinPartitions("cell", "vec_id")
  }

  /** The index minus a TOMBSTONE set — the delete half of the LSM story
    * [[compactIndex]] completes: a coded index is append-only (q148), so
    * a vector deleted from the corpus (a dedup drop-list, a takedown, a
    * retention expiry) is recorded as a tombstone row and SERVING
    * anti-joins it out until the next compaction physically drops it
    * (pass the same set as [[compactIndex]]'s `tombstones`). The
    * tombstone side is BY DEFINITION small relative to the index — it is
    * the data being deleted — so it broadcasts and the coded corpus
    * never shuffles; the anti-join is a bloom-filter-shaped probe inside
    * whole-stage codegen. The tombstone frame must identify its id
    * column unambiguously: a single column of any name, or a
    * multi-column frame carrying one named `vec_id` — anything else
    * fails loudly (silently guessing `columns.head` on a (cid, vec_id)
    * frame would anti-join on the wrong column and delete the wrong
    * rows). At 100 TB the delete set between compactions is bounded by
    * delete rate × compaction cadence — the operational knob; a delete
    * set too big to broadcast is the signal to run compaction, not to
    * shuffle the index. */
  def withoutTombstones(index: DataFrame, tombstones: DataFrame): DataFrame = {
    val idCol =
      if (tombstones.columns.length == 1) tombstones.columns.head
      else if (tombstones.columns.contains("vec_id")) "vec_id"
      else throw new IllegalArgumentException(
        s"withoutTombstones: ambiguous tombstone frame (columns " +
          s"${tombstones.columns.mkString("[", ", ", "]")}) — pass a " +
          "single-column frame or one with a column named vec_id")
    index.join(
      broadcast(tombstones.select(col(idCol).as("vec_id")).distinct()),
      Seq("vec_id"), "left_anti")
  }

  /** [[ivfPqTopK]] over a MATERIALIZED index: `index` carries
    * (vec_id, cell, codes) — [[encode]]'s at-rest rows, loaded from
    * wherever they were staged — so the search pays NO assignment and
    * NO encoding: reconstruction off the literal codebooks, the cell
    * equi-join, and the bounded top-k stages; the exact rerank still
    * refetches only the broadcast Q·r shortlist from the full-width
    * corpus. This is the complete FAISS serving shape: codebooks +
    * coded corpus are artifacts, queries are the only thing computed.
    *
    * `prefilterCells = true` additionally computes the query set's
    * distinct probed cells ON THE DRIVER (bounded by Q × probes — the
    * query side is small by contract) and pushes `cell IN (...)` into
    * the index scan before the join. Results are identical (the join
    * already restricts to probed cells); what it buys is SCAN pruning:
    * over a [[compactIndex]]-clustered segment the predicate reaches
    * the parquet reader and row groups outside the probed cells are
    * skipped from the footer stats — the serving profile where the
    * at-rest index is read, not streamed. */
  def ivfPqTopKFromIndex(index: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], cb: Codebooks,
      k: Int, probes: Int, r: Int, residual: Boolean = false,
      prefilterCells: Boolean = false): DataFrame = {
    val pre =
      if (!prefilterCells) index
      else {
        val probed = queries
          .select(explode(KMeans.probeCells(
            transform(col(vecCol), x => x.cast("double")), cents, probes)).as("__c"))
          .distinct().collect().map(_.getInt(0))
        index.filter(col("cell").isin(probed.toIndexedSeq: _*))
      }
    val base = pre.select(col("vec_id").as("neighbor_id"),
      col("cell").as("__cell"), col("codes").as("__codes"))
    val c = (if (residual)
        base.withColumn("__rv",
          zip_with(centAt(col("__cell"), cents),
            reconstruct(col("__codes"), cb), (a, b) => a + b))
      else base.withColumn("__rv", reconstruct(col("__codes"), cb)))
      .select("neighbor_id", "__cell", "__rv")
    searchReconstructed(c, corpus, queries, idCol, vecCol, cents, k, probes, r)
  }

  /** The shared two-stage search over a reconstructed corpus side
    * (neighbor_id, __cell, __rv): probe routing, ADC shortlist of `r`,
    * exact rerank of the broadcast shortlist — one definition so the
    * in-query and from-index paths cannot diverge. */
  private def searchReconstructed(c: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], k: Int, probes: Int, r: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("__qvec"))
      .withColumn("__qn", VectorFns.normN(col("__qvec")))
      .withColumn("__cell", explode(KMeans.probeCells(col("__qvec"), cents, probes)))
    val wAdc = Window.partitionBy("query_id").orderBy(col("__adc").desc, col("neighbor_id"))
    // norms factored per side (query: once per query; candidate: once
    // per reconstructed row), so the probes·candidates ADC stage pays
    // one dot per pair — bit-equal to the fused cosine (DotProduct
    // Scaladoc; VectorFnsSpec pins it), so the shared oracle text and
    // every rank cut are unchanged.
    val short = c.withColumn("__rvn", VectorFns.normN(col("__rv")))
      .join(broadcast(q), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__adc", round(VectorFns.cosineFactored(
        VectorFns.dotN(col("__qvec"), col("__rv")), col("__qn"), col("__rvn")), 6))
      .withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= r)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("__cvec"))
    val qv = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", round(VectorFns.cosine(col("__qvec"), col("__cvec")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }
}
