package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the small query
  * side, shuffle nothing but (query, id, score) triples). Scale path:
  * deterministic random-hyperplane LSH buckets — candidates share a bucket,
  * exact cosine verified inside buckets only.
  */
object Similarity {

  /** dot(a,b) — tight-loop custom expression, summing left-to-right
    * (bit-identical to the `aggregate(zip_with(...))` fold it replaced;
    * the HOF pair evaluates interpreted per element and dominated
    * all-pairs verification cost).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k neighbours for each query row (queries small ⇒ broadcast;
    * ties broken by id for determinism). Corpus rows whose embedding is
    * malformed (dim mismatch / null elements → NULL cosine) are EXCLUDED,
    * never ranked — the same quarantine the bucketed paths apply at
    * assignment time (NearestCells → NULL cell), so all four ANN paths
    * agree on such rows.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .crossJoin(broadcast(queries.select(col(qIdCol).as("q_id"),
        col(qVecCol).cast("array<double>").as("q_vec"))))
      .withColumn("score", cosine(col("vec"), col("q_vec")))
      .where(col("score").isNotNull)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }

  /** Random-hyperplane (SRP) LSH bucket id: `planes` sign bits packed into
    * a long; hyperplane components are deterministic ±1 from
    * splitmix64(seed, plane, dim) — no RNG, identical across runs and
    * parallelism. Implemented as the custom
    * [[graft.functions.SrpBucket]] expression: the HOF formulation
    * (transform+zip_with+aggregate per plane) is interpreted per element
    * and was the dominant cost of the ANN path.
    */
  def srpBucket(vec: Column, planes: Int, seed: Long = 42L): Column =
    graft.functions.SketchExpressions.srpBucket(
      vec.cast("array<double>"), planes, seed)

  /** (id, vec, tbl, bucket) rows: each vector exploded into `tables`
    * independent SRP tables (seed family 42 + 1000·t, so a miss in one
    * table can be caught by another). The ONE banding definition shared
    * by [[lshTopK]] and [[cosineNearDups]] — a change to the seed scheme
    * in one path cannot silently diverge the other.
    */
  private def srpBanded(df: DataFrame, id: String, vec: String, pfx: String,
      planes: Int, tables: Int): DataFrame = {
    val base = df.select(col(id).as(s"${pfx}_id"),
      col(vec).cast("array<double>").as(s"${pfx}_vec"))
    val cols = (0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        srpBucket(col(s"${pfx}_vec"), planes, 42L + 1000L * t).as("bucket")))
    base.select(col(s"${pfx}_id"), col(s"${pfx}_vec"),
      explode(array(cols: _*)).as("tb"))
      .select(col(s"${pfx}_id"), col(s"${pfx}_vec"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** LSH-bucketed ANN: assign corpus and queries to SRP buckets (several
    * independent tables to boost recall), equi-join on (table, bucket),
    * exact-cosine verify, keep top-k per query. Approximate: recall < 1,
    * measured against [[bruteForceTopK]] in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val c = srpBanded(corpus, idCol, vecCol, "c", planes, tables)
    val q = srpBanded(queries, qIdCol, qVecCol, "q", planes, tables)
    val cands = c.join(broadcast(q), Seq("tbl", "bucket"))
      .select(col("q_id"), col("c_id").as("id"),
        cosine(col("c_vec"), col("q_vec")).as("score"))
      // malformed pairs (dim mismatch, zero norm → NULL cosine) are
      // quarantined, matching bruteForceTopK — without this, a bucket
      // pool with < k valid candidates emits rank<=k rows with NULL score
      .where(col("score").isNotNull)
      .groupBy(col("q_id"), col("id")).agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }

  // --- IVF (inverted-file) ANN -----------------------------------------

  /** Deterministic k-means coarse quantizer for IVF: Lloyd iterations as
    * DataFrame aggregations. Init = the `nLists` vectors with the smallest
    * xxhash64(id) (hash-ordered, no RNG — identical across runs and
    * parallelism). Each iteration: assign every vector to its nearest
    * centroid via the `NearestCells` expression (pure map-side — the
    * centroids are literals, the classic broadcast-the-model shape),
    * recompute centroids as the per-cell elementwise mean (posexplode →
    * groupBy(cell, dim) avg — the shuffle carries k×dim partials only).
    * Returns the centroids, driver-side (k×dim doubles — tiny by design).
    *
    * Scale: training touches the corpus `iters + 1` times but shuffles only
    * k×dim aggregates; at 10^12 rows you'd train on a hash-sampled subset —
    * pass `corpus.where(pmod(xxhash64(col(id)), 1000) === 0)`.
    */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 3): Array[Array[Double]] = {
    // malformed embeddings (null / null elements) are excluded from
    // TRAINING up front: a null-element seed would poison a centroid, and
    // an assignment-time NULL cell would NPE the means collect. Rows with
    // a dim mismatch vs the trained centroids are quarantined at
    // assignment (NearestCells → NULL cell, filtered below and dropped
    // from the inverted file by the cell join) — same exclusion
    // bruteForceTopK applies via its NULL-score filter.
    val base = corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .where(col("vec").isNotNull && size(col("vec")) > 0 &&
        !exists(col("vec"), x => x.isNull))
    val seedVecs: Array[Array[Double]] = base
      .withColumn("_h", xxhash64(col("id")))
      .orderBy(col("_h"), col("id")).limit(nLists)
      .select("vec").collect()
      .map(_.getSeq[Double](0).toArray)
    require(seedVecs.nonEmpty, "ivfTrain: no well-formed embeddings to seed from")
    // The seeds are a hash-uniform sample; if the corpus mixes embedding
    // dimensions, keep only the modal dimension among them so the centroid
    // matrix is rectangular by construction (NearestCells requires it).
    // Off-dimension rows are quarantined at assignment (NULL cell), the
    // same treatment every other malformed-row path applies.
    val modalDim = seedVecs.groupBy(_.length).maxBy { case (d, vs) => (vs.length, -d) }._1
    var centroids: Array[Array[Double]] = seedVecs.filter(_.length == modalDim)
    var i = 0
    while (i < iters) {
      val means = withNearestCells(base, col("vec"), centroids, 1, "_cells")
        .where(col("_cells").isNotNull)
        .select(col("_cells").getItem(0).as("cell"),
          posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      // empty cells keep their previous centroid (standard Lloyd handling)
      val next = centroids.map(_.clone())
      means.foreach { case (c, d, m) => next(c)(d) = m }
      centroids = next
      i += 1
    }
    centroids
  }

  /** Adds `out` = the `nProbe` nearest cells (by cosine, ties → lowest
    * cell id): assignment is map-side only, no join, no shuffle — exactly
    * how a trained coarse quantizer ships to 1000 executors (in the task
    * closure, not as a joined table). The centroid matrix travels as ONE
    * value inside the [[graft.functions.NearestCells]] expression, so the
    * PLAN stays O(1) in nLists; the round-2 formulation built one
    * struct(-cosine(vec, centroidLiteral), cell) subtree per centroid plus
    * a per-row array_sort, which made plan/codegen size itself the
    * bottleneck beyond ~100 lists (real IVF wants 10^4-10^6).
    */
  private def withNearestCells(df: DataFrame, vec: Column,
      centroids: Array[Array[Double]], nProbe: Int, out: String): DataFrame =
    df.withColumn(out, graft.functions.SketchExpressions.nearestCells(
      vec.cast("array<double>"), centroids, nProbe))

  /** IVF top-k: assign the corpus once (the "inverted file"), assign each
    * query to its `nProbe` nearest cells, equi-join on cell, exact cosine
    * inside the probed cells only, keep top-k. Approximate: recall < 1 when
    * nProbe < nLists (measured vs brute force in SimilaritySpec); probing
    * every cell degenerates to exact brute force — also pinned in tests.
    *
    * Scale: both assignments are map-side expressions; the only shuffle is
    * the cell equi-join, hash-partitioned on `cell`; per-query work is
    * corpus_size × nProbe / nLists instead of corpus_size.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = ivfTrain(corpus, idCol, vecCol, nLists, iters)
    val base = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val inverted = withNearestCells(base, col("vec"), centroids, 1, "_cells")
      .withColumn("cell", col("_cells").getItem(0)).drop("_cells")

    val probes = withNearestCells(
        queries.select(col(qIdCol).as("q_id"),
          col(qVecCol).cast("array<double>").as("q_vec")),
        col("q_vec"), centroids, nProbe, "_cells")
      .select(col("q_id"), col("q_vec"),
        explode(col("_cells")).as("cell"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id").asc)
    inverted.join(broadcast(probes), Seq("cell"))
      .select(col("q_id"), col("id"),
        cosine(col("vec"), col("q_vec")).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }

  // --- Hierarchical (two-level) IVF ------------------------------------

  /** Distributed per-cell fine-quantizer training for two-level IVF.
    *
    * Past ~10^5 lists the FULL centroid set fits neither a plan nor a task
    * closure (k×dim×8 B — the bound documented on [[graft.functions
    * .NearestCells]]), so real IVF at 10^6 lists goes hierarchical: a
    * small coarse quantizer (closure-shipped, [[ivfTrain]]) splits the
    * corpus into `nCoarse` cells, and each cell trains its OWN `nFine`
    * centroids — here entirely as DataFrame aggregations over (cell,
    * fineIdx, dim) keys, no per-cell driver loop and nothing larger than
    * one cell's matrix ever materialized in one place. Effective list
    * count = nCoarse × nFine with per-row state bounded by nFine×dim.
    *
    * Init: per cell, the `nFine` vectors with the smallest xxhash64(id)
    * (hash-ordered window — no RNG; the INIT is parallelism-invariant,
    * while Lloyd's avg() means merge floating-point partials in
    * shuffle-arrival order, so trained centroids are deterministic only to
    * float-merge-order — verdict-level quality is partitioning-robust,
    * pinned in SimilaritySpec; each round is localCheckpoint-materialized
    * so every consumer scores against ONE model). Lloyd step:
    * rows join their cell's fine matrix (a TABLE keyed by cell — shuffle
    * or broadcast join, AQE's call) and [[graft.functions.NearestCellsDyn]]
    * scores against the joined column; means recompute per (cell, fidx,
    * dim). Empty fine cells keep their previous centroid.
    *
    * Returns (cell, fine_matrix: array<array<double>>) with matrices
    * ordered by fine index.
    */
  def ivfTrainFine(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Double]], nFine: Int, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val base = withNearestCells(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec")),
      col("vec"), coarse, 1, "_cells")
      .withColumn("cell", col("_cells").getItem(0)).drop("_cells")
      // malformed embeddings (NearestCells → NULL) are quarantined from
      // training, not ranked into a spurious NULL-cell matrix
      .where(col("cell").isNotNull)

    val w = Window.partitionBy(col("cell"))
      .orderBy(xxhash64(col("id")), col("id"))
    var fine = base
      .withColumn("_r", row_number().over(w))
      .where(col("_r") <= nFine)
      .select(col("cell"), (col("_r") - 1).cast("int").as("fidx"), col("vec"))

    def matrices(centroids: DataFrame): DataFrame =
      centroids.groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("fidx"), col("vec")))),
          x => x.getField("vec")).as("fine_matrix"))

    var i = 0
    while (i < iters) {
      val assigned = base.join(matrices(fine), Seq("cell"))
        .withColumn("fidx", graft.functions.SketchExpressions
          .nearestCellsDyn(col("vec"), col("fine_matrix"), 1).getItem(0))
      val means = assigned
        .select(col("cell"), col("fidx"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("fidx"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"), col("fidx"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("_newvec"))
      fine = fine.alias("f")
        .join(means.alias("m"), Seq("cell", "fidx"), "left")
        .select(col("cell"), col("fidx"),
          coalesce(col("_newvec"), col("f.vec")).as("vec"))
        // MATERIALIZE each Lloyd round: (a) the loop references `fine`
        // twice per iteration, so an unmaterialized lineage doubles every
        // round (~2^iters plans); (b) avg() over doubles merges shuffled
        // partials in arrival order, so two EXECUTIONS of the same lazy
        // plan can yield bit-different centroids — the inverted-file and
        // probe sides must score against ONE model, not two recomputations
        .localCheckpoint(true)
      i += 1
    }
    matrices(fine).localCheckpoint(true)
  }

  /** Two-level IVF top-k: coarse assignment is a map-side closure
    * expression; fine assignment is a join against the per-cell matrix
    * table + [[graft.functions.NearestCellsDyn]]; the global inverted file
    * keys on `cell × nFine + fineIdx`. Probing fans a query out to
    * `nProbeCoarse` coarse cells and `nProbeFine` fine cells within each.
    * Probing everything (nProbeCoarse = nCoarse, nProbeFine = nFine)
    * degenerates to exact brute force — pinned in SimilaritySpec.
    */
  def ivfTopKHierarchical(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nCoarse: Int = 4, nFine: Int = 4,
      nProbeCoarse: Int = 2, nProbeFine: Int = 2,
      iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coarse = ivfTrain(corpus, idCol, vecCol, nCoarse, iters)
    val fineMat = ivfTrainFine(corpus, idCol, vecCol, coarse, nFine, iters)

    val inverted = withNearestCells(
        corpus.select(col(idCol).as("id"),
          col(vecCol).cast("array<double>").as("vec")),
        col("vec"), coarse, 1, "_cells")
      .withColumn("cell", col("_cells").getItem(0)).drop("_cells")
      .join(fineMat, Seq("cell"))
      .withColumn("fidx", graft.functions.SketchExpressions
        .nearestCellsDyn(col("vec"), col("fine_matrix"), 1).getItem(0))
      .select(col("id"), col("vec"),
        (col("cell") * nFine + col("fidx")).as("gcell"))

    val probes = withNearestCells(
        queries.select(col(qIdCol).as("q_id"),
          col(qVecCol).cast("array<double>").as("q_vec")),
        col("q_vec"), coarse, nProbeCoarse, "_cells")
      .select(col("q_id"), col("q_vec"), explode(col("_cells")).as("cell"))
      .join(fineMat, Seq("cell"))
      .withColumn("_f", graft.functions.SketchExpressions
        .nearestCellsDyn(col("q_vec"), col("fine_matrix"), nProbeFine))
      .select(col("q_id"), col("q_vec"), col("cell"),
        explode(col("_f")).as("fidx"))
      .select(col("q_id"), col("q_vec"),
        (col("cell") * nFine + col("fidx")).as("gcell"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id").asc)
    // (q_id, gcell) pairs are distinct and each corpus row lives in ONE
    // gcell, so the join emits each (q_id, id) at most once — no dedup agg
    inverted.join(broadcast(probes), Seq("gcell"))
      .select(col("q_id"), col("id"),
        cosine(col("vec"), col("q_vec")).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (dedup flavour): SRP buckets,
    * exact cosine within bucket, threshold.
    *
    * `maxBucketSize`: one degenerate SRP bucket (zero vectors, templated
    * embeddings) yields O(s²) candidate pairs, so oversized (tbl, bucket)
    * groups are stop-banded exactly like the MinHash-LSH path
    * (graft.dedup.Dedup.lshCandidates) — the skip list is tiny and
    * broadcast anti-joined.
    *
    * Cost shape of the quadratic stage (the r8 optimization pass):
    *  - norms are computed ONCE PER ROW-SIDE before the self-join, so a
    *    bucket of s vectors pays s norm passes + s²/2 dot products
    *    instead of 3·s²/2 dot products (cosine() inlined per pair
    *    re-derives both norms pairwise) — bit-identical values, the
    *    division reads the exact same `sqrt(dot(v,v))` doubles;
    *  - the threshold filter runs BEFORE the per-pair dedup aggregate,
    *    not after: every (tbl, bucket) copy of a pair computes the same
    *    cosine (the value doesn't depend on the bucket), so
    *    max-then-filter ≡ filter-then-max, and the exchange feeding the
    *    aggregate carries only pairs that PASS the threshold — at
    *    near-dup rates that is orders of magnitude fewer rows than the
    *    candidate set (guide §2.3: shuffle fewer bytes; measured on the
    *    exact all-pairs config: the agg input drops from |corpus|²/2 to
    *    |result|).
    */
  /** Rows per bucket-chunk the salted self-join targets: a bucket of s
    * rows is split across ceil(s / SaltTarget) join partitions (capped at
    * [[MaxSalts]]), so one large-but-under-the-cap bucket — s²/2 dot
    * products — spreads over many tasks instead of serializing on the one
    * task its (tbl, bucket) key hashes to (guide §2.5: a single enormous
    * key is the skew AQE's skew-join cannot split — salt it). Buckets at
    * or under SaltTarget pay nothing: nSplit = 1 means the probe side's
    * explode emits exactly one copy.
    */
  private val SaltTarget = 256L
  private val MaxSalts = 64L

  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 10, tables: Int = 3,
      maxBucketSize: Int = 500): DataFrame = {
    val banded = srpBanded(df, idCol, vecCol, "x", planes, tables)
      .withColumnRenamed("x_id", "id").withColumnRenamed("x_vec", "vec")
      .withColumn("nrm", norm(col("vec")))
    // attach each row's bucket size (one co-partitioned aggregate+join on
    // the same key the self-join uses) — it both applies the stop-band cap
    // (replacing the r7 broadcast anti-join: keep iff _bs <= cap) and
    // drives the per-bucket salt width below
    val sizes = banded.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("_bs"))
    val pruned = banded.join(sizes, Seq("tbl", "bucket"))
      .where(col("_bs") <= maxBucketSize)
    // deterministic per-bucket salt width: same bucket → same _bs → both
    // sides agree; a-side rows carry ONE salt (hash of their id), b-side
    // rows replicate to every salt of their bucket, so each (a, b) pair
    // meets exactly once and output is identical to the unsalted join
    val nSplit = greatest(lit(1L), least(lit(MaxSalts),
      ceil(col("_bs").cast("double") / SaltTarget).cast("long")))
    val a = pruned.select(col("tbl"), col("bucket"),
      pmod(xxhash64(col("id"), lit(7L)), nSplit).as("_salt"),
      col("id").as("a_id"), col("vec").as("a_vec"), col("nrm").as("a_nrm"))
    val b = pruned
      .withColumn("_salt", explode(sequence(lit(0L), nSplit - 1L)))
      .select(col("tbl"), col("bucket"), col("_salt"), col("id").as("b_id"),
        col("vec").as("b_vec"), col("nrm").as("b_nrm"))
    // same arithmetic as cosine(): d = norm(a) * norm(b), 0.0 when d == 0
    val d = col("a_nrm") * col("b_nrm")
    a.join(b, Seq("tbl", "bucket", "_salt"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        when(d === 0, 0.0)
          .otherwise(dot(col("a_vec"), col("b_vec")) / d).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy(col("a_id"), col("b_id")).agg(max(col("cosine")).as("cosine"))
  }
}
