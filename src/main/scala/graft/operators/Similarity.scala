package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CentroidScores, LshBucket, VecDot}

/**
 * Similarity search over an embedding column (`array<float>`): exact
 * brute-force cosine top-k as the baseline, and random-hyperplane LSH
 * bucketing as the scale path (candidates only meet inside a bucket —
 * the shuffle key is the bucket signature, never the vector).
 *
 * All dot products fold LEFT-TO-RIGHT over the array index with each
 * float cast to double first — deterministic and identical to the SQL
 * oracle's list_reduce. The hot kernels (dot / bucket signature /
 * centroid scores) are native codegen'd expressions that LOOP over the
 * array against plan-shipped matrices ([[graft.functions.VecKernels]]) —
 * the round-3 dim-unrolled Column trees broke janino at dim=64 and the
 * stage silently ran interpreted.
 */
object Similarity {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(col)

  /** Sequential-fold dot product of two array<float> columns (as doubles). */
  def dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, ${dim + 1})]), (acc, v) -> acc + v)"

  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String, dim: Int): String = s"SQRT(${dotSql(a, a, dim)})"

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (${normSql(a, dim)} * ${normSql(b, dim)}))"

  /**
   * Exact brute-force cosine top-k: each query row (filtered from the
   * corpus by `isQuery`) against every corpus row. Corpus side is
   * broadcast when small; at scale, flip to the LSH path. Deterministic
   * rank ties break by corpus id.
   */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
                     isQuery: Column, k: Int): DataFrame = {
    // norms precomputed per VECTOR (persist blocks CollapseProject from
    // re-inlining the fold into every pair) — cosine per pair is then one
    // dot product and two multiplies, bit-identical to computing sqrt
    // folds inline since the inputs are the same floats
    val nv = graft.plans.Caches.track(
      vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
        .where(col("nrm") > 0.0)) // zero-norm guard: see rankTopK
    val q = nv.where(isQuery).select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val c = nv.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"), col("nrm").as("cn"))
    rankTopK(q.join(broadcast(c), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), k)
  }

  /**
   * Shared ranking tail of the ANN paths: top-k by (cos DESC, nbr_id)
   * through the [[graft.functions.top_k]] bounded-heap aggregate (sort
   * key (-cos, nbr_id) ascending — exact sign flip, same order) instead
   * of a rank window: map-side partials ship at most k candidates per
   * query and no task sorts a query's full candidate set. NaN cosines
   * (zero-norm vectors) would rank LAST here where a desc window (and
   * the DuckDB oracles' ORDER BY cos DESC) ranks them first — so every
   * ANN path ENFORCES the precondition by filtering `nrm > 0` in its
   * base projection (ADVICE r4): a zero-norm vector has no defined
   * cosine and never enters ranking on either engine.
   */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("query_id"))
      .agg(graft.functions.top_k(struct((-col("cos")).as("__negcos"),
        col("nbr_id").as("nbr_id"), col("cos").as("cos")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).as("rnk"),
        col("col.nbr_id").as("nbr_id"), col("col.cos").as("cos"))

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5). */
  private def planeVal(plane: Int, d: Int): Double =
    (((plane * 64 + d) * 2654435761L % 2147483648L).toDouble / 2147483648.0) - 0.5
  private def planeValSql(plane: Int, d: String): String =
    s"(CAST((($plane * 64 + $d) * 2654435761 % 2147483648) AS DOUBLE) / 2147483648.0 - 0.5)"

  /** Plane matrix rows `first .. first+n-1` (each `dim` wide). */
  private def planeRows(first: Int, n: Int, dim: Int): Seq[Seq[Double]] =
    (first until first + n).map(p => (0 until dim).map(d => planeVal(p, d)))

  /**
   * Random-hyperplane LSH bucket signature (nPlanes sign bits packed to
   * an int) — the IVF/LSH-bucketed ANN scale path: group/join on
   * `bucket`, search within buckets only. Native looping expression —
   * constant-size generated code at any (dim, nPlanes).
   */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    c(LshBucket(e(vec), planeRows(0, nPlanes, dim)))
  def lshBucketSql(v: String, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      val s = (0 until dim).foldLeft("CAST(0 AS DOUBLE)") { (acc, d) =>
        s"($acc + CAST($v[${d + 1}] AS DOUBLE) * ${planeValSql(p, d.toString)})"
      }
      s"(CASE WHEN $s >= 0.0 THEN 1 ELSE 0 END * ${1 << p})"
    }.mkString("(", " + ", ")")

  /**
   * LSH-bucketed ANN with MULTIPLE hash tables (standard recall lever):
   * table t uses planes [t*nPlanes, (t+1)*nPlanes); candidates are the
   * union over tables (distinct pairs), ranked by exact cosine. The
   * shuffle key is (table, bucket) — never the vectors pairwise.
   */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String,
              isQuery: Column, k: Int, nPlanes: Int, dim: Int,
              nTables: Int = 3): DataFrame = {
    // base holds the vectors + norms ONCE (persisted: the norm fold must
    // not re-inline); everything that shuffles — the (table, bucket)
    // self-join and the candidate-pair distinct — carries BARE IDS only.
    // Vectors are re-attached to the deduped pairs afterwards, so each
    // embedding crosses the wire once, not once per matching table.
    val base = graft.plans.Caches.track(
      vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"),
        isQuery.as("__isq"))
        .where(col("nrm") > 0.0)) // zero-norm guard: see rankTopK
    val bucketed = base.select(col(idCol), col("__isq"),
      posexplode(array((0 until nTables).map(t =>
        tableBucket(col(vecCol), t, nPlanes, dim)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val q = bucketed.where(col("__isq")).select(col("tbl"), col("bucket"), col(idCol).as("query_id"))
    val c = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("nbr_id"))
    val pairs = q.join(c, Seq("tbl", "bucket")).where(col("query_id") =!= col("nbr_id"))
      .select("query_id", "nbr_id").distinct()
    val qv = base.select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val cv = base.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"), col("nrm").as("cn"))
    rankTopK(pairs.join(qv, Seq("query_id")).join(cv, Seq("nbr_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), k)
  }

  /** Deterministic IVF centroid component (plane stream 64+, disjoint
    * from the LSH tables' planes 0..11). */
  private def centroidVal(c: Int, d: Int): Double = planeVal(64 + c, d)

  /**
   * Per-vector squared-L2 scores against the K centroids, as an
   * array column: score_c = ||c||^2 - 2<v,c> (||v||^2 is constant per
   * row, so dropping it preserves the argmin). Left-to-right fold —
   * bit-identical to [[ivfScoresSql]].
   */
  def ivfScores(vec: Column, k: Int, dim: Int): Column =
    scoresOf(vec, Array.tabulate(k, dim)((c, d) => centroidVal(c, d)))
  def ivfScoresSql(v: String, k: Int, dim: Int): String = {
    val dim0 = dim
    scoresOfSql(v, Array.tabulate(k, dim0)((c, d) => centroidVal(c, d)))
  }

  /** SQL twin of [[scoresOf]] over explicit centroids (same fold order;
    * doubles interpolated via OracleLit string casts). */
  def scoresOfSql(v: String, cents: Array[Array[Double]]): String = cents.map { cv =>
    val c2 = cv.foldLeft(0.0)((a, x) => a + x * x)
    cv.zipWithIndex.foldLeft(graft.sources.OracleLit.d(c2)) { case (acc, (cd, d)) =>
      s"($acc - ${graft.sources.OracleLit.d(2.0 * cd)} * CAST($v[${d + 1}] AS DOUBLE))"
    }
  }.mkString("[", ", ", "]")

  /**
   * IVF-flat ANN — the inverted-list scale path beside [[lshTopK]]:
   * K deterministic centroids partition the corpus into lists (cell =
   * argmin squared-L2); a query probes its `nProbe` nearest lists and
   * ranks exact cosine within them. The shuffle key is the LIST ID —
   * with write-time bucketing by cell the probe join is shuffle-free,
   * and each corpus vector lives in exactly ONE list (no multi-table
   * duplication to dedupe). Deterministic centroids keep the oracle
   * bit-exact; a Lloyd-trained quantizer drops in by replacing
   * `centroidVal` without touching the plan.
   */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String,
              isQuery: Column, k: Int, nCentroids: Int, nProbe: Int,
              dim: Int): DataFrame =
    ivfTopKScored(vecs, idCol, vecCol, isQuery, k, nProbe,
      ivfScores(col(vecCol), nCentroids, dim))

  /**
   * IVF-flat over a TRAINED coarse quantizer: same plan as [[ivfTopK]],
   * centroids from [[trainCentroids]] folded in as literal score
   * expressions (the quantizer is tiny — it ships with the plan).
   */
  def ivfTopKTrained(vecs: DataFrame, idCol: String, vecCol: String,
                     isQuery: Column, k: Int, nProbe: Int,
                     centroids: Array[Array[Double]]): DataFrame =
    ivfTopKScored(vecs, idCol, vecCol, isQuery, k, nProbe,
      scoresOf(col(vecCol), centroids))

  /** Squared-L2 scores (minus the per-row constant) against explicit
    * centroids — native looping expression (see [[graft.functions.VecKernels]]). */
  def scoresOf(vec: Column, cents: Array[Array[Double]]): Column =
    c(CentroidScores(e(vec), cents.toSeq.map(_.toSeq)))

  /**
   * Lloyd refinement of the IVF coarse quantizer: start from the
   * deterministic hyperplane-derived centroids, run `iters` rounds of
   * (assign to nearest centroid) -> (per-cell, per-dimension mean). Each
   * round is ONE hash-agg shuffle keyed (cell, dim) with map-side
   * partials plus a k*dim-row collect (tiny). Cells that lose all
   * members keep their previous centroid. The k-means objective is
   * non-increasing per round; the result is a quality lever for
   * [[ivfTopKTrained]] recall, not an oracle-checked kernel (double
   * means are combine-order-dependent in the last ulps).
   */
  def trainCentroids(vecs: DataFrame, vecCol: String, k: Int, dim: Int,
                     iters: Int,
                     init: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    var cents = init.getOrElse(Array.tabulate(k, dim)((c, d) => centroidVal(c, d)))
    for (_ <- 0 until iters) {
      val assigned = vecs.select(col(vecCol).as("__v"))
        .withColumn("__sc", scoresOf(col("__v"), cents))
        .withColumn("cell", expr("array_position(__sc, array_min(__sc))"))
      val means = assigned.select(col("cell"), posexplode(col("__v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getLong(0).toInt - 1)(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }

  /** Mean quantization objective (squared L2 to the assigned centroid). */
  def quantizationObjective(vecs: DataFrame, vecCol: String,
                            cents: Array[Array[Double]]): Double = {
    val v2 = dot(col(vecCol), col(vecCol))
    vecs.select((array_min(scoresOf(col(vecCol), cents)) + v2).as("__o"))
      .agg(avg(col("__o"))).collect()(0).getDouble(0)
  }

  // ---------------------------------------------------------------------
  // IVF-PQ: product-quantized ANN — the memory-bound scale path. Corpus
  // vectors compress to `mSub` small codes (argmin against deterministic
  // sub-codebooks; the code table is mSub ints per vector instead of the
  // raw floats), queries rank candidates by ADC (asymmetric distance:
  // per-query lookup tables, summed per subspace) — at 100 TB the probed
  // lists scan bytes-per-vector, not KB, and the raw embeddings never
  // cross the candidate join. Non-residual variant (codes quantize the
  // vector itself, not v - centroid; ScaNN-style), which keeps the
  // oracle a pure replay of the same folds. Deterministic codebooks from
  // the shared plane stream (rows 128+, disjoint from LSH 0..11 and IVF
  // 64+); a trained codebook drops in through the same scoresOf calls.
  // ---------------------------------------------------------------------

  /** Sub-codebook `m` (ks entries x sub dims), plane stream 128+ — the
    * deterministic INITIALIZATION; real recall needs Lloyd-trained
    * books ([[trainPqCodebooks]] -> frozen literals, the q62 pattern:
    * untrained random codebooks quantize so coarsely that ADC recall
    * collapses, measured 0.14 vs the 0.475 IVF-pruning ceiling on the
    * sf0.001 fixture — trained books recover most of the ceiling). */
  def pqCodebook(m: Int, ks: Int, sub: Int): Array[Array[Double]] =
    Array.tabulate(ks, sub)((k, d) => planeVal(128 + m * ks + k, d))

  /** Lloyd-train the `mSub` PQ sub-codebooks (one small k-means per
    * subspace over the SLICED vectors, initialized from the
    * deterministic books). Freeze the result as literals for
    * oracle-exact plans (`tools.FreezePq` -> `queries.TrainedPq`). */
  def trainPqCodebooks(vecs: DataFrame, vecCol: String, mSub: Int, ks: Int,
                       dim: Int, iters: Int): Array[Array[Array[Double]]] = {
    val sub = dim / mSub
    require(mSub * sub == dim, s"dim $dim must divide into $mSub subspaces")
    (0 until mSub).toArray.map { m =>
      val sliced = vecs.select(slice(col(vecCol), m * sub + 1, sub).as("__sv"))
      trainCentroids(sliced, "__sv", ks, sub, iters, Some(pqCodebook(m, ks, sub)))
    }
  }

  /**
   * IVF-PQ top-k: coarse IVF lists prune candidates (same probe plan as
   * [[ivfTopK]]); within probed lists, candidates rank by the ADC
   * approximation of squared L2 (sum over subspaces of the query's
   * lookup-table entry at the corpus code — exact ranking equivalence to
   * ||q_m - c||^2 per subspace since the per-query ||q_m||^2 constant
   * drops). Returns (query_id, rnk, nbr_id, adc); ties break by nbr_id.
   */
  def ivfPqTopK(vecs: DataFrame, idCol: String, vecCol: String,
                isQuery: Column, k: Int, nCentroids: Int, nProbe: Int,
                mSub: Int, ks: Int, dim: Int): DataFrame =
    ivfPqTopKWith(vecs, idCol, vecCol, isQuery, k, nCentroids, nProbe, dim,
      Array.tabulate(mSub)(m => pqCodebook(m, ks, dim / mSub)))

  /** [[ivfPqTopK]] over EXPLICIT sub-codebooks (e.g. the Lloyd-trained
    * frozen `queries.TrainedPq.Codebooks`). */
  def ivfPqTopKWith(vecs: DataFrame, idCol: String, vecCol: String,
                    isQuery: Column, k: Int, nCentroids: Int, nProbe: Int,
                    dim: Int, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val mSub = codebooks.length
    val sub = dim / mSub
    require(mSub * sub == dim, s"dim $dim must divide into $mSub subspaces")
    var b = vecs.select(col(idCol), col(vecCol), isQuery.as("__isq"))
      .withColumn("__sc", ivfScores(col(vecCol), nCentroids, dim))
    for (m <- 0 until mSub)
      b = b.withColumn(s"__pq_$m",
        scoresOf(slice(col(vecCol), m * sub + 1, sub), codebooks(m)))
    val base = graft.plans.Caches.track(b)
    // corpus side: list id + the mSub codes — 4 bytes per subspace, no vectors
    val corpus = base
      .withColumn("cell", expr("array_position(__sc, array_min(__sc))"))
      .select(Seq(col("cell"), col(idCol).as("nbr_id")) ++ (0 until mSub).map(m =>
        expr(s"array_position(__pq_$m, array_min(__pq_$m))").as(s"__code_$m")): _*)
    // query side: nProbe nearest lists + the ADC lookup tables (bounded
    // window — nCentroids rows per query, the ivfTopKScored rationale)
    val qexp = base.where(col("__isq"))
      .select(Seq(col(idCol).as("query_id")) ++ (0 until mSub).map(m => col(s"__pq_$m")) :+
        posexplode(col("__sc")): _*)
      .withColumn("cid", (col("pos") + 1).cast("long"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("col"), col("cid"))
    val probes = qexp.withColumn("__rn", row_number().over(wq)).where(col("__rn") <= nProbe)
      .select(Seq(col("query_id"), col("cid")) ++ (0 until mSub).map(m => col(s"__pq_$m")): _*)
    val adc = (0 until mSub).map(m =>
      element_at(col(s"__pq_$m"), col(s"__code_$m").cast("int"))).reduce(_ + _)
    val pairs = probes.join(corpus, col("cid") === col("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("__adc", adc)
    pairs.groupBy(col("query_id"))
      .agg(graft.functions.top_k(struct(col("__adc").as("__adc"),
        col("nbr_id").as("nbr_id")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).as("rnk"),
        col("col.nbr_id").as("nbr_id"), col("col.__adc").as("adc"))
  }

  /** SQL twin of the per-subspace ADC table (scores of the sliced query
    * vector against sub-codebook `m`) — DuckDB 1-based inclusive slice. */
  def pqTableSql(v: String, m: Int, cb: Array[Array[Double]]): String = {
    val sub = cb.head.length
    scoresOfSql(s"($v[${m * sub + 1}:${(m + 1) * sub}])", cb)
  }

  private def ivfTopKScored(vecs: DataFrame, idCol: String, vecCol: String,
                            isQuery: Column, k: Int, nProbe: Int,
                            scores: Column): DataFrame = {
    val base = graft.plans.Caches.track(
      vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"),
        isQuery.as("__isq"))
        .where(col("nrm") > 0.0) // zero-norm guard: see rankTopK
        .withColumn("__sc", scores))
    val corpus = base
      .withColumn("cell", expr("array_position(__sc, array_min(__sc))"))
      .select(col("cell"), col(idCol).as("nbr_id"), col(vecCol).as("cv"), col("nrm").as("cn"))
    val qexp = base.where(col("__isq"))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"),
        posexplode(col("__sc")))
      .withColumn("cid", (col("pos") + 1).cast("long"))
    // probe-list selection stays a window ON PURPOSE: each query ranks
    // exactly nCentroids rows (the exploded score array — a few dozen
    // at most), so the per-group sort is bounded by the quantizer size,
    // and a top_k aggregate would need an extra join to re-attach qv/qn
    val wq = Window.partitionBy(col("query_id")).orderBy(col("col"), col("cid"))
    val probes = qexp.withColumn("__rn", row_number().over(wq)).where(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    rankTopK(probes.join(corpus, col("cid") === col("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), k)
  }

  /** Bucket signature of table `t` (planes t*nPlanes .. t*nPlanes+nPlanes-1). */
  def tableBucket(vec: Column, t: Int, nPlanes: Int, dim: Int): Column =
    c(LshBucket(e(vec), planeRows(t * nPlanes, nPlanes, dim)))
  def tableBucketSql(v: String, t: Int, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      val s = (0 until dim).foldLeft("CAST(0 AS DOUBLE)") { (acc, d) =>
        s"($acc + CAST($v[${d + 1}] AS DOUBLE) * ${planeValSql(t * nPlanes + p, d.toString)})"
      }
      s"(CASE WHEN $s >= 0.0 THEN 1 ELSE 0 END * ${1 << p})"
    }.mkString("(", " + ", ")")

  /**
   * Embedding-cosine near-duplicate pairs above a threshold. Same
   * bare-id discipline as [[lshTopK]]: the bucket self-join carries only
   * (bucket, id) — the deduped pairs re-attach each vector ONCE per side
   * afterwards, so embeddings never cross the wire per bucket row.
   */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, nPlanes: Int, dim: Int): DataFrame = {
    val base = graft.plans.Caches.track(vecs.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket"),
      norm(col(vecCol)).as("nrm"))
      .where(col("nrm") > 0.0)) // zero-norm guard: see rankTopK
    val a = base.select(col("bucket"), col(idCol).as("id_a"))
    val b = base.select(col("bucket"), col(idCol).as("id_b"))
    val pairs = a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = base.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val vb = base.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    pairs.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
