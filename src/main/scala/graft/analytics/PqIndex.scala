package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** PERSISTED IVF-PQ index: build once, query many — the production ANN
  * serving shape ([[ProductQuantization.ivfPqTopK]] retrains per call,
  * which is the right contract for an oracled one-shot query but not for a
  * corpus queried repeatedly; this is the missing half).
  *
  * On-disk layout under `dir`:
  *   - `coarse/`    (cid, m, nm) — trained coarse centroids, k rows
  *   - `codebooks/` (sub, cid, m, nm) — subspace codebooks, m×k rows
  *   - `codes/`     (vec_id, sub, cid) PARTITIONED BY centroid_id — the PQ
  *     codes laid out as inverted lists, so probing is PARTITION PRUNING:
  *     a query that probes `nprobe` of L lists reads ~nprobe/L of the
  *     index bytes and none of the raw vectors (PqIndexSpec measures the
  *     pruned scan).
  *   - `vlists/`    (vec_id, centroid_id) PARTITIONED BY vec-hash bucket
  *     (r14) — the id→list sidecar: [[compact]]'s affected-list discovery
  *     reads only the tombstoned ids' buckets of this tiny store instead
  *     of scanning two columns of the whole codes store (the measured
  *     1.3–1.7 s discovery floor of r13 — VERDICT r13 #3). Queries never
  *     read it; indexes without it (pre-r14) fall back to the codes scan.
  *
  * At 100 TB this is the structure that makes ANN serving viable: the
  * coarse centroids and codebooks are broadcast-sized, the codes are ~32×
  * smaller than the raw vectors, and the inverted-list partitioning turns
  * every query batch into a static-pruned scan of a few directories.
  *
  * Determinism: build reuses the exact training pipeline of
  * [[ProductQuantization.ivfPqTopK]] (shared-quantized coarse Lloyd +
  * subspace Lloyd), and query reuses its exact scoring arithmetic — so
  * querying a freshly built index returns bit-identical rows to the
  * one-shot operator (the `sim_pqindex_topk` oracle row IS
  * `sim_ivfpq_topk`'s SQL). */
object PqIndex {

  /** Stored-layout version: 2 = packed pcodes (one row per vector, round
    * 11). The layout and the PQ geometry (m, subDim) are properties of the
    * BUILD — querying or appending a packed index with a different
    * geometry would silently read wrong array slots (or throw under ANSI
    * array indexing), so [[build]] records them in `_graft_meta.json` and
    * [[query]]/[[append]] validate before touching the codes. */
  private val LayoutVersion = 2

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)


  /** Historical vec-hash width of the `vlists/` sidecar (pre-r15 indexes;
    * r15 builds choose by corpus size — [[IndexMeta.bucketPolicy]], VERDICT
    * r14 #4 — and record the width in `_graft_meta.json`, read back by
    * every later operation). The width bounds the share of the sidecar a
    * [[compact]] discovery reads (same role as `SearchIndex`'s
    * docBuckets). */
  private[analytics] val DefaultVBuckets = 16

  private def vbucketOf(c: org.apache.spark.sql.Column, vbuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(vbuckets)).cast("int")

  private def hasPartitions(spark: SparkSession, root: org.apache.hadoop.fs.Path,
                            prefix: String): Boolean = {
    val f = fs(spark, root)
    f.exists(root) && f.listStatus(root).exists(_.getPath.getName.startsWith(prefix))
  }

  private def writeMeta(spark: SparkSession, dir: String, m: Int, subDim: Int,
                        trained: String = "full",
                        ccosP5Micro: Option[Long] = None,
                        driftAppended: Long = 0L,
                        driftOutliers: Long = 0L,
                        driftBaseMicro: Option[Long] = None,
                        driftCalibMicro: Option[Long] = None,
                        driftLastMicro: Option[Long] = None,
                        vbuckets: Int = 0,
                        vlistsComplete: Boolean = false): Unit = {
    val driftFields = ccosP5Micro
      .map(v => s""","ccos_p5_micro":$v,"drift_appended":$driftAppended,""" +
        s""""drift_outliers":$driftOutliers""")
      .getOrElse("") +
      driftBaseMicro.map(v => s""","drift_base_micro":$v""").getOrElse("") +
      driftCalibMicro.map(v => s""","drift_calib_micro":$v""").getOrElse("") +
      driftLastMicro.map(v => s""","drift_last_micro":$v""").getOrElse("")
    // vlists completeness (r15, ADVICE r14): recorded ONLY when the sidecar
    // is known to cover the WHOLE index — a pre-r15 index append()ed later
    // has a partial sidecar, and compact discovery trusting it would miss
    // pre-existing tombstoned ids and resurrect forgotten vectors
    val layoutFields = (if (vbuckets > 0) s""","vbuckets":$vbuckets""" else "") +
      (if (vlistsComplete) s""","vlists":true""" else "")
    // IndexMeta.write swaps atomically: every append REWRITES this file
    // (drift fields), and a lock-free query racing a truncate-then-write
    // could have read a partial object (ADVICE r15-review)
    IndexMeta.write(spark, dir, s"""{"layout":$LayoutVersion,"m":$m,"subDim":$subDim,""" +
      s""""trained":"$trained"$driftFields$layoutFields}""")
  }

  /** The stored vlists width (pre-r15 meta carries none → the historical
    * 16) and completeness flag. */
  private def vlistsMeta(spark: SparkSession, dir: String): (Int, Boolean) =
    readMetaText(spark, dir) match {
      case None => (DefaultVBuckets, false)
      case Some(txt) => (metaLong(txt, "vbuckets").map(_.toInt).getOrElse(DefaultVBuckets),
        IndexMeta.flag(txt, "vlists"))
    }

  // meta I/O is the shared family layer ([[IndexMeta]]) — one read/write
  // implementation, one atomic-swap discipline, no parallel copy to drift
  private def readMetaText(spark: SparkSession, dir: String): Option[String] =
    IndexMeta.readText(spark, dir)

  private def metaLong(txt: String, k: String): Option[Long] =
    IndexMeta.long(txt, k)

  /** The recorded training mode ("full" / "sampled" / "explicit") of a
    * stored index — observability for the default-policy branch (PqIndexSpec
    * asserts the engaged branch per corpus size). Indexes written before
    * r13 carry no field — and before r11 no meta FILE at all — → "full"
    * (the only mode that existed; ADVICE r13: a missing file must not
    * throw from an observability probe). */
  def trainedMode(spark: SparkSession, dir: String): String =
    readMetaText(spark, dir)
      .flatMap(t => """"trained":"(\w+)"""".r.findFirstMatchIn(t).map(_.group(1)))
      .getOrElse("full")

  /** Quantizer-drift observability (r14, VERDICT r13 #8). `trainCcosP5Micro`
    * is the 5th percentile of the corpus's best coarse-centroid cosine at
    * BUILD time (micro-units) — the train-time fit of the quantizer.
    * `appended`/`outliers` accumulate across [[append]]s: an outlier is an
    * appended vector whose best coarse cosine falls BELOW that train-time
    * p5 (equivalently: nearest-centroid distance above the train-time
    * p95), i.e. a vector the stored quantizer describes worse than it
    * described the 5% tail of its own training corpus. Read `fraction` as
    * a TREND, not against 0.05: even same-distribution appends land above
    * 0.05 (the quantizer fits its own training draw better than fresh
    * draws — the ordinary generalization gap, pronounced on small
    * corpora), so the rebuild trigger is the fraction RISING across
    * appends relative to the deployment's own post-build baseline
    * (PqIndexSpec: same-distribution ≈ baseline, out-of-distribution
    * spikes far above it). Pure observability: queries and stored
    * structures are unaffected by these numbers. */
  final case class DriftStats(trainCcosP5Micro: Option[Long],
                              appended: Long, outliers: Long,
                              baselineMicro: Option[Long] = None,
                              calibMicro: Option[Long] = None,
                              lastMicro: Option[Long] = None) {
    def fraction: Option[Double] =
      if (appended > 0) Some(outliers.toDouble / appended) else None
    /** The IN-SAMPLE baseline outlier fraction recorded at build time
      * (r15) — the share of the built corpus itself below the train p5
      * (≈0.05 for a full-train build by construction). Observability: the
      * advisory compares against [[calibration]], not this — fresh draws
      * generalize worse than the training corpus described itself, by a
      * factor that depends on corpus size (measured 8× on the spec corpus,
      * PqIndexSpec), so an in-sample number cannot anchor a threshold. */
    def baseline: Option[Double] = baselineMicro.map(_ / 1e6)
    /** The deployment's OWN post-build baseline: the outlier fraction of
      * the FIRST append after build — fresh same-distribution data scored
      * by the stored quantizer, i.e. exactly the level later appends
      * should hold if nothing shifted. */
    def calibration: Option[Double] = calibMicro.map(_ / 1e6)
    /** The LATEST append's own outlier fraction (not the cumulative
      * average, which dilutes a recent shift under a long history). */
    def last: Option[Double] = lastMicro.map(_ / 1e6)
  }

  /** Read the [[DriftStats]] recorded in `_graft_meta.json`; all-zero for
    * indexes predating the drift signal. */
  def driftStats(spark: SparkSession, dir: String): DriftStats =
    readMetaText(spark, dir) match {
      case None => DriftStats(None, 0L, 0L)
      case Some(txt) => DriftStats(metaLong(txt, "ccos_p5_micro"),
        metaLong(txt, "drift_appended").getOrElse(0L),
        metaLong(txt, "drift_outliers").getOrElse(0L),
        metaLong(txt, "drift_base_micro"),
        metaLong(txt, "drift_calib_micro"),
        metaLong(txt, "drift_last_micro"))
    }

  /** Actionable rebuild signal (r15, VERDICT r14 #6): true when the LATEST
    * append's outlier fraction exceeds `factor ×` the deployment's own
    * post-build baseline — the FIRST append's fraction, recorded in meta as
    * the calibration ([[DriftStats.calibration]]). The build-time in-sample
    * fraction cannot anchor this threshold (fresh draws run a
    * corpus-size-dependent generalization gap above it — see
    * [[DriftStats.baseline]]); the first append IS fresh data under the
    * stored quantizer, so it measures that gap directly and later appends
    * are judged against it: same-distribution appends sit ≈1× calibration
    * with binomial variance only (a 250-row append has σ ≈ 0.03 of the
    * fraction — the default 1.5× sits >5σ from the no-shift null), while a
    * genuine shift multiplies it (PqIndexSpec: uncorrelated data lands
    * 1.9× on a deliberately hard toy geometry — 16-dim, ~10 centroids,
    * where random vectors still max-cos high — and separates further at
    * real dimensionality/centroid counts). Caveat (scaladoc contract): the
    * calibration assumes the first post-build append is representative —
    * calibrate on a known-clean shard, or rebuild to reset it. Pure
    * observability: never blocks appends or queries; single-append or
    * pre-r15 indexes never advise. */
  def driftAdvisory(spark: SparkSession, dir: String, factor: Double = 1.5): Boolean = {
    val s = driftStats(spark, dir)
    (s.lastMicro, s.calibMicro) match {
      case (Some(l), Some(c)) => l > factor * math.max(c, 1000L)
      case _ => false
    }
  }

  /** Fail-fast geometry check (see [[LayoutVersion]]): a missing meta file
    * means the index predates layout metadata — rebuild; a mismatch means
    * the caller's (m, subDim) is not what the codes were packed under. */
  private def checkMeta(spark: SparkSession, dir: String, m: Int, subDim: Int,
                        builder: String = "PqIndex.build"): Unit = {
    val txt = readMetaText(spark, dir).getOrElse(
      throw new IllegalStateException(s"PQ index at $dir has no _graft_meta.json " +
        s"(built before the packed-codes layout); rebuild it with $builder"))
    def field(k: String): Long =
      metaLong(txt, k).getOrElse(throw new IllegalStateException(
        s"PQ index meta at $dir is unreadable: $txt"))
    if (field("layout") != LayoutVersion || field("m") != m || field("subDim") != subDim)
      throw new IllegalStateException(
        s"PQ index at $dir was built as layout=${field("layout")} m=${field("m")} " +
          s"subDim=${field("subDim")}; caller asked for layout=$LayoutVersion m=$m " +
          s"subDim=$subDim - rebuild the index or pass its build geometry")
  }

  /** Geometry metadata for [[ProductQuantization.adcBuild]] dirs — the same
    * record/validate pair the partitioned index uses (a mismatched (m,
    * subDim) against packed pcodes silently reads wrong slots; ADVICE r12). */
  private[analytics] def writeAdcMeta(spark: SparkSession, dir: String,
                                      m: Int, subDim: Int, trained: String): Unit =
    writeMeta(spark, dir, m, subDim, trained)

  private[analytics] def checkAdcMeta(spark: SparkSession, dir: String,
                                      m: Int, subDim: Int): Unit =
    checkMeta(spark, dir, m, subDim, builder = "ProductQuantization.adcBuild")

  /** Marker left by an all-tombstoned [[compact]]: a partitioned overwrite
    * of ZERO rows writes no part files (nothing to infer a schema from), so
    * the empty state is recorded explicitly and [[readCodes]] reconstructs
    * the empty frame from the literal schema. The next [[writeCodes]]
    * (append or rebuild) clears it. */
  private def emptyMarker(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_graft_empty")

  private def readCodes(spark: SparkSession, dir: String): DataFrame =
    if (fs(spark, emptyMarker(dir)).exists(emptyMarker(dir))) {
      // plain attributes from an explicit schema, NOT literal expressions:
      // a foldable empty pcodes literal would constant-fold pcodes(0) at
      // planning time and throw under ANSI array indexing
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("vec_id", LongType),
          StructField("pcodes", ArrayType(LongType)),
          StructField("centroid_id", LongType))))
    } else spark.read.parquet(s"$dir/codes")

  /** Coarse-list assignment of a quantized frame under a (cid, m, nm)
    * centroid table — the same rule at build time and when the centroids
    * are read back from the stored index (append path). Returns
    * (vec_id, centroid_id, best_ccos); the winning cosine feeds the drift
    * signal ([[driftStats]]) and is dropped before anything is stored. */
  private def assignCoarse(quantized: DataFrame, cent: DataFrame): DataFrame = {
    // compiled per-row argmax over the driver-collected centroid table
    // (r18 — graft.functions.NearestCentroidCos): replaces the crossJoin +
    // max_by hash aggregate over |vecs| × k scored rows; winner AND its
    // ccos (the old max(ccos) — the winner's score by construction) come
    // off one projection. Ties, null/ragged vectors, and the empty-table
    // case reproduce the aggregate exactly (see the expression scaladoc).
    val centT = graft.functions.CentroidTable.collect(cent)
    if (centT.isEmpty)
      // the replaced aggregate emitted nothing on an empty centroid side —
      // decided driver-side (a runtime isNotNull filter would push below
      // the projection and evaluate the argmax twice per row, guide §4.4)
      return quantized.filter(lit(false))
        .select(col("vec_id"), lit(0L).as("centroid_id"),
          lit(null).cast("double").as("best_ccos"))
    val centB = quantized.sparkSession.sparkContext.broadcast(centT)
    quantized
      .select(col("vec_id"), transform(col("qi"), _.cast("double")).as("qd"))
      .withColumn("nqd", GraftFunctions.arrayDot(col("qd"), col("qd")))
      .withColumn("__best", org.apache.spark.sql.graft.GraftBridge.column(
        graft.functions.NearestCentroidCos(
          org.apache.spark.sql.graft.GraftBridge.expression(col("qd")),
          org.apache.spark.sql.graft.GraftBridge.expression(col("nqd")),
          centB)))
      .select(col("vec_id"), col("__best.cid").as("centroid_id"),
        col("__best.score").as("best_ccos"))
  }

  /** Write codes + the `vlists/` sidecar. Persists and RETURNS the
    * assignment frame (vec_id, centroid_id, best_ccos) so the caller can
    * derive the drift numbers from the same pass; the caller unpersists. */
  private def writeCodes(codes: DataFrame, assigned0: DataFrame, dir: String,
                         mode: String, vbuckets: Int): DataFrame = {
    val assigned = assigned0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The codes store and the vlists sidecar are independent writes over
    // the same persisted assignment — run them CONCURRENTLY from driver
    // threads (r18, guide §2.6) so the two job+commit latencies overlap.
    // Per-store notes:
    //   - codes cluster by list before the partitioned write: without
    //     this every shuffle partition appends its own file to every list
    //     directory (tasks × lists small files); with it each list is one
    //     file, written once and read in one footer open per probe. At
    //     real scale cap file size with spark.sql.files.maxRecordsPerFile
    //     instead of one-per-list. Stored layout is PACKED (round 11): one
    //     (vec_id, pcodes) row per vector instead of m code rows — the
    //     codes scan, the probe join, and the list files all shrink m-fold
    //     (32× at the default geometry).
    //   - vlists (r14): two longs per vector, vec-hash partitioned —
    //     [[compact]] discovers affected lists from the tombstoned ids'
    //     buckets alone (O(|ids|), not O(index)).
    Par.run(
      () => ProductQuantization.packCodes(codes)
        .join(assigned.select("vec_id", "centroid_id"), "vec_id")
        .select(col("vec_id"), col("pcodes"), col("centroid_id"))
        .repartition(col("centroid_id"))
        .write.mode(mode).partitionBy("centroid_id").parquet(s"$dir/codes"),
      () => assigned.select(col("vec_id"), col("centroid_id"))
        .withColumn("vbucket", vbucketOf(col("vec_id"), vbuckets))
        .repartition(col("vbucket"))
        .write.mode(mode).partitionBy("vbucket").parquet(s"$dir/vlists"))
    // clear the empty marker only AFTER the replacement data is readable:
    // readCodes gives the marker precedence, so a lock-free reader racing
    // this write degrades to a safe stale-empty view instead of hitting a
    // window with neither marker nor parquet (ADVICE r12 ordering fix)
    val mp = emptyMarker(dir)
    val mf = fs(codes.sparkSession, mp)
    if (mf.exists(mp)) mf.delete(mp, false): Unit
    assigned
  }

  /** Build and write the index. One source scan: the quantized frame is
    * shared by coarse training, list assignment, and PQ training.
    *
    * Training is BOUNDED by default (r13, the measured r12 remedy made
    * default — [[ProductQuantization.TrainSampleTarget]]): above the
    * target the quantizer trains on a deterministic hash-ordered sample
    * while the FULL corpus is assigned and encoded under it, so nlist and
    * the codebooks are constants and the build is linear in n (measured
    * exponent 0.79 vs 2.25 full-train, 11× at sf3, recall above the
    * floors — SCALING.md r12). At or below the target nothing changes:
    * oracle corpora full-train bit-identically. `trainOn` pins an explicit
    * training frame (the [[append]]-parity reference shape); `fullTrain =
    * true` opts back into corpus-sized training regardless of size. The
    * sample itself is partition-count-safe (r14:
    * [[ProductQuantization.hashHeadSample]] bounds the driver merge by the
    * survivor count, not partitions × target). At 100 TB:
    * raise `trainSampleTarget` to 10⁵–10⁶, rebuild on drift, [[append]]
    * between rebuilds. Probe widths derive from the trained size:
    * `scaledNprobe(autoTrainN(n))`. */
  def build(emb: DataFrame, dir: String,
            coarseStep: Int = 25, m: Int = 32, subDim: Int = 2, centroidStep: Int = 40,
            idCol: String = "vec_id", vecCol: String = "embedding",
            trainOn: Option[DataFrame] = None, fullTrain: Boolean = false,
            trainSampleTarget: Long = ProductQuantization.TrainSampleTarget): Unit =
    IndexLock.withLock(emb.sparkSession, dir) {
    GraftFunctions.register(emb.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val quantized = emb
      .select(col(idCol).as("vec_id"), Clustering.quantize(col(vecCol)).as("qi"))
      .persist(lvl)
    val quantizedTrain = ProductQuantization.resolveTrain(
      quantized, trainOn, fullTrain, trainSampleTarget, idCol, vecCol)
    val subsetTrain = !(quantizedTrain eq quantized)
    val cent = Clustering.trainedCentroidsFromQuantized(quantizedTrain, coarseStep)
    // the coarse-centroid store write (checkpointed k rows), the corpus
    // count (sizes the vlists sidecar width below), and the subspace-PQ
    // training are mutually independent — overlap them (r18, guide §2.6)
    var trained: (DataFrame, DataFrame, DataFrame) = null
    var nCorpus = 0L
    Par.run(
      () => cent.write.mode("overwrite").parquet(s"$dir/coarse"),
      () => nCorpus = quantized.count(),
      () => trained =
        ProductQuantization.trainAndCodesQ(quantizedTrain, m, subDim, centroidStep))
    val assigned = assignCoarse(quantized, cent)
    val (subs, cents1, codesTrain) = trained
    cents1.write.mode("overwrite").parquet(s"$dir/codebooks")
    // encode the FULL corpus under the trained codebooks (identical to the
    // training codes when training was full — same slices, same assign rule)
    val codes =
      if (!subsetTrain) codesTrain
      else ProductQuantization.assignToBooks(
        ProductQuantization.subSlices(quantized, m, subDim), cents1, m)
    // sidecar width by corpus size (r15, VERDICT r14 #4), recorded in meta
    // and read back by [[compact]] — never recomputed from a constant;
    // nCorpus was counted inside the overlap group above
    val vbuckets = IndexMeta.bucketPolicy(nCorpus)
    val assignedP = writeCodes(codes, assigned, dir, "overwrite", vbuckets)
    // drift baseline (r14, VERDICT r13 #8): the train-time p5 of the
    // corpus's best coarse cosine — [[append]] counts arrivals below it.
    // r15 (VERDICT r14 #6) also records the POST-BUILD baseline fraction:
    // the share of the encoded corpus itself below that p5 (≈0.05 for a
    // full-train build by construction; the honest generalization number
    // for a sampled-train build, where most of the corpus was never
    // trained on) — [[driftAdvisory]] compares append-time fractions
    // against it.
    val driftRow = assignedP.agg(
        percentile_approx(col("best_ccos"), lit(0.05), lit(10000)),
        count(lit(1))).head()
    val p5Micro = Option(driftRow.get(0))
      .map(v => math.round(v.asInstanceOf[Double] * 1e6))
    val baseMicro = p5Micro.map { p5 =>
      val below = assignedP.filter(col("best_ccos") * 1e6 < p5).count()
      val n = driftRow.getLong(1)
      if (n > 0) math.round(below.toDouble / n * 1e6) else 0L
    }
    writeMeta(emb.sparkSession, dir, m, subDim,
      trained = if (trainOn.nonEmpty) "explicit"
                else if (subsetTrain) "sampled" else "full",
      ccosP5Micro = p5Micro, driftBaseMicro = baseMicro,
      vbuckets = vbuckets, vlistsComplete = true)
    // a REBUILD resets the index completely: stale tombstones from a
    // pre-rebuild [[forget]] must not keep suppressing the fresh corpus
    clearTombstones(emb.sparkSession, dir)
    assignedP.unpersist()
    subs.unpersist(); cents1.unpersist(); codesTrain.unpersist()
    if (subsetTrain) quantizedTrain.unpersist()
    quantized.unpersist(): Unit
    }

  /** Append a delta to the index: encode the new vectors under the STORED
    * quantizer (coarse centroids + codebooks) and append their codes to
    * the inverted-list layout. The production serving pattern — append
    * continuously, retrain (rebuild) periodically; until a rebuild, the
    * index equals a one-shot [[build]] of the union trained on the
    * original corpus (`trainOn` parity, proven in PqIndexSpec).
    *
    * Each append also updates the DRIFT signal in `_graft_meta.json`
    * ([[driftStats]]): the count of appended vectors whose best coarse
    * cosine falls below the build-time p5 accumulates, making "when to
    * rebuild" a data-driven read instead of a guess. */
  def append(delta: DataFrame, dir: String,
             m: Int = 32, subDim: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    IndexLock.withLock(spark, dir) {
    checkMeta(spark, dir, m, subDim)
    GraftFunctions.register(spark)
    val quantized = delta
      .select(col(idCol).as("vec_id"), Clustering.quantize(col(vecCol)).as("qi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = spark.read.parquet(s"$dir/coarse")
    val books = spark.read.parquet(s"$dir/codebooks")
    val assigned = assignCoarse(quantized, cent)
    val codes = ProductQuantization.assignToBooks(
      ProductQuantization.subSlices(quantized, m, subDim), books, m)
    // append under the STORED sidecar width (the bucket rule is a pure
    // function of the id only at constant width); completeness is
    // inherited — appending keeps a complete sidecar complete, and can
    // never make a partial one whole (ADVICE r14)
    val (vbuckets, vlistsComplete) = vlistsMeta(spark, dir)
    val assignedP = writeCodes(codes, assigned, dir, "append", vbuckets)
    val prior = driftStats(spark, dir)
    prior.trainCcosP5Micro.foreach { p5 =>
      val st = assignedP.agg(count(lit(1)),
        sum(when(col("best_ccos") * 1e6 < p5, 1L).otherwise(0L))).head()
      val (n, out) = (st.getLong(0), if (st.isNullAt(1)) 0L else st.getLong(1))
      // this append's OWN fraction: the first one calibrates the
      // deployment's post-build baseline, the latest one is what
      // [[driftAdvisory]] judges against it (an empty delta changes nothing)
      val fracMicro = if (n > 0) Some(math.round(out.toDouble / n * 1e6)) else None
      writeMeta(spark, dir, m, subDim, trained = trainedMode(spark, dir),
        ccosP5Micro = Some(p5),
        driftAppended = prior.appended + n,
        driftOutliers = prior.outliers + out,
        driftBaseMicro = prior.baselineMicro,
        driftCalibMicro = prior.calibMicro.orElse(fracMicro),
        driftLastMicro = fracMicro.orElse(prior.lastMicro),
        vbuckets = vbuckets, vlistsComplete = vlistsComplete)
    }
    assignedP.unpersist()
    quantized.unpersist(): Unit
    }
  }

  /** Delete vectors from the index without rewriting it: append their ids
    * to a TOMBSTONE set that every query anti-joins (broadcast — the
    * tombstone set is ids only) BEFORE ranking, so a forgotten vector can
    * never appear in any top-k and its slot is filled by the next-best
    * survivor, exactly as if it had never been indexed. This is the
    * right-to-be-forgotten shape at 100 TB: the delete is O(|ids|) — no
    * touch of the inverted lists — and the space is reclaimed lazily by
    * [[compact]] (delete-fast / compact-later, the standard LSM posture).
    *
    * Forgotten ids stay excluded until [[compact]]; re-adding a forgotten
    * id via [[append]] requires compacting first (documented contract —
    * the tombstone would otherwise keep suppressing it). */
  def forget(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "vec_id"): Unit =
    IndexLock.withLock(spark, dir) {
      ids.select(col(idCol).cast("long").as("vec_id")).distinct()
        .write.mode("append").parquet(s"$dir/tombstones")
    }

  /** Rewrite ONLY the inverted lists that contain tombstoned vectors and
    * clear the tombstone set. Queries before and after compaction return
    * identical rows (CompactionSpec); compaction only reclaims space and
    * restores [[append]]-ability for forgotten ids.
    *
    * Partition-scoped (r13, VERDICT r12 #2): the affected lists come from
    * a column-pruned semi-join of the tombstone ids against the codes
    * (vec_id + the partition column — no pcodes bytes read); only those
    * lists' survivors are materialized (a bounded `localCheckpoint`, not
    * the whole index) and dynamically overwritten in place; lists whose
    * every vector was forgotten have their directories deleted. At 100 TB
    * one forgotten vector rewrites ONE list, not the index — compact cost
    * is proportional to the tombstoned-list share (measured at sf1 in
    * SCALING.md r13). Untouched list files stay byte-identical
    * (CompactionSpec asserts it).
    *
    * All-tombstoned edge: the empty marker is created BEFORE the data
    * directories are removed (readers give the marker precedence, so the
    * worst race exposure is a safe stale-empty view — never a window with
    * neither marker nor readable parquet; ADVICE r12 ordering fix). */
  def compact(spark: SparkSession, dir: String): Unit =
    IndexLock.withLock(spark, dir) {
      tombstones(spark, dir).foreach { tomb =>
        val t = broadcast(tomb)
        val codesPath = new org.apache.hadoop.fs.Path(s"$dir/codes")
        val f = fs(spark, codesPath)
        val vlRoot = new org.apache.hadoop.fs.Path(s"$dir/vlists")
        // sidecar discovery is trusted ONLY when the meta certifies the
        // sidecar covers the whole index (r15, ADVICE r14): an r14 append
        // onto a pre-r14 index leaves vlists/ holding only the appended
        // vectors — discovering from it would miss pre-existing tombstoned
        // ids, never rewrite their codes, and still clear the tombstones:
        // forgotten vectors would RESURRECT in query results
        val (vbWidth, vlComplete) = vlistsMeta(spark, dir)
        // candidate sidecar buckets — a pure function of the tombstoned ids
        val vb = tomb.select(vbucketOf(col("vec_id"), vbWidth).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val useSidecar = vlComplete && hasPartitions(spark, vlRoot, "vbucket=")
        val affected: Array[Long] =
          if (useSidecar) {
            // sidecar discovery (r14): read |ids|/vbuckets of the tiny
            // id→list store instead of two columns of the whole codes dir
            if (vb.isEmpty) Array.empty
            else spark.read.parquet(vlRoot.toString)
              .filter(col("vbucket").isin(vb: _*))
              .join(t, Seq("vec_id"), "left_semi")
              .select(col("centroid_id").cast("long")).distinct()
              .collect().map(_.getLong(0))
          } else if (!f.exists(codesPath)) Array.empty
          else readCodes(spark, dir) // sidecar absent or not known-complete
            .join(t, Seq("vec_id"), "left_semi")
            .select(col("centroid_id").cast("long")).distinct()
            .collect().map(_.getLong(0))
        if (affected.nonEmpty) {
          val survivors = readCodes(spark, dir)
            .filter(col("centroid_id").isin(affected.toSeq: _*))
            .join(t, Seq("vec_id"), "left_anti")
            .localCheckpoint(true) // affected lists only — bounded by the tombstoned share
          val surviving = survivors.select(col("centroid_id").cast("long")).distinct()
            .collect().map(_.getLong(0)).toSet
          val emptied = affected.filterNot(surviving)
          val allLists = f.listStatus(codesPath).map(_.getPath.getName)
            .filter(_.startsWith("centroid_id=")).toSet
          if (surviving.nonEmpty) {
            // dynamic partition overwrite: replaces exactly the partitions
            // present in the written data, leaves every other list file
            // untouched (byte-identical)
            survivors.repartition(col("centroid_id"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("centroid_id").parquet(s"$dir/codes")
          }
          val emptiedNames = emptied.map(cid => s"centroid_id=$cid").toSet
          val becomesEmpty = surviving.isEmpty && allLists.subsetOf(emptiedNames)
          if (becomesEmpty)
            fs(spark, emptyMarker(dir)).create(emptyMarker(dir), true).close()
          emptiedNames.foreach { name =>
            f.delete(new org.apache.hadoop.fs.Path(s"$dir/codes/$name"), true): Unit
          }
          if (becomesEmpty) f.delete(codesPath, true): Unit
        }
        // keep the sidecar in sync: drop the tombstoned ids from THEIR
        // vbuckets only (same partition-scoped shape as the codes rewrite;
        // skipped when the ids weren't in the index at all)
        if (affected.nonEmpty && vb.nonEmpty && hasPartitions(spark, vlRoot, "vbucket=")) {
          val vSurv = spark.read.parquet(vlRoot.toString)
            .filter(col("vbucket").isin(vb: _*))
            .join(t, Seq("vec_id"), "left_anti")
            .localCheckpoint(true)
          val survVb = vSurv.select(col("vbucket").cast("int")).distinct()
            .collect().map(_.getInt(0)).toSet
          if (survVb.nonEmpty)
            vSurv.repartition(col("vbucket"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("vbucket").parquet(vlRoot.toString)
          val vf = fs(spark, vlRoot)
          vb.filterNot(survVb).foreach(b =>
            vf.delete(new org.apache.hadoop.fs.Path(s"$dir/vlists/vbucket=$b"), true): Unit)
        }
        val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
        fs(spark, p).delete(p, true): Unit
      }
    }

  private def clearTombstones(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    fs(spark, p).delete(p, true): Unit
  }

  /** The tombstone id set, if any forgets happened since the last
    * [[compact]] — None on the common path, so untombstoned indexes pay
    * nothing (not even a parquet footer read).
    *
    * Read LOCK-FREE by the query paths, deliberately: queries must not
    * block on writers. The exposure is bounded and MONOTONE — a read
    * concurrent with an in-flight [[forget]] can observe a prefix of the
    * new tombstones (some ids already excluded, the rest excluded on the
    * next read), never a resurrection; [[compact]] mutates codes only
    * under the lock and only after materializing the affected lists' survivors, and clears
    * tombstones last, so a lock-free reader racing a compact sees either
    * (old codes + tombstones) or (new codes + tombstones) or (new codes,
    * none) — all three return the same survivor rows. */
  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Some(spark.read.parquet(p.toString)) else None
  }

  /** Query the stored index: probe `nprobe` lists per query, ADC-score the
    * survivors from the stored codes, rank top-k. The probed list ids are
    * collected (≤ |queries|·nprobe longs) and pushed as a LITERAL partition
    * filter, so the codes scan statically prunes to the probed
    * directories. Output schema and values match
    * [[ProductQuantization.ivfPqTopK]] exactly. */
  def query(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
            nprobe: Int = 6, m: Int = 32, subDim: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ProductQuantization.rankPacked(
      adcJoined(spark, dir, queries, nprobe, m, subDim, idCol, vecCol), m, k)

  /** Two-stage serving: ADC ranks the probed lists, the top `depth`
    * survivors per query are re-scored by EXACT cosine against their raw
    * vectors, and the final top-k is ranked on the exact score.
    *
    * This is the production answer to the measured ADC plateau (SCALING.md
    * recall curve: ADC saturates where codebook quantization error exceeds
    * neighbor gaps): the quantized scan still prunes the corpus to
    * ~nprobe/L, but the ranking the user sees is exact over a
    * |queries|·depth candidate set. At 100 TB the rescore leg is a
    * broadcast of the (tiny) candidate ids against the raw-vector table —
    * a static semi-join fetch of `depth` rows per query, NOT a corpus
    * scan; cost scales with depth, not corpus size. Output:
    * (query_id, rank, vec_id, cos) — same shape as the exact operators. */
  def queryRescored(spark: SparkSession, dir: String, queries: DataFrame,
                    corpus: DataFrame, k: Int, depth: Int = 20,
                    nprobe: Int = 6, m: Int = 32, subDim: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = ProductQuantization.rankPacked(
        adcJoined(spark, dir, queries, nprobe, m, subDim, idCol, vecCol), m, depth)
      .select(col("query_id"), col("vec_id"))
    val c = Similarity.withNorm(corpus, idCol, vecCol, "vec_id", "v", "nv")
    val q = Similarity.withNorm(queries, idCol, vecCol, "query_id", "qv", "nqv")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(cand), "vec_id") // candidate ids broadcast: pruned fetch, no corpus shuffle
      .join(broadcast(q), "query_id")
      .withColumn("cos", round(Similarity.cosPre(col("qv"), col("v"), col("nqv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Shared probe + ADC-score leg of [[query]]/[[queryRescored]]: probe
    * `nprobe` lists per query (literal partition filter on the codes scan),
    * join stored codes to the query distance tables. */
  private def adcJoined(spark: SparkSession, dir: String, queries: DataFrame,
                        nprobe: Int, m: Int, subDim: Int,
                        idCol: String, vecCol: String): DataFrame = {
    checkMeta(spark, dir, m, subDim)
    GraftFunctions.register(spark)
    val cent = broadcast(spark.read.parquet(s"$dir/coarse")
      .select(col("cid").as("centroid_id"), col("m").as("cm"), col("nm").as("cnm")))
    val q = queries.select(col(idCol).as("query_id"),
      Clustering.quantize(col(vecCol)).as("qi"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    val probes = q
      .select(col("query_id"), transform(col("qi"), _.cast("double")).as("qd"))
      .withColumn("nqd", GraftFunctions.arrayDot(col("qd"), col("qd")))
      .crossJoin(cent)
      .withColumn("ccos", Similarity.coarseCos(col("qd"), col("cm"), col("nqd"), col("cnm")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    val probedLists = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val codes = readCodes(spark, dir)
      .filter(col("centroid_id").isin(probedLists: _*))
    // query-side subspace distance tables vs the stored codebooks — the
    // query stays exact (asymmetric), same construction as the one-shot op
    val books = broadcast(spark.read.parquet(s"$dir/codebooks"))
    val qsubs = q
      .select(col("query_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("qi"))
      .select(col("query_id"), col("sub"),
        slice(col("qi"), col("sub") * subDim + 1, lit(subDim)).as("sqi"))
      .withColumn("sqd", transform(col("sqi"), _.cast("double")))
      .withColumn("nq", GraftFunctions.arrayDot(col("sqd"), col("sqd")))
    val dt = qsubs.join(books, "sub")
      .select(col("query_id"), col("sub"), col("cid"),
        (col("nq") + col("nm") - lit(2.0) * GraftFunctions.arrayDot(col("sqd"), col("m"))).as("d2"))
    // stored codes are packed (one pcodes row per vector); the per-query
    // tables broadcast packed too, so the scored stream is one row per
    // (query, candidate) — see [[ProductQuantization.rankPacked]].
    // Tombstoned vectors ([[forget]]) are anti-joined out of the candidate
    // stream BEFORE ranking, so ranks fill with survivors.
    val cand0 = probes.join(codes, "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
    val cand = tombstones(spark, dir)
      .fold(cand0)(t => cand0.join(broadcast(t), Seq("vec_id"), "left_anti"))
    cand.join(broadcast(ProductQuantization.packDt(dt, m)), "query_id")
  }
}
