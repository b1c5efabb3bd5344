package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * partitions the corpus into cells; queries probe only the `nProbe`
  * nearest cells and re-rank exactly inside them.
  *
  * The quantizer is deterministic k-means (seeded sample init + a fixed
  * number of Lloyd iterations, all computed distributed; only the k×dim
  * centroid matrix ever reaches the driver). At warehouse scale the
  * cell assignment is computed at ingest and the corpus stored
  * partitioned by cell, so a probe is partition pruning + a small scan;
  * here assignment is inline.
  */
object IvfIndex {

  /** Unit-normalize centroid rows once on the driver: the dot against a
    * unit row gives the same ORDER over cells as the full cosine (the
    * 1/‖vec‖ factor is constant per row), so neither scan-side division
    * nor per-centroid norms are needed. Zero rows pass through as-is
    * (dot 0 against everything, matching the old guarded division). */
  private[graft] def unitRows(centroids: Array[Array[Double]]): Array[Array[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c.clone() else c.map(_ / n)
    }

  /** Index of the best (max-cosine) centroid for a vector column.
    *
    * Centroids-as-DATA (round-10 directive #3): ONE
    * [[graft.functions.BestCellExpr]] carrying the k×dim matrix as a
    * JVM reference — generated code is a fixed nested loop, O(1) in k,
    * so a production k ≈ 10⁴ quantizer stays inside whole-stage codegen
    * (the old k-literal unrolling hit the JVM 64 KB method cap;
    * CentroidExprsSpec pins k=256 with codegen present). Beyond k ≈ 10⁴
    * (matrix tens of MB, too fat to ride the serialized plan per task
    * binary) the right formulation changes to a broadcast centroid
    * RELATION + join — FAISS's coarse-quantizer-as-data line —
    * implemented in [[QuantizerRelation]] and selected automatically by
    * [[assignCells]]. */
  def bestCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "empty centroid matrix")
    graft.functions.functions.best_cell(vec, unitRows(centroids))
  }

  /** Cell assignment with the form chosen by k: below
    * [[QuantizerRelation.CutoverCells]] the zero-exchange
    * [[bestCell]] expression (matrix on the plan, argmax in codegen);
    * at or above it, the [[QuantizerRelation.assignCells]] broadcast
    * join (matrix rides a `BroadcastExchange` once, wire cost one row
    * per doc). Both forms are semantics-identical — ties, degenerate
    * vectors, null vectors — pinned at k=1024 in
    * QuantizerRelationSpec. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], outCol: String = "cell",
      cutoverCells: Int = QuantizerRelation.CutoverCells): DataFrame =
    if (centroids.length < cutoverCells)
      df.withColumn(outCol, bestCell(col(vecCol), centroids))
    else
      QuantizerRelation.assignCells(df, idCol, vecCol,
        QuantizerRelation.centroidsDf(df.sparkSession, unitRows(centroids)),
        outCol)

  /** The `nProbe` best cells for a query vector, as an array column
    * (ascending (score, index) order — the `array_sort` tail contract
    * of the literal formulation this replaces). */
  def probeCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    require(centroids.nonEmpty, "empty centroid matrix")
    graft.functions.functions.probe_cells(vec, unitRows(centroids), nProbe)
  }

  /** Train a deterministic coarse quantizer: evenly-spaced seed vectors
    * (by id order) then `iters` Lloyd iterations executed as Spark
    * aggregations (posexplode → per-(cell,dim) mean). Returns k×dim
    * centroids.
    *
    * Two implementations behind one signature, chosen by k like
    * [[assignCells]]: below the cutover the per-iteration means (≤
    * k×dim doubles) collect to the driver between iterations — fewer
    * Spark jobs, fine while k is small; at or above it the loop runs
    * fully relationally ([[QuantizerRelation.train]] — per-iteration
    * state is a k-row DataFrame, assignment is the broadcast join) and
    * only the FINISHED matrix is collected once, so training scales
    * with k the same way assignment does.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2,
      cutoverCells: Int = QuantizerRelation.CutoverCells,
      seed: String = "km"): Array[Array[Double]] = {
    if (k >= cutoverCells)
      return QuantizerRelation.collectCentroids(
        QuantizerRelation.train(corpus, idCol, vecCol, k, iters, seed))
    // Deterministic pseudo-random seed sample: order by a hash of the id
    // (id tiebreak) and take k — a top-k, not a global sort. Seeding
    // MUST NOT assume anything about id layout: the previous
    // `id mod (n/k) == 0` scheme silently selected ZERO rows on sparse
    // shifted ids (sf1 replicas live at c×1e8 + base, and no id in the
    // corpus was divisible by the step), killing training while the
    // bench misread the instant failure as a fast run.
    var centroids: Array[Array[Double]] = corpus
      .orderBy(QuantizerRelation.seedHash(col(idCol), seed), col(idCol))
      .limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.nonEmpty, "empty corpus")
    (1 to iters).foreach { _ =>
      val assigned = corpus.select(col(vecCol).as("v"),
        bestCell(col(vecCol), centroids).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(round(avg(col("x").cast("double")),
          QuantizerRelation.MeanScale).as("m"))
        .groupBy("cell").agg(map_from_arrays(
          collect_list(col("pos")), collect_list(col("m"))).as("byPos"))
        .collect()
      means.foreach { r =>
        val cell = r.getInt(0)
        val byPos = r.getMap[Int, Double](1)
        centroids(cell) = (0 until centroids(cell).length)
          .map(i => byPos.getOrElse(i, centroids(cell)(i))).toArray
      }
    }
    centroids
  }

  /** IVF top-k: assign corpus to cells, probe `nProbe` cells per query,
    * exact cosine re-rank inside the probed cells. */
  def topK(queries: DataFrame, corpus: DataFrame, centroids: Array[Array[Double]],
      k: Int, nProbe: Int): DataFrame = {
    val cb = corpus.withColumn("cell", bestCell(col("vec"), centroids))
    val qb = queries.withColumn("cell",
      explode(probeCells(col("qvec"), centroids, nProbe)))
    probeJoin(cb, qb, k)
  }

  private def probeJoin(cb: DataFrame, qb: DataFrame, k: Int): DataFrame = {
    // Two-phase rank (Similarity.rankPerQuery): the qid-only window
    // never sees the full scored candidate set — phase 1 prunes inside
    // (qid, salt-bucket) first, so the final sort is over ≤ salt×k rows
    // per query instead of every scored row of every probed cell.
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .withColumn("score", Similarity.cosine(col("qvec"), col("vec")))
    Similarity.rankPerQuery(scored, col("score"), k)
      .select(col("qid"), col("id"), col("score"), col("rank"))
  }

  /** Ingest-time half of the IVF design: store the corpus parquet-
    * partitioned by cell, so probes become partition pruning instead of
    * a full scan. Cell assignment is computed once, at write time —
    * and this is the corpus-sized side where the large-k cutover
    * matters most, so assignment routes through [[assignCells]] (the
    * expression below the cutover, the broadcast relation above it;
    * identical cells either way, so the layout is cutover-invariant —
    * IvfIndexSpec pins it). Input contract: (id, vec) columns, `id`
    * unique. */
  def writeIndexed(corpus: DataFrame, centroids: Array[Array[Double]],
      path: String,
      cutoverCells: Int = QuantizerRelation.CutoverCells): Unit =
    // cluster by cell before the partitioned write: without it every
    // write task emits one file per cell it happens to hold, and at
    // large k the file count explodes multiplicatively (task × cell —
    // measured 4× wall on the k=10⁴ join form, ProfileCutover);
    // clustered, each cell's rows land in one task → one file per
    // non-empty cell, which is also the layout probes want to prune
    assignCells(corpus, "id", "vec", centroids, cutoverCells = cutoverCells)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe a [[writeIndexed]] corpus: the probed cell ids (at most
    * queries × nProbe ints — queries are small by contract) are
    * collected and pushed as a literal partition filter, so the scan
    * touches ONLY the probed cells' directories (IvfIndexSpec gates
    * `PartitionFilters` in the plan and result-equality with the inline
    * [[topK]]). This is the 100 TB probe path: cost scales with the
    * probed fraction of the corpus, never the corpus.
    */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, centroids: Array[Array[Double]],
      k: Int, nProbe: Int): DataFrame = {
    val qb = queries.withColumn("cell",
      explode(probeCells(col("qvec"), centroids, nProbe)))
    val probed = qb.select("cell").distinct().collect().map(_.getInt(0))
    val cb = spark.read.parquet(path)
      .filter(col("cell").isin(probed.map(Integer.valueOf).toIndexedSeq: _*))
    probeJoin(cb, qb, k)
  }

  /** METADATA-FILTERED probe of a [[writeIndexed]] corpus — the
    * "filtered vector search" every production retrieval system needs
    * (only rows matching a relational predicate may rank). This is the
    * PRE-filter formulation: the predicate is applied to the indexed
    * scan itself, so BOTH prunings compose in one FileScan — the probed
    * cells as `PartitionFilters` (directory pruning) and the metadata
    * predicate as `PushedFilters` (row-group stats pruning on the
    * non-vector column). Scoring touches only rows that survive both,
    * so a 1%-selective predicate cuts the scored set 100× BEFORE any
    * distance math; a post-filter would score everything and then
    * starve top-k of qualified rows. Exact within the probed cells
    * (exhaustive probe ⇒ exactly brute-force-over-filtered —
    * `ann_filtered`'s oracle; plan shape gated in IvfIndexSpec). */
  def topKIndexedFiltered(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, centroids: Array[Array[Double]],
      k: Int, nProbe: Int, predicate: Column): DataFrame = {
    val qb = queries.withColumn("cell",
      explode(probeCells(col("qvec"), centroids, nProbe)))
    val probed = qb.select("cell").distinct().collect().map(_.getInt(0))
    val cb = spark.read.parquet(path)
      .filter(col("cell").isin(probed.map(Integer.valueOf).toIndexedSeq: _*))
      .filter(predicate)
    probeJoin(cb, qb, k)
  }
}
