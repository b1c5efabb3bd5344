package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Seventh wave of the query surface (round 17): the LIFECYCLE /
  * serving closures — the graph-ANN on-disk index probe, the Platt
  * re-audited reliability table, incremental containment, and the
  * DSIR-selection flagship. Same oracle conventions as
  * [[QueryCatalog]]: identical aliases both sides, total ORDER BY,
  * integer outputs CAST to BIGINT in DuckDB, scores rounded 4 dp
  * before every ranking, NLL/ECE folds rounded 6 dp.
  */
object LifecycleQueries {
  import QueryCatalog.Q

  /** [[ServeQueries.annGraphSearch]] served from the PERSISTED
    * adjacency ([[graft.ops.NnDescent.writeGraphIndex]] →
    * [[graft.ops.NnDescent.searchGraphIndexed]]): build the same k-NN
    * graph, write the node-id-bucketed undirected layout, then answer
    * the 5 standing query vectors from the store — each hop's scan
    * pruned to the frontier's buckets. Indexed ≡ inline is the family
    * contract (cf. `text_bm25_indexed`), so the oracle is byte-for-byte
    * [[ServeQueries.annGraphSearchSql]] — the same hop-by-hop replay. */
  val annGraphSearchIndexed: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = graft.ops.NnDescent.knnGraph(corpus, k = 5, iters = 2,
      sample = 10, seed = "nnd")
    val path = graft.Staging.dirFor("graph-serving-index")
    graft.ops.NnDescent.writeGraphIndex(g, path)
    graft.ops.NnDescent.searchGraphIndexed(s, path, corpus, queries,
        k = ServeQueries.SearchK, entries = ServeQueries.SearchEntries,
        beam = ServeQueries.SearchBeam, hops = ServeQueries.SearchHops,
        seed = "nnd")
      .orderBy(col("qid"), col("rank"))
  }

  val annGraphSearchIndexedSql: String = ServeQueries.annGraphSearchSql

  /** The re-audited reliability table under the fitted PLATT (A, B)
    * ([[graft.ops.TextAnalysis.classifierCalibrationPlattFitted]]) —
    * `text_calibration_fitted`'s two-parameter twin, closing the
    * calibration family's fit→audit symmetry. The oracle replays the
    * scoring, the 4-dp histogram, all 6 191 grid NLLs, the argmin, and
    * the table binned under the fitted sigmoid. */
  val textCalibrationPlattFitted: Q = (s, dir) => {
    val docs = s.read.parquet(
      s"${graft.Tables.fixturesDir}/labeled_quality.parquet")
    graft.ops.TextAnalysis.classifierCalibrationPlattFitted(docs, "doc_id",
      "text", "label", graft.ops.TextAnalysis.trainedWeightArray(s), bins = 10)
  }

  val textCalibrationPlattFittedSql: String =
    s"""WITH ${ServeQueries.calibrationFitCtes},
       |${ServeQueries.plattFitCtes}
       |SELECT CAST(least(floor(conf * 10.0), 9.0) AS INT) AS bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  round(avg(conf), 4) AS avg_conf,
       |  round(avg(CAST(label AS DOUBLE)), 4) AS frac_pos
       |FROM (SELECT label, 1.0 / (1.0 + exp(-(
       |    (SELECT a FROM pfit) * score + (SELECT b FROM pfit)))) AS conf
       |  FROM sc)
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  val all: Map[String, Q] = Map(
    "ann_graph_search_indexed" -> annGraphSearchIndexed,
    "text_calibration_platt_fitted" -> textCalibrationPlattFitted)

  val oracles: Map[String, String] = Map(
    "ann_graph_search_indexed" -> annGraphSearchIndexedSql,
    "text_calibration_platt_fitted" -> textCalibrationPlattFittedSql)
}
