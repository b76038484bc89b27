package graft.functions

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** PLAN-SHAPE gate for ANN SERVING FROM PERSISTED STATE (the q251 path):
  * the claim "at query time the stores are read in place — the vector
  * store's embedding payload never crosses an Exchange, and the graph
  * store's merge-on-read live view resolves bucket-locally" as a FAILING
  * ASSERTION ([[Bm25PlanSpec]]'s discipline applied to the ANN stores).
  * At 100 TB a reintroduced store shuffle is a corpus-sized exchange on
  * every query batch. */
class AnnServePlanSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case other => other
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = finalPlan(p)
    val kids = self match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self +: kids.flatMap(allNodes)
  }

  private def scansOf(p: SparkPlan, tbl: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case s: FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains(tbl)) => s
    }

  test("store-served routed beam: vector payload never shuffles; graph live view resolves bucket-locally") {
    val vtbl = "graft_ann_plan_vec"
    val ctbl = "graft_ann_plan_graph"
    Seq(vtbl, ctbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val rng = new scala.util.Random(7)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val cents = emb.where($"vec_id" < 4)
    val cells = emb.select($"vec_id",
      pmod(DedupOps.hash60(concat_ws(":", lit("cell"), $"vec_id")), lit(5L))
        .as("cid"))
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(emb, "vec_id", "embedding", cents, "vec_id"),
      vtbl, bucketCols = Seq("cid"), buckets = 4)
    TableStore.saveBucketed(
      SimilarityOps.nnDescent(emb, "vec_id", "embedding",
        SimilarityOps.cellSeedGraph(emb, cells, "vec_id", "embedding", k = 4),
        k = 4, iters = 1).withColumn("epoch", lit(0L)),
      ctbl, bucketCols = Seq("probe_id"), buckets = 4)
    try {
      val store = TableStore.loadTable(spark, vtbl)
      val graph = SimilarityOps.liveKnnGraph(TableStore.loadTable(spark, ctbl))
      val corpus = store.select("vec_id", "embedding")
      val probes = Seq((100L, Array.fill(8)(0.3f))).toDF("vec_id", "embedding")
      val entries = SimilarityOps.cellEntryNodes(store, probes, cents,
        "vec_id", "vec_id", "vec_id", "embedding")
      val served = SimilarityOps.beamSearchTopKFrom(corpus, probes, graph,
        entries, "vec_id", "vec_id", "embedding", k = 3, beam = 4, hops = 2)
      served.collect() // finalize the adaptive plan
      val plan = finalPlan(served.queryExecution.executedPlan)
      assert(scansOf(plan, vtbl).nonEmpty, s"vector-store scan missing:\n$plan")
      assert(scansOf(plan, ctbl).nonEmpty, s"graph-store scan missing:\n$plan")
      // 1. the embedding payload is read in place: no Exchange above the
      //    vector-store scan may still carry a raw vector column —
      //    candidates broadcast TO the store, vectors never move
      val vecShuffles = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, vtbl).nonEmpty &&
              e.output.exists(a => a.dataType.typeName.startsWith("array")) => e
      }
      assert(vecShuffles.isEmpty,
        s"vector payload shuffled (${vecShuffles.size} exchange(s)):\n$plan")
      // 2. the graph's merge-on-read live view (max-epoch window per
      //    probe bucket) resolves WITHOUT an exchange: no shuffle above
      //    the graph scan may still carry the store's epoch column
      val liveShuffles = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, ctbl).nonEmpty &&
              e.output.exists(_.name == "epoch") => e
      }
      assert(liveShuffles.isEmpty,
        s"graph live view shuffled pre-merge (${liveShuffles.size}):\n$plan")
    } finally {
      Seq(vtbl, ctbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t")): Unit
    }
  }

  test("store-only filtered serving (q262): every scan is a store table, predicate pushed, no vector shuffle") {
    val vtbl = "graft_ann_plan_svec"
    val ctbl = "graft_ann_plan_sgraph"
    Seq(vtbl, ctbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val rng = new scala.util.Random(23)
    val emb = (0L until 40L).map(i =>
        (i, Array.fill(8)(rng.nextFloat() * 2f - 1f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val cents = emb.where($"vec_id" < 4)
    val cells = emb.select($"vec_id",
      pmod(DedupOps.hash60(concat_ws(":", lit("cell"), $"vec_id")), lit(5L))
        .as("cid"))
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(emb, "vec_id", "embedding", cents, "vec_id",
        carryCols = Seq("label")),
      vtbl, bucketCols = Seq("cid"), buckets = 4)
    TableStore.saveBucketed(
      SimilarityOps.nnDescent(emb, "vec_id", "embedding",
        SimilarityOps.cellSeedGraph(emb, cells, "vec_id", "embedding", k = 4),
        k = 4, iters = 1).withColumn("epoch", lit(0L)),
      ctbl, bucketCols = Seq("probe_id"), buckets = 4)
    try {
      // the q262 read path: EVERYTHING from the two stores — graph from
      // the (here already-compacted) graph table, vectors + labels +
      // the allowed set from the carry-col vector store
      val store = TableStore.loadTable(spark, vtbl)
      val graph = SimilarityOps.liveKnnGraph(TableStore.loadTable(spark, ctbl))
      val corpus = store.select("vec_id", "embedding")
      val fview = store.where($"label".isin(1, 2))
      val probes = Seq((100L, Array.fill(8)(0.3f))).toDF("vec_id", "embedding")
      val entries = SimilarityOps.cellEntryNodes(fview, probes, cents,
        "vec_id", "vec_id", "vec_id", "embedding")
      val served = SimilarityOps.beamSearchTopKFilteredFrom(corpus, probes,
        graph, entries, fview.select("vec_id"), "vec_id", "vec_id",
        "embedding", k = 3, beam = 4, hops = 2)
      served.collect() // finalize the adaptive plan
      val plan = finalPlan(served.queryExecution.executedPlan)
      assert(scansOf(plan, vtbl).nonEmpty && scansOf(plan, ctbl).nonEmpty)
      // 1. NO scan outside the two store tables — the corpus frame is
      //    provably untouched at query time
      val foreign = allNodes(plan).collect {
        case s: FileSourceScanExec
            if !s.relation.location.inputFiles.exists(f =>
              f.contains(vtbl) || f.contains(ctbl)) => s
      }
      assert(foreign.isEmpty,
        s"non-store scan in the serving plan: ${foreign.mkString("\n")}")
      // 2. the allowed-set / entry-routing predicate reaches the
      //    carry-col scan as a pushed filter
      assert(scansOf(plan, vtbl)
          .exists(_.metadata.get("PushedFilters").exists(_.contains("label"))),
        s"label predicate not pushed:\n$plan")
      // 3. the embedding payload still never shuffles
      val vecShuffles = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, vtbl).nonEmpty &&
              e.output.exists(a => a.dataType.typeName.startsWith("array")) => e
      }
      assert(vecShuffles.isEmpty,
        s"vector payload shuffled (${vecShuffles.size}):\n$plan")
    } finally {
      Seq(vtbl, ctbl).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t")): Unit
    }
  }

  test("store-served MaxSim (q270): every scan is the token store; query tokens broadcast; token payload never shuffles") {
    val ttbl = "graft_ann_plan_tok"
    spark.sql(s"DROP TABLE IF EXISTS $ttbl")
    val rng = new scala.util.Random(31)
    // 8 docs × 5 token vectors; queries are 2 in-memory token bags
    val toks = (0L until 40L).map(i =>
        (i / 5L, i, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
      .toDF("doc_id", "vec_id", "embedding")
    val cents = toks.where($"vec_id" < 4)
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(toks, "vec_id", "embedding", cents, "vec_id",
        carryCols = Seq("doc_id")),
      ttbl, bucketCols = Seq("cid"), buckets = 4)
    try {
      val store = TableStore.loadTable(spark, ttbl)
      val probes = (0L until 6L).map(i =>
          (100L + i / 3L, 1000L + i, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
        .toDF("probe_id", "tok", "embedding")
      val hits = SimilarityOps.ivfSearchStore(store,
        probes.select($"tok".as("vec_id"), $"embedding"), cents,
        "vec_id", "vec_id", "vec_id", "embedding", k = 2,
        probeFraction = 0.5, minProbe = 1)
      val cand = hits
        .join(store.select($"vec_id".as("nbr_id"), $"doc_id"), Seq("nbr_id"))
        .join(probes.select($"tok".as("probe_id"), $"probe_id".as("__qd")),
          Seq("probe_id"))
        .select($"__qd".as("probe_id"), $"doc_id").distinct()
      val served = SimilarityOps.maxSimRerank(
        store.select("doc_id", "embedding"), probes, cand,
        "doc_id", "probe_id", "tok", "embedding", k = 3)
      served.collect() // finalize the adaptive plan
      val plan = finalPlan(served.queryExecution.executedPlan)
      assert(scansOf(plan, ttbl).nonEmpty, s"token-store scan missing:\n$plan")
      // 1. the only FILE scans are the token store — no corpus frame
      val foreign = allNodes(plan).collect {
        case s: FileSourceScanExec
            if !s.relation.location.inputFiles.exists(_.contains(ttbl)) => s
      }
      assert(foreign.isEmpty,
        s"non-store scan in the serving plan: ${foreign.mkString("\n")}")
      // 2. the token-vector payload never crosses an Exchange — the
      //    rerank's doc-keyed join broadcasts the candidate list TO the
      //    store and the query tokens ride a broadcast
      val vecShuffles = allNodes(plan).collect {
        case e: ShuffleExchangeExec
            if scansOf(e.child, ttbl).nonEmpty &&
              e.output.exists(a => a.dataType.typeName.startsWith("array")) => e
      }
      assert(vecShuffles.isEmpty,
        s"token payload shuffled (${vecShuffles.size}):\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $ttbl"): Unit
  }

  test("filtered MaxSim serving (q284): doc_label predicate pushed into every token-store scan; no corpus frame") {
    val ttbl = "graft_ann_plan_ftok"
    spark.sql(s"DROP TABLE IF EXISTS $ttbl")
    val rng = new scala.util.Random(43)
    val toks = (0L until 40L).map(i =>
        (i / 5L, i, Array.fill(8)(rng.nextFloat() * 2f - 1f), (i / 5L % 3).toInt))
      .toDF("doc_id", "vec_id", "embedding", "doc_label")
    val cents = toks.where($"vec_id" < 4)
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(toks, "vec_id", "embedding", cents, "vec_id",
        carryCols = Seq("doc_id", "doc_label")),
      ttbl, bucketCols = Seq("cid"), buckets = 4)
    try {
      val live = TableStore.loadTable(spark, ttbl).where($"doc_label" =!= 0)
      val probes = (0L until 6L).map(i =>
          (100L + i / 3L, 1000L + i, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
        .toDF("probe_id", "tok", "embedding")
      val hits = SimilarityOps.ivfSearchStore(live,
        probes.select($"tok".as("vec_id"), $"embedding"), cents,
        "vec_id", "vec_id", "vec_id", "embedding", k = 2,
        probeFraction = 0.5, minProbe = 1)
      val cand = hits
        .join(live.select($"vec_id".as("nbr_id"), $"doc_id"), Seq("nbr_id"))
        .join(probes.select($"tok".as("probe_id"), $"probe_id".as("__qd")),
          Seq("probe_id"))
        .select($"__qd".as("probe_id"), $"doc_id").distinct()
      val served = SimilarityOps.maxSimRerank(
        live.select("doc_id", "embedding"), probes, cand,
        "doc_id", "probe_id", "tok", "embedding", k = 3)
      served.collect() // finalize the adaptive plan
      val plan = finalPlan(served.queryExecution.executedPlan)
      val scans = scansOf(plan, ttbl)
      assert(scans.nonEmpty, s"token-store scan missing:\n$plan")
      // pre-filter semantics physically: the predicate reaches EVERY
      // store scan as a pushed filter — excluded docs' tokens are cut
      // map-side on both the stage-1 and rerank legs, never scored
      assert(scans.forall(_.metadata.get("PushedFilters").exists(_.contains("doc_label"))),
        s"doc_label not pushed to every store scan: " +
          s"${scans.map(_.metadata.get("PushedFilters")).mkString(", ")}\n$plan")
      val foreign = allNodes(plan).collect {
        case s: FileSourceScanExec
            if !s.relation.location.inputFiles.exists(_.contains(ttbl)) => s
      }
      assert(foreign.isEmpty,
        s"non-store scan in the filtered serving plan: ${foreign.mkString("\n")}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $ttbl"): Unit
  }

  test("filtered entry routing: the label predicate pushes into the carry-col store scan") {
    val vtbl = "graft_ann_plan_fvec"
    spark.sql(s"DROP TABLE IF EXISTS $vtbl")
    val rng = new scala.util.Random(11)
    val emb = (0L until 40L).map(i =>
        (i, Array.fill(8)(rng.nextFloat() * 2f - 1f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val cents = emb.where($"vec_id" < 4)
    TableStore.saveBucketed(
      SimilarityOps.ivfStore(emb, "vec_id", "embedding", cents, "vec_id",
        carryCols = Seq("label")),
      vtbl, bucketCols = Seq("cid"), buckets = 4)
    try {
      val store = TableStore.loadTable(spark, vtbl)
      val probes = Seq((100L, Array.fill(8)(0.3f))).toDF("vec_id", "embedding")
      // the q255 'fentry' shape: the predicate is applied to the STORE
      // VIEW before routing — it must reach the parquet scan as a pushed
      // filter (a map-side cut on the cid-bucketed layout), not survive
      // as a post-scan Filter over the full store
      val entries = SimilarityOps.cellEntryNodes(
        store.where($"label".isin(1, 2)), probes, cents,
        "vec_id", "vec_id", "vec_id", "embedding")
      entries.collect() // finalize the adaptive plan
      val plan = finalPlan(entries.queryExecution.executedPlan)
      val scans = scansOf(plan, vtbl)
      assert(scans.nonEmpty, s"store scan missing:\n$plan")
      assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("label"))),
        s"label predicate not pushed to the store scan: " +
          s"${scans.map(_.metadata.get("PushedFilters")).mkString(", ")}\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $vtbl"): Unit
  }
}
