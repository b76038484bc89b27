package graft

import graft.functions.{DedupOps, SimilarityOps, TextFunctions}
import graft.operators.{MixtureSample, TrainShuffle}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PER-STAGE decade attribution for the q245 pipeline (the round-14
  * verdict's open evidence item: the composed gate's second decade grew
  * 1.8× → 4.1× and the residue was unattributed). Runs the EXACT q245
  * dataflow with an eager checkpoint at every stage boundary and prints,
  * per stage, wall seconds plus the INPUT-VOLUME driver that stage's
  * cost should track:
  *
  *  - dedup detectors: candidate-pair counts (exact fp / 3-gram
  *    Jaccard / banded-SRP semantic) — pair volume is data-genuine dup
  *    density, the thing the ScaleUp fixture grows on purpose;
  *  - fusion closure: fused edge count, component count, max component
  *    size (the candidate super-linear suspect);
  *  - quality / decontam / mixture+pack: surviving row counts.
  *
  * A stage is VINDICATED when its wall growth tracks its input-volume
  * growth (not n²); the BASELINE.md round-15 table records the sweep.
  *
  * Usage: `PipelineProbe <sfDir> [reps=2]`.
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.getOrCreate("graft-pipeline-probe")
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window

    def timed[A](tag: String, rep: Int)(body: => (Long, String)): Unit = {
      val t0 = System.nanoTime()
      val (vol, note) = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pipeline-probe] $sfDir rep$rep $tag%-12s $secs%8.2f s  $note ($vol)")
    }
    def ck(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val docs = Tables.load(spark, sfDir, "documents")
    for (r <- 1 to reps) {
      val corp = ck(docs
        .where(pmod(col("doc_id"), lit(97)) =!= 3 && length(trim(col("text"))) > 0))
      var norm: DataFrame = null
      var epairs: DataFrame = null
      var jpairs: DataFrame = null
      var spairs: DataFrame = null
      var labels: DataFrame = null
      var flagged: DataFrame = null
      var q: DataFrame = null
      var hits: DataFrame = null
      timed("prep", r) {
        norm = ck(corp.select(col("doc_id"), col("source"),
            TextFunctions.normalizeText(col("text")).as("nt"))
          .withColumn("fp", md5(col("nt").cast("binary"))))
        (norm.count(), "norm rows")
      }
      timed("exact-pairs", r) {
        val first = norm.groupBy("fp").agg(min("doc_id").as("keep_id"))
        epairs = ck(norm.join(first, Seq("fp"))
          .where(col("doc_id") =!= col("keep_id"))
          .select(col("keep_id").as("id_a"), col("doc_id").as("id_b")))
        (epairs.count(), "exact fp pairs")
      }
      timed("jaccard", r) {
        jpairs = ck(DedupOps.ngramJaccardPairs(corp, "text", "doc_id",
          n = 3, threshold = 0.3, maxDocFreq = 1000).select("id_a", "id_b"))
        (jpairs.count(), "3-gram Jaccard pairs")
      }
      timed("semantic", r) {
        val embAll = Tables.load(spark, sfDir, "embeddings")
          .select("vec_id", "embedding")
        val emb = embAll.join(corp.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_semi")
        spairs = ck(SimilarityOps.embeddingDupPairs(emb, "vec_id",
          "embedding", threshold = 0.95).select("id_a", "id_b"))
        (spairs.count(), "banded-SRP semantic pairs")
      }
      var fusedEdges = 0L
      timed("cc-closure", r) {
        val fused = epairs.unionByName(jpairs).unionByName(spairs).distinct()
        fusedEdges = fused.count()
        labels = ck(graft.functions.GraphOps
          .connectedComponents(fused, "id_a", "id_b"))
        val comp = labels.groupBy("component").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("nc"), max("sz").as("mx")).head()
        (fusedEdges, s"fused edges; ${comp.getLong(0)} components, " +
          s"max size ${comp.getLong(1)}")
      }
      timed("quality", r) {
        val dupIds = labels.where(col("component") =!= col("id"))
          .select(col("id").as("doc_id")).withColumn("__isdup", lit(true))
        flagged = ck(norm.join(dupIds, Seq("doc_id"), "left")
          .withColumn("is_dup", coalesce(col("__isdup"), lit(false))))
        val g = flagged.where(!col("is_dup"))
          .select(col("doc_id"), col("source"), col("nt"),
            TextFunctions.gopherQuality(col("nt"), minWords = 30,
              minStopwords = 1).as("g"),
            TextFunctions.tokenCount(col("nt")).cast("long").as("tok"))
        val rz = graft.functions.ProfileOps
          .robustZ(g.select("doc_id", "source", "tok"), "source", "tok", "doc_id")
          .select(col("doc_id"), col("z_milli"))
        q = ck(g.join(rz, Seq("doc_id"))
          .withColumn("q_keep",
            col("g.keep") === 1 && abs(col("z_milli")) <= 3000))
        (q.where(col("q_keep")).count(), "quality survivors")
      }
      timed("decontam", r) {
        val qkept = q.where(col("q_keep"))
        val probes = docs.where(pmod(col("doc_id"), lit(97)) === 3)
          .select(explode(DedupOps.shingles(col("text"), 3)).as("probe"))
        hits = ck(TextFunctions.contaminationHits(
            qkept.select(col("doc_id"), col("nt")), "nt", "doc_id",
            probes, "probe", n = 3).select("doc_id"))
        (hits.count(), "contaminated docs")
      }
      timed("mix-pack", r) {
        val clean = q.where(col("q_keep"))
          .join(hits, Seq("doc_id"), "left_anti")
        val kept = clean.select(col("doc_id"), col("source"),
            col("tok").as("ntok"))
          .withColumn("prio", TrainShuffle.lcgPrio(col("doc_id"), 54321L))
          .localCheckpoint(false)
        val budgets = MixtureSample
          .temperatureWeights(kept, "source", "ntok", targetTokens = 500000L)
          .select(col("source"),
            round(col("q") * 500000).cast("long").as("budget"))
        val cut = MixtureSample.tokenBudgetSample(kept, "source", "ntok",
          "prio", budgets, "source", "budget")
        val picked = cut.where(col("picked"))
          .withColumn("shard", TrainShuffle.rendezvousShard(col("doc_id"), 4))
        (picked.groupBy("source", "shard").count().count(), "source×shard cells")
      }
      // release the rep's checkpoints so rep 2 starts clean
      Seq(corp, norm, epairs, jpairs, spairs, labels, flagged, q, hits)
        .foreach(graft.functions.GraphOps.releaseLocalCheckpoint)
    }
    spark.stop()
  }
}
