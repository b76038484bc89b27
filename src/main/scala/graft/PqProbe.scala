package graft
import org.apache.spark.sql.functions._
/** Scratch decade diagnostic: worst ADC rank of a true exact-L2 top-10
  * member per probe — the number pqRerankTopK's candidate cut must cover. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.getOrCreate("pq-probe")
    s.sparkContext.setLogLevel("WARN")
    val dir = args(0); val m = args(1).toInt
    graft.expr.GraftFunctions.register(s)
    val emb = s.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val init = emb.where(col("vec_id") < 16)
    val cb = graft.functions.PqOps.pqCodebook(emb, "vec_id", "embedding", init, "vec_id", m = m, dim = 64, lloydRounds = 1)
    val codes = graft.functions.PqOps.pqEncode(emb, "vec_id", "embedding", cb, m, 64)
    val probes = emb.where(col("vec_id") < 5)
    val n = emb.count().toInt
    val adc = graft.functions.PqOps.pqTopK(codes, probes, "vec_id", "embedding", cb, m, 64, k = n, corpusIdCol = "vec_id")
    def vd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = call_function("vec_dot", a, b)
    val c = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("__cv"))
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("__pv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id").orderBy(col("__d").asc, col("nbr_id").asc)
    val exact = c.crossJoin(broadcast(p)).where(col("nbr_id") =!= col("probe_id"))
      .withColumn("__d", vd(col("__cv"), col("__cv")) - lit(2.0) * vd(col("__cv"), col("__pv")) + vd(col("__pv"), col("__pv")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 10)
      .select(col("probe_id"), col("nbr_id"))
    exact.join(adc, Seq("probe_id", "nbr_id"))
      .groupBy("probe_id").agg(max("rank").as("max_adc_rank"), count(lit(1)).as("found"))
      .orderBy("probe_id").show()
    println(s"[pq-probe] n=$n")
    s.stop()
  }
}
