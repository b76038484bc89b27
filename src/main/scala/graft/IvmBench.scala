package graft

import graft.config.PipelineConfig
import graft.operators.IncrementalGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ingestion-path microbench: the per-edit cost of the eager IVM cascade
  * (source → aggregation), row-at-a-time vs batched. Prints one JSON line.
  *
  * Row-at-a-time IVM on Spark pays the fixed job-scheduling floor per
  * edit — the reference's single-row B-tree path will beat it on latency.
  * The design point is the other axis: one insert() call with a 10k-row
  * DataFrame runs the SAME cascade once, so per-row cost amortizes by the
  * batch factor. This bench documents both numbers honestly.
  */
object IvmBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-ivm-bench")
    val yaml =
      """tables:
        |  - name: grades
        |    kind: source
        |    columns: {name: Str, grade: Integer}
        |  - name: agg
        |    kind: aggregation
        |    source_table: grades
        |    aggregated_column: name
        |    functions: ["count ~ memo.count + 1", "sum ~ memo.sum + grade"]
        |""".stripMargin
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("grade", LongType)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warmup + measure single-row edits
    val g1 = new IncrementalGraph(spark, PipelineConfig.fromYaml(yaml))
    (1 to 3).foreach(i => g1.insert("grades", df(Seq(Row(s"w$i", 1L)))))
    val nSingle = 20
    val tSingle = timed {
      (1 to nSingle).foreach(i => g1.insert("grades", df(Seq(Row(s"u${i % 5}", i.toLong)))))
    }

    // one batched edit with the same total row count × 500
    val g2 = new IncrementalGraph(spark, PipelineConfig.fromYaml(yaml))
    g2.insert("grades", df(Seq(Row("w", 1L)))) // warm
    val nBatch = 10000
    val batchRows = (1 to nBatch).map(i => Row(s"u${i % 50}", i.toLong))
    val tBatch = timed { g2.insert("grades", df(batchRows)) }

    println(s"""{"metric":"ivm","single_edit_ms":${(tSingle / nSingle * 1000).round},""" +
      s""""batch_rows":$nBatch,"batch_total_s":${math.round(tBatch * 100) / 100.0},""" +
      s""""batch_per_row_us":${(tBatch / nBatch * 1e6).round}}""")
    spark.stop()
  }
}
