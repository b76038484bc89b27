package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("exactDedupStream keeps first row per fingerprint within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingOps.exactDedupStream(
      ms.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      ms.addData((ts(10, 0), 1L, "hello world"), (ts(10, 1), 2L, "HELLO   world"))
      q.processAllAvailable()
      ms.addData((ts(10, 2), 3L, "hello world"), (ts(10, 3), 4L, "different text"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_stream").collect().map(_.getLong(0)).toSet
      // doc 2 (case/whitespace dup) and doc 3 (exact dup) are dropped
      assert(ids == Set(1L, 4L))
    } finally q.stop()
  }

  test("budgetAdmission caps admitted token mass per group across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val admitted = StreamingOps.budgetAdmission(
      ms.toDF().toDF("src", "ntok"), "src", "ntok",
      Map("a" -> 100L, "b" -> 10L))
    val q = admitted.writeStream.outputMode("append").format("memory")
      .queryName("budget_stream").start()
    try {
      // batch 1: a consumes 60 of 100; b's 20 doesn't fit its 10 budget
      ms.addData(("a", 60L), ("b", 20L))
      q.processAllAvailable()
      // batch 2, ascending intra-batch order (10, 20, 30): 10 fits (70),
      // 20 fits (90), 30 would cross (120 > 100) -> dropped;
      // b 10 fits exactly; unknown source has budget 0 -> dropped
      ms.addData(("a", 30L), ("a", 20L), ("a", 10L), ("b", 10L), ("zz", 1L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT src, ntok FROM budget_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val aRows = rows.collect { case ("a", n) => n }
      assert(aRows.sum == 90L && aRows.sorted.toSeq == Seq(10L, 20L, 60L), s"a admitted $aRows")
      assert(rows.collect { case ("b", n) => n }.toSeq == Seq(10L))
      assert(!rows.exists(_._1 == "zz"))
    } finally q.stop()
  }

  test("sessionize emits one closed session per gap-separated burst") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val sessions = StreamingOps.sessionize(
      ms.toDF().toDF("ts", "user"), "ts", "user", "30 minutes", "0 seconds")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("session_stream").start()
    try {
      // burst 1: 10:00-10:10 (3 events); burst 2: 12:00 (1 event)
      ms.addData((ts(10, 0), "u1"), (ts(10, 5), "u1"), (ts(10, 10), "u1"))
      q.processAllAvailable()
      ms.addData((ts(12, 0), "u1"))
      q.processAllAvailable()
      // advance watermark far enough to close the 12:00 session too
      ms.addData((ts(15, 0), "u2"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user, n_events FROM session_stream WHERE user = 'u1' ORDER BY session_start")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("u1", 3L), ("u1", 1L)))
    } finally q.stop()
  }

  test("file-source readStream: parquet drops flow through a transform to a sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, "hello world"), (2L, "quick brown fox")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("file_stream").start()
    try {
      q.processAllAvailable()
      // a later file drop is picked up incrementally
      Seq((3L, "one two three four")).toDF("doc_id", "text")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n FROM file_stream ORDER BY doc_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(1L -> 2, 2L -> 3, 3L -> 4))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("intervalJoin pairs right rows within the lookback window, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, String, Long)]
    val purchases = MemoryStream[(Timestamp, String, Long)]
    val joined = StreamingOps.intervalJoin(
      purchases.toDF().toDF("pts", "user", "order_id"),
      views.toDF().toDF("vts", "vuser", "view_id"),
      "user", "vuser", "pts", "vts",
      lookback = "1 HOUR", watermarkDelay = "10 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("interval_join").start()
    try {
      views.addData((ts(9, 30), "u1", 100L), (ts(8, 0), "u1", 101L), (ts(9, 45), "u2", 102L))
      purchases.addData((ts(10, 0), "u1", 1L))
      q.processAllAvailable()
      val got = spark.sql("SELECT order_id, view_id FROM interval_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // view 100 is within [9:00, 10:00]; 101 is too old; 102 is another user
      assert(got == Set((1L, 100L)))
    } finally q.stop()
  }

  test("NB model trained batch-side scores a document stream via stream-static join") {
    import graft.functions.{ClassifierOps, TextFunctions}
    implicit val sqlCtx = spark.sqlContext
    // train on a static seed corpus
    val staticOcc = Seq(0L -> "good great fine", 1L -> "bad awful dire")
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("word"))
    val seed = Seq((0L, true), (1L, false)).toDF("doc_id", "y")
    val (model, unseen, prior) =
      ClassifierOps.naiveBayesModel(staticOcc, "doc_id", "word", seed, "y", 0.5)
    // score documents as they arrive
    val ms = MemoryStream[(Long, String)]
    val streamOcc = ms.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("word"))
    val scored = ClassifierOps.scoreWithModel(streamOcc, "doc_id", "word", model, unseen, prior)
    val q = scored.writeStream.outputMode("complete").format("memory")
      .queryName("nb_stream").start()
    try {
      ms.addData((10L, "good fine"), (11L, "awful bad bad"))
      q.processAllAvailable()
      ms.addData((12L, "unseen words only"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, log_odds FROM nb_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == Set(10L, 11L, 12L))
      assert(got(10L) > 0 && got(11L) < 0) // seed-aligned polarity survives the stream
      // all-unseen doc scores 3 fallback terms + prior, same as batch math
      assert(math.abs(got(12L) - (3 * unseen + prior)) < 1e-9)
    } finally q.stop()
  }
}
