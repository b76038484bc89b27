package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with scale-appropriate defaults.
  *
  * Designed for a real cluster (AQE on, sensible shuffle partitioning,
  * broadcast thresholds) while testable on local[N]. Local tests use 32
  * threads; on a 1000-executor cluster the same code relies on AQE to
  * coalesce/split shuffle partitions at runtime.
  */
object GraftSession {
  def builder(appName: String = "graft", master: Option[String] = None): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partition count must scale with DATA, not cores: at a fixed
    // 32, a 10x-larger input means 10x-larger partitions (spill + GC
    // churn — measured on the sf10 decade). The cluster-correct setting
    // is a high AQE *initial* partition number with coalescing on: small
    // shuffles coalesce down to ~advisoryPartitionSizeInBytes anyway, big
    // shuffles keep the parallelism. `spark.sql.shuffle.partitions`
    // stays = cores as the non-AQE floor; SPARK_GRAFT_SHUFFLE overrides
    // both for experiments.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val initial = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_INITIAL",
      math.max(shuffle.toInt, 8 * cpus.toInt).toString)
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shuffle)
      // SPARK_GRAFT_AQE=false is an experiment knob (per-round driver
      // overhead of iterative operators); production default stays on
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial)
      // AQE sizes post-shuffle coalescing on the shuffle's OWN bytes; a
      // pair-scan join whose input is small but whose OUTPUT explodes
      // quadratically (cid-blocked dedup, n-gram SSJoin) then runs in 1-2
      // tasks regardless of cores. Lowering the coalescing floor keeps
      // such stages parallel; large shuffles are untouched (they coalesce
      // on advisory size as before). Overridable for experiments.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // managed tables (TableStore.saveBucketed) land in a fixed tmp
      // warehouse, never the process cwd — mains run from anywhere
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
      // if a parquet source stores timestamp[ns], surface it as raw Long
      // nanos rather than failing the read; Tables.normalizeTs folds that
      // encoding (and timestamp[us]) into the canonical TIMESTAMP_NTZ
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.orElse(Some(s"local[$cpus]")).foreach(b.master)
    b
  }

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
