package graft.net

import graft.GraftSession
import graft.config.PipelineConfig
import graft.operators.IncrementalGraph

/** Runnable server — the analog of the reference's `cargo run <port>
  * <config.yaml>` entry point (reference: reactive_db/src/main.rs,
  * server.rs:9-50): parse the pipeline config, build the eager incremental
  * graph, serve the tagged-JSON TCP protocol until killed. Reference
  * clients (reactivedb_rust_client, reactive_db_python_client) connect
  * unchanged.
  *
  * Usage: runMain graft.net.ServeMain [port] [configPath]
  * Defaults: port 1108 (the reference examples' port), config
  * `graft_cfg.yaml` in the working directory. Action tables require their
  * actions registered in [[graft.operators.ActionRegistry]] before
  * construction — embed this main in your own object to register them.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = if (args.length > 0) args(0).toInt else 1108
    val cfgPath = if (args.length > 1) args(1) else "graft_cfg.yaml"
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfgPath)), java.nio.charset.StandardCharsets.UTF_8)
    val spark = GraftSession.getOrCreate("graft-serve")
    spark.sparkContext.setLogLevel("WARN")
    val server = new GraftServer(new IncrementalGraph(spark, PipelineConfig.fromYaml(yaml)), port)
    println(s"[graft] serving ${cfgPath} on port ${server.port}")
    // serve until the process is killed (the reference blocks on the db
    // thread the same way, server.rs:57)
    synchronized { wait() }
  }
}
