package graft.net

import graft.SparkSpec
import graft.config.PipelineConfig
import graft.operators.{ActionRegistry, GraftAction, IncrementalGraph}
import com.fasterxml.jackson.databind.JsonNode
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** End-to-end client-SDK flow against the live server — the Scala
  * rendition of the reference's `usage_example.rs`: insert through the
  * client, watch the cascade arrive on a listen subscription, range-query
  * it back. */
class GraftClientSpec extends SparkSpec {

  private val yaml =
    """tables:
      |  - name: grades
      |    kind: source
      |    columns: {name: Str, grade: Integer}
      |  - name: aggregationTest
      |    kind: aggregation
      |    source_table: grades
      |    aggregated_column: name
      |    functions: ["count ~ memo.count + 1", "sum ~ memo.sum + grade"]
      |""".stripMargin

  private def newServer(): GraftServer =
    new GraftServer(new IncrementalGraph(spark, PipelineConfig.fromYaml(yaml)))

  test("insert → cascaded aggregation event on a subscription → range query readback") {
    val server = newServer()
    val client = new GraftClient("127.0.0.1", server.port)
    try {
      val eventLatch = new CountDownLatch(1)
      @volatile var eventValue: JsonNode = null
      client.subscribeToEvent("aggregationTest", "Insert") { v =>
        eventValue = v
        eventLatch.countDown()
      }
      val edits = client.insertData("grades", Map("name" -> "ada", "grade" -> 90L))
      // committed edits include the source row AND the cascaded aggregate
      assert(edits.exists(e => e.has("grade")), s"source row missing from edits: $edits")
      assert(edits.exists(e => e.has("count")), s"cascaded aggregate missing: $edits")

      assert(eventLatch.await(60, TimeUnit.SECONDS), "no listen event within 60s")
      val ok = eventValue.get("ManyResults").get("Ok")
      assert(ok != null && ok.size() == 1)
      assert(ok.get(0).get("count").get("Integer").asLong() == 1L)
      assert(ok.get(0).get("sum").get("Integer").asLong() == 90L)

      // a second insert for the same key raises the aggregate (upsert)
      client.insertData("grades", Map("name" -> "ada", "grade" -> 60L))
      val agg = client.findOne("aggregationTest", "aggregatedColumn", "ada")
      assert(agg.isDefined)
      assert(agg.get.get("sum").get("Integer").asLong() == 150L)

      // range queries through the client: strict lessThan, inclusive >=
      val lo = client.lessThan("grades", "grade", 90L)
      assert(lo.map(_.get("grade").get("Integer").asLong()) == Seq(60L))
      val hi = client.greaterThan("grades", "grade", 60L)
      assert(hi.map(_.get("grade").get("Integer").asLong()).sorted == Seq(60L, 90L))

      // delete cascades; findOne then misses
      client.deleteData("grades", "name", "ada")
      assert(client.findOne("grades", "name", "ada").isEmpty)
    } finally {
      client.close()
      server.close()
    }
  }

  test("concurrent requests from many threads demux correctly by request_id") {
    val server = newServer()
    val client = new GraftClient("127.0.0.1", server.port)
    try {
      (0 until 8).foreach(i =>
        client.insertData("grades", Map("name" -> s"s$i", "grade" -> (i * 10L))))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (0 until 8).flatMap { i =>
          Seq(
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean =
                client.findOne("grades", "name", s"s$i")
                  .exists(_.get("grade").get("Integer").asLong() == i * 10L)
            }),
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean =
                client.getAll("grades", "grade", i * 10L)
                  .exists(_.get("name").get("Str").asText() == s"s$i")
            }))
        }
        assert(futures.forall(_.get(120, TimeUnit.SECONDS)),
          "a concurrent request got the wrong (or no) response")
      } finally pool.shutdownNow()
    } finally {
      client.close()
      server.close()
    }
  }

  test("server Err surfaces as a client exception (unknown column)") {
    val server = newServer()
    val client = new GraftClient("127.0.0.1", server.port)
    try {
      val ex = intercept[java.io.IOException] {
        client.getAll("grades", "no_such_column", 1L)
      }
      assert(ex.getMessage.contains("server error"))
    } finally {
      client.close()
      server.close()
    }
  }
}
