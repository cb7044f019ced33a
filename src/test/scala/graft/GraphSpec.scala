package graft

import org.apache.spark.sql.functions._

/** PageRank invariants the hash gate can't state: mass conservation and
  * the hub/leaf ordering on a known topology. */
class GraphSpec extends SparkSpec {

  test("pagerank conserves mass and ranks hubs above leaves") {
    val df = graft.queries.Graph.pagerank(spark, sf("0.001"))
    val rows = df.collect()
    // total mass stays 1 (up to the per-node 1e-9 quantization)
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < rows.length * 1e-9 + 1e-6)
    // event-type nodes are hubs (every user touches few types); each must
    // out-rank every user node
    val (types, users) = rows.partition(_.getString(0).startsWith("t:"))
    assert(types.nonEmpty && users.nonEmpty)
    assert(types.map(_.getDouble(1)).min > users.map(_.getDouble(1)).max)
  }
}
