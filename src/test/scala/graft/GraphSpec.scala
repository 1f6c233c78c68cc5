package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pagerank: hub outranks leaves; mass conserved on a graph with " +
      "no dangling nodes") {
    import spark.implicits._
    // star with back-edges: every leaf links the hub, hub links back
    val leaves = (1L to 20L)
    val edges = (leaves.map(l => (l, 0L)) ++ leaves.map(l => (0L, l)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(leaves.forall(l => pr(0L) > pr(l)),
      s"hub=${pr(0L)} leaves=${leaves.map(pr).max}")
    // bidirectional edges => no dangling nodes => total mass stays ~n
    val total = pr.values.sum
    assert(math.abs(total - pr.size) < 1e-4 * pr.size, s"total=$total")
    // leaves are symmetric: identical scores
    assert(leaves.map(pr).distinct.size === 1)
  }

  test("pagerank is bit-stable under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong)).filter(p => p._1 != p._2)
      .toDF("src", "dst")
    def run(parts: Int): Seq[(Long, Long)] =
      Graph.pageRank(edges.repartition(parts), iterations = 4).collect()
        .map(r => (r.getLong(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq.sorted
    assert(run(2) === run(17))
  }
}
