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

  test("triangle counts: K4 gives every node 3; chain gives none; " +
      "direction and duplicate edges don't matter") {
    import spark.implicits._
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b }
      yield (a, b))
    // add reversed duplicates + a chain 10-11-12 that closes nothing
    val edges = (k4 ++ k4.map(_.swap) ++ Seq((10L, 11L), (11L, 12L)))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each K4 node sits in C(3,2)=3 triangles; chain nodes absent
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("pagerank is bit-stable under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong)).filter(p => p._1 != p._2)
      .toDF("src", "dst")
    // 6 iterations crosses the it=5 lineage cut, so the checkpoint path
    // is exercised and proven value-neutral
    def run(parts: Int): Seq[(Long, Long)] =
      Graph.pageRank(edges.repartition(parts), iterations = 6).collect()
        .map(r => (r.getLong(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq.sorted
    assert(run(2) === run(17))
  }
}
