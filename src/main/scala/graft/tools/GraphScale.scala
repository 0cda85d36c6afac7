package graft.tools

import graft.engine.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev evidence for the triangle-counting scale shape beyond the
  * fixture's pairs-sized graph: a synthetic corpus of `nBlocks`
  * disjoint 4-cliques (6 edges, 4 triangles each) plus an equally
  * long chain (edges, no triangles) — the near-dup topology the
  * operator exists for (dense duplicate clusters + borderline
  * chains), with the triangle count known in CLOSED FORM:
  * 4·nBlocks, and per-node counts 3 for clique members, 0 for chain
  * nodes. Generation is executor-side; edges arrive canonical
  * (ida < idb) as [[Dedup.triangleCounts]] requires. Usage:
  *   sbt "runMain graft.tools.GraphScale [nBlocks]"  # default 100000
  *
  * nBlocks=100000 → 1.2M edges (600k clique + 600k chain): the
  * wedge join's fan stays Θ(triangles) on this clustered shape —
  * the claim the operator scaladoc makes for near-dup graphs. */
object GraphScale {

  def main(args: Array[String]): Unit = {
    val nBlocks = if (args.nonEmpty) args(0).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    // clique b occupies ids [4b, 4b+3]; the chain lives above at
    // offset base = 4*nBlocks, one edge per step
    val base = 4L * nBlocks
    val cliqueEdges = spark.range(nBlocks).flatMap { b =>
      val ids = (0 to 3).map(4L * b + _)
      for (i <- ids.indices; j <- (i + 1) until ids.size)
        yield (ids(i), ids(j))
    }
    val chainEdges = spark.range(6L * nBlocks)
      .map(i => (base + i, base + i + 1))
    val edges = cliqueEdges.union(chainEdges).toDF("ida", "idb")
    val tri = Dedup.triangleCounts(edges).cache()
    val nodes = tri.count()
    val total = tri.agg(sum(col("n_tri"))).as[Long].head()
    val wall = (System.nanoTime() - t0) / 1e9
    val nEdges = 6L * nBlocks + 6L * nBlocks
    println(f"blocks=$nBlocks edges=$nEdges tri_nodes=$nodes " +
      f"tri_participations=$total wall=$wall%.1f s")
    // closed form: every clique node sits in C(3,2)=3 triangles;
    // 4 nodes/clique; total participations = 12*nBlocks (= 3 per
    // triangle * 4*nBlocks triangles); chain contributes zero
    assert(nodes == 4L * nBlocks, s"nodes $nodes != ${4L * nBlocks}")
    assert(total == 12L * nBlocks, s"total $total != ${12L * nBlocks}")
    spark.stop()
  }
}
