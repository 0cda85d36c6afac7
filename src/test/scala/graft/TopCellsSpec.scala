package graft

import graft.engine.Similarity
import org.apache.spark.sql.functions._

/** The loop-codegen IVF quantizer paths ([[graft.functions.TopCells]]
  * behind [[Similarity.ivfCellCol]]/[[Similarity.ivfProbeCol]]) and
  * the n-derived index-granularity laws ([[Similarity.ivfCells]],
  * [[Similarity.lshBits]]) — the round-8 fix for the last
  * fixture-scale constant. */
class TopCellsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

  private def firstK(k: Int): IndexedSeq[(Long, IndexedSeq[Double])] =
    corpus.filter(col("vec_id") < k).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq

  test("cell assignment: expression path equals the literal path row-for-row") {
    val cent = firstK(12) // ≤ literalArgminMaxK: both paths available
    val lit = corpus.select(col("vec_id"),
        Similarity.ivfCellCol(cent).as("cid"))
      .as[(Long, Long)].collect().toSeq
    val expr = corpus.select(col("vec_id"),
        Similarity.ivfCellCol(cent, forceExpr = true).as("cid"))
      .as[(Long, Long)].collect().toSeq
    assert(lit == expr)
  }

  test("probe fan: expression path equals the literal path, rank order kept") {
    val cent = firstK(12)
    val lit = corpus.select(col("vec_id"),
        Similarity.ivfProbeCol(cent, nprobe = 3).as("cids"))
      .as[(Long, Seq[Long])].collect().toSeq
    val expr = corpus.select(col("vec_id"),
        Similarity.ivfProbeCol(cent, nprobe = 3, forceExpr = true).as("cids"))
      .as[(Long, Seq[Long])].collect().toSeq
    assert(lit == expr)
    // and the fan is the true inner-product top-3, best first, ties low
    val vecs = corpus.as[(Long, Seq[Double])].collect().toMap
    lit.foreach { case (id, cids) =>
      val ips = cent.map { case (cid, cv) =>
        (cid, vecs(id).lazyZip(cv).map(_ * _).sum) }
      val want = ips.sortBy { case (cid, ip) => (-ip, cid) }.take(3).map(_._1)
      assert(cids == want, s"vec $id")
    }
  }

  test("large k auto-routes to the expression and stays a pure projection") {
    val cent = firstK(64) // > literalArgminMaxK → TopCells path
    val df = corpus.select(col("vec_id"),
      Similarity.ivfCellCol(cent).as("cid"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_top_cells"), p)
    // assignment must never become a join/window/agg over |corpus|×k
    assert("(?i)join|window|aggregate".r.findAllIn(p).isEmpty, p)
    // argmax correct vs an independent driver-side recompute
    val vecs = corpus.as[(Long, Seq[Double])].collect().toMap
    df.as[(Long, Long)].collect().foreach { case (id, cid) =>
      val ips = cent.map { case (c, cv) => vecs(id).lazyZip(cv).map(_ * _).sum }
      assert(cid == cent(ips.indexOf(ips.max))._1, s"vec $id")
    }
  }

  test("whole-stage codegen covers the loop argmax") {
    val cent = firstK(64)
    val plan = corpus
      .select(Similarity.ivfCellCol(cent).as("cid"), col("v"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_top_cells")).get
    assert(line.trim.startsWith("*"), plan)
    // compile enforced: Janino failures throw instead of degrading
    val n = strictCodegen {
      corpus.select(Similarity.ivfCellCol(cent).as("cid"), col("v"))
        .count()
    }
    assert(n > 0)
  }

  test("null semantics: null array, null element, width mismatch → null") {
    import org.apache.spark.sql.GraftBridge
    val df = Seq(
      Some(Seq(Some(0.9), Some(1.1))),
      None,
      Some(Seq(Some(1.0), None)),
      Some(Seq(Some(1.0))))
      .toDF("v")
    val cells = GraftBridge.column(graft.functions.TopCells(
      GraftBridge.expression(col("v")),
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), 2))
    val r = df.select(cells.as("c")).collect()
    assert(r(0).getSeq[Int](0) == Seq(1, 0)) // ip 0 vs 2 → cell 1 first
    assert(r(1).isNullAt(0) && r(2).isNullAt(0) && r(3).isNullAt(0))
  }

  test("NaN elements: slots fill with lowest untaken indices, no -1") {
    import org.apache.spark.sql.GraftBridge
    val df = Seq(Seq(Double.NaN, 1.0), Seq(0.9, 1.1)).toDF("v")
    val cells = GraftBridge.column(graft.functions.TopCells(
      GraftBridge.expression(col("v")),
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), 2))
    val r = df.select(cells.as("c")).as[Seq[Int]].collect().toSeq
    assert(r == Seq(Seq(0, 1), Seq(1, 0)), r)
  }

  test("ivfCells / lshBits: granularity tracks the corpus, never a constant") {
    // ivfCells = ⌈√n⌉ floor 16 — cell size n/k stays ~√n at any n
    assert(Similarity.ivfCells(0) == 16)
    assert(Similarity.ivfCells(256) == 16)
    assert(Similarity.ivfCells(500) == 23)
    assert(Similarity.ivfCells(2000) == 45)
    assert(Similarity.ivfCells(1000000000L) == 31623)
    Seq(1000L, 100000L, 10000000L, 1000000000L).foreach { n =>
      val k = Similarity.ivfCells(n)
      assert(n.toDouble / k <= math.sqrt(n.toDouble) + 1, s"n=$n k=$k")
    }
    // lshBits: smallest b with 2^b·16 ≥ n (floor 4) — expected bucket
    // population ≈ 16 at any corpus size
    assert(Similarity.lshBits(500) == 5)
    assert(Similarity.lshBits(2000) == 7)
    assert(Similarity.lshBits(16) == 4)
    Seq(1000L, 100000L, 10000000L, 1000000000L).foreach { n =>
      val b = Similarity.lshBits(n)
      assert((1L << b) * 16 >= n, s"n=$n b=$b")
      if (b > 4) assert((1L << (b - 1)) * 16 < n, s"n=$n b=$b")
    }
    // monotone in n
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    assert(ns.map(Similarity.ivfCells) == ns.map(Similarity.ivfCells).sorted)
    assert(ns.map(Similarity.lshBits(_)) ==
      ns.map(Similarity.lshBits(_)).sorted)
  }

  test("IVF candidate volume grows ~√n, not linearly (the index property)") {
    // deterministic synthetic corpora: 16-dim vectors from a seeded
    // per-id generator; candidates per query = Σ probed cell sizes
    def corpusOf(n: Int) = spark.range(n).map { id =>
      val rnd = new scala.util.Random(id * 2654435761L)
      (id, Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "v")
    def avgCandidates(n: Int): Double = {
      val e = corpusOf(n).cache()
      val k = Similarity.ivfCells(n)
      val cent = e.filter(col("vec_id") < k).orderBy(col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq
      val assigned = e.select(col("vec_id"),
        Similarity.ivfCellCol(cent).as("cid"))
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"),
          explode(Similarity.ivfProbeCol(cent, nprobe = 2)).as("cid"))
      val nCand = probes.join(assigned, "cid").count()
      e.unpersist()
      nCand / 20.0
    }
    val small = avgCandidates(1024)   // k=32 cells
    val large = avgCandidates(16384)  // k=128 cells
    // 16× the corpus must cost ≪ 16× the candidates; √16 = 4, with
    // slack for cell imbalance (deterministic data → stable numbers)
    assert(large / small <= 8.0, s"small=$small large=$large")
    // and per-query candidate volume stays a vanishing corpus share
    assert(large <= 16384 / 8.0, s"large=$large")
  }

  test("wide LSH signature: loop expression equals the literal path bit-for-bit") {
    val e = corpus
    // 8 bits, both paths: the loop expression is the default at every
    // width (r10); the literal formulation survives under forceLit
    val lit8 = e.select(col("vec_id"),
        Similarity.lshSignature(col("v"), 8, 64, firstPlane = 64,
          forceLit = true).as("s"))
      .as[(Long, Long)].collect().toSeq
    val expr8 = e.select(col("vec_id"),
        Similarity.lshSignature(col("v"), 8, 64, firstPlane = 64).as("s"))
      .as[(Long, Long)].collect().toSeq
    assert(lit8 == expr8)
    // 20 bits auto-routes to the expression and stays codegen'd
    val df20 = e.select(
      Similarity.lshSignature(col("v"), 20, 64).as("s"), col("v"))
    val p = df20.queryExecution.executedPlan.toString
    assert(p.contains("graft_hyperplane_sig"), p)
    assert(p.linesIterator.find(_.contains("graft_hyperplane_sig"))
      .get.trim.startsWith("*"), p)
    // compile enforced: Janino failures throw instead of degrading
    assert(strictCodegen { df20.count() } > 0)
    // the 20-bit signature's low 8 bits over the same planes match
    // the literal 8-bit signature (prefix property: plane j ↦ bit j)
    val low8 = df20.select(col("s").bitwiseAND(lit(0xFFL)))
      .as[Long].collect().toSeq
    val lit8p0 = e.select(
        Similarity.lshSignature(col("v"), 8, 64).as("s"))
      .as[Long].collect().toSeq
    assert(low8 == lit8p0)
  }

  test("LSH bucket occupancy stays ~targetBucket as n grows (width scales)") {
    // the defect the n-derived width fixes: at fixed bits the mean
    // bucket population is n/2^bits — linear in n. With
    // bits = lshBits(n), occupancy must stay O(targetBucket).
    def corpusOf(n: Int) = spark.range(n).map { id =>
      val rnd = new scala.util.Random(id * 0x9E3779B97F4A7C15L)
      (id, Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "v")
    def meanBucket(n: Int): Double = {
      val bits = Similarity.lshBits(n)
      val e = corpusOf(n)
      val sig = Similarity.lshSignature(col("v"), bits, dim = 64,
        firstPlane = 0)
      val occ = e.select(sig.as("sig")).groupBy("sig")
        .count().agg(avg("count")).head().getDouble(0)
      occ
    }
    val small = meanBucket(1024)  // bits 6
    val large = meanBucket(16384) // bits 10
    // hyperplane buckets are NOT uniform — allow generous imbalance,
    // but occupancy must be flat-ish in n, never 16× (fixed-width)
    assert(small <= 8.0 * 16, s"small=$small")
    assert(large <= 8.0 * 16, s"large=$large")
    assert(large / small <= 3.0, s"small=$small large=$large")
  }
}
