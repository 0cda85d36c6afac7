package graft

import graft.engine.Similarity
import org.apache.spark.sql.functions._

/** The broadcast-centroid argmin expression — the uncapped-k
  * assignment path behind k-means / SemDeDup cell counts. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

  private def firstK(k: Int): IndexedSeq[IndexedSeq[Double]] =
    corpus.filter(col("vec_id") < k).orderBy(col("vec_id")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq

  test("expression path equals the literal-projection path row-for-row") {
    val cent = firstK(12) // ≤ literalArgminMaxK: both paths available
    assert(cent.length <= Similarity.literalArgminMaxK)
    val lit = corpus.select(col("vec_id"),
        Similarity.nearestCell(cent).as("cid"))
      .as[(Long, Int)].collect().toSeq
    val expr = corpus.select(col("vec_id"),
        Similarity.nearestCell(cent, forceExpr = true).as("cid"))
      .as[(Long, Int)].collect().toSeq
    assert(lit == expr)
  }

  test("large k auto-routes to the expression and stays a pure projection") {
    val cent = firstK(100) // > literalArgminMaxK → expression path
    val df = corpus.select(col("vec_id"),
      Similarity.nearestCell(cent).as("cid"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_nearest_centroid"), p)
    // same scale bar as the k=8 PlanShapeSpec guard: assignment must
    // never become a join/window/agg over |corpus|×k rows
    assert("(?i)join|window|aggregate".r.findAllIn(p).isEmpty, p)
    // argmin is correct vs an independent driver-side recompute
    val vecs = corpus.as[(Long, Seq[Double])].collect().toMap
    df.as[(Long, Int)].collect().foreach { case (id, cid) =>
      val ds = cent.map(c => vecs(id).lazyZip(c)
        .map((x, y) => (x - y) * (x - y)).sum)
      assert(cid == ds.indexOf(ds.min), s"vec $id")
    }
  }

  test("whole-stage codegen covers the argmin (loop body, not unrolled)") {
    val cent = firstK(100)
    // `v` appears twice (as in every real assignment projection, which
    // also derives norms from it) so the interpreted `transform` cast
    // stays in its own lower Project instead of collapsing into — and
    // de-codegenning — the argmin stage
    val plan = corpus
      .select(Similarity.nearestCell(cent).as("cid"), col("v"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator
      .find(_.contains("graft_nearest_centroid")).get
    assert(line.trim.startsWith("*"), plan)
    // compile enforced: Janino failures throw instead of degrading
    val n = strictCodegen {
      corpus.select(Similarity.nearestCell(cent).as("cid"), col("v"))
        .count()
    }
    assert(n > 0)
  }

  test("null semantics: null array, null element, width mismatch → null") {
    val cent = IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))
    val df = Seq(
      Some(Seq(Some(0.9), Some(1.1))),
      None,
      Some(Seq(Some(1.0), None)),
      Some(Seq(Some(1.0))))
      .toDF("v")
    val r = df.select(
      Similarity.nearestCell(cent, forceExpr = true).as("cid")).collect()
    assert(r(0).getInt(0) == 1)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0) && r(3).isNullAt(0))
  }

  test("null ELEMENT: literal path emits a cell, expression path nulls " +
      "— the documented caveat to interchangeability") {
    // The interchangeability contract holds for non-null vectors (all
    // fixture corpora). On a vector with a null ELEMENT the paths
    // diverge by design of their building blocks: the expression
    // returns null (drop-malformed), while the literal array_min
    // compares structs whose d2 is null and still emits a cell id.
    // Pin both behaviors so a silent change in either trips here.
    val cent = IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))
    val df = Seq(Seq(Some(1.0), None), Seq(Some(0.9), Some(1.1)))
      .toDF("v")
    val lit = df.select(Similarity.nearestCell(cent).as("cid")).collect()
    val expr = df.select(
      Similarity.nearestCell(cent, forceExpr = true).as("cid")).collect()
    assert(!lit(0).isNullAt(0))   // literal path: emits a cell
    assert(expr(0).isNullAt(0))   // expression path: null
    assert(lit(1).getInt(0) == 1 && expr(1).getInt(0) == 1)
  }

  test("NaN elements: both paths agree on cell 0 (no phantom cell)") {
    // a NaN element makes every d2 NaN; the literal array_min orders
    // NaN equal-largest and tie-breaks to cell 0 — the expression
    // must match, never emit -1 (a cell no centroid update sees)
    val cent = IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))
    val df = Seq(
      Seq(Double.NaN, 1.0),       // all-NaN distances
      Seq(0.9, 1.1))              // sane row alongside
      .toDF("v")
    val lit = df.select(Similarity.nearestCell(cent).as("cid"))
      .as[Int].collect().toSeq
    val expr = df.select(
        Similarity.nearestCell(cent, forceExpr = true).as("cid"))
      .as[Int].collect().toSeq
    assert(lit == expr, s"lit=$lit expr=$expr")
    assert(lit == Seq(0, 1))
  }

  test("blockCount: per-task vector memory stays under the budget at any shape") {
    val bytesPerVec = 64 * 8L + 64
    val budget = Similarity.nearDupTaskBudgetBytes
    for (p <- Seq(4, 32, 1000); n <- Seq(100L, 100000L, 1000000000L)) {
      val b = Similarity.blockCount(p, n, bytesPerVec, budget)
      // each task joins two blocks of ≈ n/B vectors — the bound the
      // docstring promises, independent of cluster shape
      assert(2.0 * n / b * bytesPerVec <= budget + bytesPerVec, s"p=$p n=$n b=$b")
      // and the parallelism floor still holds: B(B+1)/2 ≥ cores
      assert(b.toLong * (b + 1) / 2 >= p, s"p=$p n=$n b=$b")
    }
  }

  test("semdedupCells: ⌈√n⌉ uncapped, floor 8 — cell size stays ~√n") {
    assert(Similarity.semdedupCells(0) == 8)
    assert(Similarity.semdedupCells(64) == 8)
    assert(Similarity.semdedupCells(500) == 23)
    assert(Similarity.semdedupCells(1000000) == 1000)
    assert(Similarity.semdedupCells(1000000000L) == 31623)
    // the scale property the round-6 clamp broke: EXPECTED cell size
    // n/k never exceeds √n (+1 for the ceiling), at any n — so the
    // within-cell quadratic is bounded by n per cell-group, not n²
    val ns = Seq(1000L, 32000L, 100000L, 10000000L, 1000000000L,
      100000000000L)
    ns.foreach { n =>
      val k = Similarity.semdedupCells(n)
      assert(n.toDouble / k <= math.sqrt(n.toDouble) + 1, s"n=$n k=$k")
    }
    // monotone: more docs never means fewer cells
    assert(ns.map(Similarity.semdedupCells) ==
      ns.map(Similarity.semdedupCells).sorted)
  }
}
