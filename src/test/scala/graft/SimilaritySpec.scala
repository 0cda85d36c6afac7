package graft

import graft.engine.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)))
      .toDF("a", "b")
    val r = df.select(Similarity.cosine(col("a"), col("b"))).as[Double]
      .collect()
    assert(math.abs(r(0)) < 1e-15)
    assert(math.abs(r(1) - 1.0) < 1e-12)
    assert(math.abs(r(2) + 1.0) < 1e-15)
  }

  test("brute-force top-k: ranked by score desc, ties by vec_id, no self") {
    val out = Similarity.qCosineTopK(spark, sf0001)
      .select("qid", "nid", "rank", "score")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 50) // 10 queries × 5
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to 5L))
      // scores non-increasing with rank
      assert(sorted.sliding(2).forall(w => w(0)._4 >= w(1)._4))
      assert(rows.forall(_._2 != qid)) // self excluded
    }
  }

  test("MMR re-rank equals an independent greedy recompute; diversity binds") {
    val out = Similarity.qMmrRerank(spark, sf0001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.size) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val byId = vecs.toMap
    val expect = vecs.filter(_._1 < 4).flatMap { case (qid, qv) =>
      val short = vecs.filter(_._1 != qid)
        .map { case (n, v) => (n, cos(qv, v)) }
        .sortBy { case (n, s) => (-s, n) }.take(Similarity.mmrShortlist)
      var remaining = short.toList
      var selected = List.empty[Long]
      (1 to Similarity.mmrK).map { rank =>
        val (nid, score) =
          if (selected.isEmpty) remaining.head
          else remaining.minBy { case (n, s) =>
            val mx = selected
              .map(sel => cos(byId(n), byId(sel))).max
            (-(Similarity.mmrLambda * s - Similarity.mmrMu * mx), n)
          }
        remaining = remaining.filterNot(_._1 == nid)
        selected ::= nid
        (qid, rank, nid, score)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(out == expect && out.size == 4 * Similarity.mmrK)
    // diversity binds: for at least one query the MMR order is NOT
    // the plain relevance order (otherwise the operator is a no-op
    // on this corpus and the test is vacuous)
    val reordered = out.groupBy(_._1).exists { case (_, rows) =>
      val scores = rows.sortBy(_._2).map(_._4)
      scores.sliding(2).exists(w => w(0) < w(1))
    }
    assert(reordered)
  }

  test("hard negatives: no positive leaks; the cluster exclusion binds") {
    val out = Similarity.qHardNegatives(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val pairs = Similarity.qEmbedNearDup(spark, sf0001)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    // transitive closure on the driver
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def component(s: Long): Set[Long] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    assert(out.nonEmpty && out.groupBy(_._1).forall(_._2.size == 5))
    // THE property: no emitted negative shares the anchor's component
    out.foreach { case (qid, nid, _, _) =>
      assert(!component(qid).contains(nid), s"positive leaked: $qid $nid")
    }
    // non-vacuous: some anchor IS clustered, and for it the exclusion
    // changed the plain top-5 (its nearest neighbor was a positive)
    val clustered = out.map(_._1).distinct.filter(q => adj.contains(q))
    assert(clustered.nonEmpty)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def d(x: Seq[Double], y: Seq[Double]) =
        x.lazyZip(y).map(_ * _).sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    assert(clustered.exists { q =>
      val excludedBest = (component(q) - q)
        .map(m => cos(vecs(q), vecs(m))).max
      val emittedMin = out.filter(_._1 == q).map(_._4).min
      excludedBest > emittedMin // a positive WOULD have made top-5
    })
  }

  test("ANN/LSH: candidates are real corpus neighbors with exact scores") {
    val ann = Similarity.qAnnLsh(spark, sf0001)
      .select("qid", "nid", "score").as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    // every reported score must equal the exact brute-force cosine
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
    val pairs = ann.map(t => (t._1, t._2)).toSeq.toDF("qid", "nid")
    val joined = pairs
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), "qid")
      .join(e.select(col("vec_id").as("nid"), col("v").as("nv")), "nid")
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qv"), col("nv")).as("exact"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    ann.foreach { case (q, n, s) => assert(s == joined((q, n))) }
  }

  test("ANN/IVF: one cell per vector, sane ranks, recall vs brute force") {
    val ivf = Similarity.qAnnIvf(spark, sf0001)
      .select("qid", "nid", "rank", "score")
      .as[(Long, Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    // per query: ranks are 1..n with scores non-increasing
    ivf.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall(w =>
        w.length < 2 || w(0)._4 >= w(1)._4))
      assert(rows.forall(r => r._2 != r._1)) // self excluded
    }
    // nprobe=2 of 16 cells must still recover a decent share of the
    // true top-3 (embeddings testdata has planted near-dup clusters)
    val exact = Similarity.qCosineTopK(spark, sf0001)
      .filter(col("rank") <= 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivfPairs = ivf.map(t => (t._1, t._2)).toSet
    val qids = exact.map(_._1)
    val hits = exact.count(ivfPairs.contains)
    assert(qids.nonEmpty && hits.toDouble / exact.size >= 0.3,
      s"recall too low: $hits/${exact.size}")
  }

  test("IVF-PQ: ranked shape, exact re-rank scores, recall vs brute force") {
    val pq = Similarity.qAnnPq(spark, sf0001)
      .select("qid", "nid", "rank", "score")
      .as[(Long, Long, Long, Double)].collect()
    assert(pq.nonEmpty)
    pq.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall(w =>
        w.length < 2 || w(0)._4 >= w(1)._4))
      assert(rows.forall(r => r._2 != r._1)) // self excluded
    }
    // the final scores come from the EXACT re-rank join, so every
    // reported score must equal the brute-force cosine
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
    val pairs = pq.map(t => (t._1, t._2)).toSeq.toDF("qid", "nid")
    val exactScores = pairs
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), "qid")
      .join(e.select(col("vec_id").as("nid"), col("v").as("nv")), "nid")
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qv"), col("nv")).as("exact"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    pq.foreach { case (q, n, _, s) => assert(s == exactScores((q, n))) }
    // recall floor: the code-sized ADC pass + 32-candidate exact
    // re-rank must recover most of what the SAME 2-cell probe with
    // full vectors (qAnnIvf) recovers — measured 0.56 vs 0.567 over
    // the 50-query set at sf0.001; the 10-query qCosineTopK subset
    // is the shared in-spec truth (the qAnnIvf test's bar is 0.3)
    val exact = Similarity.qCosineTopK(spark, sf0001)
      .filter(col("rank") <= 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pqPairs = pq.map(t => (t._1, t._2)).toSet
    val hits = exact.count(pqPairs.contains)
    assert(hits.toDouble / exact.size >= 0.3,
      s"PQ recall too low: $hits/${exact.size}")
  }

  test("PQ assign: literal and expression codegen paths are identical") {
    val lit = Similarity.qPqAssign(spark, sf0001).collect()
    val expr = Similarity.qPqAssignExpr(spark, sf0001).collect()
    assert(lit.length == expr.length && lit.nonEmpty)
    lit.zip(expr).foreach { case (a, b) => assert(a == b) }
    // codes are in-range
    lit.foreach { r =>
      (1 to 8).foreach { i =>
        val c = r.getInt(i)
        assert(c >= 0 && c < 16)
      }
    }
  }

  test("k-means: assignment is the true argmin, SSE monotone over iterations") {
    val k = 8
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], c: IndexedSeq[Double]): Double =
      a.lazyZip(c).map((x, y) => (x - y) * (x - y)).sum
    def sse(cent: IndexedSeq[IndexedSeq[Double]]): Double =
      vecs.values.map(v => cent.map(d2(v, _)).min).sum
    // Lloyd's guarantee: SSE non-increasing across iterations (the
    // engine's decimal-exact distributed means vs this driver-side
    // double recompute differ only at the 1e-15 cast rounding — far
    // below iteration-level deltas)
    val byIter = (1 to 3).map(i =>
      Similarity.kmeansCentroids(spark, sf0001, k, iters = i))
    val sses = byIter.map(sse)
    assert(sses.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 },
      sses.toString)
    // qEmbedCluster (the ORACLE-BACKED quantized path since r17):
    // full driver-side re-derivation of the INTEGER Lloyd fixpoint —
    // quantize with the engine-identical HALF_UP round(x·1e6), seed
    // with the k lowest vec_ids, three iterations of exact-integer
    // argmin (ties to lowest cid) + truncating (2s+n)/(2n) mean
    // rounding — then assert EXACT assignment equality
    val out = Similarity.qEmbedCluster(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == vecs.keys.toSeq.sorted)
    val vq: Map[Long, IndexedSeq[Long]] = vecs.view.mapValues(_.map(x =>
      BigDecimal(x * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      .toIndexedSeq).toMap
    def d2q(a: IndexedSeq[Long], c: IndexedSeq[Long]): Long =
      a.lazyZip(c).map((x, y) => (x - y) * (x - y)).sum
    def argmin(cent: IndexedSeq[IndexedSeq[Long]],
        v: IndexedSeq[Long]): Int = {
      val ds = cent.map(d2q(v, _))
      ds.indexOf(ds.min) // indexOf = first minimum = lowest cid
    }
    val ids = vecs.keys.toSeq.sorted
    var qcent: IndexedSeq[IndexedSeq[Long]] =
      ids.take(k).map(vq).toIndexedSeq
    for (_ <- 1 to 3) {
      val members = ids.groupBy(id => argmin(qcent, vq(id)))
      qcent = qcent.indices.map { cid =>
        members.get(cid) match {
          case Some(ms) =>
            val n = ms.size.toLong
            (0 until vq(ids.head).length).map { i =>
              val s = ms.map(id => vq(id)(i)).sum
              (2L * s + n) / (2L * n)
            }.toIndexedSeq
          case None => qcent(cid)
        }
      }
    }
    val expect = ids.map(id => (id, argmin(qcent, vq(id)).toLong))
    assert(out == expect, out.zip(expect).filter(p => p._1 != p._2)
      .take(5).toString)
    // non-degenerate clustering: every cell ends up populated (the
    // corpus is balanced and far larger than k) and no single cell
    // swallows the corpus — measured 49–72 of 500 per cell at sf0.001
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.size == k, sizes.toString)
    assert(sizes.values.max < out.size / 2, sizes.toString)
  }

  test("cell sizes stay ~√n as the corpus grows (the uncapped-cells property)") {
    // the scale property the round-6 64-cell clamp broke: with
    // k = ⌈√n⌉ cells the MAX realized cell must stay within a small
    // constant of √n on real (planted-cluster) data, so the
    // within-cell quadratic is O(n) per cell-group at any corpus
    // size. Checked at both fixture scales — n quadruples, the bound
    // holds at the same factor.
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sf0001, "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val n = e.count()
      val k = Similarity.semdedupCells(n)
      val cent = Similarity.kmeansCentroids(spark, dir, k, iters = 3)
      val maxCell = e.select(Similarity.nearestCell(cent).as("cid"))
        .groupBy("cid").count()
        .agg(org.apache.spark.sql.functions.max("count"))
        .head().getLong(0)
      assert(maxCell <= 4 * math.sqrt(n.toDouble).ceil.toLong,
        s"n=$n k=$k maxCell=$maxCell")
    }
  }

  test("ANN near-dup: subset of the exact pair set, identical cosines, high recall") {
    // the candidate path may only MISS pairs (no table co-buckets
    // them), never invent or mis-score one: every ANN pair must
    // appear in the exact all-pairs result with a bit-identical
    // cosine (both paths score with the same codegen dot product
    // over the same double vectors)
    val exact = Similarity.qEmbedNearDup(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    val ann = Similarity.qEmbedNearDupAnn(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    val exactMap = exact.map { case (a, b, c) => (a, b) -> c }.toMap
    ann.foreach { case (a, b, c) =>
      assert(exactMap.get((a, b)).contains(c),
        s"ANN pair ($a,$b,$c) not in the exact pair set")
    }
    // deterministic fixture recall — 8 tables × Hamming-≤2 probes at
    // the ~0.4-cosine band: measured 1.0 here and at sf0.01. A drop
    // below the floor means the index/probe definition changed, not
    // noise.
    val recall = ann.size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.99,
      s"recall $recall (${ann.size}/${exact.size})")
  }

  test("ANN near-dup: recall >= 0.95 at sf0.1 (the production-dedup bar)") {
    // the widest fixture (2000 vectors, 7-bit signatures) is where
    // the ≤1 fan degraded: r12 measured 0.852 — a dedup pass keeping
    // ~15% of true near-dups. The ≤2 fan must clear 0.95 here; both
    // paths are deterministic, so this is a fixed number, not a
    // flaky bound.
    val sf01 = "/root/testdata/sf0.1"
    val exact = Similarity.qEmbedNearDup(spark, sf01)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val ann = Similarity.qEmbedNearDupAnn(spark, sf01)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(ann.subsetOf(exact), s"ANN invented ${(ann -- exact).take(5)}")
    val recall = ann.size.toDouble / exact.size
    info(s"sf0.1 near-dup recall: $recall (${ann.size}/${exact.size})")
    assert(exact.nonEmpty && recall >= 0.95,
      s"recall $recall (${ann.size}/${exact.size})")
  }

  test("k-means fit sample: identity at fixture sizes, deterministic stride above") {
    val mk = (n: Int) => (0L until n.toLong)
      .map(i => (i, Seq(i.toDouble))).toDF("vec_id", "v")
    // below 64·k the sample IS the input — fixture results unchanged
    val small = mk(500)
    assert(Similarity.kmeansFitSample(small, k = 22, n = 500) eq small)
    // above: ~64·k rows in expectation, ≥ k (the seed requirement),
    // and the same rows on every call (pure function of ids)
    val big = mk(50000)
    val s1 = Similarity.kmeansFitSample(big, k = 10, n = 50000)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val s2 = Similarity.kmeansFitSample(mk(50000), k = 10, n = 50000)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2)
    assert(s1.size >= 10, s"sample ${s1.size} < k")
    // hash-uniform stride: within 2x of the per-centroid target
    // (expected size overshoots the target by up to the integer-
    // division slack in n/target, so the bound is inclusive-loose)
    val target = Similarity.kmeansFitPerCentroid * 10
    assert(s1.size > target / 2 && s1.size < target * 2,
      s"sample size ${s1.size} vs target $target")
  }

  test("RRF fusion equals a driver-side recompute from the two ANN lists") {
    val lsh = Similarity.qAnnLsh(spark, sf0001)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    val ivf = Similarity.qAnnIvf(spark, sf0001)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    val expected = (lsh ++ ivf).toSeq
      .groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(t => 1.0 / (t._3 + 60)).sum).toSeq
      .groupBy(_._1._1).toSeq.flatMap { case (qid, cands) =>
        cands.sortBy { case ((_, nid), rrf) => (-rrf, nid) }
          .take(3).zipWithIndex
          .map { case (((_, nid), rrf), i) => (qid, nid, i + 1L, rrf) }
      }.sortBy(t => (t._1, t._3))
    val out = Similarity.qAnnFused(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    assert(out == expected)
  }

  test("km-quantized IVF list equals an independent driver-side re-derivation") {
    val out = Similarity.qAnnIvfKm(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val k = Similarity.ivfCells(vecs.length.toLong)
    // the r17 integer-lattice quantizer, re-derived from scratch (the
    // q_embed_cluster recompute: HALF_UP round(x·1e6) quantize, seeds
    // = k lowest vec_ids, 3 iterations of integer argmin + truncating
    // (2s+n)/(2n) mean rounding)
    val vq: Map[Long, IndexedSeq[Long]] = vecs.map { case (id, v) =>
      id -> v.map(x => BigDecimal(x * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq
    }.toMap
    def d2q(a: IndexedSeq[Long], c: IndexedSeq[Long]): Long =
      a.lazyZip(c).map((x, y) => (x - y) * (x - y)).sum
    val ids = vecs.map(_._1)
    var centQ: IndexedSeq[IndexedSeq[Long]] =
      ids.sorted.take(k).map(vq).toIndexedSeq
    for (_ <- 1 to 3) {
      val members = ids.groupBy { id =>
        val ds = centQ.map(d2q(vq(id), _)); ds.indexOf(ds.min)
      }
      centQ = centQ.indices.map { cid =>
        members.get(cid) match {
          case Some(ms) =>
            val n = ms.size.toLong
            (0 until 64).map { i =>
              val s = ms.map(id => vq(id)(i)).sum
              (2L * s + n) / (2L * n)
            }.toIndexedSeq
          case None => centQ(cid)
        }
      }
    }
    val cent = centQ.map(_.map(_.toDouble))
    // the engine's strict left-to-right double sum — scores must match
    // BIT-exactly, not approximately
    def seqDot(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map(_ * _).foldLeft(0.0)(_ + _)
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      seqDot(a, b) / (math.sqrt(seqDot(a, a)) * math.sqrt(seqDot(b, b)))
    // the constant-coordinate reduction, recomputed independently:
    // score(vq, c) = [vq, 1]·[c, −|c|²/2]; argmax ⇔ L2 argmin — in
    // ASSIGNMENT space (the lattice); cosine scoring stays raw
    val aug = cent.map(cv => cv :+ (-0.5 * cv.map(x => x * x).sum))
    def cellScores(id: Long): IndexedSeq[Double] =
      aug.map(c => seqDot(vq(id).map(_.toDouble) :+ 1.0, c))
    val cellOf = vecs.map { case (id, _) =>
      val s = cellScores(id)
      id -> s.indexOf(s.max) // first max = lowest cid on ties
    }.toMap
    val expected = vecs.filter(_._1 < 50).flatMap { case (qid, qv) =>
      val s = cellScores(qid)
      val probes = s.zipWithIndex
        .sortBy { case (sc, i) => (-sc, i) }.take(2).map(_._2).toSet
      vecs.filter { case (nid, _) => nid != qid && probes(cellOf(nid)) }
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, sc) => (-sc, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, sc), i) => (qid, nid, i + 1L, sc) }
    }.sortBy(t => (t._1, t._3))
    assert(out == expected)
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2") {
    val out = Similarity.qEmbedQuantize(spark, sf0001)
      .as[(Long, Double, Long, Int, Int)].collect()
    assert(out.length == 500)
    out.foreach { case (_, scale, _, qmin, qmax) =>
      assert(scale >= 0.0)
      assert(qmin >= -127 && qmax <= 127, s"codes out of range: $qmin..$qmax")
    }
    // the construction bound: dequantized values sit within half a
    // quantization step of the original, every element — recomputed
    // with the engine's exact fp expression (x·127/m, not x/scale,
    // which can differ in the last ulp and flip a floor)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val qsums = out.map(r => r._1 -> r._3).toMap
    val scales = out.map(r => r._1 -> r._2).toMap
    vecs.take(100).foreach { case (id, v) =>
      val m = v.map(math.abs).max
      if (m > 0) {
        val qs = v.map(x => math.floor(x * 127.0 / m + 0.5))
        assert(qsums(id) == qs.map(_.toLong).sum, s"vec $id")
        val s = scales(id)
        qs.lazyZip(v).foreach { (q, x) =>
          assert(math.abs(q * s - x) <= s / 2 + 1e-12, s"vec $id")
        }
      } else assert(qsums(id) == 0L)
    }
  }

  test("JL projection: expected isometry, and near-dup pairs separate in 16-d") {
    val proj = Similarity.qEmbedProject(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (1 until r.length).map(r.getDouble).toIndexedSeq).toMap
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    assert(proj.size == vecs.length && proj.head._2.length == 16)
    // E[|Px|²] = |x|² under the √(3/k) scale; the planes are
    // deterministic, so the fixture's mean ratio is a FIXED number —
    // measured 0.927, pinned with slack for future fixture regen
    val ratios = vecs.map { case (id, v) =>
      proj(id).map(x => x * x).sum / v.map(x => x * x).sum
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.1, s"isometry ratio mean $mean")
    // distributional separation: the true near-dup pairs (full-dim
    // cos >= 0.4) keep a far higher projected cosine than background
    // pairs on average (measured 0.371 vs -0.001) — the pre-filter
    // property; per-pair ordering is NOT asserted (k=16 distortion
    // is large by the JL bound, and the scaladoc says so)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.lazyZip(b).map(_ * _).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    var nearSum = 0.0; var nNear = 0
    var bgSum = 0.0; var nBg = 0
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val cf = cos(vecs(i)._2, vecs(j)._2)
      val cp = cos(proj(vecs(i)._1), proj(vecs(j)._1))
      if (cf >= 0.4) { nearSum += cp; nNear += 1 }
      else { bgSum += cp; nBg += 1 }
    }
    assert(nNear > 0)
    assert(nearSum / nNear > 0.25, s"near mean ${nearSum / nNear}")
    assert(math.abs(bgSum / nBg) < 0.05, s"background mean ${bgSum / nBg}")
  }

  test("semdedup keep-list equals an independent driver-side re-derivation") {
    val kept = Similarity.qSemdedupKeep(spark, sf0001)
      .as[Long].collect().toSeq
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    // the r17 integer pipeline, re-derived from scratch: quantize with
    // HALF_UP round(x·1e6), integer Lloyd at the engine-derived
    // n=500 → ⌈√500⌉ = 23 cells / 3 iterations (the √n formula is
    // spec'd in NearestCentroidSpec), integer cosine bar 2/5
    val vq: Map[Long, IndexedSeq[Long]] = vecs.map { case (id, v) =>
      id -> v.map(x => BigDecimal(x * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq
    }.toMap
    def d2q(a: IndexedSeq[Long], c: IndexedSeq[Long]): Long =
      a.lazyZip(c).map((x, y) => (x - y) * (x - y)).sum
    def argmin(cent: IndexedSeq[IndexedSeq[Long]],
        v: IndexedSeq[Long]): Int = {
      val ds = cent.map(d2q(v, _)); ds.indexOf(ds.min)
    }
    val ids = vecs.map(_._1)
    val k = Similarity.semdedupCells(500)
    var cent: IndexedSeq[IndexedSeq[Long]] =
      ids.sorted.take(k).map(vq).toIndexedSeq
    for (_ <- 1 to 3) {
      val members = ids.groupBy(id => argmin(cent, vq(id)))
      cent = cent.indices.map { cid =>
        members.get(cid) match {
          case Some(ms) =>
            val n = ms.size.toLong
            (0 until 64).map { i =>
              val s = ms.map(id => vq(id)(i)).sum
              (2L * s + n) / (2L * n)
            }.toIndexedSeq
          case None => cent(cid)
        }
      }
    }
    val cell = ids.map(id => id -> argmin(cent, vq(id))).toMap
    // integer cosine: cos ≥ 2/5 ⟺ dq ≥ 0 ∧ 25·dq² ≥ 4·|a|²·|b|²
    // (BigInt squares — dq² overflows a Long)
    def qualifies(a: IndexedSeq[Long], b: IndexedSeq[Long]): Boolean = {
      val dq = a.lazyZip(b).map(_ * _).sum
      val na2 = a.map(x => x * x).sum
      val nb2 = b.map(x => x * x).sum
      dq >= 0 &&
        BigInt(25) * BigInt(dq) * BigInt(dq) >=
          BigInt(4) * BigInt(na2) * BigInt(nb2)
    }
    val edges = for {
      i <- ids; j <- ids
      if i < j && cell(i) == cell(j) && qualifies(vq(i), vq(j))
    } yield (i, j)
    assert(edges.nonEmpty) // planted near-dups land in shared cells
    // driver union-find (the same transitive-closure semantics,
    // independently implemented)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long =
      if (parent.getOrElse(x, x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val dropped = ids.filter(id => find(id) != id).toSet
    assert(dropped.nonEmpty)
    assert(kept == ids.filterNot(dropped).sorted.toSeq)
  }
}
