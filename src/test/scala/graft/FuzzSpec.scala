package graft

import graft.engine.{Dedup, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property checks for the driver-side algorithmic
  * kernels — hundreds of generated cases per property, deterministic
  * across runs (fixed seeds), no Spark session needed. */
class FuzzSpec extends AnyFunSuite {

  test("lossy counting: candidate superset holds on random skewed streams") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 100) {
      val w = 20 + rnd.nextInt(200)
      val nHeavy = 1 + rnd.nextInt(10)
      val n = 500 + rnd.nextInt(20000)
      // mixture: heavy terms with prob ~50%, else a long random tail
      val stream = Seq.fill(n) {
        if (rnd.nextBoolean()) s"h${rnd.nextInt(nHeavy)}"
        else s"t${rnd.nextInt(n)}"
      }
      val survivors = TextOps.lossyCandidates(stream.iterator, w).toSet
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val bound = n.toDouble / w
      exact.foreach { case (t, c) =>
        if (c > bound) assert(survivors(t),
          s"trial $trial: dropped $t count=$c bound=$bound w=$w n=$n")
      }
    }
  }

  test("distributed summary merge: heavy terms survive, candidates stay ≤ w") {
    // the qHeavyHitters two-level protocol on random partitioned
    // streams: per-partition lossySummary, then Σ counts ≥
    // threshold − N/w keeps every true heavy hitter while at most w
    // terms can clear the bar
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 50) {
      val w = 40 + rnd.nextInt(100)
      val denom = w / 2
      val nParts = 1 + rnd.nextInt(8)
      val n = 2000 + rnd.nextInt(20000)
      val nHeavy = 1 + rnd.nextInt(8)
      val stream = Seq.fill(n) {
        if (rnd.nextInt(100) < 40) s"h${rnd.nextInt(nHeavy)}"
        else s"t${rnd.nextInt(n)}"
      }
      val parts = stream.grouped((n + nParts - 1) / nParts).toSeq
      val merged = parts
        .flatMap(p => TextOps.lossySummary(p.iterator, w))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val threshold = math.max(1L, n.toLong / denom)
      val mergeBar = math.max(1.0, threshold.toDouble - n.toDouble / w)
      val cand = merged.filter(_._2 >= mergeBar).keySet
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      exact.foreach { case (t, c) =>
        if (c >= threshold) assert(cand(t),
          s"trial $trial: heavy $t (count=$c, thr=$threshold) not a candidate")
      }
      assert(cand.size <= w, s"trial $trial: ${cand.size} candidates > w=$w")
    }
  }

  test("union-find labels equal a BFS transitive closure on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 100) {
      val nV = 2 + rnd.nextInt(60)
      val nE = 1 + rnd.nextInt(120)
      val edges = Array.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val labels = Dedup.unionFind(edges).toMap
      // independent BFS closure over the same edge set
      val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
        .withDefaultValue(Nil)
      edges.foreach { case (a, b) =>
        adj(a) = b :: adj(a); adj(b) = a :: adj(b)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val seen = scala.collection.mutable.Set.empty[Long]
      verts.sorted.foreach { v =>
        if (!seen(v)) {
          val comp = scala.collection.mutable.Set(v)
          var frontier = List(v)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj).filterNot(comp)
            comp ++= frontier
          }
          seen ++= comp
          val m = comp.min
          comp.foreach { u =>
            assert(labels(u) == m, s"trial $trial: vertex $u")
          }
        }
      }
    }
  }

  test("expression kernels: interpreted eval matches a driver recompute " +
      "on random matrices") {
    // NearestCentroid / TopCells / HyperplaneSig share the
    // sequential-dot contract; fuzz their nullSafeEval against an
    // independently-written recompute across random dims/k/values
    // (the codegen paths are pinned equal to eval by their specs)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(29)
    def seqDot(a: Array[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    for (trial <- 1 to 300) {
      val dim = 1 + rnd.nextInt(80)
      val k = 1 + rnd.nextInt(60)
      val cent = IndexedSeq.fill(k)(
        IndexedSeq.fill(dim)(rnd.nextDouble() * 4 - 2))
      val v = Array.fill(dim)(rnd.nextDouble() * 4 - 2)
      val arr = new GenericArrayData(v)
      val child = Literal(1) // unused: nullSafeEval is called directly

      val nc = graft.functions.NearestCentroid(child, cent.map(_.toSeq))
        .nullSafeEval(arr).asInstanceOf[Int]
      val d2s = cent.map(c => seqDot(v, c) * -2.0 +
        c.foldLeft(0.0)((s, x) => s + x * x))
      assert(nc == d2s.indexOf(d2s.min), s"trial $trial NC")

      val topN = 1 + rnd.nextInt(math.min(k, 5))
      val tc = graft.functions.TopCells(child, cent.map(_.toSeq), topN)
        .nullSafeEval(arr).asInstanceOf[GenericArrayData]
        .toIntArray().toSeq
      val ips = cent.map(c => seqDot(v, c))
      val want = ips.zipWithIndex.sortBy { case (ip, i) => (-ip, i) }
        .take(topN).map(_._2)
      assert(tc == want, s"trial $trial TopCells")

      val bits = math.min(k, 63)
      val hs = graft.functions.HyperplaneSig(child,
        cent.take(bits).map(_.toSeq))
        .nullSafeEval(arr).asInstanceOf[Long]
      val wantSig = (0 until bits).foldLeft(0L) { (s, j) =>
        if (seqDot(v, cent(j)) >= 0) s | (1L << j) else s
      }
      assert(hs == wantSig, s"trial $trial HyperplaneSig")
    }
  }

  test("int8 quantization arithmetic: bounds hold for random vectors") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 500) {
      val dim = 1 + rnd.nextInt(128)
      val scalePow = rnd.nextInt(12) - 6 // magnitudes 1e-6 .. 1e6
      val v = Array.fill(dim)(
        (rnd.nextDouble() * 2 - 1) * math.pow(10, scalePow))
      val m = v.map(math.abs).max
      if (m > 0) {
        val s = m / 127.0
        v.foreach { x =>
          // the engine's exact fp expression (Similarity.qEmbedQuantize)
          val q = math.floor(x * 127.0 / m + 0.5)
          assert(q >= -127 && q <= 127, s"trial $trial: code $q")
          assert(math.abs(q * s - x) <= s / 2 + m * 1e-12,
            s"trial $trial: reconstruction off")
        }
      }
    }
  }

  test("segment blocking: complete for levenshtein <= 3 random edits") {
    // the Dedup.segmentKeys/segmentProbeKeys PassJoin theorem,
    // fuzzed: for ANY pair within levenshtein 3 (both lengths >= 4),
    // some clean segment must appear exactly in the probe within
    // its +-3 shift window under the same (length, index) context —
    // a counterexample would mean q_fuzzy_lev3's "oracle = brute
    // force" equality rests on luck, not the theorem
    val rnd = new scala.util.Random(31)
    val tau = 3
    def segs(s: String): Set[String] = {
      val L = s.length; val k = tau + 1; val r = L % k; val q = L / k
      (0 to tau).map { i =>
        val start = i * q + math.min(i, r)
        val len = q + (if (i < r) 1 else 0)
        s"$L|$i|${s.substring(start, start + len)}"
      }.toSet
    }
    def probeKeys(s: String): Set[String] = {
      val lp = s.length
      (for {
        lc <- (lp - tau) to (lp + tau); if lc >= tau + 1
        r = lc % (tau + 1); q = lc / (tau + 1)
        i <- 0 to tau
        pb = i * q + math.min(i, r)
        len = q + (if (i < r) 1 else 0)
        d <- -tau to tau
        pa = pb + d; if pa >= 0 && pa <= lp - len
      } yield s"$lc|$i|${s.substring(pa, pa + len)}").toSet
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val alpha = "abcd"
    for (trial <- 1 to 2000) {
      val base = Seq.fill(4 + rnd.nextInt(16))(
        alpha(rnd.nextInt(alpha.length))).mkString
      var s = base
      for (_ <- 1 to rnd.nextInt(4)) {
        val op = rnd.nextInt(3)
        val i = rnd.nextInt(s.length + (if (op == 1) 1 else 0))
        s = op match {
          case 0 => s.updated(i, alpha(rnd.nextInt(alpha.length)))
          case 1 => s.take(i) + alpha(rnd.nextInt(alpha.length)) +
            s.drop(i)
          case 2 => if (s.length > 4) s.take(i) + s.drop(i + 1) else s
        }
      }
      val d = lev(base, s)
      if (d <= tau && s.length >= tau + 1)
        assert((segs(base) & probeKeys(s)).nonEmpty,
          s"trial $trial: no shared segment key for '$base' ~ '$s' (lev $d)")
    }
  }

  test("deletion neighborhood: complete for levenshtein <= 2 random edits") {
    // the Dedup.delNeighborhood blocking theorem, fuzzed: for ANY
    // pair within levenshtein 2 (random substitutions/insertions/
    // deletions, not just the fixture's corruption model), the
    // ≤2-deletion variant sets must intersect — a counterexample
    // here would mean the "oracle = brute force" equality of
    // q_fuzzy_indel rests on luck, not the theorem
    val rnd = new scala.util.Random(23)
    def d2(s: String): Set[String] = {
      val out = scala.collection.mutable.Set(s)
      def del1(x: String): Seq[String] =
        x.indices.map(i => x.take(i) + x.drop(i + 1))
      val one = del1(s)
      out ++= one
      one.foreach(v => out ++= del1(v))
      out.toSet
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val alpha = "abcd" // small alphabet maximizes tie/degenerate cases
    for (trial <- 1 to 2000) {
      val base = Seq.fill(2 + rnd.nextInt(16))(
        alpha(rnd.nextInt(alpha.length))).mkString
      var s = base
      for (_ <- 1 to rnd.nextInt(3)) {
        val op = rnd.nextInt(3)
        val i = rnd.nextInt(s.length + (if (op == 1) 1 else 0))
        s = op match {
          case 0 => s.updated(i, alpha(rnd.nextInt(alpha.length))) // sub
          case 1 => s.take(i) + alpha(rnd.nextInt(alpha.length)) +
            s.drop(i) // insert
          case 2 => if (s.length > 2) s.take(i) + s.drop(i + 1) else s
        }
      }
      val d = lev(base, s)
      if (d <= 2)
        assert((d2(base) & d2(s)).nonEmpty,
          s"trial $trial: no shared variant for '$base' ~ '$s' (lev $d)")
    }
  }

}
