package graft

import graft.engine.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: word 3-grams, distinct, empty when under 3 tokens") {
    val r = Seq("a b c d", "a b", "  ", "x x x x")
      .toDF("text").select(Dedup.shingles(col("text")).as("s"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq.empty)
    assert(r(2) == Seq.empty)
    assert(r(3) == Seq("x x x")) // distinct collapses repeats
  }

  test("cross-source overlap equals a driver-side shingle recompute") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    def shingles(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.map(d => shingles(d._2)).reduce(_ ++ _)).toMap
    val sources = bySource.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices; j <- i + 1 until sources.length
      n = (bySource(sources(i)) & bySource(sources(j))).size
      if n > 0
    } yield (sources(i), sources(j), n.toLong)).toSeq
    val out = Dedup.qCrossSourceOverlap(spark, sf0001)
      .as[(String, String, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out == expected)
  }

  test("minhash+LSH output equals exact inverted-index Jaccard at sf0.001") {
    val exact = Dedup.qJaccardPairs(spark, sf0001).collect().toSeq
    val lsh = Dedup.qDedupMinhash(spark, sf0001).collect().toSeq
    assert(exact.nonEmpty) // planted near-dup pairs exist in testdata
    assert(lsh == exact)
  }

  test("bloom-prefiltered contamination equals the exact path") {
    val exact = Dedup.qContamination(spark, sf0001).collect().toSeq
    val bloom = Dedup.qContaminationBloom(spark, sf0001).collect().toSeq
    assert(exact.nonEmpty)
    // the Bloom pre-pass only prunes: false positives die in the exact
    // verify join, true positives can't be filtered out (no false
    // negatives by construction) → byte-identical output
    assert(bloom == exact)
  }

  test("simhash: near-identical docs collide, distance respects edits") {
    val pairs = Dedup.qSimhashPairs(spark, sf0001)
      .select("ida", "idb", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 3))
    // sanity: simhash pairs at hamming<=3 heavily overlap the exact
    // Jaccard>=0.8 near-dup pairs (same planted duplicates)
    val exact = Dedup.qJaccardPairs(spark, sf0001)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val hits = pairs.count(p => exact.contains((p._1, p._2)))
    assert(hits > 0)
  }

  test("clusters: min-label components equal transitive closure of pairs") {
    val pairs = Dedup.minhashPairs(spark, sf0001)
      .select("ida", "idb").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // independent reference closure: BFS over the adjacency map
    // (deliberately NOT Dedup.unionFind, which the driver path uses)
    val adj = scala.collection.mutable.Map.empty[Long,
      scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val labelOf = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!labelOf.contains(start)) {
        val comp = scala.collection.mutable.Set(start)
        val queue = scala.collection.mutable.Queue(start)
        while (queue.nonEmpty) {
          adj(queue.dequeue()).foreach { n =>
            if (comp.add(n)) queue.enqueue(n)
          }
        }
        val label = comp.min
        comp.foreach(v => labelOf(v) = label)
      }
    }
    val expected = labelOf.toSeq.sorted
    val got = Dedup.qDedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // at least one cluster must be larger than a single pair for the
    // transitivity to be exercised
    assert(expected.groupBy(_._2).values.exists(_.size >= 2))
  }

  test("golden record: survivorship equals a driver recompute over the clusters") {
    val out = Dedup.qGoldenRecord(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val clusters = Dedup.qDedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val attrs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    val expect = clusters.groupBy(_._2).toSeq.map { case (cid, ms) =>
      val rows = ms.map(m => attrs(m._1))
      val survivor = rows.maxBy(r => (r._4, -r._1))
      (cid, rows.size.toLong, survivor._1, survivor._4,
        rows.map(_._3).distinct.size.toLong,
        rows.map(_._2).distinct.size.toLong)
    }.sortBy(_._1)
    assert(out == expect && out.nonEmpty)
    // every emitted cluster is a genuine duplicate group, and the
    // survivor always carries the cluster's max completeness
    assert(out.forall(_._2 >= 2))
    assert(out.forall(r => attrs(r._3)._4 == r._4))
  }

  test("distributed components: long chain converges in O(log n) star rounds") {
    // A chain is the worst case for min-label propagation (rounds =
    // component diameter ≈ n); alternating large-star/small-star must
    // label it in ~log₂(n) rounds. Ids are permuted so the component
    // min sits at a random chain position, and a ring + duplicate +
    // self-loop edges exercise canonicalization.
    val n = 256
    val rnd = new scala.util.Random(7L)
    val ids = rnd.shuffle((100000L until (100000L + n)).toVector)
    val chain = ids.sliding(2).map(s => (s(0), s(1))).toSeq
    val extras = Seq((5L, 6L), (6L, 7L), (7L, 5L), (6L, 5L), (9L, 9L))
    val edges = spark.createDataset(chain ++ extras).toDF("ida", "idb")
    val (labels, rounds) = Dedup.connectedComponents(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == n + 4)
    val minChain = ids.min
    assert(ids.forall(v => got(v) == minChain))
    assert(Seq(5L, 6L, 7L).forall(v => got(v) == 5L))
    assert(got(9L) == 9L) // self-loop vertex is its own component
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2
    assert(rounds <= bound, s"rounds=$rounds exceeds O(log n) bound $bound")
  }

  test("distributed components agree with union-find on a random graph") {
    // 600 vertices, 500 random edges (seeded) → a mix of isolated
    // pairs, trees, and multi-cycle components; labels must equal the
    // driver-path union-find exactly
    val rnd = new scala.util.Random(42L)
    val edges = Seq.fill(500)((rnd.nextInt(600).toLong, rnd.nextInt(600).toLong))
    val (labels, _) = Dedup.connectedComponents(
      edges.toDF("ida", "idb"))
    val got = labels.as[(Long, Long)].collect().sorted.toSeq
    val expected = Dedup.unionFind(edges.toArray).toSeq.sorted
    // unionFind labels only edge ENDPOINTS, as does connectedComponents
    assert(got == expected)
  }

  test("exact dedup groups by canonical fingerprint") {
    val d = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = d.select(graft.engine.TextOps.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .as[(String, Long, Long)].collect()
    assert(out.length == 2)
    assert(out(0)._2 == 1L && out(0)._3 == 2L) // case/space-insensitive dup
  }

  test("incremental dedup: history hits dropped, batch deduped, no Bloom losses") {
    // planted structure the fixture corpus lacks (it has no exact
    // dupes): fp "a" seen in history, "b" duplicated within the
    // batch, "c"/"d" genuinely new, plus 5k history distractors to
    // give Bloom false positives room to appear (the exact anti-join
    // must absorb them)
    val batch = Seq((10L, "a"), (11L, "b"), (12L, "b"), (13L, "c"),
      (14L, "d")).toDF("doc_id", "fp").persist()
    val history = (Seq("a") ++ (0 until 5000).map(i => s"h$i"))
      .toDF("fp")
    val out = Dedup.incrementalKeep(batch, history)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("b", 11L, 2L), ("c", 13L, 1L), ("d", 14L, 1L)))
    batch.unpersist()
  }

  test("incremental dedup: equals the naive anti-join on random batch/history splits") {
    // the Bloom prune is an OPTIMIZATION — for any overlap structure
    // the output must equal the plain (batch minus history) grouped
    // result; small fingerprint alphabets make collisions (intra-
    // batch dupes, history hits) the common case
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val alphabet = (0 until 8 + rnd.nextInt(24)).map(i => s"f$i")
      val batch = (0 until 1 + rnd.nextInt(40)).map(i =>
        (i.toLong, alphabet(rnd.nextInt(alphabet.size))))
      val history = (0 until rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size)))
      val bdf = batch.toDF("doc_id", "fp").persist()
      val out = Dedup.incrementalKeep(bdf, history.toDF("fp"))
        .as[(String, Long, Long)].collect().toSeq
      bdf.unpersist()
      val hist = history.toSet
      val expected = batch.filterNot(b => hist(b._2))
        .groupBy(_._2).map { case (fp, rows) =>
          (fp, rows.map(_._1).min, rows.size.toLong)
        }.toSeq.sortBy(_._2)
      assert(out == expected, s"trial $trial: $out vs $expected")
    }
  }

  test("pagerank: equal to a driver-side integer-recurrence recompute") {
    val out = Dedup.qPagerank(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // independent recompute from the EXACT pair set (qJaccardPairs ==
    // the minhash pair set by the banding bound)
    val pairs = Dedup.qJaccardPairs(spark, sf0001)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = und.map(_._1).distinct.sorted
    val n = nodes.size
    val s = Dedup.pagerankScale
    var r = nodes.map(v => v -> s / n).toMap
    (1 to Dedup.pagerankIters).foreach { _ =>
      val sums = und.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v =>
        v -> (15 * (s / n) / 100 + 85 * sums.getOrElse(v, 0L) / 100)).toMap
    }
    assert(out == nodes.map(v => (v, r(v))))
    // mass conservation sanity: floor dust only (≤ ~2 units/node/iter)
    val total = out.map(_._2).sum
    assert(total <= s && total > s - 300L * n, s"total=$total n=$n")
  }

  test("bfs hops: equals a driver-side BFS; every distance class is live") {
    val out = Dedup.qBfsHops(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val pairs = Dedup.qJaccardPairs(spark, sf0001)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = und.map(_._1).distinct
      .filter(_ % Dedup.bfsSeedMod == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1 to Dedup.bfsMaxHops) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    assert(out == dist.toSeq.sortBy(_._1) && out.nonEmpty)
    // non-degenerate on the fixture: seeds AND 1-hop nodes exist, and
    // not every graph node is reached (unreached-emits-no-row branch
    // live). The fixture's near-dup clusters are shallow cliques —
    // nothing sits >= 2 hops from a mod-5 seed (probed across seed
    // densities 5..100), so deep frontiers are covered on the crafted
    // chain below, the dqChecks convention.
    assert(out.exists(_._2 == 0) && out.exists(_._2 == 1))
    assert(out.size < und.map(_._1).distinct.size)
  }

  test("bfs core: chain graph settles each node at its min hop; cap honored") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus a shortcut 0-4: node 4 must settle at 1
    // (not 4), node 3 at 2 (via 4), node 5 at 2; the hop cap stops a
    // 7-node tail
    val edges = Seq((0L,1L),(1L,2L),(2L,3L),(3L,4L),(4L,5L),(0L,4L),
      (5L,6L),(6L,7L),(7L,8L))
    val und = (edges ++ edges.map(p => (p._2, p._1)))
      .toDF("src", "dst")
    val seeds = Seq((0L, 0L)).toDF("node", "dist")
    val got = Dedup.bfsFrom(und, seeds, 3)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L,0L),(1L,1L),(2L,2L),(3L,2L),(4L,1L),(5L,2L),
      (6L,3L)))
  }

  test("containment: equals a brute-force recompute; fixture has an asymmetric pair") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = for {
      a <- ids; b <- ids; if a != b
      inter = (sets(a) & sets(b)).size
      c = inter.toDouble / sets(a).size
      if c >= 0.9
    } yield (a, b, c)
    val out = Dedup.qContainment(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == expected && out.nonEmpty)
    // the asymmetric case Jaccard cannot see: at least one pair where
    // a is enclosed in b but b is NOT (mostly) inside a
    val dir = out.map(p => (p._1, p._2)).toSet
    assert(out.exists(p => !dir.contains((p._2, p._1))))
  }

  test("prefix filter: same exact pair set, strictly smaller candidate volume") {
    // output equality with the full inverted-index path — completeness
    // of the prefix theorem on real data
    val full = Dedup.qJaccardPairs(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    val pref = Dedup.qJaccardPrefix(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pref == full && pref.nonEmpty)
    // the scale claim: prefix-join candidate pairs ≪ the inverted
    // index's Σ C(df,2) — measured, not asserted by vibes
    val idx = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val fullCand = idx
      .select(explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .agg(sum(expr("df * (df - 1) DIV 2"))).as[Long].head()
    // re-derive the prefix index by the operator's recipe (any total
    // hash order gives the same VOLUME profile; xxhash64 stands in
    // for the engine's FNV identity) and count its join pairs
    val withHashes = idx.select(col("doc_id"),
      expr("transform(sh, x -> xxhash64(x))").as("sh"))
    val pidx = withHashes.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    val dfTab = pidx.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefCand = pidx.join(dfTab, Seq("shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(lit(0.8) * col("n")) + 1)
      .groupBy(col("shingle")).agg(count(lit(1)).as("pdf"))
      .agg(sum(expr("pdf * (pdf - 1) DIV 2"))).as[Long].head()
    assert(prefCand < fullCand / 5,
      s"prefix candidates $prefCand vs full $fullCand")
  }

  test("idf cosine pairs: equals an exact-rational brute force; idf reorders vs jaccard") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty).toMap
    val n = sets.size.toLong
    val df = sets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val w = df.collect {
      case (s, d) if d < n => s -> graft.functions.FixLog2.ref(n, d)
    }
    val n2 = sets.view.mapValues(_.toSeq.map(s =>
      w.getOrElse(s, 0L)).map(x => x * x).sum).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = for {
      a <- ids; b <- ids; if a < b
      // weights are equal on both sides, so wa·wb = w² per shared shingle
      dotQ = (sets(a) & sets(b)).toSeq.map(s => w.getOrElse(s, 0L))
        .map(x => x * x).sum
      // exact rational threshold, no doubles anywhere in the decision
      if dotQ > 0
      if BigInt(5 * dotQ).pow(2) >= BigInt(n2(a)) * BigInt(16 * n2(b))
    } yield (a, b, dotQ,
      dotQ.toDouble / math.sqrt(n2(a).toDouble * n2(b).toDouble))
    val out = Dedup.qIdfCosinePairs(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == expected.toSeq && out.nonEmpty)
    // the weighting MEANS something: the cosine ranking differs from
    // the jaccard ranking over the common pairs (idf re-ordered them)
    val jac = Dedup.qJaccardPairs(spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val common = out.filter(p => jac.contains((p._1, p._2)))
    assert(common.nonEmpty)
    val byCos = common.sortBy(-_._4).map(p => (p._1, p._2))
    val byJac = common.sortBy(p => -jac((p._1, p._2))).map(p => (p._1, p._2))
    assert(byCos != byJac || common.size <= 2)
  }

  test("fuzzy join: planted recall 100%, equal to a driver-side recompute") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_name").as[(Long, String)].collect()
      .toSeq.sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hex4(h: String, start: Int): Int =
      Integer.parseInt(h.substring(start - 1, start + 3), 16)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def corrupt(k: Long, name: String): String = {
      val h = md5hex(s"fz|$k")
      val cs = name.toCharArray
      cs(hex4(h, 1) % 9) = alpha(hex4(h, 9) % 26)  // p1 first,
      cs(hex4(h, 5) % 9) = alpha(hex4(h, 13) % 26) // p2 wins a tie
      new String(cs)
    }
    def chunks(s: String): Set[(Int, String)] =
      (0 until 3).map(j => j -> s.zipWithIndex.collect {
        case (c, p) if p % 3 == j => c }.mkString).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val probes = cust.filter(c => hex4(md5hex(c._1.toString), 1) % 100 < 50)
      .map { case (k, n) => (k, corrupt(k, n)) }
    val expect = (for {
      (pk, pn) <- probes
      (ck, cn) <- cust
      if (chunks(pn) & chunks(cn)).nonEmpty
      d = lev(pn, cn) if d <= 2
    } yield (pk, ck, d.toLong)).sortBy(t => (t._1, t._2))
    val got = Dedup.qFuzzyJoin(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // the planted contract: every corrupted probe re-links to its
    // source (substitution class ⇒ pigeonhole blocking is complete)
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(probes.nonEmpty && probes.forall(p => gotPairs((p._1, p._1))))
  }

  test("indel fuzzy join: equals the brute-force cross join exactly") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_name").as[(Long, String)].collect()
      .toSeq.sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hex4(h: String, start: Int): Int =
      Integer.parseInt(h.substring(start - 1, start + 3), 16)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // one md5-derived deletion then one insertion — the alignment-
    // shifting class the striped-chunk blocking cannot cover
    def corrupt(k: Long, name: String): String = {
      val h = md5hex(s"fzi|$k")
      val pd = hex4(h, 1) % 9
      val pi = hex4(h, 5) % 9
      val li = alpha(hex4(h, 9) % 26)
      val del = name.substring(0, pd) + name.substring(pd + 1)
      del.substring(0, pi) + li + del.substring(pi)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val probes = cust.filter(c => hex4(md5hex(c._1.toString), 1) % 100 < 10)
      .map { case (k, n) => (k, corrupt(k, n)) }
    // NO blocking in the expectation — the deletion-neighborhood
    // completeness theorem says the blocked join must equal the full
    // cross join's lev ≤ 2 pairs
    val expect = (for {
      (pk, pn) <- probes
      (ck, cn) <- cust
      d = lev(pn, cn) if d <= 2
    } yield (pk, ck, d.toLong)).sortBy(t => (t._1, t._2))
    val got = Dedup.qFuzzyIndel(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // the planted contract: every corrupted probe re-links to its
    // source (recall = 100% on the planted indel class)
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(probes.nonEmpty && probes.forall(p => gotPairs((p._1, p._1))))
  }

  test("triangles: crafted clique/chain graph and a random brute-force check") {
    // 4-clique {1,2,3,4}: every node sits in C(3,2)=3 triangles; the
    // chain 5-6-7 and the isolated pair 8-9 contribute none
    val clique = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
    val crafted = (clique ++ Seq((5L, 6L), (6L, 7L), (8L, 9L)))
      .toDF("ida", "idb")
    val out = Dedup.triangleCounts(crafted).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // random graph vs a driver-side brute force over all id triples
    val rnd = new scala.util.Random(7)
    val edges = (for (a <- 1L to 12L; b <- (a + 1) to 12L
      if rnd.nextDouble() < 0.35) yield (a, b)).toSeq
    val got = Dedup.triangleCounts(edges.toDF("ida", "idb"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val es = edges.toSet
    val tris = for (x <- 1L to 12L; y <- (x + 1) to 12L; z <- (y + 1) to 12L
      if es((x, y)) && es((y, z)) && es((x, z))) yield (x, y, z)
    val expect = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    assert(got == expect && tris.nonEmpty)
    // orientation invariance: the degree-ordered twin (the shipped
    // qTriangles path) produces identical per-node counts
    val gotDeg = Dedup.triangleCountsDeg(edges.toDF("ida", "idb"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(gotDeg == expect)
    // smoke the full fixture path end-to-end (canonical pair ordering
    // of minhashPairs is what the wedge join's correctness rests on)
    val fix = Dedup.qTriangles(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(fix.forall(_._2 > 0))
  }

  test("ngram novelty: equal to a full driver-side string-shingle recompute") {
    val out = Dedup.qNgramNovelty(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    // independent recompute on SHINGLE STRINGS (the oracle identity),
    // not the engine's FNV hashes — catches both arithmetic drift and
    // hash-identity drift
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def sh(t: String): Set[String] = {
      val tk = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => (id, sh(t)) }.filter(_._2.nonEmpty)
    val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expect = sets.map { case (id, s) =>
      val uniq = s.count(df(_) == 1).toLong
      (id, s.size.toLong, uniq, uniq.toDouble / s.size)
    }.sortBy(_._1)
    assert(out == expect)
    // the fixture's planted exact duplicates make the signal non-vacuous:
    // some docs share every shingle (novelty 0), some are fully unique
    assert(out.exists(_._4 == 0.0) && out.exists(_._4 > 0.5))
  }
  test("fuzzyLinkSegments: equals the unblocked brute force on mixed-length corpora (short-string side channel)") {
    // the r17 side channel: strings of length <= tau (including empty)
    // previously raised; now they must link EXACTLY like the brute
    // force — the length-window candidate set is provably complete
    // (a qualifying pair's lengths differ by <= tau), so any
    // divergence is a wiring bug, not a theorem gap
    val rnd = new scala.util.Random(97)
    val tau = 3
    val alpha = "abc"
    def word(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(
        alpha(rnd.nextInt(alpha.length))).mkString
    // lengths 0..10 on both sides — dense around the tau boundary
    val probes = (1 to 120).map(i => (i.toLong, word(10)))
    val clean = (1 to 150).map(i => (i.toLong + 1000, word(10)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (pid, pn) <- probes; (mid, cn) <- clean
      d = lev(pn, cn) if d <= tau
    } yield (pid, mid, d.toLong)).toSet
    assert(expect.exists(_._3 > 0) &&
      probes.exists(_._2.length <= tau) && clean.exists(_._2.length <= tau),
      "test premise: short strings and nontrivial matches must exist")
    val got = Dedup.fuzzyLinkSegments(
        probes.toDF("probe_id", "probe_name"),
        clean.toDF("match_id", "clean_name"), tau)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

}
