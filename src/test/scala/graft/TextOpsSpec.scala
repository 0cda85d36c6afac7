package graft

import graft.engine.TextOps

/** Unit checks for text operators whose edge cases the SF oracles
  * can't easily pin (the oracle gate covers the bulk semantics). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lossy counting: every term above the support bound survives the summary") {
    // adversarial-ish stream: a few heavy terms buried in a long tail
    // of near-distinct noise, shuffled deterministically
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(150)("beta") ++
      Seq.fill(60)("gamma")
    val noise = (0 until 5000).map(i => s"t${i % 2500}")
    val stream = new scala.util.Random(42).shuffle(heavy ++ noise)
    val w = 100
    val survivors = TextOps.lossyCandidates(stream.iterator, w).toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val bound = stream.size.toDouble / w
    // the lossy-counting guarantee: count > N/w ⇒ survives
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(survivors(t), s"$t (count=${exact(t)}) dropped, bound=$bound")
    }
    // and the summary stayed small — the point of the sketch
    assert(survivors.size < exact.size / 5,
      s"${survivors.size} survivors of ${exact.size} distinct")
  }

  test("heavy hitters: exact counts, equal to a brute-force re-derivation") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qHeavyHitters(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    assert(out.nonEmpty)
    // brute force: full exact term counts, thresholded the same way
    val terms = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        TextOps.tokens(col("text"))).as("t"))
      .as[String].collect()
    val threshold = math.max(1L, terms.length / 500L)
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toSeq
      .sortBy { case (t, n) => (-n, t) }
    assert(out == exact)
  }

  test("redaction: crafted patterns fire; engine md5 equals a driver-side replace") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val num = "[0-9]{6,}"
    // pattern behavior pinned on crafted input (incl. two-pass order:
    // the email pass consumes the digits inside the address)
    val crafted = "mail a@b.co or c.d+x1234567@e-f.org, acct 7654321, zip 12345"
    assert(crafted.replaceAll(email, "<EMAIL>").replaceAll(num, "<NUM>")
      == "mail <EMAIL> or <EMAIL>, acct <NUM>, zip 12345")
    // engine output vs an independent driver-side java.util.regex pass
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = TextOps.qRedact(spark, sf0001)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == docs.size)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.take(100).foreach { case (id, ne, nn, h) =>
      val t = docs(id)
      assert(ne == email.r.findAllIn(t).size, s"doc $id")
      assert(nn == num.r.findAllIn(t).size, s"doc $id")
      assert(h == md5hex(
        t.replaceAll(email, "<EMAIL>").replaceAll(num, "<NUM>")), s"doc $id")
    }
  }

  test("chunking: 48-stride 64-wide windows cover every token, md5-pinned") {
    import org.apache.spark.sql.functions.col
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect().toMap
    val out = TextOps.qChunk(spark, sf0001)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // empty-token docs emit nothing; everything else fully re-derived
    assert(out.keySet == toks.filter(_._2.nonEmpty).keySet)
    out.view.take(60).foreach { case (id, chunks) =>
      val tk = toks(id)
      // starts stop once a window would add no new tokens (fully
      // contained in its predecessor): last start ≤ len − 17
      val starts = 0 until math.max(tk.length - 16, 1) by 48
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == starts.map(_.toLong))
      sorted.foreach { case (_, cid, start, nTok, h) =>
        assert(cid == start / 48)
        assert(nTok == math.min(64, tk.length - start))
        assert(h == md5hex(
          tk.slice(start.toInt, start.toInt + 64).mkString(" ")))
      }
      // coverage: chunk spans reach the last token
      assert(sorted.last._3 + sorted.last._4 == tk.length)
    }
  }

  test("repetition stats: hand-computed fractions and short-doc nulls") {
    val out = TextOps.qRepetitionStats(spark, sf0001)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(out.nonEmpty)
    // fractions are well-formed wherever defined
    out.foreach { case (_, n, bf, tf) =>
      bf.foreach(f => assert(f > 0.0 && f <= 1.0))
      tf.foreach(f => assert(f >= 0.0 && f <= 1.0))
      assert(bf.isDefined == (n >= 2) && tf.isDefined == (n >= 3))
    }
    // independent recomputation (sliding-window, groupBy — a different
    // formulation than the engine's imperative hash-count loop)
    def stats(text: String): (Long, Option[Double], Option[Double]) = {
      val tk = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      def grams(g: Int) = tk.sliding(g).filter(_.length == g)
        .map(_.mkString(" ")).toSeq
      val bg = grams(2); val tg = grams(3)
      (tk.length.toLong,
        if (bg.isEmpty) None
        else Some(bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size),
        if (tg.isEmpty) None
        else Some(tg.groupBy(identity).values.filter(_.size >= 2)
          .map(_.size).sum.toDouble / tg.size))
    }
    // hand-computed: tokens [a b a b c] → bigrams (a b)×2 (b a) (b c)
    // → top 2/4; trigrams all unique → 0/3
    assert(stats("A  b a B c") == ((5L, Some(0.5), Some(0.0))))
    assert(stats("solo") == ((1L, None, None)))
    assert(stats("") == ((0L, None, None)))
    // and the engine agrees with the independent recomputation on the
    // real corpus
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out.take(50).foreach { case (id, n, bf, tf) =>
      val (en, ebf, etf) = stats(docs(id))
      assert((n, bf, tf) == ((en, ebf, etf)), s"doc $id")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("passage dedup: global keep-first in (doc_id, pos) order, md5 of survivors") {
    val out = TextOps.qPassageDedup(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.nonEmpty)
    // independent recomputation: sequential corpus walk with a seen-set
    // (a different formulation than the engine's window-over-shuffle)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expect = docs.toSeq.flatMap { case (id, text) =>
      val tk = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val ps = tk.grouped(TextOps.passageLen).map(_.mkString(" ")).toSeq
      if (ps.isEmpty) None
      else {
        val kept = ps.filter(seen.add)
        Some((id, ps.length.toLong, kept.length.toLong,
          md5hex(kept.mkString(" "))))
      }
    }
    assert(out == expect)
    // the corpus' planted duplicates actually exercise the drop path
    assert(out.exists { case (_, n, k, _) => k < n })
  }

  test("substring dedup: sequential-walk recompute, span union, keep-first") {
    val w = TextOps.substrLen
    val out = TextOps.qSubstringDedup(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.nonEmpty)
    // independent recomputation: sequential corpus walk — first
    // occurrence of each w-token window (by string, not the engine's
    // fnv1a hash) recorded in a seen-map; later instances mark their
    // spans; removal is the per-doc span union
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    def tok(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expect = docs.toSeq.flatMap { case (id, text) =>
      val tk = tok(text)
      if (tk.isEmpty) None
      else {
        val removed = new Array[Boolean](tk.length)
        (0 to tk.length - w).foreach { i =>
          val win = tk.slice(i, i + w).mkString(" ")
          if (!seen.add(win)) (i until i + w).foreach(removed(_) = true)
        }
        val kept = tk.indices.filterNot(removed).map(tk)
        Some((id, tk.length.toLong, removed.count(identity).toLong,
          md5hex(kept.mkString(" "))))
      }
    }
    assert(out == expect)
    // the fixture's planted duplicates actually exercise removal
    assert(out.exists(_._3 > 0))
    // and partially: some doc keeps some tokens while losing others
    assert(out.exists(o => o._3 > 0 && o._3 < o._2))
  }

  test("BM25: retrieved docs share a query term, ranks dense, driver recompute") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qBm25(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { rows =>
      val ranks = rows.map(_._3).sorted
      assert(ranks == (1L to ranks.length) && ranks.length <= 5)
      // scores strictly ordered by (score desc, doc_id) along ranks
      val byRank = rows.sortBy(_._3)
      assert(byRank.sliding(2).forall(w => w.length < 2 ||
        w(0)._4 > w(1)._4 ||
        (w(0)._4 == w(1)._4 && w(0)._2 < w(1)._2)))
      assert(rows.forall(r => r._2 != r._1)) // self excluded
    }
    // independent driver-side recompute (third engine next to the
    // DuckDB oracle): same tokenization, rational idf, micro-unit sum
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def tok(t: String): Seq[String] =
      if (t == null) Seq.empty
      else t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val toks = docs.map { case (id, t) => id -> tok(t) }.toMap
    val nDocs = docs.length.toLong
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (w, xs) => (id, w, xs.size.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val dlm = toks.map { case (id, ts) => id -> ts.size.toLong }
    val avgdl = tf.map(_._3).sum.toDouble / nDocs
    val expect = (for {
      (qid, qts) <- toks.toSeq if qid < 8
      qterms = qts.zipWithIndex.groupBy(_._1)
        .map { case (w, xs) => (w, xs.map(_._2).min) }
        .toSeq.sortBy { case (w, p) => (p, w) }.take(4).map(_._1)
      (did, w, f) <- tf if did != qid && qterms.contains(w)
    } yield {
      val df = dfm(w)
      val c = ((((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
        * (f.toDouble * 2.2)
        / (f.toDouble + 1.2 * (0.25 + 0.75 * dlm(did).toDouble / avgdl))
        ) * 1e6
      ((qid, did), math.round(c))
    }).groupBy(_._1).map { case ((q, d2), xs) => (q, d2, xs.map(_._2).sum) }
      .toSeq.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.take(5)
          .map { case ((q, d2, s), i) => (q, d2, i + 1L, s) }
      }.toSeq.sortBy(t => (t._1, t._3))
    assert(out == expect)
  }

  test("BPE merge table: inputs are base chars or outputs of earlier rules") {
    // the invariant that makes exhaustive-in-rank-order application
    // equal classic lowest-rank-first BPE (see bpeMerges doc)
    val outputs = scala.collection.mutable.Set.empty[String]
    TextOps.bpeMerges.foreach { case (a, b) =>
      Seq(a, b).foreach { in =>
        assert(in.length == 1 || outputs(in),
          s"merge input '$in' is neither a base char nor an earlier output")
      }
      assert(outputs.add(a + b), s"duplicate merged token '${a + b}'")
    }
  }

  test("bpeEncode equals classic lowest-rank-first BPE") {
    // reference implementation: repeatedly merge the LEFTMOST
    // occurrence of the lowest-ranked adjacent pair — the textbook
    // encode loop, deliberately different code from the shipped
    // one-pass-per-rule walk
    val rank = TextOps.bpeMerges.zipWithIndex.toMap
    def classic(word: String): Seq[String] = {
      // code-point base symbols, matching the engine (and the
      // oracle's per-code-point regex split)
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      var done = false
      while (!done) {
        val pairs = syms.indices.dropRight(1).map(i => (syms(i), syms(i + 1)))
        pairs.filter(rank.contains).sortBy(rank).headOption match {
          case None => done = true
          case Some(p) =>
            val i = pairs.indexOf(p)
            syms = (syms.take(i) :+ (p._1 + p._2)) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    val known = Seq("the", "that", "with", "for", "was", "nation",
      "testing", "another", "whither", "aaa", "inging", "x", "")
    val rnd = new scala.util.Random(3L)
    val alpha = "ethanriosw" // chars dense in the merge table
    val fuzz = Seq.fill(300)(
      (0 until (1 + rnd.nextInt(12)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    (known ++ fuzz).foreach { w =>
      assert(TextOps.bpeEncode(w) == classic(w), s"word '$w'")
    }
    // spot-pin a few encodings so a merge-table edit is a visible diff
    assert(TextOps.bpeEncode("the") == Seq("the"))
    assert(TextOps.bpeEncode("that") == Seq("that"))
    assert(TextOps.bpeEncode("nation") == Seq("n", "at", "ion"))
    // an astral (non-BMP) character is ONE base symbol, never two
    // lone surrogates — the code-point convention the oracle's (.)
    // regex also follows
    assert(TextOps.bpeEncode("a𝄞b")
      == Seq("a", "𝄞", "b"))
  }

  test("qBpeTokens: sequential driver recompute at sf0.001") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qBpeTokens(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.toSeq.flatMap { case (id, text) =>
      val tk = text.toLowerCase(java.util.Locale.ROOT).trim
        .split("\\s+").filter(_.nonEmpty)
      if (tk.isEmpty) None
      else {
        val enc = tk.map(TextOps.bpeEncode)
        md.reset()
        val fp = md.digest(enc.map(_.mkString(" ")).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        Some((id, tk.length.toLong, enc.map(_.length.toLong).sum, fp))
      }
    }.sortBy(_._1)
    assert(out == expected)
    // BPE splits subwords: counts must be >= whitespace counts, and
    // strictly greater somewhere (else the table never fired)
    assert(out.forall { case (_, ntk, nbpe, _) => nbpe >= ntk })
    assert(out.exists { case (_, ntk, nbpe, _) => nbpe > ntk })
  }

  test("BPE training: independent classic trainer re-derives the table; paths agree") {
    import org.apache.spark.sql.functions.col
    // independent reference: word counts from the raw parquet, the
    // Sennrich get_stats/merge loop written directly
    val wordCounts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).as[String].collect()
      .flatMap(t => t.toLowerCase(java.util.Locale.ROOT).trim
        .split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words = wordCounts.toSeq.map { case (w, c) =>
      (w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector, c)
    }
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    for (r <- 1 to 16) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
        }
      }
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      expected += ((r.toLong, a, b, n))
      words = words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, c)
      }
    }
    val got = TextOps.qBpeTrain(spark, sf0001)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expected.toSeq)
    // the forced-distributed rounds path learns the identical table
    val dist = TextOps.qBpeTrainDist(spark, sf0001)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(dist == got)
    // and a learned table satisfies the replay invariant the pinned
    // encoder table documents: inputs are chars or earlier outputs
    val outputs = scala.collection.mutable.Set.empty[String]
    got.foreach { case (_, a, b, _) =>
      Seq(a, b).foreach(in => assert(in.length == 1 || outputs(in)))
      outputs += a + b
    }
  }

  test("bpeSimulateRound: each rule of the exact-replay proof, in isolation") {
    def cand(a: String, b: String, n: Long) = (a, b, n)
    val noT: Int => Map[String, Long] = _ => Map.empty
    def run(cands: (String, String, Long)*)(
        lT: Int => Map[String, Long] = noT,
        rT: Int => Map[String, Long] = noT,
        coll: Set[String] = Set.empty, nEdge: Long = 0L,
        remaining: Int = 16) =
      TextOps.bpeSimulateRound(cands.toIndexedSeq, lT, rT, coll,
        nEdge, remaining)
    // disjoint candidates, no triples: the whole window drains
    assert(run(cand("a", "b", 100), cand("c", "d", 90),
      cand("e", "f", 80))() ==
      IndexedSeq(("a", "b", 100L), ("c", "d", 90L), ("e", "f", 80L)))
    // shared input with an exact delta: (c,a) loses its triples
    // (c,a,b)=15 → count 75, re-sorted BELOW (e,f)=80 — the replay
    // emits the true sequential order with true counts, and the
    // created (c,ab)=15 row (untouched by the later merges: its c is
    // followed by ab, not a) is finally selected as a created pair
    assert(run(cand("a", "b", 100), cand("c", "a", 90),
      cand("e", "f", 80))(
      lT = i => if (i == 0) Map("c" -> 15L) else Map.empty) ==
      IndexedSeq(("a", "b", 100L), ("e", "f", 80L), ("c", "a", 75L),
        ("c", "ab", 15L)))
    // missing delta key = provably zero triples: count survives
    assert(run(cand("a", "b", 100), cand("c", "a", 90))() ==
      IndexedSeq(("a", "b", 100L), ("c", "a", 90L)))
    // created pair outranks the rest: (x,ab) enters with exact count
    // 95 from the left-triple map and is SELECTED — but being a
    // created pair, nothing after it is provable (no triple maps)
    assert(run(cand("a", "b", 100), cand("c", "d", 90))(
      lT = i => if (i == 0) Map("x" -> 95L) else Map.empty) ==
      IndexedSeq(("a", "b", 100L), ("x", "ab", 95L)))
    // created pair TIES a candidate and wins the (a,b) tie-break
    assert(run(cand("z", "w", 100), cand("c", "d", 90))(
      lT = i => if (i == 0) Map("a" -> 90L) else Map.empty) ==
      IndexedSeq(("z", "w", 100L), ("a", "zw", 90L)))
    // quad shape (b,a): tainted, and its bound ties the next pick —
    // the round must stop after the head
    assert(run(cand("a", "b", 100), cand("b", "a", 90),
      cand("e", "f", 90))() == IndexedSeq(("a", "b", 100L)))
    // ...but when the tainted bound is strictly below, replay goes on
    assert(run(cand("a", "b", 100), cand("b", "a", 80),
      cand("e", "f", 90))() ==
      IndexedSeq(("a", "b", 100L), ("e", "f", 90L)))
    // self-adjacent merge (a,a): emitted, then stop (run parity)
    assert(run(cand("a", "a", 100), cand("c", "d", 90))() ==
      IndexedSeq(("a", "a", 100L)))
    // output collision with a live symbol: emitted, then stop
    assert(run(cand("a", "b", 100), cand("c", "d", 90))(
      coll = Set("ab")) == IndexedSeq(("a", "b", 100L)))
    // window edge: second pick must be STRICTLY above nEdge
    assert(run(cand("a", "b", 100), cand("c", "d", 90))(nEdge = 90L) ==
      IndexedSeq(("a", "b", 100L)))
    assert(run(cand("a", "b", 100), cand("c", "d", 91))(nEdge = 90L) ==
      IndexedSeq(("a", "b", 100L), ("c", "d", 91L)))
    // remaining-merges cap
    assert(run(cand("a", "b", 100), cand("c", "d", 90),
      cand("e", "f", 80))(remaining = 2) ==
      IndexedSeq(("a", "b", 100L), ("c", "d", 90L)))
    // stale maps: the second merge (c,a) has b_s = a ∈ lh (a was an
    // applied LEFT half), so its whole left map is stale — (d,c) gets
    // tainted instead of updated, and blocks the round when its bound
    // ties the next exact row's count with a winning tie-break
    assert(run(cand("a", "b", 100), cand("c", "a", 90),
      cand("d", "c", 88), cand("z", "z9", 88))() ==
      IndexedSeq(("a", "b", 100L), ("c", "a", 90L)))
  }

  test("batchSegments/applySegment: hazard split and sequential equivalence") {
    import scala.collection.mutable.ArrayBuffer
    def seq(rules: Seq[(String, String)], word: Seq[String]): Seq[String] = {
      // the trivially-correct anchor: rule-by-rule full sweeps
      val buf = ArrayBuffer.from(word)
      rules.foreach { case (a, b) =>
        var i = 0
        while (i < buf.length - 1) {
          if (buf(i) == a && buf(i + 1) == b) {
            buf(i) = a + b; buf.remove(i + 1)
          } else i += 1
        }
      }
      buf.toSeq
    }
    def viaSegments(rules: IndexedSeq[(String, String)],
        word: Seq[String]): Seq[String] = {
      val segs = TextOps.batchSegments(rules)
      val ranks = segs.map(_.iterator.zipWithIndex.toMap)
      val buf = ArrayBuffer.from(word)
      segs.indices.foreach(i => TextOps.applySegment(buf, ranks(i), segs(i)))
      buf.toSeq
    }
    // no hazard → one segment
    val clean = IndexedSeq(("a", "b"), ("ab", "c"), ("d", "e"))
    assert(TextOps.batchSegments(clean).length == 1)
    // the hazard: r1's input "ab" is r2's OUTPUT — naive
    // lowest-rank-first over the whole batch would merge X+ab after
    // r2 re-materializes "ab", which sequential never does
    val hazard = IndexedSeq(("X", "ab"), ("a", "b"))
    assert(TextOps.batchSegments(hazard).length == 2)
    assert(viaSegments(hazard, Seq("X", "a", "b")) == Seq("X", "ab"))
    assert(seq(hazard, Seq("X", "a", "b")) == Seq("X", "ab"))
    // duplicate rule → split (the re-learned pair needs a fresh pass)
    val dup = IndexedSeq(("a", "b"), ("c", "d"), ("a", "b"))
    assert(TextOps.batchSegments(dup).length == 2)
    // randomized equivalence sweep, hazards and self-adjacency included
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 300) {
      val alpha = Vector("a", "b", "c")
      val word = Vector.fill(2 + rnd.nextInt(10))(
        alpha(rnd.nextInt(alpha.length)))
      var syms = Set("a", "b", "c")
      val rules = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val pool = syms.toVector.sorted
        val r = (pool(rnd.nextInt(pool.length)),
          pool(rnd.nextInt(pool.length)))
        syms += r._1 + r._2
        r
      }.toIndexedSeq
      assert(viaSegments(rules, word) == seq(rules, word),
        s"rules=$rules word=$word")
    }
  }

  test("BPE batched rounds equal the classic fit on adversarial random corpora") {
    // tiny alphabets force maximal candidate interaction (shared
    // symbols, output collisions, overlapping occurrences like
    // "ababab") and small random counts force ties at every level —
    // the regime where an unsound batching rule diverges fastest
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 24) {
      val alpha = "ab" + ("cde".take(rnd.nextInt(3)))
      val nWords = 4 + rnd.nextInt(14)
      val text = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)))
          .mkString
        val cnt = 1 + rnd.nextInt(6)
        Seq.fill(cnt)(w).mkString(" ")
      }.mkString(" ")
      val docs = Seq((1L, "synth", text)).toDF("doc_id", "source", "text")
      val nMerges = 3 + rnd.nextInt(10)
      // the trivially-correct anchor: full rescan per merge
      var naiveWords = text.split("\\s+").toSeq.groupBy(identity).toSeq
        .map { case (w, g) => (w.map(_.toString).toVector, g.size.toLong) }
      val naive = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var rr = 1
      var dry = false
      while (rr <= nMerges && !dry) {
        val cnt = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        naiveWords.foreach { case (s, c) =>
          s.indices.dropRight(1).foreach { i =>
            cnt.update((s(i), s(i + 1)),
              cnt.getOrElse((s(i), s(i + 1)), 0L) + c)
          }
        }
        if (cnt.isEmpty) dry = true
        else {
          val ((a, b), n) = cnt.minBy { case ((x, y), m) => (-m, x, y) }
          naive += ((rr.toLong, a, b, n))
          naiveWords = naiveWords.map { case (s, c) =>
            val o = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                o += a + b; i += 2
              } else { o += s(i); i += 1 }
            }
            (o.toVector, c)
          }
          rr += 1
        }
      }
      val drv = TextOps.bpeTrainOn(docs, nMerges,
        driverVocabLimit = Long.MaxValue)
        .as[(Long, String, String, Long)].collect().toSeq
      val dist = TextOps.bpeTrainOn(docs, nMerges, driverVocabLimit = -1L)
        .as[(Long, String, String, Long)].collect().toSeq
      // budget 0 forbids sub-dictionary collection, forcing every
      // round through the triple-map simulation — keeps the r18 head
      // path under the same adversarial fuzz after r19's tail mode
      val distHead = TextOps.bpeTrainOn(docs, nMerges,
        driverVocabLimit = -1L, wordBudget = 0L)
        .as[(Long, String, String, Long)].collect().toSeq
      assert(drv == naive.toSeq, s"trial $trial text='$text' merges=$nMerges")
      assert(dist == drv, s"trial $trial text='$text' merges=$nMerges")
      assert(distHead == drv,
        s"trial $trial (head path) text='$text' merges=$nMerges")
    }
  }

  test("BPE batched rounds under random tiny candidate windows (nEdge path)") {
    // batchK in {2,3,4} forces the window-edge guard and the filtered
    // triple maps on every round — the paths a 256-candidate window
    // never exercises on fixture-sized vocabularies
    val rnd = new scala.util.Random(424242L)
    for (trial <- 1 to 12) {
      val alpha = "abc".take(2 + rnd.nextInt(2))
      val words = (0 until 4 + rnd.nextInt(10)).map { _ =>
        val len = 1 + rnd.nextInt(7)
        ((0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString,
          1L + rnd.nextInt(6))
      }
      // collapse duplicate words (dictionary semantics)
      val dict = words.groupBy(_._1).toSeq
        .map { case (w, g) => (w.map(_.toString): Seq[String],
          g.map(_._2).sum) }
      val nMerges = 4 + rnd.nextInt(8)
      val batchK = 2 + rnd.nextInt(3)
      // budget 0: the triple-map head path under a tiny window
      val got = TextOps.bpeFitRounds(dict.toDS(), nMerges, batchK,
        wordBudget = 0L)
      // anchor: the incremental classic fit over the same dictionary
      var naive = dict.map { case (s, c) => (s.toVector, c) }
      val exp = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var rr = 1
      var dry = false
      while (rr <= nMerges && !dry) {
        val cnt = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        naive.foreach { case (s, c) =>
          s.indices.dropRight(1).foreach { i =>
            cnt.update((s(i), s(i + 1)),
              cnt.getOrElse((s(i), s(i + 1)), 0L) + c)
          }
        }
        if (cnt.isEmpty) dry = true
        else {
          val ((a, b), n) = cnt.minBy { case ((x, y), m) => (-m, x, y) }
          exp += ((rr.toLong, a, b, n))
          naive = naive.map { case (s, c) =>
            val o = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                o += a + b; i += 2
              } else { o += s(i); i += 1 }
            }
            (o.toVector, c)
          }
          rr += 1
        }
      }
      assert(got == exp.toSeq,
        s"trial $trial K=$batchK merges=$nMerges dict=$dict")
      // the r19 tail path under the SAME tiny windows: tailKMax =
      // batchK keeps the threshold window tight, exercising the
      // nEdge guard and the bounded (collision-allowance) entries
      val gotTail = TextOps.bpeFitRounds(dict.toDS(), nMerges, batchK,
        wordBudget = 1L << 40, tailKMax = batchK)
      assert(gotTail == exp.toSeq,
        s"trial $trial (tail, tight) K=$batchK merges=$nMerges dict=$dict")
      // and with the default wide window: full coverage, nEdge = 0 —
      // the whole remaining fit should land in one round
      val gotWide = TextOps.bpeFitRounds(dict.toDS(), nMerges, batchK)
      assert(gotWide == exp.toSeq,
        s"trial $trial (tail, wide) K=$batchK merges=$nMerges dict=$dict")
    }
  }

  test("BPE batched rounds with a tiny candidate window still match (K-cap path)") {
    // batchK=2 forces many rounds and exercises the prefix cap; the
    // corpus is the abab-overlap + collision-rich shape
    val text = "abab abab ab a b cdcd cdcd cd c d abcd abcd abc bcd"
    val docs = Seq((1L, "synth", text)).toDF("doc_id", "source", "text")
    val drv = TextOps.bpeTrainOn(docs, 10, driverVocabLimit = Long.MaxValue)
      .as[(Long, String, String, Long)].collect().toSeq
    val vocab0 = text.split("\\s+").toSeq.groupBy(identity).toSeq
      .map { case (w, g) => (w.map(_.toString): Seq[String], g.size.toLong) }
      .toDS()
    val dist = TextOps.bpeFitRounds(vocab0, 10, batchK = 2,
      wordBudget = 0L)
    assert(dist == drv)
    // same corpus through the r19 tail replay, tight and wide windows
    val distTailTight = TextOps.bpeFitRounds(vocab0, 10, batchK = 2,
      wordBudget = 1L << 40, tailKMax = 2)
    assert(distTailTight == drv)
    val distTailWide = TextOps.bpeFitRounds(vocab0, 10, batchK = 2)
    assert(distTailWide == drv)
  }

  test("winnow near-dup: crafted local overlap fires; disjoint texts don't") {
    import org.apache.spark.sql.functions.col
    val shared = "the winnowing guarantee covers every run of forty " +
      "or more characters with at least one shared fingerprint value"
    val d = Seq(
      (1L, s"alpha beta gamma delta prelude text here. $shared"),
      (2L, s"$shared completely different trailing content follows now"),
      (3L, "unrelated document with its own vocabulary entirely disjoint"),
      (4L, "short one")).toDF("doc_id", "text")
    val pairs = TextOps.winnowNearDup(d)
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1 and 2 share a >100-char run -> many shared fingerprints;
    // no pair may involve the disjoint doc 3 or the sub-8-char-free 4
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
    assert(pairs.head._3 >= TextOps.winnowMinShared)
  }

  test("unigram score: mean corpus token frequency, exact arithmetic") {
    val out = TextOps.qUnigramScore(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    def tok(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val cnt = docs.flatMap(d => tok(d._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = cnt.values.sum
    val expect = docs.toSeq.flatMap { case (id, text) =>
      val tk = tok(text)
      if (tk.isEmpty) None
      else Some((id, tk.length.toLong,
        tk.map(cnt).sum.toDouble / (tk.length.toLong * total)))
    }
    // integer sums + a single double division → bit-exact equality
    assert(out == expect)
  }

  test("token budget mix: greedy prefix in md5 order, budget never exceeded, binding") {
    val out = TextOps.qTokenBudgetMix(spark, sf0001)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // driver recompute: same permutation, same greedy prefix rule
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ntk(t: String) =
      t.toLowerCase.trim.split("\\s+").count(_.nonEmpty).toLong
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val ordered = rows.map { case (id, _, t) =>
        (md5hex(id.toString), id, ntk(t)) }.sorted
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= TextOps.tokenBudget)
        .map { case ((_, id, n), c) => (id, src, n, c) }
    }.sortBy(_._1)
    assert(out == expect)
    // non-vacuous: the budget binds on at least one source (some doc
    // was dropped), and every per-source total respects it
    assert(out.groupBy(_._2).forall(_._2.map(_._3).sum <= TextOps.tokenBudget))
    assert(out.size < docs.size)
  }

  test("diversity: Gini-Simpson equals a driver recompute, bounded in [0,1)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "source").as[(String, String)].collect().toSeq
    def div(rows: Seq[String]): (Long, Long, Double) = {
      val cs = rows.groupBy(identity).values.map(_.size.toLong).toSeq
      val n = cs.sum
      (n, cs.size.toLong,
        1d - cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble
          / (n.toDouble * n.toDouble))
    }
    val perLang = docs.groupBy(_._1).toSeq.map { case (l, rows) =>
      val (n, ns, d) = div(rows.map(_._2)); (l, n, ns, d) }
    val (n0, ns0, d0) = div(docs.map(_._2))
    val expect = (perLang :+ (("*", n0, ns0, d0))).sortBy(_._1)
    val got = TextOps.qDiversity(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    assert(got.forall(r => r._4 >= 0d && r._4 < 1d))
  }

  test("PPS sample: step crossings in md5 order equal a driver recompute") {
    val got = TextOps.qSamplePps(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ntk(t: String) =
      t.toLowerCase.trim.split("\\s+").count(_.nonEmpty).toLong
    val ordered = docs.map { case (id, t) =>
      (md5hex(id.toString), id, ntk(t)) }.sorted
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val expect = ordered.zip(cums).collect {
      case ((_, id, n), c) if c / 1000 > (c - n) / 1000 => (id, n, c)
    }.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // systematic-sampling structure: one selection per crossed step
    // boundary, except a doc spanning several boundaries absorbs
    // them into its single selection
    val total = ordered.map(_._3).sum
    val multi = ordered.zip(cums)
      .map { case ((_, _, n), c) => math.max(0L, c / 1000 - (c - n) / 1000 - 1) }
      .sum
    assert(got.size == (total / 1000 - multi).toInt)
    // and selection is size-proportional: the longest doc is far
    // likelier in-sample than the shortest (sanity, not a property)
    assert(got.map(_._2).max > got.map(_._2).min)
  }

  test("leakage-safe split: clusters never straddle; singletons match plain holdout") {
    val out = TextOps.qSplitLeakageSafe(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    val clusters = graft.engine.Dedup.qDedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.size == nDocs)
    // THE property: every near-dup cluster lands in exactly one split
    val splitOf = out.map(r => r._1 -> r._4).toMap
    clusters.groupBy(_._2).foreach { case (_, ms) =>
      assert(ms.map(m => splitOf(m._1)).distinct.size == 1)
    }
    // unclustered docs split exactly like the plain holdout; and the
    // refinement is non-vacuous — some clustered doc MOVED vs its
    // plain-holdout split (otherwise clustering changed nothing here)
    val plain = TextOps.qHoldoutSplit(spark, sf0001)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val clustered = clusters.map(_._1).toSet
    assert(out.filterNot(r => clustered(r._1))
      .forall(r => plain(r._1) == r._4))
    assert(out.exists(r => clustered(r._1) && plain(r._1) != r._4))
    // splits exhaust the corpus in roughly 90/5/5
    val frac = out.count(_._4 == "train").toDouble / out.size
    assert(frac > 0.8 && frac < 0.97)
  }

  test("bigram LM: smoothed pico-prob sums equal a driver recompute") {
    val got = TextOps.qBigramLm(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def tks(t: String) = Option(t).getOrElse("")
      .toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val allToks = docs.map { case (id, t) => (id, tks(t)) }
    val bigrams = allToks.flatMap { case (id, tk) =>
      tk.zip(tk.drop(1)).map { case (a, b) => (id, a, b) } }
    val c2 = bigrams.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val v = allToks.flatMap(_._2).distinct.size
    val expect = bigrams.groupBy(_._1).toSeq.map { case (id, bs) =>
      val picos = bs.map { case (_, a, b) =>
        math.round(1e12 * (c2((a, b)) + 1) / (c1(a) + v)) }
      (id, bs.size.toLong, picos.sum,
        picos.sum.toDouble / bs.size.toDouble)
    }.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // smoothed conditionals are genuine probabilities: 0 < p <= 1
    assert(got.forall(r => r._3 > 0 && r._3 <= r._2 * 1000000000000L))
    // docs with < 2 tokens hold no bigrams and are absent
    val shortIds = allToks.collect { case (id, tk) if tk.size < 2 => id }
    assert(shortIds.forall(id => !got.exists(_._1 == id)))
  }

  test("priority sample: top-k priorities + max(w,tau) estimator equal a driver recompute") {
    val k = TextOps.prioritySampleK
    val got = TextOps.qPrioritySample(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ntk(t: String) = math.max(1L,
      Option(t).getOrElse("").toLowerCase.trim.split("\\s+")
        .count(_.nonEmpty).toLong)
    val prios = docs.map { case (id, t) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
      val w = ntk(t)
      (id, w, w * 4294967296L / (h + 1L))
    }
    val ordered = prios.sortBy { case (id, _, p) => (-p, id) }
    val tau = ordered(k)._3
    val expect = ordered.take(k)
      .map { case (id, w, p) => (id, w, p, tau, math.max(w, tau)) }
      .sortBy(_._1)
    assert(got == expect && got.size == k)
    // DLT threshold property: every sampled priority >= tau, and the
    // estimator never shrinks a weight
    assert(got.forall(r => r._3 >= r._4 && r._5 >= r._2))
    // weighted: the sample's mean token count exceeds the corpus mean
    // (long docs hold proportionally more lottery tickets)
    val corpusMean = prios.map(_._2).sum.toDouble / prios.size
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    assert(sampleMean > corpusMean)
  }

  test("priority sample merge law: incremental MV merge equals the full recompute") {
    val full = TextOps.qPrioritySample(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val inc = TextOps.qPriorityIncremental(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(inc == full && inc.size == TextOps.prioritySampleK)
    // non-vacuous: the arriving (md5-bucket >= 90) slice contributed
    // rows to the merged sample, so the merge actually re-ranked
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long) =
      java.lang.Integer.parseInt(md5hex(id.toString).take(4), 16) % 100
    assert(inc.exists(r => bucket(r._1) >= 90))
    assert(inc.exists(r => bucket(r._1) < 90))
  }

  test("cms bound: estimates for the exact top-30 all sit inside [exact, exact + eps*N]") {
    val out = TextOps.qCmsErr(spark, sf0001)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out.size == 30)
    assert(out.forall(_._3), out.filterNot(_._3).toString)
    // non-vacuous: these are real heavy terms, not singletons
    assert(out.map(_._2).max > 50)
  }

  test("importance ratio: exact arithmetic vs a driver recompute; target docs rank high") {
    val out = TextOps.qImportanceRatio(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    def tok(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val all = docs.flatMap(d => tok(d._3))
    val cr = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tgt = docs.filter(_._2 == TextOps.importanceTargetSource)
      .flatMap(d => tok(d._3))
    val ct = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (tr, tt) = (all.size.toLong, tgt.size.toLong)
    val expect = docs.flatMap { case (id, _, text) =>
      val tk = tok(text)
      if (tk.isEmpty) None
      else {
        val sct = tk.map(t => ct.getOrElse(t, 0L)).sum
        val scr = tk.map(cr).sum
        Some((id, tk.length.toLong,
          (sct.toDouble / tt) / (scr.toDouble / tr)))
      }
    }.sortBy(_._1)
    assert(out == expect)
    // the signal is non-vacuous: target-source docs average a higher
    // weight than the rest (their tokens ARE the target distribution)
    val bySrc = docs.map(d => d._1 -> d._2).toMap
    val (inT, outT) = out.partition(r =>
      bySrc(r._1) == TextOps.importanceTargetSource)
    assert(inT.nonEmpty && outT.nonEmpty)
    assert(inT.map(_._3).sum / inT.size > outT.map(_._3).sum / outT.size)
  }

  test("CDC chunking: boundaries survive a prefix edit (the rsync/LBFS invariant)") {
    // a deterministic 200-token doc, then the same doc with 3 tokens
    // inserted at the front — the edit that breaks every FIXED-stride
    // chunk (all windows shift) but only the local CDC chunks
    val rnd = new scala.util.Random(7)
    val base = Array.fill(200)(s"w${rnd.nextInt(50)}")
    val edited = Array("ins1", "ins2", "ins3") ++ base
    val a = TextOps.cdcChunksOf(base)
    val b = TextOps.cdcChunksOf(edited)
    // chunks are a partition of the tokens, in order
    assert(a.map(_._3).sum == base.length)
    assert(a.head._2 == 1 && a.map(c => c._2 + c._3).dropRight(1) ==
      a.map(_._2).drop(1))
    // past the first boundary after the edit, every chunk fingerprint
    // reappears — content-addressed dedup still matches the tail
    val fa = a.map(_._4)
    val fb = b.map(_._4).toSet
    val survivors = fa.count(fb.contains)
    assert(survivors >= fa.size - 2,
      s"only $survivors of ${fa.size} chunks survived a 3-token prefix edit")
    // and the doc actually chunks (the boundary rule fires)
    assert(a.size >= 5, a.toString)
  }

  test("stratified sample: exactly min(|source|, quota) docs per source, first by md5 order") {
    val out = TextOps.qSampleStratified(spark, sf0001)
      .as[(Long, String, Int)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map { case (id, _) => (md5hex(id.toString), id) }.sorted
        .take(TextOps.stratifiedQuota).zipWithIndex
        .map { case ((_, id), i) => (id, src, i + 1) }
    }.sortBy(_._1)
    assert(out == expect)
    // quota binds on at least one source at this SF, or the test is vacuous
    assert(docs.groupBy(_._2).exists(_._2.size > TextOps.stratifiedQuota))
  }

  test("quality calibration: kept set equals a driver-side percent_rank recompute") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qQualityCalibrated(spark, sf0001)
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    // the q values themselves are oracle-covered; re-derive only the
    // window arithmetic from them
    val scored = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")).as("q"))
      .as[(Long, String, Double)].collect().toSeq
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val n = rows.size
      rows.map { case (id, _, q) =>
        val rank = 1 + rows.count(_._3 < q) // ties share the rank
        val pct = if (n == 1) 0.0 else (rank - 1).toDouble / (n - 1)
        (id, src, q, pct)
      }.filter(_._4 >= TextOps.calibratedCut)
    }.sortBy(_._1)
    assert(out == expect)
    // the cut actually drops rows per source (non-vacuous)
    assert(out.size < scored.size)
  }

  test("quality calibration cut twin: histogram form keeps exactly the window form's rows") {
    // the r18 100 TB form (Scale.quantileCutKeep) must keep the SAME
    // set as the flat percent_rank window — the exactness claim its
    // scaladoc proves; the oracle arbitrates each form independently,
    // this pins them to each other
    val win = TextOps.qQualityCalibrated(spark, sf0001)
      .as[(Long, String, Double, Double)].collect().toSeq
      .map(r => (r._1, r._2, r._3)).sorted
    val cut = TextOps.qQualityCalibratedCut(spark, sf0001)
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(cut == win && cut.nonEmpty)
  }

  test("entropy mix: engine h_q equals the FixLog2 driver recompute; h_bits is real Shannon") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val out = TextOps.qEntropyMix(spark, sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val bySrc = counts.groupBy(_._1).view
      .mapValues(_.map(r => r._3).toSeq).toMap +
      ("*" -> counts.groupBy(_._2).values.map(_.map(_._3).sum).toSeq)
    assert(out.map(_._1).toSet == bySrc.keySet)
    out.foreach { case (src, nDocs, nLangs, hq, hBits) =>
      val cs = bySrc(src)
      val n = cs.sum
      assert(nDocs == n && nLangs == cs.size)
      val hqRef = cs.map(c => c * graft.functions.FixLog2.ref(n, c)).sum
      assert(hq == hqRef, s"h_q mismatch for $src")
      assert(hBits == hq.toDouble / (n.toDouble * 65536.0))
      // and the fixed-point value IS Shannon entropy in bits
      val hTrue = cs.map { c =>
        val p = c.toDouble / n
        -p * math.log(p) / math.log(2.0)
      }.sum
      assert(math.abs(hBits - hTrue) < 1e-3, s"not Shannon for $src")
    }
    // non-degenerate: some source actually mixes languages
    assert(out.exists(_._3 > 1))
  }

  test("mutual info: engine mi_q equals the FixLog2 driver recompute; sums to corpus MI") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val out = TextOps.qMutualInfo(spark, sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("lang").isNotNull)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val cL = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val cS = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nTot = counts.map(_._3).sum
    val bySrc = counts.groupBy(_._1)
    assert(out.map(_._1).toSet == bySrc.keySet)
    out.foreach { case (src, nDocs, nCells, miQ, miBits) =>
      val cells = bySrc(src)
      assert(nDocs == cS(src) && nCells == cells.size)
      val miRef = cells.map { case (_, l, c) =>
        c * graft.functions.FixLog2.ref(nTot * c, cL(l) * cS(src))
      }.sum
      assert(miQ == miRef, s"mi_q mismatch for $src")
      assert(miBits == miQ.toDouble / (nTot.toDouble * 65536.0))
    }
    // the fixed-point per-source contributions sum to the true corpus
    // MI within ladder tolerance (16 mantissa rounds ~ 2e-5 bits/cell)
    val miTrue = counts.map { case (s, l, c) =>
      val p = c.toDouble / nTot
      p * math.log(nTot.toDouble * c / (cL(l).toDouble * cS(s))) /
        math.log(2.0)
    }.sum
    assert(math.abs(out.map(_._5).sum - miTrue) < 1e-3)
    // under-represented cells exist, so the ladder's negative-log
    // (num < den) path is actually exercised, not just compiled
    assert(counts.exists { case (s, l, c) => nTot * c < cL(l) * cS(s) })
  }

  test("temperature mix: equals a driver recompute; low-resource langs upsampled") {
    val out = TextOps.qTemperatureMix(spark, sf0001)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect().filter(_._2 != null)
      .map { case (id, lang, text) =>
        val ntk = if (text == null) 0L
        else text.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
        (id, lang, md5hex(id.toString), ntk)
      }
    val nl = docs.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val sl = nl.view.mapValues(n => math.floor(math.sqrt(n.toDouble)).toLong)
      .toMap
    val sTot = sl.values.sum
    val nTot = nl.values.sum
    val bl = sl.map { case (l, s) => l -> s * (nTot / 2) / sTot }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val cums = sorted.scanLeft(0L)(_ + _._4).tail
      sorted.zip(cums).filter(_._2 <= bl(lang))
        .map { case (d, cum) => (d._1, lang, d._4, cum, bl(lang)) }
    }.sortBy(_._1)
    assert(out == expected && out.nonEmpty)
    // the temperature BINDS: the smallest lang's budget share exceeds
    // its natural token share (alpha < 1 upsampling), and the largest
    // lang's is below it — exact cross-multiplied integer compare
    val minL = nl.minBy(_._2)._1
    val maxL = nl.maxBy(_._2)._1
    assert(BigInt(sl(minL)) * nTot > BigInt(nl(minL)) * sTot)
    assert(BigInt(sl(maxL)) * nTot < BigInt(nl(maxL)) * sTot)
  }

  test("naive bayes: learns a crafted lang-skewed vocabulary to 100% accuracy") {
    // the sf corpus is deliberately language-independent word soup
    // (accuracy there ~ the majority prior); THIS fixture has real
    // signal, proving the training path learns when signal exists
    val dir = "target/tmp-nb"
    val aWords = Seq("alpha", "beta", "gamma")
    val bWords = Seq("delta", "epsilon", "zeta")
    val rnd = new scala.util.Random(7)
    def text(ws: Seq[String]) =
      Seq.fill(12)(ws(rnd.nextInt(ws.size))).mkString(" ")
    val rows = (0L until 80L).map { i =>
      val (lang, ws) = if (i % 4 < 2) ("aa", aWords) else ("bb", bWords)
      (i, text(ws), lang, "s0", 1L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qNbClassify(spark, dir)
      .as[(Long, String, String, Long, Boolean)].collect()
    assert(out.length == 40) // the odd ids
    assert(out.forall(_._5), s"misclassified: ${out.filterNot(_._5).toSeq}")
    assert(out.map(_._3).toSet == Set("aa", "bb")) // both classes used
  }

  test("naive bayes: sf scores equal a full driver recompute (model + posterior + argmax)") {
    val out = TextOps.qNbClassify(spark, sf0001)
      .as[(Long, String, String, Long, Boolean)].collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect()
      .filter(r => r._2 != null && r._3 != null)
      .map { case (id, lang, text) =>
        (id, lang, text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      }
      .filter(_._3.nonEmpty)
    val train = docs.filter(_._1 % 2 == 0)
    val test = docs.filter(_._1 % 2 == 1)
    val ctl = train.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nl = ctl.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val v = train.flatMap(_._3).distinct.length.toLong
    val dl = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val dTot = train.length.toLong
    val langs = nl.keys.toSeq.sorted
    import graft.functions.FixLog2.ref
    val expected = test.map { case (id, lang, tks) =>
      val scores = langs.map { l =>
        val s = tks.groupBy(identity).map { case (t, occ) =>
          occ.length * ref(ctl.getOrElse((l, t), 0L) + 1, nl(l) + v)
        }.sum + ref(dl(l), dTot)
        (l, s)
      }
      val (pred, score) = scores.minBy { case (l, s) =>
        (-s, langs.indexOf(l))
      } match { case (l, s) => (l, s) }
      (id, lang, pred, score, lang == pred)
    }.sortBy(_._1)
    assert(out.toSeq == expected.toSeq)
    // honest signal check: this corpus IS word soup, so accuracy sits
    // near the majority prior, far below a trained ceiling
    val acc = out.count(_._5).toDouble / out.length
    assert(acc > 0.15 && acc < 0.7, s"accuracy $acc")
  }

  test("char entropy: equals a FixLog2.ref driver recompute per document") {
    import graft.functions.FixLog2
    val docs = engine.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.filter(_._2.nonEmpty).map { case (id, text) =>
      val counts = text.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val sClc = counts.map(c => c * FixLog2.ref(c, 1L)).sum
      id -> ((n * FixLog2.ref(n, 1L) - sClc) / n)
    }.toMap
    val got = TextOps.qCharEntropy(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect, "char entropy mismatch")
    // prose should sit comfortably above the 3-bit screen
    val flags = TextOps.qCharEntropy(spark, sf0001).collect()
      .map(r => r.getBoolean(3))
    assert(flags.forall(!_), "natural prose flagged low-entropy")
  }

  test("collocations: PMI equals a FixLog2.ref recompute over driver-counted bigrams") {
    import graft.functions.FixLog2
    val texts = engine.Tables(spark, sf0001, "documents")
      .select("text").collect().map(_.getString(0))
    val tok = texts.map(_.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toSeq)
    val uni = tok.flatten.groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong }
    val pairs = tok.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
    val nBi = pairs.length.toLong
    val bi = pairs.groupBy(identity).map { case (p, g) =>
      p -> g.length.toLong }.filter(_._2 >= 3)
    val expect = bi.collect {
      case ((w1, w2), cxy) if cxy * nBi > uni(w1) * uni(w2) =>
        (w1, w2) -> FixLog2.ref(cxy * nBi, uni(w1) * uni(w2))
    }.toSeq.sortBy { case ((w1, w2), pmi) => (-pmi, w1, w2) }.take(100)
    val got = TextOps.qCollocations(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toSeq
    assert(got == expect, s"PMI mismatch: got ${got.take(3)}… vs ${expect.take(3)}…")
  }

  test("bigram perplexity: equals a driver recompute incl. both backoff tiers") {
    import graft.functions.FixLog2
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 100
    }
    val docs = engine.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val train = docs.filter(d => bucket(d._1) < 80).map(d => toks(d._2))
    val biTr = train.filter(_.length >= 2).flatMap(t => t.zip(t.tail))
    val c2 = biTr.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val c1 = biTr.groupBy(_._1).map { case (w, g) => w -> g.length.toLong }
    val v = train.flatten.distinct.length.toLong
    val defCost = FixLog2.ref(v, 1L)
    val expect = docs.filter(d => bucket(d._1) >= 80).flatMap { case (id, s) =>
      val t = toks(s)
      if (t.length < 2) None else {
        val costs = t.zip(t.tail).map { p =>
          c2.get(p).map(n2 => FixLog2.ref(c1(p._1) + v, n2 + 1L))
            .orElse(c1.get(p._1).map(n1 => FixLog2.ref(n1 + v, 1L)))
            .getOrElse(defCost)
        }
        Some(id -> ((costs.length.toLong, costs.sum, costs.sum / costs.length)))
      }
    }.toMap
    val got = TextOps.qBigramPpl(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect, "bigram cross-entropy mismatch")
    // the held-out stream must exercise the backoff: at least one
    // seen pair and (vocab willing) the per-doc costs differ
    assert(expect.nonEmpty && expect.values.map(_._3).toSet.size >= 1)
  }

  test("feature hashing: equals a driver md5 recompute; zero-weight buckets dropped") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = engine.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
        val h = md5hex("fh|" + w)
        val bucket = Integer.parseInt(h.substring(0, 4), 16) % 1024
        val s = if (Integer.parseInt(h.substring(4, 5), 16) % 2 == 0) 1L else -1L
        (id, bucket.toLong) -> s
      }
    }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      .filter(_._2 != 0L)
    val got = TextOps.qFeatureHash(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, "feature-hash vector mismatch")
  }

  test("readability: equals a driver regex recompute in exact milli-units") {
    val docs = engine.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val words = "[a-z]+".r.findAllIn(text.toLowerCase).length.toLong
      val sents = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
      val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      if (words >= 1)
        Some(id -> (206835L - 1015L * words / sents - 84600L * syll / words))
      else None
    }.toMap
    val got = TextOps.qReadability(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got == expect, "flesch_milli mismatch")
  }
}
