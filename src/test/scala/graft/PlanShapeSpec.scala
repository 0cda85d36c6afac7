package graft

import graft.engine.Relational

/** Plan-shape guardrails: the scale-critical physical-plan properties
  * SURVEY.md §8 documents, asserted so a refactor can't silently
  * regress them. These are the properties that matter at 100 TB —
  * pushdown reaching the scan, dims broadcasting, aggregation going
  * partial, top-k avoiding a full sort. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: predicate pushdown and column pruning reach the parquet scan") {
    val s = Relational.q2FilterPushdown(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(s).get.group(1)
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      pushed)
    // projection pruned to the 4 selected + 2 filter columns
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(s).get.group(1)
    assert(read.split(",").length <= 6, read)
  }

  test("q5: every dimension joins as broadcast, fact side never shuffles before the agg") {
    val p = plan(Relational.q5LocalRevenue(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1: aggregation is partial (map-side combine) then final") {
    val p = plan(Relational.q1PricingSummary(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_topk: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.qTopK(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_window_rank: rank<=k prunes map-side via WindowGroupLimit") {
    val p = plan(Relational.qWindowRank(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("minhash: signatures come from mapPartitions, never explode+groupBy") {
    val p = plan(graft.engine.Dedup.qDedupMinhash(spark, sf0001))
    // the zero-shuffle signature claim: one typed mapPartitions over
    // the scan, no Generate→HashAggregate(min×64) signature pipeline
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("xxhash64(h"), p)
  }

  test("IVF: cell assignment is a projection, ranking is the bounded agg — no Window at all") {
    val p = plan(graft.engine.Similarity.qAnnIvf(spark, sf0001))
    // the r10 tail: per-query top-3 via the bounded distinct TopKAgg
    // (ObjectHashAggregate, ≤3-element partial buffers) — a Window
    // anywhere in this plan means the candidate-volume sort shuffle
    // is back; so would a dedup (the aggregator owns it now)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH: probe side broadcasts, ranking is the bounded agg — no Window, no dedup exchange") {
    val p = plan(graft.engine.Similarity.qAnnLsh(spark, sf0001))
    // the multi-table/multi-probe duplicates collapse INSIDE the
    // distinct TopKAgg's ≤3-element buffers — a Window or a separate
    // (qid, nid) dedup aggregate would re-grow the tail to two
    // exchanges over the full candidate volume; the tiny probe fan
    // must broadcast, never shuffle the exploded index
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("video decode: one mapPartitions pass — frames never shuffle") {
    val p = plan(graft.engine.Multimodal.qMediaVideo(spark, sf0001))
    // the container walk + per-frame PNG decode is split-local; the
    // only reorganization allowed is the final oracle-dump sort
    assert(p.contains("MapPartitions"), p)
    assert("(?i)join|aggregate|window".r.findAllIn(p).isEmpty, p)
  }

  test("ANN recall: candidate lists join the truth as broadcasts") {
    val p = plan(graft.engine.Similarity.qAnnRecall(spark, sf0001))
    // three tiny ranked lists (≤150 rows each) flag-join the exact
    // truth — a sort-merge join here would shuffle the truth side
    // three times. The ONE BroadcastNestedLoopJoin is the ground
    // truth's brute-force corpus×queries scan (qCosineTopK's
    // documented baseline shape), never a flag join.
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
  }

  test("winnowing: fingerprints come from mapPartitions — no per-character explode or window") {
    val p = plan(graft.engine.TextOps.qWinnowFingerprint(spark, sf0001))
    // the r4 rewrite: per-doc imperative pass; the regression this
    // guards exploded one row PER CHARACTER and shuffled them all on
    // doc_id for the window-min (~|corpus characters| rows at 100 TB)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Generate"), p)
    assert(!"Window\\b".r.findAllIn(p).hasNext, p)
  }

  test("repetition stats: one mapPartitions pass — no n-gram explode or shuffle-side agg") {
    val p = plan(graft.engine.TextOps.qRepetitionStats(spark, sf0001))
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Generate"), p)
    // only the oracle-sort exchange may shuffle; the stats themselves
    // are row-local
    assert(!p.contains("HashAggregate"), p)
  }

  test("embed near-dup: blocked equi-join — never BNLJ or cartesian") {
    val p = plan(graft.engine.Similarity.qEmbedNearDup(spark, sf0001))
    // the r4 rewrite: block-pair equi-join; a BroadcastNestedLoopJoin
    // puts one full side on every executor and a CartesianProduct is
    // driver-planned O(n²) — both are 100 TB killers
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ANN near-dup: bucket-key equi-join — never BNLJ or cartesian") {
    // same 100 TB contract as the blocked exact path: candidates come
    // from a plain equi-join on (tbl, sig); at fixture size either
    // hash-join side may broadcast, but a nested loop or cartesian
    // would mean the bucket key fell out of the join condition
    val p = plan(graft.engine.Similarity.qEmbedNearDupAnn(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tf-idf: the document-frequency side of the term join is never hint-broadcast") {
    // the df aggregate is the FULL corpus vocabulary — billions of
    // terms at 100 TB. A broadcast HINT would pin it to the driver and
    // every executor regardless of size; only AQE may choose broadcast
    // when the small-SF aggregate actually fits under the threshold.
    val lp = graft.engine.TextOps.qTfidfTopTerms(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    // exactly one hinted broadcast survives optimization: the 1-row
    // corpus count. The term-keyed df join must carry no hint.
    val hints = "(?i)broadcast".r.findAllIn(lp).size
    assert(hints <= 1, lp)
  }

  test("unigram score: the term-frequency side of the join is never hint-broadcast") {
    // same reasoning as the tf-idf guard: the term table is the full
    // corpus vocabulary — only the 1-row grand total may carry a hint
    val lp = graft.engine.TextOps.qUnigramScore(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    val hints = "(?i)broadcast".r.findAllIn(lp).size
    assert(hints <= 1, lp)
  }

  test("heavy hitters: candidate filter is a broadcast join below the agg") {
    // the exact-verify aggregation must see only candidate-filtered
    // tokens: the bounded candidate set broadcast-joins BEFORE the
    // groupBy, so the shuffle never carries the full vocabulary — the
    // regression this guards is thresholding a full exact term count
    // (which q_term_freq already covers) with the sketch as dead code
    val p = plan(graft.engine.TextOps.qHeavyHitters(spark, sf0001))
    val bhjAt = p.indexOf("BroadcastHashJoin")
    assert(bhjAt >= 0, p)
    assert(!p.contains("SortMergeJoin"), p)
    // the FINAL aggregate prints above the join in the tree
    val aggAt = p.indexOf("HashAggregate")
    assert(aggAt >= 0 && aggAt < bhjAt, p)
  }

  test("chunking: one generator, no join — token windows never self-join") {
    val p = plan(graft.engine.TextOps.qChunk(spark, sf0001))
    // one Generate (the start-offset explode); chunk content comes
    // from slice() on the carried token array, NOT from joining the
    // exploded rows back — the regression is a chunks⋈tokens re-join
    assert("Generate".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
  }

  test("redact + quantize: pure projections over pruned scans") {
    def readCols(df: org.apache.spark.sql.DataFrame): Int = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val schema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse(fail(s"no ReadSchema:\n$s"))
      var depth = 0
      1 + schema.count { ch =>
        if (ch == '(' || ch == '<') depth += 1
        else if (ch == ')' || ch == '>') depth -= 1
        ch == ',' && depth == 0
      }
    }
    // (doc_id, text) and (vec_id, embedding) — nothing else read
    assert(readCols(graft.engine.TextOps.qRedact(spark, sf0001)) <= 2)
    val pq = plan(graft.engine.Similarity.qEmbedQuantize(spark, sf0001))
    // no join and no AGG OPERATOR (the lowercase aggregate(...) HOF
    // inside the projection is the per-vector fold, not a shuffle)
    assert("(?i)join".r.findAllIn(pq).isEmpty, pq)
    assert("HashAggregate|SortAggregate".r.findAllIn(pq).isEmpty, pq)
  }

  test("cross-source overlap: one corpus scan, no self-join") {
    val p = plan(graft.engine.Dedup.qCrossSourceOverlap(spark, sf0001))
    // pairs are generated in-row from each shingle's collected source
    // set — the regression is the shingle-keyed self-join, which
    // scans and explodes the corpus TWICE (no exchange reuse across
    // the aliased subtrees, measured)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
  }

  test("co-purchase: one fact scan, pairs generated in-row — no self-join") {
    val p = plan(Relational.qCopurchase(spark, sf0001))
    // pairs come from each order's collected part set, never a
    // lineitem-on-lineitem self-join (which would re-shuffle the fact
    // twice and fan hot orders quadratically through an exchange)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
    // the global top-100 is per-partition heaps, not a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("skyline: prefix-scan shape — broadcast joins, never a domination BNLJ") {
    val p = plan(Relational.qSkyline(spark, sf0001))
    // the regression is the literal NOT EXISTS translation: an
    // all-pairs nested-loop anti-join over the fact
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("transition matrix: one user-keyed window, totals join as broadcast") {
    val p = plan(Relational.qTransitionMatrix(spark, sf0001))
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("hop window: Expand replicates before the partial agg") {
    val p = plan(Relational.qHopWindow(spark, sf0001))
    // the ×4 window replication must happen in Expand below a
    // partial/final agg — never a 4-way self-union re-scanning the
    // source per offset
    assert(p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("robust outliers: percentile passes broadcast the moment tables") {
    val p = plan(Relational.qOutliersRobust(spark, sf0001))
    assert(!p.contains("SortMergeJoin"), p)
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("top journeys: rank<=8 prunes map-side via WindowGroupLimit") {
    val p = plan(Relational.qTopJourneys(spark, sf0001))
    // a user's full history must never reach the shuffle — the
    // row_number<=8 filter has to push into WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("url family: pruned scans, blocklist broadcasts, canonicalization never shuffles") {
    // the per-doc canonicalization is a narrow projection: its only
    // exchange is the presentation sort, and the scan reads just the
    // three derivation columns
    val s = graft.engine.UrlOps.qUrlCanonical(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse(fail(s"no ReadSchema:\n$s"))
    assert(read.split(",").length <= 3, read)
    val pc = plan(graft.engine.UrlOps.qUrlCanonical(spark, sf0001))
    assert(!pc.contains("Exchange hashpartitioning"), pc)
    // operator names, not substrings — the projection itself contains
    // array_join/array_sort expression text
    assert(("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|" +
      "HashAggregate|SortAggregate|Window \\[").r.findAllIn(pc).isEmpty, pc)
    // the rollup's blocklist is a broadcast anti-join over the tiny
    // literal frame; the only hash shuffles are domain-keyed aggs
    val pr = plan(graft.engine.UrlOps.qDomainRollup(spark, sf0001))
    assert(pr.contains("BroadcastHashJoin") && pr.contains("LeftAnti"), pr)
    assert(!pr.contains("SortMergeJoin"), pr)
    assert("(?i)cartesian|nestedloop".r.findAllIn(pr).isEmpty, pr)
  }

  test("sharded pct/rfm twins: ranks ride __shard windows, carries broadcast") {
    for (df <- Seq(Relational.qWindowPctSharded(spark, sf0001),
      Relational.qRfmSharded(spark, sf0001))) {
      val p = plan(df)
      // the corpus-sized rank must never sit in a low-cardinality
      // flat window: every corpus windowspec carries the shard key
      assert(p.contains("__shard"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
      assert(!"ntile|percent_rank|cume_dist".r.findAllIn(p).hasNext, p)
    }
  }

  test("PPS sample: sharded prefix scan — the only join is the carry broadcast") {
    val p = plan(graft.engine.TextOps.qSamplePps(spark, sf0001))
    assert(!p.contains("SortMergeJoin"), p)
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("bigram LM: equi-joins only — the corpus probe must never BNLJ or cartesian") {
    val p = plan(graft.engine.TextOps.qBigramLm(spark, sf0001))
    // |V| is the only cross join and must stay a 1-row broadcast;
    // the (w1,w2) probe and c2-c1 joins are shuffled equi-joins
    assert("(?i)cartesianproduct".r.findAllIn(p).isEmpty, p)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, p) // the broadcast 1-row |V| frame only
  }

  test("priority sample: corpus-sized top-k is TakeOrderedAndProject, no full sort") {
    val p = plan(graft.engine.TextOps.qPrioritySample(spark, sf0001))
    // every partition keeps k+1 rows, the driver merges — nothing
    // corpus-sized may shuffle for the top-(k+1) cut
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("fuzzy join: blocked equi-joins only — never a cartesian levenshtein scan") {
    val p = plan(graft.engine.Dedup.qFuzzyJoin(spark, sf0001))
    // the quadratic regression is an all-pairs levenshtein cross
    // join; blocking must keep every join an equi-join
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("fuzzy JW re-score: blocked equi-joins only, score cut below the dedup") {
    val p = plan(graft.engine.Dedup.qFuzzyJw(spark, sf0001))
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
    // the >= 0.9 cut must push into the blocked join (the candidate
    // fan collapses to O(matches) before the pair-dedup exchange) —
    // the optimizer inlines graft_jw into the BHJ condition
    val joinLine = p.linesIterator
      .find(l => l.contains("BroadcastHashJoin") && l.contains("graft_jw"))
    assert(joinLine.nonEmpty, p)
  }

  test("top-k MV merge: both window passes prune map-side via WindowGroupLimit") {
    val p = plan(Relational.qTopkIncremental(spark, sf0001))
    // a group's full history must never reach the window shuffle —
    // every rn<=3 filter has to push into WindowGroupLimit (stored
    // side, batch side, and the final merge re-rank)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("containment: prefix x full-index equi-join, never a set-pair cartesian") {
    val p = plan(graft.engine.Dedup.qContainment(spark, sf0001))
    // the quadratic regression is the all-pairs intersect scan; the
    // candidate stage must stay a shingle-keyed equi-join
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("decay trend: one hash agg over a 1-row broadcast anchor — no window") {
    val p = plan(Relational.qDecayTrend(spark, sf0001))
    // a per-key recursive EWMA would plan a user/type-keyed Window
    // sort; the anchored monoid form must keep the score a plain
    // partial/final agg, with the corpus-max anchor riding the ONE
    // 1-row broadcast nested loop (the q_join_card count-frame shape)
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("BM25: query terms broadcast into the postings scan, no cartesian") {
    val p = plan(graft.engine.TextOps.qBm25(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    // tf ⋈ qterms and ⋈ df ride broadcasts (qterms is 32 rows, df is
    // query-term-restricted); dl joins on the doc-keyed shuffle; the
    // only BNLJs are the two 1-row count frames
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("SCD2: one user-keyed exchange feeds both windows, no join") {
    val p = plan(graft.engine.Relational.qScd2(spark, sf0001))
    // the change-collapse lag and the interval lead share the same
    // (user_id × (ts, event_id)) sort — a second hash exchange or
    // any join means the two windows stopped sharing the pass
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
  }

  test("chi2 divergence: marginals broadcast — no shuffle join") {
    val p = plan(graft.engine.TextOps.qChi2Divergence(spark, sf0001))
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the one BNLJ is the broadcast of the 1-ROW corpus count (a
    // keyless join by construction); anything more means a real
    // join lost its keys
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("ols trend / ab test: one map-side-combined agg pass, no join, no window") {
    for (q <- Seq(graft.engine.Relational.qOlsTrend(spark, sf0001),
        graft.engine.Relational.qAbTest(spark, sf0001))) {
      val p = plan(q)
      // the moment family is a single partial/final hash agg — a
      // window or any join means the one-pass formulation regressed
      // (e.g. A/B re-joined its arms instead of conditional-agg)
      assert(!p.contains("Window"), p)
      assert("HashAggregate".r.findAllIn(p).size >= 2, p)
      assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
        .r.findAllIn(p).isEmpty, p)
    }
  }

  test("attribution: one user-keyed exchange, one WindowExec, no join") {
    val p = plan(graft.engine.Relational.qAttribution(spark, sf0001))
    // all three touch carries must share one window pass over one
    // user-keyed shuffle; a range join or a second exchange is the
    // O(touches x conversions) regression this formulation avoids
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
  }

  test("rfm: one window exchange shared by the three quintiles, dim broadcast") {
    val p = plan(graft.engine.Relational.qRfm(spark, sf0001))
    // exactly two hash exchanges — the per-customer agg shuffle and
    // ONE nation-keyed window exchange shared by all three ntiles
    // (a third means they stopped sharing); the customer dim must
    // ride a broadcast, never a shuffle join
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert("Window".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1, p)
  }

  test("snapshot diff: one key-keyed full-outer join, no cartesian") {
    val p = plan(graft.engine.Relational.qSnapshotDiff(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("FullOuter"), p)
    // base and replica join ONCE on the key — a bucketed layout makes
    // this co-located (zero-exchange) at scale
    assert("(?i)fullouter".r.findAllIn(p).size == 1, p)
  }

  test("hist quantile: grid-sized aggs, no join anywhere") {
    val p = plan(graft.engine.Relational.qHistQuantile(spark, sf0001))
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
    // partial/final hash aggs below the merge; the cum walk windows
    // run on the grid-sized frame
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("itemsets3: in-row triple fan — the fact never self-joins") {
    val p = plan(graft.engine.Relational.qItemsets3(spark, sf0001))
    // the naive 3-way self-join re-shuffles the fact three times and
    // fans hot orders cubically; the only joins allowed are the two
    // A-priori restrictions — the L1 item semi-join and the L2
    // frequent-pair semi-join — so every join in the plan must be a
    // LeftSemi (of an agg, never fact-vs-fact), and nothing cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty && joins.forall(_.contains("LeftSemi")),
      s"non-semi join in plan:\n$p")
  }

  test("indel fuzzy join: deletion-variant equi-join, no cartesian") {
    // the ORACLE is a brute-force cross join (completeness theorem);
    // the Spark plan must never be — blocking keys keep it equi
    val p = plan(graft.engine.Dedup.qFuzzyIndel(spark, sf0001))
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("lev3 fuzzy join: segment-key equi-join, no cartesian") {
    // same convention at tau=3: PassJoin segment blocking keeps the
    // plan an equi-join while the oracle brute-forces the cross join
    val p = plan(graft.engine.Dedup.qFuzzyLev3(spark, sf0001))
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
  }

  test("passage dedup: one explode, no join — a single passage-keyed shuffle") {
    val p = plan(graft.engine.TextOps.qPassageDedup(spark, sf0001))
    // one Generate (the passage posexplode); the keep-first marking is
    // a window over the passage shuffle, NOT a self-join — the
    // regression this guards is a groupBy(passage)+join-back
    // formulation that shuffles the exploded corpus twice
    assert("Generate".r.findAllIn(p).size == 1, p)
    assert("(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin|cartesian|nestedloop"
      .r.findAllIn(p).isEmpty, p)
  }

  test("substring dedup: mapPartitions windows, one hash shuffle, doc-keyed rem join") {
    val p = plan(graft.engine.TextOps.qSubstringDedup(spark, sf0001))
    // windows come from the imperative pass — an explode (Generate)
    // would mean the tokenize expression got inlined per element
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Generate"), p)
    // the removal-position join is the only join, keyed by doc_id —
    // never a nested loop or cartesian over the corpus
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("Join".r.findAllIn(p).size <= 2, p) // one join (+AQE reprint slack)
  }

  test("bpe tokens: pure mapPartitions projection — no hash shuffle, join, or agg") {
    val p = plan(graft.engine.TextOps.qBpeTokens(spark, sf0001))
    assert(p.contains("MapPartitions"), p)
    // the per-word encode must stay imperative — a vocab-join
    // formulation would shuffle the corpus tokens twice
    assert("(?i)join|aggregate|window".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("pack bpe: sharded running sum — windows carry __shard, carry joins broadcast") {
    val p = plan(graft.engine.TextOps.qPackBpe(spark, sf0001))
    assert(p.contains("MapPartitions"), p)
    // the corpus-sized running sum must ride the (source, __shard)
    // window — a flat per-source window would funnel each source
    // through one unsplittable task; the cross-shard carry comes
    // back as a broadcast, never a shuffled join
    assert(p.contains("__shard"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("(?i)cartesian|nestedloop".r.findAllIn(p).isEmpty, p)
    // every windowspec over the corpus includes the shard key: the
    // only source-only spec is the carry walk over ≤|sources|·16
    // aggregated rows, which sits above the partial aggregate
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(p).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("__shard")), p)
  }

  test("JL projection: a pure projection — no join, window, agg, or hash shuffle") {
    val p = plan(graft.engine.Similarity.qEmbedProject(spark, sf0001))
    assert("(?i)join|window|aggregate".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("winnow near-dup: stop-fingerprint cap applies BELOW the pair join") {
    // the scale property: df <= cap filters each side BEFORE the
    // self-join, bounding fan to min(df,cap)² per fingerprint — a
    // formulation that pairs first and filters after is quadratic in
    // the hot fingerprints' document frequency
    val df = graft.engine.TextOps.qWinnowNearDup(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the df-cap filter must sit on the aggregate BELOW the joins:
    // in the printed tree every join header appears before (above)
    // the capped aggregate's filter line
    val capAt = p.indexOf(s"<= ${graft.engine.TextOps.winnowMaxDf}")
    assert(capAt >= 0, p)
    val lastJoinAt = "(?i)sortmergejoin|shuffledhashjoin|broadcasthashjoin".r
      .findAllMatchIn(p).map(_.start).toSeq
    assert(lastJoinAt.nonEmpty && lastJoinAt.exists(_ < capAt), p)
  }

  test("k-means assignment: a pure projection — no join, window, or agg") {
    // the iterative centroid jobs run eagerly at build time; the
    // RETURNED plan is the corpus-wide assignment, which must stay a
    // narrow literal-centroid argmin projection (the IVF shape) — a
    // join+window formulation would shuffle |corpus|×k rows
    val p = plan(graft.engine.Similarity.qEmbedCluster(spark, sf0001))
    assert("(?i)join|window|aggregate".r.findAllIn(p).isEmpty, p)
  }

  test("bloom contamination: bloom probe below the exact semi-join") {
    val p = plan(graft.engine.Dedup.qContaminationBloom(spark, sf0001))
    val semiAt = p.indexOf("LeftSemi")
    // the corpus side prints BELOW the join in the tree, so the
    // might_contain probe filter must appear after it — probing
    // post-join would make the bloom pass dead weight
    val probeAt = p.indexOf("might_contain(")
    assert(semiAt >= 0 && probeAt > semiAt, p)
  }

  test("incremental dedup: batch bloom probe below the history anti-join") {
    // the scale inversion of the contamination pass: history is the
    // huge side, so the batch-built sketch must prune it BEFORE the
    // anti-join — a probe above the join would shuffle every
    // historical fingerprint. Walk the tree (not the plan text: a
    // flat indexOf matched ANY probe anywhere after the join
    // marker) and pin the might_contain filter inside the anti-join's
    // RIGHT child — the history scan subtree — and nowhere else.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BaseJoinExec => BJ}
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec leaf that tree-collect can't see through
    val exec = graft.engine.Dedup.qDedupIncremental(spark, sf0001)
      .queryExecution.sparkPlan
    def probes(p: SparkPlan): Int = p.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])
        => f
    }.size
    val anti = exec.collect {
      case j: BJ if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(anti.size == 1, s"expected one anti-join:\n$exec")
    assert(probes(anti.head.right) == 1,
      s"bloom probe filter must sit on the history (right/build) subtree:\n$exec")
    assert(probes(anti.head.left) == 0,
      s"no probe belongs on the batch side:\n$exec")
  }

  test("scalar sweeps: scans pruned to exactly the referenced columns") {
    // the §2.7 function sweeps are pure projections — a scan that
    // reads more than the referenced columns means pruning broke
    def readCols(df: org.apache.spark.sql.DataFrame): Int = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val schema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s)
        .map(_.group(1))
        .getOrElse(fail(s"no parseable ReadSchema in plan:\n$s"))
      // count top-level fields: commas inside type parens
      // (decimal(18,2)) are not field separators
      var depth = 0
      1 + schema.count { ch =>
        if (ch == '(' || ch == '<') depth += 1
        else if (ch == ')' || ch == '>') depth -= 1
        ch == ',' && depth == 0
      }
    }
    assert(readCols(Relational.qDateFuncs(spark, sf0001)) <= 2)   // key, date
    assert(readCols(Relational.qStringFuncs(spark, sf0001)) <= 3) // key, name, segment
    assert(readCols(Relational.qJsonFuncs(spark, sf0001)) <= 2)   // type, props
  }

  test("contamination: benchmark side scans only the filtered docs") {
    val s = graft.engine.Dedup.qContamination(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // BOTH document scans carry a pushed doc_id range filter — the
    // regression this guards is filtering AFTER the mapPartitions
    // barrier, which tokenizes the full corpus twice with unfiltered
    // scans
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(s).map(_.group(1)).toSeq
      .filter(_.contains("doc_id"))
    assert(pushed.count(f => f.contains("LessThan(doc_id")
      || f.contains("GreaterThanOrEqual(doc_id")) >= 2, s)
    assert("LeftSemi".r.findAllIn(s).nonEmpty, s)
  }

  test("importance ratio: neither frequency table is hint-broadcast") {
    // the q_unigram_score posture, twice over: both the raw and the
    // target vocabulary tables are corpus-scale objects — only the
    // two 1-row totals may ride hinted broadcasts
    val lp = graft.engine.TextOps.qImportanceRatio(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    val hints = "(?i)broadcast".r.findAllIn(lp).size
    assert(hints <= 1, lp) // the single crossJoin(broadcast(totals))
  }

  test("CDC chunking: one mapPartitions walk — no join, window, or agg") {
    val p = plan(graft.engine.TextOps.qCdcChunk(spark, sf0001))
    assert(p.contains("MapPartitions"), p)
    assert("(?i)join|window|aggregate".r.findAllIn(p).isEmpty, p)
  }

  test("lateral top-n: decorrelated into a ranked join, never a per-row nested loop") {
    // the docstring's claim, pinned: Catalyst rewrites the correlated
    // LATERAL LIMIT into Window + WindowGroupLimit + a hash join — a
    // BroadcastNestedLoopJoin here would re-run the subquery per
    // outer row at 100 TB
    val p = plan(Relational.qLateralTopN(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("unpivot: a zero-join Expand over the one aggregated row set") {
    val p = plan(Relational.qUnpivot(spark, sf0001))
    assert(p.contains("Expand"), p)
    assert(!"(?i)join".r.findAllIn(p).hasNext, p)
  }

  test("stratified sample: rank<=quota prunes map-side via WindowGroupLimit") {
    // the shuffle must carry O(tasks × quota) rows, not the corpus:
    // the filter on row_number() has to reach the pre-shuffle
    // WindowGroupLimit, like the q_window_rank guard
    val p = plan(graft.engine.TextOps.qSampleStratified(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("merge upsert: base never shuffles to match; anti-join consults only the key column") {
    // (a) the matched/kept branch joins the broadcast change batch —
    // a SortMergeJoin here means the full base shuffled on the key
    val p = plan(Relational.qMergeUpsert(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // (b) the NOT-MATCHED anti-join reads the base pruned to its
    // 8-byte key — one scan with ReadSchema of exactly o_orderkey
    val s = Relational.qMergeUpsert(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(s).map(_.group(1)).toSeq
    assert(reads.exists(_ == "o_orderkey:bigint"), s)
  }

  test("ngram novelty: the shingle-df side of the join is never hint-broadcast") {
    // the q_unigram_score reasoning: the df table is the corpus's
    // full shingle vocabulary — only AQE may pick broadcast when the
    // small-SF aggregate genuinely fits, never a pinned hint
    val lp = graft.engine.Dedup.qNgramNovelty(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert("(?i)broadcast".r.findAllIn(lp).isEmpty, lp)
  }

  test("quality calibration: one narrow scoring pass — no UDF, scan pruned to 3 columns") {
    val df = graft.engine.TextOps.qQualityCalibrated(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("UDF"), p)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(s).get.group(1)
    assert(read.split(",").length <= 3, read) // doc_id, source, text
  }

  test("FixLog2 ladder queries: planning stays linear (time + tree-size bound)") {
    // The r15 regression class: ONE 16-step withFixLog2 ladder is ~50
    // stacked Projects and plans in well under a second, but a SECOND
    // ladder chained onto the first sent Spark 4's CollapseProject
    // traversal combinatorial (q_benford: 25+ min of driver CPU before
    // the write even started, on a 9-row frame). Guard every ladder
    // call site: optimization must finish in seconds, and the
    // optimized tree must stay ladder-sized — so a future Spark
    // upgrade or a new chained-ladder call site goes red here, not in
    // an eternal Verify stall.
    // q_collocations / q_char_entropy joined the list in r16 —
    // q_collocations was the second member of the class found live: a
    // filter on the ladder OUTPUT is alias-substituted through all ~50
    // Projects by PushPredicateThroughNonJoin (~3^16 expansion; OOM at
    // sf0.001); the cut now runs below the ladder as its exact integer
    // equivalent (PMI > 0 <=> c_xy*N > c_x*c_y).
    val ladderQueries = Seq("q_entropy_mix", "q_mutual_info",
      "q_nb_classify", "q_idf_cosine_pairs", "q_benford", "q_benford_by",
      "q_collocations", "q_char_entropy")
    for (name <- ladderQueries) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val t0 = System.nanoTime()
      val opt = df.queryExecution.optimizedPlan
      df.queryExecution.executedPlan
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 30.0,
        s"$name planning took ${sec}s — CollapseProject blow-up?")
      val nodes = opt.collect { case p => p }.size +
        opt.expressions.map(_.collect { case e => e }.size).sum
      assert(nodes < 5000,
        s"$name optimized plan carries $nodes nodes — ladder not collapsing?")
    }
  }

  test("bloom probes: codegen'd might_contain, never a ScalaUDF (r19)") {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    import spark.implicits._
    // the two batch probe plans
    val batchPlans = Seq(
      plan(graft.engine.Dedup.qContaminationBloom(spark, sf0001)),
      plan(graft.engine.Dedup.qDedupIncremental(spark, sf0001)))
    // and the streaming probe (analyzed plan — no started query needed)
    val bf = graft.engine.HistorySketch.build(Seq("x").toDF("fp"),
      expectedItems = 100L, fpp = 0.01)
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .select(col("value").as("doc_id"),
        lit("hello world sample text").as("text"),
        col("timestamp").as("event_time"))
    val streamPlan = graft.engine.StreamingOps
      .incrementalDocPipeline(stream, bf)
      .queryExecution.analyzed.toString
    for (p <- batchPlans :+ streamPlan) {
      assert(p.contains("might_contain"), p.take(800))
      assert(!p.contains("UDF"), p.take(800))
    }
  }
}
