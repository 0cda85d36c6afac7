package graft

import graft.engine.{Scale, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans with no Exchange") {
    Scale.writeBucketed(Tables(spark, sf0001, "lineitem"),
      "li_bucketed", "l_orderkey", 8)
    Scale.writeBucketed(Tables(spark, sf0001, "orders"),
      "o_bucketed", "o_orderkey", 8)
    // set AFTER the writes: Tables.tune (first call in this session)
    // sets a 64MB threshold and would overwrite this
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // same result as the plain (shuffling) join
      val expected = Tables(spark, sf0001, "lineitem")
        .join(Tables(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("balancedShards: planted Zipf balances where uniform value bins collapse; order-preserving; degenerate inputs safe") {
    // Zipf-ish per-user revenue: s(r) = 1e9/r — the whale distribution
    // qGiniConcentration measures. Uniform value-domain bins
    // (s div (max/16+1), the r16 cut) park 99.6% of these rows in
    // shard 0; the histogram-derived cuts must hold every shard near
    // n/16.
    val n = 4000
    val rows = (1 to n).map(i => (i.toLong, 1000000000L / i))
    val df = rows.toDF("id", "s").repartition(8).persist()
    try {
      val mx = rows.map(_._2).max
      val uniformShard0 = rows.count(_._2 / (mx / 16 + 1) == 0)
      assert(uniformShard0 >= (n * 0.9).toInt,
        s"test premise: uniform bins should collapse, got $uniformShard0")
      val sh = Scale.balancedShards(df, col("s"), shards = 16)
      val per = df.withColumn("sh", sh)
        .groupBy("sh").agg(count(lit(1)).as("c"),
          min("s").as("mn"), max("s").as("mx"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(per.map(_._2).sum == n)
      assert(per.forall(p => p._1 >= 0 && p._1 < 16), s"shards: $per")
      val target = n / 16
      assert(per.map(_._2).max <= 2L * target,
        s"unbalanced shards: ${per.toSeq}")
      assert(per.length >= 12, s"too few live shards: ${per.toSeq}")
      // order-preserving: shard value ranges must not overlap
      for (Array(a, b) <- per.sortBy(_._1).sliding(2) if per.length > 1)
        assert(a._4 <= b._3,
          s"shard ranges overlap: $a vs $b")
    } finally df.unpersist()
    // degenerate inputs: empty and all-null frames → constant shard,
    // no NPE (the r16 advisory); a single hot value degrades to one
    // shard rather than failing
    val empty = Seq.empty[(Long, Long)].toDF("id", "s")
    assert(empty.withColumn("sh",
      Scale.balancedShards(empty, col("s"), 16)).count() == 0)
    val nulls = Seq((1L, None: Option[Long]), (2L, None))
      .toDF("id", "s")
    assert(nulls.withColumn("sh", Scale.balancedShards(nulls, col("s"), 16))
      .select("sh").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    val hot = Seq.fill(100)((1L, 42L)).toDF("id", "s")
    assert(hot.withColumn("sh", Scale.balancedShards(hot, col("s"), 16))
      .select("sh").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    // negative domain: still exact and order-preserving
    val neg = (-50 to 50).map(i => (i.toLong, i.toLong)).toDF("id", "s")
    val negPer = neg.withColumn("sh",
        Scale.balancedShards(neg, col("s"), 4))
      .groupBy("sh").agg(count(lit(1)).as("c"), min("s").as("mn"),
        max("s").as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(negPer.map(_._2).sum == 101)
    for (Array(a, b) <- negPer.sliding(2) if negPer.length > 1)
      assert(a._4 <= b._3, s"negative-domain ranges overlap: $a vs $b")
  }

  test("salted join: identical rows, salt in the shuffle key") {
    // skewed big side: one hot key with 10k rows + a long tail
    val big = ((1 to 10000).map(i => (1L, i)) ++
      (1 to 100).map(i => (i.toLong + 1, i))).toDF("k", "payload")
    val small = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val salted = Scale.saltedJoin(big, small, "k", buckets = 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").except(
      plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name").except(
      salted.select("k", "payload", "name")).isEmpty)
    // the shuffle key actually includes the salt
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("bucketed range join equals naive non-equi join, plans no nested loop") {
    val bucketed = graft.engine.Relational.qRangeJoin(spark, sf0001)
    // reference: the naive theta join Spark executes as nested-loop
    val o = Tables(spark, sf0001, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-02-01").cast("timestamp"))
    val l = Tables(spark, sf0001, "lineitem")
    val naive = o.join(l,
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy(col("o_orderkey"))
      .as[(Long, Long)].collect().toSeq
    val got = bucketed.select("o_orderkey", "n_shipped")
      .as[(Long, Long)].collect().toSeq
    assert(got == naive)
    assert(got.nonEmpty)
    // the point of the rewrite: an equi-join (hash/sort-merge), not
    // BroadcastNestedLoopJoin
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop survived:\n$plan")
  }

  test("spreadTarget: fan-out follows data volume, not cluster width") {
    val p = 32
    // unknown cardinality → old behavior, all cores
    assert(Tables.spreadTarget(p, -1L, 512) == p)
    // empty/tiny input never fans below one task
    assert(Tables.spreadTarget(p, 0L, 512) == 1)
    assert(Tables.spreadTarget(p, 1L, 512) == 1)
    // the sf0.1 embeddings corpus: 2000 rows / 512 → 4 tasks
    assert(Tables.spreadTarget(p, 2000L, 512) == 4)
    // exact multiples don't round up an extra partition
    assert(Tables.spreadTarget(p, 1024L, 512) == 2)
    // at scale the floor never binds: 1M rows → all cores
    assert(Tables.spreadTarget(p, 1000000L, 512) == p)
    // a wider cluster IS used once rows cover it
    assert(Tables.spreadTarget(1000, 1000000L, 512) == 1000)
  }

  test("MV merge: stored-partials + batch combine equals the full rollup") {
    // the monoid claim behind incremental view maintenance — and the
    // oracle cross-checks the same equality against DuckDB's full pass
    val inc = graft.engine.Relational.qAggIncremental(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    val full = graft.engine.Relational.qTimeBucket(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(inc == full && inc.nonEmpty)
    // both splits are non-empty — the merge genuinely combined two
    // partial aggregates rather than degenerating to one side
    val ev = Tables(spark, sf0001, "events")
    val bucket = pmod(
      conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int"), lit(100))
    assert(ev.filter(bucket < 90).limit(1).count() == 1)
    assert(ev.filter(bucket >= 90).limit(1).count() == 1)
  }

  test("join-MV merge: stored + delta-join partials equal the full join rollup") {
    // the delta-join decomposition claim behind incremental join-view
    // maintenance — the oracle cross-checks the same equality against
    // DuckDB's full one-pass join recompute
    val inc = graft.engine.Relational.qJoinIncremental(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    val li = Tables(spark, sf0001, "lineitem")
    val ord = Tables(spark, sf0001, "orders")
    val full = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("month"), col("o_orderpriority"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(inc == full && inc.nonEmpty)
    // every delta term is non-vacuous: the merge genuinely combined
    // the stored MV with both delta joins (ΔL⋈O and L₀⋈ΔO), and the
    // ΔL⋈ΔO corner exists inside the first
    def bucket(c: org.apache.spark.sql.Column) = pmod(
      conv(substring(md5(c.cast("string")), 1, 4), 16, 10)
        .cast("int"), lit(100))
    val lNew = bucket(concat_ws("-", col("l_orderkey"), col("l_linenumber")))
    val oNew = bucket(col("o_orderkey"))
    def quadrant(lPred: org.apache.spark.sql.Column,
        oPred: org.apache.spark.sql.Column): Long =
      li.filter(lPred).join(ord.filter(oPred),
        col("l_orderkey") === col("o_orderkey")).limit(1).count()
    assert(quadrant(lNew >= 90, oNew < 90) == 1)  // new lines, old orders
    assert(quadrant(lNew < 90, oNew >= 90) == 1)  // old lines, new orders
    assert(quadrant(lNew >= 90, oNew >= 90) == 1) // both new
  }

  test("checksum MV: stored + delta partials merge to the full recompute") {
    import graft.engine.Relational
    val inc = Relational.qChecksumIncremental(spark, sf0001).collect().head
    val full = Relational.qTableChecksum(spark, sf0001)
      .filter(col("table_name") === "lineitem").collect().head
    assert(inc.getLong(1) == full.getLong(1)) // n_rows
    assert(inc.getLong(2) == full.getLong(2)) // checksum
    // the merge is non-vacuous: both sides of the arrival cut exist
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val b = Tables.md5Bucket(
      concat_ws("#", col("l_orderkey"), col("l_linenumber")))
    assert(li.filter(b < 90).count() > 0 && li.filter(b >= 90).count() > 0)
  }

  test("skyline: equals the driver-side NOT EXISTS domination brute force") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size")
      .as[(Long, Double, Int)].collect().toSeq
    val expect = parts.filter { b =>
      !parts.exists(a => a._2 <= b._2 && a._3 >= b._3 &&
        (a._2 < b._2 || a._3 > b._3))
    }.sortBy(_._1)
    val got = graft.engine.Relational.qSkyline(spark, sf0001)
      .as[(Long, Double, Int)].collect().toSeq
    assert(got == expect && got.nonEmpty && got.size < parts.size)
  }

  test("join-card estimate: equals a driver-side CMS recompute; never undercounts") {
    val ek = Tables(spark, sf0001, "events")
      .select(col("user_id").cast("long")).as[Long].collect().toSeq
    val ok = Tables(spark, sf0001, "orders")
      .select(col("o_custkey").cast("long")).as[Long].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(r: Int, k: Long): Int =
      (java.lang.Long.parseLong(md5hex(s"$r|$k").take(8), 16) % 8192).toInt
    def sketch(ks: Seq[Long]): Map[(Int, Int), Long] =
      ks.flatMap(k => (0 until 5).map(r => (r, bucket(r, k))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sa = sketch(ek); val sb = sketch(ok)
    val est = (0 until 5).map { r =>
      sa.collect { case ((`r`, b), c) => c * sb.getOrElse((r, b), 0L) }.sum
    }.min
    val of = ok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = ek.map(k => of.getOrElse(k, 0L)).sum
    val got = graft.engine.Relational.qJoinCard(spark, sf0001)
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got == Seq((est, exact, true, true)) && exact > 0)
  }

  test("top journeys: equals a driver-side first-8-steps recompute") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val journeys = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).take(8).map(_._4).mkString(">") }
    val expect = journeys.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (j, n) => (-n, j) }.take(50)
    val got = graft.engine.Relational.qTopJourneys(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("outliers: exact-moment sigma matches a driver recompute; bound binds") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().toSeq
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      // the engine's integer quantization, reproduced: exact BigInt
      // accumulation, correctly-rounded double conversions
      val vq = rows.map(r => BigInt(math.round(r._2 * 10000)))
      val n = vq.size.toLong
      val sv = BigDecimal(vq.sum).toDouble
      val svv = BigDecimal(vq.map(x => x * x).sum).toDouble
      val muv = sv / n
      val sigv = math.sqrt(math.max(svv / n - muv * muv, 0d))
      val nOut = vq.count(x => math.abs(x.toDouble - muv) > 3 * sigv).toLong
      (t, n, muv / 10000.0, sigv / 10000.0, nOut)
    }
    val got = graft.engine.Relational.qOutliers(spark, sf0001)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // the 3-sigma cut is non-vacuous somewhere in the fixture
    assert(got.exists(_._5 > 0))
  }

  test("hop windows: 4 windows per event; whole-hour hops equal the tumble") {
    val hop = graft.engine.Relational.qHopWindow(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    val nev = Tables(spark, sf0001, "events").count()
    assert(hop.map(_._3).sum == 4 * nev)
    // a hop window starting on a whole hour covers [s, s+1h) — the
    // tumbling bucket's exact definition — so those rows must match
    // qTimeBucket verbatim
    val tum = graft.engine.Relational.qTimeBucket(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(hop.filter(_._1.endsWith(":00:00")) == tum && tum.nonEmpty)
  }

  test("top-k MV merge: stored-k + batch-k re-rank equals the full leaderboard") {
    // topk(A ∪ B) = topk(topk(A) ∪ topk(B)) for the row-level metric —
    // the oracle cross-checks the same equality against DuckDB's full
    // window pass
    val inc = graft.engine.Relational.qTopkIncremental(spark, sf0001)
      .as[(String, Int, Long, Double)].collect().toSeq
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect().toSeq
    val full = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (t, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, id, v), i) => (t, i + 1, id, v) }
    }
    assert(inc == full && inc.nonEmpty)
    // the merge is non-degenerate: at least one final top-3 row comes
    // from EACH md5 split (otherwise the test proves nothing about
    // merging)
    val bucket = pmod(
      conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int"), lit(100))
    val hist = Tables(spark, sf0001, "events").filter(bucket < 90)
      .select("event_id").as[Long].collect().toSet
    val ids = inc.map(_._3).toSet
    assert(ids.exists(hist.contains) && ids.exists(!hist.contains(_)))
  }

  test("decay trend: equals an exact shifted-weight driver recompute") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tu"),
        col("value"))
      .as[(String, Long, Double)].collect().toSeq
    val tmax = ev.map(_._2).max
    val expected = ev
      .map { case (t, u, v) =>
        (t, (tmax - u) / 3600000000L, math.round(v * 100)) }
      .filter(_._2 < 24)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, rows) =>
        (t, rows.size.toLong,
          rows.map(r => r._3 * (1L << (23 - r._2))).sum) }
    val out = graft.engine.Relational.qDecayTrend(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == expected && out.nonEmpty)
    // the decay is non-degenerate on the fixture: more than one
    // distinct age bucket contributes (weights actually vary)
    val ages = ev.map(r => (tmax - r._2) / 3600000000L)
      .filter(_ < 24).distinct
    assert(ages.size > 1)
  }

  test("robust outliers: median/MAD equal a driver recompute; resistant to a planted glitch") {
    def p50(vs: Seq[Double]): Double = {
      val s = vs.sorted; val idx = (s.size - 1) * 0.5
      val lo = s(idx.toInt); val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().toSeq
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2)
      val m = p50(vs)
      val mad = p50(vs.map(v => math.abs(v - m)))
      (t, m, mad, vs.count(v => math.abs(v - m) > 3 * 1.4826 * mad).toLong)
    }
    val got = graft.engine.Relational.qOutliersRobust(spark, sf0001)
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // the robustness claim itself: one planted 1e9 glitch leaves the
    // median/MAD cut essentially unchanged (moment-based mu/sigma
    // would absorb it and mask everything else)
    val glitched = (ev :+ (ev.head._1, 1e9)).groupBy(_._1)
      .toSeq.sortBy(_._1).map { case (t, rows) =>
        val vs = rows.map(_._2); val m = p50(vs)
        (t, m, p50(vs.map(v => math.abs(v - m))))
      }
    expect.zip(glitched).foreach { case ((t, m, mad, _), (t2, m2, mad2)) =>
      assert(t == t2 && math.abs(m - m2) < 2 && math.abs(mad - mad2) < 2)
    }
  }

  test("dq checks: planted violations are counted per constraint") {
    // orders: duplicate PK 1, null custkey on 3; lineitem: orphan
    // orderkey 99, zero quantity, discount 1.0
    val ord = Seq((1L, Some(10L)), (1L, Some(11L)), (2L, Some(12L)),
        (3L, None))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 5.0, 0.1), (2L, 0.0, 0.05), (99L, 3.0, 1.0))
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val got = graft.engine.Relational.dqChecks(ord, li)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("fk_lineitem_orders", 1L, false),
      ("not_null_custkey", 1L, false),
      ("pk_orders_unique", 1L, false),
      ("range_discount", 1L, false),
      ("range_quantity", 1L, false)))
    // and the clean fixture passes every check
    val fix = graft.engine.Relational.qDqChecks(spark, sf0001)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(fix.size == 5 && fix.forall(_._3))
  }

  test("correlation: exact-moment Pearson r equals a BigDecimal recompute") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("y"))
      .as[(String, Double, Double)].collect().toSeq
    val expect = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rows) =>
      // the engine's integer quantization, reproduced: exact BigInt
      // accumulation, then correctly-rounded double conversions
      val xy = rows.map(r =>
        (BigInt(math.round(r._2 * 100)), BigInt(math.round(r._3 * 10000))))
      val n = rows.size.toLong
      def d(b: BigInt): Double = BigDecimal(b).toDouble
      val sx = d(xy.map(_._1).sum); val sy = d(xy.map(_._2).sum)
      val sxx = d(xy.map(p => p._1 * p._1).sum)
      val syy = d(xy.map(p => p._2 * p._2).sum)
      val sxy = d(xy.map(p => p._1 * p._2).sum)
      val den = math.sqrt(math.max(n * sxx - sx * sx, 0d) *
        math.max(n * syy - sy * sy, 0d))
      (f, n, (n * sxy - sx * sy) / den)
    }
    val got = graft.engine.Relational.qCorrelation(spark, sf0001)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // a well-formed coefficient everywhere (the fixture draws price
    // independently of quantity, so r lands near 0 — the recompute
    // equality above is the real check)
    assert(got.forall(r => !r._3.isNaN && math.abs(r._3) <= 1.0))
  }

  test("ols trend: slope/intercept/r2 equal a BigDecimal recompute") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("ts").cast("long"), col("value"))
      .as[(String, Long, Double)].collect().toSeq
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val xy = rows.map(r =>
        (BigInt(r._2 - 1704067200L), BigInt(math.round(r._3 * 10000))))
      val n = rows.size.toLong
      def d(b: BigInt): Double = BigDecimal(b).toDouble
      val sx = d(xy.map(_._1).sum); val sy = d(xy.map(_._2).sum)
      val sxx = d(xy.map(p => p._1 * p._1).sum)
      val syy = d(xy.map(p => p._2 * p._2).sum)
      val sxy = d(xy.map(p => p._1 * p._2).sum)
      val num = n * sxy - sx * sy
      val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
      (t, n, num / denx * 86400d / 10000d,
        (sy - num / denx * sx) / n / 10000d, num * num / (denx * deny))
    }
    val got = graft.engine.Relational.qOlsTrend(spark, sf0001)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // r2 well-formed; value is drawn independently of time in the
    // fixture, so r2 lands near 0 — the recompute equality is the
    // real check, this is the sanity rail
    assert(got.forall(r => r._5 >= 0 && r._5 <= 1.0))
  }

  test("ab test: Welch t/df equal a BigDecimal recompute; both branches live") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id") % 2, col("value"))
      .as[(String, Long, Double)].collect().toSeq
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      def d(b: BigInt): Double = BigDecimal(b).toDouble
      def arm(a: Long) = {
        val ys = rows.filter(_._2 == a).map(r => BigInt(math.round(r._3 * 10000)))
        val n = ys.size.toLong
        val s = d(ys.sum); val ss = d(ys.map(y => y * y).sum)
        (n, s / n, (ss - s * s / n) / (n - 1))
      }
      val (n0, m0, v0) = arm(0); val (n1, m1, v1) = arm(1)
      val se2 = v0 / n0 + v1 / n1
      (t, n0, n1, m0 / 10000d, m1 / 10000d, (m0 - m1) / math.sqrt(se2),
        se2 * se2 / (v0 / n0 * (v0 / n0) / (n0 - 1)
          + v1 / n1 * (v1 / n1) / (n1 - 1)))
    }
    val got = graft.engine.Relational.qAbTest(spark, sf0001)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == expect && got.nonEmpty)
    // arms are hash-balanced and the null assignment means |t| is
    // small — the A/A sanity a real experiment framework ships with
    assert(got.forall(r => math.abs(r._6) < 5.0 && r._7 > 1.0))
  }

  test("attribution: equals an ordered-walk recompute; organic rows exist") {
    val got = graft.engine.Relational.qAttribution(spark, sf0001)
      .as[(Long, Long, Long, Double, Option[Long], Option[String],
        Option[Long])].collect().toSeq
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("value"))
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val win = graft.engine.Relational.attributionWindowSec * 1000000L
    val expect = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var lastTouch: Option[(Long, String, Long)] = None
      rows.sortBy(r => (r._4, r._1)).flatMap { r =>
        val out = if (r._3 == "purchase") {
          val fresh = lastTouch.filter(t => r._4 - t._3 <= win)
          Some((r._1, r._2, r._4, r._5, fresh.map(_._1), fresh.map(_._2),
            fresh.map(t => (r._4 - t._3) / 1000000L)))
        } else None
        if (r._3 == "click" || r._3 == "view")
          lastTouch = Some((r._1, r._3, r._4))
        out
      }
    }.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // both branches live: attributed AND organic conversions exist
    assert(got.exists(_._5.isDefined) && got.exists(_._5.isEmpty))
    // every attributed touch strictly precedes its purchase
    assert(got.forall(_._7.forall(_ >= 0)))
  }

  test("rfm: equals a driver recompute with exact ANSI ntile semantics") {
    val got = graft.engine.Relational.qRfm(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Int, Int, Int, Int)]
      .collect().toSeq
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long"),
        col("o_totalprice"))
      .as[(Long, Long, Double)].collect().toSeq
    val nat = Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .as[(Long, Long)].collect().toMap
    val per = orders.groupBy(_._1).map { case (ck, os) =>
      val m = os.map(o => BigDecimal(o._3).setScale(4)).sum.toDouble
      (ck, nat(ck), os.map(_._2).max, os.size.toLong, m)
    }.toSeq
    // ANSI ntile: first (n mod k) buckets carry one extra row
    def ntileOf(idx: Int, n: Int, k: Int): Int = {
      val q = n / k; val r = n % k
      if (idx < r * (q + 1)) idx / (q + 1) + 1
      else r + (idx - r * (q + 1)) / q + 1
    }
    def quintiles(sortedKeys: Seq[Long]): Map[Long, Int] =
      sortedKeys.zipWithIndex.map { case (ck, i) =>
        ck -> ntileOf(i, sortedKeys.size, 5)
      }.toMap
    val expect = per.groupBy(_._2).toSeq.flatMap { case (nk, rows) =>
      val rq = quintiles(rows.sortBy(r => (r._3, r._1)).map(_._1))
      val fq = quintiles(rows.sortBy(r => (r._4, r._1)).map(_._1))
      val mq = quintiles(rows.sortBy(r => (r._5, r._1)).map(_._1))
      rows.map { case (ck, _, r, f, m) =>
        (ck, nk, r, f, m, rq(ck), fq(ck), mq(ck),
          rq(ck) * 100 + fq(ck) * 10 + mq(ck))
      }
    }.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // segmentation is non-trivial: more than one segment exists and
    // every quintile value 1..5 appears somewhere
    assert(got.map(_._9).distinct.size > 1)
    assert((1 to 5).forall(v => got.exists(_._6 == v)))
  }

  test("itemsets3: equals a driver A-priori recompute; prune is output-invariant") {
    val got = graft.engine.Relational.qItemsets3(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val baskets = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted).toSeq
    // UNPRUNED brute force: count every raw triple, then cut — the
    // engine's L1 restriction must not change the answer (A-priori
    // monotonicity), so equality against THIS is the stronger check
    val support = baskets.flatMap(_.combinations(3)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val minSup = graft.engine.Relational.itemsetMinSupport
    val expect = support.toSeq.filter(_._2 >= minSup)
      .map { case (t, n) => (t(0), t(1), t(2), n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
    assert(got == expect && got.nonEmpty)
    // the min-support cut is non-vacuous: support-1 triples exist and
    // are excluded. (The L1 prune is output-invariant and does NOT
    // bite at sf0.001 — all 200 parts are frequent; it bites as the
    // part universe outgrows basket coverage at larger SFs.)
    assert(support.size > got.size)
  }

  test("assoc rules: conf/lift equal a driver recompute; lift discriminates") {
    val got = graft.engine.Relational.qAssocRules(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    val baskets = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted).toSeq
    val nb = baskets.size.toLong
    val iSup = baskets.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pSup = baskets.flatMap(_.combinations(2)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val minSup = graft.engine.Relational.itemsetMinSupport
    val tri = baskets.flatMap(_.combinations(3)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap.filter(_._2 >= minSup)
    val expect = tri.toSeq.flatMap { case (t, s3) =>
      Seq((t(0), t(1), t(2)), (t(0), t(2), t(1)), (t(1), t(2), t(0)))
        .map { case (x, y, z) =>
          val conf = s3.toDouble / pSup(Seq(x, y))
          (x, y, z, s3, pSup(Seq(x, y)), iSup(z), conf,
            conf * nb / iSup(z))
        }
    }.sortBy { case (a, b, c, _, _, _, conf, lift) =>
      (-conf, -lift, a, b, c)
    }
    assert(got == expect && got.nonEmpty)
    // lift spreads: some rule beats independence, orders distinguish
    assert(got.exists(_._8 > 1.0) && got.map(_._7).distinct.size > 1)
  }

  test("hist quantile: merge equals full recompute; median bucket holds the order stat") {
    val got = graft.engine.Relational.qHistQuantile(spark, sf0001)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val n = rows.size.toLong
      val hist = rows.groupBy(_._2 / 1000).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val cums = hist.scanLeft(0L)(_ + _._2).tail
      hist.zip(cums).map { case ((bkt, cnt), cum) =>
        (t, bkt, cnt, cum,
          cum - cnt < (n + 1) / 2 && cum >= (n + 1) / 2)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expect && got.nonEmpty)
    // exactly ONE median bucket per type, and the ceil(n/2)-th order
    // statistic really lies inside it (the rank guarantee)
    val byType = got.groupBy(_._1)
    byType.foreach { case (t, rows) =>
      assert(rows.count(_._5) == 1, s"median buckets for $t")
      val mb = rows.find(_._5).get._2
      val vs = ev.filter(_._1 == t).map(_._2).sorted
      val orderStat = vs(((vs.size + 1) / 2) - 1)
      assert(orderStat / 1000 == mb, s"order stat outside bucket for $t")
    }
  }

  test("benford: equals a FixLog2.ref recompute; expectation is true Benford") {
    val got = graft.engine.Relational.qBenford(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val vs = Tables(spark, sf0001, "orders")
      .select(round(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect().filter(_ >= 1)
    val obs = vs.map(_.toString.head.asDigit).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = obs.values.sum
    val l10 = graft.functions.FixLog2.ref(10L, 1L)
    val expect = obs.toSeq.sorted.map { case (d, nd) =>
      val ed = n * graft.functions.FixLog2.ref(d + 1L, d.toLong) / l10
      (d, nd, ed, 100L * (nd - ed) * (nd - ed) / ed)
    }
    assert(got == expect && got.nonEmpty)
    // the fixed-point expectation IS Benford's law (30.1%, 17.6%, ...)
    val e1 = got.find(_._1 == 1).get._3.toDouble / n
    assert(math.abs(e1 - 0.30103) < 1e-3, s"p(1)=$e1")
    // all nine digit classes observed at this SF
    assert(got.map(_._1) == (1 to 9))
  }

  test("benford by group: equals a per-year ref recompute; zero-count digits contribute") {
    val got = graft.engine.Relational.qBenfordBy(spark, sf0001)
      .as[(Int, Long, Long)].collect().toSeq
    val vs = Tables(spark, sf0001, "orders")
      .select(year(col("o_orderdate")),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Int, Long)].collect().filter(_._2 >= 1)
    val l10 = graft.functions.FixLog2.ref(10L, 1L)
    val expect = vs.groupBy(_._1).view.mapValues { rows =>
      val obs = rows.map(_._2.toString.head.asDigit).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val n = obs.values.sum
      // FULL digit domain 1..9 — absent digits contribute (0-e)^2/e
      val chi2 = (1 to 9).map { d =>
        val nd = obs.getOrElse(d, 0L)
        val ed = n * graft.functions.FixLog2.ref(d + 1L, d.toLong) / l10
        100L * (nd - ed) * (nd - ed) / ed
      }.sum
      (n, chi2)
    }.toSeq.collect { case (yr, (n, chi2)) if n >= 50 => (yr, n, chi2) }
      .sortBy { case (yr, _, chi2) => (-chi2, yr) }
    assert(got == expect && got.nonEmpty)
    // the group key discriminates: not all slices score identically
    assert(got.map(_._3).distinct.size > 1)
  }

  test("snapshot diff: equals a driver recompute; all three op classes live") {
    val got = graft.engine.Relational.qSnapshotDiff(spark, sf0001)
      .as[(Long, String, Option[Double], Option[Double])].collect().toSeq
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].collect().toSeq
    def bucket(k: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      Integer.parseInt(h, 16) % 100
    }
    val expect = o.flatMap { case (k, p) =>
      bucket(k) match {
        case b if b < 4 =>
          Seq((k, "changed", Some(p), Some(p + 1.0d)))
        case b if b < 8 =>
          Seq((k, "removed", Some(p), None))
        case b if b >= 96 =>
          Seq((k + 1000000000L, "added", None, Some(p)))
        case _ => Nil
      }
    }.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    assert(Set("added", "removed", "changed")
      .subsetOf(got.map(_._2).toSet))
  }

  test("interval sweep: equals a driver-side sweep-line recompute") {
    val got = graft.engine.Relational.qIntervalSweep(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    val span = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("s"))
      .agg(to_date(max(col("l_shipdate"))).as("e"))
      .select(col("s").cast("string"), col("e").cast("string"))
      .as[(String, String)].collect().toSeq
    val deltas = span.flatMap { case (s, e) =>
      Seq((s, 1L),
        (java.time.LocalDate.parse(e).plusDays(1).toString, -1L)) }
    val g = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var acc = 0L
    val expect = g.map { case (d, dl) => acc += dl; (d, acc) }
    assert(got == expect && got.nonEmpty)
    // mass conservation: every opened interval closes, so the final
    // running level is exactly zero
    assert(expect.last._2 == 0L)
  }

  test("transition matrix: equals a driver-side ordered-walk recompute") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val steps = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val n = steps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = steps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = n.toSeq.sortBy(_._1).map { case ((a, b), c) =>
      (a, b, c, c.toDouble / tot(a)) }
    val got = graft.engine.Relational.qTransitionMatrix(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // probabilities row-normalize exactly
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9) }
  }

  test("month spine: an order gap surfaces as a zero-filled month") {
    // the fixture has orders in every month, so the LEFT JOIN's
    // zero-filling branch is exercised here over a crafted gap:
    // orders in Jan and Mar 1995, nothing in Feb
    Seq((1L, java.sql.Timestamp.valueOf("1995-01-15 00:00:00"), 100.0),
        (2L, java.sql.Timestamp.valueOf("1995-03-10 00:00:00"), 50.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .createOrReplaceTempView("graft_orders")
    val out = spark.sql(graft.engine.Relational.monthSpineSql)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("1995-01-01", 1L, 100.0),
      ("1995-02-01", 0L, 0.0), ("1995-03-01", 1L, 50.0)))
  }

  test("zorderValue: exact Morton interleave; locality beats the linear key") {
    import org.apache.spark.sql.functions.typedlit
    // exact interleave on identity-normalized inputs (bounds 0..2^b-1)
    def z(a: Long, b: Long, bits: Int): Long =
      spark.range(1)
        .select(Scale.zorderValue(typedlit(a), typedlit(b),
          0L, (1L << bits) - 1, 0L, (1L << bits) - 1, bits).as("z"))
        .as[Long].head()
    // bit-by-bit ground truth
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val (a, b) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      assert(z(a, b, 16) == ref(a, b, 16), s"($a,$b)")
    }
    // the locality claim, measured: over a small 2-D box, the spread
    // of z-values is FAR tighter relative to key space than the
    // spread of the concatenated linear key (a@high | b@low), which
    // smears a b-range across the whole a-range
    val pts = for { a <- 1000L to 1007L; b <- 2000L to 2007L } yield (a, b)
    val zs = pts.map { case (a, b) => ref(a, b, 16) }
    assert((zs.max - zs.min).toDouble / (1L << 32) < 0.0001)
  }

  test("HLL MV merge: sketch union is split-point independent") {
    // register-wise max is associative/commutative/idempotent, so the
    // merged estimate must not depend on WHERE history ends and the
    // batch begins — the distinct-count view-maintenance claim
    import org.apache.spark.sql.DataFrame
    val ev = Tables(spark, sf0001, "events")
    val bucket = pmod(
      conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int"), lit(100))
    def mergedEst(cut: Int): Seq[(String, Double)] = {
      def sk(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      sk(ev.filter(bucket < cut)).unionByName(sk(ev.filter(bucket >= cut)))
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .as[(String, Double)].collect().toSeq.sorted
    }
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[(String, Double)].collect().toSeq.sorted
    assert(mergedEst(90) == direct)
    assert(mergedEst(50) == direct)
    assert(mergedEst(10) == direct)
  }

  test("merge upsert: decomposition equals the canonical full-outer MERGE") {
    // the shipped plan avoids shuffling the base (left join broadcast
    // changes + key-pruned anti-join); this re-derives the result via
    // the textbook full-outer formulation and demands equality
    val got = graft.engine.Relational.qMergeUpsert(spark, sf0001)
      .as[(Long, Long, String, Double, String)].collect().toSeq
    val base = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val bucket = pmod(
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("int"), lit(100))
    val src = base.withColumn("bucket", bucket)
    val changes = src.filter(col("bucket") < 10)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
        lit("U").as("c_status"), (col("o_totalprice") * 1.1).as("c_price"))
      .unionByName(src.filter(col("bucket") >= 95)
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_custkey").as("c_custkey"), lit("N").as("c_status"),
          (col("o_totalprice") * 0.5).as("c_price")))
    val expect = base.join(changes, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("o_custkey"), col("c_custkey")).as("o_custkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("status"),
        coalesce(col("c_price"), col("o_totalprice")).as("price"),
        when(col("o_orderstatus").isNull, "insert")
          .when(col("c_price").isNotNull, "update")
          .otherwise("keep").as("op"))
      .orderBy(col("o_orderkey"))
      .as[(Long, Long, String, Double, String)].collect().toSeq
    assert(got == expect)
    // all three ops occur (non-vacuous)
    assert(Set("update", "insert", "keep")
      .subsetOf(got.map(_._5).toSet))
  }

  test("anomaly series: planted outage and spike flagged, seasonal hours quiet, gaps zero-filled") {
    // 10 days of perfectly seasonal traffic (busier 08:00-17:00),
    // with one dead hour (outage) and one 50-event burst (spike)
    val outageH = 5L * 24 + 10
    val spikeH = 7L * 24 + 3
    val base = for {
      day <- 0 until 10
      hod <- 0 until 24
      h = (day * 24 + hod).toLong
      if h != outageH
      n = 5 + (if (hod >= 8 && hod < 18) 5 else 0) +
        (if (h == spikeH) 50 else 0)
      _ <- 0 until n
    } yield ("A", h)
    val ev = base.toDF("event_type", "h")
    val out = graft.engine.Relational.anomalySeries(ev)
      .as[(String, Long, Long, Double, Double, Boolean)]
      .collect().sortBy(_._2)
    assert(out.length == 240) // the outage hour IS in the spine
    val byH = out.map(r => r._2 -> r).toMap
    assert(byH(outageH)._3 == 0L && byH(outageH)._6,
      "outage hour must be zero-filled and flagged")
    assert(byH(spikeH)._3 == 55L && byH(spikeH)._6,
      "spike hour must be flagged")
    // every other hour matches its seasonal baseline exactly
    assert(out.count(_._6) == 2)
  }

  test("cusum: closed form equals the max(0,s+d) recursion; sustained shift alarms, steady series stays silent") {
    // steady: 200 hours at exactly the mean rate -> cusum pinned at 0.
    // shifted: 150 hours at 10/h then 50 hours at 13/h (+30% sustained
    // -- the level-shift class a per-point 3-sigma bar never trips).
    val rows =
      (0 until 200).flatMap(h => Seq.fill(10)(("steady", h.toLong))) ++
      (0 until 200).flatMap(h =>
        Seq.fill(if (h < 150) 10 else 13)(("shifted", h.toLong)))
    val ev = rows.toDF("event_type", "h")
    val out = engine.Relational.cusumSeries(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // driver recompute via the DIRECT recursion s = max(0, s + d) --
    // the spec arbitrates the closed-form identity itself
    for (ty <- Seq("steady", "shifted")) {
      val cs = (0 until 200).map(h => out((ty, h.toLong))._1)
      val t = cs.sum
      var s = 0L
      for (h <- 0 until 200) {
        s = math.max(0L, s + (cs(h) * 200 - t))
        assert(out((ty, h.toLong))._2 == s,
          s"$ty@$h: closed form ${out((ty, h.toLong))._2} != recursion $s")
      }
    }
    assert((0 until 200).forall(h => !out(("steady", h.toLong))._3),
      "steady series alarmed")
    assert((0 until 150).forall(h => !out(("shifted", h.toLong))._3),
      "alarm before the shift")
    assert((160 until 200).exists(h => out(("shifted", h.toLong))._3),
      "sustained +30% shift never alarmed")
  }

  test("psi: identical halves score exactly zero; a planted shift is positive; terms equal FixLog2.ref") {
    import graft.functions.FixLog2
    // hours 0..9 = reference, 10..19 = current. Same 200-point value
    // mix in both halves -> every bin has a = b AND ta = tb, so each
    // term (a*tb - b*ta)*L is exactly 0 -- PSI's no-drift fixed point.
    val mix = (0 until 200).map(i => (i % 97).toLong * 1000L)
    val same = (mix.map(v => (3L, v)) ++ mix.map(v => (15L, v)))
      .toDF("h", "vq")
    val zero = engine.Relational.psiOf(same).collect()
    assert(zero.forall(_.getLong(3) == 0L), "no-drift PSI not exactly 0")
    // planted shift: current half squeezed into the top decile
    val shifted = (mix.map(v => (3L, v)) ++
      mix.map(v => (15L, 90000L + (v % 6000L)))).toDF("h", "vq")
    val out = engine.Relational.psiOf(shifted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._4).sum > 0L, "shift not detected")
    assert(out.forall(_._4 >= 0L), "a PSI term went negative")
    // term-level exactness vs the driver-side ladder twin
    val ta = out.map(_._2 + 1).sum; val tb = out.map(_._3 + 1).sum
    for ((bin, nr, nc, term) <- out) {
      val (a, b) = (nr + 1, nc + 1)
      val expect = (a * tb - b * ta) * FixLog2.ref(a * tb, b * ta)
      assert(term == expect, s"bin $bin: $term != $expect")
    }
  }

  test("gini concentration: equals an exact BigInt driver recompute") {
    val s = Tables(spark, sf0001, "events").groupBy(col("user_id"))
      .agg(sum(round(col("value") * 1000).cast("long")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = s.sortBy(t => (t._2, t._1)).map(t => BigInt(t._2))
    val n = BigInt(sorted.length); val ssum = sorted.sum
    val sis = sorted.zipWithIndex
      .map { case (v, i) => v * BigInt(i + 1) }.sum
    val gini = (BigInt(1000000) * (BigInt(2) * sis - (n + 1) * ssum)) /
      (n * ssum)
    val got = engine.Relational.qGiniConcentration(spark, sf0001)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((n.toLong, ssum.toLong, gini.toLong)),
      s"gini mismatch: $got vs ($n, $ssum, $gini)")
    // sanity: a Lorenz Gini lives in [0, 1)
    assert(got.getLong(2) >= 0L && got.getLong(2) < 1000000L)
  }

  test("nearest as-of: prior/following/null branches all live; picks within tolerance and closest-wins") {
    val out = engine.Relational.qAsofNearest(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val dts = out.flatMap(_._3)
    assert(dts.exists(_ < 0), "no prior pick exercised")
    assert(dts.exists(_ > 0), "no following pick exercised")
    assert(out.exists(_._3.isEmpty), "no out-of-tolerance null exercised")
    assert(dts.forall(d => math.abs(d) <= 14400L), "pick outside tolerance")
    assert(out.forall(r => r._2.isDefined == r._3.isDefined),
      "oid and dt_sec must be null together")
    // closest-wins, prior on ties: recompute from the raw frames
    val raw = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("long"),
        col("event_type"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val o: Map[Long, Seq[Long]] = raw.filter(_._4 == "click")
      .groupBy(_._2).map { case (k, g) =>
        k -> g.map(_._3).distinct.sorted.toSeq }
    val e = raw.filter(_._4 == "purchase").map(r => (r._1, r._2, r._3))
    val expect = e.map { case (eid, k, t) =>
      val ts = o.getOrElse(k, Seq.empty[Long])
      val prev = ts.filter(_ <= t).lastOption.map(ot => t - ot)
        .filter(_ <= 14400L)
      val next = ts.filter(_ > t).headOption.map(ot => ot - t)
        .filter(_ <= 14400L)
      val dt = (prev, next) match {
        case (Some(p), Some(n)) => Some(if (p <= n) -p else n)
        case (Some(p), None) => Some(-p)
        case (None, Some(n)) => Some(n)
        case _ => None
      }
      eid -> dt
    }.toMap
    assert(out.map(r => r._1 -> r._3).toMap == expect,
      "nearest-pick distances diverge from the driver recompute")
  }

  test("strict as-of: equals a driver recompute; exact-boundary branch is live") {
    val out = graft.engine.Relational.qAsofStrict(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // driver recompute on the same 10-minute buckets
    val raw = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 600000000"), col("event_type"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks: Map[Long, Seq[(Long, Long)]] = raw
      .filter(_._4 == "click")
      .groupBy(_._2).map { case (k, g) =>
        k -> g.groupBy(_._3).map { case (t, cg) =>
          (t, cg.map(_._1).max) }.toSeq.sortBy(_._1)
      }
    val purchases = raw.filter(_._4 == "purchase")
    val expect = purchases.map { case (eid, k, t, _) =>
      (eid, k, clicks.getOrElse(k, Seq.empty)
        .filter(_._1 < t).lastOption.map(_._2))
    }.sortBy(_._1).toSeq
    assert(out.toSeq == expect,
      "strict as-of diverges from the driver recompute")
    // the allow_exact_matches=false distinction must be OBSERVABLE:
    // at least one purchase shares a bucket with a click (so the
    // inclusive carry would pick it) yet the strict result differs
    val inclusive = purchases.map { case (eid, k, t, _) =>
      eid -> clicks.getOrElse(k, Seq.empty)
        .filter(_._1 <= t).lastOption.map(_._2)
    }.toMap
    val strictMap = expect.map(r => r._1 -> r._3).toMap
    assert(purchases.exists(p => inclusive(p._1) != strictMap(p._1)),
      "exact-boundary branch dead: strict ≡ inclusive on this fixture")
    // and both branches of the output are live
    assert(out.exists(_._3.isDefined) && out.exists(_._3.isEmpty))
  }

  test("twa: equals a driver recompute (milli-exact holds, one IEEE division)") {
    val rows = Tables(spark, sf0001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000"),
        round(col("value") * 1000).cast("long"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).collect {
      case (u, evs) if evs.length >= 2 =>
        val s = evs.sortBy(e => (e._2, e._4))
        val holds = s.zip(s.tail).map { case (a, b) => (b._2 - a._2, a._3) }
        val num = holds.map { case (dt, v) => dt * v }.sum
        val den = holds.map(_._1).sum
        u -> ((den, num.toDouble / den.toDouble))
    }
    val got = engine.Relational.qTwa(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect, "twa mismatch")
    assert(got.nonEmpty)
  }

  test("mahalanobis: equals an exact BigInt driver recompute of the adjugate form") {
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, BigInt(r.getLong(2)),
        BigInt(r.getLong(3))))
    val n = BigInt(rows.length)
    val sx = rows.map(_._3).sum; val sy = rows.map(_._4).sum
    val mxx = n * rows.map(r => r._3 * r._3).sum - sx * sx
    val myy = n * rows.map(r => r._4 * r._4).sum - sy * sy
    val mxy = n * rows.map(r => r._3 * r._4).sum - sx * sy
    val dd = mxx * myy - mxy * mxy
    val scored = rows.map { case (ok, ln, x, y) =>
      val u = n * x - sx; val v = n * y - sy
      val q = myy * u * u - BigInt(2) * mxy * u * v + mxx * v * v
      (ok, ln, x.toLong, y.toLong, q > BigInt(9) * dd, q)
    }.sortBy { case (ok, ln, _, _, _, q) => (-q, ok, ln) }.take(20)
      .map(t => (t._1, t._2, t._3, t._4, t._5))
    val got = engine.Relational.qMahalanobis(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == scored.toSeq, s"mahalanobis top-20 mismatch")
  }

  test("chao1: equals a driver recompute of the bias-corrected estimator") {
    val tf = engine.Tables(spark, sf0001, "documents")
      .select("source", "text").collect()
      .flatMap(r => Option(r.getString(1)).getOrElse("").trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).map((r.getString(0), _)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val expect = tf.groupBy(_._1._1).map { case (src, terms) =>
      val counts = terms.values.toSeq
      val (f1, f2) = (counts.count(_ == 1L).toLong, counts.count(_ == 2L).toLong)
      src -> ((counts.size.toLong, f1, f2,
        1000L * counts.size + (1000L * f1 * (f1 - 1)) / (2L * (f2 + 1))))
    }
    val got = engine.TextOps.qChao1(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"chao1 mismatch: $got vs $expect")
  }

  test("weighted median query: equals a driver recompute; salted join keeps the salt in the plan") {
    // q_weighted_median vs an independent driver-side weighted median
    // over the raw rows (lower weighted median: smallest v whose
    // cumulative weight reaches half the total, ties pre-collapsed).
    val raw = Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (f, rows) =>
      val byV = rows.groupBy(_._2).map { case (v, g) =>
        (v, g.map(_._3).sum) }.toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      val med = byV.collectFirst {
        case (v, w) if { cum += w; cum * 2 >= tot } => v }.get
      f -> ((med, tot))
    }
    val got = engine.Relational.qWeightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"weighted median mismatch: $got vs $expect")

    // the quartile-band generalization: monotone bands, and its p50
    // IS the weighted median (same definition, same pass)
    val bands = engine.Relational.qWeightedQuantiles(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((f, (p25, p50, p75)) <- bands) {
      assert(p25 <= p50 && p50 <= p75, s"$f bands not monotone")
      assert(p50 == expect(f)._1, s"$f p50 != weighted median")
    }

    // q_salted_join: the salt must actually reach the join — the
    // oracle (plain join) can't see a silently-simplified salt, only
    // the plan can. Both the big-side salt column and the small-side
    // explode have to survive optimization.
    val plan = engine.Relational.qSaltedJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt optimized away:\n$plan")
    assert(plan.toLowerCase.contains("explode"),
      s"small-side salt replication missing:\n$plan")
  }

  test("shardedPrefixSumBy: grouped decomposition equals the flat per-group window") {
    import org.apache.spark.sql.expressions.Window
    // deterministic mixed groups incl. a dominant one and a singleton
    val rows = (0 until 5000).map { i =>
      val g = if (i % 10 < 8) "mega" else "g" + (i % 10)
      (i.toLong, g, (i * 2654435761L % 97).toString, (i % 13).toLong)
    } :+ (99999L, "solo", "zz", 7L)
    val df = rows.toDF("id", "g", "ord", "v")
    val flat = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("ord"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq.sorted
    val sharded = Scale.shardedPrefixSumBy(df, Seq("g"),
        substring(col("ord"), 1, 1), Seq(col("ord"), col("id")),
        col("v"), "cum")
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(sharded == flat && sharded.nonEmpty)
    // empty group list degenerates to the global scan
    val global = Scale.shardedPrefixSum(df,
        substring(col("ord"), 1, 1), Seq(col("ord"), col("id")),
        col("v"), "cum")
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq.sorted
    val flatGlobal = df.withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("ord"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(global == flatGlobal)
  }

  test("quantileCutKeep: equals the percent_rank filter incl. tie/singleton/degenerate corners") {
    import org.apache.spark.sql.expressions.Window
    def pctKeep(df: org.apache.spark.sql.DataFrame,
        cut: Double): Seq[Long] =
      df.withColumn("pct", percent_rank().over(
          Window.partitionBy(col("g")).orderBy(col("q"))))
        .filter(col("pct") >= cut)
        .select(col("id")).as[Long].collect().toSeq.sorted
    def histKeep(df: org.apache.spark.sql.DataFrame,
        num: Long, den: Long): Seq[Long] =
      Scale.quantileCutKeep(df, "g", "q", num, den)
        .select(col("id")).as[Long].collect().toSeq.sorted
    // mixed: continuous scores, a heavy tie class straddling the cut,
    // a singleton group, an all-tie group, a two-row group
    val rows =
      (0 until 2000).map(i => (i.toLong, "a", (i % 331).toDouble / 331)) ++
      (0 until 500).map(i => (2000L + i, "ties", if (i < 150) 0.1 else 0.5)) ++
      Seq((9000L, "solo", 0.7)) ++
      (0 until 40).map(i => (9100L + i, "flat", 0.25)) ++
      Seq((9500L, "duo", 0.3), (9501L, "duo", 0.9))
    val df = rows.toDF("id", "g", "q").persist()
    try {
      assert(histKeep(df, 1, 5) == pctKeep(df, 0.2))
      assert(histKeep(df, 1, 2) == pctKeep(df, 0.5))
      assert(histKeep(df, 9, 10) == pctKeep(df, 0.9))
      // empty input
      val empty = Seq.empty[(Long, String, Double)].toDF("id", "g", "q")
      assert(Scale.quantileCutKeep(empty, "g", "q", 1, 5).count() == 0)
    } finally df.unpersist()
  }
}
