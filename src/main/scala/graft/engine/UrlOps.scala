package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL/domain canonicalization — the standard web-curation stage of
  * C4 / RefinedWeb-style training-data pipelines (per-URL dedup and
  * per-domain rollups/blocklists are meaningless without it: the same
  * page arrives as `HTTP://WWW.Site.com:80/a//b?utm_source=x#frag`
  * and `http://site.com/a/b`).
  *
  * Every rule is a built-in codegen'd Catalyst expression over one
  * row — no UDFs, no shuffle: the whole canonicalization is a narrow
  * projection that scales linearly with input splits at 100 TB, and
  * the rollup/blocklist queries behind it shuffle only on the
  * already-tiny (domain) key space. Regex constructs are restricted
  * to the Java-regex/RE2 common subset (literal alternation,
  * character classes, anchors, bounded quantifiers) so the DuckDB
  * oracles restate the exact same semantics.
  *
  * Canonical form (documented here, asserted by `UrlOpsSpec`, each
  * rule restated in the oracles):
  *   1. fragment dropped;
  *   2. scheme lowercased;
  *   3. userinfo (`user:pw@`) dropped;
  *   4. host lowercased, ONE leading `www.` label stripped;
  *   5. default ports dropped (http:80, https:443), others kept;
  *   6. path: runs of `/` collapsed to one, trailing `/` stripped,
  *      empty path rendered as `/` (path CASE is preserved — unlike
  *      the authority, paths are case-sensitive per RFC 3986);
  *   7. query: split on `&`, empty params and tracking params
  *      (`utm_*`, `gclid`, `fbclid`, `msclkid`, `ref`, `ref_src`)
  *      dropped, the rest sorted bytewise and rejoined; an emptied
  *      query loses its `?`.
  */
object UrlOps {

  /** Tracking parameters dropped by rule 7 — the common C4/CCNet
    * scrub list. One alternation, shared by engine and oracle. */
  private[graft] val trackingParamRe =
    "^(utm_[a-z]+|gclid|fbclid|msclkid|ref|ref_src)="

  /** Multi-label public suffixes recognized by [[registeredDomain]] —
    * a deliberately small, documented subset of the PSL (the full
    * list is data, not semantics; swapping it in changes nothing
    * structural). */
  private[graft] val multiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "net.au",
    "com.br", "co.in", "com.cn", "com.mx", "co.nz", "com.sg")

  /** URL with the fragment stripped — the shared first step. */
  private def noFrag(url: Column): Column =
    regexp_replace(url, "#.*$", "")

  /** Lowercased scheme (rule 2); "" when the input has no
    * `scheme://` prefix. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(noFrag(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Authority with userinfo dropped (rule 3), original case/port. */
  private def authority(url: Column): Column =
    regexp_replace(
      regexp_extract(noFrag(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^@]*@", "")

  /** Canonical host: lowercased, one leading `www.` stripped, no
    * port (rules 4). */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_replace(authority(url), ":[0-9]+$", "")),
      "^www\\.", "")

  /** Canonical `:port` suffix — "" for absent or scheme-default
    * ports (rule 5). */
  private def portSuffix(url: Column): Column = {
    val scheme = urlScheme(url)
    val port = regexp_extract(authority(url), ":([0-9]+)$", 1)
    when(port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
  }

  /** Canonical path (rule 6): slash runs collapsed, trailing slash
    * stripped, "" rendered `/`, case preserved. */
  def urlPath(url: Column): Column = {
    val raw = regexp_extract(noFrag(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val collapsed = regexp_replace(regexp_replace(raw, "/{2,}", "/"),
      "/$", "")
    when(collapsed === "", lit("/")).otherwise(collapsed)
  }

  /** Canonical query (rule 7): tracking/empty params dropped, rest
    * sorted bytewise, rejoined; "" when nothing survives. */
  def urlQuery(url: Column): Column = {
    val raw = regexp_extract(noFrag(url), "\\?(.*)$", 1)
    val kept = filter(split(raw, "&"),
      t => t =!= "" && !t.rlike(trackingParamRe))
    array_join(array_sort(kept), "&")
  }

  /** The full canonical URL — rules 1–7 composed. NULL (not a
    * malformed `:///…` string) for schemeless/relative inputs: every
    * component extractor anchors on `scheme://`, so without it they
    * all degenerate to "" and the concat would silently emit garbage
    * that downstream dedups/rollups would then group on. */
  def canonicalizeUrl(url: Column): Column = {
    val q = urlQuery(url)
    when(urlScheme(url) === "", lit(null).cast("string"))
      .otherwise(
        concat(urlScheme(url), lit("://"), urlHost(url), portSuffix(url),
          urlPath(url),
          when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registered (pay-level) domain of a canonical host: last two
    * labels, or last three when the last two are a recognized
    * multi-label public suffix ([[multiSuffixes]]); a dotless host is
    * its own domain. The per-domain key every rollup/blocklist below
    * groups on — cardinality is web-domain-sized (millions at 100 TB,
    * not corpus-sized), so the downstream shuffles stay tiny. */
  def registeredDomain(host: Column): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2 === "", host)
      .when(last2.isInCollection(multiSuffixes) && last3 =!= "", last3)
      .otherwise(last2)
  }

  /** Deterministic synthetic URL per document — the SF fixtures have
    * no URL column, so the query derives one from (doc_id, source,
    * lang) with every canonicalization hazard planted: mixed-case
    * scheme/host, userinfo, www/blog subdomains, default and
    * non-default ports, doubled slashes, trailing slashes, tracking
    * params, unsorted params, fragments. The DuckDB oracles restate
    * this derivation verbatim, so the canonicalizer is what is
    * actually under test. */
  private[graft] def syntheticUrl: Column = {
    val id = col("doc_id")
    concat(
      when(id % 2 === 0, lit("HTTPS")).otherwise(lit("Http")),
      lit("://"),
      when(id % 5 === 0, lit("u:p@")).otherwise(lit("")),
      when(id % 3 === 0, lit("WWW."))
        .when(id % 3 === 1, lit("Blog.")).otherwise(lit("")),
      col("source"),
      when(id % 4 === 0, lit(".CO.UK")).otherwise(lit(".COM")),
      when(id % 8 === 0, lit(":8080"))
        .when(id % 2 === 0, lit(":443"))
        .when(id % 5 === 0, lit(":80")).otherwise(lit("")),
      lit("/Docs//"), col("lang"), lit("/"), (id % 10).cast("string"),
      when(id % 7 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), (id % 5).cast("string"), lit("&z=9&a=1"),
      when(id % 6 === 0, lit("&fbclid=X")).otherwise(lit("")),
      when(id % 9 === 0, lit("#Sec2")).otherwise(lit("")))
  }

  /** The same derivation as DuckDB SQL — shared by the oracles. */
  private[graft] val syntheticUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'Http' END || '://'
      | || CASE WHEN doc_id % 5 = 0 THEN 'u:p@' ELSE '' END
      | || CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
      |         WHEN doc_id % 3 = 1 THEN 'Blog.' ELSE '' END
      | || source
      | || CASE WHEN doc_id % 4 = 0 THEN '.CO.UK' ELSE '.COM' END
      | || CASE WHEN doc_id % 8 = 0 THEN ':8080'
      |         WHEN doc_id % 2 = 0 THEN ':443'
      |         WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END
      | || '/Docs//' || lang || '/' || CAST(doc_id % 10 AS VARCHAR)
      | || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
      | || '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) || '&z=9&a=1'
      | || CASE WHEN doc_id % 6 = 0 THEN '&fbclid=X' ELSE '' END
      | || CASE WHEN doc_id % 9 = 0 THEN '#Sec2' ELSE '' END)"""
      .stripMargin.replace("\n", " ")

  /** Canonicalization itself, per document: (doc_id, url_canon,
    * host, domain). One narrow projection — zero shuffles beyond the
    * final presentation sort. */
  def qUrlCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    val u = syntheticUrl
    d.select(col("doc_id"),
      canonicalizeUrl(u).as("url_canon"),
      urlHost(u).as("host"),
      registeredDomain(urlHost(u)).as("domain"))
      .orderBy(col("doc_id"))
  }

  /** Per-domain rollup with a blocklist anti-join — the curation
    * gate: canonical-URL and host cardinality per registered domain,
    * blocklisted domains removed. The rollup shuffles on the tiny
    * (domain) key; the blocklist is a literal broadcast anti-join
    * (at 100 TB: a real blocklist is ≤ millions of rows — still a
    * broadcast). */
  private[graft] val blockedDomains: Seq[String] =
    Seq("src3.com", "src7.co.uk", "src11.com")

  def qDomainRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    val u = syntheticUrl
    val rows = d.select(
      registeredDomain(urlHost(u)).as("domain"),
      urlHost(u).as("host"),
      canonicalizeUrl(u).as("url_canon"))
    val block = spark.createDataFrame(
      blockedDomains.map(Tuple1(_))).toDF("domain")
    rows.join(broadcast(block), Seq("domain"), "left_anti")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url_canon")).as("n_distinct_urls"),
        countDistinct(col("host")).as("n_hosts"))
      .orderBy(col("domain"))
  }

  /** Canonical-URL dedup keyed by (domain, path) — the "same page,
    * many spellings" collapse: groups with >1 raw spelling of one
    * canonical location keep the lowest doc_id (the exact-dedup
    * keep-first convention). Group key cardinality is
    * domains × paths, far below corpus size, so the shuffle is small
    * and AQE-splittable. */
  def qUrlDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    val u = syntheticUrl
    d.select(registeredDomain(urlHost(u)).as("domain"),
      urlPath(u).as("path"), col("doc_id"))
      .groupBy(col("domain"), col("path"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .orderBy(col("domain"), col("path"))
  }
}
