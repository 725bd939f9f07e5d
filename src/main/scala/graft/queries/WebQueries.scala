package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Web-pipeline curation: URL canonicalization + host-level dedup/caps —
  * the one common web-crawl curation step (CCNet/RefinedWeb fetch-dedup
  * and per-host anti-flooding) the engine's q195 source caps and q115
  * normalization didn't cover (round-15 verdict stretch #8).
  *
  * The testdata carries no URL column, so each document gets a
  * DETERMINISTIC synthetic URL derived from (source, doc_id) — four raw
  * variants (mixed-case scheme/host, `www.` prefix, explicit default
  * port, trailing slash, tracking params in shuffled order, fragments)
  * that exercise every canonicalization rule and collapse onto shared
  * canonical pages, so fetch-dedup genuinely fires. The construction is
  * pure column arithmetic, replayed verbatim by the DuckDB oracle.
  *
  * Scale shape: canonicalization is a scan-local projection (no UDF —
  * regexp/split/sort built-ins, codegen'd); host stats are one
  * partial+final agg on the derived host; the per-host page cap rides
  * the bounded TopKPairs heap (map-side collapse — never a window over
  * the page stream); fetch-dedup is groupBy(canon_url) + min, the q34
  * exact-dedup discipline on the derived key.
  */
object WebQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Pages a host keeps under the anti-flooding cap. */
  private val HostCap = 10

  /** Host label for the synthetic URL: mostly source-derived, but every
    * 11th doc lands on one of three shared `mirrorN` hosts REGARDLESS of
    * its source — so cross-source hosts exist and q276's derived-host cap
    * genuinely catches flooding no source-level cap can see (round-16
    * advice: a bijective source→host fixture never exercised that claim).
    */
  private def hostLabel(source: Column, docId: Column): Column =
    when(docId % 11 === 0,
         concat(lit("mirror"), (docId % 3).cast("string")))
      .otherwise(source)

  /** Synthetic raw URL: variant m = doc_id % 7 — see the oracle twin.
    * m=0/1 and m=2/3 collapse pairwise onto shared canonical pages;
    * m=4 (PATHLESS authority with a query) and m=5 (root-slash twin)
    * collapse together — the round-16 verdict's latent gap (a); m=6
    * carries a NON-default port that must survive canonicalization as a
    * distinct origin from m=2/3's portless news page — latent gap (b).
    */
  private def rawUrl(source: Column, docId: Column): Column = {
    val hl   = hostLabel(source, docId)
    val page = (docId % 50).cast("string")
    val m    = docId % 7
    when(m === 0, concat(lit("https://www."), hl,
        lit(".example.com/articles/"), page,
        lit("/?utm_source=feed&b=2&a=1")))
      .when(m === 1, concat(lit("HTTPS://"), hl,
        lit(".EXAMPLE.com:443/articles/"), page,
        lit("?a=1&b=2&utm_campaign=x")))
      .when(m === 2, concat(lit("http://"), hl,
        lit(".example.com/news/"), page, lit("?z=9&y=8#top")))
      .when(m === 3, concat(lit("HTTP://WWW."), hl,
        lit(".Example.COM:80/news/"), page,
        lit("/?y=8&z=9&fbclid=abc")))
      .when(m === 4, concat(lit("HTTPS://WWW."), hl,
        lit(".example.COM?b=2&a=1&utm_medium=m")))
      .when(m === 5, concat(lit("https://"), hl,
        lit(".example.com/?a=1&b=2")))
      .otherwise(concat(lit("http://"), hl,
        lit(".example.com:8080/news/"), page, lit("?y=8&z=9")))
  }

  /** Canonicalize: lowercase scheme+host, strip `www.` and the SCHEME'S
    * default port only (`:80` for http, `:443` for https — a non-default
    * port is a different origin and must survive), drop fragment, strip
    * tracking params (utm_*, fbclid), sort the surviving query params,
    * strip trailing path slashes. The authority ends at the first of
    * `/` or `?` — a pathless URL with a query (`https://h?a=1`) must not
    * swallow the query into the host.
    */
  private def canonicalize(raw: Column): (Column, Column) = {
    val scheme = lower(regexp_extract(raw, "^([A-Za-z]+)://", 1))
    val rest   = regexp_replace(raw, "^[A-Za-z]+://", "")
    val noFrag = substring_index(rest, "#", 1)
    val auth   = substring_index(substring_index(noFrag, "/", 1), "?", 1)
    val authLc = lower(auth)
    val host   = regexp_replace(
      when(scheme === "http",  regexp_replace(authLc, ":80$", ""))
        .when(scheme === "https", regexp_replace(authLc, ":443$", ""))
        .otherwise(authLc),
      "^www\\.", "")
    val pq     = substring(noFrag, length(auth) + 1, lit(1000000))
    val path   = regexp_replace(substring_index(pq, "?", 1), "/+$", "")
    val query  = when(instr(pq, "?") > 0,
                      substring(pq, instr(pq, "?") + 1, lit(1000000)))
      .otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid=")))
    val canonQ = array_join(params, "&")
    val canon  = concat(scheme, lit("://"), host, path,
                        when(canonQ =!= "", concat(lit("?"), canonQ))
                          .otherwise(lit("")))
    (host, canon)
  }

  /** Annotated URL frame shared by both queries. */
  private def urlFrame(s: SparkSession, dir: String): DataFrame = {
    val d   = Tables(s, dir).documents
    val raw = rawUrl(col("source"), col("doc_id"))
    val (host, canon) = canonicalize(raw)
    d.select(col("doc_id"), raw.as("raw_url"),
             host.as("host"), canon.as("canon_url"))
  }

  val defs: Map[String, Q] = Map(
    // -----------------------------------------------------------------
    // q275: URL CANONICALIZATION — per doc, the raw URL and its
    // canonical form + host. Pure scan-local projection: at 100 TB this
    // is the zero-shuffle normalization pass every crawl pipeline runs
    // before any URL-keyed dedup can work (raw variants of one page
    // must collide on the canonical key, never on the raw string).
    // -----------------------------------------------------------------
    "q275_url_canonicalize" -> { (s, dir) => urlFrame(s, dir) },

    // -----------------------------------------------------------------
    // q276: HOST-LEVEL FETCH-DEDUP + ANTI-FLOODING CAP — the CCNet/
    // RefinedWeb step after canonicalization: collapse re-fetches of the
    // same canonical page (keep the smallest doc_id — the q34 keep-first
    // convention), then cap each host at HostCap pages (smallest page
    // doc_id first — the q195 anti-flooding discipline keyed by the
    // DERIVED host, which no source-level cap can see: one host can
    // spread across source labels and vice versa). Emits the surviving
    // pages with per-host dedup stats attached.
    // Scale shape: ONE partial+final agg per derived key (canon_url,
    // then host) + a bounded heap for the cap; the corpus text never
    // moves — only (doc_id, url) pairs shuffle.
    // -----------------------------------------------------------------
    "q276_host_dedup_cap" -> { (s, dir) =>
      val u = urlFrame(s, dir)
      // fetch-dedup: canonical page = min doc_id per canon_url. Eagerly
      // cut: `pages` feeds the host stats, the cap heap AND the final
      // join-back — uncut, each reference re-ran the regex URL
      // canonicalization over the corpus; the frame is one narrow row
      // per distinct page
      val pages = graft.core.Materialize.cut(
        u.groupBy(col("host"), col("canon_url"))
          .agg(min(col("doc_id")).as("page_doc_id"),
               count(lit(1)).as("n_fetches")), "q276_pages")
      val hostStats = pages.groupBy(col("host"))
        .agg(count(lit(1)).as("n_pages"),
             sum(col("n_fetches")).as("n_docs"),
             (sum(col("n_fetches")) - count(lit(1))).as("dup_fetches"))
      // anti-flooding cap: keep the HostCap smallest page_doc_ids per
      // host on the bounded heap (ascending key = zero-padded doc_id)
      val kept = pages
        .select(col("host"),
                lpad(col("page_doc_id").cast("string"), 19, "0").as("key"),
                col("page_doc_id"))
        .groupBy(col("host"))
        .agg(org.apache.spark.sql.graftx.TopKPairs
          .topK(col("key"), col("page_doc_id"), HostCap).as("top"))
        .select(col("host"), explode(col("top")).as("c"))
        .select(col("host"), col("c.id").as("page_doc_id"))
      kept.join(pages, Seq("host", "page_doc_id"))
        .join(hostStats, Seq("host"))
        .select(col("host"), col("canon_url"), col("page_doc_id"),
                col("n_fetches"), col("n_pages"), col("n_docs"),
                col("dup_fetches"))
    },

    // -----------------------------------------------------------------
    // q277: HOST POLICY FILTER — robots/blocklist-style filtering on the
    // DERIVED host (round-16 verdict stretch #7): a seed policy table
    // (blocked hosts — one shared mirror, one source host, one
    // non-default-port origin) broadcast-joined to the canonicalized
    // frame; unlisted hosts default to 'allow'. Emits the per-host
    // policy verdict with doc counts — the filter itself is
    // `status = 'allow'`. Scale shape: the policy seed is tiny and
    // BROADCAST (plan-asserted) — the corpus never shuffles for the
    // policy join; the per-host counts are one partial+final agg.
    // -----------------------------------------------------------------
    "q277_host_policy_filter" -> { (s, dir) =>
      val policy = s.createDataFrame(Seq(
        ("mirror1.example.com", "block"),
        ("src3.example.com", "block"),
        ("src5.example.com:8080", "block"))).toDF("host", "action")
      urlFrame(s, dir)
        .join(broadcast(policy), Seq("host"), "left")
        .groupBy(col("host"),
                 coalesce(col("action"), lit("allow")).as("status"))
        .agg(count(lit(1)).as("n_docs"))
    })

  /** DuckDB twin of [[hostLabel]] + [[rawUrl]] (CTE bodies). */
  private val rawUrlCtesSql: String =
    """h0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0
      |         THEN 'mirror' || CAST(doc_id % 3 AS VARCHAR)
      |         ELSE source END AS hl,
      |    CAST(doc_id % 50 AS VARCHAR) AS page
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, CASE doc_id % 7
      |    WHEN 0 THEN 'https://www.' || hl || '.example.com/articles/' ||
      |      page || '/?utm_source=feed&b=2&a=1'
      |    WHEN 1 THEN 'HTTPS://' || hl || '.EXAMPLE.com:443/articles/' ||
      |      page || '?a=1&b=2&utm_campaign=x'
      |    WHEN 2 THEN 'http://' || hl || '.example.com/news/' ||
      |      page || '?z=9&y=8#top'
      |    WHEN 3 THEN 'HTTP://WWW.' || hl || '.Example.COM:80/news/' ||
      |      page || '/?y=8&z=9&fbclid=abc'
      |    WHEN 4 THEN 'HTTPS://WWW.' || hl ||
      |      '.example.COM?b=2&a=1&utm_medium=m'
      |    WHEN 5 THEN 'https://' || hl || '.example.com/?a=1&b=2'
      |    ELSE 'http://' || hl || '.example.com:8080/news/' ||
      |      page || '?y=8&z=9'
      |  END AS raw_url FROM h0)""".stripMargin

  /** DuckDB twin of [[canonicalize]] + [[urlFrame]], as a CTE chain
    * ending in `u(doc_id, raw_url, host, canon_url)`.
    */
  private val urlCtesSql: String =
    s"""$rawUrlCtesSql,
       |c1 AS (
       |  SELECT doc_id, raw_url,
       |    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    split_part(regexp_replace(raw_url, '^[A-Za-z]+://', ''),
       |               '#', 1) AS nofrag
       |  FROM r),
       |c2 AS (
       |  SELECT *,
       |    split_part(split_part(nofrag, '/', 1), '?', 1) AS auth,
       |    substr(nofrag, length(
       |      split_part(split_part(nofrag, '/', 1), '?', 1)) + 1) AS pq
       |  FROM c1),
       |c3 AS (
       |  SELECT doc_id, raw_url, scheme,
       |    regexp_replace(
       |      CASE WHEN scheme = 'http'
       |             THEN regexp_replace(lower(auth), ':80$$', '')
       |           WHEN scheme = 'https'
       |             THEN regexp_replace(lower(auth), ':443$$', '')
       |           ELSE lower(auth) END,
       |      '^www\\.', '') AS host,
       |    regexp_replace(split_part(pq, '?', 1), '/+$$', '') AS path,
       |    CASE WHEN strpos(pq, '?') > 0
       |         THEN substr(pq, strpos(pq, '?') + 1) ELSE '' END AS query
       |  FROM c2),
       |c4 AS (
       |  SELECT doc_id, raw_url, scheme, host, path,
       |    array_to_string(list_sort(list_filter(string_split(query, '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_')
       |           AND NOT starts_with(p, 'fbclid='))), '&') AS canonq
       |  FROM c3),
       |u AS (
       |  SELECT doc_id, raw_url, host,
       |    scheme || '://' || host || path ||
       |    CASE WHEN canonq <> '' THEN '?' || canonq ELSE '' END AS canon_url
       |  FROM c4)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q275_url_canonicalize" ->
      s"""WITH $urlCtesSql
         |SELECT doc_id, raw_url, host, canon_url FROM u""".stripMargin,
    "q276_host_dedup_cap" ->
      s"""WITH $urlCtesSql,
         |pages AS (
         |  SELECT host, canon_url,
         |    CAST(min(doc_id) AS BIGINT) AS page_doc_id,
         |    CAST(count(*) AS BIGINT) AS n_fetches
         |  FROM u GROUP BY 1, 2),
         |hs AS (
         |  SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
         |    CAST(sum(n_fetches) AS BIGINT) AS n_docs,
         |    CAST(sum(n_fetches) - count(*) AS BIGINT) AS dup_fetches
         |  FROM pages GROUP BY 1),
         |kept AS (
         |  SELECT host, canon_url, page_doc_id, n_fetches FROM (
         |    SELECT *, row_number() OVER (PARTITION BY host
         |      ORDER BY page_doc_id ASC) AS rn
         |    FROM pages) z WHERE rn <= $HostCap)
         |SELECT k.host, k.canon_url, k.page_doc_id, k.n_fetches,
         |  h.n_pages, h.n_docs, h.dup_fetches
         |FROM kept k JOIN hs h USING (host)""".stripMargin,
    "q277_host_policy_filter" ->
      s"""WITH $urlCtesSql,
         |pol(host, action) AS (VALUES
         |  ('mirror1.example.com', 'block'),
         |  ('src3.example.com', 'block'),
         |  ('src5.example.com:8080', 'block'))
         |SELECT u.host, coalesce(p.action, 'allow') AS status,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM u LEFT JOIN pol p USING (host)
         |GROUP BY 1, 2""".stripMargin)
}
