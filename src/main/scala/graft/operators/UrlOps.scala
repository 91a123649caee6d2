package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus deduplication — SURVEY.md §2.K EXT.
  *
  * The same page is typically crawled under many URL spellings (case in
  * the host, `www.`, explicit default ports, tracking query params,
  * fragments, trailing slashes). Canonicalizing before grouping turns
  * those into one key, so URL-level dedup is a single hash shuffle, like
  * q_dedup_exact.
  *
  * Every step is a plain `functions._` regex/string expression: the whole
  * column stays inside whole-stage codegen (no UDF), and the pipeline is
  * replayable in any RE2-compatible SQL engine, which is what the DuckDB
  * oracle for q_dedup_url does. Deliberately NOT handled (documented
  * contract, not an oversight): percent-encoding normalization, IDN hosts,
  * query-param reordering, and case-insensitive param names — those need
  * a real URL parser, and crawl pipelines normally run this AFTER a
  * fetcher that already emits encoded ASCII URLs.
  */
object UrlOps {

  /** Tracking params dropped during canonicalization (exact, case-sensitive
    * names; `utm_*` is a prefix family). */
  val trackingParamPattern = "(?:utm_[^=&#]*|gclid|fbclid|msclkid|ref_src)"

  /** Scheme and `host[:port]` of a URL, lowercased; null if not a
    * `scheme://`-shaped string. */
  def urlScheme(url: Column): Column =
    lower(nullif(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1), lit("")))

  def urlHostPort(url: Column): Column =
    lower(nullif(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1), lit("")))

  /** Canonical URL (see object doc for the normalization contract). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val hostPort = urlHostPort(url)
    val host = regexp_replace(regexp_replace(hostPort, ":[0-9]*$", ""), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keptPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))

    // everything after the authority, fragment dropped
    val rest = regexp_replace(regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""), "#.*$", "")
    val rawPath = regexp_extract(rest, "^([^?]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val rawQuery = regexp_extract(rest, "\\?(.*)$", 1)
    // split on '&', drop tracking params and empty segments, rejoin. A
    // single regexp_replace over the whole query either needs a lookahead
    // (not RE2, so the oracle couldn't replay it) or misses adjacent
    // params; the split form is one-pass correct in both engines. The
    // lambda runs per PARAM, not per char, so the interpreted-HOF cost is
    // a few evals per row.
    val tracking = "^" + trackingParamPattern + "(=.*)?$"
    val tidied = array_join(
      filter(split(rawQuery, "&"), p => p =!= "" && not(p.rlike(tracking))), "&")
    val keptQuery = when(tidied === "", lit("")).otherwise(concat(lit("?"), tidied))

    when(scheme.isNull, url) // not a URL: pass through unchanged
      .otherwise(concat(scheme, lit("://"), host, keptPort, path, keptQuery))
  }

  /** All `href="…"` targets of an HTML page, in document order — the
    * outlink-extraction half of crawl processing (the link graph feeds
    * PageRank-style quality priors and frontier expansion). Double-quoted
    * hrefs only, by contract: the fetcher-normalized HTML this runs on
    * quotes attributes, and a single RE2 regex keeps the extraction
    * codegen'd and oracle-replayable (no HTML parser dependency). */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]+)\""), lit(1))

  /** Registrable host of a link: lowercased authority with any port and
    * a leading `www.` stripped — the key outlink analyses group on. Null
    * for non-`scheme://` links (relative hrefs). */
  def linkHost(url: Column): Column =
    regexp_replace(regexp_replace(urlHostPort(url), ":[0-9]*$", ""), "^www\\.", "")

  /** Snapshot dedup for a recrawled corpus: canonicalize each page's URL
    * and keep the NEWEST capture per canonical URL (highest `tsCol`,
    * ties broken by lowest id) — "the current version of every page",
    * where [[canonicalizeUrl]]-based min-id dedup keeps an arbitrary
    * crawl. Returns one row per canonical URL:
    * (canonical_url, latest_ts, keep_id, n_snapshots).
    *
    * Scale (100 TB): canonicalization is map-side; the selection is two
    * keyed aggs on the canonical key — max ts (+ snapshot count), then
    * min id among the max-ts rows — so a page recrawled millions of
    * times costs a bounded agg state, never a per-URL window sort.
    *
    * Null contract (explicit, not incidental): rows with a null `urlCol`
    * have no canonical key and are EXCLUDED up front — the one row class
    * this operator drops, filtered visibly rather than lost inside the
    * equi-join's null-key discard. Null `tsCol` rows keep their group
    * membership (counted in n_snapshots) but cannot win; a URL whose
    * captures are ALL null-ts still surfaces, with null latest_ts and
    * min-id keep_id, via the null-safe match below. */
  def latestPerUrl(pages: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String, tsCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val canon = pages.filter(col(urlCol).isNotNull)
      .select(col(idCol), col(tsCol),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
    // descending-ts heap key: an EXACT monotone inversion of ts, so the
    // k=1 MinKByAgg under (desc_ts ASC, id ASC) picks "max ts, ties to
    // min id" in the SAME aggregation pass as max/count — one keyed agg,
    // no join-back, and the regex canonicalization runs ONCE per row
    // (the join form evaluates the canon branch twice — a second full
    // map pass over the corpus at 100 TB). Nulls map to Long.MaxValue:
    // a null-ts capture loses to any dated one but an all-null group
    // still keeps its min id. Exactness matters: epoch micros (~1e15)
    // stay far from Long.MinValue, and no double rounding is involved —
    // a cast-to-double inversion would collapse ties above 2^53.
    val descTs: Option[Column] = pages.schema(tsCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(coalesce(-col(tsCol).cast("long"), lit(Long.MaxValue)))
      case TimestampType =>
        Some(coalesce(-unix_micros(col(tsCol)), lit(Long.MaxValue)))
      case _ => None
    }
    descTs match {
      case Some(d) =>
        canon.groupBy("canonical_url")
          .agg(
            max(col(tsCol)).as("latest_ts"),
            count(lit(1)).as("n_snapshots"),
            graft.functions.MinKByAgg.minKByAgg(
              struct(d.as("nt"), col(idCol).as("i")),
              struct(col(idCol).as("keep_id")), k = 1).as("__kb"))
          .select(col("canonical_url"), col("latest_ts"),
            element_at(col("__kb"), 1).getField("keep_id").as("keep_id"),
            col("n_snapshots"))
      case None =>
        // non-invertible ts types: the two-keyed-agg + null-safe join
        // form (same semantics, one extra map pass)
        val latest = canon.groupBy("canonical_url")
          .agg(max(col(tsCol)).as("latest_ts"), count(lit(1)).as("n_snapshots"))
        canon.join(latest, Seq("canonical_url"))
          .filter(col(tsCol) <=> col("latest_ts"))
          .groupBy(col("canonical_url"), col("latest_ts"), col("n_snapshots"))
          .agg(min(col(idCol)).as("keep_id"))
          .select("canonical_url", "latest_ts", "keep_id", "n_snapshots")
    }
  }
}
