package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first dedup stage of a
  * web-corpus curation pipeline (C4 and CCNet both dedup by URL before
  * any content hashing: two crawls of the same page differ in boilerplate
  * but share a canonical URL, and URL dedup is free compared to text
  * dedup).
  *
  * Scale posture: [[canonicalize]] is a pure per-row projection (string
  * splits + one codegen'd higher-order filter — no UDF, no shuffle);
  * [[dedupByUrl]] adds exactly one hash-shuffle on the canonical-url key
  * with map-side partial min/count. At 100 TB the shuffle moves only
  * (url, id) pairs, never document payloads.
  *
  * Every step is restricted to string algebra that DuckDB replays
  * bit-identically (split_part / lower / regexp on RE2-safe patterns /
  * list filter + join), so the whole operator is oracle-checkable.
  */
object UrlOps {

  /** Params dropped during canonicalization: click-tracking noise that
    * differs per crawl of the same page. Anchored, RE2-safe. */
  val trackingParamPattern = "^(utm_[a-z_]+|ref|fbclid|gclid)="

  /** Canonical form of an absolute URL:
    *   - scheme and host lowercased (path case is preserved — it is
    *     significant on most origin servers)
    *   - leading `www.` stripped from the host
    *   - scheme-default port dropped (`:443` for https, `:80` for http)
    *   - fragment dropped (never sent to the server)
    *   - tracking query params dropped ([[trackingParamPattern]]),
    *     remaining params kept in original order; `?` dropped if none
    *     survive
    *   - trailing `/` runs on the path collapsed away
    *
    * Scheme-less strings (no `://`) are returned unchanged except for
    * fragment removal — a crawl frontier contains protocol-relative and
    * garbage entries, and silently rewriting them would merge distinct
    * keys. Idempotent: canonicalize ∘ canonicalize = canonicalize
    * (property-pinned in UrlOpsSpec).
    *
    * Executes as ONE native whole-stage-codegen kernel
    * ([[graft.functions.NativeExprs.CanonicalizeUrl]]) — the 5-regex +
    * split + HOF-filter composition it replaces is kept below as
    * [[canonicalizeSpec]], the executable specification the UrlOpsSpec
    * property test pins the kernel against (byte-for-byte over
    * generated URL soup); the dedup_url oracle replays the same string
    * algebra in DuckDB.
    */
  def canonicalize(url: Column): Column =
    graft.functions.NativeExprs.canonicalizeUrl(url)

  /** The original Catalyst composition — the kernel's executable spec. */
  private[ops] def canonicalizeSpec(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    // Anchored regex, not split_part('://'): an embedded '://' deeper in
    // the URL (a redirect target in a query param) must not truncate the
    // remainder. Likewise query extraction takes everything after the
    // FIRST '?' — a second '?' is part of the query, not a delimiter.
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://", "")
    // host ends at the first '/' OR '?' — `https://h:443?id=1` is legal
    // (query with no path) and the port must still strip
    val hostPort = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = rest.substr(length(hostPort) + lit(1), length(rest))
    val path = split_part(pathq, lit("?"), lit(1))
    // instr, not Column.contains: name-routed helpers (Spark 4 routes
    // Column.contains through the function registry) resolve to the
    // Trino dialect's array `contains` once TrinoFunctions.register has
    // run in the session — e.g. after the meta queries in a Verify
    // sweep. instr is not an overridden name.
    val query = when(instr(pathq, "?") >= 1,
      pathq.substr(length(path) + lit(2), length(pathq))).otherwise(lit(""))

    val hostNoWww = regexp_replace(lower(hostPort), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .otherwise(hostNoWww)

    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern))
    val cleanQuery = array_join(kept, "&")
    val cleanPath = regexp_replace(path, "/+$", "")

    when(noFrag.rlike("^[^:/?#]+://"),
      concat(scheme, lit("://"), host, cleanPath,
        when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery))))
      .otherwise(noFrag)
  }

  /** Dedup by canonical URL: one row per canonical url with the keeper
    * (minimum id — stable across runs and engines) and the duplicate
    * count. One shuffle; partial aggregation upstream. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
