package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step between hyperlink extraction
  * ([[HtmlExtract.links]]) and the crawl frontier
  * ([[graft.ops.Frontier]]): raw hrefs are messy (mixed case, default
  * ports, fragments, tracking params, relative forms) and a frontier
  * keyed on raw strings both re-fetches duplicates and splits one
  * host's politeness budget across its spellings.
  *
  * Entirely MAP-ONLY `Column` algebra in the shared Java-regex/RE2
  * subset (explicit classes, no lookaround, anchored extracts — the
  * [[HtmlExtract]] dialect contract), so a DuckDB oracle replays every
  * rule bit-for-bit and the stage fuses into the extraction scan's
  * codegen at 100 TB.
  *
  * Canonical form, applied in order (each deterministic given the
  * previous):
  *  1. trim surrounding whitespace; drop the fragment (`#…` — never
  *     sent on the wire);
  *  2. resolve the reference form: absolute (`scheme://…`) kept;
  *     protocol-relative (`//host/…`) gets `baseScheme`;
  *     root-relative (`/…`) gets `baseScheme://baseHost`; anything
  *     else (path-relative, `mailto:`, `javascript:`, empty) → NULL —
  *     a crawl frontier wants absolute fetchable URLs (path-relative
  *     resolution needs the REFERRING page's full path, which a
  *     link-level frame does not carry; filter upstream if needed);
  *  3. scheme and host lowercase (RFC 3986 §6.2.2.1); the explicit
  *     default port drops (`:80` for http, `:443` for https), other
  *     ports stay;
  *  4. empty path becomes `/` (RFC 3986 §6.2.3);
  *  5. tracking params (`utm_*`, `fbclid`, `gclid`, `msclkid`) drop
  *     from the query string, remaining params KEEP their order
  *     (reordering would be a semantics change for servers that care);
  *     an emptied query drops its `?`.
  */
object UrlNormalize {

  /** Tracking-param pattern (anchored at param start, `=`-terminated
    * or bare). */
  private val TrackRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)(=.*)?$"

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonicalize one URL column against a base host (the page's own
    * host, for root-/protocol-relative references). NULL for
    * non-resolvable reference forms — see scaladoc rule 2. */
  def canonicalUrl(url: Column, baseHost: Column,
      baseScheme: String = "https"): Column = {
    require(baseScheme == "http" || baseScheme == "https",
      s"canonicalUrl: baseScheme http|https ($baseScheme)")
    val t = regexp_replace(trim(url), "#.*$", "")
    // reference-form resolution to an absolute candidate
    val absolute = when(t.rlike(SchemeRe), t)
      .when(t.rlike("^//[^/]"), concat(lit(baseScheme + ":"), t))
      .when(t.rlike("^/") && !t.rlike("^//"),
        concat(lit(baseScheme + "://"), baseHost, t))
    val scheme = lower(regexp_extract(absolute, SchemeRe, 1))
    val hostPort = regexp_extract(absolute, SchemeRe + "([^/?#]*)", 2)
    val rest = regexp_replace(absolute, SchemeRe + "[^/?#]*", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]*$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val authority = when(keepPort, concat(host, lit(":"), port))
      .otherwise(host)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val canonPath = when(path === "", "/").otherwise(path)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p rlike TrackRe) && p =!= "")
    val canonQuery = when(query === "" || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(absolute.isNotNull && host =!= "",
      concat(scheme, lit("://"), authority, canonPath, canonQuery))
  }

  /** The registrable-host key a frontier/politeness layer partitions
    * on, from an already-canonical URL (lowercased by construction). */
  def hostOf(canonical: Column): Column =
    nullif(regexp_extract(canonical, SchemeRe + "([^/?#:]*)", 2),
      lit(""))

  /** REGISTERED (registrable) domain of a lowercase host under a
    * caller-supplied public-suffix list — the key domain-level
    * governance groups on (per-domain contribution caps, domain
    * share audits, politeness above host granularity): `co.uk` rules
    * make `news.bbc.co.uk` and `www.bbc.co.uk` the same publisher
    * `bbc.co.uk`, where a naive last-two-labels cut yields the
    * meaningless `co.uk`.
    *
    * Mozilla PSL matching semantics on explicit rules: the LONGEST
    * listed suffix wins; a host not matching any listed rule falls to
    * the prevailing `*` rule (its last label is the suffix); a host
    * that IS a suffix, or a single label, has no registered domain
    * (NULL). Wildcard (`*.ck`) and exception (`!www.ck`) rules are out
    * of scope — the list is caller-supplied explicit rules, the same
    * frozen-broadcast contract as the stopword/wordlist gates (the
    * full ~9k-rule PSL rides fine as a literal array; it is bounded
    * state like the BPE merge table).
    *
    * Map-only Column algebra — label split, longest-first literal set
    * membership (CaseWhen evaluates lazily, so out-of-range slices
    * are never touched), one dynamic slice — replayable in any engine
    * with list slicing. */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "registeredDomain: empty suffix list")
    require(suffixes.forall(s =>
      s.nonEmpty && !s.startsWith(".") && !s.endsWith(".") &&
        s == s.toLowerCase && !s.contains("*") && !s.contains("!")),
      "registeredDomain: suffixes are explicit lowercase dotted " +
        s"labels (no wildcard/exception rules): $suffixes")
    val byDepth = suffixes.distinct.groupBy(_.count(_ == '.') + 1)
    val maxD = byDepth.keys.max
    require(maxD <= 4, s"registeredDomain: suffix depth <= 4 ($maxD)")
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Column): Column =
      array_join(slice(labels, -k, k), ".")
    // longest listed rule first; depth-1 listed rules are subsumed by
    // the prevailing `*` fallback (same depth, same cut)
    val depth = coalesce(
      ((maxD to 2 by -1).flatMap { d =>
        byDepth.get(d).map(sfx =>
          when(n >= d && lastK(lit(d)).isin(sfx: _*), lit(d)))
      } :+ lit(1)): _*)
    when(host.isNotNull && trim(host) =!= "" && n >= depth + 1,
      lastK(depth + 1))
  }
}
