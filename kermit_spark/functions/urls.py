"""URL canonicalization — vectorized pandas UDFs + JVM-side helpers.

Re-expresses the reference's URI toolkit (parity targets, for review):
  - clean:        /root/reference/src/kermit/util/tools.coffee:29-41 (uri.clean)
  - cleanAll:     tools.coffee:43-48
  - normalize:    tools.coffee:50
  - toLocalPath:  tools.coffee:54-66
  - entity map:   tools.coffee:11-16 (NOTE: the reference maps '&lt;' to '>' —
    an apparent typo; we reproduce it faithfully so golden outputs match)
Golden cases ported from /root/reference/src/kermit/util/tools.spec.coffee:5-43.

Row-level logic lives inside Arrow-batched pandas UDFs (per input_hint: no
per-row Python *UDFs*; string work inside a pandas batch is the sanctioned
slow path). Hashing and host extraction stay JVM-side (xxhash64,
regexp_extract) so the hot frontier path never leaves codegen.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from ..udf import session_safe_pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# JVM-side (codegen) helpers — the hot path at 10^10-frontier scale
# ---------------------------------------------------------------------------


def url_hash(url: Column | str) -> Column:
    """64-bit hash of the canonical URL (frontier key; tools.coffee:96-100's
    randomId replaced by a deterministic hash — SURVEY §7 determinism note)."""
    return F.xxhash64(F.col(url) if isinstance(url, str) else url)


def host_of(url: Column | str) -> Column:
    """Lower-cased authority (host incl. any explicit port, no userinfo),
    JVM-side regex. The port stays: politeness budgets and robots state are
    per-authority — two services on one host are distinct crawl targets."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/?#]+)", 1)
    return F.lower(host)


def host_salt(url_or_host: Column, num_buckets: int) -> Column:
    """Partition key: hash(host) % P (north_rule explicit host-hash salting)."""
    return F.pmod(F.xxhash64(url_or_host), F.lit(num_buckets)).cast("int")


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 (registrable domain) of a host — pure JVM, no UDF.

    Production crawlers budget politeness per registrable DOMAIN as well as
    per host: a site split over thousands of subdomains (shard hosts, user
    subdomains) is still one server farm, and per-host budgets alone would
    multiply its load by the subdomain count. Rules:

      * IPv4 literals and single-label hosts (localhost) are their own
        domain;
      * a host whose last two labels form a listed multi-label public
        suffix (``_SECOND_LEVEL_TLDS`` — shared with toLocalPath's urijs
        -parity domain split) keeps THREE labels (shop.example.co.uk →
        example.co.uk);
      * otherwise two labels (www.example.com → example.com).

    A port suffix (host:8080) is preserved — two services on one host are
    distinct crawl targets (same rule as host_of)."""
    c = F.col(host) if isinstance(host, str) else host
    c = F.lower(c)
    bare = F.regexp_replace(c, r":\d+$", "")
    port = F.regexp_extract(c, r"(:\d+)$", 1)
    parts = F.split(bare, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3))
    is_ip = bare.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    dom = (
        F.when(is_ip | (n <= 2), bare)
        .when(last2.isin(*sorted(_SECOND_LEVEL_TLDS)), last3)
        .otherwise(last2)
    )
    return F.concat(dom, port)


def content_type_fallback(url: Column, content_type: Column) -> Column:
    """Sanitize a missing/generic content-type by URL extension — the
    reference's per-response mime fallback (core.streaming.coffee:59 +
    util/mimetypes.coffee:5) as a JVM expression: a literal ext→mime map
    ships with the plan (broadcast-free) and a regexp pulls the extension.
    Unknown extensions keep the original value or default to octet-stream."""
    ext = F.lower(F.regexp_extract(url, r"\.([A-Za-z0-9]{1,10})(?:[?#]|$)", 1))
    mapping = F.create_map(*[F.lit(x) for kv in sorted(EXT_MIME.items()) for x in kv])
    generic = (
        content_type.isNull()
        | (content_type == "")
        | (content_type == "application/octet-stream")
    )
    return F.when(
        generic,
        F.coalesce(mapping.getItem(ext), content_type, F.lit("application/octet-stream")),
    ).otherwise(content_type)


# ---------------------------------------------------------------------------
# Pure-pandas implementations (also used by pytest oracles directly)
# ---------------------------------------------------------------------------

# Reference entity table tools.coffee:11-16 ('&lt;' -> '>' quirk preserved).
_ENTITIES = {"&amp;": "&", "&gt;": ">", "&lt;": ">"}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES), re.IGNORECASE)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# bytes illegal RAW in an RFC 3986 query (space/control, angle brackets,
# quotes, braces, backslash, caret, backtick, non-ASCII) — everything else,
# including existing %-escapes and reserved sub-delims, passes through
# untouched (see _normalize_one's query handling)
_QUERY_ILLEGAL_RE = re.compile(r'[ <>"{}|\\^`\x00-\x1f\x7f]|[^\x00-\x7f]')

# Second-level public suffixes so domain/tld splitting matches urijs on the
# golden cases (example.co.uk -> tld 'co.uk').
# Multi-label public suffixes — a curated high-traffic subset of the public
# suffix list (the same family urijs' SecondLevelDomains covers; the full
# PSL adds ~9k rules incl. wildcard/exception entries a production build
# would vendor). Shared by _split_domain (toLocalPath parity) and
# registrable_domain (eTLD+1 politeness grouping); hosts whose suffix is
# not listed fall back to last-two-labels.
_SECOND_LEVEL_TLDS = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp", "gr.jp", "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "gob.mx", "net.mx", "edu.mx",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "co.za", "org.za", "net.za", "web.za", "gov.za", "ac.za",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "web.tr",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "maori.nz",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "gob.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.gh", "org.gh", "edu.gh", "gov.gh",
    "co.tz", "or.tz", "ne.tz", "ac.tz", "go.tz", "sc.tz",
    "com.et", "org.et", "edu.et", "gov.et",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.np", "org.np", "edu.np", "gov.np", "net.np",
    "com.lk", "org.lk", "edu.lk", "gov.lk", "net.lk",
}

# Extension -> mime type. Base table: the reference's full 1223-entry public
# registry (util/mimetypes.coffee:5, generated into mimetypes.py by
# scripts/gen_mimetypes.py). The curated entries below OVERRIDE it where the
# 2015 registry is stale (text/javascript, image/x-icon era types) and add
# post-2015 extensions (woff2, webp, mjs, toml...). Used by
# content_type_fallback (the reference sanitizes missing content-types by
# extension, extensions/core.streaming.coffee:59) and, via _KNOWN_EXTS
# membership, by toLocalPath's index.html rule.
_CURATED_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "css": "text/css", "js": "text/javascript", "mjs": "text/javascript",
    "json": "application/json", "xml": "application/xml",
    "rss": "application/rss+xml", "atom": "application/atom+xml",
    "txt": "text/plain", "md": "text/markdown", "csv": "text/csv",
    "tsv": "text/tab-separated-values", "pdf": "application/pdf",
    "ps": "application/postscript", "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "svg": "image/svg+xml", "ico": "image/vnd.microsoft.icon",
    "webp": "image/webp", "bmp": "image/bmp", "tif": "image/tiff", "tiff": "image/tiff",
    "mp3": "audio/mpeg", "ogg": "audio/ogg", "wav": "audio/wav", "flac": "audio/flac",
    "mp4": "video/mp4", "webm": "video/webm", "avi": "video/x-msvideo",
    "mov": "video/quicktime", "mkv": "video/x-matroska",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf", "eot": "application/vnd.ms-fontobject",
    "zip": "application/zip", "gz": "application/gzip", "tar": "application/x-tar",
    "bz2": "application/x-bzip2", "7z": "application/x-7z-compressed",
    "rar": "application/vnd.rar", "php": "text/html", "asp": "text/html",
    "aspx": "text/html", "jsp": "text/html", "cgi": "text/html",
    "pl": "text/html", "py": "text/x-python", "rb": "text/x-ruby",
    "sh": "application/x-sh", "swf": "application/x-shockwave-flash",
    "wasm": "application/wasm", "map": "application/json",
    "yaml": "application/yaml", "yml": "application/yaml",
    "ini": "text/plain", "toml": "application/toml",
}

from .mimetypes import REFERENCE_EXT_MIME  # noqa: E402  (data module)

EXT_MIME = {**REFERENCE_EXT_MIME, **_CURATED_EXT_MIME}

# Known file extensions — membership decides index.html appending.
_KNOWN_EXTS = frozenset(EXT_MIME)


def _replace_entities(url: str) -> str:
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0).lower()], url)


def _idna_host(host: str) -> str:
    """Unicode host → ASCII punycode (IDNA), per urijs' punycode.toASCII on
    normalize (the reference cleans URLs with urijs, tools.coffee:17-27).
    Already-ASCII hosts pass through untouched; hosts the codec rejects
    (empty labels, oversize labels) are kept as-is rather than dropped —
    the fetch layer will surface the real error."""
    if host.isascii():
        return host
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return host


def _normalize_one(url: str) -> str:
    """RFC 3986-style normalization (urijs URI().normalize() analog):
    lowercase scheme+host, IDN host → punycode, drop default port, resolve
    dot-segments, collapse empty path to '/' when authority present."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    if netloc:
        host = _idna_host(parts.hostname or "")
        port = None
        try:
            port = parts.port
        except ValueError:
            pass
        userinfo = ""
        if "@" in netloc:
            userinfo = netloc.rsplit("@", 1)[0] + "@"
        netloc = userinfo + host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc += f":{port}"
    path = parts.path
    if path:
        # resolve ./ and ../ segments, keep trailing slash semantics
        trailing = path.endswith("/") and path != "/"
        norm = posixpath.normpath(path)
        if norm == ".":
            norm = ""
        if trailing and not norm.endswith("/"):
            norm += "/"
        path = norm
    if netloc and not path:
        path = "/"
    # re-encode spaces etc. consistently but keep readable chars
    path = quote(unquote(path), safe="/:@!$&'()*+,;=~%-._[]")
    # query: percent-encode ONLY raw RFC 3986-illegal bytes a tokenizer
    # legitimately hands us — '>' in <a href="x?a>b">, spaces, quotes —
    # so they survive strict URL parsers (JVM parse_url in the robots
    # gate, real fetch stacks). Existing %-escapes are PRESERVED, never
    # decoded: an unquote/quote round trip with reserved chars in the
    # safe set would conflate ?q=a%26b (literal '&' in a value) with
    # ?q=a&b (two parameters) — distinct URLs collapsing to one frontier
    # row and a semantically different fetch. urijs (the parity target)
    # likewise keeps reserved-character escaping intact.
    query = parts.query
    if query:
        query = _QUERY_ILLEGAL_RE.sub(lambda m: quote(m.group(), safe=""), query)
    return urlunsplit((scheme, netloc, path, query, parts.fragment))


def _clean_one(base: str, url: str | None) -> str | None:
    """Port of uri.clean (tools.coffee:29-41): drop anchors/self/mailto/
    javascript, expand scheme-relative //, decode entities, normalize,
    absolutize relative refs against base."""
    if url is None:
        return None
    url = str(url)
    if url == "" or url.startswith("#") or url == "/" or url.startswith("mailto") or url.startswith("javascript"):
        return None
    base_scheme = urlsplit(base).scheme or "http"
    if url.startswith("//"):
        url = f"{base_scheme}://" + url[2:]
    url = _replace_entities(url)
    url = _normalize_one(url)
    parts = urlsplit(url)
    if url.startswith("/") or not parts.netloc:
        # relative (leading slash or no authority) -> absolutize against base
        url = urljoin(base, url)
        url = _normalize_one(url)
    return url


def _split_domain(host: str) -> tuple[str, str, str]:
    """Return (subdomain, domain_without_tld, tld) like urijs on golden cases."""
    labels = host.split(".")
    if len(labels) < 2:
        return "", host, ""
    two = ".".join(labels[-2:])
    if two in _SECOND_LEVEL_TLDS and len(labels) >= 3:
        tld = two
        sld = labels[-3]
        sub = ".".join(labels[:-3])
    else:
        tld = labels[-1]
        sld = labels[-2]
        sub = ".".join(labels[:-2])
    return sub, sld, tld


def _to_local_path_one(root: str, url: str) -> str:
    """Port of uri.toLocalPath (tools.coffee:54-66) incl. its quirks:
    first-'www'-substring strip, [query] infix before the last dot,
    index.html for unknown suffixes, readable (percent-decoded) output."""
    url = url.replace("www", "", 1)
    url = _replace_entities(url)
    parts = urlsplit(url)
    host = (parts.hostname or "").strip(".")
    path = posixpath.normpath(parts.path) if parts.path else "/"
    if path == ".":
        path = "/"
    sub, sld, tld = _split_domain(host)
    query = f"[{parts.query}]" if parts.query else ""
    segs = [s for s in path.split("/") if s]
    last = segs[-1] if segs else ""
    suffix = last.rsplit(".", 1)[1].lower() if "." in last[1:] else ""
    if not suffix or suffix not in _KNOWN_EXTS:
        segs.append("index.html")
    path = "/" + "/".join(segs)
    last_dot = path.rfind(".")
    if last_dot == -1:
        augmented = path + query
    else:
        augmented = path[:last_dot] + query + path[last_dot:]
    subpart = f"/{sub}" if sub else ""
    full = f"{root}/{tld}/{sld}{subpart}{augmented}"
    return unquote(full)


# ---------------------------------------------------------------------------
# Series-level (vectorized) wrappers
# ---------------------------------------------------------------------------


def clean_url_series(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series(
        [_clean_one(b, h) for b, h in zip(base, href)], dtype="object"
    )


def normalize_url_series(url: pd.Series) -> pd.Series:
    return url.map(lambda u: _normalize_one(u) if u is not None else None)


def to_local_path_series(root: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [_to_local_path_one(r, u) for r, u in zip(root, url)], dtype="object"
    )


# ---------------------------------------------------------------------------
# Spark pandas UDFs (Arrow-batched)
# ---------------------------------------------------------------------------

# session-safe: module-level UDFs outlive any one SparkContext; the plain
# pandas_udf JVM cache goes stale across context restarts (see udf.py)
clean_urls = session_safe_pandas_udf(clean_url_series, StringType())
normalize_urls = session_safe_pandas_udf(normalize_url_series, StringType())
to_local_path = session_safe_pandas_udf(to_local_path_series, StringType())
