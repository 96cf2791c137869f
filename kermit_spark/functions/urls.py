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

# Second-level public suffixes so domain/tld splitting matches urijs on the
# golden cases (example.co.uk -> tld 'co.uk').
_SECOND_LEVEL_TLDS = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "co.nz", "com.br", "com.cn", "com.mx", "co.in", "co.kr",
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


def _normalize_one(url: str) -> str:
    """RFC 3986-style normalization (urijs URI().normalize() analog):
    lowercase scheme+host, drop default port, resolve dot-segments,
    collapse empty path to '/' when authority present."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    if netloc:
        host = parts.hostname or ""
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
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


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
