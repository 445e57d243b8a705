"""Charset sniffing + decoding for the ``html:binary`` -> ``text`` path.

Real Common-Crawl-style corpora are only ~70-75% UTF-8; the rest declare
(or silently use) windows-1252, Shift_JIS, GB*, UTF-16 and friends. The
pipeline's pinned extractor (`sources/webpages.py:extract_text_reference`)
decodes strict-UTF-8-with-replace, which mojibakes every such page before
dedup/quality ever see it. This module adds the WHATWG-style sniff step in
front: BOM check, a bounded 1024-byte ``<meta>`` prescan, then a strict
UTF-8 trial with a windows-1252 fallback (the HTML5 default for the
``en``-family locales, and the superset-of-latin-1 browsers actually use).

Spec sources (public): WHATWG HTML "determining the character encoding"
(prescan algorithm + 1024-byte cap) and WHATWG Encoding (label table).
LogAI itself reads files with a fixed ``encoding=`` kwarg
(reference `logai/dataloader/data_loader.py` open(...) path) and has no
sniffer, so the reference contract here is the public spec, not the repo.

Scale design: the sniff is a pure per-row function over a binary column —
expressed as ONE Arrow ``pandas_udf`` projection (no shuffle, no state).
The regex prescan bounds work at 1 KiB/row regardless of page size, so a
100 TB scan is O(bytes) with a tiny constant; the UTF-8 trial only runs
when no BOM/meta hit (common case: valid UTF-8 accepts in one vectorized
C pass inside CPython's codec).
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "sniff_charset",
    "decode_html",
    "charset_decode",
    "CHARSET_LABELS",
]

# WHATWG Encoding label -> Python codec, restricted to labels seen at web
# scale. Keys are the spec's normalized (lowercase, trimmed) labels.
CHARSET_LABELS: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "iso-8859-1": "cp1252",  # WHATWG maps latin-1 labels to windows-1252
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "iso-8859-2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gb18030",  # gb18030 is the WHATWG decoder for the GBK family
    "gb2312": "gb18030",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "euc-kr",
    "windows-949": "euc-kr",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "tis-620": "cp874",
    "windows-874": "cp874",
    # utf-16 labels: WHATWG decodes the *content* as utf-8 when a meta says
    # utf-16 (a meta can't be read under utf-16 anyway); BOM handles real
    # utf-16 below, so a bare label falls back to utf-8
    "utf-16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
}

# <meta charset="X"> | <meta ... content="text/html; charset=X"> within the
# first 1024 bytes, matched over the raw byte string (spec prescan works on
# bytes; all target labels are ASCII). DOTALL so attributes split across
# newlines still hit; non-greedy so the first meta wins, as in the spec walk.
_META_CHARSET = re.compile(
    rb"""(?is)<meta[^>]{0,200}?charset\s*=\s*["']?\s*([a-z0-9._:-]{1,40})"""
)
_PRESCAN_BYTES = 1024


def _norm_label(label: str) -> str | None:
    codec = CHARSET_LABELS.get(label.strip().lower())
    if codec is None:
        return None
    try:
        codecs.lookup(codec)
    except LookupError:  # pragma: no cover - table only names stdlib codecs
        return None
    return codec


def sniff_charset(raw: bytes | None) -> str:
    """Return the Python codec name for one page's raw bytes.

    Order (WHATWG "determining the character encoding"): BOM -> meta
    prescan (first 1024 bytes) -> strict UTF-8 trial -> windows-1252.
    Always returns a decodable codec; never raises.
    """
    if not raw:
        return "utf-8"
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if raw.startswith(b"\xfe\xff"):
        return "utf-16-be"
    m = _META_CHARSET.search(raw[:_PRESCAN_BYTES])
    if m:
        codec = _norm_label(m.group(1).decode("ascii", "replace"))
        if codec:
            return codec
    try:
        raw.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_html(raw: bytes | None, codec: str | None = None) -> str:
    """Decode one page with its sniffed (or given) codec, replace-safe."""
    if raw is None:
        return ""
    c = codec or sniff_charset(raw)
    if c in ("utf-16-le", "utf-16-be") and raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        raw = raw[2:]  # the BOM is a marker, not content (utf-8-sig strips
        # its own; the -le/-be codecs would decode it as U+FEFF)
    try:
        return raw.decode(c, "replace")
    except LookupError:  # pragma: no cover - sniff returns valid codecs
        return raw.decode("utf-8", "replace")


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("charset", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _decode_udf():
    @F.pandas_udf(_DECODE_SCHEMA)
    def _decode(html: pd.Series) -> pd.DataFrame:
        charsets = html.map(sniff_charset)
        texts = [decode_html(b, c) for b, c in zip(html, charsets)]
        return pd.DataFrame({"charset": charsets, "text": texts})

    return _decode


def charset_decode(
    df: DataFrame,
    html_col: str = "html",
    charset_col: str = "charset",
    text_col: str = "decoded_text",
) -> DataFrame:
    """Add (charset, decoded text) next to a binary HTML column.

    One Arrow-batched projection (a single pandas_udf returning a struct —
    the sniff and the decode share the batch, so the bytes cross the
    Arrow boundary once). Zero shuffle; composes in front of
    `curation.html_extract` / the pipeline's extract step, replacing a
    blind ``decode('utf-8', 'replace')`` with the sniffed codec. Output
    text is byte-identical to the reference extractor's input for valid
    UTF-8 pages (the strict trial accepts them before any fallback).
    """
    packed = _decode_udf()(F.col(html_col))
    return df.withColumn("_dec", packed).select(
        "*",
        F.col("_dec.charset").alias(charset_col),
        F.col("_dec.text").alias(text_col),
    ).drop("_dec")
