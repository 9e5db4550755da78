"""Arrow-batched codec scalars for the KQL surface's string-codec
tail (round-12 function census, tools/adx_coverage.py): punycode
(RFC 3492 — Python's stdlib codec, byte-exact vs the RFC and the ADX
doc examples), zlib/gzip base64 transcoding (decompress is exact on
any standard stream incl. ADX-produced ones; compress is
format-standard but the deflate BYTES are compressor-specific — a
documented refinement, roundtrip-exact), and
ipv4_range_to_cidr_list (stdlib ipaddress minimal CIDR cover —
exact, deterministic).

These are the engine's ONLY Python scalars on the KQL path, and they
exist because no JVM-side builtin expresses them: each is a
`pandas_udf` (Arrow batch in, vectorized loop over Python stdlib
codecs, Arrow batch out) — the "UDFs are the slow path; when you
must, Arrow-batched" rule. Registered lazily once per SparkSession
(`ensure_registered`); the translator requires an active session and
stays loud without one. Reference parity: the reference delegates
these scalars to ADX (src/main.go:88-116); invalid input yields the
EMPTY string (the format_ipv4/tostring never-null family contract).
"""

from __future__ import annotations

import base64
import gzip
import ipaddress
import zlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

# Session-scoped registration marker. A runtime-conf key lives and
# dies WITH the session object, so a fresh session always
# re-registers — unlike id(spark), which CPython can recycle after a
# stopped session is garbage-collected (a new session at a dead
# session's address would silently skip registration and every codec
# call would fail with UNRESOLVED_ROUTINE).
_MARKER_CONF = "spark.api_to_parquet_spark.codecs.registered"


def _punycode_enc(s: str) -> str:
    try:
        return s.encode("punycode").decode("ascii")
    except Exception:  # noqa: BLE001 — '' is the invalid-input contract
        return ""


def _punycode_dec(s: str) -> str:
    try:
        return s.encode("ascii").decode("punycode")
    except Exception:  # noqa: BLE001
        return ""


def _domain_label_enc(label: str) -> str:
    if not label or label.isascii():
        return label
    return "xn--" + label.encode("punycode").decode("ascii")


def _domain_label_dec(label: str) -> str:
    if label.startswith("xn--"):
        return label[4:].encode("ascii").decode("punycode")
    return label


def _punycode_domain_enc(s: str) -> str:
    try:
        return ".".join(_domain_label_enc(p) for p in s.split("."))
    except Exception:  # noqa: BLE001
        return ""


def _punycode_domain_dec(s: str) -> str:
    try:
        return ".".join(_domain_label_dec(p) for p in s.split("."))
    except Exception:  # noqa: BLE001
        return ""


def _zlib_b64(s: str) -> str:
    # zlib container (RFC 1950); bytes are THIS compressor's — any
    # standard inflater (incl. ADX's) reads them, roundtrip exact
    return base64.b64encode(zlib.compress(s.encode("utf-8"))).decode()


def _unzlib_b64(s: str) -> str:
    try:
        return zlib.decompress(base64.b64decode(s)).decode("utf-8")
    except Exception:  # noqa: BLE001
        return ""


def _gzip_b64(s: str) -> str:
    # mtime=0: the gzip header embeds a timestamp — zeroing it keeps
    # the output DETERMINISTIC (oracle-hashable) per RFC 1952
    return base64.b64encode(
        gzip.compress(s.encode("utf-8"), mtime=0)
    ).decode()


def _ungzip_b64(s: str) -> str:
    try:
        return gzip.decompress(base64.b64decode(s)).decode("utf-8")
    except Exception:  # noqa: BLE001
        return ""


def _cidr_list(start: str, end: str) -> list[str] | None:
    try:
        lo = ipaddress.IPv4Address(start.split("/")[0])
        hi = ipaddress.IPv4Address(end.split("/")[0])
        return [
            str(n)
            for n in ipaddress.summarize_address_range(lo, hi)
        ]
    except Exception:  # noqa: BLE001 — ADX: null on invalid range
        return None


def _str_udf(fn):
    @pandas_udf("string")
    def _u(col: pd.Series) -> pd.Series:
        return col.map(lambda v: "" if v is None else fn(v))

    return _u


def ensure_registered(spark: SparkSession) -> None:
    """Register the codec UDFs on this session (idempotent)."""
    if spark.conf.get(_MARKER_CONF, None) == "1":
        return

    spark.udf.register("kql_py_punycode_enc", _str_udf(_punycode_enc))
    spark.udf.register("kql_py_punycode_dec", _str_udf(_punycode_dec))
    spark.udf.register(
        "kql_py_punycode_domain_enc", _str_udf(_punycode_domain_enc)
    )
    spark.udf.register(
        "kql_py_punycode_domain_dec", _str_udf(_punycode_domain_dec)
    )
    spark.udf.register("kql_py_zlib_b64", _str_udf(_zlib_b64))
    spark.udf.register("kql_py_unzlib_b64", _str_udf(_unzlib_b64))
    spark.udf.register("kql_py_gzip_b64", _str_udf(_gzip_b64))
    spark.udf.register("kql_py_ungzip_b64", _str_udf(_ungzip_b64))

    @pandas_udf("array<string>")
    def _cidr(start: pd.Series, end: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if a is None or b is None
                else _cidr_list(a, b)
                for a, b in zip(start, end)
            ]
        )

    spark.udf.register("kql_py_cidr_list", _cidr)
    spark.conf.set(_MARKER_CONF, "1")


# (KQL function name, registered SQL name) for the 1-arg codecs
CODEC_FNS: list[tuple[str, str]] = [
    ("punycode_from_string", "kql_py_punycode_enc"),
    ("punycode_to_string", "kql_py_punycode_dec"),
    ("punycode_domain_from_string", "kql_py_punycode_domain_enc"),
    ("punycode_domain_to_string", "kql_py_punycode_domain_dec"),
    ("zlib_compress_to_base64_string", "kql_py_zlib_b64"),
    ("zlib_decompress_from_base64_string", "kql_py_unzlib_b64"),
    ("gzip_compress_to_base64_string", "kql_py_gzip_b64"),
    ("gzip_decompress_from_base64_string", "kql_py_ungzip_b64"),
]
