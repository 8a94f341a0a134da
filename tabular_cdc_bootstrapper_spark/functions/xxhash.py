"""Spark-parity xxHash64 in Python — executor-side bucket assignment.

``VersionedBucketMirror`` partitions by ``pmod(xxhash64(key), n_buckets)``
(Spark's ``F.xxhash64``, seed 42). The streaming SINK data source writes
on executor Python workers where no SparkSession exists, so bucket
assignment must reproduce the JVM hash bit-for-bit — otherwise a sink row
lands in the wrong bucket dir and the read-side fold never merges it with
its base row. This module implements XXH64 (the public xxHash spec, the
same algorithm Spark's ``XxHash64`` expression uses) for the two key
shapes the mirror supports:

- **int64 keys**: fully vectorized NumPy (the 8-byte single-round tail of
  the spec) — O(batch) with no Python loop;
- **string keys**: the complete XXH64 over UTF-8 bytes (32-byte stripes +
  8/4/1-byte tails), scalar per row.

Parity is pinned by tests/test_sink_datasource.py against ``F.xxhash64``
for negative/extreme longs and empty/unicode/long strings.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

_NP_P1 = np.uint64(_P1)
_NP_P2 = np.uint64(_P2)
_NP_P3 = np.uint64(_P3)
_NP_P4 = np.uint64(_P4)
_NP_P5 = np.uint64(_P5)


def _rotl_np(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxhash64_longs(values, seed: int = 42) -> np.ndarray:
    """Vectorized ``F.xxhash64(long_col)`` (seed 42): returns int64."""
    with np.errstate(over="ignore"):
        v = np.asarray(values, dtype=np.int64).view(np.uint64)
        h = np.full(
            v.shape, np.uint64(seed) + _NP_P5 + np.uint64(8), dtype=np.uint64
        )
        h ^= _rotl_np(v * _NP_P2, 31) * _NP_P1
        h = _rotl_np(h, 27) * _NP_P1 + _NP_P4
        h ^= h >> np.uint64(33)
        h *= _NP_P2
        h ^= h >> np.uint64(29)
        h *= _NP_P3
        h ^= h >> np.uint64(32)
        return h.view(np.int64)


def xxhash64_ints(values, seed: int = 42) -> np.ndarray:
    """Vectorized ``F.xxhash64(int_col)`` for 32-bit ints (seed 42):
    Spark hashes IntegerType through the 4-BYTE tail path, which is NOT
    the long path — an int32 key must use this, never a promotion to
    int64."""
    with np.errstate(over="ignore"):
        v = np.asarray(values, dtype=np.int32).view(np.uint32).astype(np.uint64)
        h = np.full(
            v.shape, np.uint64(seed) + _NP_P5 + np.uint64(4), dtype=np.uint64
        )
        h ^= v * _NP_P1
        h = _rotl_np(h, 23) * _NP_P2 + _NP_P3
        h ^= h >> np.uint64(33)
        h *= _NP_P2
        h ^= h >> np.uint64(29)
        h *= _NP_P3
        h ^= h >> np.uint64(32)
        return h.view(np.int64)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Scalar XXH64 over ``data`` — ``F.xxhash64(string_col)`` hashes the
    UTF-8 bytes with exactly this algorithm. Returns a SIGNED int64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h if h < (1 << 63) else h - (1 << 64)


def spark_buckets(series, n_buckets: int, key_type: str = None) -> np.ndarray:
    """``pmod(xxhash64(key), n_buckets)`` for a pandas Series — bit-
    identical to ``VersionedBucketMirror._bucket``. ``key_type`` is the
    SPARK-side type name (``"long"``, ``"integer"``, ``"string"``) and
    decides the hash path: Spark hashes IntegerType through the 4-byte
    spec tail, LongType through the 8-byte one — promoting an int32 to
    the long path would silently disagree with the JVM partitioning.
    Any other key type is refused rather than approximated (a float or
    date key would need Spark's exact binary encoding; CDC keys are
    ints or strings)."""
    import pandas as pd

    if key_type is None:  # infer from the pandas dtype (legacy callers)
        key_type = (
            "long" if pd.api.types.is_integer_dtype(series) else "string"
        )
    if key_type in ("long", "bigint"):
        h = xxhash64_longs(series.to_numpy(dtype=np.int64))
    elif key_type in ("integer", "int"):
        h = xxhash64_ints(series.to_numpy(dtype=np.int32))
    elif key_type == "string":
        if pd.api.types.is_numeric_dtype(series):
            raise ValueError(
                "spark_buckets: key_type='string' but the series is "
                f"numeric ({series.dtype}) — str(v) would not match the "
                "JVM's UTF-8 hash of the actual string key"
            )
        h = np.fromiter(
            (xxhash64_bytes(str(v).encode("utf-8")) for v in series),
            dtype=np.int64,
            count=len(series),
        )
    else:
        raise ValueError(
            f"spark_buckets: unsupported key type {key_type!r} — only "
            "long/integer/string keys hash identically to F.xxhash64 "
            "here"
        )
    return ((h % n_buckets) + n_buckets) % n_buckets
