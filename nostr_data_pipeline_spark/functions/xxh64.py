"""Driver-side replica of Spark's ``xxhash64`` expression for BUCKET
ROUTING: lets point-read probes (``SnapshotTable.buckets_for_keys`` /
``buckets_for_values``) compute bucket ids for a handful of keys without
launching a Spark job at all — at 100 TB a point lookup should cost one
pruned file read, not a cluster round-trip to learn which file.

Implements the public xxHash64 algorithm (spec:
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) plus Spark's
per-type dispatch (XxHash64 expression semantics, all public Spark source):
arguments hash in sequence, each result seeding the next (seed starts 42);
byte/short/int hash as 4-byte blocks, long/timestamp as 8-byte, boolean as
int 0/1, strings as UTF-8 bytes; a NULL argument leaves the running hash
unchanged. Exactness vs the JVM is asserted by
tests/test_table_extras.py::test_driver_bucket_routing_matches_jvm
(randomized, every supported type) — a divergence here would silently
route point reads to the wrong bucket, so the test is the contract.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

# Spark type name -> fixed-width int hasher selector
_INT_TYPES = {"integer", "short", "byte"}
_LONG_TYPES = {"long"}
SUPPORTED_TYPES = _INT_TYPES | _LONG_TYPES | {"string", "boolean", "binary"}


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    h = (seed + P5 + 8) & M
    k = _rotl((value & M) * P2 & M, 31) * P1 & M
    h ^= k
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    end = n
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        limit = end - 32
        while off <= limit:
            vs = [v1, v2, v3, v4]
            for i in range(4):
                blk = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], "little")
                vs[i] = (_rotl((vs[i] + blk * P2) & M, 31) * P1) & M
            v1, v2, v3, v4 = vs
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= end:
        blk = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((blk * P2) & M, 31) * P1) & M
        h = (_rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= end:
        h ^= (int.from_bytes(data[off:off + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < end:
        h ^= (data[off] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        off += 1
    return _fmix(h)


def hash_typed(value, type_name: str, seed: int) -> int:
    """One argument of Spark's XxHash64, dispatched by the COLUMN type
    (never by the python value's range). NULL -> seed unchanged."""
    if value is None:
        return seed
    if type_name in _INT_TYPES:
        return hash_int(int(value), seed)
    if type_name in _LONG_TYPES:
        return hash_long(int(value), seed)
    if type_name == "boolean":
        return hash_int(1 if value else 0, seed)
    if type_name == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    if type_name == "binary":
        return hash_bytes(bytes(value), seed)
    raise TypeError(f"unsupported type {type_name} for driver-side xxhash64")


def bucket_of(values, type_names, num_buckets: int) -> int:
    """``pmod(xxhash64(*cols), num_buckets)`` exactly as the JVM computes it
    for a row with these column values/types."""
    h = 42
    for v, t in zip(values, type_names):
        h = hash_typed(v, t, h)
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return ((signed % num_buckets) + num_buckets) % num_buckets
