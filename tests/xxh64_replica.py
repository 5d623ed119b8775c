"""Pure-Python replica of Spark's ``xxhash64`` expression, for independent
value-level verification of the hash-based dedup operators (round-1 verdict
item #6: upgrade the rows-only queries to exact expected-output checks).

Implements the public xxHash64 algorithm (spec: github.com/Cyan4973/xxHash
doc/xxhash_spec.md) plus Spark's per-type dispatch: the XxHash64 expression
hashes each argument in turn, feeding the running hash in as the seed of the
next argument's hash (seed starts at 42). Integers hash as 4-byte blocks,
longs as 8-byte, strings as their UTF-8 bytes. Correctness of this replica
vs the JVM implementation is asserted in
test_dedup_fixtures.py::test_xxh64_replica_matches_spark.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


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
            for i, v in enumerate((v1, v2, v3, v4)):
                blk = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], "little")
                v = (_rotl((v + blk * P2) & M, 31) * P1) & M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
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


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*args, seed: int = 42) -> int:
    """Spark-semantics xxhash64: chain each argument's hash as the next
    seed. ``int`` args mirror Spark IntegerType (4-byte) when they fit in
    int32 — matching ``F.lit(py_int)``'s type inference; pass ('long', v)
    to force 8-byte. ``str`` hashes UTF-8 bytes. Returns SIGNED 64-bit (as
    Spark's LongType result)."""
    h = seed
    for a in args:
        if isinstance(a, tuple) and a[0] == "long":
            h = hash_long(a[1], h)
        elif isinstance(a, bool):
            raise TypeError("bool not needed")
        elif isinstance(a, int):
            if -(1 << 31) <= a < (1 << 31):
                h = hash_int(a, h)
            else:
                h = hash_long(a, h)
        elif isinstance(a, str):
            h = hash_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = hash_bytes(a, h)
        else:
            raise TypeError(f"unsupported {type(a)}")
    return _to_signed(h)
