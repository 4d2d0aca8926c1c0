"""Deterministic key hashing shared by every routing path.

The reference routes keyed messages with murmur3_32(key) mod N
(pulsar-client/.../impl/RoundRobinPartitionMessageRouterImpl.java:74-77,
Murmur3Hash32.java). We are semantics-compatible: one deterministic hash,
identical on the JVM batch path (``F.xxhash64``) and the Python stream-sink
path (this module), so a key always lands in the same partition across
executors, restarts, and write paths — the invariant Key_Shared dispatch and
compaction's latest-per-key rely on. Python's builtin ``hash()`` is
PYTHONHASHSEED-randomized per process and must never route.

XXH64 is a public, stable algorithm (Yann Collet, BSD); Spark's ``xxhash64``
applies it to the UTF-8 bytes of a string with seed 42 and returns the
result as a signed 64-bit long.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxhash64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` — unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_signed(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed 64-bit XXH64 — bit-identical to Spark's ``F.xxhash64`` over a
    string column when given its UTF-8 bytes."""
    h = xxhash64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def route_partition(key: str | None, n_partitions: int) -> int:
    """Python-side mirror of the batch router
    ``pmod(xxhash64(key), n_partitions)`` (topic.append). Python's ``%`` on a
    signed value with positive modulus equals Spark's ``pmod``. Spark's hash
    expressions skip NULL inputs and return the seed, so a NULL key routes as
    ``42 mod N`` there too."""
    if key is None:
        return SPARK_XXHASH_SEED % n_partitions
    return xxhash64_signed(key.encode("utf-8")) % n_partitions
