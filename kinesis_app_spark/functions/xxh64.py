"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression bit for
bit — so SESSIONLESS code paths (the Python DataSource planner workers,
which have no SparkSession and therefore no JVM) can compute the same
bloom-bucket probes the manifest's per-file bloom index stored.

Spark's ``xxhash64(col)`` (seed 42) hashes each type through a
specialized path of the public XXH64 algorithm (xxHash, Yann Collet,
BSD — re-derived here from the published spec, constants are the
algorithm's):

- byte/short/int/date      -> hashInt(v)          (4-byte shortcut)
- long/timestamp           -> hashLong(v)         (8-byte shortcut)
- float                    -> hashInt(floatToIntBits(v)),  -0.0 -> 0.0
- double                   -> hashLong(doubleToLongBits(v)), -0.0 -> 0.0
- boolean                  -> hashInt(1/0)
- string                   -> hashBytes(utf8)     (general byte path)
- null                     -> the seed passes through unchanged

Every path is property-tested against the JVM expression in
tests/test_round7b.py — exactness is load-bearing: these hashes decide
FILE SKIPPING, where a mismatch silently drops matching rows.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 4-byte word (Spark's hashInt): the value is taken
    as an UNSIGNED 32-bit lane, exactly like the tail-word step of the
    general algorithm."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 8-byte word (Spark's hashLong)."""
    h = (seed + _P5 + 8) & _M
    k1 = _rotl((v & _M) * _P2 & _M, 31) * _P1 & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (Spark's hashUnsafeBytes path for
    StringType/BinaryType) — the full published algorithm: 32-byte
    stripes, then 8-byte words, then ONE 4-byte word, then bytes.

    Trailing bytes are consumed unsigned, exactly as the reference
    algorithm specifies (property-tested against the JVM expression
    over random byte lengths, including every tail length mod 32)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            w = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + w[0] * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w[1] * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w[2] * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w[3] * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(value, spark_type_name: str) -> int | None:
    """``F.xxhash64(F.lit(value).cast(T))`` as a SIGNED 64-bit int,
    computed without a JVM. ``spark_type_name`` is the DataType's
    ``typeName()`` / simpleString (``long``, ``integer``, ``string``,
    ``date``, ``timestamp``, ...). Returns None for types this helper
    does not cover — callers must then skip the optimization, never
    guess."""
    import datetime as dt

    t = spark_type_name.lower()
    if value is None:
        return SPARK_SEED  # null: seed passes through
    if t in ("long", "bigint"):
        u = hash_long(int(value))
    elif t in ("integer", "int", "short", "smallint", "byte", "tinyint"):
        u = hash_int(int(value))
    elif t == "boolean":
        u = hash_int(1 if value else 0)
    elif t == "string":
        u = hash_bytes(str(value).encode("utf-8"))
    elif t == "binary":
        u = hash_bytes(bytes(value))
    elif t == "float":
        f = struct.unpack("<f", struct.pack("<f", float(value)))[0]
        if f == 0.0:
            f = 0.0  # normalize -0.0
        u = hash_int(struct.unpack("<i", struct.pack("<f", f))[0])
    elif t == "double":
        d = float(value)
        if d == 0.0:
            d = 0.0
        u = hash_long(struct.unpack("<q", struct.pack("<d", d))[0])
    elif t == "date":
        if isinstance(value, dt.date):
            days = (value - dt.date(1970, 1, 1)).days
        else:
            days = int(value)
        u = hash_int(days)
    elif t == "timestamp":
        # Spark's internal TimestampType value is micros since the UTC
        # epoch — hash THAT, never a wall clock. Aware datetimes carry
        # their instant, so the conversion is exact (integer timedelta
        # arithmetic — .timestamp() floats lose micros past ~2112).
        # Naive datetimes are frame-ambiguous (OS-local? session tz?
        # wall clock?): guessing here silently skips files, so refuse —
        # the caller drops the probe and prunes nothing (the module's
        # "never guess" rule). The real pushdown path never produces
        # them: Spark 4.1 serializes pushed timestamp literals through
        # the variant codec, which yields AWARE UTC datetimes
        # (pyspark/sql/variant_utils.py hardcodes zone_id="UTC").
        if isinstance(value, dt.datetime):
            if value.tzinfo is None:
                return None
            delta = value - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
            micros = (delta.days * 86_400_000_000
                      + delta.seconds * 1_000_000 + delta.microseconds)
        else:
            micros = int(value)
        u = hash_long(micros)
    elif t == "timestamp_ntz":
        # NTZ is a frame-free wall clock: internal micros = the literal
        # wall-clock fields against a naive epoch. An aware value can't
        # be an NTZ literal — refuse rather than pick a frame.
        if isinstance(value, dt.datetime):
            if value.tzinfo is not None:
                return None
            delta = value - dt.datetime(1970, 1, 1)
            micros = (delta.days * 86_400_000_000
                      + delta.seconds * 1_000_000 + delta.microseconds)
        else:
            micros = int(value)
        u = hash_long(micros)
    else:
        return None  # decimals etc.: not covered
    return _to_signed64(u)
