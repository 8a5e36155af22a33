#!/usr/bin/env python3
"""Pure-python XXH64 matching Spark's
org.apache.spark.sql.catalyst.expressions.XXH64 (seed-42 ground truth from
graft.XxProbe). Used by tools/compare.py as a DuckDB UDF fallback and by the
macro self-test in tools/test_xxh64_macro.py."""
M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (11400714785074694791, 14029467366897019727,
                      1609587929392839161, 9650029242287828579,
                      2870177450012600261)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc, x):
    acc = (acc + x * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _merge(h, v):
    h ^= _round(0, v)
    return (h * P1 + P4) & M


def xxh64(data, seed=42):
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = ((seed + P1 + P2) & M, (seed + P2) & M, seed & M,
                          (seed - P1) & M)
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_signed(s, seed=42):
    """Spark returns a signed Long."""
    h = xxh64(s, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


if __name__ == "__main__":
    expected = [
        (0, -7444071767201028348, ""),
        (1, -8582455328737087284, "a"),
        (2, 2710560539726725091, "ab"),
        (3, 1423657621850124518, "abc"),
        (4, -6810745876291105281, "abcd"),
        (5, -990457398947679591, "abcde"),
        (7, 3761890393722740389, "abcdefg"),
        (8, 2470326616177429180, "abcdefgh"),
        (9, -7093207067522615973, "abcdefghi"),
        (12, 3897903351825168219, "abcdefghijkl"),
        (11, 7620854247404556961, "hello world"),
        (19, 6882318601984224800, "the quick brown fox"),
        (31, -601474011062493046, "0123456789012345678901234567890"),
        (32, -7360845206938539012, "01234567890123456789012345678901"),
        (65, 3038253153692680899,
         "the quick brown fox jumps over the lazy dog and keeps running far"),
        (31, 1188715331163104663, "naïve café ünïcode ✓ test"),
    ]
    bad = 0
    for n, want, s in expected:
        got = xxh64_signed(s)
        ok = got == want and len(s.encode("utf-8")) == n
        if not ok:
            bad += 1
            print(f"MISMATCH {s!r}: got {got} want {want}")
    print("all ok" if not bad else f"{bad} mismatches")
