# Pure-python XXH64 (spec implementation) used ONLY to validate the
# DuckDB-SQL re-derivation of Spark's xxhash64 (seed 42) in
# tools/gen_xxh64_sql.py. Verification tooling, not a library dep.
M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def rnd(acc, inp):
    return (rotl((acc + inp * P2) & M, 31) * P1) & M


def merge(h, v):
    return ((h ^ rnd(0, v)) * P1 + P4) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            w = [int.from_bytes(data[i + 8 * k:i + 8 * k + 8], "little")
                 for k in range(4)]
            v1, v2, v3, v4 = rnd(v1, w[0]), rnd(v2, w[1]), rnd(v3, w[2]), rnd(v4, w[3])
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = merge(h, v)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        w = int.from_bytes(data[i:i + 8], "little")
        h = (rotl(h ^ rnd(0, w), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i:i + 4], "little")
        h = (rotl(h ^ ((w * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


if __name__ == "__main__":
    # sanity vs Spark: spot values computed by org.apache.spark.sql.functions.xxhash64
    import sys
    for s in sys.argv[1:]:
        print(s, signed(xxh64(s.encode("utf-8"))))
