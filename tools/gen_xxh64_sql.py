# Generates the DuckDB-SQL re-derivation of Spark's xxhash64(string) —
# XXH64 over the UTF-8 bytes, seed 42 — used by the q_fingerprint oracle.
# Verification tooling only. The q_sampling oracle already re-implements
# the 8-byte-LONG specialization; this is the general variable-length
# byte path (stripes, 8/4/1-byte tails, avalanche), expressed as HUGEINT
# modular arithmetic over a per-row byte list.
#
# Validate with:  python3 tools/gen_xxh64_sql.py --test
M = 18446744073709551615
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def mulc(x, c):
    """x * c mod 2^64 with the 64x64 multiply split into 32-bit halves so
    products stay inside signed HUGEINT (same trick as the q_sampling
    oracle)."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (f"((({x}) * {lo}::HUGEINT + ((({x}) * {hi}::HUGEINT "
            f"& 4294967295::HUGEINT) << 32)) & {M}::HUGEINT)")


def rotl(x, r):
    return (f"(((({x}) << {r}) & {M}::HUGEINT) | (({x}) >> {64 - r}))")


def rnd(acc, inp):
    """XXH64 round: rotl(acc + inp*P2, 31) * P1 (all mod 2^64)."""
    return mulc(rotl(f"((({acc}) + {mulc(inp, P2)}) & {M}::HUGEINT)", 31), P1)


def rnd0(inp):
    return mulc(rotl(mulc(inp, P2), 31), P1)


def merge(h, v):
    return f"(({mulc(f'xor(({h}), {rnd0(v)})', P1)} + {P4}::HUGEINT) & {M}::HUGEINT)"


def word(base, nbytes):
    """Little-endian word from the 1-indexed byte list bs at 0-based
    offset `base` (a SQL expression)."""
    return "(" + " + ".join(
        f"bs[({base}) + {j + 1}] * {256 ** j}::HUGEINT" for j in range(nbytes)) + ")"


def xxh64_ctes(prefix, source_cte):
    """CTE chain mapping `source_cte`(k, s) -> `{prefix}_out`(k, h) where h
    is Spark's xxhash64(s) as signed BIGINT. k is an opaque key column."""
    p = prefix
    v1 = (SEED + P1 + P2) & M
    v2 = (SEED + P2) & M
    v3 = SEED
    v4 = (SEED - P1) & M
    stripe_acc = (
        "{'w1': " + rnd("a.w1", "s.w1") + ", 'w2': " + rnd("a.w2", "s.w2") +
        ", 'w3': " + rnd("a.w3", "s.w3") + ", 'w4': " + rnd("a.w4", "s.w4") + "}")
    conv = (rotl("v.w1", 1) + " + " + rotl("v.w2", 7) + " + " +
            rotl("v.w3", 12) + " + " + rotl("v.w4", 18))
    h0 = merge(merge(merge(merge(f"(({conv}) & {M}::HUGEINT)",
        "v.w1"), "v.w2"), "v.w3"), "v.w4")
    tail8 = (f"(({mulc(rotl(f'xor(a, ' + rnd0('w') + ')', 27), P1)}"
             f" + {P4}::HUGEINT) & {M}::HUGEINT)")
    w32 = word("o4", 4)
    h3t = mulc(rotl(f"xor(h2, (({w32}) * {P1}::HUGEINT) & {M}::HUGEINT)", 23), P2)
    byte_acc = mulc(rotl(f"xor(a, (b * {P5}::HUGEINT) & {M}::HUGEINT)", 11), P1)
    return f"""
 {p}_b AS (SELECT k, hex(encode(s)) AS hx,
     CAST(octet_length(encode(s)) AS BIGINT) AS n FROM {source_cte}),
 {p}_bs AS (SELECT k, n, list_transform(generate_series(1, CAST(n AS INT)), i ->
     CAST(strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1 AS HUGEINT) * 16
       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bs
   FROM {p}_b),
 {p}_st AS (SELECT k, n, bs,
     list_reduce(list_prepend(
       {{'w1': {v1}::HUGEINT, 'w2': {v2}::HUGEINT,
         'w3': {v3}::HUGEINT, 'w4': {v4}::HUGEINT}},
       list_transform(generate_series(1, CAST(n // 32 AS INT)), t ->
         {{'w1': {word('32*(t-1)', 8)},
           'w2': {word('32*(t-1)+8', 8)},
           'w3': {word('32*(t-1)+16', 8)},
           'w4': {word('32*(t-1)+24', 8)}}})),
       (a, s) -> {stripe_acc}) AS v
   FROM {p}_bs),
 {p}_h1 AS (SELECT k, n, bs,
     ((CASE WHEN n >= 32 THEN {h0}
            ELSE {(SEED + P5) & M}::HUGEINT END) + n) & {M}::HUGEINT AS h1
   FROM {p}_st),
 {p}_h2 AS (SELECT k, n, bs,
     list_reduce(list_prepend(h1,
       list_transform(generate_series(1, CAST((n % 32) // 8 AS INT)), t ->
         {word('32*(n//32) + 8*(t-1)', 8)})),
       (a, w) -> {tail8}) AS h2,
     32*(n//32) + 8*((n % 32)//8) AS o4
   FROM {p}_h1),
 {p}_h3 AS (SELECT k, n, bs,
     CASE WHEN (n % 8) >= 4
          THEN (({h3t}) + {P3}::HUGEINT) & {M}::HUGEINT
          ELSE h2 END AS h3
   FROM {p}_h2),
 {p}_h4 AS (SELECT k,
     list_reduce(list_prepend(h3,
       list_transform(generate_series(1, CAST(n % 4 AS INT)), t ->
         bs[CAST(n - (n % 4) AS INT) + t])),
       (a, b) -> {byte_acc}) AS h4
   FROM {p}_h3),
 {p}_a1 AS (SELECT k, {mulc('xor(h4, h4 >> 33)', P2)} AS a2 FROM {p}_h4),
 {p}_a2 AS (SELECT k, {mulc('xor(a2, a2 >> 29)', P3)} AS a4 FROM {p}_a1),
 {p}_out AS (SELECT k,
     CAST(CASE WHEN xor(a4, a4 >> 32) >= 9223372036854775808::HUGEINT
               THEN xor(a4, a4 >> 32) - 18446744073709551616::HUGEINT
               ELSE xor(a4, a4 >> 32) END AS BIGINT) AS h
   FROM {p}_a2)"""


if __name__ == "__main__":
    import sys
    if "--test" in sys.argv:
        import duckdb
        from xxh64_ref import xxh64, signed
        tests = ["", "a", "ab", "abc", "abcd", "abcde", "1234567", "12345678",
                 "123456789", "the quick brown fox jumps over the lazy dog",
                 "0123456789abcdef0123456789abcdef",
                 "0123456789abcdef0123456789abcde",
                 "0123456789abcdef0123456789abcdef0",
                 "héj üß 汉字 …", "x" * 100, "y" * 31, "z" * 39, "w" * 36,
                 "v" * 35, "q" * 64, "r" * 65, "s" * 33, "t" * 63] + \
                ["mix %d éü" % i * (i % 7 + 1) for i in range(40)]
        con = duckdb.connect()
        con.execute("CREATE TABLE src AS SELECT * FROM (VALUES " +
                    ",".join("(%d, ?)" % i for i in range(len(tests))) +
                    ") AS t(k, s)", tests)
        sql = "WITH" + xxh64_ctes("x", "src") + " SELECT k, h FROM x_out ORDER BY k"
        got = dict(con.sql(sql).fetchall())
        bad = 0
        for i, t in enumerate(tests):
            want = signed(xxh64(t.encode("utf-8")))
            if got[i] != want:
                bad += 1
                print("MISMATCH", repr(t[:40]), got[i], want)
        print("duckdb-sql vs python-ref:",
              "ALL %d MATCH" % len(tests) if bad == 0 else "%d FAIL" % bad)
    else:
        print("WITH" + xxh64_ctes("x", "src") + " SELECT k, h FROM x_out")
