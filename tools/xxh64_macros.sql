-- Pure-SQL XXH64 (seed 42) for DuckDB, bit-equal to Spark's
-- org.apache.spark.sql.catalyst.expressions.XXH64 over UTF-8 string bytes.
-- Prepended to the oracle SQL of the xxhash64-based _fast dedup queries so
-- the oracle runs in ANY DuckDB with no Python UDF registration.
-- All arithmetic is HUGEINT (int128) mod 2^64; the 64x64 multiply is split
-- into 32-bit halves so intermediates stay under 2^127. DuckDB 1.0 binds
-- macros at creation with untyped params, so every param/list element use
-- carries an explicit ::HUGEINT cast.
CREATE OR REPLACE MACRO xg_m64(a, b) AS
  ((a::HUGEINT % 4294967296) * (b::HUGEINT % 4294967296)
   + ((((a::HUGEINT % 4294967296) * (b::HUGEINT // 4294967296)
        + (a::HUGEINT // 4294967296) * (b::HUGEINT % 4294967296)) % 4294967296)
      * 4294967296))
  % 18446744073709551616;
-- rotl(x, r) with p = 2^r, q = 2^(64-r): shifted halves occupy disjoint bits
CREATE OR REPLACE MACRO xg_rot(x, p, q) AS
  (x::HUGEINT * p::HUGEINT) % 18446744073709551616 + x::HUGEINT // q::HUGEINT;
CREATE OR REPLACE MACRO xg_rnd(acc, x) AS
  xg_m64(xg_rot((acc::HUGEINT + xg_m64(x, 14029467366897019727))
                  % 18446744073709551616,
                2147483648, 8589934592),
         11400714785074694791);
CREATE OR REPLACE MACRO xg_mrg(h, v) AS
  (xg_m64(xor(h::HUGEINT, xg_rnd(0, v)::HUGEINT), 11400714785074694791)
   + 9650029242287828579)
  % 18446744073709551616;
CREATE OR REPLACE MACRO xg_hexv(c) AS strpos('123456789ABCDEF', c::VARCHAR)::HUGEINT;
CREATE OR REPLACE MACRO xg_bytes(s) AS
  (SELECT [16 * xg_hexv(substr(hx, 2 * i - 1, 1)) + xg_hexv(substr(hx, 2 * i, 1))
           for i in range(1, octet_length(encode(s::VARCHAR)) + 1)]
   FROM (SELECT hex(encode(s::VARCHAR)) AS hx));
CREATE OR REPLACE MACRO xg_lane8(b, o) AS
  b[o+1]::HUGEINT + 256*b[o+2]::HUGEINT + 65536*b[o+3]::HUGEINT
  + 16777216*b[o+4]::HUGEINT + 4294967296*b[o+5]::HUGEINT
  + 1099511627776*b[o+6]::HUGEINT + 281474976710656*b[o+7]::HUGEINT
  + 72057594037927936*b[o+8]::HUGEINT;
CREATE OR REPLACE MACRO xg_lane4(b, o) AS
  b[o+1]::HUGEINT + 256*b[o+2]::HUGEINT + 65536*b[o+3]::HUGEINT
  + 16777216*b[o+4]::HUGEINT;
CREATE OR REPLACE MACRO xg_sb(n) AS
  CASE WHEN n::BIGINT >= 32 THEN (n::BIGINT // 32) * 32 ELSE 0 END;
-- DuckDB's binder caps nested macro-call depth at ~40 along one expression
-- path, but column bindings in a derived-table FROM chain reset the counter
-- (and list_reduce lambdas apply without accumulating). The hash is
-- therefore staged: each phase macro takes the previous phase's value as a
-- plain column argument, and xg_xxh64u chains them through nested FROMs.
-- stripe phase (n>=32: 4-lane rounds then merge) + length add
CREATE OR REPLACE MACRO xg_h1(b, n, seed) AS
  (CASE WHEN n::BIGINT >= 32 THEN
    (SELECT xg_mrg(xg_mrg(xg_mrg(xg_mrg(
        (xg_rot(st[1]::HUGEINT, 2, 9223372036854775808)
         + xg_rot(st[2]::HUGEINT, 128, 144115188075855872)
         + xg_rot(st[3]::HUGEINT, 4096, 4503599627370496)
         + xg_rot(st[4]::HUGEINT, 262144, 70368744177664))
          % 18446744073709551616,
        st[1]::HUGEINT), st[2]::HUGEINT), st[3]::HUGEINT), st[4]::HUGEINT)
     FROM (SELECT list_reduce(
        list_prepend(
          [(seed::HUGEINT + 6983438078262162902) % 18446744073709551616,
           (seed::HUGEINT + 14029467366897019727) % 18446744073709551616,
           seed::HUGEINT % 18446744073709551616,
           (seed::HUGEINT + 7046029288634856825) % 18446744073709551616],
          [[xg_lane8(b, 32*k), xg_lane8(b, 32*k + 8),
            xg_lane8(b, 32*k + 16), xg_lane8(b, 32*k + 24)]
           for k in range(0, n::BIGINT // 32)]),
        (acc, x) -> [xg_rnd(acc[1]::HUGEINT, x[1]::HUGEINT),
                     xg_rnd(acc[2]::HUGEINT, x[2]::HUGEINT),
                     xg_rnd(acc[3]::HUGEINT, x[3]::HUGEINT),
                     xg_rnd(acc[4]::HUGEINT, x[4]::HUGEINT)]) AS st))
   ELSE (seed::HUGEINT + 2870177450012600261) % 18446744073709551616
   END + n::HUGEINT)
  % 18446744073709551616;
-- remaining 8-byte words, folded from the stripe-phase value h1v
CREATE OR REPLACE MACRO xg_h2(b, n, h1v) AS
  list_reduce(
    list_prepend(h1v::HUGEINT,
      [xg_lane8(b, xg_sb(n) + 8*k)
       for k in range(0, (n::BIGINT - xg_sb(n)) // 8)]),
    (acc, w) -> (xg_m64(xg_rot(xor(acc::HUGEINT, xg_rnd(0, w::HUGEINT)::HUGEINT),
                               134217728, 137438953472),
                        11400714785074694791) + 9650029242287828579)
                % 18446744073709551616);
-- optional 4-byte word
CREATE OR REPLACE MACRO xg_h3(b, n, h2v) AS
  list_reduce(
    list_prepend(h2v::HUGEINT,
      CASE WHEN n::BIGINT % 8 >= 4 THEN [xg_lane4(b, (n::BIGINT // 8) * 8)]
           ELSE []::HUGEINT[] END),
    (acc, w) -> (xg_m64(xg_rot(xor(acc::HUGEINT,
                                   xg_m64(w::HUGEINT, 11400714785074694791)::HUGEINT),
                               8388608, 2199023255552),
                        14029467366897019727) + 1609587929392839161)
                % 18446744073709551616);
-- trailing bytes
CREATE OR REPLACE MACRO xg_h4(b, n, h3v) AS
  list_reduce(
    list_prepend(h3v::HUGEINT,
                 b[(n::BIGINT // 4) * 4 + 1 : n::BIGINT]),
    (acc, c) -> xg_m64(xg_rot(xor(acc::HUGEINT,
                                  xg_m64(c::HUGEINT, 2870177450012600261)::HUGEINT),
                              2048, 9007199254740992),
                       11400714785074694791));
CREATE OR REPLACE MACRO xg_av(hh) AS
  (SELECT xor(h4::HUGEINT, h4::HUGEINT // 4294967296)
   FROM (SELECT xg_m64(xor(h2::HUGEINT, h2::HUGEINT // 536870912),
                       1609587929392839161) AS h4
         FROM (SELECT xg_m64(xor(hh::HUGEINT, hh::HUGEINT // 8589934592),
                             14029467366897019727) AS h2)));
-- unsigned xxh64(utf8(s), seed=42) as HUGEINT in [0, 2^64)
CREATE OR REPLACE MACRO xg_xxh64u(s) AS
  (SELECT xg_av(h4v)
   FROM (SELECT xg_h4(b, n, h3v) AS h4v
         FROM (SELECT b, n, xg_h3(b, n, h2v) AS h3v
               FROM (SELECT b, n, xg_h2(b, n, h1v) AS h2v
                     FROM (SELECT b, n, xg_h1(b, n, 42) AS h1v
                           FROM (SELECT xg_bytes(s) AS b,
                                        octet_length(encode(s::VARCHAR)) AS n))))));
-- Spark pmod(xxhash64(s), 2^32): the low 32 bits, non-negative
CREATE OR REPLACE MACRO xg_h32(s) AS xg_xxh64u(s) % 4294967296;
