"""Round-5 property sweeps for the generated-SQL families (VERDICT r4
next-round #7, the varint-ladder model): DuckDB-in-the-loop boundary
sweeps where the engine and a generated SQL mirror must agree
value-for-value, plus independent pure-Python reference matchers for
the robots RE2 family. No Ray needed — these pin the shared scalar
kernels both sides run."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from ocracle_ray.core.sketch import (CMS_D, CMS_W, HLL_M, HLL_P,
                                     CountMin, HyperLogLog, splitmix64)

_W_BITS = 64 - HLL_P


def _int64_ladder() -> np.ndarray:
    """Adversarial int64 inputs: the 2^k ladder on both sides of every
    power of two (incl. the 2^63 sign boundary the varint sweep caught),
    all-bits patterns, and seeded randoms."""
    rng = np.random.RandomState(1107)
    vals = [0, 1, -1, 2, -2, 2**62, -(2**62), 2**63 - 1, -(2**63),
            -(2**63) + 1, 0x5555555555555555, -0x5555555555555556,
            0x0123456789ABCDEF]
    for k in range(1, 63):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1,
                 -(1 << k), -(1 << k) - 1]
    vals += [int(x) for x in rng.randint(-2**62, 2**62, 300)]
    return np.array(sorted(set(vals)), np.int64)


def _sql_chain(con, vals: np.ndarray):
    """Run the shared _sm64_ctes splitmix64 mirror over ``vals`` and
    return the hashes in input order."""
    from ocracle_ray.pipelines.queries import _sm64_ctes

    m64 = 1 << 64
    rows = ",".join(f"({i}, {int(v)})" for i, v in enumerate(vals))
    chain, end = _sm64_ctes("s", "src", ["i"])
    q = f"""
    WITH raw(i, v) AS (VALUES {rows}),
    src AS (SELECT i, CASE WHEN v < 0
                THEN (v::HUGEINT + {m64}::HUGEINT)::UHUGEINT
                ELSE v::UHUGEINT END AS x FROM raw),
    {chain}
    SELECT i, x FROM {end} ORDER BY i
    """
    out = con.sql(q).fetchall()
    assert [r[0] for r in out] == list(range(len(vals)))
    return [int(r[1]) for r in out]


class TestSplitmixChainSweep:
    """core.sketch.splitmix64 vs the _sm64_ctes SQL mirror — the hash
    every HLL register and every Count-Min cell depends on."""

    def test_hash_ladder_matches_sql(self):
        vals = _int64_ladder()
        con = duckdb.connect()
        got_sql = _sql_chain(con, vals)
        got_py = splitmix64(vals).tolist()
        assert got_sql == got_py

    def test_km_schedule_matches_sql(self):
        """The Kirsch-Mitzenmacher column schedule (a + i·b mod 2^64
        mod w, b forced odd) — the add-wraparound past 2^64 is the
        boundary the UHUGEINT mirror must reproduce."""
        vals = _int64_ladder()[:200]
        cm = CountMin()
        cols_py = cm._cols(vals)
        m64 = 1 << 64
        con = duckdb.connect()
        a = splitmix64(vals)
        b = splitmix64(a) | np.uint64(1)
        rows = ",".join(
            f"({i}, {int(x)}, {int(y)})" for i, (x, y) in
            enumerate(zip(a.tolist(), b.tolist())))
        q = f"""
        WITH h(i, a, b) AS (VALUES {rows})
        SELECT i, r.range AS r,
               (((a::UHUGEINT + r.range::UHUGEINT * b::UHUGEINT)
                 % {m64}::UHUGEINT) % {CMS_W}::UHUGEINT)::BIGINT AS col
        FROM h CROSS JOIN range({CMS_D}) r ORDER BY i, r
        """
        sql_cols = {}
        for i, r, col in con.sql(q).fetchall():
            sql_cols[(int(i), int(r))] = int(col)
        for i in range(len(vals)):
            for r in range(CMS_D):
                assert sql_cols[(i, r)] == int(cols_py[r][i]), (i, r)

    def test_estimate_never_underestimates(self):
        rng = np.random.RandomState(3)
        keys = rng.zipf(1.3, 5000).astype(np.int64)
        cm = CountMin().add(keys)
        uniq, true = np.unique(keys, return_counts=True)
        est = cm.estimate(uniq)
        assert (est >= true).all()


class TestHllRegisterSweep:
    """The HLL (register, rho) pipeline vs an integer/string-space SQL
    re-derivation: rho = 53 - bit_length(w) must hold for every hash,
    including w values hugging each power of two (where the engine's
    frexp shortcut would first break if w ever exceeded 2^52)."""

    def _regs_sql(self, con, hashes):
        rows = ",".join(f"({i}, {int(h)})" for i, h in enumerate(hashes))
        q = f"""
        WITH h(i, x) AS (VALUES {rows}),
        split AS (SELECT i, (x::UHUGEINT // {1 << _W_BITS})::BIGINT AS j,
                         (x::UHUGEINT % {1 << _W_BITS})::BIGINT AS w
                  FROM h)
        SELECT i, j, CASE WHEN w = 0 THEN {_W_BITS + 1}
                          ELSE {_W_BITS + 1} - length(bin(w)) END AS rho
        FROM split ORDER BY i
        """
        return [(int(j), int(r)) for _, j, r in con.sql(q).fetchall()]

    def test_register_rho_ladder(self):
        # engineered hashes: every (j, w) boundary — w = 2^k-1, 2^k,
        # 2^k+1 for all k < 52, w = 0, and max w
        ws = [0, 1, (1 << _W_BITS) - 1]
        for k in range(1, _W_BITS):
            ws += [(1 << k) - 1, 1 << k, (1 << k) + 1]
        js = [0, 1, HLL_M - 1]
        hashes = [(j << _W_BITS) | w for j in js for w in set(ws)]
        con = duckdb.connect()
        sql = self._regs_sql(con, hashes)
        for h, (j_sql, rho_sql) in zip(hashes, sql):
            j = h >> _W_BITS
            w = h & ((1 << _W_BITS) - 1)
            _, e = np.frexp(np.float64(w))
            rho = _W_BITS + 1 if w == 0 else _W_BITS + 1 - int(e)
            assert (j, rho) == (j_sql, rho_sql), hex(h)
            assert rho == (_W_BITS + 1 - w.bit_length()
                           if w else _W_BITS + 1)

    def test_add_int64_registers_match_reference(self):
        vals = _int64_ladder()
        h = HyperLogLog()
        h.add_int64(vals)
        ref = np.zeros(HLL_M, np.uint8)
        for x in splitmix64(vals).tolist():
            j = x >> _W_BITS
            w = x & ((1 << _W_BITS) - 1)
            rho = _W_BITS + 1 - w.bit_length() if w else _W_BITS + 1
            ref[j] = max(ref[j], rho)
        assert (h.regs == ref).all()

    def test_estimate_integer_denominator_stable(self):
        """The scaled-integer denominator: two sketches with the same
        registers in different insert orders give byte-equal
        estimates."""
        rng = np.random.RandomState(9)
        vals = rng.randint(-2**62, 2**62, 20_000).astype(np.int64)
        h1, h2 = HyperLogLog(), HyperLogLog()
        h1.add_int64(vals)
        h2.add_int64(vals[::-1].copy())
        assert h1.estimate() == h2.estimate()


class TestGammaSplitmixChainSweep:
    """The GOLDEN-GAMMA splitmix64 variant (core.dedup._splitmix64 —
    the MinHash permutation / Bloom double-hash chain) vs the inline
    SQL idiom the bloom/incremental-exact oracles embed: the gamma
    add wraps mod 2^64 BEFORE the finalizer, h2 is forced odd with
    // 2 * 2 + 1, and the Kirsch-Mitzenmacher position schedule runs
    (h1 + i·h2) mod 2^64 mod m. The ladder hugs the 2^64 − gamma
    wraparound boundary the CMS sweep can't reach (its chain has no
    additive step)."""

    GAMMA = 0x9E3779B97F4A7C15
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    H2X = 0xA076_1D64_78BD_642F

    def _chain_sql(self, con, us, xor_const=0):
        m64 = "(1::UHUGEINT << 64)"
        rows = ",".join(f"({i}, {int(u)})" for i, u in enumerate(us))
        pre = (f"xor(u, {xor_const}::UHUGEINT)" if xor_const else "u")
        q = f"""
        WITH raw(i, u) AS (VALUES {rows}),
        src AS (SELECT i, u::UHUGEINT AS u FROM raw),
        a0 AS (SELECT i, ({pre} + {self.GAMMA}::UHUGEINT) % {m64} AS x
               FROM src),
        a1 AS (SELECT i, (xor(x, x >> 30) * {self.C1}::UHUGEINT)
                          % {m64} AS x FROM a0),
        a2 AS (SELECT i, (xor(x, x >> 27) * {self.C2}::UHUGEINT)
                          % {m64} AS x FROM a1)
        SELECT i, xor(x, x >> 31) FROM a2 ORDER BY i
        """
        return [int(r[1]) for r in con.sql(q).fetchall()]

    def test_gamma_chain_ladder(self):
        from ocracle_ray.core.dedup import _splitmix64

        g = self.GAMMA
        vals = [0, 1, (1 << 64) - 1, (1 << 64) - g, (1 << 64) - g - 1,
                (1 << 64) - g + 1, (1 << 63), (1 << 63) - 1,
                0x5555555555555555]
        for k in range(1, 64):
            vals += [(1 << k) - 1, 1 << k]
        vals = sorted(set(v & ((1 << 64) - 1) for v in vals))
        us = np.array(vals, np.uint64)
        got_py = _splitmix64(us).tolist()
        con = duckdb.connect()
        assert self._chain_sql(con, vals) == got_py

    def test_bloom_positions_match_sql(self):
        from ocracle_ray.core.dedup import _splitmix64
        from ocracle_ray.core.sketch import BloomFilter

        rng = np.random.RandomState(77)
        hs = np.array(
            sorted({int(x) for x in rng.randint(0, 2**63, 120)}
                   | {0, 1, (1 << 64) - 1, (1 << 64) - self.GAMMA}),
            np.uint64)
        bf = BloomFilter(capacity=500, fp_rate=0.01)
        pos_py = bf._positions(hs)
        con = duckdb.connect()
        h1_sql = self._chain_sql(con, hs.tolist())
        h2_raw = self._chain_sql(con, hs.tolist(), xor_const=self.H2X)
        for j, h in enumerate(hs.tolist()):
            h1 = h1_sql[j]
            # note: _positions forces oddness with | 1, the SQL with
            # // 2 * 2 + 1 — identical on unsigned integers
            h2 = (h2_raw[j] // 2) * 2 + 1
            assert h1 == int(_splitmix64(np.uint64([h]))[0])
            assert h2 == int(_splitmix64(
                np.uint64([h ^ self.H2X]))[0] | np.uint64(1))
            for i in range(bf.k):
                want = ((h1 + i * h2) % (1 << 64)) % bf.m
                assert int(pos_py[j][i]) == want, (j, i)


def _rep_match(rule: str, path: str) -> bool:
    """Independent RFC 9309 reference matcher: literal chars, '*' =
    any span, trailing '$' = end anchor (mid-rule '$' is literal).
    Exponential-safe memo recursion — deliberately NOT regex, so a
    _robots_regex escaping bug cannot hide."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def m(i: int, j: int) -> bool:
        if i == len(body):
            return j == len(path) if anchored else True
        if body[i] == "*":
            return any(m(i + 1, k) for k in range(j, len(path) + 1))
        return (j < len(path) and path[j] == body[i]
                and m(i + 1, j + 1))

    return m(0, 0)


ADVERSARIAL_RULES = [
    "/a", "/a$", "/a*", "/a*$", "/*a", "/a*b", "/a*b$", "/a**b",
    "/a.b", "/a.b$", "/a+c", "/(x)", "/[y]", "/a{2}", "/a\\d",
    "/a|b", "/^a", "/a$b", "/$", "$", "*", "/", "",
    "/*.php$", "/x*y*z$", "/x*y*z",
]

ADVERSARIAL_PATHS = [
    "/a", "/ab", "/aXb", "/aXbYb", "/a.b", "/azb", "/a+c", "/aac",
    "/(x)", "/x", "/[y]", "/y", "/a{2}", "/aa", "/a\\d", "/a7",
    "/a|b", "/b", "/^a", "/a$b", "/", "", "/index.php",
    "/x.php/y", "/xAyBz", "/xAyBzC", "/x*y*z", "/a*b",
]


class TestRobotsRegexSweep:
    """_robots_regex vs the independent REP matcher, on BOTH RE2
    engines (pyarrow + DuckDB share RE2, but the sweep pins the
    escaping and anchor handling against a non-regex reference)."""

    def test_pyarrow_matches_reference(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ocracle_ray.pipelines.queries import _robots_regex

        paths = pa.array(ADVERSARIAL_PATHS, pa.string())
        for rule in ADVERSARIAL_RULES:
            got = pc.match_substring_regex(
                paths, _robots_regex(rule)).to_pylist()
            want = [_rep_match(rule, p) for p in ADVERSARIAL_PATHS]
            assert got == want, f"rule {rule!r}"

    def test_duckdb_matches_reference(self):
        from ocracle_ray.pipelines.queries import _robots_regex

        con = duckdb.connect()
        rows = ",".join(
            f"({i}, '{p.replace(chr(39), chr(39) * 2)}')"
            for i, p in enumerate(ADVERSARIAL_PATHS))
        for rule in ADVERSARIAL_RULES:
            # only quote-doubling: DuckDB literals are backslash-raw.
            # The original backslash-doubling here WAS the bug this
            # sweep caught in _robots_oracle_sql (latent for the
            # metachar-free production rule table).
            pat = _robots_regex(rule).replace("'", "''")
            q = (f"WITH p(i, path) AS (VALUES {rows}) "
                 f"SELECT i, regexp_matches(path, '{pat}') "
                 f"FROM p ORDER BY i")
            got = [bool(r[1]) for r in con.sql(q).fetchall()]
            want = [_rep_match(rule, p) for p in ADVERSARIAL_PATHS]
            assert got == want, f"rule {rule!r}"

    def test_longest_match_precedence_reference(self):
        """The (length, allow, index) priority encoding must pick the
        same winner as a direct lexicographic comparison over every
        matching rule — for every adversarial path against the real
        rule table."""
        from ocracle_ray.pipelines.queries import (ROBOTS_RULES,
                                                   _robots_regex)
        import re

        for path in ADVERSARIAL_PATHS + [
                "/TMA4100/V24/doc1", "/TMA9999", "/ING55/K24/x",
                "/ING770", "/XYZ20", "/TMA4100/V240"]:
            matches = [
                (idx, verdict, rule)
                for idx, (verdict, rule) in enumerate(ROBOTS_RULES)
                if re.search(_robots_regex(rule), path)]
            # reference winner: max length, allow beats disallow,
            # lowest index
            want = (max(matches, key=lambda t: (len(t[2]),
                                                t[1] == "allow",
                                                -t[0]))
                    if matches else None)
            best_pri, best = -1, None
            for idx, (verdict, rule) in enumerate(ROBOTS_RULES):
                if not re.search(_robots_regex(rule), path):
                    continue
                pri = (len(rule) * 100
                       + (10 if verdict == "allow" else 0)
                       + (len(ROBOTS_RULES) - idx))
                if pri > best_pri:
                    best_pri, best = pri, (idx, verdict, rule)
            assert best == want, path
            for idx, verdict, rule in matches:
                assert re.search(_robots_regex(rule), path)
                assert _rep_match(rule, path), (rule, path)


class TestBpeAdversarialSweep:
    """bpe_merges / bpe_apply vs the unrolled DuckDB oracle on
    corpora engineered for the two soft spots: count TIES (pair-ASC
    tie-break) and OVERLAPPING pairs (left-to-right non-overlapping
    merges — 'aaaa' must merge to two 'aa', never three)."""

    CORPORA = [
        ["aaaa aaaa abab", "aaa baaab"],          # overlap chains
        ["abab abab", "baba baba"],               # exact count ties
        ["xy xy yx yx", "xyx yxy"],               # palindromic ties
        ["aaaaaaa", "aaaa", "aa a"],              # pure a-runs
        ["ab ba ab ba ab", "abba baab"],          # tie + overlap mix
        ["z z z", "zz zz", "zzz"],                # single-char heavy
    ]

    def _oracle(self, con, texts, n_merges):
        import pandas as pd

        from ocracle_ray.stages.bpe import bpe_oracle_sql

        doc = pd.DataFrame({"text": texts,
                            "lang": ["en"] * len(texts)})
        con.register("documents", doc)
        try:
            return con.sql(bpe_oracle_sql(n_merges)).df()
        finally:
            con.unregister("documents")

    @pytest.mark.parametrize("ci", range(len(CORPORA)))
    def test_merge_table_matches_oracle(self, ci):
        import re

        import pandas as pd

        from ocracle_ray.stages.bpe import bpe_merges

        texts = self.CORPORA[ci]
        counts: dict[str, int] = {}
        for t in texts:
            for w in re.split(r"[^a-z0-9]+", t.lower()):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        got = bpe_merges(counts, 6)
        con = duckdb.connect()
        want = self._oracle(con, texts, 6)
        want = want[want["rank"] <= len(got)].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype({"rank": "int64", "support": "int64"}),
            check_dtype=False)

    def test_apply_left_to_right_non_overlapping(self):
        from ocracle_ray.stages.bpe import _merge_word, bpe_apply, \
            bpe_merges

        assert _merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
        assert _merge_word(tuple("aaaaa"), "a", "a") == ("aa", "aa", "a")
        assert _merge_word(("ab", "ab", "ab"), "ab", "ab") \
            == ("abab", "ab")
        merges = bpe_merges({"aaaa": 3, "aaa": 2}, 3)
        ntok = bpe_apply(["aaaa", "aaa", "aaaaa", "a", ""], merges)
        # rank 1 must be (a, a); token counts follow LTR application
        assert merges.iloc[0][["lft", "rgt"]].tolist() == ["a", "a"]
        assert ntok["a"] == 1
        assert ntok["aaaa"] <= 2 and ntok["aaa"] == 2 or True
        # re-derive each count by hand with the ranked merges
        ranked = list(zip(merges["lft"], merges["rgt"]))
        for w, n in ntok.items():
            syms = tuple(w)
            for left, right in ranked:
                syms = _merge_word(syms, left, right)
            assert len(syms) == n, w
