"""Property-based tests (hypothesis) for the semantics the conformance
corpus cannot exhaustively cover.

The reference has no property-based testing (SURVEY.md §5); these tests
pin the two places where subtle semantics live:

1. `compare_values` (f64-else-string, /root/reference/src/utils.rs:
   396-433) — the Spark Column expression must agree with a direct
   Python model of the Rust code on arbitrary lexical forms, including
   the quirky corners: Rust-grammar-gated parses ("inf"/"infinity"/
   "nan", "5.", ".5", no whitespace, no "1_0"), NaN falling through to
   cmp=0 (le/ge/eq true), mixed numeric/non-numeric ⇒ false.
2. Connected components — the driver union-find fast path and a plain
   BFS model must agree on arbitrary small graphs (the distributed
   fixpoint is separately pinned to the same output in
   test_pipeline.py::test_connected_components_chain).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_rust_spark.engine.compare import _OPS, rust_f64_parse
from shacl_rust_spark.pipeline.cc import _driver_cc

# --- 1. compare_values ---------------------------------------------------

_RUST_RE = re.compile(
    r"^[+-]?([0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?"
    r"|\.[0-9]+([eE][+-]?[0-9]+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN])$"
)


def _model_parse(v: str) -> float | None:
    """Direct model of Rust str::parse::<f64> (grammar-gated float)."""
    return float(v) if _RUST_RE.match(v) else None


def _model_compare(a: str, b: str, op: str) -> bool:
    """Line-for-line model of compare_values (utils.rs:396-433) for two
    literal terms."""
    na, nb = _model_parse(a), _model_parse(b)
    if na is not None and nb is not None:
        if na < nb:
            cmp = -1
        elif na > nb:
            cmp = 1
        else:
            cmp = 0  # includes every NaN case: both < and > are false
    elif na is None and nb is None:
        # Rust str cmp is byte-wise over UTF-8 == code-point order
        cmp = -1 if a < b else (1 if a > b else 0)
    else:
        return False
    return {"lt": cmp < 0, "le": cmp <= 0, "gt": cmp > 0,
            "ge": cmp >= 0, "eq": cmp == 0}[op]


_lexical = st.one_of(
    st.sampled_from([
        "inf", "Infinity", "-inf", "+INFINITY", "nan", "NaN", "-NaN",
        "5.", ".5", "1e3", "1E-2", "+3", "-0", "0", "1_0", " 5", "5 ",
        "0x10", "1d", "abc", "", "10", "9", "á", "Z",
    ]),
    st.floats(allow_nan=True, allow_infinity=True).map(repr),
    st.integers(-1000, 1000).map(str),
    st.text(alphabet="0123456789.eE+-abz ", max_size=8),
)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(_lexical, _lexical), min_size=1, max_size=60))
def test_compare_terms_matches_rust_model(spark, pairs):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from shacl_rust_spark.engine.compare import compare_terms
    from shacl_rust_spark.schema import TERM_TYPE

    def term(v):
        return ("lit", v, "http://www.w3.org/2001/XMLSchema#string", "")

    schema = StructType([
        StructField("i", LongType()),
        StructField("a", TERM_TYPE), StructField("b", TERM_TYPE),
    ])
    df = spark.createDataFrame(
        [(i, term(a), term(b)) for i, (a, b) in enumerate(pairs)], schema
    )
    flags = df.select(
        "i", *[
            F.coalesce(compare_terms(F.col("a"), F.col("b"), op),
                       F.lit(False)).alias(op)
            for op in _OPS
        ]
    ).collect()
    for r in flags:
        a, b = pairs[r["i"]]
        for op in _OPS:
            expected = _model_compare(a, b, op)
            assert r[op] == expected, (
                f"compare_terms({a!r}, {b!r}, {op}) = {r[op]}, "
                f"model says {expected}"
            )


@given(_lexical)
@settings(max_examples=300, deadline=None)
def test_rust_f64_parse_matches_model(v):
    got = rust_f64_parse(v)
    want = _model_parse(v)
    if want is not None and want != want:  # NaN
        assert got is not None and got != got
    else:
        assert got == want


def test_compare_quirk_corners(spark):
    """Deterministic pins for the corners the reference's grammar and
    NaN flow create (would regress silently without these)."""
    cases = [
        # Rust parses inf/infinity (Spark's double cast does not)
        ("inf", "5", "gt", True),
        ("-infinity", "5", "lt", True),
        # NaN falls through to cmp=0: le/ge/eq true, lt/gt false
        ("NaN", "5", "ge", True),
        ("5", "nan", "le", True),
        ("NaN", "NaN", "eq", True),
        ("NaN", "5", "gt", False),
        # Rust grammar rejects what Python/Spark would accept
        ("1_0", "2", "lt", False),    # mixed: "1_0" is non-numeric
        (" 5", "5", "eq", False),     # whitespace ⇒ non-numeric ⇒ mixed
        ("5.", "5", "eq", True),      # trailing dot parses
        (".5", "0.5", "eq", True),
        # both non-numeric ⇒ byte-wise string compare
        ("abc", "abd", "lt", True),
        ("0x10", "0x9", "lt", True),  # string compare, not hex numeric
    ]
    from pyspark.sql import functions as F

    from shacl_rust_spark.engine.compare import compare_terms
    from shacl_rust_spark.schema import TERM_TYPE
    from pyspark.sql.types import LongType, StructField, StructType

    def term(v):
        return ("lit", v, "http://www.w3.org/2001/XMLSchema#string", "")

    schema = StructType([
        StructField("i", LongType()),
        StructField("a", TERM_TYPE), StructField("b", TERM_TYPE),
    ])
    df = spark.createDataFrame(
        [(i, term(a), term(b)) for i, (a, b, _, _) in enumerate(cases)], schema
    )
    rows = {r["i"]: r for r in df.select(
        "i", *[
            F.coalesce(compare_terms(F.col("a"), F.col("b"), op),
                       F.lit(False)).alias(op)
            for op in _OPS
        ]
    ).collect()}
    for i, (a, b, op, want) in enumerate(cases):
        got = rows[i][op]
        assert got == want, f"({a!r} {op} {b!r}) = {got}, want {want}"
        assert _model_compare(a, b, op) == want  # model agrees


# --- 2. connected components --------------------------------------------

def _model_cc(edges: list[tuple[str, str]]) -> dict[str, str]:
    """BFS reference model: component = min node id reachable."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[str, str] = {}
    for start in adj:
        if start in out:
            continue
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in seen:
                        seen.add(m)
                        nxt.append(m)
            frontier = nxt
        rep = min(seen)
        for n in seen:
            out[n] = rep
    return out


@given(st.lists(
    st.tuples(st.integers(0, 30).map(str), st.integers(0, 30).map(str)),
    max_size=60,
))
@settings(max_examples=300, deadline=None)
def test_driver_cc_matches_bfs_model(edges):
    got = dict(_driver_cc(edges))
    assert got == _model_cc(edges)


# --- 3. Kleene property paths -------------------------------------------

_P = "http://example.org/p"
# node universe: a few IRIs + literal-valued objects (never traversed)
_IRIS = [f"n{i}" for i in range(8)]
_LITS = ["lit0", "lit1"]


def _model_kleene(edges, starts, inverse, include_start):
    """Reference BFS (path.rs:138-171): reachable in ≥1 step, start
    seeded into visited (never re-emitted); literals are valid targets
    but never expanded; zeroOrMore adds the start itself."""
    adj: dict[str, list[str]] = {}
    for s, o in edges:
        a, b = (o, s) if inverse else (s, o)
        if inverse and a in _LITS:
            # literal "subject" of the inverse hop: the reference matches
            # triple.object == node, node here is the literal — fine; but
            # edges never have literal subjects, so b is always an IRI
            pass
        adj.setdefault(a, []).append(b)
    out = set()
    for f in starts:
        reach = set()
        frontier = [f] if f not in _LITS else []
        visited = {f}
        while frontier:
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in visited:
                        visited.add(m)
                        reach.add(m)
                        if m not in _LITS:
                            nxt.append(m)
            frontier = nxt
        if include_start:
            reach.add(f)
        out |= {(f, v) for v in reach}
    return out


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.sampled_from(_IRIS),
                       st.sampled_from(_IRIS + _LITS)), max_size=20),
    st.sets(st.sampled_from(_IRIS), min_size=1, max_size=4),
    st.booleans(),   # inverse hop
    st.booleans(),   # force the distributed fixpoint loop
)
def test_kleene_paths_match_reference_bfs(spark, edges, starts, inverse,
                                          force_loop):
    from pyspark.sql.types import StringType, StructField, StructType

    from shacl_rust_spark.engine.dataset import Dataset
    from shacl_rust_spark.engine.paths import resolve_path
    from shacl_rust_spark.rdf.turtle import parse_turtle
    from shacl_rust_spark.schema import TERM_TYPE
    from shacl_rust_spark.shapes.ir import (
        Hop, Inverse, OneOrMore, Path, ZeroOrMore,
    )

    def term(v):
        if v in _LITS:
            return ("lit", v, "http://www.w3.org/2001/XMLSchema#string", "")
        return ("iri", f"http://example.org/{v}", "", "")

    tri_schema = StructType([
        StructField("s", TERM_TYPE), StructField("p", StringType()),
        StructField("o", TERM_TYPE),
    ])
    triples = spark.createDataFrame(
        [(term(s), _P, term(o)) for s, o in set(edges)], tri_schema
    )
    ds = Dataset(spark, triples, parse_turtle(""))
    if force_loop:
        ds._MAX_KLEENE_EDGES = 0  # disable the memoized-pairs fast path

    focus = spark.createDataFrame(
        [(term(f),) for f in sorted(starts)],
        StructType([StructField("focus", TERM_TYPE)]),
    )
    inner = Inverse(_P) if inverse else Hop(_P)
    for elem_cls, include_start in ((OneOrMore, False), (ZeroOrMore, True)):
        got = {
            (r["focus"]["value"].rsplit("/", 1)[-1],
             r["v"]["value"].rsplit("/", 1)[-1])
            for r in resolve_path(
                ds, Path((elem_cls(inner),)), focus
            ).collect()
        }
        # model works on short names; literal values have no IRI prefix
        want = _model_kleene(set(edges), sorted(starts), inverse,
                             include_start)
        assert got == want, (
            f"{elem_cls.__name__} inverse={inverse} loop={force_loop}: "
            f"got {sorted(got)}, want {sorted(want)}"
        )


# --- PNG codec round-trip (round 3) -----------------------------------------
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.data(),
)
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_random_images_and_filters(w, h, seed, data):
    """decode(encode(img, any filter per row)) == img for arbitrary
    pixel patterns — pins all five unfilter branches (incl. Paeth's
    predictor ties) against the encoder's exact inverses, driver-side,
    no Spark session."""
    from shacl_rust_spark.ops import multimodal

    pix = [[(seed + 31 * y + 7 * x + (x * y) % 13) % 256 for x in range(w)]
           for y in range(h)]
    filters = data.draw(st.lists(
        st.integers(min_value=0, max_value=4), min_size=h, max_size=h))
    payload = multimodal.encode_png(w, h, pix, filters=filters)
    got = multimodal.decode_png(payload)
    assert got == (w, h, [[(v, v, v) for v in row] for row in pix])


# --- round-3 batch ops vs pure-Python models ---------------------------


def _funnel_greedy(evs, n_steps):
    """The Spark HOF scan: greedy earliest-first over (t, eid, s)."""
    r, lt = 0, None
    for t, _eid, s in sorted(evs):
        if s == r + 1 and (r == 0 or t > lt):
            r, lt = r + 1, t
    return r


def _funnel_chain(evs, n_steps):
    """The oracle's min-ts join chain."""
    t_prev, reached = None, 0
    for k in range(1, n_steps + 1):
        cands = [t for (t, _e, s) in evs
                 if s == k and (k == 1 or t > t_prev)]
        if not cands:
            break
        t_prev, reached = min(cands), k
    return reached


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50),
                          st.integers(1, 3)), max_size=25))
def test_funnel_greedy_equals_join_chain(evs):
    """The two funnel formulations (Spark greedy HOF scan vs the
    DuckDB oracle's min-ts join chain) agree on every stream,
    including timestamp ties and out-of-order step arrivals."""
    assert _funnel_greedy(evs, 3) == _funnel_chain(evs, 3)


def _kcore_rounds(edges, k, rounds):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                max_size=40), st.integers(2, 4))
def test_bounded_kcore_converged_is_exact_else_monotone(edges, k):
    """Where the peel converges within 6 rounds, the bounded-round
    result IS the exact k-core (every survivor has degree ≥ k and
    re-peeling is a no-op). Where it hasn't (a long chain peels one
    node pair per round — hypothesis finds 13-node paths needing 7),
    extra rounds only SHRINK the edge set (peeling is monotone), never
    resurrect or flip — the documented bounded-round contract."""
    out6 = _kcore_rounds(edges, k, 6)
    out7 = _kcore_rounds(edges, k, 7)
    if out6 == out7:
        assert all(d >= k for d in out6.values()) or not out6
    else:
        assert set(out7) <= set(out6)
        assert all(out7[n] <= out6[n] for n in out7)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 60),
                          st.integers(1, 3)), min_size=1, max_size=30),
       st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                max_size=25))
def test_funnel_and_kcore_spark_match_models(spark, evs, edges):
    import datetime as dt

    from shacl_rust_spark.ops import events as ev
    from shacl_rust_spark.ops import graph

    steps = ("view", "click", "purchase")
    # unique event_ids; user 7 carries the whole stream
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, t), 7, steps[s - 1], 0.0)
        for i, (t, _x, s) in enumerate(evs)
    ]
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {r.step_idx: r.n_users for r in ev.funnel(e, steps).collect()}
    want_r = _funnel_greedy([(t, i, s) for i, (t, _x, s)
                             in enumerate(evs)], 3)
    assert got == {i: 1 for i in range(1, want_r + 1)}

    if edges:
        df = spark.createDataFrame(edges, ["src", "dst"])
        got_k = {r.node: r.degree
                 for r in graph.k_core(df, k=2, rounds=6).collect()}
        assert got_k == _kcore_rounds(edges, 2, 6)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 1 << 20), min_size=1, max_size=60),
       st.sampled_from([50, 90, 99]))
def test_hist_quantile_estimator_bound(vals, q):
    """ops/sketch.hist_quantiles' estimator contract, on the pure
    model: the reported upper-bound-of-bin is ≥ the true q-th order
    statistic and < 2× it — the documented ≤2× relative error."""
    import math

    n = len(vals)
    qval = sorted(vals)[math.ceil(q * n / 100) - 1]
    # first bin whose cumulative count reaches ceil(q% · n) is the
    # bin CONTAINING that order statistic
    b = qval.bit_length() - 1
    est = (1 << (b + 1)) - 1
    assert qval <= est < 2 * qval


# --- GIF LZW codec -------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 255), max_size=400),
       st.integers(2, 8))
def test_gif_lzw_roundtrip_model(idx, mcs):
    """Arbitrary index streams round-trip through the variable-width
    GIF-LZW pair for every legal minimum code size (indices clamped
    into the alphabet the code size allows)."""
    from shacl_rust_spark.ops.multimodal import _lzw_decode, _lzw_encode

    alphabet = 1 << mcs
    idx = [i % alphabet for i in idx]
    assert _lzw_decode(mcs, _lzw_encode(mcs, idx)) == idx


# --- simhash banding -----------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.integers(-(2 ** 63), 2 ** 63 - 1),
       st.sets(st.integers(0, 63), max_size=3))
def test_simhash_pigeonhole_band_agreement(sig, flips):
    """The theorem simhash_band_pairs' recall rests on: flip ≤ 3 bits
    of any 64-bit signature and at least one of the four 16-bit bands
    is untouched — AND the band extraction `(s >> 16i) & 0xFFFF` gives
    identical results for arithmetic (Python on negatives) and logical
    shift, because the mask discards sign-extension."""
    other = sig
    for b in flips:
        other ^= 1 << b
        if other >= 2 ** 63:        # wrap to two's-complement long
            other -= 2 ** 64
        elif other < -(2 ** 63):
            other += 2 ** 64
    bands_a = [(sig >> (16 * i)) & 0xFFFF for i in range(4)]
    bands_b = [(other >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(x == y for x, y in zip(bands_a, bands_b))
    # shift-semantics proof: arithmetic >> then mask == logical
    for s in (sig, other):
        u = s & (2 ** 64 - 1)       # the logical (unsigned) view
        for i in range(4):
            assert ((s >> (16 * i)) & 0xFFFF) \
                == ((u >> (16 * i)) & 0xFFFF)


@settings(max_examples=300, deadline=None)
@given(st.integers(-(2 ** 63), 2 ** 63 - 1),
       st.sets(st.integers(0, 63), max_size=7))
def test_simhash_multitable_block_pair_agreement(sig, flips):
    """The hamming<=7 construction's recall theorem: with 9 blocks
    (one 8-bit + eight 7-bit), flipping <= 7 bits touches at most 7
    blocks, so at least TWO blocks are untouched — the pair shares the
    compound key of that block pair in one of the C(9,2)=36 tables
    (Manku-style multi-table banding, ops/dedup.simhash_band_pairs)."""
    other = sig
    for b in flips:
        other ^= 1 << b
        if other >= 2 ** 63:
            other -= 2 ** 64
        elif other < -(2 ** 63):
            other += 2 ** 64
    widths = [8] + [7] * 8
    offs, acc = [], 0
    for w in widths:
        offs.append(acc)
        acc += w

    def blocks(s):
        return [(s >> offs[i]) & ((1 << widths[i]) - 1) for i in range(9)]

    same = [x == y for x, y in zip(blocks(sig), blocks(other))]
    assert sum(same) >= 9 - len(flips) >= 2
    # and therefore at least one block PAIR agrees on its compound key
    from itertools import combinations
    assert any(same[i] and same[j] for i, j in combinations(range(9), 2))


# --- bounded-round graph ops vs pure models ------------------------------

def _model_bfs(edges, seeds, max_hops):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = hop
                    nxt.add(m)
        frontier = nxt
        if not frontier:
            break
    return dist


def _model_lpa(edges, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
             min_size=1, max_size=30),
    st.sets(st.integers(0, 12), min_size=1, max_size=3),
    st.integers(1, 4),
)
def test_bfs_and_lpa_spark_match_models(spark, edges, seeds, rounds):
    from shacl_rust_spark.ops import graph

    e = spark.createDataFrame(edges, ["src", "dst"])
    sf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {r.node: r.dist
           for r in graph.bfs_distances(e, sf, max_hops=rounds)
           .collect()}
    clean = [(a, b) for a, b in edges if a != b]
    assert got == _model_bfs(clean, seeds, rounds)

    got_l = {r.node: r.community
             for r in graph.label_propagation(e, rounds=rounds)
             .collect()}
    assert got_l == _model_lpa(edges, rounds)


# --- ETL-history ops vs pure models --------------------------------------

def _model_scd2(rows):
    """rows: (key, attr, ts:int, tb) → {(key, version, attr, from,
    to, is_current, n_rows)} with to=None for the open interval."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, a, t, tb in rows:
        by_key[k].append((t, tb, a))
    out = set()
    for k, rs in by_key.items():
        rs.sort()
        runs = []
        for t, _tb, a in rs:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, t, 1])
        for i, (a, frm, n) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            out.add((k, i + 1, a, frm, to, int(to is None), n))
    return out


def _model_cdc(base, chg):
    state = {k: (v, "base") for k, v in base}
    for k, v, op, _seq in sorted(chg, key=lambda r: r[3]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (v, "cdc")
    return {(k, v, s) for k, (v, s) in state.items()}


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 3), st.sampled_from("AB"),
                       st.integers(0, 20)),
             min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 999),
                       st.sampled_from(["I", "U", "D"])),
             max_size=20),
)
def test_scd2_and_cdc_spark_match_models(spark, changelog, cdc_ops):
    from pyspark.sql import functions as F
    from shacl_rust_spark.ops.olap import cdc_apply, scd2_intervals

    rows = [(k, a, t, i) for i, (k, a, t) in enumerate(changelog)]
    df = spark.createDataFrame(rows, ["k", "attr", "t", "tb"]) \
        .withColumn("ts", F.timestamp_seconds("t"))
    got = set()
    for r in scd2_intervals(df, "k", "attr", "ts", "tb").collect():
        to = (None if str(r.valid_to).startswith("9999")
              else int(r.valid_to.timestamp()))
        got.add((r.key, r.version, r.attr,
                 int(r.valid_from.timestamp()), to, r.is_current,
                 r.n_rows))
    assert got == _model_scd2(rows)

    base = [(1, 100), (2, 200), (3, 300)]
    chg = [(k, v, op, i) for i, (k, v, op) in enumerate(cdc_ops)]
    bdf = spark.createDataFrame(base, ["key", "val"])
    if chg:
        cdf = spark.createDataFrame(chg, ["key", "val", "op", "seq"])
        got_c = {(r.key, r.val, r.src)
                 for r in cdc_apply(bdf, cdf,
                                    seq_cols=("seq",)).collect()}
        assert got_c == _model_cdc(base, chg)


# --- round-3 late batch: squares / markov / conductance models -----------

def _canon_edges(edges):
    es = set()
    for a, b in edges:
        a, b = f"n{a}", f"n{b}"
        if a != b:
            es.add((min(a, b), max(a, b)))
    return es


def _square_pairs_model(edges, min_common=2):
    """Common-neighbor formula model of ops/graph.square_pairs."""
    from itertools import combinations

    es = _canon_edges(edges)
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for u, w in combinations(sorted(adj), 2):
        c = len(adj[u] & adj[w])
        if c >= min_common:
            out[(u, w)] = (c, c * (c - 1) // 2)
    return out


def _c4_enumerate(edges):
    """INDEPENDENT brute-force count of distinct 4-cycles: for every
    4-vertex subset, test each of the 3 diagonal splittings for the
    cycle's 4 boundary edges."""
    from itertools import combinations

    es = _canon_edges(edges)
    nodes = sorted({n for e in es for n in e})
    cnt = 0
    for a, b, c, d in combinations(nodes, 4):
        for (p1, p2), (q1, q2) in [((a, c), (b, d)), ((a, b), (c, d)),
                                   ((a, d), (b, c))]:
            ring = [(p1, q1), (q1, p2), (p2, q2), (q2, p1)]
            if all(tuple(sorted(x)) in es for x in ring):
                cnt += 1
    return cnt


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                max_size=24))
def test_square_formula_equals_enumeration(edges):
    """Σ C(c_uw, 2) over all pairs counts every 4-cycle exactly twice
    (once per diagonal) — the identity square_pairs relies on, checked
    against independent subset enumeration on arbitrary small graphs."""
    pairs = _square_pairs_model(edges)
    assert sum(v[1] for v in pairs.values()) == 2 * _c4_enumerate(edges)


def _markov_model(trans, iters, scale):
    from collections import defaultdict

    agg = defaultdict(int)
    for s, d, n in trans:
        if n > 0:
            agg[(f"s{s}", f"s{d}")] += n
    states = sorted({s for s, _ in agg} | {d for _, d in agg})
    if not states:
        return {}
    rowtot = defaultdict(int)
    for (s, _d), n in agg.items():
        rowtot[s] += n
    x = {t: scale // len(states) for t in states}
    for _ in range(iters):
        nx = {t: 0 for t in states}
        for (s, d), n in agg.items():
            nx[d] += (x[s] * n) // rowtot[s]
        x = nx
    return x


def _conductance_model(edges, labels):
    es = _canon_edges(edges)
    lab = {f"n{n}": c for n, c in labels}
    sided = [(a, b) for a, b in es if a in lab and b in lab]
    out = {}
    m2 = 2 * len(sided)
    for a, b in sided:
        for node in (a, b):
            c = lab[node]
            st = out.setdefault(c, {"nodes": set(), "vol": 0, "cut": 0})
            st["nodes"].add(node)
            st["vol"] += 1
        if lab[a] != lab[b]:
            out[lab[a]]["cut"] += 1
            out[lab[b]]["cut"] += 1
    return {
        c: (len(s["nodes"]), s["vol"], s["cut"],
            min(s["vol"], m2 - s["vol"]))
        for c, s in out.items()
    }


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                max_size=18),
       st.lists(st.tuples(st.integers(0, 4), st.integers(0, 4),
                          st.integers(1, 5)), max_size=12),
       st.lists(st.tuples(st.integers(0, 6), st.integers(0, 2)),
                max_size=10))
def test_squares_markov_conductance_match_models(spark, edges, trans,
                                                 labelled):
    from shacl_rust_spark.ops import graph

    if edges:
        df = spark.createDataFrame(
            [(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
        got = {(r.u, r.w): (r.n_common, r.c4_pairs)
               for r in graph.square_pairs(df).collect()}
        assert got == _square_pairs_model(edges)

        labels = {f"n{n}": f"c{c}" for n, c in labelled}
        if labels:
            ldf = spark.createDataFrame(
                sorted(labels.items()), ["node", "community"])
            gotc = {r.community: (r.n_nodes, r.volume, r.cut, r.denom)
                    for r in graph.conductance(df, ldf).collect()}
            want = _conductance_model(
                edges, [(n, f"c{c}") for n, c in labelled])
            # model keys carry community names already prefixed
            want = {c: v for c, v in want.items()}
            assert gotc == want

    if trans:
        tdf = spark.createDataFrame(
            [(f"s{s}", f"s{d}", n) for s, d, n in trans],
            "src string, dst string, n long")
        gotm = {r.state: r.mass_scaled
                for r in graph.markov_stationary(
                    tdf, iterations=3, scale=10**6).collect()}
        assert gotm == _markov_model(trans, 3, 10**6)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=40))
def test_cusum_prefix_identity(steps):
    """The window form ops/events.cusum_alarms evaluates —
    s_t = p_t − min(0, min_{i≤t} p_i) — equals the textbook
    recurrence s_t = max(0, s_{t-1} + x_t) on arbitrary step series."""
    s = 0
    rec = []
    for x in steps:
        s = max(0, s + x)
        rec.append(s)
    # pmin tracks min over prefix INCLUDING the current row, exactly
    # like the window's ROWS UNBOUNDED PRECEDING min
    p, pmin, idn = 0, 0, []
    for x in steps:
        p += x
        pmin = min(pmin, p)
        idn.append(p - min(0, pmin))
    assert idn == rec
