"""Differential property tests: independent pure-Python models of the
count-min sketch, theta sketch, and stupid-backoff LM semantics run
against randomized inputs and must agree value-for-value with the
Spark operators (the same stance as test_view_model.py for cell
visibility — a second implementation, not just internal consistency).

Randomized with fixed seeds so each Spark comparison stays bounded.
"""

from __future__ import annotations

import hashlib
import math
import random
import re


from tera_spark.operators.sketches import (
    THETA_M,
    cms_heavy_hitters,
    count_min_cells,
    theta_set_ops,
    theta_sketch,
)
from tera_spark.operators.textops import stupid_backoff_nll


def py_h60(s: str) -> int:
    """Driver twin of functions.text.h60 (60-bit md5 prefix)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- count-min ---------------------------------------------------------------

def _cms_model(keys: list[str], d: int, w: int):
    cells: dict = {}
    for key in keys:
        for i in range(d):
            b = py_h60(f"{i}:{key}") % w
            cells[(i, b)] = cells.get((i, b), 0) + 1
    return cells


def test_cms_cells_match_python_model(spark):
    rng = random.Random(42)
    for trial in range(4):
        keys = [f"k{rng.randrange(30)}é" for _ in range(rng.randrange(1, 200))]
        df = spark.createDataFrame([(k,) for k in keys], "user_id string")
        got = {
            (r.r, r.b): r.c
            for r in count_min_cells(df, key_col="user_id", d=3, w=16).collect()
        }
        assert got == _cms_model(keys, 3, 16), trial


def test_cms_estimates_match_python_model(spark):
    rng = random.Random(7)
    keys = [f"u{rng.randrange(25)}" for _ in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "user_id string")
    cells = _cms_model(keys, 4, 16)
    exact: dict = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    got = {
        r.user_id: (r.cms_count, r.exact_count)
        for r in cms_heavy_hitters(df, key_col="user_id", d=4, w=16, top_k=1000).collect()
    }
    for k, cnt in exact.items():
        est = min(cells[(i, py_h60(f"{i}:{k}") % 16)] for i in range(4))
        assert got[k] == (est, cnt), k


# --- theta -------------------------------------------------------------------

def _theta_model(rows: list[tuple[str, str]], k: int):
    by_g: dict = {}
    for g, key in rows:
        by_g.setdefault(g, set()).add(py_h60(key))
    sk = {g: sorted(hs)[:k] for g, hs in by_g.items()}
    th = {g: (hs[k - 1] if len(hs) == k else THETA_M) for g, hs in sk.items()}
    return sk, th


def _theta_pair_model(sk, th, ga, gb):
    theta = min(th[ga], th[gb])
    a = {h for h in sk[ga] if h < theta}
    b = {h for h in sk[gb] if h < theta}
    def est(n):
        return math.floor((float(n) * float(THETA_M)) / float(theta) * 10_000) / 10_000
    return est(len(a)), est(len(b)), est(len(a | b)), est(len(a & b))


def test_theta_set_ops_match_python_model(spark):
    rng = random.Random(11)
    rows = [
        (f"g{rng.randrange(3)}", f"u{rng.randrange(60)}") for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, user_id string")
    sk_df, th_df = theta_sketch(df, key_col="user_id", group_col="g", k=8)
    pairs = spark.createDataFrame([("g0", "g1"), ("g1", "g2")], "ga string, gb string")
    got = {(r.ga, r.gb): (r.est_a, r.est_b, r.est_union, r.est_intersect)
           for r in theta_set_ops(sk_df, th_df, pairs).collect()}
    sk, th = _theta_model(rows, 8)
    for ga, gb in [("g0", "g1"), ("g1", "g2")]:
        assert got[(ga, gb)] == _theta_pair_model(sk, th, ga, gb), (ga, gb)


# --- stupid-backoff LM ---------------------------------------------------------

def _backoff_model(docs: list[tuple[int, str]], backoff: float = 0.4):
    """Pure-Python twin of operators/lm.py (train = even doc ids)."""
    c3: dict = {}
    cb: dict = {}
    c1: dict = {}
    def toks_of(text: str) -> list[str]:
        # engine semantics: split(trim(text), '\\s+') keeps one empty
        # token for empty text (both Spark and DuckDB do)
        return re.split(r"\s+", text.strip())

    for did, text in docs:
        if did % 2 != 0:
            continue
        toks = toks_of(text)
        for i in range(2, len(toks)):
            t = (toks[i - 2], toks[i - 1], toks[i])
            c3[t] = c3.get(t, 0) + 1
        for i in range(1, len(toks)):
            b = (toks[i - 1], toks[i])
            cb[b] = cb.get(b, 0) + 1
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
    cctx: dict = {}
    for (w1, w2, _), c in c3.items():
        cctx[(w1, w2)] = cctx.get((w1, w2), 0) + c
    c1ctx: dict = {}
    for (u1, _), c in cb.items():
        c1ctx[u1] = c1ctx.get(u1, 0) + c
    n_tok = float(sum(c1.values()))
    v_tok = float(len(c1))
    out = {}
    for did, text in docs:
        toks = toks_of(text)
        if len(toks) < 3:
            continue
        total = 0
        cnt = 0
        for i in range(2, len(toks)):
            w1, w2, w3 = toks[i - 2], toks[i - 1], toks[i]
            # float-op order pinned to the operator's expression tree:
            # (b · cb) / c1ctx, not b · (cb / c1ctx)
            if (w1, w2, w3) in c3:
                p = float(c3[(w1, w2, w3)]) / float(cctx[(w1, w2)])
            elif (w2, w3) in cb:
                p = (backoff * float(cb[(w2, w3)])) / float(c1ctx[w2])
            else:
                p = ((backoff * backoff) * float(c1.get(w3, 0) + 1)) / (n_tok + v_tok)
            total += math.floor(-math.log(p) * 1_000_000)
            cnt += 1
        out[did] = (cnt, math.floor(float(total) / cnt))
    return out


def test_backoff_matches_python_model(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_scored, r.avg_nll_micro)
        for r in stupid_backoff_nll(df).collect()
    }
    assert got == _backoff_model(docs)
