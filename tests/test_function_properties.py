"""Property-based tests for the expression-builder functions that
every dedup/similarity oracle depends on. The properties are checked
against independent pure-Python models over Hypothesis-generated
inputs, batched through ONE Spark job per property (per-example Spark
jobs would be prohibitively slow).

These functions are the cross-engine contract surface: if
word_shingles or minhash_value drift from their DuckDB SQL mirrors in
llm_ops, every LSH oracle breaks — so the Python model here is
deliberately written from the *documented semantics*, not from either
implementation.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_connectors_spark.functions import (
    jaccard,
    minhash_value,
    normalize_text,
    raw_word_ngrams,
    tokenize,
    word_shingles,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\td\n 1."),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=24,
)


def _model_tokens(t: str) -> list[str]:
    return re.sub(r"\s+", " ", t.lower()).strip().split(" ")


def _model_shingles(words: list[str], n: int = 3) -> list[str]:
    if len(words) < n:
        return []
    seen, out = set(), []
    for i in range(len(words) - n + 1):
        s = " ".join(words[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@given(texts)
@settings(**_SETTINGS)
def test_tokenize_and_shingles_match_model(spark, ts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ts)], "i int, text string")
    rows = {
        r["i"]: (r["w"], r["sh"], r["raw"])
        for r in df.select(
            "i",
            tokenize(F.col("text")).alias("w"),
            word_shingles(tokenize(F.col("text")), 3).alias("sh"),
            raw_word_ngrams(tokenize(F.col("text")), 3).alias("raw"),
        ).collect()
    }
    for i, t in enumerate(ts):
        w_exp = _model_tokens(t)
        w, sh, raw = rows[i]
        assert list(w) == w_exp, (t, w, w_exp)
        assert list(sh) == _model_shingles(w_exp)
        # raw grams: one per position, order preserved, multiplicity kept
        if len(w_exp) >= 3:
            assert list(raw) == [
                " ".join(w_exp[j : j + 3]) for j in range(len(w_exp) - 2)
            ]
        else:
            assert list(raw) == []


@given(texts)
@settings(**_SETTINGS)
def test_minhash_is_min_of_seeded_md5(spark, ts):
    """minhash_value must equal min(md5(f'{seed}|{shingle}')) — the
    documented portable definition both the Spark side and every
    DuckDB oracle rely on."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ts)], "i int, text string")
    out = {
        r["i"]: r["m"]
        for r in df.select(
            "i",
            minhash_value(
                word_shingles(tokenize(F.col("text")), 3), 3
            ).alias("m"),
        ).collect()
    }
    for i, t in enumerate(ts):
        sh = _model_shingles(_model_tokens(t))
        exp = (
            min(hashlib.md5(f"3|{s}".encode()).hexdigest() for s in sh)
            if sh
            else None
        )
        assert out[i] == exp


@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 5), max_size=6),
            st.lists(st.integers(0, 5), max_size=6),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_jaccard_matches_set_model(spark, pairs):
    df = spark.createDataFrame(
        [(i, list(dict.fromkeys(a)), list(dict.fromkeys(b))) for i, (a, b) in enumerate(pairs)],
        "i int, a array<int>, b array<int>",
    )
    out = {
        r["i"]: r["j"]
        for r in df.select(
            "i", jaccard(F.col("a"), F.col("b")).alias("j")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        sa, sb = set(a), set(b)
        if not sa | sb:
            continue  # empty-union behavior is engine-defined
        exp = len(sa & sb) / len(sa | sb)
        assert out[i] is not None and abs(out[i] - exp) < 1e-9
        assert 0.0 <= out[i] <= 1.0


@given(st.text(alphabet=st.sampled_from("aB \t\nc1."), max_size=60))
@settings(**_SETTINGS)
def test_normalize_text_idempotent(spark, t):
    df = spark.createDataFrame([(t,)], "text string")
    r = df.select(
        normalize_text(F.col("text")).alias("one"),
        normalize_text(normalize_text(F.col("text"))).alias("two"),
    ).collect()[0]
    assert r["one"] == r["two"]


@given(
    pairs=st.lists(
        st.tuples(
            st.lists(st.text(alphabet="abc", min_size=1, max_size=3), max_size=8),
            st.lists(st.text(alphabet="abc", min_size=1, max_size=3), max_size=8),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(**_SETTINGS)
def test_jaccard_distinct_equals_jaccard_on_distinct_arrays(spark, pairs):
    """The union-free identity |A∪B| = |A|+|B|-|A∩B| must give the
    exact double jaccard() computes, for every distinct-element input
    — the contract the dedup verify joins now rely on."""
    from flink_connectors_spark.functions import jaccard_distinct

    rows = [(sorted(set(a)), sorted(set(b))) for a, b in pairs]
    df = spark.createDataFrame(rows, "a array<string>, b array<string>")
    got = df.select(
        jaccard(F.col("a"), F.col("b")).alias("j"),
        jaccard_distinct(F.col("a"), F.col("b")).alias("jd"),
    ).collect()
    for r in got:
        assert r["j"] == r["jd"], (r["j"], r["jd"])


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcde"), min_size=0, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_containment_pairs_match_set_model(spark, docs):
    """containment_pairs vs a pure-Python shingle-set model: same
    pairs, same rounded containment, same smaller-side pick —
    including the short-doc filter (< 3 tokens carry no shingles) and
    ties (equal sizes pick d1)."""
    from flink_connectors_spark.operators.dedup import containment_pairs

    rows = [(i, t, "x", "y") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        (r["d1"], r["d2"]): (r["containment"], r["smaller"])
        for r in containment_pairs(
            df, ["lang", "source"], threshold=0.0
        ).collect()
    }

    def shingles(t):
        ws = _model_tokens(t)
        if len(ws) < 3:
            return None
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    want = {}
    sh = {i: shingles(t) for i, t in enumerate(docs)}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sh[a], sh[b]
            if sa is None or sb is None:
                continue
            c = round(len(sa & sb) / min(len(sa), len(sb)), 6)
            want[(a, b)] = (c, a if len(sa) <= len(sb) else b)
    assert got == want


# ---------------------------------------------------------------------------
# duplicated_spans: Spark plan vs a brute-force Python model
# ---------------------------------------------------------------------------


def _model_spans(docs: dict[int, list[str]], k: int):
    """Reference model: count k-windows over ALL docs, mark positions
    whose window repeats, merge overlapping/adjacent windows into
    maximal spans. Intentionally O(n^2)-naive."""
    from collections import Counter

    wins = {
        i: [" ".join(w[j : j + k]) for j in range(len(w) - k + 1)]
        for i, w in docs.items()
        if len(w) >= k
    }
    cnt = Counter(g for gs in wins.values() for g in gs)
    out = {}
    for i, gs in wins.items():
        pos = [j + 1 for j, g in enumerate(gs) if cnt[g] >= 2]
        if not pos:
            continue
        spans = []
        start = prev = pos[0]
        for p in pos[1:]:
            if p - prev > k:
                spans.append((start, prev))
                start = p
            prev = p
        spans.append((start, prev))
        dup = sum(p2 - p1 + k for p1, p2 in spans)
        n = len(docs[i])
        out[i] = (n, len(spans), dup, round(dup / n, 6))
    return out


@given(texts)
@settings(**_SETTINGS)
def test_duplicated_spans_match_bruteforce_model(spark, ts):
    from flink_connectors_spark.operators.text import duplicated_spans

    k = 2  # small k so short generated docs can actually repeat
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["dup_tokens"],
            r["dup_fraction"],
        )
        for r in duplicated_spans(df, k=k).collect()
    }
    exp = _model_spans({i: _model_tokens(t) for i, t in enumerate(ts)}, k)
    assert got == exp, (ts, got, exp)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=24),
    doc_id=st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=25, deadline=None)
def test_png_codec_roundtrip_property(w, h, doc_id):
    """r14 compressed codec, property form: for ANY image shape and
    seed, decode(encode(...)) recovers the header fields and the
    exact unfiltered pixel checksum — across every predictive filter
    the row count reaches (heights >= 5 cycle all five), the i < bpp
    left-edge cases, and whatever DEFLATE does to the byte stream."""
    from flink_connectors_spark.operators.multimodal import (
        _decode_png,
        _make_png,
    )

    r = _decode_png(_make_png(w, h, doc_id))
    want = sum((i * 7 + doc_id) % 256 for i in range(3 * w * h))
    assert (
        r["width"], r["height"], r["bit_depth"], r["color_type"],
        r["n_raw_bytes"], r["pixel_checksum"],
    ) == (w, h, 8, 2, 3 * w * h, want)
