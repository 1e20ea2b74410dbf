"""Edge-case guards: empty inputs, degenerate documents, and boundary
rows through the operators most likely to break on them. Cheap tests
that pin behaviors the big parametrized suites never hit."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_connectors_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    simhash,
    with_shingles,
)
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.writer import translate_changelog

DOCS_SCHEMA = "doc_id bigint, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_empty_corpus_through_dedup(spark):
    empty = _docs(spark, [])
    assert exact_dedup(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash(empty).count() == 0


def test_short_docs_dropped_from_shingles_not_exact(spark):
    docs = _docs(
        spark, [(1, "one two"), (2, "one two three four"), (3, "x")]
    )
    # < 3 words -> no 3-shingles -> excluded from the LSH pipeline
    assert sorted(
        r["doc_id"] for r in with_shingles(docs).collect()
    ) == [2]
    # ...but exact dedup still sees every doc
    assert exact_dedup(docs).agg(F.sum("n_copies")).first()[0] == 3


def test_whitespace_normalization_collapses_duplicates(spark):
    docs = _docs(
        spark,
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO  WORLD ")],
    )
    out = exact_dedup(docs).collect()
    assert len(out) == 1
    assert out[0]["n_copies"] == 3 and out[0]["keep_id"] == 1


def test_connected_components_empty_and_selfless(spark):
    empty = spark.createDataFrame([], "d1 bigint, d2 bigint")
    assert connected_components(empty).count() == 0


def test_translate_changelog_empty_batch(spark):
    df = spark.createDataFrame([], "op string, k int, v int, ver int")
    opts = SinkOptions(
        url="parquet://x", table_name="t", write_mode="replacing",
        primary_key=("k",),
    )
    out = translate_changelog(df, opts)
    assert out.count() == 0
    assert "deleted" in out.columns and "op" not in out.columns


def test_insert_only_without_op_column_passthrough(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    opts = SinkOptions(url="parquet://x", table_name="t")
    out = translate_changelog(df, opts)
    assert out.collect() == df.collect()


def test_minhash_lsh_recall_on_constructed_near_dups(spark):
    """LSH banding math check: 10 constructed near-dup pairs
    (~0.85 shingle Jaccard, disjoint vocabularies between pairs).
    Detection probability per pair is 1-(1-s^2)^4 ~ 0.99, and the
    md5-based pipeline is fully deterministic, so requiring >=8/10
    leaves margin only for the construction, not for flakiness. No
    cross-pair matches may appear (vocabularies are disjoint)."""
    rows = []
    for i in range(10):
        words = [f"w{i}_{j}" for j in range(40)]
        near = words[:-1] + [f"w{i}_alt"]
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(near)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    found = {(r["d1"], r["d2"]) for r in pairs}
    expected = {(2 * i, 2 * i + 1) for i in range(10)}
    assert found <= expected, f"false positives: {found - expected}"
    assert len(found) >= 8, f"recall too low: {sorted(found)}"
    assert all(r["jac"] >= 0.5 for r in pairs)


def test_observed_null_rate_single_pass(spark):
    from flink_connectors_spark.observability import observed_null_rate

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c"), (None, "d")], "k int, v string"
    )
    out, obs = observed_null_rate(df, "k")
    n = out.filter(F.col("v") != "zzz").count()  # one action, metrics ride along
    assert n == 4
    m = obs.get
    assert m["n_rows"] == 4 and m["n_null_keys"] == 2


def test_rplsh_finds_cosine_identical_vectors(spark):
    """Sign-LSH invariant: vectors that are positive scalar multiples
    of each other have identical sign bits on every hyperplane, so
    they MUST share all band keys and be returned as each other's top
    neighbor with score 1.0 (cosine is scale-invariant). Orthogonal
    basis-vector rows exist as distractors."""
    from flink_connectors_spark.operators.similarity import cosine_topk_rplsh

    dim = 64
    base = [(i % 7) - 3.0 + 0.1 * i for i in range(dim)]
    rows = [(0, base), (1, [2.5 * x for x in base])]
    for i in range(2, 12):
        rows.append((i, [1.0 if d == (i * 5) % dim else 0.0 for d in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = cosine_topk_rplsh(emb.filter("vec_id < 2"), emb, k=3, dim=dim)
    top = {r["query_id"]: r["neighbor_id"] for r in out.collect() if r["rnk"] == 1}
    scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in out.collect()
        if r["rnk"] == 1
    }
    assert top == {0: 1, 1: 0}, top
    assert scores[(0, 1)] == 1.0 and scores[(1, 0)] == 1.0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches localCheckpoint -> reliable checkpoint:
    results identical, and RDD checkpoint files actually land in the
    directory (the property that makes a multi-hour 100 TB run
    survive executor loss)."""
    import os

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "d1 int, d2 int"
    )
    ckpt = str(tmp_path / "cc_ckpt")
    out = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert out == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    written = [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(ckpt)
        for f in fns
    ]
    assert written, "no reliable checkpoint files were written"


def test_synthesized_media_is_real_format():
    """The multimodal payloads are genuine file formats, not fakes:
    the stdlib `wave` module must open the WAV and agree with our
    parser; the BMP header must satisfy the v3 spec invariants."""
    import io
    import wave

    from flink_connectors_spark.operators.multimodal import (
        _make_bmp,
        _make_wav,
        _parse_media,
    )

    wav = _make_wav(sample_rate=16000, n_samples=100, doc_id=7)
    with wave.open(io.BytesIO(wav)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 100
    parsed = _parse_media(wav)
    assert parsed["sample_rate"] == 16000 and parsed["n_samples"] == 100
    assert parsed["payload_checksum"] == sum(wav[44:])

    bmp = _make_bmp(width=10, height=3, doc_id=4)
    assert bmp[:2] == b"BM"
    import struct as st

    assert st.unpack_from("<I", bmp, 2)[0] == len(bmp)  # declared size
    p = _parse_media(bmp)
    assert (p["width"], p["height"], p["bits_per_pixel"]) == (10, 3, 24)
    # stride padded to 4: 10*3=30 -> 32 bytes per row
    assert len(bmp) == 54 + 32 * 3


def test_zero_vector_does_not_crash_similarity(spark):
    """ANSI mode (Spark 4 default) turns double/0.0 into a runtime
    DIVIDE_BY_ZERO error; a single all-zero embedding must not kill a
    similarity job — zero vectors score NULL and fall out of top-k."""
    from flink_connectors_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.0, 0.0]),  # zero vector
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = cosine_topk_bruteforce(emb, emb, k=2)
    got = {(r.query_id, r.neighbor_id): r.score for r in out.collect()}
    # zero-vector pairs carry NULL scores but the job completes
    assert (2, 0) in got or (0, 2) in got
    assert all(
        s is None for (q, n), s in got.items() if 2 in (q, n)
    ) or any(s is None for s in got.values())


def test_new_qa_operators_null_behavior(spark):
    """Pin the documented null semantics of the r3 QA operators: null
    text/vector/key rows propagate as SQL nulls (no crash, no silent
    skip) so upstream integrity gates can find them."""
    from flink_connectors_spark.operators.sampling import (
        global_shuffle_order,
    )
    from flink_connectors_spark.operators.similarity import norm_audit
    from flink_connectors_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b a")], "doc_id long, text string"
    )
    ent = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert ent[1]["entropy_bits"] is None  # null text -> null row
    assert ent[2]["n_tokens"] == 1  # "" tokenizes to [""]
    assert abs(ent[3]["entropy_bits"] - 0.918296) < 1e-6

    g = spark.createDataFrame([(None,), (5,)], "doc_id long")
    rows = {r["doc_id"]: r for r in global_shuffle_order(g, "doc_id", 4).collect()}
    assert rows[None]["shard"] is None  # documented hazard: null shard
    assert 0 <= rows[5]["shard"] < 4

    e = spark.createDataFrame(
        [(1, None, 0), (2, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    audit = norm_audit(e).collect()[0]
    assert audit["n_vecs"] == 2
    assert audit["n_null_vec"] == 1, (
        "a null vector must be tallied loudly, not skipped by SUM"
    )
    assert audit["sum_norm_micros"] == 1_000_000
    assert abs(audit["avg_norm"] - 1.0) < 1e-9  # mean over NON-null vecs


def test_audio_frame_energy_agrees_with_stdlib_wave(spark):
    """Independent decode cross-check: stdlib `wave` reads the same
    payload and python recomputes every frame's (sum, energy, peak);
    the numpy path inside audio_frame_energy must agree exactly —
    including the short final frame."""
    import io
    import wave

    from flink_connectors_spark.operators.multimodal import (
        _make_wav,
        audio_frame_energy,
    )

    payload = _make_wav(sample_rate=8000, n_samples=100, doc_id=11)
    with wave.open(io.BytesIO(payload)) as w:
        raw = w.readframes(w.getnframes())
    samples = [
        int.from_bytes(raw[i : i + 2], "little") for i in range(0, len(raw), 2)
    ]
    expect = []
    for fi in range(0, (len(samples) + 63) // 64):
        seg = samples[fi * 64 : (fi + 1) * 64]
        expect.append(
            (11, fi, len(seg), sum(seg), sum(s * s for s in seg), max(seg))
        )
    mm = spark.createDataFrame(
        [(11, bytearray(payload))], "doc_id long, payload binary"
    )
    got = [
        tuple(r)
        for r in audio_frame_energy(mm).orderBy("frame_idx").collect()
    ]
    assert got == expect
    # 100 samples -> frames of 64 + 36: the tail frame is short
    assert got[-1][2] == 36


def test_image_resize_agrees_with_manual_pixel_walk(spark):
    """Independent check of the BMP downsample: python re-slices the
    pixel bytes (stride-aware, padding dropped) and must reproduce
    the operator's checksum — on a width chosen so the stride padding
    is nonzero (w=10 -> 30 data bytes, stride 32)."""
    import struct as st

    from flink_connectors_spark.operators.multimodal import (
        _make_bmp,
        image_resize_nearest,
    )

    payload = _make_bmp(width=10, height=5, doc_id=3)
    data_offset = st.unpack_from("<I", payload, 10)[0]
    stride = (10 * 3 + 3) // 4 * 4
    expect = 0
    for r in range(0, 5, 2):
        row = payload[
            data_offset + r * stride : data_offset + r * stride + 30
        ]
        for c in range(0, 10, 2):
            expect += sum(row[c * 3 : c * 3 + 3])
    mm = spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id long, payload binary"
    )
    got = image_resize_nearest(mm, factor=2).collect()[0]
    assert (
        got["in_width"], got["in_height"], got["out_width"],
        got["out_height"],
    ) == (10, 5, 5, 3)
    assert got["out_checksum"] == expect


def test_source_overlap_degenerate_corpora(spark):
    """One source -> no pairs; empty corpus -> no pairs; disjoint
    vocabularies -> no pairs — for BOTH pair strategies."""
    from flink_connectors_spark.operators.text import source_shingle_overlap

    schema = "doc_id long, source string, text string"
    for strategy in ("combinatoric", "selfjoin"):
        empty = spark.createDataFrame([], schema)
        assert source_shingle_overlap(empty, pair_strategy=strategy).count() == 0
        one = spark.createDataFrame(
            [(1, "s0", "alpha beta gamma delta")], schema
        )
        assert source_shingle_overlap(one, pair_strategy=strategy).count() == 0
        disjoint = spark.createDataFrame(
            [
                (1, "s0", "alpha beta gamma delta"),
                (2, "s1", "one two three four"),
            ],
            schema,
        )
        assert (
            source_shingle_overlap(disjoint, pair_strategy=strategy).count()
            == 0
        )


def test_boilerplate_strip_empty_and_all_boilerplate(spark):
    """A doc whose every trigram is corpus-repeated strips to empty
    text (n_removed == n_tokens); a unique doc keeps everything; an
    empty corpus yields an empty report."""
    from flink_connectors_spark.operators.text import boilerplate_strip

    schema = "doc_id long, text string"
    assert boilerplate_strip(spark.createDataFrame([], schema)).count() == 0

    docs = spark.createDataFrame(
        [
            (1, "copy me exactly please"),
            (2, "copy me exactly please"),
            (3, "totally unique content here"),
        ],
        schema,
    )
    out = {r["doc_id"]: r for r in boilerplate_strip(docs).collect()}
    assert out[1]["n_removed"] == out[1]["n_tokens"]
    assert out[1]["clean_text"] == ""
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "totally unique content here"


def test_unigram_logprob_single_doc_uniform_score(spark):
    """A one-doc corpus of all-distinct tokens: every token has
    c/N = 1/n, so avg_neg_logprob == ln(n) exactly."""
    import math

    from flink_connectors_spark.operators.text import unigram_logprob_score

    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    row = unigram_logprob_score(d).first()
    assert row["n_tokens"] == 4
    assert abs(row["avg_neg_logprob"] - round(math.log(4), 6)) < 1e-9


def test_connected_components_two_phase_convergence_count(spark):
    """A 5-node path graph labels fully in <= max_iters and the
    Observation-based convergence check stops the loop (regression
    guard for the fold-into-pin refactor: a broken n_changed metric
    would either loop to max_iters or stop early with wrong labels)."""
    from flink_connectors_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "d1 long, d2 long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(5)}


def test_pattern_match_skip_past_last_row_semantics(spark):
    """MATCH_RECOGNIZE AFTER MATCH SKIP PAST LAST ROW: matches are
    counted non-overlapping left-to-right, the quantifier is greedy,
    and users with no complete pattern report 0 with an empty
    first_match. Pinned on a hand-built sequence."""
    import datetime as dt

    from flink_connectors_spark.registry import all_specs
    import tempfile, os, shutil

    base = dt.datetime(2024, 1, 1)
    # user 1: s v v p | s c p  -> 2 matches, first 'svvp'
    # user 2: v p s v         -> 0 matches (no terminal p after s)
    # user 3: s p             -> 1 match 'sp'
    events = {
        1: ["signup", "view", "view", "purchase", "signup", "click",
            "purchase"],
        2: ["view", "purchase", "signup", "view"],
        3: ["signup", "purchase"],
    }
    rows = []
    eid = 0
    for uid, seq in events.items():
        for i, et in enumerate(seq):
            rows.append(
                (eid, base + dt.timedelta(minutes=i), uid, et, 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out_dir = tempfile.mkdtemp(prefix="fcs_pattern_fixture_")
    try:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
        got = {
            r["user_id"]: (r["n_matches"], r["first_match"])
            for r in all_specs()["events_pattern_match"]
            .fn(spark, out_dir)
            .collect()
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    assert got[1] == (2, "svvp")
    assert got[2] == (0, "")
    assert got[3] == (1, "sp")


def test_match_recognize_operator_custom_pattern_and_keys(spark):
    """The general operator: composite keys, custom classifier and
    pattern. Sessions alternating a/b: pattern '(ab)+' greedily
    matches the longest run, SKIP PAST LAST ROW counts runs."""
    from flink_connectors_spark.operators.sequence import match_recognize
    from pyspark.sql import functions as F
    import pytest

    rows = [
        # (region, uid, seq_no, kind)
        ("eu", 1, 1, "a"), ("eu", 1, 2, "b"), ("eu", 1, 3, "a"),
        ("eu", 1, 4, "b"), ("eu", 1, 5, "x"), ("eu", 1, 6, "a"),
        ("eu", 1, 7, "b"),
        ("us", 1, 1, "b"), ("us", 1, 2, "a"),
    ]
    df = spark.createDataFrame(
        rows, "region string, uid long, seq_no long, kind string"
    )
    got = {
        (r["region"], r["uid"]): (r["n_events"], r["n_matches"],
                                  r["first_match"])
        for r in match_recognize(
            df,
            key_cols=["region", "uid"],
            order_cols=["seq_no"],
            symbol=F.col("kind"),
            pattern="(ab)+",
        ).collect()
    }
    assert got[("eu", 1)] == (7, 2, "abab")  # greedy run, then 'ab'
    assert got[("us", 1)] == (2, 0, "")
    with pytest.raises(ValueError):
        match_recognize(df, [], ["seq_no"], F.col("kind"), "a")


def test_simhash_lsh_guard_and_equivalence(spark, sf_dir):
    """The pigeonhole guard raises when max_hamming >= n_bands (the
    lossless guarantee would break), and on the real fixture the
    banded path returns row-for-row the exhaustive blocked join."""
    import pytest

    from flink_connectors_spark.operators.dedup import (
        simhash_lsh_pairs,
        simhash_pairs,
    )
    from flink_connectors_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_lsh_pairs(docs, ["lang"], max_hamming=4, n_bands=4)
    banded = sorted(
        map(
            tuple,
            simhash_lsh_pairs(
                docs, ["lang", "source"], max_hamming=3, n_bands=4
            ).collect(),
        )
    )
    exhaustive = sorted(
        map(
            tuple,
            simhash_pairs(
                docs, ["lang", "source"], max_hamming=3
            ).collect(),
        )
    )
    assert banded == exhaustive and banded


def test_pack_firstfit_hand_checked_layout(spark):
    """First-fit greedy semantics pinned on a hand-computed chain:
    docs never split, a doc that would overflow closes the pack
    (wasting the tail), an over-budget doc occupies a pack alone,
    and independent chains pack independently."""
    from flink_connectors_spark.operators.sequence import pack_firstfit

    rows = [
        # chain A: 60+30 fit (90), 20 overflows budget 100 -> pack 1;
        # 150 > budget closes pack 1 -> pack 2 alone; 10 -> pack 3
        ("A", 0, 60), ("A", 1, 30), ("A", 2, 20),
        ("A", 3, 150), ("A", 4, 10),
        # chain B: fresh numbering
        ("B", 10, 100), ("B", 11, 1),
    ]
    df = spark.createDataFrame(
        rows, "chain string, doc_id long, n_tokens long"
    )
    got = {
        (r["chain"], r["doc_id"]): (r["pack_no"], r["fill_after"])
        for r in pack_firstfit(
            df, budget=100, chain_cols=("chain",),
            order_col="doc_id", tokens_col="n_tokens",
        ).collect()
    }
    assert got == {
        ("A", 0): (0, 60),
        ("A", 1): (0, 90),
        ("A", 2): (1, 20),
        ("A", 3): (2, 150),
        ("A", 4): (3, 10),
        ("B", 10): (0, 100),
        ("B", 11): (1, 1),  # 100+1 overflows the exactly-full pack
    }


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """A series of 10 at value 1.00 then 10 at value 9.00 must put
    the changepoint at the boundary row (the last low point, where
    |n*P - i*S| peaks), with the before/after means recovered
    exactly."""
    import datetime as dt

    from flink_connectors_spark.plans.temporal import (
        anomaly_changepoint_cusum,
    )

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 7, "shift",
         1.0 if i < 10 else 9.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    out = tmp_path / "events.parquet"
    df.coalesce(1).write.parquet(str(out.parent / "events.parquet"))
    got = anomaly_changepoint_cusum(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # argmax |C_i| at i=10 (the last low row): C_10 = 20*1000-10*10000
    assert r["n_events"] == 20
    assert r["split_frac"] == 0.5
    assert r["max_abs_cusum"] == abs(20 * 1000 - 10 * 10000)
    assert r["mean_before"] == 1.0
    assert r["mean_after"] == 9.0
    assert r["cp_ts"] == t0 + dt.timedelta(minutes=9)


def test_link_prediction_path_and_square(spark):
    """Hand-checked graphs: path 1-2-3 predicts exactly (1,3) at
    Jaccard 1.0 (sole neighbor shared); square 1-2-3-4-1 predicts
    both diagonals at 1.0 and nothing else (adjacent pairs are
    existing edges, excluded)."""
    from flink_connectors_spark.operators.similarity import (
        link_prediction_jaccard,
    )

    path = spark.createDataFrame(
        [(1, 2), (2, 3)], "id1 bigint, id2 bigint"
    )
    got = {
        (r["id1"], r["id2"]): (r["common_neighbors"], r["jaccard"])
        for r in link_prediction_jaccard(path).collect()
    }
    assert got == {(1, 3): (1, 1.0)}

    square = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "id1 bigint, id2 bigint"
    )
    got = {
        (r["id1"], r["id2"]): (r["common_neighbors"], r["jaccard"])
        for r in link_prediction_jaccard(square).collect()
    }
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def _oracle_rows(sf_dir: str, sql: str):
    import duckdb

    from flink_connectors_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        import os

        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(r[i] for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def test_pmi_pipe_token_pairs_survive(spark, tmp_path):
    """ADVICE r8: text_pmi_cooccurrence encoded pairs as 'w1|w2' and
    split on '|'; a token CONTAINING '|' corrupted pair counts on the
    Spark side only (the oracle pairs array elements directly). The
    struct-keyed rewrite must agree with the oracle on such corpora
    and keep the composite token intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_connectors_spark.registry import all_specs

    docs = ["foo|bar baz qux"] * 6 + ["baz qux foo|bar"] * 5
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["t"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(d) for d in docs], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    spec = all_specs()["text_pmi_cooccurrence"]
    sdf = spec.fn(spark, str(tmp_path))
    scols, srows = _norm(
        list(sdf.columns), [tuple(r) for r in sdf.collect()]
    )
    ocols, orows = _norm(*_oracle_rows(str(tmp_path), spec.oracle))
    assert scols == ocols
    assert srows == orows
    w1s = {r["w1"] for r in sdf.collect()} | {
        r["w2"] for r in sdf.collect()
    }
    assert "foo|bar" in w1s, "composite token must survive intact"


def test_robust_mad_zero_mad_fallback_counts_outliers(spark, tmp_path):
    """ADVICE r8: with >= 50% identical values in a group MAD = 0 and
    the plain modified-z is NULL — every outlier silently uncounted on
    BOTH engines (so the oracle hash still passed). The meanAD
    fallback (Iglewicz-Hoaglin) must now count the planted outlier,
    and Spark must still match the (guarded) oracle bit-for-bit."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_connectors_spark.registry import all_specs

    vals = [1.0] * 10 + [100.0]
    n = len(vals)
    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(minutes=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["const"] * n, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = all_specs()["agg_robust_mad"]
    sdf = spec.fn(spark, str(tmp_path))
    rows = sdf.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["mad_val"] == 0.0
    assert r["n_outliers"] == 1, (
        "meanAD fallback must catch the outlier a zero MAD hides"
    )
    scols, srows = _norm(
        list(sdf.columns), [tuple(x) for x in rows]
    )
    ocols, orows = _norm(*_oracle_rows(str(tmp_path), spec.oracle))
    assert scols == ocols
    assert srows == orows


def test_png_codec_roundtrip_and_guards():
    """The r14 compressed codec: (a) round-trip over sizes that hit
    every filter type (height >= 5 cycles all five predictors) and
    both the i<bpp edge and multi-IDAT reassembly; (b) a corrupted
    chunk fails the CRC check loudly; (c) non-PNG magic and
    unsupported shapes raise instead of guessing."""
    import pytest as _pytest

    from flink_connectors_spark.operators.multimodal import (
        _decode_png,
        _make_png,
    )

    for w, h, did in [(1, 1, 0), (1, 7, 3), (13, 11, 42), (4, 6, 999)]:
        png = _make_png(w, h, did)
        r = _decode_png(png)
        want = sum((i * 7 + did) % 256 for i in range(3 * w * h))
        assert (
            r["width"], r["height"], r["bit_depth"], r["color_type"],
            r["n_raw_bytes"], r["pixel_checksum"],
        ) == (w, h, 8, 2, 3 * w * h, want)

    png = bytearray(_make_png(5, 5, 1))
    png[40] ^= 0xFF  # flip a byte inside the first IDAT body
    with _pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(png))

    with _pytest.raises(NotImplementedError, match="not a PNG"):
        _decode_png(b"GIF89a" + b"\x00" * 20)
