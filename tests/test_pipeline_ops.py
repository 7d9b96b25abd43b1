"""Tests for dedup, text stats, similarity, multimodal plumbing — on the
real documents/embeddings testdata plus engineered cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from taxahfe_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from taxahfe_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_cosine_topk,
    train_ivf_centroids,
)
from taxahfe_spark.operators.textstats import (
    contamination_score,
    doc_fingerprint,
    language_id,
    text_stats,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other"), (4, "hello world ")],
        ["doc_id", "text"],
    )
    kept = exact_dedup(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_minhash_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark engines " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sigs = minhash_signatures(df)
    pairs = minhash_lsh_pairs(sigs, threshold=0.5).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found
    kept = minhash_dedup(df, threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["a", "b"]
    )
    cc = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[7] == cc[8] == 7


def test_simhash_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("dog", "dogs", 2)
    far = "unrelated text about query optimizers and shuffles " * 10
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["doc_id", "text"])
    fps = simhash(df)
    pairs = simhash_pairs(fps, max_hamming=6).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    found = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    assert (1, 2) in found
    # docs 1,2: 4 trigrams each, 3 shared -> jaccard 3/5
    assert found[(1, 2)] == pytest.approx(0.6)
    assert not any(3 in k for k in found)


def test_text_stats_and_quality(docs):
    st = text_stats(docs)
    row = st.first()
    assert 0.0 <= row["quality_score"] <= 1.0
    assert st.filter("n_words <= 0").count() == 0
    assert st.count() == docs.count()


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "der Hund ist nicht mit der Katze im Haus"),
            (3, "le chat est dans la maison pour les vacances"),
            (4, "el perro es una mascota en la casa"),
            (5, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_token_counts(docs):
    tc = token_counts(docs)
    row = tc.filter("n_chars > 20").first()
    assert row["n_words"] > 0 and row["n_bpe_units"] >= row["n_words"]


def test_contamination_score_engineered(spark):
    """Hand-checkable leakage fractions: a verbatim copy scores 1.0, a
    half-leaked doc scores its exact distinct-trigram overlap, clean text
    scores 0.0 and still appears in the output."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (2, "the quick brown fox went somewhere else entirely today"),
            (3, "completely clean text with no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in contamination_score(docs, bench, n=3).collect()
    }
    assert got[1]["contamination"] == 1.0
    # doc 2: 9 words -> 7 distinct trigrams, leaked = {"the quick brown",
    # "quick brown fox"} -> 2/7
    assert got[2]["n_ngrams"] == 7 and got[2]["n_matched"] == 2
    assert abs(got[2]["contamination"] - round(2 / 7, 6)) < 1e-9
    assert got[3]["n_matched"] == 0 and got[3]["contamination"] == 0.0


def test_contamination_shuffle_fallback_matches_broadcast(spark):
    """bench_broadcast_max=0 forces the hashed shuffle semi join; values must
    equal the broadcast path exactly (the xxhash64 key is an 1:1 stand-in for
    the gram at test scale)."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox went somewhere else entirely today"),
            (3, "completely clean text with no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    fast = contamination_score(docs, bench, n=3).orderBy("doc_id").collect()
    slow = (
        contamination_score(docs, bench, n=3, bench_broadcast_max=0)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_contamination_empty_docs_emit_no_grams(spark):
    """A zero-word doc must get NO output row, and an empty benchmark doc
    must not make every empty training doc score contamination 1.0 via the
    '' gram (ADVICE r5)."""
    bench = spark.createDataFrame(
        [(100, ""), (101, "real benchmark text here")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real benchmark text here")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in contamination_score(docs, bench, n=3).collect()}
    assert 1 not in got and 2 not in got  # no spurious full-leak rows
    assert got[3]["contamination"] == 1.0


def test_ivf_centroids_no_count_sample_path(emb):
    """The default (no n_rows hint) trainer samples via TakeOrdered on
    xxhash64(id) — no corpus.count() job. When the corpus exceeds
    sample_size it must keep exactly sample_size content-keyed rows and stay
    layout-invariant; the n_rows-hint path must keep working too."""
    C1 = train_ivf_centroids(emb, 4, seed=3, sample_size=50)
    C2 = train_ivf_centroids(emb.repartition(5), 4, seed=3, sample_size=50)
    np.testing.assert_array_equal(C1, C2)
    # hint path: small corpus short-circuits to the full frame
    n = emb.count()
    C3 = train_ivf_centroids(emb, 4, seed=3, n_rows=n)
    C4 = train_ivf_centroids(emb, 4, seed=3, n_rows=n, sample_size=10**9)
    np.testing.assert_array_equal(C3, C4)


def test_doc_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"), (3, "x y z w v u t s r q")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: tuple(r["fingerprint"]) for r in doc_fingerprint(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_cosine_topk_vs_numpy(emb):
    queries = emb.filter("vec_id < 3")
    got = cosine_topk(queries, emb, k=5).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for qid in [0, 1, 2]:
        qv = mat[ids == qid][0]
        cos = mat @ qv / (norms * np.linalg.norm(qv) + 1e-300)
        order = [
            int(ids[i])
            for i in sorted(range(len(ids)), key=lambda i: (-round(cos[i], 8), ids[i]))
            if ids[i] != qid
        ][:5]
        gq = got[got["query_id"] == qid].sort_values("rank")["match_id"].tolist()
        assert gq == order


def test_ivf_exhaustive_probe_equals_brute_force(emb):
    """nprobe == n_centroids scores every (query, row) pair exactly once —
    the IVF machinery must be bit-identical to the exact baseline
    (assignment, probe lists, local top-k pruning all exercised)."""
    queries = emb.filter("vec_id < 10")
    exact = (
        cosine_topk(queries, emb, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ivf = (
        ivf_topk(queries, emb, k=5, n_centroids=6, nprobe=6, seed=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert exact["match_id"].tolist() == ivf["match_id"].tolist()
    np.testing.assert_allclose(
        exact["cosine"].to_numpy(), ivf["cosine"].to_numpy(), rtol=0, atol=0
    )


def test_ivf_centroids_deterministic_and_unit_norm(emb):
    C1 = train_ivf_centroids(emb, 8, seed=11)
    C2 = train_ivf_centroids(emb, 8, seed=11)
    np.testing.assert_array_equal(C1, C2)
    np.testing.assert_allclose(np.linalg.norm(C1, axis=1), 1.0, rtol=1e-9)
    # and layout-invariant: a repartitioned corpus trains the same quantizer
    C3 = train_ivf_centroids(emb.repartition(7), 8, seed=11)
    np.testing.assert_array_equal(C1, C3)


def test_ivf_recall_on_clustered_corpus(spark):
    """nprobe < n_centroids must still recall neighbors that live in the
    query's own cluster — the semantics the pruning is allowed to keep."""
    rng = np.random.default_rng(17)
    dim, per = 16, 40
    centers = rng.normal(0, 1, (5, dim))
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per):
            v = c + rng.normal(0, 0.08, dim)
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32).tolist(), ci))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, cluster int")
    queries = df.filter("vec_id % 40 = 0")  # one query per cluster
    exact = cosine_topk(queries, df, k=10).toPandas()
    approx = ivf_topk(
        queries, df, k=10, n_centroids=5, nprobe=2, seed=17
    ).toPandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["match_id"])
        a = set(approx[approx["query_id"] == qid]["match_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9  # tight clusters: own-list probing recalls


def test_lsh_topk_finds_planted_neighbors(spark, emb):
    # LSH recalls STRONG neighbors; plant a near-duplicate (cos ~0.99) of
    # each query into the corpus and require the approximate path to find it
    pdf = emb.toPandas()
    rng = np.random.default_rng(5)
    q = pdf[pdf["vec_id"] < 10]
    planted = []
    for _, r in q.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        twin = v + rng.normal(0, 0.02 * np.linalg.norm(v) / np.sqrt(len(v)), len(v))
        planted.append((int(r["vec_id"]) + 100000, twin.astype(np.float32).tolist(), 0))
    corpus = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    approx = lsh_cosine_topk(
        emb.filter("vec_id < 10"), corpus, k=3, n_planes=10, n_tables=8
    ).toPandas()
    hits = 0
    for qid in range(10):
        a = set(approx[approx["query_id"] == qid]["match_id"])
        hits += int(qid + 100000 in a)
    assert hits >= 8  # recall>=0.8 on planted strong neighbors


def test_multimodal_real_decoders():
    """The pure-numpy WAV / PPM / BMP / y4m decoders round-trip known
    payloads exactly — decode is REAL for uncompressed container formats."""
    import struct

    import numpy as np

    from taxahfe_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        decode_y4m,
        make_ppm,
        make_wav,
        make_y4m,
    )

    # WAV: a pure 440 Hz sine decodes to the same samples
    rate = 8000
    t = np.arange(2000) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    pcm = (x * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    got, got_rate = decode_wav(wav)
    assert got_rate == rate and got.shape == (2000, 1)
    assert np.allclose(got[:, 0], np.frombuffer(pcm, "<i2") / 32768.0)
    # RMS of a sine is amp/sqrt(2)
    assert abs(np.sqrt((got**2).mean()) - 0.5 / np.sqrt(2)) < 0.01

    # PPM: solid color round-trips bit-exactly
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = 200, 100, 50
    ppm = b"P6\n# comment\n6 4\n255\n" + px.tobytes()
    img = decode_ppm(ppm)
    assert img.shape == (4, 6, 3)
    assert np.allclose(img[0, 0], [200 / 255, 100 / 255, 50 / 255])

    # BMP: 24-bit bottom-up with row padding, BGR order
    w, h = 3, 2
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for r in range(h):  # bottom-up: row 0 in file = bottom image row
        row = bytes([10 + r, 20 + r, 30 + r] * w)  # B,G,R
        rows += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    bmp = header + info + bytes(rows)
    img = decode_bmp(bmp)
    assert img.shape == (2, 3, 3)
    # top image row came from file row 1 (bottom-up), RGB order
    assert np.allclose(img[0, 0] * 255, [31, 21, 11])
    assert np.allclose(img[1, 0] * 255, [30, 20, 10])

    # y4m: constant-luma frames decode to those lumas
    y4m = make_y4m(0, w=8, h=4, frames=3)
    frames, fps = decode_y4m(y4m)
    assert frames.shape == (3, 4, 8) and fps == 25.0
    assert (frames.std(axis=(1, 2)) == 0).all()

    # synthesized fixtures are self-consistent
    decode_wav(make_wav(7))
    decode_ppm(make_ppm(7))


def test_multimodal_plumbing(spark):
    from taxahfe_spark.operators.multimodal import (
        extract_media_features,
        frame_sample_plan,
        synthesize_media,
    )

    media = synthesize_media(spark, n=30)
    feats = extract_media_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["ok"] and len(r["feature"]) == 16 for r in rows)
    # determinism across runs
    again = {r["media_id"]: r["feature"] for r in extract_media_features(media, dim=16).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert first == again
    plan = frame_sample_plan(media, every_ms=5000)
    assert plan.count() > 0
    assert plan.filter("frame_ts_ms < 0").count() == 0


def test_multimodal_unsupported_codec_quarantined(spark):
    """Compressed codecs must produce error rows, never a failed job."""
    from taxahfe_spark.operators.multimodal import MEDIA_SCHEMA, extract_media_features

    rows = [
        ("bad1", "image", bytearray(b"\x89PNG\r\n\x1a\nxxxx"), "image/png", 4, 4, None),
        ("bad2", "audio", bytearray(b"\x00" * 16), "audio/mpeg", None, None, 100),
        ("bad3", "video", None, "video/mp4", None, None, 100),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
    assert not any(r["ok"] for r in got.values())
    assert "PPM" in got["bad1"]["error"] or "BMP" in got["bad1"]["error"]
    assert "null payload" in got["bad3"]["error"]


def test_ann_self_pairs_recall_vs_exact(spark):
    """ann_self_pairs (LSH-bucketed) must find planted near-duplicate pairs
    with precision 1 (exact rescoring) and high recall vs cosine_allpairs."""
    import numpy as np
    from taxahfe_spark.operators.similarity import ann_self_pairs, cosine_allpairs

    rng = np.random.default_rng(8)
    rows = []
    base_vecs = rng.normal(0, 1, (40, 16))
    vid = 0
    for i in range(40):
        v = base_vecs[i] / np.linalg.norm(base_vecs[i])
        rows.append((vid, [float(x) for x in v])); vid += 1
        if i % 4 == 0:  # planted near-dup: tiny perturbation
            w = v + rng.normal(0, 0.01, 16)
            rows.append((vid, [float(x) for x in w])); vid += 1
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = {
        (r["a"], r["b"])
        for r in cosine_allpairs(df, 0.95).collect()
    }
    approx = {
        (r["a"], r["b"])
        for r in ann_self_pairs(df, 0.95, n_planes=8, n_tables=8, seed=1).collect()
    }
    assert approx <= exact  # precision 1 by construction
    assert len(exact) >= 10
    assert len(approx) / len(exact) >= 0.8  # recall with 8 tables


def test_output_and_level_summary_sinks(spark, tmp_path):
    """S3/S4 sinks round-trip: winner matrix CSV and per-depth transposed
    summary CSVs (entity rows x feature cols, metadata joined, zeros for
    implicit-zero entities)."""
    import pandas as pd
    from taxahfe_spark.operators.filters import feature_filter_flags
    from taxahfe_spark.pipeline import (
        winner_feature_matrix,
        write_level_summary_csvs,
        write_output_file,
    )
    from taxahfe_spark.taxonomy import hierarchical_rollup

    rows = [
        ("k__a|p__x", "s1", 3.0),
        ("k__a|p__x", "s2", 1.0),
        ("k__a|p__y", "s1", 2.0),
        # s3 appears in the data but has no p__x/p__y rows via k__b only
        ("k__b|p__z", "s3", 5.0),
    ]
    long = spark.createDataFrame(rows, "clade_name string, entity_id string, value double")
    meta = spark.createDataFrame(
        [("s1", "hi"), ("s2", "lo"), ("s3", "lo")],
        "subject_id string, feature_of_interest string",
    )
    resolved = hierarchical_rollup(long)
    state = (
        feature_filter_flags(resolved, 3, 0.0, 0.0)
        .select("path", "level", "passed_filters")
        .toPandas()
    )
    state["winner"] = state["path"].isin(["k__a|p__x", "k__b|p__z"])
    state["sf_winner"] = False

    mat = winner_feature_matrix(resolved, state, metadata=meta)
    out_dir = str(tmp_path / "out")
    write_output_file(mat, out_dir)
    import glob

    got = pd.read_csv(glob.glob(f"{out_dir}/part*.csv")[0]).sort_values("subject_id")
    assert set(got["subject_id"]) == {"s1", "s2", "s3"}
    # implicit-zero entity s3 present with 0 for the k__a winner
    assert got.set_index("subject_id").loc["s3", "k_a_p_x"] == 0.0

    lv_dir = str(tmp_path / "levels")
    written = write_level_summary_csvs(resolved, state, meta, lv_dir)
    assert len(written) == 2  # levels 1 and 2
    l2 = pd.read_csv(glob.glob(f"{lv_dir}/level_2/part*.csv")[0])
    assert {"k_a_p_x", "k_a_p_y", "k_b_p_z", "feature_of_interest"} <= set(l2.columns)
    assert len(l2) == 3


def test_legacy_v1_and_oudah_sinks(spark, tmp_path):
    """S5/S6/T8/J3: legacy exports match the reference's file shapes
    (lib/tree.R:247-305): v1 = every node wide; oudah = 3 tab files with
    index from 1001, level columns, and a label row ordered by the
    abundance columns."""
    import glob

    import pandas as pd
    from taxahfe_spark.operators.filters import feature_filter_flags
    from taxahfe_spark.pipeline import write_oudah_input, write_v1_input_file
    from taxahfe_spark.taxonomy import hierarchical_rollup

    rows = [
        ("k__a|p__x|s__1", "s1", 3.0), ("k__a|p__x|s__1", "s2", 1.0),
        ("k__a|p__x|s__2", "s1", 2.0), ("k__a|p__y|s__3", "s2", 4.0),
    ]
    long = spark.createDataFrame(rows, "clade_name string, entity_id string, value double")
    meta = spark.createDataFrame(
        [("s1", "hi"), ("s2", "lo")], "subject_id string, feature_of_interest string"
    )
    resolved = hierarchical_rollup(long)
    state = (
        feature_filter_flags(resolved, 2, 0.0, 0.0)
        .select("path", "level", "passed_filters")
        .toPandas()
    )

    v1 = write_v1_input_file(resolved, str(tmp_path))
    got = pd.read_csv(glob.glob(f"{v1}/part*.csv")[0])
    assert list(got.columns) == ["clade_name", "s1", "s2"]
    assert len(got) == 6  # 3 leaves + 2 mid + 1 root-level (all nodes)

    paths = write_oudah_input(resolved, state, meta, str(tmp_path / "oudah"))
    taxa = pd.read_csv(paths["taxa"], sep="\t", header=None)
    otu = pd.read_csv(paths["otu"], sep="\t", header=None)
    lab = open(paths["label"]).read().strip().split("\t")
    assert (taxa[0] >= 1001).all() and (taxa[1] == "k__Bacteria").all()
    assert taxa.shape == (3, 4)  # index + 3 level columns, 3 leaf rows
    assert otu.shape == (3, 3)  # index + 2 entity columns
    assert lab == ["label", "hi", "lo"]


def test_connected_components_long_chain_converges(spark):
    """A duplicate CHAIN much longer than max_iters must still converge:
    pointer shortcutting makes label depth halve per round (O(log diameter)),
    so a 600-node path graph resolves to one cluster well within the default
    10 rounds (pure min-propagation would need 600)."""
    from taxahfe_spark.operators.dedup import connected_components

    n = 600
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    cc = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert len(cc) == n
    assert set(cc.values()) == {0}

def test_connected_components_nonconvergence_raises_and_extend_recovers(spark):
    """Convergence certificate at the boundary: a 300-node chain cannot
    certify convergence in 2 rounds even with shortcutting, so the default
    on_max_iters='raise' must hard-error (a partial labeling would silently
    split one duplicate cluster into many); 'extend' (4x budget = 12 rounds,
    reach 2^11 > 300 plus the certification round) must then converge to
    the single true cluster."""
    import pytest as _pytest

    from taxahfe_spark.operators.dedup import connected_components

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)
    cc = {
        r["id"]: r["cluster"]
        for r in connected_components(
            pairs, max_iters=3, on_max_iters="extend"
        ).collect()
    }
    assert len(cc) == n and set(cc.values()) == {0}


def test_connected_components_random_graphs_match_networkx_free_oracle(spark):
    """Property check on random graphs: labels equal the min id of each true
    component, computed by an independent pure-python union-find oracle."""
    import random

    from taxahfe_spark.operators.dedup import connected_components

    rng = random.Random(7)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(60 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({v for e in edges for v in e})
        expected = {v: find(v) for v in touched}
        # oracle roots are min ids by construction (union to min)
        pairs = spark.createDataFrame(edges, "a long, b long")
        got = {
            r["id"]: r["cluster"] for r in connected_components(pairs).collect()
        }
        assert got == expected, f"trial {trial}"


def test_embedding_dedup_chain_and_singletons(spark):
    """embedding_dedup: a near-dup CHAIN (a~b~c with no direct a~c edge)
    collapses to one component with the min-id keeper; singletons keep
    themselves; every input row appears exactly once in the output."""
    import numpy as np
    from taxahfe_spark.operators.similarity import embedding_dedup

    # chain 0~1~2 by planar rotation: consecutive cosine = cos(0.1) ~ 0.995,
    # ends cosine = cos(0.2) ~ 0.980 — a threshold of 0.99 links ONLY the
    # consecutive pairs, so the 3-node component exists purely via label
    # propagation. 7/9 are orthogonal axes: singletons.
    def planar(theta):
        v = np.zeros(8)
        v[0], v[1] = np.cos(theta), np.sin(theta)
        return [float(x) for x in v]

    e = np.eye(8)
    rows = [
        (0, planar(0.0)),
        (1, planar(0.1)),
        (2, planar(0.2)),
        (7, [float(x) for x in e[2]]),
        (9, [float(x) for x in e[3]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_dedup(df, 0.99).collect()}
    assert set(out) == {0, 1, 2, 7, 9}
    assert [out[i]["rep_id"] for i in (0, 1, 2)] == [0, 0, 0]
    assert [out[i]["keep"] for i in (0, 1, 2)] == [True, False, False]
    for i in (7, 9):
        assert out[i]["rep_id"] == i and out[i]["keep"]


def test_embedding_dedup_lsh_matches_exact_on_planted_dups(spark):
    """The LSH candidate path agrees with the exact path on well-separated
    planted duplicates (high threshold, enough tables for recall 1 here)."""
    import numpy as np
    from taxahfe_spark.operators.similarity import embedding_dedup

    rng = np.random.default_rng(21)
    rows, vid = [], 0
    for i in range(30):
        v = rng.normal(0, 1, 16)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v])); vid += 1
        if i % 5 == 0:
            w = v + rng.normal(0, 0.005, 16)
            w /= np.linalg.norm(w)
            rows.append((vid, [float(x) for x in w])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["vec_id"], r["rep_id"], r["keep"])
        for r in embedding_dedup(df, 0.98, method="exact").collect()
    }
    lsh = {
        (r["vec_id"], r["rep_id"], r["keep"])
        for r in embedding_dedup(
            df, 0.98, method="lsh", n_planes=6, n_tables=10, seed=5
        ).collect()
    }
    assert exact == lsh
    assert sum(1 for _, _, k in exact if not k) == 6  # one dup per planted pair


def test_pii_scrub_redacts_and_counts(spark):
    from taxahfe_spark.operators.textstats import pii_scrub

    rows = [
        (1, "mail me at a.b+c@ex-am.ple.org or b@x.io thanks"),
        (2, "see https://a.example/p?q=1 and http://b.io/x"),
        (3, "call +1 (555) 010-0199 or 555 010 0199 now"),
        (4, "host 10.0.0.7 and 192.168.1.255 up"),
        (5, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 2
    assert "<EMAIL>" in got[1]["text_scrubbed"] and "@" not in got[1]["text_scrubbed"]
    assert got[2]["n_url"] == 2
    assert "https://" not in got[2]["text_scrubbed"]
    assert got[3]["n_phone"] == 2
    assert "555" not in got[3]["text_scrubbed"]
    assert got[4]["n_ipv4"] == 2
    assert "10.0.0.7" not in got[4]["text_scrubbed"]
    assert got[5]["text_scrubbed"] == rows[4][1]
    assert all(got[5][f"n_{k}"] == 0 for k in ("email", "url", "phone", "ipv4"))


def test_gopher_rules_reasons(spark):
    from taxahfe_spark.operators.textstats import gopher_rules

    # mostly-unique words keep dup_word_frac low; "the"/"is" repeats stay
    # under 0.3; word lengths average in the 3..10 band
    long_good = " ".join(
        f"the wordalpha{i} wordbravo{i} wordcharlie{i} worddelta{i} wordecho{i} is"
        for i in range(10)
    )
    rows = [
        (1, long_good),                      # passes everything
        (2, "short text"),                   # too few words (+ too few stopwords)
        (3, "the " + "spam " * 60 + "is a thing"),  # high dup-word fraction
        (4, "the 123 456 789 000 111 222 333 444 555 666 is a " + "x1 " * 40),  # low alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=20).collect()}
    assert got[1]["keep"] and got[1]["reject_reasons"] == []
    assert not got[2]["keep"]
    assert "too_few_words" in got[2]["reject_reasons"]
    assert not got[3]["keep"]
    assert "high_dup_word_frac" in got[3]["reject_reasons"]
    assert not got[4]["keep"]
    assert "low_alpha_ratio" in got[4]["reject_reasons"]


def test_epoch_shuffle_dense_deterministic_and_epoch_varying(spark):
    from taxahfe_spark.tokens import epoch_shuffle

    rows = [(i, "s") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, seed=1, epoch=0).collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, seed=1, epoch=0).collect()}
    c = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(df, seed=1, epoch=1).collect()}
    assert a == b                              # reproducible
    assert sorted(a.values()) == list(range(300))  # dense permutation
    assert a != c                              # epoch changes the order
    # chunked branch (small_n=0) produces the IDENTICAL permutation
    d = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df, seed=1, epoch=0, small_n=0).collect()
    }
    assert d == a


def test_incremental_minhash_dedup(spark):
    """Cross-frame near-dup ingestion: a batch doc near-identical to a
    corpus doc is dropped, fresh content survives, and the precomputed
    corpus_sigs path (the production index shape) gives identical results.
    Within-batch duplicates are intentionally NOT this operator's job."""
    from taxahfe_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy", 1)
    fresh = "completely different content about spark engines " * 8
    corpus = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, near), (2, fresh), (3, base)], ["doc_id", "text"]
    )
    kept = incremental_minhash_dedup(new, corpus, threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2]

    sigs = minhash_signatures(corpus)
    kept2 = incremental_minhash_dedup(new, corpus, threshold=0.5, corpus_sigs=sigs)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2]


def test_gopher_rules_zero_word_doc_matches_duckdb_oracle(spark):
    """ADVICE r6: a punctuation-only (zero-word) document must get the SAME
    filter decision from the Spark operator and the DuckDB oracle. Spark's
    F.aggregate with a 0.0 init yields mean_wl = 0.0 (rule fires); DuckDB's
    list_aggregate([], 'sum') is NULL, which the oracle now coalesces to
    0.0 so the CASE fires identically."""
    import duckdb

    from taxahfe_spark.operators.textstats import gopher_rules

    rows = [
        (1, "!!! ??? ... --- !!!"),  # zero words after tokenization
        (2, "the quick brown " + " ".join(f"fox{i}" for i in range(40)) + " is here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=20).collect()}
    assert not got[1]["keep"]
    assert "too_few_words" in got[1]["reject_reasons"]
    assert "mean_word_len_out_of_range" in got[1]["reject_reasons"]

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, %s)" % (i, "'" + t.replace("'", "''") + "'") for i, t in rows
        )
        + ") AS t(doc_id, text)"
    )
    # the driver oracle uses min_words=40; the operator default compare
    # needs the same threshold, so swap the literal for this fixture
    sql = entry._GOPHER_ORACLE.replace("n_words < 40", "n_words < 20")
    oracle = {
        r[0]: (r[1], set(r[2].split(",")) if r[2] else set())
        for r in con.execute(sql).fetchall()
    }
    for i, _ in rows:
        assert oracle[i][0] == got[i]["keep"], f"keep mismatch doc {i}"
        assert oracle[i][1] == set(got[i]["reject_reasons"]), f"reasons mismatch doc {i}"


def test_incremental_minhash_dedup_keeps_caller_cache(spark):
    """ADVICE r6: a caller-provided corpus_sigs index must stay cached
    after the call — the function may not unpersist storage it does not
    own (that would destroy the cross-batch reuse the parameter exists
    for)."""
    from taxahfe_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    corpus = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    new = spark.createDataFrame([(1, base), (2, "fresh content " * 20)], ["doc_id", "text"])
    sigs = minhash_signatures(corpus).persist()
    sigs.count()
    assert sigs.storageLevel.useMemory
    kept = incremental_minhash_dedup(new, corpus, threshold=0.5, corpus_sigs=sigs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2]
    assert sigs.storageLevel.useMemory, "caller-owned cache was evicted"
    sigs.unpersist()


def test_driver_prefix_parity_with_distributed(spark, sf_dir, monkeypatch):
    """The r8 driver-prefix fast path (Arrow collect + numpy rollup/flags/
    vectors) must produce the exact same competition state and winner
    matrix as the distributed prefix it replaces below the row gate."""
    import pandas as pd

    import __spark_entry__ as em
    from taxahfe_spark.operators.competition import CompetitionParams
    from taxahfe_spark.pipeline import taxa_hfe, winner_feature_matrix

    long, meta = em.supplier_hierarchy(spark, sf_dir)
    params = CompetitionParams(
        lowest_level=1, nperm=2, num_trees=4, seed=7,
        super_filter_nperm_factor=2,
    )
    frames = {}
    for tag, gate in (("driver", "2000000"), ("distributed", "0")):
        monkeypatch.setenv("TAXAHFE_DRIVER_PREFIX_MAX_ROWS", gate)
        resolved, state = taxa_hfe(
            meta, long, params=params, filter_prevalence=0.05
        )
        mat = winner_feature_matrix(resolved, state, metadata=meta).toPandas()
        frames[tag] = (
            state.reset_index(drop=True),
            mat.sort_values("subject_id").reset_index(drop=True)[
                sorted(mat.columns)
            ],
        )
    pd.testing.assert_frame_equal(frames["driver"][0], frames["distributed"][0])
    pd.testing.assert_frame_equal(frames["driver"][1], frames["distributed"][1])


def test_driver_prefix_resolved_content_matches_distributed(spark, sf_dir, monkeypatch):
    """The fast path replaces `resolved` with a driver-reconstructed local
    relation — its rows (incl. explicit zero-sum ancestor pairs and the
    observed flags) must equal the distributed level chain's output."""
    import pandas as pd

    import __spark_entry__ as em
    from taxahfe_spark.operators.competition import CompetitionParams
    from taxahfe_spark.pipeline import taxa_hfe

    long, meta = em.supplier_hierarchy(spark, sf_dir)
    params = CompetitionParams(
        lowest_level=1, nperm=2, num_trees=3, seed=3,
        super_filter_nperm_factor=2,
    )
    frames = {}
    for tag, gate in (("driver", "2000000"), ("distributed", "0")):
        monkeypatch.setenv("TAXAHFE_DRIVER_PREFIX_MAX_ROWS", gate)
        resolved, _ = taxa_hfe(meta, long, params=params, filter_prevalence=0.05)
        pdf = resolved.toPandas()
        pdf["value"] = pdf["value"].round(9)
        frames[tag] = (
            pdf.sort_values(["path", "entity_id"], kind="mergesort")
            .reset_index(drop=True)[sorted(pdf.columns)]
        )
    pd.testing.assert_frame_equal(
        frames["driver"], frames["distributed"], check_dtype=False
    )


def test_driver_prefix_resolved_is_deferred_until_consumed(spark, sf_dir, monkeypatch):
    """r8: the fast path's `resolved` local relation must NOT be serialized
    to the JVM when the caller only reads the _taxahfe_* handles (the two
    declared collapse queries) — and must build transparently, with the
    handles carried over, on first real DataFrame use."""
    import __spark_entry__ as em
    from taxahfe_spark.operators.competition import CompetitionParams
    from taxahfe_spark.pipeline import (
        _DeferredLocalFrame,
        taxa_hfe,
        winner_feature_matrix,
    )

    long, meta = em.supplier_hierarchy(spark, sf_dir)
    params = CompetitionParams(
        lowest_level=1, nperm=2, num_trees=3, seed=3,
        super_filter_nperm_factor=2,
    )
    monkeypatch.setenv("TAXAHFE_DRIVER_PREFIX_MAX_ROWS", "2000000")
    resolved, state = taxa_hfe(meta, long, params=params, filter_prevalence=0.05)
    assert isinstance(resolved, _DeferredLocalFrame)
    assert object.__getattribute__(resolved, "_lazy_df") is None

    # the declared-query consumption pattern: winner matrix from the
    # driver-resident handles only — the local relation must stay unbuilt
    mat = winner_feature_matrix(resolved, state, metadata=meta)
    mat.count()
    assert object.__getattribute__(resolved, "_lazy_df") is None, (
        "winner_feature_matrix materialized the deferred resolved frame"
    )

    # first real DataFrame access builds it, once, with handles attached
    n = resolved.count()
    built = object.__getattribute__(resolved, "_lazy_df")
    assert built is not None and n > 0
    assert getattr(built, "_taxahfe_entities", None) == resolved._taxahfe_entities
    assert resolved.count() == n
    assert object.__getattribute__(resolved, "_lazy_df") is built
