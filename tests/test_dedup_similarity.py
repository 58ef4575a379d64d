"""Dedup, similarity-search, text-stats, and multimodal operator tests."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = []
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "data stream processing with windows and watermarks at scale",
        "completely different text about salsa dancing lessons tonight",
        "a b c d e f g h i j k l m n o p",
    ]
    for i in range(40):
        rows.append((i, base[i % 4] + ("" if i < 20 else f" tail{i}")))
    # exact duplicates: 0,4,8,12,16 share base[0], etc.
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_duplicates(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(docs_with_dups).collect()
    # docs 0..19 form 4 groups of 5 identical texts; 20..39 are unique
    assert len(groups) == 4
    assert sorted(g["n_dups"] for g in groups) == [5, 5, 5, 5]
    all_ids = sorted(i for g in groups for i in g["doc_ids"])
    assert all_ids == list(range(20))


def test_minhash_identical_docs_same_signature(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import minhash_signatures

    sigs = {r["doc_id"]: list(r["mh"]) for r in minhash_signatures(docs_with_dups).collect()}
    assert sigs[0] == sigs[4] == sigs[8]
    assert sigs[1] == sigs[5]
    assert sigs[0] != sigs[1]


def test_minhash_lsh_pairs_finds_near_dups(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_with_dups, threshold=0.99).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # identical docs must be found with estimate 1.0
    assert (0, 4) in got
    assert (1, 5) in got
    for r in pairs:
        if (r["doc_a"], r["doc_b"]) == (0, 4):
            assert r["jaccard_est"] == 1.0
    # doc 2 vs doc 3 (different text) must NOT appear
    assert (2, 3) not in got


def test_simhash_and_pairs(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import simhash, simhash_duplicate_pairs

    s = {r["doc_id"]: r["simhash"] for r in simhash(docs_with_dups).collect()}
    assert s[0] == s[4]
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_duplicate_pairs(docs_with_dups).collect()}
    assert (0, 4) in pairs


def test_token_jaccard_pairs(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import token_jaccard_pairs

    pairs = spark.createDataFrame([(0, 4), (0, 2)], "doc_a long, doc_b long")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in token_jaccard_pairs(docs_with_dups, pairs).collect()}
    assert abs(got[(0, 4)] - 1.0) < 1e-12
    assert (0, 2) not in got or got[(0, 2)] < 0.2


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        v = rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    # vec 49 = exact copy of vec 1 (nearest neighbour by construction)
    rows[49] = (49, rows[1][1])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark, emb_df):
    from websearchengine_spark.operators.similarity import cosine_topk

    q = emb_df.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    top = cosine_topk(emb_df, q, k=3).collect()
    # vec 1 itself and its copy 49 must be the top-2 with cosine 1.0
    assert [r["vec_id"] for r in top[:2]] == [1, 49]
    assert abs(top[0]["cosine"] - 1.0) < 1e-9
    assert abs(top[1]["cosine"] - 1.0) < 1e-9


def test_lsh_bucket_copies_collide(spark, emb_df):
    from websearchengine_spark.operators.similarity import lsh_bucket

    b = {r["vec_id"]: r["bucket"] for r in lsh_bucket(emb_df).collect()}
    assert b[1] == b[49]
    assert len(set(b.values())) > 1  # planes actually partition the space


def test_ivf_matches_brute_force_with_full_probe(spark, emb_df):
    from websearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_build_centroids,
        ivf_topk,
    )

    q = emb_df.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    cents = ivf_build_centroids(emb_df, nlist=4)
    assert len(cents) == 4
    # probing ALL lists must equal brute force exactly
    full = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf_topk(emb_df, cents, q, k=5, nprobe=4).collect()]
    brute = [(r["vec_id"], round(r["cosine"], 9)) for r in cosine_topk(emb_df, q, k=5).collect()]
    assert full == brute
    # nprobe=1 scans fewer vecs but must still find the exact copy
    near = [r["vec_id"] for r in ivf_topk(emb_df, cents, q, k=2, nprobe=1).collect()]
    assert 1 in near or 49 in near


def test_lang_id(spark):
    from websearchengine_spark.operators.textstats import lang_id

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and the dog is in a house"),
            (1, "der hund ist nicht in das haus und die katze"),
            (2, "xyzzy qwerty plugh foobar"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"


def test_quality_scores(spark):
    from websearchengine_spark.operators.textstats import quality_scores

    docs = spark.createDataFrame(
        [
            (0, "a rich and varied document with many distinct informative words here"),
            (1, "spam spam spam spam spam spam spam spam"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert got[0]["quality"] > got[1]["quality"]
    assert got[1]["top_tok_share"] == 1.0
    assert got[0]["ttr"] > got[1]["ttr"]


def test_token_counts(spark):
    from websearchengine_spark.operators.textstats import token_counts

    docs = spark.createDataFrame(
        [(0, "hello world 123 foo-bar")], "doc_id long, text string"
    )
    r = token_counts(docs).collect()[0]
    assert r["ws_tokens"] == 4
    # bpe-ish: hello, world, 123, foo, -, bar
    assert r["bpeish_tokens"] == 6


def test_doc_fingerprints_stable(spark, docs_with_dups):
    from websearchengine_spark.operators.textstats import doc_fingerprints

    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprints(docs_with_dups).collect()}
    assert fp[0] == fp[4]  # identical docs -> identical fingerprints


def test_multimodal_feature_plumbing(spark, docs_with_dups):
    from websearchengine_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        make_assets,
    )

    assets = make_assets(docs_with_dups.limit(9))
    feats = extract_features(assets).collect()
    assert len(feats) == 9
    mods = {r["modality"] for r in feats}
    assert mods == {"image", "audio", "video"}
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        assert r["height"] > 0 and r["width"] > 0
    # deterministic: same payload -> same features
    again = extract_features(assets).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, again))


# --------------------------------------------------------------------------
# SimHash hamming<=k band join (round 2)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def near_docs(spark):
    """Docs designed to land at SMALL simhash hamming distances: a long
    shared base plus one varying token, so signs flip on few bits."""
    base = (
        "data stream processing engines shuffle partition join aggregate "
        "window watermark state checkpoint broadcast skew salt codegen "
        "parquet pushdown prune vectorized arrow batch executor task stage"
    )
    extras = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
              "golf", "hotel", "india", "juliet", "kilo", "lima"]
    rows = [(i, base + " " + extras[i % len(extras)] + (" " + extras[(i * 7) % len(extras)] if i % 3 else ""))
            for i in range(36)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_hamming_pairs(sims: dict, k: int):
    ids = sorted(sims)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sims[a] ^ sims[b]).count("1") <= k:
                out.add((a, b))
    return out


@pytest.mark.parametrize("k", [1, 2, 3])
def test_simhash_hamming_k_matches_brute_force(spark, near_docs, k):
    from websearchengine_spark.operators.dedup import simhash, simhash_duplicate_pairs

    sims = {r["doc_id"]: r["simhash"] for r in simhash(near_docs).collect()}
    want = _brute_hamming_pairs(sims, k)
    got_rows = simhash_duplicate_pairs(near_docs, max_hamming=k).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == want
    # reported hamming is the true popcount of the XOR
    for r in got_rows:
        assert r["hamming"] == bin(sims[r["doc_a"]] ^ sims[r["doc_b"]]).count("1")
    # the fixture must exercise the NON-identical case (hamming in [1, k])
    nonzero = {(a, b) for (a, b) in want if sims[a] != sims[b]}
    assert nonzero, "fixture produced no planted near-pair; test is vacuous"
    assert nonzero <= got


def test_simhash_hamming0_unchanged(spark, docs_with_dups):
    from websearchengine_spark.operators.dedup import simhash_duplicate_pairs

    p0 = {(r["doc_a"], r["doc_b"]) for r in simhash_duplicate_pairs(docs_with_dups).collect()}
    pk = {(r["doc_a"], r["doc_b"]) for r in simhash_duplicate_pairs(docs_with_dups, max_hamming=2).collect()}
    assert p0 <= pk  # banded join is a superset of the exact-key join


# --------------------------------------------------------------------------
# IVF persisted index: partition-pruned probes (round 2)
# --------------------------------------------------------------------------

def test_ivf_indexed_matches_brute_force(spark, emb_df, tmp_path):
    from websearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_build_centroids,
        ivf_topk_indexed,
        ivf_write_index,
    )

    q = emb_df.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    cents = ivf_build_centroids(emb_df, nlist=4)
    path = str(tmp_path / "ivf_idx")
    ivf_write_index(emb_df, cents, path)

    full = [(r["vec_id"], round(r["cosine"], 9))
            for r in ivf_topk_indexed(spark, path, cents, q, k=5, nprobe=4).collect()]
    brute = [(r["vec_id"], round(r["cosine"], 9)) for r in cosine_topk(emb_df, q, k=5).collect()]
    assert full == brute


def test_ivf_probe_is_partition_pruned(spark, emb_df, tmp_path):
    """A probe must touch ONLY the nprobe list_id partitions on disk."""
    from websearchengine_spark.operators.similarity import (
        _probe_lists,
        ivf_build_centroids,
        ivf_write_index,
    )

    q = emb_df.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    cents = ivf_build_centroids(emb_df, nlist=4)
    path = str(tmp_path / "ivf_idx")
    ivf_write_index(emb_df, cents, path)

    probe = _probe_lists(cents, q, nprobe=1)
    assert len(probe) == 1
    pruned = spark.read.parquet(path).filter(F.col("list_id").isin(probe))
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert files, "probe read no files"
    for f in files:
        assert f"list_id={probe[0]}" in f, f"non-probed partition read: {f}"
    # and the physical plan carries the partition filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_multimodal_real_decoder_seam(spark, docs_with_dups):
    """Round 2: prove the real-decoder swap-in point works — inject a
    deterministic 'real' decoder through the extract_features seam and
    verify the executor-side pipeline flows through it."""
    import numpy as np

    from websearchengine_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        make_assets,
    )

    def fake_real_decoder(payload: bytes):
        # constant-size 6x6 solid image whose value is len(payload) % 256
        v = len(payload) % 256
        return np.full((6, 6, 3), v, dtype=np.uint8)

    assets = make_assets(docs_with_dups.limit(6))
    rows = extract_features(assets, image_decoder=fake_real_decoder).collect()
    assert len(rows) == 6
    for r in rows:
        # stub decoder yields 4..7 px sides; the injected one is always 6
        assert (r["height"], r["width"]) == (6, 6), r
        assert len(r["features"]) == FEATURE_DIM
        if r["modality"] in ("image", "audio"):
            # solid image -> all 12 grid-cell channel means equal v/255
            v = r["n_bytes"] % 256
            got = set(round(x, 9) for x in r["features"][:12])
            assert got == {round(v / 255.0, 9)}, r


def test_cosine_near_dup_pairs(spark, emb_df):
    """Embedding-cosine near-dup: the LSH-bucketed path must find the
    planted exact copy (cosine 1.0) and agree with the exhaustive path
    on everything it reports."""
    from websearchengine_spark.operators.similarity import cosine_near_dup_pairs

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(emb_df, threshold=0.9).collect()
    }
    assert (1, 49) in got and abs(got[(1, 49)] - 1.0) < 1e-9
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(emb_df, threshold=0.9, exhaustive=True).collect()
    }
    # bucketed results are a subset of the exhaustive truth (identical
    # cosines), and the planted pair is always recovered
    for k, v in got.items():
        assert k in brute and abs(v - brute[k]) < 1e-9


def test_hot_bucket_cap(spark):
    """Skew guard: a mega-cluster of identical docs must not explode the
    bucket self-join — over-cap buckets are dropped before pairing."""
    from websearchengine_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_duplicate_pairs,
    )

    rows = [(i, "identical spam boilerplate page content here") for i in range(12)]
    rows += [(100, "a genuinely unique document about salsa"),
             (101, "a genuinely unique document about salsa!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped: the 12-doc cluster yields all 66 pairs (plus the planted pair)
    full = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert sum(1 for a, b in full if a < 12 and b < 12) == 66
    # capped at 10: the mega-cluster is dropped, the small pair survives
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10).collect()
    }
    assert not any(a < 12 and b < 12 for a, b in capped)
    assert (100, 101) in capped

    sp = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_duplicate_pairs(docs, max_hamming=2, max_bucket_size=10).collect()
    }
    assert not any(a < 12 and b < 12 for a, b in sp)


def test_hot_bucket_cap_default_on_and_drop_counted(spark):
    """Round-3: the m^2 guard defaults ON for MinHash-LSH only — a shared
    minhash band implies near-identity, so over-cap buckets are true
    mega-clusters.  SimHash bands / sign-LSH buckets are coarse random
    partitions whose size grows with CORPUS size; a default cap there
    would silently empty the result at scale, so it stays opt-in
    (round-3 review finding).  Drops are never silent —
    LAST_BUCKET_DROP_OBS records dropped/total rows via an Observation
    riding the action (no extra job)."""
    import inspect

    from websearchengine_spark.operators import dedup, similarity

    def default_of(fn):
        return inspect.signature(fn).parameters["max_bucket_size"].default

    assert default_of(dedup.minhash_lsh_pairs) == dedup.DEFAULT_MAX_BUCKET_SIZE
    assert default_of(dedup.simhash_duplicate_pairs) is None
    assert default_of(similarity.cosine_near_dup_pairs) is None

    rows = [(i, "identical spam boilerplate page content here") for i in range(12)]
    rows += [(100, "a genuinely unique document about salsa"),
             (101, "a genuinely unique document about salsa!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    dedup.minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10).collect()
    got = dedup.LAST_BUCKET_DROP_OBS["minhash_lsh"].get
    assert got["rows_dropped"] > 0
    assert got["rows_total"] > got["rows_dropped"]

    # cap off (explicit None): no observation recorded for a fresh key
    dedup.LAST_BUCKET_DROP_OBS.clear()
    dedup.minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=None).collect()
    assert "minhash_lsh" not in dedup.LAST_BUCKET_DROP_OBS


def test_ivf_kmeans_recall_on_clustered_corpus(spark, tmp_path):
    """Round-4: the k-means|| coarse quantizer (same ivf_write_index API;
    the residue-class quantizer stays as the deterministic oracle mode)
    reaches recall@10 >= 0.9 vs brute force at nprobe/nlist = 2/8 on a
    clustered corpus, and is deterministic for fixed inputs/seed."""
    import numpy as np

    from websearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_indexed,
        ivf_train_centroids_kmeans,
        ivf_write_index,
    )

    rng = np.random.default_rng(7)
    nlist, dim = 8, 16
    protos = rng.normal(size=(nlist, dim))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        v = protos[i % nlist] + rng.normal(size=dim) * 0.12
        v /= np.linalg.norm(v)
        vecs.append((i, v.tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    cents = ivf_train_centroids_kmeans(emb, nlist=nlist, seed=13)
    assert len(cents) == nlist
    assert cents == ivf_train_centroids_kmeans(emb, nlist=nlist, seed=13)

    path = str(tmp_path / "ivf_km")
    ivf_write_index(emb, cents, path)
    hits = total = 0
    for q in range(0, 40, 4):
        qv = vecs[q][1]
        want = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        got = {
            r["vec_id"]
            for r in ivf_topk_indexed(
                spark, path, cents, qv, k=10, nprobe=2
            ).collect()
        }
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.9, hits / total


def test_duplicate_clusters_label_propagation(spark):
    """Connected components over a pair graph: a 4-chain (transitivity
    failure case — ends never paired directly), a triangle, a 2-cluster,
    all labeled by component-min; convergence raises past max_iter."""
    import pytest

    from websearchengine_spark.operators.dedup import (
        collapse_duplicates,
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain: {1,2,3,4}
            (10, 11), (11, 12), (10, 12),    # triangle: {10,11,12}
            (20, 21),                        # pair: {20,21}
        ],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in collapse_duplicates(docs, duplicate_clusters(pairs)).collect()
    )
    assert kept == [1, 10, 20, 99]  # canonical per cluster + untouched doc

    # a chain needs diameter rounds: max_iter=1 must refuse, not mislabel
    with pytest.raises(ValueError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=1)


def test_dedup_clusters_entry_matches_duckdb_recursive_oracle(spark):
    """The driver-gate mirror for the new entry: Spark label propagation
    == DuckDB recursive-CTE transitive closure at sf0.001."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = [
        (r["doc_id"], r["cluster_id"])
        for r in entry.queries()["dedup_clusters"](spark, sf_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(entry.oracle_sql()["dedup_clusters"]).fetchall()]
    assert got == want and len(got) > 0


def test_lsh_bucket_drops_null_and_empty_vectors(spark):
    """Explode-free lsh_bucket keeps the old (and oracle) semantics:
    null/empty embeddings produce NO row, never bucket 0."""
    from websearchengine_spark.operators.similarity import lsh_bucket

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0, 2.0]), (2, []), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = lsh_bucket(emb).collect()
    assert [r["vec_id"] for r in got] == [1]


def test_ngram_decontaminate(spark):
    """GPT-3-style benchmark decontamination: any shared 8-token window
    flags the training doc; near-miss (7-token overlap) passes."""
    from websearchengine_spark.operators.dedup import ngram_decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            # contains the bench 8-gram "alpha ... theta" verbatim
            (1, "intro words alpha beta gamma delta epsilon zeta eta theta more"),
            # only 7 consecutive tokens shared -> clean
            (2, "alpha beta gamma delta epsilon zeta eta UNRELATED theta"),
            (3, "completely different text with no overlap at all here ok"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    clean, flagged = ngram_decontaminate(docs, bench, n=8)
    assert {r["doc_id"]: r["n_hits"] for r in flagged.collect()} == {1: 1}
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_token_ngrams_short_docs_yield_no_windows(spark):
    """A doc with fewer than n tokens has NO n-gram windows — not a
    sequence(1,0)/slice(_,0,_) crash (round-4 review)."""
    from websearchengine_spark.operators.dedup import (
        ngram_decontaminate,
        token_ngrams,
    )

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "a b c d e f g h extra")],
        "doc_id long, text string",
    )
    got = token_ngrams(docs, n=8).collect()
    assert {r["doc_id"] for r in got} == {3}
    assert len(got) == 2  # 9 tokens -> 2 windows
    # and the full pipeline tolerates the short docs
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    clean, flagged = ngram_decontaminate(docs, bench, n=8)
    assert [r["doc_id"] for r in flagged.collect()] == [3]
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]


def test_ivf_trainers_raise_on_empty_embeddings(spark):
    """Empty input: descriptive ValueError, not IndexError (ADVICE r4)."""
    from websearchengine_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_train_centroids_kmeans,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        ivf_train_centroids_kmeans(empty, nlist=4)
    with pytest.raises(ValueError, match="empty"):
        ivf_build_centroids(empty, nlist=4)


def test_ivf_kmeans_recall_realistic_dim(spark, tmp_path):
    """R5 (verdict item 6): the k-means|| quantizer at realistic shape —
    256-dim, 50k clustered vectors, nlist=64 — reaches recall@10 >= 0.9
    at nprobe=4 vs brute force, with per-pass training wall bounded (the
    trainer runs ~12 full-scan passes: 3 seeding rounds x 2, one weight
    pass, 5 Lloyd refinements — a constant-factor regression in any pass
    shows up directly here)."""
    import time

    from websearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_indexed,
        ivf_train_centroids_kmeans,
        ivf_write_index,
    )
    from websearchengine_spark.sources.corpus import gen_clustered_embeddings

    nlist, dim, n = 64, 256, 50_000
    emb = gen_clustered_embeddings(spark, n, dim=dim, nlist=nlist).persist()
    emb.count()
    try:
        t0 = time.time()
        cents = ivf_train_centroids_kmeans(emb, nlist=nlist, seed=13)
        train_wall = time.time() - t0
        assert len(cents) == nlist
        n_passes = 3 * 2 + 1 + 5
        assert train_wall / n_passes < 15.0, f"{train_wall:.1f}s training"

        path = str(tmp_path / "ivf_km256")
        ivf_write_index(emb, cents, path)
        hits = total = 0
        for q in range(0, 5000, 500):
            qv = (
                emb.filter(F.col("vec_id") == q).collect()[0]["embedding"]
            )
            want = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
            got = {
                r["vec_id"]
                for r in ivf_topk_indexed(
                    spark, path, cents, qv, k=10, nprobe=4
                ).collect()
            }
            hits += len(want & got)
            total += len(want)
        assert hits / total >= 0.9, f"recall@10 = {hits / total:.3f}"
    finally:
        emb.unpersist()


def test_simhash_64bit_matches_python_oracle(spark):
    """sf1-session regression: bits=64 used to (a) crash on the 2^63 bit
    literal and (b) silently zero bits 32..63 (md5 hex is 32 chars).
    Full check vs a pure-Python mirror of the salted-digest construction,
    plus upper-half variability."""
    import hashlib
    from collections import Counter

    from websearchengine_spark.operators.dedup import simhash

    def py_simhash(text, bits=64):
        tf = Counter(t for t in text.lower().split() if t)
        sums = [0] * bits
        for term, n in tf.items():
            digests = {}
            for b in range(bits):
                salt = b // 32
                if salt not in digests:
                    s = term + (f"#s{salt}" if salt else "")
                    digests[salt] = hashlib.md5(s.encode()).hexdigest()
                c = digests[salt][b % 32]
                sums[b] += n if c in "13579bdf" else -n
        v = 0
        for b in range(bits):
            if sums[b] > 0:
                v += (1 << b) if b < 63 else -(1 << 63)
        return v

    rows = [
        (0, "spark window merge table column"),
        (1, "vector stream value data small join"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),  # dup of 2
        (4, "completely different words entirely here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, bits=64).collect()
    }
    want = {i: py_simhash(t) for i, t in rows}
    assert got == want
    assert got[2] == got[3]  # identical docs, identical 64-bit signature
    # upper 32 bits actually vary (the old code zeroed them)
    uppers = {v >> 32 & 0xFFFFFFFF for v in got.values()}
    assert len(uppers) > 1


# --------------------------------------------------------------------------
# Round-5 training-data-pipeline additions: Gopher filters, PII, hash split
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def textstats_docs(spark):
    rows = [
        (0, "the cat sat\nthe cat sat\n- bullet line\nend of story..."),
        (1, "one two one two one two three # # #"),
        (2, ""),
        (3, "single"),
        (4, "a line\nanother line\na line\nmail me at bob.smith+x@mail.example.org "
            "or 192.168.0.1 call +1 555-0100 999 now"),
        (5, "* starred\n* starred\nplain tail here with words flowing onward"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_gopher_stats_known_values(spark, textstats_docs):
    """Hand-checked Gopher repetition/quality features on a fixture that
    exercises every feature (dups, bullets, ellipses, symbols, empties)."""
    from websearchengine_spark.operators.textstats import gopher_stats

    got = {r["doc_id"]: r.asDict() for r in gopher_stats(textstats_docs).collect()}

    d0 = got[0]  # 4 lines, one dup pair; words incl. "-" and "story..."
    assert d0["n_words"] == 12
    assert d0["n_lines"] == 4
    assert d0["dup_line_frac"] == 0.25
    # line chars 11+11+13+15=50, dup occurrence chars 11
    assert d0["dup_line_char_frac"] == 0.22
    # tie at cnt=2 between "cat sat" and "the cat" -> gram asc picks "cat sat"
    # covered chars 2*6=12 over word chars 42
    assert d0["top_2gram_char_frac"] == round(12 / 42, 6)
    assert d0["bullet_line_frac"] == 0.25
    assert d0["ellipsis_line_frac"] == 0.25
    # one '...' occurrence, no '#': 1/12
    assert d0["symbol_word_ratio"] == round(1 / 12, 6)
    assert d0["gopher_pass"] == 0  # < 50 words

    d1 = got[1]  # "one two" x3 dominates; 3 '#' symbols
    # "one two" x3, 6 non-space chars per occurrence, over 26 word chars
    assert d1["top_2gram_char_frac"] == round(3 * 6 / 26, 6)
    assert d1["symbol_word_ratio"] == 0.3
    assert d1["dup_line_frac"] == 0.0

    d2 = got[2]  # empty doc: all zeros, no div-by-zero
    assert d2["n_words"] == 0 and d2["n_lines"] == 0
    assert d2["top_2gram_char_frac"] == 0.0 and d2["gopher_pass"] == 0

    d3 = got[3]  # single word: no 2-grams
    assert d3["top_2gram_char_frac"] == 0.0 and d3["mean_word_len"] == 6.0

    d5 = got[5]  # '* ' bullets counted, dup starred lines
    assert d5["bullet_line_frac"] == round(2 / 3, 6)
    assert d5["dup_line_frac"] == round(1 / 3, 6)


def test_gopher_pass_accepts_clean_long_doc(spark):
    from websearchengine_spark.operators.textstats import gopher_stats

    words = [f"word{i:03d}" for i in range(120)]  # 120 distinct 7-char words
    docs = spark.createDataFrame(
        pd.DataFrame([(0, " ".join(words))], columns=["doc_id", "text"])
    )
    row = gopher_stats(docs).collect()[0]
    assert row["gopher_pass"] == 1
    assert row["n_words"] == 120
    assert row["dup_line_frac"] == 0.0


def test_pii_redact_known_cases(spark, textstats_docs):
    from websearchengine_spark.operators.textstats import pii_redact

    got = {r["doc_id"]: r.asDict() for r in pii_redact(textstats_docs).collect()}
    d4 = got[4]
    assert (d4["n_emails"], d4["n_ipv4"], d4["n_phones"]) == (1, 1, 1)
    assert d4["redacted"] == (
        "a line\nanother line\na line\nmail me at <EMAIL> or <IP> call <PHONE> now"
    )
    # docs without PII are untouched
    assert got[0]["redacted"].startswith("the cat sat")
    assert (got[0]["n_emails"], got[0]["n_ipv4"], got[0]["n_phones"]) == (0, 0, 0)


def test_pii_redact_edge_patterns(spark):
    from websearchengine_spark.operators.textstats import pii_redact

    rows = [
        (0, "two mails a@b.io and c.d+e@f-g.co.uk here"),
        (1, "short digits 123-456 stay"),         # < 9 chars, not a phone
        (2, "ip 1.2.3.4 then 255.255.255.255"),
        (3, "phone +44 20 7946 0958 ok"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in pii_redact(
            spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        ).collect()
    }
    assert got[0]["n_emails"] == 2
    assert got[0]["redacted"] == "two mails <EMAIL> and <EMAIL> here"
    assert got[1]["n_phones"] == 0 and got[1]["redacted"] == rows[1][1]
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_phones"] == 1
    assert got[3]["redacted"] == "phone <PHONE> ok"


def test_pii_redact_matches_duckdb_semantics(spark, textstats_docs):
    """The Java-regex/RE2 compatibility claim, checked: counts AND
    redacted text identical under DuckDB on the same fixture."""
    import duckdb

    from websearchengine_spark.operators.textstats import (
        EMAIL_RE, IPV4_RE, PHONE_RE, pii_redact,
    )

    got = [
        (r["doc_id"], r["n_emails"], r["n_ipv4"], r["n_phones"], r["redacted"])
        for r in pii_redact(textstats_docs).orderBy("doc_id").collect()
    ]
    pdf = textstats_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        f"""
        WITH s1 AS (SELECT doc_id,
              len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
              regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1 FROM documents),
         s2 AS (SELECT doc_id, n_emails,
              len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ipv4,
              regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2 FROM s1),
         s3 AS (SELECT doc_id, n_emails, n_ipv4,
              len(regexp_extract_all(t2, '{PHONE_RE}')) AS n_phones,
              regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS t3 FROM s2)
        SELECT doc_id, n_emails, n_ipv4, n_phones, t3 FROM s3 ORDER BY doc_id
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_hash_split_deterministic_and_stable(spark):
    """bucket == python md5 mirror; split never migrates when docs are
    added (the content-stable-split property the operator exists for)."""
    import hashlib

    from websearchengine_spark.operators.textstats import hash_split

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
    for i in range(200):
        b = int(hashlib.md5(f"0|{i}".encode()).hexdigest()[:8], 16) % 100
        s = "train" if b < 90 else ("val" if b < 95 else "test")
        assert got[i] == (b, s)
    # subset of a larger corpus: identical assignment for shared ids
    got_large = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in hash_split(spark.range(400).withColumnRenamed("id", "doc_id")).collect()
    }
    assert all(got_large[i] == got[i] for i in range(200))
    # all three splits materialize at n=200
    assert {s for _, s in got.values()} == {"train", "val", "test"}

    with pytest.raises(ValueError, match="room for the test split"):
        hash_split(docs, train_pct=99, val_pct=5)


def test_new_textstats_entries_match_duckdb_oracles(spark):
    """Driver-gate mirror for the three round-5 entries at sf0.001."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for key in ("gopher_quality", "pii_redact", "hash_split"):
        got_df = entry.queries()[key](spark, sf_dir)
        want = con.execute(entry.oracle_sql()[key]).fetchdf()
        got = got_df.toPandas()
        assert list(got.columns) == list(want.columns), key
        assert len(got) == len(want) > 0, key
        got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
        want_s = want.sort_values(list(want.columns)).reset_index(drop=True)
        for c in got.columns:
            gv, wv = got_s[c].tolist(), want_s[c].tolist()
            assert gv == wv, f"{key}.{c}: {gv[:5]} != {wv[:5]}"


# Round-5 additions: SemDeDup, boilerplate strip, URL normalization
# --------------------------------------------------------------------------


def test_semantic_dedup_known_clusters(spark):
    """Hand-checked: near-dups within a centroid cluster are dropped
    (keep = smallest id), cross-cluster near-parallel vectors are NOT
    compared, singleton clusters survive."""
    from websearchengine_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),      # near-dup of 0, same cluster
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.995, 0.05]),      # near-dup of 2, same cluster
        (4, [-1.0, 0.0, 0.0]),        # own cluster, singleton
        (5, [0.70710678, 0.70710678, 0.0]),  # cluster 0, far from 0/1
    ]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]
    got = {r["vec_id"]: (r["list_id"], r["keep"])
           for r in semantic_dedup(emb, cents, threshold=0.95).collect()}
    assert got == {0: (0, True), 1: (0, False), 2: (1, True),
                   3: (1, False), 4: (2, True), 5: (0, True)}


def test_semantic_dedup_matches_numpy_oracle(spark):
    """Randomized-fixture check vs a brute-force oracle of the
    documented rule: drop b iff some a<b in b's cluster has
    cos(a,b) >= threshold."""
    from websearchengine_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    cents = rng.randn(4, 8)
    vecs = []
    for i in range(60):
        c = cents[i % 4]
        vecs.append(c + 0.25 * rng.randn(8))
    vecs = np.array(vecs)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": list(range(60)),
                      "embedding": [list(map(float, v)) for v in vecs]})
    )
    thr = 0.97
    got = {r["vec_id"]: (r["list_id"], r["keep"])
           for r in semantic_dedup(
               emb, [list(map(float, c)) for c in cents], threshold=thr
           ).collect()}

    # oracle: argmax dot (first max) then pairwise cosine within cluster
    dots = vecs @ cents.T
    assign = dots.argmax(axis=1)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = norm @ norm.T
    for b in range(60):
        want_keep = not any(
            a < b and assign[a] == assign[b] and cos[a, b] >= thr
            for a in range(60)
        )
        assert got[b] == (int(assign[b]), want_keep), b
    assert 0 < sum(1 for _, k in got.values() if not k) < 60  # non-trivial


def test_semantic_dedup_hot_cluster_cap(spark):
    """A cluster over max_cluster_size is excluded from the self-join:
    all its members stay KEPT (no silent deletion) and the drop is
    observed under LAST_BUCKET_DROP_OBS['semantic_dedup']."""
    from websearchengine_spark.operators import dedup
    from websearchengine_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, 0.0]) for i in range(12)] + [
        (100, [0.0, 1.0]), (101, [0.0, 1.0])]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(
               emb, cents, threshold=0.9, max_cluster_size=10
           ).collect()}
    assert all(got[i] for i in range(12))        # capped cluster: all kept
    assert got[100] and not got[101]             # small cluster still deduped
    obs = dedup.LAST_BUCKET_DROP_OBS["semantic_dedup"].get
    assert obs["rows_dropped"] == 12 and obs["rows_total"] == 14


def test_semantic_dedup_empty_centroids_raises(spark):
    from websearchengine_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[1.0]]})
    )
    with pytest.raises(ValueError, match="centroids"):
        semantic_dedup(emb, [])


def test_boilerplate_lines_and_strip(spark):
    """Corpus-level duplicated lines are detected and stripped; line
    order and empty lines (paragraph breaks) survive; n_removed counts
    instances; an all-boilerplate doc collapses to empty text."""
    from websearchengine_spark.operators.textstats import (
        boilerplate_lines, strip_boilerplate,
    )

    rows = [(i, f"unique line {i}\ncookie banner\n\nbody {i % 3}\ncookie banner")
            for i in range(12)]
    rows.append((12, "cookie banner"))           # all-boilerplate doc
    rows.append((13, ""))                        # empty doc
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    bp = {(r["line"], r["n_docs"])
          for r in boilerplate_lines(docs, min_docs=10).collect()}
    assert bp == {("cookie banner", 13)}        # empty lines never boilerplate

    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in strip_boilerplate(docs, min_docs=10).collect()}
    assert got[0] == ("unique line 0\n\nbody 0", 2)
    assert got[5] == ("unique line 5\n\nbody 2", 2)
    assert got[12] == ("", 1)
    assert got[13] == ("", 0)
    assert len(got) == 14                        # every input doc present


def test_normalize_url_cases(spark):
    from websearchengine_spark.operators.textstats import normalize_url

    cases = [
        # fragment dropped, host+scheme lowered, :80 stripped, utm gone,
        # trailing slash stripped
        ("HTTP://Example.COM:80/a/b/?utm_source=x&id=1#frag",
         "http://example.com/a/b?id=1"),
        ("http://example.com/a/b?id=1", "http://example.com/a/b?id=1"),
        ("https://Example.com:443/", "https://example.com"),
        ("https://example.com", "https://example.com"),
        # param order preserved, path case preserved, non-default port kept
        ("https://example.com:8443/A/B?z=1&a=2", "https://example.com:8443/A/B?z=1&a=2"),
        ("https://example.com/p?fbclid=abc&q=Case&utm_x=1&gclid=g",
         "https://example.com/p?q=Case"),
        # all params tracking -> no '?'
        ("https://example.com/p?utm_source=a&msclkid=b", "https://example.com/p"),
        # utm must be a key prefix, not a substring of a value
        ("https://example.com/p?q=utm_source", "https://example.com/p?q=utm_source"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(cases)), "url": [c[0] for c in cases]})
    )
    got = [r["n"] for r in df.select("i", normalize_url(F.col("url")).alias("n"))
           .orderBy("i").collect()]
    assert got == [c[1] for c in cases]


def test_url_dedup_groups_and_keeper(spark):
    from websearchengine_spark.operators.textstats import url_dedup

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "url": [
            "HTTP://A.com:80/x/#f",
            "http://a.com/x",
            "https://b.com/y?utm_source=1",
            "https://b.com/y",
            "https://c.com/z",
        ],
    }))
    got = {r["norm_url"]: (r["n_docs"], r["keep_doc_id"])
           for r in url_dedup(df).collect()}
    assert got == {"http://a.com/x": (2, 0),
                   "https://b.com/y": (2, 2),
                   "https://c.com/z": (1, 4)}


def test_semantic_dedup_arrow_and_column_paths_agree(spark):
    """The vectorized Arrow pair stage (default) and the SQL-oracle
    column path (round_cos=) are the same operator: identical
    (vec_id, list_id, keep) on a fixture with organic near-dups."""
    from websearchengine_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(11)
    cents = rng.randn(3, 6)
    vecs = [cents[i % 3] + 0.3 * rng.randn(6) for i in range(45)]
    vecs += [vecs[i] for i in range(0, 45, 9)]          # exact copies
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": list(range(len(vecs))),
                      "embedding": [list(map(float, v)) for v in vecs]})
    )
    cl = [list(map(float, c)) for c in cents]
    arrow = {(r["vec_id"], r["list_id"], r["keep"])
             for r in semantic_dedup(emb, cl, threshold=0.95).collect()}
    column = {(r["vec_id"], r["list_id"], r["keep"])
              for r in semantic_dedup(emb, cl, threshold=0.95,
                                      round_cos=9).collect()}
    assert arrow == column
    assert sum(1 for _, _, k in arrow if not k) >= 5   # copies dropped


def test_semantic_dedup_dirty_and_zero_vectors_survive_both_paths(spark):
    """NULL / empty / null-element vectors get list_id NULL + keep=true
    (excluded from the pair stage, never silently deleted); zero-NORM
    vectors are assigned but their NaN/NULL cosines compare false.
    Both the Arrow default and the round_cos oracle path — neither may
    crash (ANSI divide, numpy object arrays) nor drop a clean vector's
    verdict."""
    from websearchengine_spark.operators.similarity import semantic_dedup

    pdf = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4, 5, 6],
        "embedding": [
            [1.0, 0.0],
            [0.999, 0.01],      # near-dup of 0 -> dropped
            None,               # NULL vector
            None,               # second NULL (cogrouped together)
            [],                 # empty vector
            [0.0, 0.0],         # zero-norm
            [1.0, None],        # null element
        ],
    })
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    for kwargs in ({}, {"round_cos": 6, "round_dots": 6}):
        got = {r["vec_id"]: (r["list_id"], r["keep"])
               for r in semantic_dedup(emb, cents, threshold=0.95,
                                       **kwargs).collect()}
        assert len(got) == 7, kwargs
        assert got[0] == (0, True) and got[1] == (0, False), (kwargs, got)
        for vid in (2, 3, 4, 6):
            assert got[vid] == (None, True), (kwargs, vid, got)
        assert got[5][1] is True, (kwargs, got)  # zero-norm kept


def test_url_dedup_null_urls_excluded(spark):
    """NULL urls must not collapse into one bogus duplicate group."""
    from websearchengine_spark.operators.textstats import url_dedup

    df = spark.createDataFrame(
        [(0, "https://a.com/x"), (1, None), (2, None), (3, "https://a.com/x")],
        "doc_id long, url string",
    )
    got = {r["norm_url"]: (r["n_docs"], r["keep_doc_id"])
           for r in url_dedup(df).collect()}
    assert got == {"https://a.com/x": (2, 0)}


def test_scrub_repeated_ngrams_known_fixture(spark):
    """Hand-checked Lee-et-al-style repeated-window scrub: a 5-gram
    shared (case-insensitively) by 4 docs is removed everywhere;
    sub-threshold windows, short docs, and empty docs are untouched; a
    fully-covered doc returns empty text rather than vanishing."""
    from websearchengine_spark.operators.dedup import scrub_repeated_ngrams

    rows = [
        (0, "alpha beta gamma delta THE quick brown fox unique zero tail"),
        (1, "one two the QUICK brown fox unique one xx yy"),
        (2, "prefix2 the quick BROWN fox unique two zz"),
        (3, "short doc"),
        (4, ""),
        (5, "the quick brown fox unique"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in scrub_repeated_ngrams(docs, n=5, min_count=3).collect()}
    assert got[0] == ("alpha beta gamma delta zero tail", 5)
    assert got[1] == ("one two one xx yy", 5)       # original case rebuilt
    assert got[2] == ("prefix2 two zz", 5)
    assert got[3] == ("short doc", 0)               # < n tokens: no windows
    assert got[4] == ("", 0)
    assert got[5] == ("", 5)                        # fully covered, not dropped
    assert len(got) == 6


def test_scrub_repeated_ngrams_matches_python_oracle(spark):
    """Brute-force mirror of the documented rule on a generated corpus
    with overlapping repeated windows (overlap => covered-position
    union, not double-removal)."""
    from websearchengine_spark.operators.dedup import scrub_repeated_ngrams

    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    planted = "p1 p2 p3 p4 p5 p6"              # 3 overlapping 4-windows
    texts = [
        " ".join(rng.choice(vocab) for _ in range(30))
        + (f" {planted}" if d % 3 == 0 else "")
        for d in range(25)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(25), "text": texts})
    )
    n, mc = 4, 3
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in scrub_repeated_ngrams(docs, n=n, min_count=mc).collect()}

    from collections import Counter
    toks = [t.split() for t in texts]
    counts = Counter(
        " ".join(tk[i:i + n]) for tk in toks for i in range(len(tk) - n + 1)
    )
    for d, tk in enumerate(toks):
        cov = set()
        for i in range(len(tk) - n + 1):
            if counts[" ".join(tk[i:i + n])] >= mc:
                cov.update(range(i, i + n))
        want = " ".join(t for i, t in enumerate(tk) if i not in cov)
        assert got[d] == (want, len(cov)), d
    assert any(nr > 0 for _, nr in got.values())    # non-trivial fixture
