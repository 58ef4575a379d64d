"""Structured-Streaming clicklog + PMI suggestions + spell correction +
next-word suggestion tests."""

import datetime as dt
import json
import math
import os

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _click(session, query, did, action, sec):
    return {
        "session_id": session,
        "query": query,
        "doc_id": did,
        "action": action,
        "ts": (T0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%dT%H:%M:%S.000Z"),
    }


@pytest.fixture(scope="module")
def click_source(tmp_path_factory):
    d = tmp_path_factory.mktemp("clicks_src")
    events = [
        _click("s1", "google", 1, "click", 0),
        _click("s1", "google map", 2, "click", 30),     # pair within 60s
        _click("s1", "salsa", 3, "click", 300),          # gap > 60s: no pair
        _click("s2", "google", 4, "click", 0),
        _click("s2", "google map", 5, "click", 10),      # pair again
        _click("s2", "web search", 6, "click", 40),      # map->web pair
        _click("s3", "google", 7, "click", 0),
        _click("s3", "google", 8, "click", 20),          # same query: no pair
    ]
    with open(os.path.join(d, "part1.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    return str(d)


def test_streaming_ingest_appends_table(spark, click_source, tmp_path):
    from websearchengine_spark.streaming.clicklog import start_click_ingest

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    table = str(tmp_path / "clicks_tbl")
    ckpt = str(tmp_path / "ckpt")
    q = start_click_ingest(spark, click_source, table, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(table)
    assert got.count() == 8
    assert set(got.columns) >= {"session_id", "query", "doc_id", "action", "ts", "dt"}
    # restart with no new data: no duplicates (checkpointed file source)
    q2 = start_click_ingest(spark, click_source, table, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 8


def test_streaming_query_counts(spark, click_source):
    from websearchengine_spark.streaming.clicklog import streaming_query_counts

    agg = streaming_query_counts(spark, click_source)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("qc_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT query, sum(n) AS n FROM qc_test GROUP BY query").collect()
    got = {r["query"]: r["n"] for r in rows}
    assert got["google"] == 4
    assert got["google map"] == 2


def test_pmi_suggestions(spark, click_source):
    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        pmi_suggestions,
        session_query_pairs,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    clicks = spark.read.schema(CLICK_SCHEMA).json(click_source)
    pairs = [(r["q1"], r["q2"]) for r in session_query_pairs(clicks).collect()]
    assert pairs.count(("google", "google map")) == 2
    assert ("google map", "web search") in pairs
    assert ("google map", "salsa") not in pairs  # outside the 60s window
    assert ("google", "google") not in pairs

    sugg = pmi_suggestions(clicks).collect()
    by_q1 = {}
    for r in sugg:
        by_q1.setdefault(r["q1"], []).append((r["q2"], r["pmi"]))
    assert by_q1["google"][0][0] == "google map"
    # pmi formula check: f_pair=2, f(google)=4, f(google map)=2
    want = math.log(2 / (4 * 2) + 1.0)
    assert abs(by_q1["google"][0][1] - want) < 1e-9


@pytest.fixture(scope="module")
def spell_index(spark, corpus_pdf, tmp_path_factory):
    from websearchengine_spark.operators.build import build_index

    root = str(tmp_path_factory.mktemp("spell_idx"))
    pages = spark.createDataFrame(corpus_pdf)
    build_index(spark, pages, root, n_shards=4, n_groups=2, keep_doc_tokens=True)
    return root


def test_spell_correction_finds_real_term(spark, spell_index):
    from websearchengine_spark.operators.spell import correct_query

    # 'gooble' -> 'google' (one substitution; a transposition like
    # 'googel' is Levenshtein distance 2 and correctly NOT matched)
    got = correct_query(spark, spell_index, "gooble", freq_threshold=10, min_hits=1).collect()
    corrected = [r["corrected"] for r in got]
    assert "google" in corrected
    # correct term has first-char match -> distance 0 -> ranked first
    assert got[0]["corrected"] in ("google", "gooble")


def test_spell_correct_word_passes_through(spark, spell_index):
    from websearchengine_spark.operators.spell import correct_query

    got = correct_query(spark, spell_index, "data mining", freq_threshold=10, min_hits=1).collect()
    assert any(r["corrected"] == "data mining" for r in got)
    for r in got:
        assert r["n_hits"] >= 1


def test_spell_min_hits_gate(spark, spell_index):
    from websearchengine_spark.operators.spell import correct_query

    loose = correct_query(spark, spell_index, "google", freq_threshold=10, min_hits=1).count()
    strict = correct_query(
        spark, spell_index, "google", freq_threshold=10, min_hits=10**6
    ).count()
    assert loose >= 1
    assert strict == 0


def test_next_word_suggestions(spark, spell_index, oracle_index):
    from websearchengine_spark.operators.spell import next_word_suggestions

    got = {
        r["next_word"]: r["n"]
        for r in next_word_suggestions(spark, spell_index, "the", top_n=10).collect()
    }
    # mirror: rebuild per-doc position->term maps from the oracle postings
    # and count the token after every occurrence of 'the'
    from collections import Counter

    doc_pos: dict[int, dict[int, str]] = {}
    for term, pl in oracle_index.postings.items():
        for did, positions in pl.items():
            for p in positions:
                doc_pos.setdefault(did, {})[p] = term
    want = Counter()
    for did, positions in oracle_index.postings.get("the", {}).items():
        for p in positions:
            nxt = doc_pos[did].get(p + 1)
            if nxt is not None:
                want[nxt] += 1
    top = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    assert got == top


def test_history_suggestions(spark, click_source):
    from websearchengine_spark.streaming.clicklog import CLICK_SCHEMA, history_suggestions

    clicks = spark.read.schema(CLICK_SCHEMA).json(click_source)
    got = [(r["query"], r["n"]) for r in history_suggestions(clicks, "GOOGLE").collect()]
    assert got[0] == ("google", 4)
    assert ("google map", 2) in got
    assert all("google" in q for q, _ in got)


def test_page_summary_first_50_terms(spark, spell_index, corpus_pdf):
    """/page_summary: first <=50 position-ordered terms of one doc
    (QueryHandler.java:365-376) vs the trivial oracle."""
    from websearchengine_spark.functions.analyze import analyze_text
    from websearchengine_spark.operators.query import page_summary
    from websearchengine_spark.sources.storage import IndexStorage

    store = IndexStorage(spell_index)
    docs = {r["url"]: r["doc_id"] for r in store.read_table(spark, "docs").collect()}
    # oracle: analyzer output of the raw page, truncated at 50
    row = corpus_pdf.iloc[7]
    want_terms = analyze_text(row.get("text") or "")[:50]
    did = docs[row["url"]]

    got = page_summary(spark, spell_index, did, n_terms=50).collect()
    assert [r["term"] for r in got] == want_terms
    assert [r["pos"] for r in got] == list(range(len(want_terms)))

    # a doc with fewer than 50 terms returns them all; bogus id -> empty
    assert page_summary(spark, spell_index, -1).count() == 0


def test_stateful_sessionize_stream(spark, tmp_path):
    """Round 2: custom stateful operator (applyInPandasWithState) —
    event-time session windows close intra-batch on gaps and via
    EventTimeTimeout when the watermark passes last + gap."""
    from websearchengine_spark.streaming.clicklog import sessionize_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = tmp_path / "sess_src"
    d.mkdir()
    file1 = [
        _click("s1", "a", 1, "click", 0),
        _click("s1", "b", 2, "click", 30),
        _click("s1", "c", 3, "click", 300),   # >60s gap: closes (0, 30)
        _click("s2", "a", 4, "click", 0),
        _click("s2", "b", 5, "click", 10),
        _click("s2", "c", 6, "click", 40),
        _click("s3", "a", 7, "click", 0),
        _click("s3", "a", 8, "click", 20),
    ]
    file2 = [  # one hour later: watermark advances, old sessions time out
        _click("s1", "z", 9, "click", 3600),
        _click("s1", "z", 10, "click", 3610),
    ]
    import json as _json

    with open(d / "f1.json", "w") as f:
        for e in file1:
            f.write(_json.dumps(e) + "\n")
    with open(d / "f2.json", "w") as f:
        for e in file2:
            f.write(_json.dumps(e) + "\n")

    sess = sessionize_stream(spark, str(d), gap_sec=60, max_files_per_trigger=1)
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT session_id, session_start, session_end, n_events"
        " FROM sess_test ORDER BY session_id, session_start"
    ).collect()
    got = [
        (
            r["session_id"],
            int(r["session_start"].timestamp() - T0.replace(
                tzinfo=dt.timezone.utc).timestamp()),
            int(r["session_end"].timestamp() - T0.replace(
                tzinfo=dt.timezone.utc).timestamp()),
            r["n_events"],
        )
        for r in rows
    ]
    # closed sessions only; the file-2 session (3600..3610) stays open
    assert got == [
        ("s1", 0, 30, 2),     # closed intra-batch by the 300s event
        ("s1", 300, 300, 1),  # closed when file-2 events arrive (gap)
        ("s2", 0, 40, 3),     # closed by event-time timeout
        ("s3", 0, 20, 2),     # closed by event-time timeout
    ]


def test_stateful_sessionize_non_utc_tz(spark, tmp_path):
    """Round-3 ADVICE fix: with a non-UTC session timezone the UDF's
    naive output timestamps are re-interpreted by Arrow in the SESSION
    tz, so they must be rendered in that tz — a bare UTC render shifts
    session_start/end by the tz offset.  Compare the closed session's
    bounds against the SAME events read as a batch in the SAME session
    tz (equal epochs <=> equal collected datetimes)."""
    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        sessionize_stream,
    )

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        d = tmp_path / "sess_tz_src"
        d.mkdir()
        file1 = [
            _click("s1", "a", 1, "click", 0),
            _click("s1", "b", 2, "click", 30),
        ]
        file2 = [  # one hour later: timeout closes (0, 30)
            _click("s1", "z", 9, "click", 3600),
        ]
        with open(d / "f1.json", "w") as f:
            for e in file1:
                f.write(json.dumps(e) + "\n")
        with open(d / "f2.json", "w") as f:
            for e in file2:
                f.write(json.dumps(e) + "\n")

        sess = sessionize_stream(spark, str(d), gap_sec=60, max_files_per_trigger=1)
        q = (
            sess.writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_tz_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql(
            "SELECT session_start, session_end FROM sess_tz_test"
            " WHERE n_events = 2"
        ).collect()
        assert len(got) == 1
        want = (
            spark.read.schema(CLICK_SCHEMA)
            .json(str(d))
            .filter(F.col("doc_id").isin(1, 2))
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .collect()[0]
        )
        assert got[0]["session_start"] == want["lo"]
        assert got[0]["session_end"] == want["hi"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_spell_assist_persisted_path(spark, spell_index, corpus_pdf):
    """Round-4: the persisted bigram->terms assist table (reference
    utils/AssistantIndexBuilder.java:117-161) gives identical candidates
    and corrections, and the per-query plan scans spell_bigrams with the
    bigram predicate pushed to parquet — NOT the vocabulary."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.spell import (
        SPELL_ASSIST_TABLE,
        build_spell_assist,
        correct_query,
        token_candidates,
    )
    from websearchengine_spark.plans.audit import plan_of
    from websearchengine_spark.sources.storage import IndexStorage

    store = IndexStorage(spell_index)
    assert not store.exists(SPELL_ASSIST_TABLE)
    probes = ("gooble", "data", "searhc", "w")
    derived = {
        t: token_candidates(spark, store, t, freq_threshold=10) for t in probes
    }
    before = [
        tuple(r)
        for r in correct_query(
            spark, spell_index, "gooble", freq_threshold=10, min_hits=1
        ).collect()
    ]

    build_spell_assist(spark, store)
    assert store.exists(SPELL_ASSIST_TABLE)
    for t, want in derived.items():
        assert token_candidates(spark, store, t, freq_threshold=10) == want
    after = [
        tuple(r)
        for r in correct_query(
            spark, spell_index, "gooble", freq_threshold=10, min_hits=1
        ).collect()
    ]
    assert after == before

    # the candidate-pool scan: assist table, bigram filter pushed down
    vb = (
        store.read_table(spark, SPELL_ASSIST_TABLE)
        .filter(F.col("bigram").isin(["go", "oo"]))
        .filter(F.abs(F.col("len") - 6) < 3)
        .filter(F.col("alpha"))
        .select("term", "freq", "bigram")
    )
    p = plan_of(vb, "formatted")
    assert "spell_bigrams" in p, p
    assert "term_stats" not in p, p
    assert "PushedFilters" in p and "bigram" in p.split("PushedFilters", 1)[1], p


def test_build_index_spell_assist_flag(spark, corpus_pdf, tmp_path):
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.spell import SPELL_ASSIST_TABLE
    from websearchengine_spark.sources.storage import IndexStorage

    root = str(tmp_path / "sa_idx")
    pages = spark.createDataFrame(corpus_pdf.iloc[:30])
    build_index(spark, pages, root, n_shards=2, n_groups=1, spell_assist=True)
    store = IndexStorage(root)
    assert store.exists(SPELL_ASSIST_TABLE)
    assert store.read_manifest()["config"]["spell_assist"] is True
    rows = store.read_table(spark, SPELL_ASSIST_TABLE)
    assert {c for c in rows.columns} == {"bigram", "term", "freq", "len", "alpha"}
    # every bigram row really is a substring of its term
    from pyspark.sql import functions as F

    assert rows.filter(~F.col("term").contains(F.col("bigram"))).count() == 0


def test_incremental_suggestion_count_tables(spark, tmp_path):
    """Round-4: querycount/paircount maintained as streaming count
    deltas (LogDBManager.java:18-48 semantics) reproduce the batch
    recompute EXACTLY — including session pairs that straddle a
    micro-batch boundary (the carry state) — and survive compaction and
    batch redelivery."""
    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        apply_suggestion_batch,
        compact_suggestion_counts,
        history_suggestions,
        history_suggestions_from_counts,
        pmi_suggestions,
        pmi_suggestions_from_counts,
        read_pair_counts,
        read_query_counts,
        read_suggest_catalog,
        session_query_pairs,
        start_suggestion_counts,
    )

    # batch 1 ends mid-session: s2's "google map"->"web search" pair
    # straddles the boundary; s4 goes quiet > 60s (carry pruned)
    batches = [
        [
            _click("s1", "google", 1, "click", 0),
            _click("s1", "google map", 2, "click", 30),
            _click("s2", "google", 3, "click", 5),
            _click("s2", "google map", 4, "click", 15),
            _click("s4", "salsa", 9, "click", 0),
        ],
        [
            _click("s2", "web search", 5, "click", 45),   # boundary pair!
            _click("s1", "salsa", 6, "click", 300),       # gap: no pair
            _click("s3", "google", 7, "click", 310),
            _click("s3", "google map", 8, "click", 330),
            _click("s4", "salsa verde", 10, "click", 320),  # >60s: no pair
        ],
    ]
    src = tmp_path / "click_src"
    src.mkdir()
    import time as _t

    for i, evs in enumerate(batches):
        with open(src / f"part{i}.json", "w") as f:
            for e in evs:
                f.write(json.dumps(e) + "\n")
        if i == 0:
            _t.sleep(1.1)  # file-source ordering is mtime @ 1s granularity

    root = str(tmp_path / "suggest")
    q = start_suggestion_counts(
        spark,
        str(src),
        root,
        str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        max_files_per_trigger=1,
    )
    # maxFilesPerTrigger isn't set: availableNow may batch both files —
    # force per-file batching via the option on a second run if needed
    q.awaitTermination(120)
    cat = read_suggest_catalog(root)
    if len(cat["applied_batches"]) < 2:
        # both files landed in one batch; rebuild with explicit batching
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        for i, evs in enumerate(batches):
            bdf = spark.createDataFrame(
                spark.read.schema(CLICK_SCHEMA)
                .json(str(src / f"part{i}.json"))
                .collect(),
                CLICK_SCHEMA,
            )
            apply_suggestion_batch(spark, bdf, i, root)
        cat = read_suggest_catalog(root)
    assert len(cat["applied_batches"]) == 2

    raw = spark.read.schema(CLICK_SCHEMA).json(str(src))
    want_qc = sorted(
        (r["query"], r["n"])
        for r in raw.groupBy("query").agg(F.count("*").alias("n")).collect()
    )
    got_qc = sorted(
        (r["query"], r["n"]) for r in read_query_counts(spark, root).collect()
    )
    assert got_qc == want_qc

    want_pc = sorted(
        (r["q1"], r["q2"], r["n"])
        for r in session_query_pairs(raw)
        .groupBy("q1", "q2")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got_pc = sorted(
        (r["q1"], r["q2"], r["n"])
        for r in read_pair_counts(spark, root).collect()
    )
    assert got_pc == want_pc
    # the boundary pair specifically
    assert ("google map", "web search", 1) in got_pc
    # the pruned-carry non-pair specifically
    assert not any(p[0] == "salsa" and p[1] == "salsa verde" for p in got_pc)

    # suggestion outputs from counts == recompute from the raw log
    want_pmi = sorted(map(tuple, pmi_suggestions(raw).collect()))
    got_pmi = sorted(
        map(
            tuple,
            pmi_suggestions_from_counts(
                read_query_counts(spark, root), read_pair_counts(spark, root)
            ).collect(),
        )
    )
    assert got_pmi == want_pmi
    assert [
        tuple(r)
        for r in history_suggestions_from_counts(
            read_query_counts(spark, root), "goog"
        ).collect()
    ] == [tuple(r) for r in history_suggestions(raw, "goog").collect()]

    # replaying an applied batch is a no-op
    bdf0 = spark.createDataFrame(
        spark.read.schema(CLICK_SCHEMA).json(str(src / "part0.json")).collect(),
        CLICK_SCHEMA,
    )
    apply_suggestion_batch(spark, bdf0, 0, root)
    assert sorted(
        (r["query"], r["n"]) for r in read_query_counts(spark, root).collect()
    ) == want_qc

    # compaction folds deltas, outputs unchanged
    compact_suggestion_counts(spark, root)
    cat = read_suggest_catalog(root)
    assert cat["querycount"] == ["base-0001"]
    assert sorted(
        (r["query"], r["n"]) for r in read_query_counts(spark, root).collect()
    ) == want_qc
    assert sorted(
        (r["q1"], r["q2"], r["n"])
        for r in read_pair_counts(spark, root).collect()
    ) == want_pc


def test_suggestion_carry_tiebreak_same_timestamp(spark, tmp_path):
    """Two same-timestamp clicks in one session at a batch boundary:
    which one the carry keeps — and hence which boundary pair counts —
    must be deterministic AND equal to the full-log batch recompute
    (both windows order by (ts, doc_id), not ts alone)."""
    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        apply_suggestion_batch,
        read_pair_counts,
        session_query_pairs,
    )

    b0 = [
        # identical ts, distinct doc_ids: doc_id is the tie-break
        _click("s1", "alpha", 2, "click", 10),
        _click("s1", "beta", 1, "click", 10),
    ]
    b1 = [_click("s1", "gamma", 3, "click", 40)]
    raw_rows = b0 + b1

    def _df(rows):
        import json as _json

        p = tmp_path / f"b{len(list(tmp_path.iterdir()))}.json"
        p.write_text("".join(_json.dumps(r) + "\n" for r in rows))
        return spark.createDataFrame(
            spark.read.schema(CLICK_SCHEMA).json(str(p)).collect(), CLICK_SCHEMA
        )

    want = sorted(
        (r["q1"], r["q2"], r["n"])
        for r in session_query_pairs(_df(raw_rows))
        .groupBy("q1", "q2")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # full-log order is (ts, doc_id): beta(1) -> alpha(2) -> gamma(3)
    assert want == [("alpha", "gamma", 1), ("beta", "alpha", 1)]

    for trial in range(2):  # determinism across runs
        root = str(tmp_path / f"suggest{trial}")
        apply_suggestion_batch(spark, _df(b0), 0, root)
        apply_suggestion_batch(spark, _df(b1), 1, root)
        got = sorted(
            (r["q1"], r["q2"], r["n"])
            for r in read_pair_counts(spark, root).collect()
        )
        assert got == want


def test_suggestion_batch_all_null_ts_keeps_carry(spark, tmp_path):
    """A non-empty batch whose ts values are all NULL (malformed lines
    under CLICK_SCHEMA) must not raise in the sink; the previous carry
    stays in force so later in-window events still pair."""
    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        apply_suggestion_batch,
        read_pair_counts,
        read_query_counts,
        read_suggest_catalog,
    )

    root = str(tmp_path / "suggest")
    ok = spark.createDataFrame(
        [("s1", "alpha", 1, "click", dt.datetime(2024, 1, 1, 12, 0, 10))],
        CLICK_SCHEMA,
    )
    bad = spark.createDataFrame(
        [("s1", "noise", 2, "click", None)], CLICK_SCHEMA
    )
    ok2 = spark.createDataFrame(
        [("s1", "gamma", 3, "click", dt.datetime(2024, 1, 1, 12, 0, 40))],
        CLICK_SCHEMA,
    )
    apply_suggestion_batch(spark, ok, 0, root)
    carry_before = read_suggest_catalog(root)["carry"]
    apply_suggestion_batch(spark, bad, 1, root)  # must not raise
    cat = read_suggest_catalog(root)
    assert cat["carry"] == carry_before  # old carry preserved
    assert 1 in cat["applied_batches"]
    apply_suggestion_batch(spark, ok2, 2, root)
    pairs = sorted(
        (r["q1"], r["q2"], r["n"])
        for r in read_pair_counts(spark, root).collect()
    )
    # null-ts event never pairs; alpha->gamma still pairs via the carry
    assert pairs == [("alpha", "gamma", 1)]
    qc = dict(
        (r["query"], r["n"]) for r in read_query_counts(spark, root).collect()
    )
    assert qc == {"alpha": 1, "noise": 1, "gamma": 1}


def test_session_pair_gap_uses_fractional_seconds(spark):
    """A pair 60.4s apart must NOT count (the oracle compares epoch()
    fractions; unix_timestamp truncation would admit it)."""
    import datetime as _dt

    from websearchengine_spark.streaming.clicklog import (
        CLICK_SCHEMA,
        session_query_pairs,
    )

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("s1", "a", 1, "c", t0),
        ("s1", "b", 2, "c", t0 + _dt.timedelta(seconds=60, milliseconds=400)),
        ("s2", "a", 3, "c", t0),
        ("s2", "b", 4, "c", t0 + _dt.timedelta(seconds=59, milliseconds=900)),
    ]
    clicks = spark.createDataFrame(rows, CLICK_SCHEMA)
    got = {(r["q1"], r["q2"]) for r in session_query_pairs(clicks).collect()}
    assert got == {("a", "b")}  # only s2's 59.9s pair survives
    # ... and only one occurrence of it
    assert session_query_pairs(clicks).count() == 1
