"""The config-file CLI front door (websearchengine_spark/cli.py) — the
reference's SearchEngine entry surface (--mode=mining|index|serve over a
flat key:value conf, SearchEngine.java:63-219) end-to-end on the fixture
corpus, plus the serve-mode static public/ frontend."""

import os
import urllib.error
import urllib.request

import pytest

from websearchengine_spark.cli import (
    main,
    make_server,
    parse_command_line,
    parse_options,
    signals_path,
)

CONF_TEMPLATE = """\
# engine.conf — reference format (SearchEngine.java:63-96)
corpus_prefix: {corpus}
index_prefix: {index}
log_prefix: {log}
indexer_type: {indexer}
corpus_analyzer_type: pagerank
log_miner_type: numviews
n_shards: 4
n_groups: 2
keep_doc_tokens: true
"""


@pytest.fixture(scope="module")
def cli_env(spark, corpus_pdf, tmp_path_factory):
    """Corpus parquet + pageview log + conf file, the CLI's inputs."""
    base = tmp_path_factory.mktemp("cli")
    corpus = str(base / "pages")
    spark.createDataFrame(corpus_pdf).write.parquet(corpus)
    from websearchengine_spark.sources.corpus import gen_pageview_log_pdf

    log = str(base / "pageviews.log")
    pdf = gen_pageview_log_pdf(200, seed=42)
    with open(log, "w") as f:
        for _, r in pdf.iterrows():
            f.write(f"{r['lang']} {r['article']} {r['views']}\n")
    conf = str(base / "engine.conf")
    index = str(base / "index" / "compressed")
    with open(conf, "w") as f:
        f.write(
            CONF_TEMPLATE.format(
                corpus=corpus, index=index, log=log, indexer="inverted-compressed"
            )
        )
    return {"base": base, "conf": conf, "corpus": corpus, "log": log, "index": index}


def test_parse_options_reference_format(cli_env):
    opts = parse_options(cli_env["conf"])
    assert opts["indexer_type"] == "inverted-compressed"
    assert opts["corpus_prefix"] == cli_env["corpus"]
    assert opts["n_shards"] == "4"  # extras pass through as strings


def test_parse_options_missing_key_is_fatal(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text("corpus_prefix: /x\nindex_prefix: /y\n")
    with pytest.raises(SystemExit):
        parse_options(str(p))


def test_parse_options_wrong_line_is_fatal(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text("corpus_prefix /x\n")
    with pytest.raises(SystemExit):
        parse_options(str(p))


def test_parse_command_line_contract(cli_env):
    mode, port, opts = parse_command_line(
        [f"--options={cli_env['conf']}", "--mode=INDEX"]
    )
    assert mode == "index" and port == -1 and opts["log_prefix"]
    # single-dash forms accepted, like the reference
    mode, port, _ = parse_command_line(
        ["-mode=serve", "-port=25807", f"-options={cli_env['conf']}"]
    )
    assert mode == "serve" and port == 25807
    with pytest.raises(SystemExit):  # bogus mode
        parse_command_line(["--mode=bogus", f"--options={cli_env['conf']}"])
    with pytest.raises(SystemExit):  # serve without port
        parse_command_line(["--mode=serve", f"--options={cli_env['conf']}"])
    with pytest.raises(SystemExit):  # no options
        parse_command_line(["--mode=index"])


def test_mining_then_index_then_query(spark, cli_env):
    """The reference's operational flow: mining -> index -> query, all
    three dispatched from the conf file."""
    main(["--mode=mining", f"--options={cli_env['conf']}"])
    opts = parse_options(cli_env["conf"])
    sig = spark.read.parquet(signals_path(opts))
    assert set(sig.columns) == {"url", "pagerank", "numviews"}
    assert sig.count() == 200

    main(["--mode=index", f"--options={cli_env['conf']}"])
    from websearchengine_spark.operators.query import run_query
    from websearchengine_spark.sources.storage import IndexStorage

    store = IndexStorage(cli_env["index"])
    cfg = store.read_manifest()["config"]
    assert cfg["n_shards"] == 4 and cfg["positions"] is True
    # the mined signals were joined into docs (J4)
    docs = store.read_table(spark, "docs")
    assert {"pagerank", "numviews"} <= set(docs.columns)
    rows = run_query(
        spark, cli_env["index"], "web search", ranker="comprehensive", k=5
    ).collect()
    assert len(rows) == 5


def test_doconly_indexer_type_drops_positions(spark, cli_env):
    conf = str(cli_env["base"] / "doconly.conf")
    index = str(cli_env["base"] / "index" / "doconly")
    with open(conf, "w") as f:
        f.write(
            CONF_TEMPLATE.format(
                corpus=cli_env["corpus"],
                index=index,
                log=cli_env["log"],
                indexer="inverted-doconly",
            )
        )
    main(["--mode=index", f"--options={conf}"])
    from websearchengine_spark.sources.storage import IndexStorage

    assert IndexStorage(index).read_manifest()["config"]["positions"] is False


def test_unknown_indexer_type_is_fatal(spark, cli_env, tmp_path):
    conf = str(tmp_path / "bad.conf")
    with open(conf, "w") as f:
        f.write(
            CONF_TEMPLATE.format(
                corpus=cli_env["corpus"],
                index=str(tmp_path / "idx"),
                log=cli_env["log"],
                indexer="linked-list",
            )
        )
    with pytest.raises(SystemExit):
        main(["--mode=index", f"--options={conf}"])


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_serve_mode_with_static_frontend(spark, cli_env):
    """serve mode end-to-end over sockets: the API endpoints AND the
    static public/ frontend (FileServer.java:94-152 — file hit wins,
    directory serves index.html, miss falls through to the API)."""
    public = cli_env["base"] / "public"
    (public / "js").mkdir(parents=True, exist_ok=True)
    (public / "index.html").write_text("<html><body>wse ui</body></html>")
    (public / "js" / "wse.js").write_text("var wse = 1;")
    opts = parse_options(cli_env["conf"])
    opts["public_root"] = str(public)
    srv = make_server(spark, opts, port=0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        # API still dispatches
        st, ct, body = _get(f"{base}/search?query=web+search&ranker=bm25&num=3")
        assert st == 200 and body
        # click spool goes to {log_prefix}.clicks
        st, _, body = _get(
            f"{base}/click_loging?did=1&query=web&ranker=bm25&action=click"
        )
        assert body == b"Success!"
        assert os.path.exists(opts["log_prefix"].rstrip("/") + ".clicks")
        # the frontend loads: / -> index.html, asset by path
        st, ct, body = _get(f"{base}/")
        assert st == 200 and "text/html" in ct and b"wse ui" in body
        st, ct, body = _get(f"{base}/js/wse.js")
        assert st == 200 and b"var wse" in body and "javascript" in ct
        # miss under the root falls through to API dispatch -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/js/nope.js")
        assert ei.value.code == 404
    finally:
        srv.stop()


def test_static_path_traversal_forbidden(spark, cli_env, tmp_path):
    """../ anywhere is FORBIDDEN (FileServer.java:100-102), and a
    symlink escaping the root is refused by the realpath check."""
    public = tmp_path / "pub"
    public.mkdir()
    (public / "index.html").write_text("ok")
    secret = tmp_path / "secret.txt"
    secret.write_text("s3cr3t")
    os.symlink(secret, public / "leak.txt")
    from websearchengine_spark.serve import SearchHTTPServer

    srv = SearchHTTPServer(
        spark, cli_env["index"], public_root=str(public)
    )
    st, _, body = srv._try_static("/../secret.txt")
    assert st == 403
    st, _, body = srv._try_static("/%2e%2e/secret.txt")
    assert st == 403  # percent-encoded traversal decodes BEFORE the check
    st, _, body = srv._try_static("/leak.txt")
    assert st == 403  # symlink realpath escapes the root
    assert srv._try_static("/absent.css") is None  # falls through
    st, _, body = srv._try_static("/index.html")
    assert st == 200 and body == b"ok"
    # percent-escaped names resolve to the real file (NanoHTTPD decodes)
    (public / "my app.js").write_text("spaced")
    st, _, body = srv._try_static("/my%20app.js")
    assert st == 200 and body == b"spaced"
