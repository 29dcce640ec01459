"""In-process CLI surface tests (the spark-submit packaging smoke is
test_submit.py; these cover argument wiring + the --dry-run explain
surface, the reference's ``_analyze`` analog)."""

from __future__ import annotations

import json

import pytest

from neosearch_spark import cli
from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_idx"))
    docs = assign_doc_ids(synth_transcripts(spark, 150, seed=3))
    IndexBuilder(d, span=64).build(docs)
    return d


def test_query_dry_run_prints_plan(spark, idx_dir, capsys):
    rc = cli.main(
        ["query", "--index", idx_dir, "--dsl", '{"text": "tok1"}', "--dry-run"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dry_run"] is True
    assert "PushedFilters" in out["plan"]
    assert "tok1" in out["plan"]


def test_search_dry_run_prints_stages(spark, idx_dir, capsys):
    rc = cli.main(
        ["search", "--index", idx_dir, "--query", "tok1 tok2", "--dry-run"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["query_terms"] == ["tok1", "tok2"]
    assert len(out["stages"]) == 3
    assert "PushedFilters" in out["block_scan_plan"]


def test_query_executes(spark, idx_dir, capsys):
    rc = cli.main(
        ["query", "--index", idx_dir, "--dsl", '{"text": "tok1"}', "--limit", "3"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["total"] >= 3
    assert len(out["results"]) == 3


def test_search_batch_one_call(spark, idx_dir, capsys):
    rc = cli.main(
        ["search", "--index", idx_dir,
         "--query", "tok1 tok2", "--query", "tok3", "-k", "5"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert [b["query"] for b in out["batch"]] == ["tok1 tok2", "tok3"]
    assert all(len(b["results"]) <= 5 for b in out["batch"])
    assert all(b["results"] for b in out["batch"])


def test_query_dsl_not_xor(spark, idx_dir, capsys):
    """$not/$xor DSL clauses (PROPOSAL.md:223-224 planned operators)
    match the SparkIndex API set semantics and compose recursively."""
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)
    a = {r["doc_id"] for r in idx.term_docs("tok1").collect()}
    b = {r["doc_id"] for r in idx.term_docs("tok2").collect()}

    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl", '{"$not": [{"text": "tok1"}, {"text": "tok2"}]}',
         "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert {r["doc_id"] for r in out["results"]} == a - b

    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl",
         '{"$xor": [{"text": "tok1"}, '
         '{"$or": [{"text": "tok2"}, {"text": "tok3"}]}]}',
         "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    c = {r["doc_id"] for r in idx.term_docs("tok3").collect()}
    assert {r["doc_id"] for r in out["results"]} == a ^ (b | c)


def test_serve_loop_three_batches_one_warm_index(spark, idx_dir):
    """serve: three requests through ONE process/index handle (the
    reference HTTP service's executable twin).  The second request
    repeats the first's terms — the per-term metadata memo must
    answer it with ZERO terms-table probes (warm-serving contract);
    a multi-query request batches through bm25_topk_batch."""
    import io

    from neosearch_spark.cli import serve_loop
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)
    probed_terms = []
    orig = type(idx)._term_meta

    def spy(self, qterms, field="text"):
        missing = [t for t in qterms if (field, t) not in self._meta_cache]
        probed_terms.append(missing)
        return orig(self, qterms, field)

    out = io.StringIO()
    try:
        type(idx)._term_meta = spy
        served = serve_loop(
            idx,
            [
                "tok1 tok3",                                    # cold
                "tok1 tok3",                                    # warm: memo hit
                json.dumps({"queries": ["tok1", "tok2 tok3"], "k": 5}),
            ],
            out,
        )
    finally:
        type(idx)._term_meta = orig

    assert served == 3
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 3
    # identical results for the repeated query
    assert lines[0] == lines[1]
    assert lines[0]["batch"][0]["results"]
    # request 2 probed NOTHING (both terms memoized by request 1)
    flat = probed_terms[1] if len(probed_terms) > 1 else ["never-called"]
    assert flat == []
    # the multi-query request returns per-query results with k=5
    batch = lines[2]["batch"]
    assert [b["query"] for b in batch] == ["tok1", "tok2 tok3"]
    assert all(len(b["results"]) <= 5 for b in batch)
    # a malformed request must not kill the loop
    out2 = io.StringIO()
    assert serve_loop(idx, ['{"queries": }', "tok1"], out2) == 2
    resp = [json.loads(l) for l in out2.getvalue().splitlines()]
    assert "error" in resp[0] and "batch" in resp[1]


def test_delete_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "cli_del_idx")
    docs = assign_doc_ids(synth_transcripts(spark, 120, seed=9))
    IndexBuilder(d, span=32).build(docs)
    rc = cli.main(["delete", "--index", d, "--ids", "1,2,3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok"
    assert out["n_deleted"] == 3
    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, d)
    assert si.n_docs == 117


def test_upsert_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "cli_ups_idx")
    docs = assign_doc_ids(synth_transcripts(spark, 120, seed=9))
    IndexBuilder(d, span=32).build(docs)
    from pyspark.sql import functions as F

    batch_dir = str(tmp_path / "cli_ups_batch")
    docs.where(F.col("doc_id") < 2).withColumn(
        "text", F.lit("cliupserted tok")
    ).write.parquet(batch_dir)
    rc = cli.main(["upsert", "--index", d, "--input", batch_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok"
    assert out["n_replaced"] == 2
    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, d)
    assert si.n_docs == 120
    assert {r["doc_id"] for r in si.term_docs("cliupserted").collect()} == {0, 1}


def test_snapshot_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "cli_snap_idx")
    docs = assign_doc_ids(synth_transcripts(spark, 100, seed=2))
    IndexBuilder(d, span=32).build(docs)
    assert cli.main(["snapshot", "--index", d, "--tag", "v1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok" and out["n_files"] > 0
    assert cli.main(["snapshot", "--index", d, "--list"]) == 0
    assert json.loads(capsys.readouterr().out)["snapshots"] == ["v1"]
    cli.main(["delete", "--index", d, "--ids", "1,2"])
    capsys.readouterr()
    assert cli.main(["snapshot", "--index", d, "--tag", "v1", "--restore"]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "ok"
    from neosearch_spark.query import SparkIndex

    assert SparkIndex(spark, d).n_docs == 100


def test_serve_loop_rejects_string_queries():
    # {"queries": "vector"} must be rejected, not iterated per char
    import io

    out = io.StringIO()
    served = cli.serve_loop(None, ['{"queries": "vector"}',
                                   '{"queries": []}',
                                   '{"queries": [7]}'], out)
    assert served == 3
    for line in out.getvalue().strip().splitlines():
        assert "non-empty list of strings" in json.loads(line)["error"]


def test_repl_scripted_session(spark, tmp_path):
    """Interactive .ns REPL (reference cmd/cli/cli.go:24-112): a
    scripted stdin session creates an index via set, reads its own
    writes (get after set WITHOUT flushbatch), queries postings,
    deletes, survives a parse error and a failed statement, and
    stops at quit — printing the reference CLI's result format."""
    import io

    from neosearch_spark.nscript import NsExecutor

    d = str(tmp_path / "repl_idx")
    ex = NsExecutor(spark, d, build_kwargs={"analyzed_fields": ["text"]})
    out = io.StringIO()
    session = [
        'using repl.document.db set 1 "{\\"doc_id\\": 1, \\"text\\": \\"hello world\\"}";',
        'using repl.document.db set 2 "{\\"doc_id\\": 2, \\"text\\": \\"hello spark\\"}";',
        # read-your-writes: no flushbatch issued before the gets
        "using repl.document.db get 2;",
        "using repl.text.idx get hello;",
        "this is not ns grammar @@@",          # parse error → continue
        "using repl.document.db delete 1;",
        "using repl.text.idx get hello;",
        "using repl.document.db get 99;",      # missing doc → doc null
        "QUIT",                                # case-insensitive quit
        "using repl.text.idx get never;",      # must NOT execute
    ]
    executed = cli.repl_loop(ex, session, out)
    assert executed == 7
    text = out.getvalue()
    lines = text.splitlines()
    assert lines.count("set: Success") == 2
    assert lines.count("get: Success") == 4
    assert "delete: Success" in lines
    assert "Result[idx]: [1, 2]" in lines          # before the delete
    assert "Result[idx]: [2]" in lines             # after the delete
    assert '"text": "hello spark"' in text         # doc-store get payload
    assert "Result: null" in text                  # missing doc
    assert "ns parse error" in text                # parse error reported
    assert "never" not in text                     # nothing after quit
    assert lines[-1] == "Exiting..."


def test_repl_failed_statement_keeps_session(spark, tmp_path):
    """A statement that fails at EXECUTION (get against an index that
    doesn't exist yet) prints ERROR and the session continues
    (cli.go:81-83)."""
    import io

    from neosearch_spark.nscript import NsExecutor

    d = str(tmp_path / "repl_err_idx")
    ex = NsExecutor(spark, d, build_kwargs={"analyzed_fields": ["text"]})
    out = io.StringIO()
    executed = cli.repl_loop(
        ex,
        [
            "using repl.text.idx get hello;",  # no index yet → ERROR
            'using repl.document.db set 5 "{\\"doc_id\\": 5, \\"text\\": \\"ok now\\"}";',
            "using repl.text.idx get ok;",
        ],
        out,
    )
    assert executed == 2
    text = out.getvalue()
    assert text.startswith("ERROR: ")
    assert "Result[idx]: [5]" in text


def test_import_subcommand_reference_sample(spark, tmp_path, capsys):
    """`import` — the neosearch-import analog — ingests the
    reference's own JSON-array sample (typed fields incl. an
    array<string> authors column) with schema-inferred fields, then
    upserts an NDJSON batch into the same index."""
    d = str(tmp_path / "import_idx")
    rc = cli.main([
        "import", "--file",
        "/root/reference/cmd/import/samples/operating_systems.json",
        "--index", d, "--create",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["created"] is True and out["docs"] == 5

    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, d)
    # analyzed string field (4 of the 5 OSes are family=unix)
    assert [r["doc_id"] for r in si.term_docs("unix", field="family").collect()] == [1, 2, 3, 4]
    # array element indexing (authors), analyzer-lowered
    got = {r["doc_id"] for r in si.term_docs("thompson", field="authors").collect()}
    assert got == {1, 2}
    # typed numeric field → exact term (reflection dispatch)
    assert [r["doc_id"] for r in si.term_docs("1971", field="year").collect()] == [1]
    assert [r["doc_id"] for r in si.term_docs("1993", field="year").collect()] == [4, 5]

    # NDJSON upsert into the existing index (id 2 replaced, 6 new)
    nd = tmp_path / "more.jsonl"
    nd.write_text(
        '{"id": 2, "name": "Plan 9", "family": "unix", "kernel": "plan9",'
        ' "kernelType": "Hybrid", "year": 1992, "authors": ["Rob Pike"]}\n'
        '{"id": 6, "name": "Linux", "family": "unix", "kernel": "linux",'
        ' "kernelType": "monolithic", "year": 1991,'
        ' "authors": ["Linus Torvalds"]}\n'
    )
    rc = cli.main(["import", "--file", str(nd), "--index", d])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["created"] is False and out["docs"] == 2

    si = SparkIndex(spark, d)
    assert si.n_docs == 6
    assert {r["doc_id"] for r in si.term_docs("thompson", field="authors").collect()} == {1}
    assert {r["doc_id"] for r in si.term_docs("pike", field="authors").collect()} == {2}
    assert [r["doc_id"] for r in si.term_docs("1991", field="year").collect()] == [6]


def test_import_rejects_non_numeric_ids(spark, tmp_path, capsys):
    """String ids cast to NULL silently under `.cast("long")`; the
    import must fail loudly instead of reporting ok while building an
    index whose every doc_id is NULL (min/max bounds guards skip
    nulls, so nothing downstream would catch it)."""
    nd = tmp_path / "bad_ids.jsonl"
    nd.write_text(
        '{"id": "doc-1", "text": "alpha beta"}\n'
        '{"id": 2, "text": "gamma"}\n'
    )
    d = str(tmp_path / "bad_idx")
    rc = cli.main(["import", "--file", str(nd), "--index", d, "--create"])
    assert rc == 2
    out = json.loads(capsys.readouterr().out)
    assert "non-numeric id" in out["error"] and "1 of 2" in out["error"]
    import os

    assert not os.path.exists(os.path.join(d, "manifest.json"))


def test_import_exact_fields_without_fields_flag(spark, tmp_path, capsys):
    """--exact-fields must apply on its own (same independent flag
    semantics as replay/repl); it was silently dropped when --fields
    was absent."""
    nd = tmp_path / "exact.jsonl"
    nd.write_text(
        '{"id": 1, "text": "alpha beta", "role": "User"}\n'
        '{"id": 2, "text": "alpha", "role": "Assistant"}\n'
    )
    d = str(tmp_path / "exact_idx")
    rc = cli.main([
        "import", "--file", str(nd), "--index", d, "--create",
        "--exact-fields", "role",
    ])
    assert rc == 0
    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, d)
    # exact field: whole-value term, NOT analyzer-lowered
    assert [r["doc_id"] for r in si.term_docs("User", field="role").collect()] == [1]
    assert si.term_docs("user", field="role").count() == 0
    # default analyzed field still works
    assert {r["doc_id"] for r in si.term_docs("alpha").collect()} == {1, 2}


def test_query_dsl_fuzzy(spark, idx_dir, capsys):
    """$fuzzy clause: routes through SparkIndex.fuzzy_docs (superset
    of the exact term's docs), composes inside $and, validates shape
    without an index (the pending-HTTP-index path), and rejects bad
    value/max_dist types."""
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)
    exact = {r["doc_id"] for r in idx.term_docs("tok1").collect()}

    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl", '{"text": {"$fuzzy": "tok1", "max_dist": 1}}',
         "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    got = {r["doc_id"] for r in out["results"]}
    assert exact <= got
    direct = {r["doc_id"]
              for r in idx.fuzzy_docs("tok1", max_dist=1).collect()}
    assert got == direct

    # shape validation runs index-free (stub path)
    cli.validate_dsl({"$and": [{"text": {"$fuzzy": "tok1"}},
                               {"text": "tok2"}]})
    with pytest.raises(ValueError, match="must be a string"):
        cli.validate_dsl({"text": {"$fuzzy": 3}})
    with pytest.raises(ValueError, match="max_dist"):
        cli.validate_dsl({"text": {"$fuzzy": "tok1", "max_dist": True}})
    with pytest.raises(ValueError, match="max_dist"):
        cli.validate_dsl({"text": {"$fuzzy": "tok1", "max_dist": -1}})


def test_search_request_snippets_flag(spark, idx_dir):
    """\"snippets\": true attaches (hit_pos, snippet) to every result
    on both the single-query and batch paths; each snippet contains a
    query term; the flag validates state-independently (bad type
    raises in validate_search_request, the pending-index path)."""
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)
    resp = cli.handle_search_request(
        idx, {"queries": ["tok1 tok2"], "k": 3, "snippets": True}
    )
    results = resp["batch"][0]["results"]
    assert results
    for r in results:
        assert r["snippet"] is not None and r["hit_pos"] >= 1
        assert any(t in r["snippet"].split(" ") for t in ("tok1", "tok2"))

    resp2 = cli.handle_search_request(
        idx, {"queries": ["tok1", "tok3"], "k": 2, "snippets": True}
    )
    for b in resp2["batch"]:
        for r in b["results"]:
            assert "snippet" in r and "hit_pos" in r

    # without the flag the response shape is unchanged
    resp3 = cli.handle_search_request(idx, {"queries": ["tok1"], "k": 1})
    assert "snippet" not in resp3["batch"][0]["results"][0]

    with pytest.raises(ValueError, match="snippets"):
        cli.validate_search_request({"queries": ["x"], "snippets": "yes"})


def test_eval_dsl_rejects_typod_operator_keys():
    """{"and": [...]} (missing the $) must raise, not silently treat
    "and" as a field whose term is the stringified clause list (which
    returns 0 rows and looks like an empty result)."""
    import pytest

    with pytest.raises(ValueError, match="non-scalar term"):
        cli._eval_dsl(None, {"and": [{"text": "alpha"}]})
    with pytest.raises(ValueError, match="non-scalar term"):
        cli._eval_dsl(None, {"text": {"prefix": "al"}})  # $prefix typo


def test_repl_poison_set_cannot_wedge_session(spark, tmp_path):
    """A bad set payload must not poison the pending batch: the REPL
    validates payloads AT THE STATEMENT (eager_validate), so the bad
    set itself prints ERROR and later writes/reads work; and even on
    the lazy path (file replay semantics) a failing flush DISCARDS its
    batch — the next statement starts clean instead of re-failing
    forever, and quit's tail flush reports instead of killing the
    CLI."""
    import io

    from neosearch_spark.nscript import NsExecutor

    # eager path (what `cli repl` wires): the bad statement fails, the
    # session keeps working end-to-end
    d = str(tmp_path / "repl_poison_idx")
    ex = NsExecutor(
        spark, d, build_kwargs={"analyzed_fields": ["text"]},
        eager_validate=True,
    )
    out = io.StringIO()
    executed = cli.repl_loop(
        ex,
        [
            "using repl.document.db set 1 \"not json at all\";",
            "using repl.document.db set 2 \"[1, 2]\";",  # non-object
            'using repl.document.db set 3 "{\\"doc_id\\": 3, \\"text\\": \\"clean doc\\"}";',
            "using repl.text.idx get clean;",
        ],
        out,
    )
    text = out.getvalue()
    assert executed == 2  # the two poison sets never count
    assert text.count("ERROR: ") == 2
    assert "Result[idx]: [3]" in text
    assert text.splitlines()[-1] == "Exiting..."

    # lazy path: flush failure at quit is reported, session exits
    # cleanly, and the poison batch is gone (a fresh statement works)
    d2 = str(tmp_path / "repl_poison_lazy_idx")
    ex2 = NsExecutor(spark, d2, build_kwargs={"analyzed_fields": ["text"]})
    out2 = io.StringIO()
    cli.repl_loop(
        ex2, ["using repl.document.db set 1 \"broken payload\";"], out2
    )
    t2 = out2.getvalue()
    assert "set: Success" in t2           # lazy: accepted at statement
    assert "ERROR: " in t2                # ...reported at the quit flush
    assert t2.splitlines()[-1] == "Exiting..."
    assert ex2._sets == []                # batch discarded, not wedged
    out3 = io.StringIO()
    cli.repl_loop(
        ex2,
        [
            'using repl.document.db set 4 "{\\"doc_id\\": 4, \\"text\\": \\"recovered\\"}";',
            "using repl.text.idx get recovered;",
        ],
        out3,
    )
    assert "Result[idx]: [4]" in out3.getvalue()


def test_serve_loop_defaults_to_index_primary_field(spark, tmp_path):
    """The stdin serving transport must score the index's primary
    analyzed field when the request doesn't name one — an index built
    on custom fields silently returned empty results for every query
    while the default was hardcoded to \"text\"."""
    import io

    from neosearch_spark.build import IndexBuilder
    from neosearch_spark.cli import serve_loop
    from neosearch_spark.query import SparkIndex

    d = str(tmp_path / "fldidx")
    docs = spark.createDataFrame(
        [(0, "acme corp"), (1, "globex inc"), (2, "acme holdings")],
        "doc_id long, company_name string",
    )
    IndexBuilder(d, analyzed_fields=["company_name"], span=64).build(docs)
    idx = SparkIndex(spark, d)
    assert idx.primary_field == "company_name"
    out = io.StringIO()
    served = serve_loop(
        idx,
        [
            "acme",                                            # bare line
            json.dumps({"queries": ["globex", "acme"], "k": 5}),  # batch
            json.dumps({"queries": ["acme"], "field": "company_name"}),
        ],
        out,
    )
    assert served == 3
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert {r["doc_id"] for r in lines[0]["batch"][0]["results"]} == {0, 2}
    assert {r["doc_id"] for r in lines[1]["batch"][0]["results"]} == {1}
    assert {r["doc_id"] for r in lines[1]["batch"][1]["results"]} == {0, 2}
    # explicit field request ≡ defaulted
    assert lines[2]["batch"][0]["results"] == lines[0]["batch"][0]["results"]


def test_search_defaults_to_index_primary_field(spark, tmp_path, capsys):
    """`cli search` without --field must score the index's primary
    analyzed field: the hardcoded "text" default silently returned
    empty results (exit 0) for every query against an index built on
    custom fields — the same bug class the stdin and HTTP transports
    fixed (they default to idx.primary_field; so must the CLI)."""
    d = str(tmp_path / "fld_cli_idx")
    docs = spark.createDataFrame(
        [(0, "acme corp"), (1, "globex inc"), (2, "acme holdings")],
        "doc_id long, company_name string",
    )
    IndexBuilder(d, analyzed_fields=["company_name"], span=64).build(docs)
    rc = cli.main(["search", "--index", d, "--query", "acme"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert {r["doc_id"] for r in out["results"]} == {0, 2}
    # explicit --field must give the identical results
    rc = cli.main(
        ["search", "--index", d, "--query", "acme", "--field", "company_name"]
    )
    assert rc == 0
    explicit = json.loads(capsys.readouterr().out)
    assert explicit["results"] == out["results"]
    # the dry-run explain surface resolves the default the same way
    rc = cli.main(["search", "--index", d, "--query", "acme", "--dry-run"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["dry_run"] is True and "company_name" in json.dumps(plan)


def test_query_dsl_wildcard_and_phrase(spark, idx_dir, capsys):
    """$wildcard routes through SparkIndex.wildcard_docs (≡ direct
    scan), $phrase through SparkIndex.phrase_docs; both compose
    inside $and, validate index-free, and reject bad value types."""
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)

    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl", '{"text": {"$wildcard": "tok1?"}}', "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    got = {r["doc_id"] for r in out["results"]}
    assert got == {r["doc_id"]
                   for r in idx.wildcard_docs("tok1?").collect()}

    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl", '{"text": {"$phrase": "neoway business solution"}}',
         "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    got = {r["doc_id"] for r in out["results"]}
    assert got
    assert got == {r["doc_id"]
                   for r in idx.phrase_docs("neoway business solution").collect()}

    # shape validation runs index-free (the HTTP pending-index path)
    cli.validate_dsl({"$and": [{"text": {"$wildcard": "tok*"}},
                               {"text": {"$phrase": "a b"}}]})
    with pytest.raises(ValueError, match=r"\$wildcard value"):
        cli.validate_dsl({"text": {"$wildcard": 3}})
    with pytest.raises(ValueError, match=r"\$phrase value"):
        cli.validate_dsl({"text": {"$phrase": ""}})
    with pytest.raises(ValueError, match=r"\$phrase value"):
        cli.validate_dsl({"text": {"$phrase": ["a"]}})


def test_query_dsl_near(spark, idx_dir, capsys):
    """$near routes through SparkIndex.near_docs (⊆ the AND of the
    two terms), validates index-free, and rejects bad shapes."""
    from neosearch_spark.query import SparkIndex

    idx = SparkIndex(spark, idx_dir)
    rc = cli.main(
        ["query", "--index", idx_dir,
         "--dsl", '{"text": {"$near": ["tok1", "tok2"], "max_dist": 4}}',
         "--limit", "100000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    got = {r["doc_id"] for r in out["results"]}
    assert got == {r["doc_id"]
                   for r in idx.near_docs("tok1", "tok2", max_dist=4).collect()}
    and_ids = {r["doc_id"] for r in idx.and_docs(["tok1", "tok2"]).collect()}
    assert got <= and_ids

    cli.validate_dsl({"text": {"$near": ["a", "b"]}})
    for bad in [{"$near": "a b"}, {"$near": ["a"]}, {"$near": ["a", 3]},
                {"$near": ["a", ""]}]:
        with pytest.raises(ValueError, match=r"\$near value"):
            cli.validate_dsl({"text": bad})
    for md in [0, -1, True, "3"]:
        with pytest.raises(ValueError, match=r"\$near max_dist"):
            cli.validate_dsl({"text": {"$near": ["a", "b"], "max_dist": md}})
