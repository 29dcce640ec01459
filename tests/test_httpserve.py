"""HTTP serving-surface tests (the reference REST service's routes,
``service/neosearch/server/server.go:39-57``): one warm index process,
two concurrent HTTP clients, plus the create→add→get→search→delete
document lifecycle over a fresh index."""

from __future__ import annotations

import json
import os
import threading
import urllib.request

import pytest

from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.httpserve import serve_http, validate_index_name
from neosearch_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def http_srv(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("http_root"))
    docs = assign_doc_ids(synth_transcripts(spark, 150, seed=3))
    IndexBuilder(f"{root}/warmidx", span=64).build(docs)
    srv = serve_http(spark, root, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(url: str, method: str = "GET", body: dict | None = None) -> dict:
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(r) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def test_home_and_index_info(http_srv):
    srv, base = http_srv
    assert _req(base + "/")["status"] == "alive"
    info = _req(base + "/warmidx")
    assert info["n_docs"] == 150 and info["avgdl"] > 0
    # reference-parity error body for a missing index
    assert _req(base + "/nosuchidx")["error"] == "Index 'nosuchidx' doesn't exists."
    # reference index-name rule: short / leading-digit names rejected
    assert "error" in _req(base + "/ab")
    assert not validate_index_name("1abc") and validate_index_name("abc_1")


def test_two_concurrent_clients_one_warm_index(spark, http_srv):
    """Two HTTP clients fire interleaved searches at ONE warm index
    process; both get rank-identical results to the library API, and
    the repeat terms are answered from the shared per-term memo."""
    from neosearch_spark.query import SparkIndex

    srv, base = http_srv
    expect = {
        q: [
            {"doc_id": r["doc_id"], "score": r["score"]}
            for r in SparkIndex(spark, srv.index_dir("warmidx"))
            .bm25_topk(q, k=5).collect()
        ]
        for q in ("tok1 tok3", "tok2")
    }

    results: dict[str, list] = {}

    def client(cid: str, query: str) -> None:
        got = []
        for _ in range(3):
            got.append(
                _req(base + "/warmidx", "POST", {"queries": [query], "k": 5})
            )
        results[cid] = got

    t1 = threading.Thread(target=client, args=("c1", "tok1 tok3"))
    t2 = threading.Thread(target=client, args=("c2", "tok2"))
    t1.start(); t2.start(); t1.join(); t2.join()

    for cid, query in (("c1", "tok1 tok3"), ("c2", "tok2")):
        for resp in results[cid]:
            assert resp["batch"][0]["query"] == query
            assert resp["batch"][0]["results"] == expect[query]
    # warm handle: both clients shared one SparkIndex (its memo holds
    # every probed (field, term) pair exactly once)
    handle = srv.handles["warmidx"]
    assert {t for _, t in handle._meta_cache} >= {"tok1", "tok3", "tok2"}


def test_dsl_search_and_get(http_srv):
    srv, base = http_srv
    # reference search body: {"query": {DSL}} → {"total", "results"}
    out = _req(base + "/warmidx", "POST",
               {"query": {"$and": [{"text": "tok1"}, {"text": "tok2"}]},
                "limit": 3})
    assert out["total"] >= 3 and len(out["results"]) == 3
    doc_id = out["results"][0]["doc_id"]
    doc = _req(f"{base}/warmidx/{doc_id}")
    assert doc["doc_id"] == doc_id and "tok1" in doc["text"]
    # engine-internal derived columns must not leak into the body
    assert "dl" not in doc and "doc_part" not in doc
    # reference error bodies
    assert _req(base + "/warmidx", "POST", {})["error"] == "No query field specified"
    assert "not a JSON object" in _req(
        base + "/warmidx", "POST", {"query": "tok1"}
    )["error"]
    assert _req(f"{base}/warmidx/notanint")["error"] == "Invalid document id"
    # _analyze (reference get_analyze.go): the .ns command text a Get
    # would run + the doc-lookup plan, nothing executed
    out = _req(f"{base}/warmidx/{doc_id}/_analyze")
    assert out["command"] == f"using warmidx.document.db get {doc_id}"
    assert "PushedFilters" in out["plan"] and str(doc_id) in out["plan"]
    assert _req(f"{base}/warmidx/xyz/_analyze")["error"].startswith(
        "Invalid document id"
    )
    # malformed BM25 body: error response, process stays up
    assert "non-empty list of strings" in _req(
        base + "/warmidx", "POST", {"queries": "tok1"}
    )["error"]
    assert _req(base + "/")["status"] == "alive"


def test_create_add_search_delete_lifecycle(http_srv):
    """PUT create → POST /{index}/{id} add (first add BUILDS the
    physical index via the shared _apply_sets path) → add is visible
    to get + BM25 + DSL → second add upserts → DELETE removes."""
    srv, base = http_srv
    assert _req(base + "/lifeidx", "PUT", {"fields": ["text"]})[
        "status"
    ] == "Index 'lifeidx' created."
    assert _req(base + "/lifeidx", "PUT")["error"] == "Index 'lifeidx' already exists."
    # adds must hit an existing (created) index
    assert "doesn't exists" in _req(base + "/ghostidx/1", "POST", {"text": "x"})["error"]

    assert _req(base + "/lifeidx/1", "POST",
                {"text": "hello distributed world"})["status"] == "Document 1 indexed."
    assert _req(base + "/lifeidx/2", "POST",
                {"text": "hello spark"})["status"] == "Document 2 indexed."
    assert _req(base + "/lifeidx/1")["text"] == "hello distributed world"
    out = _req(base + "/lifeidx", "POST", {"queries": ["hello"], "k": 5})
    assert {r["doc_id"] for r in out["batch"][0]["results"]} == {1, 2}
    out = _req(base + "/lifeidx", "POST", {"query": {"text": "spark"}})
    assert out["total"] == 1 and out["results"][0]["doc_id"] == 2
    # replace doc 1 (reference re-Add semantics via upsert)
    assert _req(base + "/lifeidx/1", "POST", {"text": "goodbye"})["status"] == (
        "Document 1 indexed."
    )
    out = _req(base + "/lifeidx", "POST", {"queries": ["hello"], "k": 5})
    assert {r["doc_id"] for r in out["batch"][0]["results"]} == {2}

    assert _req(base + "/lifeidx", "DELETE")["status"] == "Index 'lifeidx' deleted."
    assert "doesn't exists" in _req(base + "/lifeidx")["error"]


def test_pending_index_answers_empty_not_traceback(http_srv):
    """A two-phase-created index (create.json, no manifest yet) must
    answer search/get with empty-index semantics — not leak the
    SparkIndex manifest-open FileNotFoundError (and the server's
    filesystem layout) into the response body."""
    srv, base = http_srv
    assert "created" in _req(base + "/pendingidx", "PUT", {"fields": ["text"]})[
        "status"
    ]
    responses = []
    out = _req(base + "/pendingidx", "POST", {"queries": ["hello"], "k": 5})
    assert out == {"batch": [{"query": "hello", "results": []}]}
    responses.append(out)
    # malformed batch bodies must 400 the SAME way as on a live index
    # (shared validate_search_request), not succeed with garbage
    out = _req(base + "/pendingidx", "POST", {"queries": []})
    assert "non-empty list of strings" in out["error"]
    out = _req(base + "/pendingidx", "POST", {"queries": [123]})
    assert "non-empty list of strings" in out["error"]
    out = _req(base + "/pendingidx", "POST", {"query": {"text": "hello"}})
    assert out == {"total": 0, "results": []}
    responses.append(out)
    out = _req(base + "/pendingidx/7")
    assert out["error"] == "document 7 not found"
    responses.append(out)
    # id validation is state-independent: malformed ids get the same
    # error as on a live index, never the raw path segment echoed back
    out = _req(base + "/pendingidx/abc")
    assert out == {"error": "Invalid document id"}
    # _analyze keeps its dry-run contract on a pending index: the
    # statement text IS the answer (nothing executes), plan is null
    out = _req(base + "/pendingidx/7/_analyze")
    assert out == {
        "command": "using pendingidx.document.db get 7",
        "plan": None,
    }
    responses.append(out)
    for body in responses:
        assert "manifest.json" not in json.dumps(body)
    assert _req(base + "/pendingidx", "DELETE")["status"] == (
        "Index 'pendingidx' deleted."
    )


def test_cross_surface_roundtrip_http_dump_replay(spark, http_srv, tmp_path):
    """The three ingestion surfaces compose: documents added over
    HTTP → `.ns` dump → streamed replay into a fresh index → the
    replayed index serves byte-identical search responses over HTTP.
    (The dump/replay contract is per-surface tested; this guards the
    COMPOSITION — e.g. schema drift between the HTTP add path and
    the replay path would only show here.)"""
    from neosearch_spark.nscript import dump_ns, replay_ns

    srv, base = http_srv
    assert "created" in _req(base + "/rtidx", "PUT", {"fields": ["text"]})["status"]
    for i, text in enumerate(
        ["round trip alpha", "round trip beta", "alpha beta gamma"]
    ):
        assert _req(base + f"/rtidx/{i}", "POST", {"text": text})[
            "status"
        ] == f"Document {i} indexed."

    ns_path = str(tmp_path / "rt.ns")
    n = dump_ns(spark, srv.index_dir("rtidx"), ns_path, name="rtidx")
    assert n == 3

    replayed = str(tmp_path / "rt_replayed")
    with open(ns_path) as f:  # file object → streamed incremental parse
        res = replay_ns(spark, replayed, f, build_kwargs={"analyzed_fields": ["text"]})
    assert res["n_set"] == 3

    # serve the REPLAYED index from the same server root and compare
    # the HTTP search responses verbatim
    import shutil

    shutil.copytree(replayed, srv.index_dir("rtreplayed"))
    for body in (
        {"queries": ["alpha beta"], "k": 5},
        {"query": {"text": "alpha"}},
    ):
        a = _req(base + "/rtidx", "POST", body)
        b = _req(base + "/rtreplayed", "POST", body)
        if "batch" in a:
            assert a["batch"][0]["results"] == b["batch"][0]["results"]
        else:
            assert a["total"] == b["total"]
            assert sorted(r["doc_id"] for r in a["results"]) == sorted(
                r["doc_id"] for r in b["results"]
            )


def test_handle_lru_caps_open_indices(spark, tmp_path):
    """Open index handles are LRU-capped like the reference's
    MaxIndicesOpen (config.go:22-24, cache/lru.go): the N+1th open
    evicts the least-recently-used handle; a re-open works and
    returns fresh, correct results."""
    root = str(tmp_path / "lru_root")
    for n in ("idxa", "idxb", "idxc"):
        docs = assign_doc_ids(synth_transcripts(spark, 40, seed=1))
        IndexBuilder(f"{root}/{n}", span=32).build(docs)
    srv = serve_http(spark, root, port=0, max_indices_open=2)
    try:
        a = srv.open("idxa")
        srv.open("idxb")
        srv.open("idxa")          # touch: idxb becomes LRU
        srv.open("idxc")          # evicts idxb, not idxa
        assert set(srv.handles) == {"idxa", "idxc"}
        assert srv.handles["idxa"] is a
        b2 = srv.open("idxb")     # re-open after eviction
        assert set(srv.handles) == {"idxc", "idxb"} or len(srv.handles) == 2
        assert b2.n_docs == 40
    finally:
        srv.server_close()


def test_invalidate_mid_construction_never_caches(spark, tmp_path, monkeypatch):
    """open() constructs SparkIndex OUTSIDE the handles lock; a
    mutation that invalidates the name while construction is in
    flight must prevent the stale handle from entering the cache
    (it may still serve the overlapping request — linearizable),
    and the next open must construct fresh and cache normally."""
    import neosearch_spark.query as query_mod
    from neosearch_spark.httpserve import serve_http

    srv = serve_http(spark, str(tmp_path / "race_root"), port=0)
    started, release = threading.Event(), threading.Event()
    built = []

    class SlowIndex:
        def __init__(self, spark_, path, result_cache=0):
            built.append(self)
            if len(built) == 1:  # only the first open blocks
                started.set()
                assert release.wait(10)

    monkeypatch.setattr(query_mod, "SparkIndex", SlowIndex)
    try:
        out = {}
        t = threading.Thread(target=lambda: out.setdefault("h", srv.open("raceidx")))
        t.start()
        assert started.wait(10)
        srv.invalidate("raceidx")  # lands mid-construction
        release.set()
        t.join(10)
        # the overlapped open still got a handle, but it was NOT cached
        assert isinstance(out["h"], SlowIndex)
        assert "raceidx" not in srv.handles
        # a subsequent open constructs a NEW handle and caches it
        h2 = srv.open("raceidx")
        assert h2 is not out["h"]
        assert srv.handles["raceidx"] is h2
        # and a third open is a pure cache hit (no new construction)
        assert srv.open("raceidx") is h2 and len(built) == 2
    finally:
        srv.server_close()


def _raw_put(url: str, payload: bytes) -> dict:
    r = urllib.request.Request(url, data=payload, method="PUT")
    try:
        with urllib.request.urlopen(r) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def test_create_existing_wins_over_malformed_body(http_srv):
    """The reference reports already-exists regardless of the request
    body (create.go:28-33): a malformed body on PUT of an EXISTING
    index must surface the exists error, not a parse error — the body
    is parsed before the lock but its error is held until after the
    exists check."""
    srv, base = http_srv
    for payload in (b"[1, 2]", b"{not json"):
        assert (
            _raw_put(base + "/warmidx", payload)["error"]
            == "Index 'warmidx' already exists."
        )
    # on a NEW name the held parse error is reported and nothing is created
    assert "error" in _raw_put(base + "/freshbadbody", b"[1, 2]")
    assert not srv.exists("freshbadbody")
    assert _req(base + "/freshbadbody")["error"] == (
        "Index 'freshbadbody' doesn't exists."
    )


def test_pending_dsl_search_validates_like_live(http_srv):
    """State-independent request validation on the boolean-DSL path:
    a malformed query body 400s identically whether the index is
    pending (created, nothing indexed) or live (94c9f08 established
    this for the 'queries' path; this pins the DSL path)."""
    srv, base = http_srv
    assert "error" not in _req(base + "/penddsl", "PUT", {"fields": ["text"]})
    try:
        bad_bodies = [
            {"query": {"and": [{"text": "x"}]}},   # typo'd operator
            {"query": {}},                          # no field at all
            {"query": {"$and": []}},                # empty clause list
        ]
        for body in bad_bodies:
            pend = _req(base + "/penddsl/", "POST", body)
            assert "error" in pend, body
        # well-formed DSL on the pending index answers empty, not 400
        ok = _req(base + "/penddsl/", "POST", {"query": {"text": "x"}})
        assert ok == {"total": 0, "results": []}
        # live comparison: same bad bodies 400 on the warm index too
        for body in bad_bodies:
            live = _req(base + "/warmidx/", "POST", body)
            assert "error" in live, body
    finally:
        _req(base + "/penddsl", "DELETE")


def test_custom_field_index_searchable_over_http(http_srv):
    """An index created with custom analyzed fields must be BM25-
    searchable over HTTP without the client naming the field: the
    serving core defaults to the INDEX's primary analyzed field (a
    hardcoded "text" default silently returned zero results for
    every query against such an index)."""
    srv, base = http_srv
    assert "created" in _req(
        base + "/fldidx", "PUT", {"fields": ["company_name"]}
    )["status"]
    try:
        assert _req(
            base + "/fldidx/1", "POST", {"company_name": "acme corp"}
        )["status"] == "Document 1 indexed."
        assert _req(
            base + "/fldidx/2", "POST", {"company_name": "globex inc"}
        )["status"] == "Document 2 indexed."
        # no "field" in the request → primary analyzed field
        out = _req(base + "/fldidx", "POST", {"queries": ["acme"], "k": 5})
        assert [r["doc_id"] for r in out["batch"][0]["results"]] == [1]
        # explicit "field" still honored (and validated)
        out = _req(
            base + "/fldidx", "POST",
            {"queries": ["globex"], "k": 5, "field": "company_name"},
        )
        assert [r["doc_id"] for r in out["batch"][0]["results"]] == [2]
        bad = _req(
            base + "/fldidx", "POST", {"queries": ["x"], "field": 7}
        )
        assert "error" in bad
    finally:
        _req(base + "/fldidx", "DELETE")


def test_create_rejects_malformed_field_lists(http_srv):
    """PUT bodies whose fields/exact_fields are not lists of
    non-empty strings must 400 WITHOUT persisting create.json — a
    poisoned config would 400 every future add while exists() blocks
    the corrective PUT (only DELETE could recover)."""
    srv, base = http_srv
    for bad in (
        {"fields": "title"},              # string, not list
        {"fields": ["title", 3]},         # non-string element
        {"fields": []},                   # empty list
        {"exact_fields": {"a": 1}},       # wrong container
        {"fields": ["ok"], "exact_fields": [""]},  # empty string
    ):
        assert "must be a non-empty" in _req(base + "/cfgidx", "PUT", bad)[
            "error"
        ], bad
    # the failed PUTs created nothing: a good PUT now succeeds
    assert "created" in _req(base + "/cfgidx", "PUT", {"fields": ["title"]})[
        "status"
    ]
    _req(base + "/cfgidx", "DELETE")


def test_dsl_limit_defaults_to_server_k(spark, tmp_path):
    """Both search bodies on one server honor its configured -k
    default: the DSL route's limit fell back to a hardcoded 10
    regardless of default_k."""
    from neosearch_spark.httpserve import serve_http

    root = str(tmp_path / "kroot")
    docs = assign_doc_ids(synth_transcripts(spark, 40, seed=5))
    IndexBuilder(f"{root}/kidx", span=64, exact_fields=["role"]).build(docs)
    srv = serve_http(spark, root, port=0, default_k=3)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        out = _req(base + "/kidx", "POST", {"query": {"role": "user"}})
        assert out["total"] > 3 and len(out["results"]) == 3
        # explicit limit still wins
        out = _req(
            base + "/kidx", "POST", {"query": {"role": "user"}, "limit": 5}
        )
        assert len(out["results"]) == 5
    finally:
        srv.shutdown()


def test_pending_prefix_value_type_validates_like_live(http_srv):
    """$prefix VALUE-type errors must 400 identically pending vs
    live: the type check lives in _eval_dsl itself, so the stub-backed
    pending path and the live path raise the same error (the stubs
    previously accepted any $prefix value → 200 pending / 400 live)."""
    srv, base = http_srv
    assert "error" not in _req(base + "/pfxtyped", "PUT", {"fields": ["text"]})
    try:
        body = {"query": {"text": {"$prefix": 123}}}
        pend = _req(base + "/pfxtyped/", "POST", body)
        live = _req(base + "/warmidx/", "POST", body)
        assert "error" in pend and "error" in live
        assert pend["error"] == live["error"]  # same message, same status
        assert "$prefix" in pend["error"]
        # a string $prefix on the pending index still answers empty
        ok = _req(
            base + "/pfxtyped/", "POST", {"query": {"text": {"$prefix": "a"}}}
        )
        assert ok == {"total": 0, "results": []}
    finally:
        _req(base + "/pfxtyped", "DELETE")


def test_add_racing_delete_cannot_resurrect_index(spark, tmp_path, monkeypatch):
    """POST add re-checks existence INSIDE write_lock: an add whose
    route-level (unlocked) exists() passed just before a DELETE
    completed must answer the missing-index error, NOT recreate the
    acknowledged-deleted index with inferred fields."""
    import shutil as _shutil
    import threading as _threading

    root = str(tmp_path / "race_root")
    srv = serve_http(spark, root, port=0)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert "created" in _req(
            base + "/raceidx", "PUT", {"fields": ["text"]}
        )["status"]
        cls = type(srv)
        real_exists = cls.exists
        state = {"fired": False}

        def racy_exists(self, name):
            ok = real_exists(self, name)
            if ok and name == "raceidx" and not state["fired"]:
                # the DELETE lands in the window between the
                # route-level check and the add taking write_lock
                state["fired"] = True
                with self.write_lock:
                    self.invalidate(name)
                    _shutil.rmtree(self.index_dir(name))
                return True  # what the pre-delete check observed
            return ok

        monkeypatch.setattr(cls, "exists", racy_exists)
        resp = _req(base + "/raceidx/5", "POST", {"text": "alpha beta"})
        monkeypatch.undo()
        assert resp == {"error": "Index 'raceidx' doesn't exists."}
        # NOT resurrected: no directory, no create.json, nothing indexed
        assert not srv.exists("raceidx")
        assert not os.path.exists(srv.index_dir("raceidx"))
    finally:
        srv.shutdown()


def test_create_write_failure_does_not_poison_name(spark, tmp_path, monkeypatch):
    """A PUT whose create.json write dies mid-stream must answer a
    JSON error and leave NO trace (tmp + os.replace): a truncated
    create.json would make exists() true — blocking the corrective
    PUT with already-exists — while every add 400s on json.load,
    poisoning the name until someone hand-deletes the file."""
    import threading as _threading

    import neosearch_spark.httpserve as hs

    root = str(tmp_path / "atomic_root")
    srv = serve_http(spark, root, port=0)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        real_dump = hs.json.dump

        def dying_dump(obj, fp, **kw):
            fp.write('{"fields": ')  # partial bytes hit the disk...
            fp.flush()
            raise OSError("disk full")  # ...then the write dies

        monkeypatch.setattr(hs.json, "dump", dying_dump)
        resp = _req(base + "/atomidx", "PUT", {"fields": ["text"]})
        monkeypatch.setattr(hs.json, "dump", real_dump)
        assert resp == {"error": "disk full"}
        # nothing persisted: not exists, no truncated file, no .tmp
        assert not srv.exists("atomidx")
        d = srv.index_dir("atomidx")
        assert not os.path.exists(os.path.join(d, "create.json"))
        assert not os.path.exists(os.path.join(d, "create.json.tmp"))
        # the retry PUT succeeds — the name was never poisoned
        assert "created" in _req(
            base + "/atomidx", "PUT", {"fields": ["text"]}
        )["status"]
    finally:
        srv.shutdown()


def test_delete_fs_failure_answers_json(spark, tmp_path, monkeypatch):
    """DELETE answers {"error": ...} JSON when the filesystem removal
    fails, like every other route — an escaping OSError dropped the
    connection and printed a traceback onto the JSON status stream."""
    import threading as _threading

    import neosearch_spark.httpserve as hs

    root = str(tmp_path / "delfail_root")
    srv = serve_http(spark, root, port=0)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert "created" in _req(
            base + "/delidx", "PUT", {"fields": ["text"]}
        )["status"]

        def dying_rmtree(path, **kw):
            raise OSError("permission denied mid-removal")

        monkeypatch.setattr(hs.shutil, "rmtree", dying_rmtree)
        resp = _req(base + "/delidx", "DELETE")
        monkeypatch.undo()
        assert resp == {"error": "permission denied mid-removal"}
        # the index is still there and a clean DELETE now works
        assert srv.exists("delidx")
        assert _req(base + "/delidx", "DELETE")["status"] == "Index 'delidx' deleted."
    finally:
        srv.shutdown()


def test_randomized_op_sequence_server_stays_consistent(spark, tmp_path):
    """Seeded random walk over the full route table (valid AND
    malformed requests interleaved): every response must parse as a
    JSON object, the server must never drop a connection, and the
    observable index-existence model must track a driver-side model
    exactly (create/delete/add visibility, already-exists and
    missing-index errors included)."""
    import random
    import threading as _threading

    root = str(tmp_path / "fuzz_root")
    srv = serve_http(spark, root, port=0)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rng = random.Random(1337)
    names = ["fuzza", "fuzzb", "fuzzc"]
    model: dict[str, set[int]] = {}  # name -> doc ids added
    try:
        for _step in range(60):
            name = rng.choice(names)
            op = rng.choice(
                ["create", "create_bad", "add", "add_bad", "search",
                 "dsl", "dsl_bad", "get", "delete", "info"]
            )
            if op == "create":
                r = _req(base + f"/{name}", "PUT", {"fields": ["text"]})
                if name in model:
                    assert r == {"error": f"Index '{name}' already exists."}
                else:
                    assert r == {"status": f"Index '{name}' created."}
                    model[name] = set()
            elif op == "create_bad":
                r = _req(base + f"/{name}", "PUT", {"fields": "text"})
                if name in model:
                    # already-exists wins over the malformed body
                    assert r == {"error": f"Index '{name}' already exists."}
                else:
                    assert "must be a non-empty" in r["error"]
            elif op == "add":
                did = rng.randint(1, 6)
                r = _req(
                    base + f"/{name}/{did}", "POST",
                    {"text": f"tok{rng.randint(1, 4)} alpha"},
                )
                if name in model:
                    assert r == {"status": f"Document {did} indexed."}
                    model[name].add(did)
                else:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
            elif op == "add_bad":
                r = _req(base + f"/{name}/notanint", "POST", {"text": "x"})
                if name in model:
                    assert r == {"error": "Invalid document id"}
                else:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
            elif op == "search":
                r = _req(base + f"/{name}", "POST", {"queries": ["alpha"]})
                if name not in model:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
                elif not model[name]:
                    assert r["batch"][0]["results"] == []
                else:
                    got = {x["doc_id"] for x in r["batch"][0]["results"]}
                    assert got == model[name]  # every doc contains 'alpha'
            elif op == "dsl":
                r = _req(
                    base + f"/{name}", "POST",
                    {"query": {"text": {"$prefix": "tok"}}},
                )
                if name not in model:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
                else:
                    assert {x["doc_id"] for x in r["results"]} == model[name]
                    assert r["total"] == len(model[name])
            elif op == "dsl_bad":
                r = _req(
                    base + f"/{name}", "POST",
                    {"query": {"text": {"$prefix": 5}}},
                )
                if name not in model:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
                else:
                    # identical error pending or live
                    assert r["error"] == "$prefix value must be a string, got int"
            elif op == "get":
                did = rng.randint(1, 6)
                r = _req(base + f"/{name}/{did}")
                if name not in model:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
                elif did in model[name]:
                    assert r["doc_id"] == did
                else:
                    assert "error" in r
            elif op == "delete":
                r = _req(base + f"/{name}", "DELETE")
                if name in model:
                    assert r == {"status": f"Index '{name}' deleted."}
                    del model[name]
                else:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
            elif op == "info":
                r = _req(base + f"/{name}")
                if name in model:
                    assert "error" not in r
                else:
                    assert r == {"error": f"Index '{name}' doesn't exists."}
    finally:
        srv.shutdown()


def test_dsl_phrase_wildcard_over_http(http_srv):
    """The r5 $phrase / $wildcard clauses are live on the HTTP
    transport (it routes through the same _eval_dsl), and malformed
    values 400 with a JSON error while the process stays up."""
    srv, base = http_srv
    out = _req(base + "/warmidx", "POST",
               {"query": {"text": {"$phrase": "neoway business solution"}},
                "limit": 5})
    assert out["total"] > 0
    assert all("Neoway Business Solution" == r["text"] for r in out["results"])
    out = _req(base + "/warmidx", "POST",
               {"query": {"text": {"$wildcard": "tok1?"}}, "limit": 3})
    assert out["total"] > 0 and len(out["results"]) == 3
    assert "$wildcard value" in _req(
        base + "/warmidx", "POST", {"query": {"text": {"$wildcard": 3}}}
    )["error"]
    assert "$phrase value" in _req(
        base + "/warmidx", "POST", {"query": {"text": {"$phrase": "  "}}}
    )["error"]
    assert _req(base + "/")["status"] == "alive"


def test_mlt_route(spark, http_srv):
    """GET /{index}/{id}/_mlt answers BM25-scored similar docs
    (source excluded, k respected), validates query params, and
    404-bodies an unknown document."""
    from neosearch_spark.query import SparkIndex

    srv, base = http_srv
    idx = SparkIndex(spark, f"{srv.root}/warmidx")
    some_id = idx.docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    out = _req(f"{base}/warmidx/{some_id}/_mlt?k=5")
    assert out["doc_id"] == some_id
    assert 0 < len(out["results"]) <= 5
    assert all(r["doc_id"] != some_id for r in out["results"])
    # ≡ the library call
    want = [(r["doc_id"], r["score"])
            for r in idx.more_like_this(some_id, k=5).collect()]
    got = [(r["doc_id"], r["score"]) for r in out["results"]]
    assert got == want
    assert "not found" in _req(f"{base}/warmidx/999999999/_mlt")["error"]
    assert "k must be" in _req(f"{base}/warmidx/{some_id}/_mlt?k=0")["error"]
    assert "n_terms must be" in _req(
        f"{base}/warmidx/{some_id}/_mlt?n_terms=x"
    )["error"]
    # _mlt is GET-only, same contract as _analyze
    assert "GET route" in _req(
        f"{base}/warmidx/{some_id}/_mlt", "POST", {}
    )["error"]
    assert _req(base + "/")["status"] == "alive"
