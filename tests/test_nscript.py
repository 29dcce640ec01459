"""``.ns`` command-file dump/replay — parser parity with the
reference's cli parser (``cmd/cli/parser/parser_test.go:13-121``)
plus the Spark-side dump → replay → identical-index roundtrip."""

from __future__ import annotations

import pytest

from neosearch_spark.nscript import Command, dump_ns, parse_ns, replay_ns


# ------------------------------------------------------------- parser

def test_parse_single_command_semicolon():
    cmds = parse_ns('using sample.TEST mergeset a 1;')
    assert cmds == [
        Command(index="sample", database="TEST", verb="mergeset", key="a", value=1)
    ]


def test_parse_reference_suite():
    # the multi-command case from parser_test.go:31-115 (final
    # statement without a trailing semicolon)
    text = r'''using sample.test.idx mergeset a 2;
         using sample.document.db set 1 "{id: 1, name: \"teste\"}";
         using sample.lalala set hello "world";
         using sample.mimimi get hello;
         using sample.lelele delete "teste";
         using sample.bleh.idx get uint(1);
         using sample.aaaa.bbb set uint(10000) int(10);
         using sample.bbbb.ccc mergeset "hellooooooooooooooooo" uint(102999299112211223);
         using sample.aaa delete "bbb"
    '''
    cmds = parse_ns(text)
    assert [
        (c.index, c.database, c.verb, c.key, c.value) for c in cmds
    ] == [
        ("sample", "test.idx", "mergeset", "a", 2),
        ("sample", "document.db", "set", 1, '{id: 1, name: "teste"}'),
        ("sample", "lalala", "set", "hello", "world"),
        ("sample", "mimimi", "get", "hello", None),
        ("sample", "lelele", "delete", "teste", None),
        ("sample", "bleh.idx", "get", 1, None),
        ("sample", "aaaa.bbb", "set", 10000, 10),
        ("sample", "bbbb.ccc", "mergeset", "hellooooooooooooooooo", 102999299112211223),
        ("sample", "aaa", "delete", "bbb", None),
    ]


def test_parse_underscore_index_no_semicolon():
    # parser_test.go:118-121
    cmds = parse_ns('using sample.user_password set admin "s3cr3t"')
    assert cmds == [
        Command(
            index="sample", database="user_password", verb="set",
            key="admin", value="s3cr3t",
        )
    ]


def test_parse_float_cast():
    # parser.go:205-239 typed casts include float()
    cmds = parse_ns("using s.scores.idx set k float(1.5);")
    assert cmds[0].value == 1.5


def test_parse_batch_flushbatch():
    cmds = parse_ns("using s.document.db batch; using s.document.db flushbatch;")
    assert [(c.verb, c.key, c.value) for c in cmds] == [
        ("batch", None, None),
        ("flushbatch", None, None),
    ]


def test_parse_escaped_backslash_roundtrip():
    # dump escapes backslash-then-quote; the parser must invert it
    cmds = parse_ns(r'using s.document.db set 1 "a\\b\"c";')
    assert cmds[0].value == 'a\\b"c'


@pytest.mark.parametrize(
    "bad",
    [
        "using sample.x frobnicate a 1;",     # unknown verb
        "using sample.x set onlykey;",        # set needs value
        "using sample.x get a b;",            # get takes one arg
        "using sample.x batch 1;",            # batch takes none
        "using nodatabase set a 1;",          # target needs a dot
        "set a 1;",                           # missing using
    ],
)
def test_parse_rejects_invalid(bad):
    with pytest.raises(ValueError):
        parse_ns(bad)


# ----------------------------------------------------- dump + replay

def _build_small(spark, path, n=80, seed=11):
    from neosearch_spark.build import IndexBuilder
    from neosearch_spark.docids import assign_doc_ids
    from neosearch_spark.synth import synth_transcripts

    docs = assign_doc_ids(synth_transcripts(spark, n, seed=seed))
    IndexBuilder(str(path), span=64, exact_fields=["role", "tool"]).build(docs)
    return docs


def _sig(spark, path):
    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, str(path))
    term = sorted(r["doc_id"] for r in si.term_docs("tok1").collect())
    role = sorted(
        r["doc_id"] for r in si.term_docs("assistant", field="role").collect()
    )
    top = [
        (r["doc_id"], round(r["score"], 9))
        for r in si.bm25_topk("tok1 tok3", 10).collect()
    ]
    return term, role, top


def test_dump_replay_roundtrip(spark, tmp_path):
    src, dst = tmp_path / "src_idx", tmp_path / "dst_idx"
    _build_small(spark, src)
    ns = tmp_path / "dump.ns"
    n = dump_ns(spark, str(src), str(ns), name="sample")
    assert n == 80
    text = ns.read_text()
    assert text.startswith("using sample.document.db batch;")
    assert text.rstrip().endswith("using sample.document.db flushbatch;")
    assert 'using sample.document.db set 0 "' in text

    res = replay_ns(
        spark, str(dst), text,
        build_kwargs={"exact_fields": ["role", "tool"], "span": 64},
    )
    assert res["n_set"] == 80
    assert _sig(spark, dst) == _sig(spark, src)


def test_dump_raw_posting_stream(spark, tmp_path):
    # raw=True appends the reference's complete KV-dump form: every
    # .idx posting as a mergeset statement (docs/dump-restore.md:5-17)
    from neosearch_spark.query import SparkIndex

    src, dst = tmp_path / "raw_src", tmp_path / "raw_dst"
    _build_small(spark, src)
    ns = tmp_path / "raw.ns"
    dump_ns(spark, str(src), str(ns), name="sample", raw=True)
    text = ns.read_text()
    cmds = parse_ns(text)
    merges = [c for c in cmds if c.verb == "mergeset"]
    assert merges, "raw dump carries no posting statements"
    assert all(
        c.index == "sample" and c.database.endswith(".idx") for c in merges
    )
    # the statement stream IS the index's full posting multiset
    got = sorted((c.database[: -len(".idx")], c.key, c.value) for c in merges)
    want = sorted(
        (r["field"], r["term"], r["doc_id"])
        for r in SparkIndex(spark, str(src)).postings().collect()
    )
    assert got == want
    # replaying the complete dump HERE rebuilds the identical index
    # from the document stream alone — every raw posting write is
    # counted as skipped derived data, none silently lost
    res = replay_ns(
        spark, str(dst), text,
        build_kwargs={"exact_fields": ["role", "tool"], "span": 64},
    )
    assert res["n_skipped_derived"] == len(merges)
    assert _sig(spark, dst) == _sig(spark, src)


def test_replay_maintenance_and_gets(spark, tmp_path):
    idx = tmp_path / "r_idx"
    _build_small(spark, idx, n=40)
    # delete two docs, then read-your-writes lookups; .idx mergesets
    # are derived data and must be skipped, not applied
    text = """
    using sample.text.idx mergeset "tok1" 999;
    using sample.document.db delete 0;
    using sample.document.db delete 1;
    using sample.document.db get 0;
    using sample.text.idx get tok1;
    using sample.somekv set hello "world";
    """
    res = replay_ns(spark, str(idx), text)
    assert res["n_deleted"] == 2
    assert res["n_skipped_derived"] == 2
    assert res["gets"][0]["doc"] is None            # deleted doc gone
    assert 0 not in res["gets"][1]["doc_ids"]
    assert 1 not in res["gets"][1]["doc_ids"]

    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, str(idx))
    assert si.get_docs(
        spark.createDataFrame([(0,), (1,)], "doc_id long")
    ).count() == 0


def test_replay_duplicate_set_last_wins(spark, tmp_path):
    # reference `set` overwrites; inside one batch the LAST payload
    # for an id must win (the engine's upsert rejects duplicate ids)
    idx = tmp_path / "dup_idx"
    text = r'''
    using s.document.db set 1 "{\"doc_id\": 1, \"text\": \"alpha beta\"}";
    using s.document.db set 2 "{\"doc_id\": 2, \"text\": \"gamma\"}";
    using s.document.db set 1 "{\"doc_id\": 1, \"text\": \"delta\"}";
    '''
    res = replay_ns(
        spark, str(idx), text, build_kwargs={"analyzed_fields": ["text"]}
    )
    assert res["n_set"] == 2

    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, str(idx))
    assert [r["doc_id"] for r in si.term_docs("delta").collect()] == [1]
    assert si.term_docs("alpha").count() == 0


def test_replay_chunked_flush_and_upsert(spark, tmp_path):
    # chunk=2 forces mid-stream flushes: first flush CREATES the
    # index, later ones route through partition-scoped upsert
    idx = tmp_path / "chunk_idx"
    lines = [
        'using s.document.db set %d "{\\"doc_id\\": %d, \\"text\\": \\"tokA doc%d\\"}";'
        % (i, i, i)
        for i in range(5)
    ]
    res = replay_ns(
        spark, str(idx), "\n".join(lines),
        build_kwargs={"analyzed_fields": ["text"]}, chunk=2,
    )
    assert res["n_set"] == 5
    assert res["n_flushes"] == 3

    from neosearch_spark.query import SparkIndex

    si = SparkIndex(spark, str(idx))
    assert sorted(
        r["doc_id"] for r in si.term_docs("toka").collect()
    ) == [0, 1, 2, 3, 4]


def test_cli_dump_replay_subcommands(spark, tmp_path, capsys):
    import json

    from neosearch_spark import cli

    src, dst = tmp_path / "cli_src", tmp_path / "cli_dst"
    _build_small(spark, src, n=40)
    ns = tmp_path / "cli.ns"

    rc = cli.main(["dump", "--index", str(src), "--out", str(ns),
                   "--name", "sample"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out == {"status": "ok", "docs": 40, "out": str(ns)}

    rc = cli.main(["replay", "--input", str(ns), "--index", str(dst),
                   "--fields", "text", "--exact-fields", "role,tool"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok"
    assert out["n_set"] == 40
    assert _sig(spark, dst) == _sig(spark, src)


def test_dump_rejects_dotted_name(tmp_path):
    with pytest.raises(ValueError, match="dot-free word"):
        dump_ns(None, str(tmp_path), str(tmp_path / "o.ns"), name="my.index")


def test_dump_rejects_undumpable_streamed_docs(tmp_path):
    # streamed docs live as doc_len_extra rows with no doc-store
    # payload — a dump would silently lose them (filesystem check,
    # raised before any Spark work)
    d = tmp_path / "idx" / "doc_len_extra" / "doc_part=0"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"PAR1")
    with pytest.raises(ValueError, match="doc_len_extra"):
        dump_ns(None, str(tmp_path / "idx"), str(tmp_path / "o.ns"))


def test_dump_rejects_pending_deltas(tmp_path):
    d = tmp_path / "idx" / "tf_delta" / "epoch=3"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"PAR1")
    with pytest.raises(ValueError, match="tf_delta"):
        dump_ns(None, str(tmp_path / "idx"), str(tmp_path / "o.ns"))


def test_replay_rejects_unknown_columns(spark, tmp_path):
    # spark.read.json with an explicit schema silently drops unknown
    # keys — replay must fail loudly instead of losing the column
    idx = tmp_path / "uk_idx"
    _build_small(spark, idx, n=20)
    bad = (
        'using s.document.db set 999 "{\\"doc_id\\": 999, '
        '\\"text\\": \\"zzz\\", \\"mystery_col\\": 5}";'
    )
    with pytest.raises(ValueError, match="mystery_col"):
        replay_ns(spark, str(idx), bad)


def test_dump_preserves_null_then_valued_columns(spark, tmp_path):
    # to_json must keep null fields (ignoreNullFields=false): with
    # chunk=1 the fresh index's schema comes from chunk 1 alone, and
    # a column that is null there must still exist for chunk 2
    from neosearch_spark.build import IndexBuilder
    from neosearch_spark.query import SparkIndex

    src, dst = tmp_path / "nv_src", tmp_path / "nv_dst"
    docs = spark.createDataFrame(
        [(0, "alpha beta", None), (1, "gamma", "hammer")],
        "doc_id long, text string, tool string",
    )
    IndexBuilder(str(src), exact_fields=["tool"]).build(docs)
    ns = tmp_path / "nv.ns"
    dump_ns(spark, str(src), str(ns))
    # inside the quoted .ns payload the JSON's quotes are escaped
    assert '\\"tool\\":null' in ns.read_text().replace(" ", "")

    replay_ns(
        spark, str(dst), ns.read_text(),
        build_kwargs={"analyzed_fields": ["text"], "exact_fields": ["tool"]},
        chunk=1,
    )
    si = SparkIndex(spark, str(dst))
    assert [r["doc_id"] for r in si.term_docs("hammer", field="tool").collect()] == [1]


# ------------------------------------------- streaming parser (r5)

def test_parse_bare_using_key_value_is_literal():
    """An unquoted key/value literally spelled 'using' must not
    split the statement (the reference parser only terminates on
    ';'/EOF); the implicit 'using' boundary applies only once the
    current statement has its full verb arity."""
    cmds = parse_ns("using sample.x set using using;")
    assert cmds == [
        Command(index="sample", database="x", verb="set",
                key="using", value="using")
    ]
    # boundary still applies between arity-complete statements
    cmds = parse_ns(
        "using a.t.idx get tok1 using b.t.idx get tok2"
    )
    assert [(c.index, c.verb, c.key) for c in cmds] == [
        ("a", "get", "tok1"), ("b", "get", "tok2")
    ]


def test_iter_parse_ns_streams_chunk_split_tokens():
    """iter_parse_ns must yield identical commands when the input
    arrives in chunks that split tokens, quoted payloads (including
    raw newlines inside quotes), and statements arbitrarily."""
    from neosearch_spark.nscript import iter_parse_ns

    text = (
        'using sample.document.db set 123 "line one\nline two";\n'
        'using sample.test.idx mergeset "hello" uint(42);\n'
        "using sample.document.db flushbatch;\n"
        "using sample.document.db get 123"
    )
    want = parse_ns(text)
    assert len(want) == 4
    # every chunking of the text, down to single characters
    for size in (1, 3, 7, len(text)):
        chunks = [text[i:i + size] for i in range(0, len(text), size)]
        assert list(iter_parse_ns(chunks)) == want, f"chunk size {size}"


def test_iter_parse_ns_is_incremental():
    """Commands must come out as their statements complete — not
    buffered to EOF (the replay memory contract: one pending
    statement resident, not the parsed dump)."""
    from neosearch_spark.nscript import iter_parse_ns

    def gen():
        yield "using a.document.db set 1 \"x\";"
        assert got, "first statement must be yielded before more input is pulled"
        yield "using a.document.db set 2 \"y\";"

    got: list = []
    it = iter_parse_ns(gen())
    got.append(next(it))
    assert got[0].key == 1
    assert [c.key for c in it] == [2]


def test_iter_parse_ns_rejects_garbage_at_eof():
    from neosearch_spark.nscript import iter_parse_ns

    with pytest.raises(ValueError):
        list(iter_parse_ns(["using a.document.db set 1 @@@"]))


def test_iter_parse_ns_large_multichunk_payload_linear():
    """A quoted payload spanning thousands of chunks parses correctly
    and in linear time: the scanner resumes the closing-quote hunt at
    the new bytes instead of re-scanning the payload per chunk (a
    quadratic rescan of this 400 KB / 4000-chunk input would take
    minutes; linear is instant).  Escapes landing exactly on chunk
    edges must survive the resume."""
    import time

    from neosearch_spark.nscript import iter_parse_ns

    # payload with escaped quotes/backslashes sprinkled so some land
    # on chunk boundaries
    unit = 'abc \\" def \\\\ ghi '
    payload = unit * (400_000 // len(unit))
    text = (
        f'using big.document.db set 1 "{payload}";\n'
        "using big.document.db get 1"
    )
    chunks = [text[i:i + 100] for i in range(0, len(text), 100)]
    t0 = time.time()
    cmds = list(iter_parse_ns(chunks))
    dt = time.time() - t0
    assert len(cmds) == 2
    assert cmds[0].verb == "set" and cmds[0].key == 1
    assert cmds[0].value == payload.replace('\\"', '"').replace("\\\\", "\\")
    assert cmds[1].verb == "get"
    assert dt < 5.0, f"streaming parse took {dt:.1f}s — quadratic rescan?"


# ------------------------------------------- property-based round-trip

import re  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from neosearch_spark.nscript import iter_parse_ns  # noqa: E402

_WORD = r"[A-Za-z_][A-Za-z0-9_\-]{0,8}"
_WORD_DOTTED = r"[A-Za-z_][A-Za-z0-9_.\-]{0,8}"


def _esc(s: str, q: str) -> str:
    return s.replace("\\", "\\\\").replace(q, "\\" + q)


@st.composite
def _ns_statement(draw):
    """One valid statement → (Command expected, formatted text)."""
    index = draw(st.from_regex(_WORD, fullmatch=True))
    quoted_target = draw(st.booleans())
    if quoted_target:
        # quoted targets may carry arbitrary text in the db part
        # (split still happens at the FIRST dot of the unquoted form,
        # and the index part above is dot-free)
        db = draw(st.text(min_size=1, max_size=10))
        tgt = f'"{_esc(index + "." + db, chr(34))}"'
    else:
        db = draw(st.from_regex(_WORD_DOTTED, fullmatch=True))
        tgt = f"{index}.{db}"
    verb = draw(st.sampled_from(["set", "mergeset", "get", "delete",
                                 "batch", "flushbatch"]))
    arity = {"set": 2, "mergeset": 2, "get": 1, "delete": 1,
             "batch": 0, "flushbatch": 0}[verb]

    def fmt_arg(v):
        if isinstance(v, int):
            style = draw(st.sampled_from(["bare", "uint", "int"]))
            if style == "uint" and v >= 0:
                return f"uint({v})"
            if style == "int":
                return f"int( {v} )"  # internal spaces are legal
            return str(v)
        if draw(st.booleans()):
            return f'"{_esc(v, chr(34))}"'
        return f"'{_esc(v, chr(39))}'"

    args, fargs = [], []
    for _ in range(arity):
        v = draw(
            st.one_of(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.text(max_size=12),
                # bare-word form (incl. the literal word 'using',
                # which must NOT split an arity-incomplete statement)
                st.from_regex(_WORD_DOTTED, fullmatch=True),
                st.just("using"),
            )
        )
        if isinstance(v, str) and draw(st.booleans()) and re.fullmatch(
            _WORD_DOTTED, v
        ):
            fargs.append(v)  # bare word
        else:
            fargs.append(fmt_arg(v))
        args.append(v)
    cmd = Command(
        index=index, database=db, verb=verb,
        key=args[0] if arity > 0 else None,
        value=args[1] if arity > 1 else None,
    )
    ws = st.sampled_from([" ", "  ", "\n", "\t", " \n "])
    toks = ["using", tgt, verb, *fargs]
    text = draw(ws).join([""] + toks).lstrip() if draw(
        st.booleans()
    ) else " ".join(toks)
    return cmd, text


@given(
    stmts=st.lists(_ns_statement(), min_size=1, max_size=8),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_ns_roundtrip_fuzz(stmts, data):
    """format → parse ≡ identity for random valid statements, under
    RANDOM chunk boundaries (the streaming scanner must reassemble
    statements and token tails split at any byte)."""
    parts = []
    for i, (_c, text) in enumerate(stmts):
        last = i == len(stmts) - 1
        # the final statement may omit its semicolon (EOF terminates);
        # every other statement keeps it
        sep = ";" if not last or data.draw(st.booleans()) else ""
        parts.append(text + sep)
    blob = data.draw(st.sampled_from([" ", "\n", "\n  "])).join(parts)
    expected = [c for c, _t in stmts]

    assert parse_ns(blob) == expected

    # streaming form over arbitrary chunkings — token tails may split
    # anywhere, including inside quotes, escapes, and typed wrappers
    n = len(blob)
    cuts = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=n), max_size=6)
        )
    )
    bounds = [0, *cuts, n]
    chunks = [blob[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]
    assert list(iter_parse_ns(chunks)) == expected


def test_iter_parse_ns_fails_fast_on_dead_byte():
    """A byte no future input can tokenize must error on the FEED
    that contains it — not buffer the rest of the dump and report at
    EOF (the bounded-memory contract must hold on malformed input)."""
    from neosearch_spark.nscript import iter_parse_ns

    fed = []

    def chunks():
        fed.append(1)
        yield "using a.document.db set @ "
        for _ in range(1000):
            fed.append(1)
            yield "x" * 1024  # the 1 MB tail must never be requested

    with pytest.raises(ValueError, match="parse error"):
        list(iter_parse_ns(chunks()))
    assert len(fed) <= 2  # died on the corrupt chunk, not at EOF

    # a bare '-' at the buffer edge is NOT dead: it can grow into a
    # negative number with the next chunk
    from neosearch_spark.nscript import iter_parse_ns as p

    got = list(p(["using a.document.db set -", "1 'x';"]))
    assert got[0].key == -1


def test_executor_rejects_non_integral_float_keys(spark, tmp_path):
    """``float(1.9)``-typed document.db keys must fail loudly — bare
    int() truncated them to a DIFFERENT document's id (set/delete on
    doc 1 when the statement named 1.9)."""
    from neosearch_spark.nscript import NsExecutor, parse_ns

    ex = NsExecutor(spark, str(tmp_path / "fkidx"))
    bad = parse_ns('using a.document.db set float(1.9) \'{"doc_id": 1, "text": "x"}\';')[0]
    with pytest.raises(ValueError, match="must be integers"):
        ex.execute(bad)
    baddel = parse_ns("using a.document.db delete float(7.5);")[0]
    with pytest.raises(ValueError, match="must be integers"):
        ex.execute(baddel)
    # integral float keys convert exactly
    ok = parse_ns('using a.document.db set float(2.0) \'{"doc_id": 2, "text": "y"}\';')[0]
    ex.execute(ok)
    assert ex._sets and ex._sets[-1][0] == 2


def test_iter_parse_ns_malformed_typed_cast_fails_fast():
    """'uint(x' can never match the typed pattern no matter what
    arrives next — the wait-for-the-closing-paren guard must fail NOW
    instead of re-firing every feed and buffering the rest of the
    dump to EOF (the bounded-memory/fail-fast contract)."""
    from neosearch_spark.nscript import iter_parse_ns

    pulled = {"later": 0}

    def chunks():
        yield 'using a.document.db set uint(x) "v"; '
        for _ in range(50):
            pulled["later"] += 1
            yield "using a.document.db get 1; "

    with pytest.raises(ValueError, match="parse error"):
        list(iter_parse_ns(chunks()))
    # died while scanning the corrupt chunk — no later chunk was pulled
    assert pulled["later"] == 0

    # a VIABLE split cast still waits and completes across chunks
    got = list(
        iter_parse_ns(["using a.document.db set uin", "t(4", '2) "v";'])
    )
    assert got[0].key == 42

    # a viable-but-unfinished cast at EOF is an error, not a hang
    with pytest.raises(ValueError, match="parse error"):
        list(iter_parse_ns(["using a.document.db set uint(4"]))


def test_iter_parse_ns_error_offset_is_stream_relative():
    """The buffer trims at every statement boundary, so the error
    offset must count CONSUMED bytes too — a corruption gigabytes
    into a dump is located by its stream offset, not its position
    inside the small pending-statement buffer."""
    from neosearch_spark.nscript import iter_parse_ns

    good = "using a.document.db get 1; " * 40
    bad = good + "@@@"
    with pytest.raises(ValueError, match=f"offset {len(good)}"):
        list(iter_parse_ns([bad[i : i + 7] for i in range(0, len(bad), 7)]))
