"""``.ns`` command-file dump / replay — the executable twin of the
reference's command-language workflow.

The reference tooling processes text files of storage commands
(``/root/reference/docs/dump-restore.md:5-17``) in the syntax parsed
by ``cmd/cli/parser/parser.go:158-456``::

    using sample.document.db set 1 "{\"title\": \"hello\"}";
    using sample.title.idx mergeset "hello" 2;
    using sample.document.db delete 7;

and its dump/restore proposal is "write every KV entry as such a
command; replay the file to restore".  This module keeps the FILE
FORMAT (same statement grammar, so a user's existing ``.ns``
tooling round-trips) but maps execution onto the Spark engine's
actual write paths instead of raw KV ops:

- ``using <name>.document.db set <id> "<json>"`` — batched and
  applied through ``maintenance.upsert_docs`` (partition-scoped
  replace-or-insert; the reference's raw re-``set`` left stale
  postings behind, SURVEY §2.11).
- ``using <name>.document.db delete <id>`` — batched through
  ``maintenance.delete_docs``.
- ``using <name>.<field>.idx get <term>`` — a point posting lookup
  (``SparkIndex.term_docs``); pending writes are flushed first so
  the replay is read-your-writes, like the reference engine.
- ``using <name>.document.db get <id>`` — doc-store point lookup.
- ``batch`` / ``flushbatch`` (``parser.go:101-116``) — replay always
  accumulates; ``flushbatch`` forces the pending group to apply.
- ``set``/``mergeset`` against ``*.idx`` databases are COUNTED AND
  SKIPPED: in this engine posting lists are a pure function of the
  documents (MergeSet happens inside the distributed build /
  upsert), so replaying raw posting writes would bypass the very
  invariants the corrected upsert exists to keep.  A reference dump
  always carries the ``document.db`` stream those rows derive from.

``dump`` emits exactly that replayable document stream (sorted by
doc_id, streamed through ``toLocalIterator`` — bounded driver
memory; this is migration tooling, not a hot path).

Scale: replay applies document batches of ``chunk`` rows through the
same O(touched-partition) upsert/delete paths as the live engine —
the driver only ever holds one pending chunk of command text.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import SparkSession

# ---------------------------------------------------------------- parser

_TOKEN_RE = re.compile(
    r"""
    (?P<dq>  " (?: \\. | [^"\\] )* " )   # double-quoted, \-escapes
  | (?P<sq>  ' (?: \\. | [^'\\] )* ' )   # single-quoted, \-escapes
  | (?P<typed> (?:uint|int|float)\(\s*-?\d+(?:\.\d+)?\s*\) )  # typed casts, parser.go:205-239
  | (?P<num> -?\d+ )
  | (?P<word> [A-Za-z_][A-Za-z0-9_.\-]* )
  | (?P<semi> ; )
  | (?P<ws> \s+ )
    """,
    re.VERBOSE,
)

# proper prefixes of the typed-cast interior (the part after '(' in
# `uint( 42 )`): empty/spaces, a lone '-', or a partial number with
# optional trailing spaces awaiting ')'.  Anything else after
# 'uint(' can NEVER complete the typed pattern — the streaming
# scanner fails fast instead of waiting for more input
_TYPED_INTERIOR_VIABLE = re.compile(r"\s*|\s*-|\s*-?\d+(\.\d*)?\s*")

_VERBS = {"set", "mergeset", "get", "delete", "batch", "flushbatch"}


def _unquote(tok: str) -> str:
    # invert dump's escaping: backslash releases the next char
    # (handles \" \' \\ — the superset of the reference's escaped
    # tokens, parser.go:299-313)
    body = tok[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(body[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


@dataclass
class Command:
    """One parsed statement (the engine.Command analog).

    ``index``/``database`` split the ``using`` target at the FIRST
    dot (parser_test.go:32-49: ``sample.test.idx`` → index
    ``sample``, database ``test.idx``).  ``key``/``value`` are str or
    int (``uint()``/``int()`` wrappers and bare numbers → int)."""

    index: str
    database: str
    verb: str
    key: str | int | None = None
    value: str | int | None = None


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(
                f"ns parse error at offset {pos}: {text[pos:pos + 20]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        yield kind, m.group()


def _lit(kind: str, tok: str) -> str | int | float:
    if kind == "num":
        return int(tok)
    if kind == "typed":
        body = tok[tok.index("(") + 1 : -1]
        return float(body) if tok.startswith("float") else int(body)
    if kind in ("dq", "sq"):
        return _unquote(tok)
    return tok  # bare word key/value is a string


# arg arity per verb — also gates the implicit 'using' statement
# boundary below
_ARITY = {"set": 2, "mergeset": 2, "get": 1, "delete": 1,
          "batch": 0, "flushbatch": 0}


def _statement_complete(cur: list[tuple[str, str]]) -> bool:
    """True when ``cur`` already holds using + target + verb + every
    required argument — the only point where a bare ``using`` word
    can open a NEW statement rather than being a key/value literal
    (the reference parser only terminates on ';'/EOF, so an unquoted
    key or value spelled 'using' must not split a statement that is
    still collecting arguments)."""
    if len(cur) < 3:
        return False
    verb = cur[2][1].lower()
    if cur[2][0] != "word" or verb not in _VERBS:
        return False
    return len(cur) - 3 >= _ARITY[verb]


def _build_command(cur: list[tuple[str, str]]) -> Command:
    if len(cur) < 3 or cur[0][1].lower() != "using" or cur[0][0] != "word":
        raise ValueError(f"bad ns statement: {' '.join(t for _, t in cur)!r}")
    target_kind, target = cur[1]
    tgt = target if target_kind not in ("dq", "sq") else _unquote(target)
    if "." not in tgt:
        raise ValueError(f"using target needs <index>.<database>: {tgt!r}")
    index, database = tgt.split(".", 1)
    verb_kind, verb = cur[2]
    verb = verb.lower()
    if verb_kind != "word" or verb not in _VERBS:
        raise ValueError(f"unknown ns command {verb!r}")
    args = [_lit(k, t) for k, t in cur[3:]]
    if verb in ("set", "mergeset") and len(args) != 2:
        raise ValueError(f"{verb} needs key and value: {tgt!r}")
    if verb in ("get", "delete") and len(args) != 1:
        raise ValueError(f"{verb} needs exactly a key: {tgt!r}")
    if verb in ("batch", "flushbatch") and args:
        raise ValueError(f"{verb} takes no arguments: {tgt!r}")
    return Command(
        index=index,
        database=database,
        verb=verb,
        key=args[0] if args else None,
        value=args[1] if len(args) > 1 else None,
    )


def iter_parse_ns(chunks) -> "Iterator[Command]":
    """Streaming ``.ns`` parser: consume an iterable of text chunks
    (e.g. a file object's lines), yield each ``Command`` as soon as
    its statement completes — only the pending statement's text is
    ever resident, so replaying an arbitrarily large dump keeps
    driver memory bounded (statements may span chunks: quoted
    payloads can contain raw newlines).

    Statements end at ``;``, at a ``using`` that opens the next
    statement (only once the current one has its full verb arity —
    an unquoted key/value literally spelled 'using' stays a
    literal), or at EOF (the final ``;`` may be omitted,
    parser_test.go:118-121).  A chunk boundary can split a token;
    a tail that could still grow into one is retried once more input
    arrives, while a byte no future input can tokenize fails
    IMMEDIATELY — malformed dumps error at the corrupt offset
    instead of buffering the rest of the file to EOF.

    The scan position and the pending token list persist ACROSS
    feeds (the buffer trims at statement boundaries, never rewinds),
    so total tokenization work is O(len(dump)) — a multi-line quoted
    payload does not re-scan its prefix once per chunk."""
    buf = ""
    pos = 0
    # bytes trimmed off the front of ``buf`` at statement boundaries —
    # error offsets report ``consumed + pos`` so a corruption
    # gigabytes into a dump is located by its STREAM offset, not its
    # position inside the small pending-statement buffer
    consumed = 0
    cur: list[tuple[str, str]] = []
    # incremental scan state while blocked inside an unterminated
    # quoted token: (resume offset, escaped-flag) — each feed scans
    # only the NEW bytes for the closing quote, so a giant multi-chunk
    # payload costs O(len) total, not O(len × chunks)
    qstate: tuple[int, bool] | None = None

    def scan(final: bool):
        nonlocal buf, pos, cur, qstate, consumed
        while pos < len(buf):
            m = None if qstate is not None else _TOKEN_RE.match(buf, pos)
            if m is None and (qstate is not None or buf[pos] in "\"'"):
                # blocked inside an unterminated quote: resume the
                # closing-quote hunt at the NEW bytes only
                q = buf[pos]
                off, esc = qstate if qstate is not None else (pos + 1, False)
                closed = -1
                while off < len(buf):
                    c = buf[off]
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == q:
                        closed = off
                        break
                    off += 1
                if closed < 0:
                    qstate = (off, esc)
                    if final:
                        raise ValueError(
                            f"ns parse error at offset {consumed + pos}: "
                            f"{buf[pos:pos + 20]!r}"
                        )
                    return  # still inside the quote — wait for more
                qstate = None  # closing quote arrived: match succeeds now
                m = _TOKEN_RE.match(buf, pos)
            if m is None:
                # only a bare '-' touching the buffer edge can still
                # grow into a token (a negative number); every other
                # unmatchable byte is dead no matter what input
                # follows — fail NOW instead of buffering the rest of
                # the dump to report the same error at EOF (the
                # bounded-memory contract holds on malformed input)
                if final or not (
                    buf[pos] == "-" and pos == len(buf) - 1
                ):
                    raise ValueError(
                        f"ns parse error at offset {consumed + pos}: "
                        f"{buf[pos:pos + 20]!r}"
                    )
                return  # token split across chunks — wait for more
            if not final and m.end() == len(buf) and m.lastgroup in (
                "word", "num", "typed"
            ):
                # token touches the buffer edge and could still grow
                # (e.g. 'flushb' + 'atch', '12' + '3') — wait for more
                return
            if (
                not final
                and m.lastgroup == "word"
                and m.group() in ("uint", "int", "float")
                and m.end() < len(buf)
                and buf[m.end()] == "("
            ):
                # 'uint(' with the typed cast's ')' not yet arrived:
                # committing 'uint' as a bare word here would turn
                # uint(42) into word + garbage once the rest lands —
                # wait, but ONLY while the bytes after '(' are still a
                # viable prefix of the typed interior.  'uint(x' can
                # never match no matter what follows: waiting on it
                # would re-fire this guard every feed and buffer the
                # rest of the dump to EOF, breaking both the fail-fast
                # and the bounded-memory contracts
                if _TYPED_INTERIOR_VIABLE.fullmatch(buf, m.end() + 1):
                    return
                raise ValueError(
                    f"ns parse error at offset {consumed + pos}: "
                    f"{buf[pos:pos + 20]!r}"
                )
            kind = m.lastgroup
            tok = m.group()
            if kind == "semi":
                if cur:
                    yield _build_command(cur)
                    cur = []
                # statement boundary: everything before it is done —
                # trim the buffer so memory tracks the PENDING
                # statement, not the dump
                consumed += m.end()
                buf = buf[m.end():]
                pos = 0
                continue
            pos = m.end()
            if kind == "ws":
                continue
            if kind == "word" and tok.lower() == "using" and _statement_complete(cur):
                yield _build_command(cur)
                cur = [(kind, tok)]
                consumed += m.start()
                buf = buf[m.start():]
                pos = len(tok)
                continue
            cur.append((kind, tok))

    for chunk in chunks:
        buf += chunk
        yield from scan(final=False)
    yield from scan(final=True)
    if cur:
        yield _build_command(cur)


def parse_ns(text: str) -> list[Command]:
    """Parse ``.ns`` statements: ``using <index>.<db> <verb> [key]
    [value]`` terminated by ``;`` (the final statement may omit it,
    parser_test.go:118-121).  List form of ``iter_parse_ns``."""
    return list(iter_parse_ns([text]))


# ---------------------------------------------------------------- dump

def _ns_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _has_parquet(root: str) -> bool:
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def dump_ns(
    spark: SparkSession, index_dir: str, out_path: str, name: str = "index",
    raw: bool = False,
) -> int:
    """Write the index's replayable ``.ns`` document stream: one
    ``using <name>.document.db set <doc_id> "<json>";`` line per
    stored document (doc_id order), wrapped in ``batch`` /
    ``flushbatch``.  Internal columns (``dl``, ``doc_part``) are
    derived data and stay out of the dump.  Returns the doc count.

    ``raw=True`` additionally appends the ``.idx`` posting stream in
    the reference's own KV-dump form — one ``using <name>.<field>.idx
    mergeset "<term>" <doc_id>;`` statement per posting, (field,
    term, doc_id)-ordered, each field's run wrapped in ``batch`` /
    ``flushbatch`` — so the dump is the reference's COMPLETE
    byte-level store dump (``docs/dump-restore.md:5-17``): a
    reference engine replaying it rebuilds both ``document.db`` and
    every ``.idx`` database.  Replaying it HERE still counts-and-
    skips the mergesets as derived data (module docstring) and
    rebuilds identical postings from the document stream — asserted
    by test.  The posting stream is decoded distributed and streamed
    through ``toLocalIterator`` like the doc stream (bounded driver
    memory; the full sort is migration-tool cost, not a hot path).

    Refuses an index holding documents the dump CANNOT carry:
    streamed docs live as postings + ``doc_len_extra`` rows with no
    doc-store payload (streaming.py delta design), and uncompacted
    ``*_delta`` dirs are pending writes — a dump that silently
    dropped either would "restore" a smaller index."""
    from pyspark.sql import functions as F

    from .maintenance import _load_manifest, read_docs

    # the using-target must lex as ONE word token whose first dot
    # starts the database part (parser_test.go:32-49): a dotted,
    # spaced, or quoted name would produce a dump every statement of
    # which is skipped or unparseable on replay
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_\-]*", name):
        raise ValueError(
            f"dump name must be a dot-free word ([A-Za-z_][A-Za-z0-9_-]*): "
            f"{name!r}"
        )
    for sub, why in (
        ("doc_len_extra", "streamed docs have no stored payload"),
        ("tf_delta", "uncompacted stream deltas pending"),
        ("doc_len_delta", "uncompacted stream deltas pending"),
    ):
        p = os.path.join(index_dir, sub)
        if os.path.isdir(p) and _has_parquet(p):
            raise ValueError(
                f"index has {sub} rows ({why}): the .ns document "
                "stream cannot represent them, a replay would lose "
                "those documents"
            )

    m = _load_manifest(index_dir)
    docs = read_docs(spark, index_dir, m)
    cols = [c for c in docs.columns if c not in ("dl", "doc_part")]
    stream = (
        docs.select(
            F.col("doc_id"),
            F.to_json(
                F.struct(*cols), {"ignoreNullFields": "false"}
            ).alias("js"),
        )
        .orderBy("doc_id")
    )
    n = 0
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"using {name}.document.db batch;\n")
        # toLocalIterator: one partition in driver memory at a time
        for row in stream.toLocalIterator():
            f.write(
                f'using {name}.document.db set {row["doc_id"]} '
                f'"{_ns_escape(row["js"])}";\n'
            )
            n += 1
        f.write(f"using {name}.document.db flushbatch;\n")
        if raw:
            from .query import SparkIndex

            post = (
                SparkIndex(spark, index_dir)
                .postings()
                .orderBy("field", "term", "doc_id")
            )
            cur_db: str | None = None
            for row in post.toLocalIterator():
                db = f'{row["field"]}.idx'
                if db != cur_db and not re.fullmatch(
                    r"[A-Za-z0-9_.\-]+", row["field"]
                ):
                    # same loud-failure contract as the name guard
                    # above: a field that can't lex inside the word
                    # token would produce an unparseable dump
                    raise ValueError(
                        f"field name does not lex as a .ns using "
                        f"target: {row['field']!r}"
                    )
                if db != cur_db:
                    if cur_db is not None:
                        f.write(f"using {name}.{cur_db} flushbatch;\n")
                    f.write(f"using {name}.{db} batch;\n")
                    cur_db = db
                f.write(
                    f'using {name}.{db} mergeset '
                    f'"{_ns_escape(row["term"])}" {row["doc_id"]};\n'
                )
            if cur_db is not None:
                f.write(f"using {name}.{cur_db} flushbatch;\n")
    os.replace(tmp, out_path)
    return n


# ---------------------------------------------------------------- replay

def _apply_sets(
    spark: SparkSession,
    index_dir: str,
    rows: list[tuple[int, str]],
    build_kwargs: dict,
) -> dict:
    """Apply one pending document-set group.  Duplicate ids within a
    group keep the LAST occurrence (reference ``set`` overwrite
    semantics); the engine's upsert would reject the ambiguity."""
    from pyspark.sql import functions as F

    from .build import IndexBuilder
    from .maintenance import upsert_docs

    last: dict[int, str] = {}
    for doc_id, js in rows:
        last[int(doc_id)] = js
    exists = os.path.exists(os.path.join(index_dir, "manifest.json"))
    reader = spark.read
    if exists:
        # an existing index dictates the payload schema (typed ts
        # etc.) — upsert unions by name against the stored table
        from pyspark.sql.types import StructType

        from .maintenance import _load_manifest

        sj = _load_manifest(index_dir).get("params", {}).get("docs_schema")
        if sj:
            full = StructType.fromJson(json.loads(sj))
            schema = StructType(
                [f for f in full.fields if f.name not in ("dl", "doc_part")]
            )
            # spark.read.json with an explicit schema silently drops
            # unknown keys — for a dump that would LOSE data, so scan
            # the (already driver-resident) payloads' top-level keys
            # first and fail loudly on one the schema can't hold
            # (e.g. a foreign dump whose early chunks never mention a
            # late-appearing column; migration tooling, not hot path)
            known = set(schema.fieldNames())
            for js in last.values():
                try:
                    payload = json.loads(js)
                except ValueError as e:
                    raise ValueError(
                        f"document.db set payload is not valid JSON: "
                        f"{js[:80]!r} ({e})"
                    ) from None
                if not isinstance(payload, dict):
                    raise ValueError(
                        "document.db set payloads must be JSON objects "
                        f"with doc_id, got: {js[:80]!r}"
                    )
                extra = set(payload) - known
                if extra:
                    raise ValueError(
                        f"replay payload carries columns the index's "
                        f"doc schema lacks: {sorted(extra)} — rebuild "
                        "with a full-schema dump instead of upserting"
                    )
            reader = reader.schema(schema)
    else:
        # fresh index: recover timestamp columns from their ISO
        # to_json form instead of leaving them strings
        reader = reader.option("inferTimestamp", "true")
    batch = reader.json(
        spark.sparkContext.parallelize(list(last.values()), 32)
    )
    if "doc_id" not in batch.columns:
        raise ValueError("document.db set payloads must carry doc_id")
    batch = batch.withColumn("doc_id", F.col("doc_id").cast("long"))
    if not exists:
        IndexBuilder(index_dir, **build_kwargs).build(batch)
        return {"built": len(last)}
    return upsert_docs(spark, index_dir, batch)


class NsExecutor:
    """Incremental ``.ns`` statement executor — the shared engine
    behind file replay (``replay_ns``) and the interactive REPL
    (``cli.py repl``).  Holds the pending set/delete batches, the
    flush counters, and the cached ``SparkIndex`` read handle
    (invalidated on every flush — table swaps reopen lazily).

    Read-your-writes: every ``get`` flushes pending writes first,
    like the reference engine's batch semantics."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        build_kwargs: dict | None = None,
        chunk: int = 100_000,
        get_limit: int = 100,
        eager_validate: bool = False,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.build_kwargs = dict(build_kwargs or {})
        self.chunk = chunk
        self.get_limit = get_limit
        # interactive sessions (REPL) validate each set payload AT THE
        # STATEMENT, so a bad payload fails loudly where it was typed
        # instead of poisoning the pending batch; file replay keeps the
        # lazy path (no per-row driver json.loads on 100k-row chunks —
        # _apply_sets validates the whole chunk when it matters)
        self.eager_validate = eager_validate
        self._sets: list[tuple[int, str]] = []
        self._deletes: list[int] = []
        self._idx = None
        self.counters = {
            "n_set": 0,
            "n_deleted": 0,
            "n_gets": 0,
            "n_skipped_derived": 0,
            "n_flushes": 0,
        }

    def flush(self) -> None:
        # preserve set/delete ordering at group granularity: whichever
        # op type is pending applies; both pending means the stream
        # interleaved them inside one chunk — apply sets then deletes
        # in dump order is WRONG for interleaves, so flush happens on
        # every op-type switch (see execute) and both never pend here.
        # a failing flush DISCARDS its pending batch before re-raising:
        # file replay aborts on the exception anyway, and an interactive
        # session must not wedge — without the clear, every later
        # read/flush would re-fail on the same poison rows with no
        # statement able to drop them
        if self._sets:
            try:
                _apply_sets(
                    self.spark, self.index_dir, self._sets, self.build_kwargs
                )
                self.counters["n_set"] += len({i for i, _ in self._sets})
            finally:
                self._sets.clear()
                self._idx = None  # table swap → reopen on next read
            self.counters["n_flushes"] += 1
        if self._deletes:
            from .maintenance import delete_docs

            try:
                ids = self.spark.createDataFrame(
                    [(int(i),) for i in dict.fromkeys(self._deletes)],
                    "doc_id long",
                )
                res = delete_docs(self.spark, self.index_dir, ids)
                self.counters["n_deleted"] += res.get("n_deleted", 0)
            finally:
                self._deletes.clear()
                self._idx = None
            self.counters["n_flushes"] += 1

    def _handle(self):
        from .query import SparkIndex

        if self._idx is None:
            self._idx = SparkIndex(self.spark, self.index_dir)
        return self._idx

    @staticmethod
    def _doc_key(key) -> int:
        """document.db keys are uint64 doc_ids.  A ``float(1.9)``-typed
        key parses to a Python float and bare ``int()`` would SILENTLY
        truncate it to a different document's id — reject non-integral
        keys as loudly as non-numeric ones (``int("x")`` raises)."""
        if isinstance(key, float):
            if not key.is_integer():
                raise ValueError(
                    f"document.db keys must be integers, got {key!r}"
                )
            return int(key)
        return int(key)

    def execute(self, cmd: Command) -> dict | None:
        """Apply one statement; ``get`` verbs return their result
        dict (doc-store: ``{"database", "key", "doc"}``; postings:
        ``{"database", "key", "doc_ids"}``), all others ``None``."""
        db = cmd.database
        if db == "document.db":
            if cmd.verb in ("set", "mergeset"):
                if self.eager_validate:
                    try:
                        payload = json.loads(str(cmd.value))
                    except ValueError as e:
                        raise ValueError(
                            f"set payload is not valid JSON: "
                            f"{str(cmd.value)[:80]!r} ({e})"
                        ) from None
                    if not isinstance(payload, dict):
                        raise ValueError(
                            "set payloads must be JSON objects, got: "
                            f"{str(cmd.value)[:80]!r}"
                        )
                if self._deletes:
                    self.flush()
                self._sets.append((self._doc_key(cmd.key), str(cmd.value)))
                if len(self._sets) >= self.chunk:
                    self.flush()
            elif cmd.verb == "delete":
                if self._sets:
                    self.flush()
                self._deletes.append(self._doc_key(cmd.key))
                if len(self._deletes) >= self.chunk:
                    self.flush()
            elif cmd.verb == "get":
                self.flush()
                rows = (
                    self._handle()
                    .get_docs(
                        self.spark.createDataFrame(
                            [(self._doc_key(cmd.key),)], "doc_id long"
                        )
                    )
                    .collect()
                )
                self.counters["n_gets"] += 1
                return {
                    "database": db,
                    "key": cmd.key,
                    "doc": rows[0].asDict(recursive=True) if rows else None,
                }
            # batch: replay always batches; flushbatch handled below
            elif cmd.verb == "flushbatch":
                self.flush()
        elif db.endswith(".idx"):
            field = db[: -len(".idx")]
            if cmd.verb == "get":
                self.flush()
                ids = (
                    self._handle()
                    .term_docs(str(cmd.key), field=field)
                    .orderBy("doc_id")
                    .limit(self.get_limit)
                    .collect()
                )
                self.counters["n_gets"] += 1
                return {
                    "database": db,
                    "key": cmd.key,
                    "doc_ids": [r["doc_id"] for r in ids],
                }
            elif cmd.verb in ("set", "mergeset", "delete"):
                # derived data — postings are rebuilt from the
                # document stream (module docstring)
                self.counters["n_skipped_derived"] += 1
            elif cmd.verb == "flushbatch":
                self.flush()
        else:
            # opaque KV database with no Spark-engine analog
            if cmd.verb in ("set", "mergeset", "delete", "get"):
                self.counters["n_skipped_derived"] += 1
            elif cmd.verb == "flushbatch":
                self.flush()
        return None


def replay_ns(
    spark: SparkSession,
    index_dir: str,
    text,
    build_kwargs: dict | None = None,
    chunk: int = 100_000,
    get_limit: int = 100,
) -> dict:
    """Replay a ``.ns`` command stream against ``index_dir``.

    ``text`` is a string OR an iterable of text chunks (e.g. an open
    file object) — the iterable form streams through the incremental
    parser so neither the raw dump text nor the parsed command list
    is ever fully driver-resident: one pending statement plus one
    pending flush chunk bound the memory at ANY dump size.

    Creates the index on the first document flush when no manifest
    exists (``build_kwargs`` → ``IndexBuilder``; the reference
    equivalent is the create-index DDL that precedes a restore),
    otherwise applies through the partition-scoped maintenance
    paths.  Pending sets/deletes auto-flush at ``chunk`` rows.

    Schema note: a FRESH index's doc schema is inferred from the
    first flushed chunk.  Unknown columns in later chunks fail
    loudly (never silently dropped), but a column whose first-chunk
    values are ALL null infers as string — for full type fidelity on
    heterogeneous dumps, raise ``chunk`` above the corpus size or
    create the index first so its stored ``docs_schema`` governs.

    Returns counters plus the ``get`` results in command order."""
    ex = NsExecutor(
        spark, index_dir, build_kwargs=build_kwargs, chunk=chunk,
        get_limit=get_limit,
    )
    gets: list[dict] = []
    chunks = [text] if isinstance(text, str) else text
    for cmd in iter_parse_ns(chunks):
        res = ex.execute(cmd)
        if res is not None:
            gets.append(res)
    ex.flush()
    counters = dict(ex.counters)
    counters["gets"] = gets
    return counters
