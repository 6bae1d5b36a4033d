"""Statement lifecycle + token-paged result delivery (SURVEY.md §3.1).

Mirrors the reference's SQL-gateway operation/result protocol:

- operation states PENDING/RUNNING/FINISHED/ERROR/CANCELED
  (reference vscode-extension/src/providers/flinkNotebookController.ts:145-153,
  flinkJobClient.ts:7-17)
- paged result fetch with tokens, ≤100 rows/page, result types
  NOT_READY / PAYLOAD / EOS
  (reference sqlGatewayClient.ts:124-140, flinkNotebookController.ts:165-241)
- rows carry a changelog ``kind`` alongside positional ``fields``
  (reference models/types.ts:24-27)
- streaming results buffer up to 10,000 rows — the reference client's cap
  (flinkNotebookController.ts:428)
- pause / resume / cancel of a running streaming statement
  (flinkNotebookController.ts:748-850)

Spark mapping: a batch statement pages ``toLocalIterator`` (nothing is
materialized on the driver beyond the current page — large results stream
partition-by-partition); a streaming statement is a ``foreachBatch`` query
appending to a bounded in-memory buffer the client drains with the same
token protocol.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

PAGE_SIZE = 100  # reference sqlGatewayClient.ts:128
MAX_STREAM_ROWS = 10_000  # reference flinkNotebookController.ts:428

PENDING = "PENDING"
RUNNING = "RUNNING"
FINISHED = "FINISHED"
ERROR = "ERROR"
CANCELED = "CANCELED"


@dataclass
class ColumnInfo:
    name: str
    type: str
    nullable: bool = True


@dataclass
class ResultPage:
    result_type: str  # NOT_READY | PAYLOAD | EOS
    columns: list[ColumnInfo] = field(default_factory=list)
    data: list[dict[str, Any]] = field(default_factory=list)  # {kind, fields}
    next_token: int | None = None


def _columns_of(df: DataFrame) -> list[ColumnInfo]:
    return [
        ColumnInfo(f.name, f.dataType.simpleString().upper(), f.nullable)
        for f in df.schema.fields
    ]


def _rows(batch: list, kind: str = "INSERT") -> list[dict[str, Any]]:
    return [{"kind": kind, "fields": list(r)} for r in batch]


def changelog_entries(
    rows: list[list[Any]],
    key_idx: list[int],
    mode: str,
    seen: dict[tuple, list[Any]],
    exhaustive: bool = True,
) -> list[dict[str, Any]]:
    """Reconstruct Flink's changelog row kinds from micro-batch output.

    Flink encodes updating results as INSERT / UPDATE_BEFORE / UPDATE_AFTER /
    DELETE rows on the wire (reference models/types.ts:24-27). Spark's
    ``update`` output mode emits only the *new* value of each changed group,
    so the statement keeps the last-seen row per grouping key (``seen``,
    mutated in place) and diffs: new key → INSERT, changed key →
    UPDATE_BEFORE(old) + UPDATE_AFTER(new). In ``complete`` mode the batch is
    the whole result, so groups that vanished additionally emit DELETE and
    unchanged groups are not re-emitted. State is one row per distinct group
    key, HARD-bounded at 2 × MAX_STREAM_ROWS: every new key emits an INSERT
    into the client buffer (≤ MAX total before saturation), the caller caps
    ``rows`` at MAX_STREAM_ROWS per trigger, and once the buffer saturates
    the statement stops calling this function entirely (see
    StreamingStatement.on_batch) — matching the reference client, which
    caps displayed rows at the same 10k (flinkNotebookController.ts:428).

    ``exhaustive=False`` marks ``rows`` as a transfer-capped PARTIAL batch:
    complete-mode DELETE reconstruction is suppressed here (an absent key
    may sit past the cap, not be gone) — the caller recovers EXACT deletes
    distributedly instead (StreamingStatement._distributed_deletes diffs the
    served-key set against the whole batch with an anti-join, shipping only
    vanished keys to the driver).
    """
    out: list[dict[str, Any]] = []
    snapshot: set[tuple] = set()
    for r in rows:
        fields = list(r)
        key = tuple(fields[i] for i in key_idx)
        snapshot.add(key)
        old = seen.get(key)
        if old is None:
            out.append({"kind": "INSERT", "fields": fields})
            seen[key] = fields
        elif old != fields:
            out.append({"kind": "UPDATE_BEFORE", "fields": old})
            out.append({"kind": "UPDATE_AFTER", "fields": fields})
            seen[key] = fields
        # unchanged (complete-mode re-emission): nothing to report
    if mode == "complete" and exhaustive:
        # DELETE = key vanished from the complete snapshot. Only decidable
        # when ``rows`` IS the whole snapshot — a transfer-capped partial
        # batch (exhaustive=False) must not DELETE keys that may simply sit
        # past the cap.
        for key in [k for k in seen if k not in snapshot]:
            out.append({"kind": "DELETE", "fields": seen.pop(key)})
    return out


class Statement:
    """Base statement: immediate (DDL/SET) results."""

    def __init__(self, statement_id: str | None = None):
        self.statement_id = statement_id or uuid.uuid4().hex[:16]
        self.state = PENDING
        self.error: str | None = None
        self.started_at = time.time()
        self.finished_at: float | None = None
        self.is_streaming = False

    # --- protocol surface -------------------------------------------------
    def status(self) -> str:
        return self.state

    def fetch(self, token: int = 0, max_rows: int = PAGE_SIZE) -> ResultPage:
        raise NotImplementedError

    def cancel(self) -> None:
        if self.state in (PENDING, RUNNING):
            self.state = CANCELED
            self.finished_at = time.time()

    def duration(self) -> float:
        return (self.finished_at or time.time()) - self.started_at


class ImmediateStatement(Statement):
    """DDL / SET / SHOW results: fully known at construction."""

    def __init__(self, columns: list[ColumnInfo], rows: list[list[Any]]):
        super().__init__()
        self._columns = columns
        self._rows = rows
        self.state = FINISHED
        self.finished_at = time.time()

    def fetch(self, token: int = 0, max_rows: int = PAGE_SIZE) -> ResultPage:
        start = token * max_rows
        page = self._rows[start : start + max_rows]
        if not page and start >= len(self._rows):
            return ResultPage("EOS", self._columns, [], None)
        return ResultPage("PAYLOAD", self._columns, _rows(page), token + 1)


def ok_statement(message: str = "OK") -> ImmediateStatement:
    return ImmediateStatement([ColumnInfo("result", "STRING", False)], [[message]])


class BatchStatement(Statement):
    """A batch query: pages toLocalIterator, PAGE_SIZE rows per token."""

    def __init__(self, df: DataFrame):
        super().__init__()
        self.df = df
        self._columns = _columns_of(df)
        self._iter = None
        self._pages: dict[int, list] = {}
        self._done_token: int | None = None
        self.state = RUNNING
        self._lock = threading.Lock()

    def fetch(self, token: int = 0, max_rows: int = PAGE_SIZE) -> ResultPage:
        with self._lock:
            if self.state == CANCELED:
                return ResultPage("EOS", self._columns, [], None)
            try:
                if self._iter is None:
                    # toLocalIterator streams partitions to the driver one at
                    # a time — no full materialization even for huge results.
                    self._iter = self.df.toLocalIterator(prefetchPartitions=True)
                if self._done_token is not None and token >= self._done_token:
                    self.state = FINISHED
                    self.finished_at = self.finished_at or time.time()
                    return ResultPage("EOS", self._columns, [], None)
                if token in self._pages:  # idempotent retry
                    return ResultPage(
                        "PAYLOAD", self._columns, _rows(self._pages[token]), token + 1
                    )
                batch = []
                for row in self._iter:
                    batch.append(row)
                    if len(batch) >= max_rows:
                        break
                if not batch:
                    self._done_token = token
                    self.state = FINISHED
                    self.finished_at = time.time()
                    return ResultPage("EOS", self._columns, [], None)
                self._pages[token] = batch
                # retain only the latest page for retry (bound driver memory)
                for k in list(self._pages):
                    if k < token:
                        del self._pages[k]
                return ResultPage("PAYLOAD", self._columns, _rows(batch), token + 1)
            except Exception as e:  # noqa: BLE001
                self.state = ERROR
                self.error = str(e)
                self.finished_at = time.time()
                raise


class StreamingStatement(Statement):
    """A streaming query: foreachBatch appends to a bounded buffer; the
    client drains it with the same token protocol (NOT_READY while the
    query is live but no new rows)."""

    def __init__(
        self,
        df: DataFrame,
        start_fn,
        changelog_keys: list[str] | None = None,
        mode_holder: dict | None = None,
        finish_fn=None,
    ):
        """``start_fn(foreach_batch) -> StreamingQuery`` so the engine
        controls trigger/output-mode selection. ``changelog_keys`` (grouping
        columns present in the output) enable UPDATE_BEFORE/UPDATE_AFTER/
        DELETE kind reconstruction for update/complete-mode results;
        ``mode_holder['mode']`` is set by the engine's start_fn to whichever
        output mode the planner accepted. ``finish_fn() -> list[entry]``
        runs ONCE when the query is first observed naturally FINISHED (not
        canceled, not errored) and its entries append to the buffer —
        Flink's bounded-source final-MAX_WATERMARK flush (a canceled Flink
        job does not flush either, so cancel() skips it)."""
        super().__init__()
        self._finish_fn = finish_fn
        self._flushed = False
        self.is_streaming = True
        self._columns = _columns_of(df)
        self._buffer: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        self._paused = False
        self.truncated = False
        # identity matters: the engine mutates this dict from its start_fn
        # (it is empty at construction time, so no truthiness shortcuts)
        self._mode_holder = mode_holder if mode_holder is not None else {}
        # token → buffer offset. Tokens are cursors over whatever rows were
        # READY at serve time (gateway semantics), not fixed 100-row
        # windows: a partial page must not strand the rows behind it until
        # the buffer happens to cross a page boundary (at 2 rows/s a fixed
        # window stalls the client for ~50 s — the reference's demo rate).
        self._offsets: dict[int, int] = {0: 0}
        cols = df.columns
        self._key_idx = (
            [cols.index(k) for k in changelog_keys]
            if changelog_keys and all(k in cols for k in changelog_keys)
            else None
        )
        self._key_cols = list(changelog_keys) if self._key_idx is not None else None
        self._seen: dict[tuple, list[Any]] = {}

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            mode = self._mode_holder.get("mode", "append")
            changelog = self._key_idx is not None and mode in ("update", "complete")
            with self._lock:
                room = MAX_STREAM_ROWS - len(self._buffer)
            if room <= 0:
                # the buffer never drains (tokens are cursors over it), so
                # saturation is terminal: execute NO row transfer — a
                # long-running query would otherwise serialize every later
                # micro-batch to the driver only to discard it (and, in
                # update/complete mode, grow the _seen key map without bound
                # for results that can never serve). truncated must still be
                # HONEST: a buffer that filled exactly to the cap with no
                # overflow (truncated not yet set) only becomes truncated if
                # serveable output was actually dropped afterwards.
                #  - append/update: a non-empty batch IS dropped output
                #    (update mode only emits changed keys, each of which
                #    would have produced changelog entries) — probed with
                #    isEmpty() (a limit-1 job, bounded) until the first such
                #    row; from then on the flag is set and post-cap triggers
                #    do nothing.
                #  - complete: the sink re-emits the FULL result every
                #    trigger, so a non-empty batch says nothing about whether
                #    the diff vs _seen would be empty; deciding exactly would
                #    need the whole-batch transfer this short-circuit exists
                #    to avoid. Set the flag unconditionally — CONSERVATIVE
                #    (may over-report truncation when the post-cap diff would
                #    have been empty), never under-reports.
                if not self.truncated:
                    if mode == "complete" or not batch_df.isEmpty():
                        self.truncated = True
                return
            delete_keys: list[tuple] = []
            if changelog:
                # kind reconstruction diffs against _seen, which wants the
                # whole batch — but the transfer must stay BOUNDED (the only
                # otherwise-unbounded driver collect in the repo). Cap at
                # MAX_STREAM_ROWS + 1: any batch that fits the client cap
                # diffs exactly (every realistic notebook result), and a
                # bigger one could never fully serve anyway. When the cap
                # trips, the diff is non-exhaustive: changed keys beyond the
                # cap are skipped this trigger (their _seen value stays the
                # last EMITTED one, so a later UPDATE_BEFORE still matches
                # what the client materialized), and truncated is set —
                # output may have been dropped. Complete-mode DELETEs stay
                # EXACT under the cap: absence of a served key from the
                # whole snapshot is decided distributedly (anti-join; ships
                # ≤ |served keys| rows, never the batch).
                rows = batch_df.limit(MAX_STREAM_ROWS + 1).collect()
                capped = len(rows) > MAX_STREAM_ROWS
                if capped:
                    rows = rows[:MAX_STREAM_ROWS]
                    self.truncated = True
                entries = changelog_entries(
                    rows, self._key_idx, mode, self._seen, exhaustive=not capped
                )
                if capped and mode == "complete" and self._seen:
                    # DELETEs go FIRST: they retract rows the client already
                    # materialized, so under the buffer-room slice below they
                    # must win over INSERTs of new keys (which a complete
                    # sink re-emits every trigger anyway). _seen is NOT
                    # mutated here: the pop happens after the room slice, so
                    # a DELETE cut off by the slice stays in _seen and the
                    # next trigger's anti-join re-detects it (re-queued, not
                    # lost).
                    del_pairs = self._distributed_deletes(batch_df)
                    delete_keys = [k for k, _ in del_pairs]
                    entries = [e for _, e in del_pairs] + entries
            else:
                # append mode: rows are independent — fetch just enough to
                # fill the buffer, +1 so the truncation flag still trips on
                # the exact boundary batch
                rows = batch_df.limit(room + 1).collect()
                entries = _rows(rows)
            with self._lock:
                room = MAX_STREAM_ROWS - len(self._buffer)
                if room <= 0:
                    # defensive re-check, not an observed race: on_batch is
                    # the only _buffer writer and foreachBatch invocations
                    # are serial per query, so room cannot shrink between
                    # the two lock sections today — this guards the
                    # invariant against a future second writer. Entries were
                    # transferred but cannot serve → that IS truncation.
                    if entries:
                        self.truncated = True
                    return
                if len(entries) > room:
                    self.truncated = True
                    entries = entries[:room]
                # deletes are prepended, so the first min(len(delete_keys),
                # len(entries)) entries are the DELETEs that survived the
                # slice — only THOSE keys leave _seen (ADVICE r13: popping
                # before the slice lost sliced-off DELETEs permanently)
                for k in delete_keys[: len(entries)]:
                    self._seen.pop(k, None)
                self._buffer.extend(entries)

        try:
            self.query = start_fn(on_batch)
            self.state = RUNNING
        except Exception as e:  # noqa: BLE001
            self.state = ERROR
            self.error = str(e)
            self.finished_at = time.time()
            raise

    def _distributed_deletes(
        self, batch_df: DataFrame
    ) -> list[tuple[tuple, dict[str, Any]]]:
        """Exact complete-mode DELETE detection under the transfer cap: a
        capped snapshot cannot prove a key's absence, but the served-key set
        (``_seen`` — ≤ MAX_STREAM_ROWS keys by construction) CAN be diffed
        against the WHOLE batch distributedly. A null-safe left-anti join
        ships back only the keys that vanished from the complete snapshot —
        never the batch — so the per-trigger transfer stays ≤ (cap + 1) rows
        plus ≤ |served| key rows. Keys past the cap are in the batch, so the
        anti-join never touches them.

        Returns ``(key, entry)`` pairs WITHOUT mutating ``_seen`` — the
        caller pops only the keys whose DELETE survived the buffer-room
        slice, so a sliced-off retraction is re-detected next trigger
        instead of being lost (ADVICE r13)."""
        import functools

        from pyspark.sql.types import StructType

        spark = batch_df.sparkSession
        key_schema = StructType([batch_df.schema[c] for c in self._key_cols])
        seen_df = spark.createDataFrame(list(self._seen), key_schema)
        batch_keys = batch_df.select(*self._key_cols)
        cond = functools.reduce(
            lambda a, b: a & b,
            [seen_df[c].eqNullSafe(batch_keys[c]) for c in self._key_cols],
        )
        gone = seen_df.join(batch_keys, cond, "left_anti").collect()
        out: list[tuple[tuple, dict[str, Any]]] = []
        for r in gone:
            key = tuple(r)
            old = self._seen.get(key)
            if old is not None:
                out.append((key, {"kind": "DELETE", "fields": old}))
        return out

    # --- lifecycle (reference T5) ------------------------------------------
    def pause(self) -> None:
        self._paused = True

    def resume(self) -> None:
        self._paused = False

    def cancel(self) -> None:
        # CANCELED is set BEFORE stop(): while stop() is in flight the query
        # may die with a cancellation-induced exception, and a concurrent
        # fetch() that still saw state == RUNNING would classify that as
        # ERROR — a transient 500 for a poller racing a DELETE (observed
        # once under full-suite load). With the state already terminal,
        # fetch()'s RUNNING-only reclassification can't fire.
        self.state = CANCELED
        self.finished_at = time.time()
        self.query.stop()

    def await_termination(self, timeout: float | None = None) -> None:
        self.query.awaitTermination(timeout)

    def fetch(self, token: int = 0, max_rows: int = PAGE_SIZE) -> ResultPage:
        if self._paused:
            return ResultPage("NOT_READY", self._columns, [], token)
        try:
            active = self.query.isActive
        except Exception:  # noqa: BLE001 — liveness probe racing a stop()
            # mid-teardown py4j access: the query is terminal; whoever
            # initiated the teardown owns the state transition
            active = False
        if not active and self.state == RUNNING:
            try:
                exc = self.query.exception()
            except Exception as e:  # noqa: BLE001 — same teardown race
                exc = e
            self.state = FINISHED if exc is None else ERROR
            if self.state == ERROR:
                self.error = str(exc)
            self.finished_at = time.time()
            if self.state == FINISHED and getattr(self, "_finish_fn", None) is not None:
                with self._lock:
                    flush, self._flushed = not self._flushed, True
                if flush:
                    try:
                        extra = self._finish_fn() or []
                    except Exception as e:  # noqa: BLE001 — flush failure
                        # is a real query failure, not silently-empty output
                        self.state = ERROR
                        self.error = str(e)
                        extra = []
                    if extra:
                        with self._lock:
                            room = MAX_STREAM_ROWS - len(self._buffer)
                            if len(extra) > room:
                                self.truncated = True
                                extra = extra[:room]
                            self._buffer.extend(extra)
        with self._lock:
            start = self._offsets.get(token)
            if start is None:  # out-of-order token: nothing was served there
                return ResultPage("EOS", self._columns, [], None)
            end = self._offsets.get(token + 1)
            if end is not None:  # idempotent retry of an already-served page
                page = self._buffer[start:end]
            else:
                page = self._buffer[start : start + max_rows]
                if page:
                    self._offsets[token + 1] = start + len(page)
        if page:
            return ResultPage("PAYLOAD", self._columns, page, token + 1)
        if active:
            return ResultPage("NOT_READY", self._columns, [], token)
        return ResultPage("EOS", self._columns, [], None)

    def rows_fetched_cap(self) -> int:
        with self._lock:
            return len(self._buffer)
