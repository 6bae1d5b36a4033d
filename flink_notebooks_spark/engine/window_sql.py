"""Flink group-window SQL → Spark SQL rewrite.

The reference's flagship streaming query uses Flink's legacy group-window
syntax (reference examples/01-datagen-streaming.flinknb:47):

    SELECT page_id, COUNT(*), TUMBLE_START(event_time, INTERVAL '10' SECOND)
    FROM clickstream GROUP BY page_id, TUMBLE(event_time, INTERVAL '10' SECOND)

Spark SQL expresses the same plan with ``window()`` / ``session_window()``
grouping expressions and ``window.start`` / ``window.end`` selectors. This
module rewrites the Flink spellings textually — a pure dialect translation;
planning and execution stay entirely in Catalyst:

    TUMBLE(c, INTERVAL 'n' U)            → window(c, 'n u')
    HOP(c, INTERVAL 's' U, INTERVAL 'w' U) → window(c, 'w u', 's u')
      (Flink argument order is (time, slide, size); Spark is (time, size,
       slide))
    SESSION(c, INTERVAL 'g' U)           → session_window(c, 'g u')
    TUMBLE_START/TUMBLE_END(...)         → window.start / window.end
    HOP_START/HOP_END(...)               → window.start / window.end
    SESSION_START/SESSION_END(...)       → session_window.start / .end
"""

from __future__ import annotations

import re

_UNITS = {
    "SECOND": "seconds",
    "SECONDS": "seconds",
    "MINUTE": "minutes",
    "MINUTES": "minutes",
    "HOUR": "hours",
    "HOURS": "hours",
    "DAY": "days",
    "DAYS": "days",
    "MILLISECOND": "milliseconds",
    "MILLISECONDS": "milliseconds",
}

_IVL = r"INTERVAL\s+'([\d.]+)'\s+(\w+)"
_COL = r"([`\w.]+)"


def _dur(n: str, unit: str) -> str:
    u = _UNITS.get(unit.upper())
    if u is None:
        raise ValueError(f"unsupported window interval unit: {unit}")
    return f"'{n} {u}'"


def rewrite_temporal_join(sql: str) -> str:
    """``JOIN dim FOR SYSTEM_TIME AS OF x.t`` → plain join (snapshot
    semantics).

    Flink's temporal join resolves each probe row against the dim table's
    version at the row's event time. When the dim side is a *static
    snapshot* — the only dim shape this engine's connectors materialize —
    the version at any time IS the snapshot, so the clause reduces to a
    regular join. True versioned-history lookups are the
    ``operators.joins.asof_join`` DataFrame operator (one shuffle, no row
    explosion); wiring that into arbitrary SQL would need a Catalyst rule,
    documented as the J7 limitation in SURVEY.md §7.3.
    """
    return re.sub(
        r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+[`\w.]+(\s*\(\s*\))?",
        " ",
        sql,
        flags=re.IGNORECASE,
    )


_TVF = re.compile(
    r"TABLE\s*\(\s*(TUMBLE|HOP|CUMULATE)\s*\(\s*(?:TABLE\s+)?([`\w.]+)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*([`\w.]+)\s*\)\s*,\s*" + _IVL + r"(?:\s*,\s*" + _IVL + r")?\s*\)\s*\)",
    re.IGNORECASE,
)

_US_PER = {
    "seconds": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "days": 86_400_000_000,
    "milliseconds": 1_000,
}


def _us(n: str, unit: str) -> int:
    u = _UNITS.get(unit.upper())
    if u is None:
        raise ValueError(f"unsupported window interval unit: {unit}")
    return int(float(n) * _US_PER[u])


def rewrite_window_tvfs(sql: str) -> str:
    """Flink 1.20 windowing TVFs → Spark subqueries.

    ``TABLE(TUMBLE(TABLE t, DESCRIPTOR(c), INTERVAL 'n' U))`` becomes a
    subquery projecting ``window_start``/``window_end`` (the TVF's output
    columns) from a per-row ``window()`` assignment — Spark evaluates
    ``window()`` in SELECT position, expanding each row to its windows, so
    HOP works the same way with Flink's (slide, size) argument order mapped
    to Spark's (size, slide). CUMULATE TVF is not rewritten (use
    ``operators.windows.cumulate_window`` — documented gap in NOTES.md).
    """

    def repl(m: re.Match) -> str:
        fn, tbl, col = m.group(1).upper(), m.group(2), m.group(3)
        if fn == "TUMBLE":
            win = f"window({col}, {_dur(m.group(4), m.group(5))})"
        elif fn == "HOP":  # HOP(time, slide, size) → window(time, size, slide)
            if not m.group(6):
                raise ValueError("HOP TVF requires slide and size intervals")
            win = (
                f"window({col}, {_dur(m.group(6), m.group(7))}, "
                f"{_dur(m.group(4), m.group(5))})"
            )
        else:  # CUMULATE(time, step, span): growing windows, explode on ends
            if not m.group(6):
                raise ValueError("CUMULATE TVF requires step and span intervals")
            step = _us(m.group(4), m.group(5))
            span = _us(m.group(6), m.group(7))
            if span % step != 0:
                raise ValueError("CUMULATE: span must be a multiple of step")
            us = f"unix_micros(CAST({col} AS TIMESTAMP))"
            start = f"(({us}) div {span}) * {span}"
            return (
                f"(SELECT * EXCEPT (__k), timestamp_micros({start}) AS window_start, "
                f"timestamp_micros({start} + __k * {step}) AS window_end "
                f"FROM {tbl} "
                f"LATERAL VIEW explode(sequence((({us} - ({start})) div {step}) + 1, "
                f"{span // step})) AS __k)"
            )
        return (
            f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
            f"__w.end AS window_end FROM (SELECT *, {win} AS __w FROM {tbl}))"
        )

    return _TVF.sub(repl, sql)


def rewrite_group_windows(sql: str) -> str:
    """Rewrite Flink TUMBLE/HOP/SESSION group-window calls to Spark SQL.
    Returns the input unchanged when no group-window syntax is present."""
    if not re.search(r"\b(TUMBLE|HOP|SESSION)(_START|_END)?\s*\(", sql, re.IGNORECASE):
        return sql

    # selectors first (TUMBLE_START before TUMBLE so prefixes don't collide)
    def sel(prefix: str, target: str) -> None:
        nonlocal sql
        sql = re.sub(
            rf"\b{prefix}_(START|END)\s*\(([^()]*)\)",
            lambda m: f"{target}.{'start' if m.group(1).upper() == 'START' else 'end'}",
            sql,
            flags=re.IGNORECASE,
        )

    sel("TUMBLE", "window")
    sel("HOP", "window")
    sel("SESSION", "session_window")

    sql = re.sub(
        rf"\bTUMBLE\s*\(\s*{_COL}\s*,\s*{_IVL}\s*\)",
        lambda m: f"window({m.group(1)}, {_dur(m.group(2), m.group(3))})",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        rf"\bHOP\s*\(\s*{_COL}\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)",
        lambda m: (
            f"window({m.group(1)}, {_dur(m.group(4), m.group(5))}, "
            f"{_dur(m.group(2), m.group(3))})"
        ),
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        rf"\bSESSION\s*\(\s*{_COL}\s*,\s*{_IVL}\s*\)",
        lambda m: f"session_window({m.group(1)}, {_dur(m.group(2), m.group(3))})",
        sql,
        flags=re.IGNORECASE,
    )
    return sql
