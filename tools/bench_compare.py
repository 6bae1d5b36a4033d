"""Compare two bench.py summary JSONs, protocol-aware.

Round 10 switched bench.py to grouped per-query reps with a discarded
warm-up; numbers from the old interleaved protocol are systematically
higher, so cross-protocol deltas are measurement artifacts, not
regressions (ADVICE r10). This tool refuses to diff mismatched protocols
unless --force, and reports per-query deltas over the shared entries only.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 0.25] [--force]

Exit code 0 always (reporting tool, not a gate); the per-commit gate is the
test suite. Output: shared-entry totals, the queries whose |delta| exceeds
the threshold (relative, on entries >= 0.2 s — sub-200 ms entries are pure
trigger/launch noise at sf0.1), and entries present on one side only.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # bench output files may carry a stderr preamble; the summary is the
    # last line that parses
    for line in reversed(text.splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no JSON summary line found")


def main(argv: list[str]) -> int:
    threshold = 0.25
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:  # space-separated form: consume the next token
                i += 1
                threshold = float(argv[i])
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 0
    old, new = _load(args[0]), _load(args[1])
    po = old.get("bench_protocol", "pre-v2 (untagged)")
    pn = new.get("bench_protocol", "pre-v2 (untagged)")
    if po != pn and "--force" not in argv:
        print(
            f"REFUSING cross-protocol comparison: {args[0]} is '{po}', "
            f"{args[1]} is '{pn}' — deltas would be measurement artifacts "
            "(ADVICE r10). Pass --force to diff anyway; do not quote the "
            "result as a regression/improvement."
        )
        return 0
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    so = sum(qo[k] for k in shared if qo[k] >= 0)
    sn = sum(qn[k] for k in shared if qn[k] >= 0)
    pct = f"  ({(sn - so) / so * 100:+.1f}%)" if so > 0 else ""
    print(
        f"shared entries: {len(shared)}  old total {so:.1f}s  new total "
        f"{sn:.1f}s{pct}"
    )
    moved = []
    for k in shared:
        a, b = qo[k], qn[k]
        if a <= 0 or b < 0 or max(a, b) < 0.2:
            continue
        rel = (b - a) / a
        if abs(rel) >= threshold:
            moved.append((rel, k, a, b))
    for rel, k, a, b in sorted(moved, reverse=True):
        print(f"  {k:45s} {a:8.3f} -> {b:8.3f}  ({rel * 100:+.0f}%)")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
