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

When both summaries carry per-entry trigger counts (bench.py r12+), moved
streaming entries are annotated with them and flagged "floor-dominated"
when both sides' per-trigger wall sits inside the micro-batch constant
band (≤2.5 s/trigger) — such deltas are trigger-floor artifacts (an extra
eviction micro-batch, a changed trigger count), not per-row regressions.
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
    # Host-drift separation (VERDICT r12 #2): the calibration entries are
    # fixed-code jobs, so their cross-archive ratio measures the HOST.
    # Per-entry deltas are then annotated with the drift-adjusted residual —
    # the part the calibration does NOT explain.
    import statistics

    co = old.get("calibration") or {}
    cn = new.get("calibration") or {}
    calib_shared = sorted(k for k in co if k in cn and co[k] > 0 and cn[k] > 0)
    drift = None
    if calib_shared:
        ratios = {k: cn[k] / co[k] for k in calib_shared}
        drift = statistics.median(ratios.values())
        detail = ", ".join(f"{k} x{v:.2f}" for k, v in sorted(ratios.items()))
        print(f"host drift (fixed-code calibration): x{drift:.2f}  [{detail}]")
    elif co or cn:
        print(
            "calibration present on one side only — host drift not "
            "separable for this pair (first r13+ archive vs an older one)"
        )
    # trigger counts (bench.py r12+): a streaming entry's wall is
    # ~(triggers × 1-3 s of per-micro-batch constants) + data work, so a
    # delta whose both sides sit inside the per-trigger floor band — or one
    # explained by a changed trigger count — is a floor artifact, not a
    # per-row regression (VERDICT r11 #6)
    FLOOR_SEC_PER_TRIGGER = 2.5
    to, tn = old.get("triggers", {}), new.get("triggers", {})
    moved = []
    for k in shared:
        a, b = qo[k], qn[k]
        if a <= 0 or b < 0 or max(a, b) < 0.2:
            continue
        rel = (b - a) / a
        if abs(rel) >= threshold:
            moved.append((rel, k, a, b))
    for rel, k, a, b in sorted(moved, reverse=True):
        tags = []
        if drift is not None:
            residual = (b / a) / drift - 1
            tags.append(f"drift-adjusted {residual * 100:+.0f}%")
            if abs(residual) < threshold:
                tags.append("within host drift")
        ta, tb = to.get(k), tn.get(k)
        if ta and tb:  # streaming on both sides
            floor_dominated = (
                a / ta <= FLOOR_SEC_PER_TRIGGER and b / tb <= FLOOR_SEC_PER_TRIGGER
            )
            tags.append(f"triggers {ta}->{tb}")
            if ta != tb:
                tags.append("trigger-count change")
            if floor_dominated:
                tags.append("floor-dominated")
        note = ("  [" + ", ".join(tags) + "]") if tags else ""
        print(f"  {k:45s} {a:8.3f} -> {b:8.3f}  ({rel * 100:+.0f}%){note}")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
