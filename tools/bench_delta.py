"""Bench regression gate: diff two bench JSONs, fail on real regressions.

Usage:
    python tools/bench_delta.py                 # two newest BENCH_r*.json
    python tools/bench_delta.py OLD.json NEW.json
    python bench.py | python tools/bench_delta.py BENCH_r01.json -

Accepts either the driver's wrapper format ({"parsed": {...}}) or the raw
one-line bench.py output. Prints a per-query delta table (worst first) and
exits 1 when any query regresses more than THRESHOLD× — unless its times
are below ABS_FLOOR seconds, where local[32] noise dominates and a ratio
is meaningless. Pass --warn-only to report without failing (e.g. while an
intentional trade-off is being reviewed)."""

from __future__ import annotations

import glob
import json
import re
import signal
import sys

# Don't stack-trace when piped into `head`.
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

THRESHOLD = 1.5
# A regression must be big in BOTH senses: >THRESHOLD× ratio AND >MIN_DELTA
# seconds absolute. Sub-second queries on a busy local[32] bounce ±0.5s
# between runs (measured: different queries "regress" 1.6-2.6× in
# back-to-back benches while previous offenders recover), so ratio alone
# would cry wolf every round.
MIN_DELTA = 1.0


def load(path: str) -> dict:
    raw = sys.stdin.read() if path == "-" else open(path, encoding="utf-8").read()
    # Raw bench.py output may carry warnings around the single JSON line.
    for line in raw.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    else:
        doc = json.loads(raw)
    if doc.get("parsed"):
        doc = doc["parsed"]
    elif "tail" in doc:
        # Driver wrapper whose own parse failed (tail truncated mid-JSON):
        # recover whatever per-query numbers survive in the tail text.
        queries = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z_0-9]+)":\s*([0-9.]+)', doc["tail"])
            if m.group(1) not in ("value", "sf", "n_errors")
        }
        if not queries:
            raise SystemExit(f"{path}: unrecoverable bench wrapper")
        doc = {"queries": queries, "value": None}
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' key — not a bench JSON")
    return doc


def corpus_confounds(old: dict | None, new: dict | None) -> list[str]:
    """Human-readable lines for every table whose shape moved >2% (rows,
    bytes, or documents length profile) between the two bench runs.
    Either side missing a corpus block (pre-r8 bench JSONs) is itself
    reported once, so the reader knows the check could not run."""
    if not old or not new:
        if new and not old:
            return ["old bench has no corpus block (pre-r8) — cannot compare"]
        return []
    lines = []
    for t in sorted(set(old) | set(new)):
        o, n = old.get(t, {}), new.get(t, {})
        for k in sorted(set(o) | set(n)):
            ov, nv = o.get(k), n.get(k)
            if not isinstance(ov, (int, float)) or not isinstance(nv, (int, float)):
                continue
            base = max(abs(ov), 1e-9)
            if abs(nv - ov) / base > 0.02:
                lines.append(f"{t}.{k}: {ov} -> {nv}")
    return lines


def main(argv: list[str]) -> int:
    warn_only = "--warn-only" in argv
    paths = [a for a in argv if a != "--warn-only"]
    if not paths:
        found = sorted(
            glob.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if len(found) < 2:
            print(f"only {len(found)} BENCH_r*.json present — nothing to diff")
            return 0
        paths = found[-2:]
    if len(paths) != 2:
        raise SystemExit(__doc__)

    old, new = load(paths[0]), load(paths[1])
    oq, nq = old["queries"], new["queries"]

    # Corpus-shape confound check: the driver regenerates testdata between
    # rounds; when table row counts / sizes / doc-length profile moved, the
    # per-query deltas below measure DATA drift as much as code, and any
    # "REGRESSION" verdict must be re-litigated on identical data first.
    confounds = corpus_confounds(old.get("corpus"), new.get("corpus"))
    for line in confounds:
        print(f"WARNING corpus shape changed — deltas are CONFOUNDED: {line}")

    rows = []
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        # Fault-isolated bench runs record {"err": ...} for failed queries.
        if isinstance(n, dict):
            rows.append((float("inf"), name, o if not isinstance(o, dict) else None, None, "ERROR(new)"))
            continue
        if isinstance(o, dict):
            o = None
        if o is None or n is None:
            rows.append((float("inf") if o is None else 0.0, name, o, n, "added" if o is None else "removed"))
            continue
        ratio = n / o if o > 0 else float("inf")
        flag = ""
        if ratio > THRESHOLD and n - o > MIN_DELTA:
            flag = "REGRESSION"
            # Targeted min-of-2 (r9): bench.py re-runs flagged movers once
            # and records the second sample; if the MIN of the two clears
            # the guard, the mover is the documented single-run noise
            # class — auto-close it instead of re-litigating by hand.
            second = new.get("second_sample", {}).get(name)
            if isinstance(second, (int, float)):
                eff = min(n, second)
                if not (eff / o > THRESHOLD and eff - o > MIN_DELTA):
                    flag = f"noise(min2={second:.2f}s)"
        elif ratio < 1 / THRESHOLD and o - n > MIN_DELTA:
            flag = "improved"
        rows.append((ratio, name, o, n, flag))

    print(f"bench delta: {paths[0]} -> {paths[1]}")
    print(f"total: {old.get('value')}s -> {new.get('value')}s")
    print(f"{'query':<36} {'old':>8} {'new':>8} {'ratio':>7}  flag")
    for ratio, name, o, n, flag in sorted(rows, reverse=True):
        fmt = lambda v: f"{v:8.3f}" if isinstance(v, (int, float)) else f"{'-':>8}"
        r = f"{ratio:7.2f}" if ratio != float("inf") else "    new"
        print(f"{name:<36} {fmt(o)} {fmt(n)} {r}  {flag}")

    regressions = [
        name
        for _r, name, _o, _n, flag in rows
        if flag in ("REGRESSION", "ERROR(new)")
    ]
    if regressions:
        print(f"\n{len(regressions)} regression(s)/error(s): {', '.join(regressions)}")
        return 0 if warn_only else 1
    print(f"\nno regressions > {THRESHOLD}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
