#!/usr/bin/env python
"""Round-over-round per-query bench diff (r11 verdict ask #4).

Compares two committed ``bench_records/BENCH_FULL_r{N}.json`` snapshots
(per-query MEDIANS from the same n_runs protocol, so the comparison is
apples-to-apples — the r10→r11 attribution was impossible because only
single-run stdout survived) and emits one JSON document:

* per-query ``prev``/``curr``/``delta_sec``/``delta_pct``
* ``regressions``: queries slower by more than ``--threshold`` (default
  30%) AND more than 0.3 s absolute (sub-second queries jitter by tens
  of percent at sf0.1; a pure-percentage gate would cry wolf)
* ``improvements``: the mirror image
* ``added`` / ``removed`` query sets

Usage:
    python scripts/bench_diff.py BENCH_FULL_r11.json BENCH_FULL_r12.json \
        [--threshold 0.3] [--out BENCHNOTES_r12_diff.json]

Paths are taken relative to ``bench_records/`` when not found as given.
Exit code is 0 even with regressions (it is an evidence generator, not
a CI gate); the ``regressions`` list is the round report's input.

r14 (verdict ask #4): the DRIVER's per-round artifact (repo-root
``BENCH_r{N}.json``) is also accepted — with a crucial caveat this
round's investigation established (BENCHNOTES_r14_driverdiff.json).
The driver captures COMBINED stdout+stderr and keeps the last 2000
characters: that window holds (a) the tail of bench.py's STDERR
``{"runs": ..., "spread": ...}`` dump — per-query max−min SPREADS, not
timings — and (b) the final stdout contract line, whose ``queries``
dict is the 5-query BASELINE parity subset of medians.  The r13
verdict's "driver tail churn" table (record_clusters 0.84→1.36 s,
part_pagerank 1.64→0.42 s) was unknowingly comparing SPREADS across
rounds (committed r13 medians for those queries are 3.76 s and 5.17 s).
The loader therefore exposes only the parity medians as ``queries``
(diffed as timings) and the reconstructed spread fragment separately as
``spread_partial`` (surfaced, never diffed as a timing).  Driver
artifacts carry no env stamps; ``env_note`` says so explicitly.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# absolute floor below which a percentage regression is jitter, not
# signal (sf0.1 medians of sub-second queries move ±0.1-0.2 s run to
# run even at n_runs=3)
ABS_FLOOR_SEC = 0.3


# keys in the bench JSON line that the tail-regex would otherwise pick
# up as query names (they share the "name":number shape)
_TAIL_META_KEYS = {"value", "n_queries", "n_runs", "sf"}

# a valid pair's opening quote is preceded by { or , — anchoring there
# drops the tail's first, possibly mid-name-truncated pair
_TAIL_PAIR = re.compile(r'(?<=[{,])"([A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?)')


def _from_driver(doc: dict) -> dict:
    """Normalize a driver BENCH_r{N}.json into the BENCH_FULL shape.

    MEDIANS come only from ``parsed.queries`` — the stdout contract
    line's fixed 5-query BASELINE parity subset.  Everything the tail
    regex finds on NON-final lines is the stderr spread dump (max−min
    across runs, not a timing) and is exposed separately as
    ``spread_partial`` so nobody diffs spreads as timings again."""
    parsed = doc.get("parsed") or {}
    queries: dict[str, float] = {
        k: float(v) for k, v in (parsed.get("queries") or {}).items()
    }
    spread_partial: dict[str, float] = {}
    lines = doc.get("tail", "").strip().splitlines()
    for ln in lines[:-1]:
        for m in _TAIL_PAIR.finditer(ln):
            name = m.group(1)
            if name not in _TAIL_META_KEYS:
                spread_partial[name] = float(m.group(2))
    total = parsed.get("n_queries")
    return {
        "queries": queries,
        "spread_partial": spread_partial,
        "value": parsed.get("value"),
        "env": None,
        "format": "driver_tail",
        "partial": total is None or len(queries) < total,
        "n_queries_reconstructed": len(queries),
        "n_queries_total": total,
    }


def _load(name: str) -> dict:
    p = Path(name)
    if not p.exists():
        p = REPO / "bench_records" / name
    if not p.exists():
        p = REPO / name
    with open(p) as fh:
        doc = json.load(fh)
    # driver per-round artifact: {"n", "rc", "tail", "parsed", ...}
    if "tail" in doc and "parsed" in doc and "queries" not in doc:
        return _from_driver(doc)
    return doc


def diff(prev: dict, curr: dict, threshold: float) -> dict:
    pq, cq = prev.get("queries", {}), curr.get("queries", {})
    shared = sorted(set(pq) & set(cq))
    per_query = {}
    regressions, improvements = [], []
    for q in shared:
        a, b = float(pq[q]), float(cq[q])
        d = round(b - a, 3)
        pct = round((b - a) / a, 4) if a > 0 else None
        per_query[q] = {"prev": a, "curr": b, "delta_sec": d, "delta_pct": pct}
        if pct is None:
            continue
        if pct > threshold and d > ABS_FLOOR_SEC:
            regressions.append(q)
        elif pct < -threshold and -d > ABS_FLOOR_SEC:
            improvements.append(q)
    regressions.sort(key=lambda q: -per_query[q]["delta_sec"])
    improvements.sort(key=lambda q: per_query[q]["delta_sec"])
    # r13 (verdict ask #8): surface each snapshot's machine-state stamp
    # (loadavg + foreign jvm/python process count at start/end) so a
    # flagged regression on a contended or loaded snapshot reads as
    # machine state, not code.  Older snapshots carry no stamp → null.
    env_note = None
    pe, ce = prev.get("env"), curr.get("env")
    if pe or ce:
        contended = [
            name
            for name, env in (("prev", pe), ("curr", ce))
            if env
            and any(
                not env.get(w, {}).get("exclusive", True)
                for w in ("start", "end")
            )
        ]
        if contended:
            env_note = (
                f"snapshot(s) {contended} ran with foreign jvm/python "
                "processes alive — timings are contended; treat flags "
                "as machine state unless reproduced exclusively"
            )
    partial = [
        name
        for name, doc in (("prev", prev), ("curr", curr))
        if doc.get("format") == "driver_tail"
    ]
    if partial:
        note = (
            f"snapshot(s) {partial} are driver artifacts: medians exist "
            "only for the 5-query BASELINE parity subset (the rest of "
            "the tail is the stderr SPREAD dump — never a timing), no "
            "env stamps — flags here need an exclusive local full-bench "
            "A/B before being called real"
        )
        env_note = f"{env_note}; {note}" if env_note else note
    # r16 (verdict ask #4): calibration-normalized totals.  When a
    # snapshot carries the sampled cal_profile (bench.py r16+), its
    # host_slowdown_factor divides the total so a 3x-contaminated run
    # (like the r15 driver bench) compares mechanically instead of
    # narratively.  Sides without a profile report raw totals and the
    # note says so.
    calibration = None
    pcal, ccal = prev.get("cal_profile") or {}, curr.get("cal_profile") or {}
    if pcal or ccal:
        def _norm(doc, cal):
            v = doc.get("value")
            f = cal.get("host_slowdown_factor")
            return (
                round(v / f, 3) if v is not None and f else doc.get(
                    "value_normalized"
                )
            )
        pn, cn = _norm(prev, pcal), _norm(curr, ccal)
        calibration = {
            "prev_factor": pcal.get("host_slowdown_factor"),
            "curr_factor": ccal.get("host_slowdown_factor"),
            "prev_total_normalized": pn,
            "curr_total_normalized": cn,
        }
        if pn and cn:
            calibration["normalized_delta_pct"] = round((cn - pn) / pn, 4)
        missing = [
            n for n, c in (("prev", pcal), ("curr", ccal)) if not c
        ]
        if missing:
            calibration["note"] = (
                f"snapshot(s) {missing} predate the sampled cal_profile — "
                "their totals are raw"
            )
    return {
        "threshold_pct": threshold,
        "abs_floor_sec": ABS_FLOOR_SEC,
        "calibration": calibration,
        "coverage": {
            name: {
                "format": doc.get("format", "bench_full"),
                "n_compared": len(doc.get("queries", {})),
                "n_total": doc.get("n_queries_total"),
            }
            for name, doc in (("prev", prev), ("curr", curr))
        },
        "env_prev": pe,
        "env_curr": ce,
        "env_note": env_note,
        "prev_total": prev.get("value"),
        "curr_total": curr.get("value"),
        "n_shared": len(shared),
        "added": sorted(set(cq) - set(pq)),
        "removed": sorted(set(pq) - set(cq)),
        "regressions": regressions,
        "improvements": improvements,
        "per_query": per_query,
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    threshold = 0.3
    out_name = None
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_name = args[i + 1]
        del args[i : i + 2]
    if len(args) != 2:
        raise SystemExit(__doc__)
    result = diff(_load(args[0]), _load(args[1]), threshold)
    text = json.dumps(result, indent=1)
    if out_name is not None:
        (REPO / "bench_records" / out_name).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
