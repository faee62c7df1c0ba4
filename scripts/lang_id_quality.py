#!/usr/bin/env python
"""Accuracy measurement for ``lang_id_model`` (r15 verdict ask #5: the
trained char-trigram NB is driver-green and held-out-tested but had no
committed accuracy table).

Eval set: ``tests/fixtures/lang_id_eval.tsv`` — 85 labelled texts, none
of which appear in the ``_LANG_SEEDS`` training corpora:

* ``synthetic``      — 12 held-out sentences per language (60), written
                       fresh for this eval in the seeds' ASCII-folded
                       orthography.
* ``udhr``           — UDHR Articles 1-3 excerpts per language (public
                       domain), ASCII-folded: real out-of-domain prose
                       with legal/formal vocabulary the seeds never saw.
* ``udhr_accented``  — the same Article 1 with native diacritics kept:
                       measures robustness to accented trigrams the
                       ASCII-only seed corpora cannot contain (misses
                       fall to the per-language default weight).
* ``short``          — sub-trigram / empty texts that must return
                       ``unknown``.

Reports per-language precision/recall/F1, macro-F1 overall and per
source bucket, and the full confusion matrix.  Output: one JSON file
(``--out``, append-or-version protocol — never overwrite a cited file)
plus a markdown table on stdout for QUALITY/RECALL docs.

Usage: python scripts/lang_id_quality.py --out bench_records/LANG_ID_QUALITY_r16.json
"""

from __future__ import annotations

import csv
import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE = REPO / "tests" / "fixtures" / "lang_id_eval.tsv"


def prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return round(p, 4), round(r, 4), round(f, 4)


def score(rows: list[tuple[str, str]]) -> dict:
    """rows: (want, got) pairs -> per-label P/R/F1 + macro-F1."""
    labels = sorted({w for w, _ in rows} | {g for _, g in rows})
    per = {}
    fs = []
    for lab in labels:
        tp = sum(1 for w, g in rows if w == lab and g == lab)
        fp = sum(1 for w, g in rows if w != lab and g == lab)
        fn = sum(1 for w, g in rows if w == lab and g != lab)
        p, r, f = prf(tp, fp, fn)
        per[lab] = {"n": tp + fn, "precision": p, "recall": r, "f1": f}
        if tp + fn:  # macro over labels present in gold
            fs.append(f)
    acc = sum(1 for w, g in rows if w == g) / len(rows) if rows else 0.0
    return {
        "n": len(rows),
        "accuracy": round(acc, 4),
        "macro_f1": round(sum(fs) / len(fs), 4) if fs else 0.0,
        "per_label": per,
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        out_path = Path(args[args.index("--out") + 1])
        if out_path.exists():
            raise SystemExit(
                f"{out_path} exists — evidence files are append-or-version "
                "(ARCHITECTURE.md §4); pick a new name"
            )

    rows = []
    with open(FIXTURE, newline="") as fh:
        for rec in csv.DictReader(fh, delimiter="\t"):
            rows.append(
                (int(rec["id"]), rec["lang"], rec["source"], rec.get("text") or "")
            )
    assert len(rows) >= 80, len(rows)

    import bench
    from csv_etl_spark import get_spark
    from csv_etl_spark.operators import classify

    spark = get_spark("lang-id-quality")
    spark.sparkContext.setLogLevel("ERROR")
    env = bench._env_stamp()

    df = spark.createDataFrame(
        [(i, t) for i, _, _, t in rows], "doc_id int, text string"
    )
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in classify.lang_id_model(df).collect()
    }
    assert set(pred) == {i for i, *_ in rows}

    pairs_all = [(lang, pred[i]) for i, lang, _, _ in rows]
    by_source: dict[str, list] = defaultdict(list)
    for i, lang, source, _ in rows:
        by_source[source].append((lang, pred[i]))

    confusion: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for want, got in pairs_all:
        confusion[want][got] += 1
    errors = [
        {"id": i, "want": lang, "got": pred[i], "source": source, "text": t[:60]}
        for i, lang, source, t in rows
        if pred[i] != lang
    ]

    report = {
        "round": 16,
        "purpose": "VERDICT r15 ask #5: committed accuracy table for lang_id_model",
        "fixture": str(FIXTURE.relative_to(REPO)),
        "model": "char-trigram multinomial NB (classify.lang_trigram_model, alpha=0.5, top_per_lang=128)",
        "overall": score(pairs_all),
        "by_source": {s: score(p) for s, p in sorted(by_source.items())},
        "confusion": {w: dict(g) for w, g in sorted(confusion.items())},
        "errors": errors,
        "env": env,
    }

    md = ["| label | n | precision | recall | f1 |", "|---|---|---|---|---|"]
    for lab, m in report["overall"]["per_label"].items():
        if m["n"]:
            md.append(
                f"| {lab} | {m['n']} | {m['precision']} | {m['recall']} | {m['f1']} |"
            )
    md.append(
        f"| **macro** | {report['overall']['n']} |  |  | "
        f"**{report['overall']['macro_f1']}** |"
    )
    print("\n".join(md))
    print()
    for s, m in report["by_source"].items():
        print(f"{s}: n={m['n']} accuracy={m['accuracy']} macro_f1={m['macro_f1']}")
    if errors:
        print("\nerrors:")
        for e in errors:
            print(f"  #{e['id']} want={e['want']} got={e['got']} [{e['source']}] {e['text']}")

    if out_path:
        out_path.write_text(json.dumps(report, indent=1))
        print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
