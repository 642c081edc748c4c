#!/usr/bin/env python
"""Score a discovery manifest against a ground-truth occurrence table.

Usage: python tools/eval_clusters.py OUT_DIR/clusters.json CORPUS/truth.json

Reports purity (majority-motif fraction of labeled members), coverage
(fraction of planted occurrences matched by some discovered segment), and
pairwise F1 over same-motif relations — the standard unsupervised-discovery
scorecard for the planted-motif corpus (synthetic.make_corpus writes
truth.json beside the WAVs).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter
from itertools import combinations


def _motif_of(member: dict, truth: list[dict]) -> int | None:
    base = os.path.basename(member["file"])
    for t in truth:
        if t["file"] == base:
            ov = min(t["end_sample"], member["end_sample"]) - max(
                t["start_sample"], member["start_sample"]
            )
            if ov > 0.5 * (member["end_sample"] - member["start_sample"]):
                return t["motif"]
    return None


def evaluate(manifest: dict, truth: list[dict]) -> dict:
    labeled: list[tuple[int, int]] = []   # (cluster_id, motif)
    matched_truth: set[tuple[str, int]] = set()
    for c in manifest["clusters"]:
        for m in c["members"]:
            mot = _motif_of(m, truth)
            if mot is not None:
                labeled.append((c["cluster_id"], mot))
                for t in truth:
                    if t["file"] == os.path.basename(m["file"]):
                        ov = min(t["end_sample"], m["end_sample"]) - max(
                            t["start_sample"], m["start_sample"]
                        )
                        if ov > 0.5 * (t["end_sample"] - t["start_sample"]):
                            matched_truth.add((t["file"], t["start_sample"]))

    by_cluster: dict[int, list[int]] = {}
    for cid, mot in labeled:
        by_cluster.setdefault(cid, []).append(mot)
    pure = sum(Counter(mots).most_common(1)[0][1] for mots in by_cluster.values())
    purity = pure / max(len(labeled), 1)
    coverage = len(matched_truth) / max(len(truth), 1)

    # Pairwise same-motif F1 over labeled members.
    tp = fp = fn = 0
    for (c1, m1), (c2, m2) in combinations(labeled, 2):
        same_pred, same_true = c1 == c2, m1 == m2
        tp += same_pred and same_true
        fp += same_pred and not same_true
        fn += same_true and not same_pred
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {
        "purity": round(purity, 4),
        "coverage": round(coverage, 4),
        "pairwise_precision": round(prec, 4),
        "pairwise_recall": round(rec, 4),
        "pairwise_f1": round(f1, 4),
        "n_labeled_members": len(labeled),
        "n_truth": len(truth),
    }


def main() -> int:
    manifest = json.load(open(sys.argv[1]))
    truth = json.load(open(sys.argv[2]))
    print(json.dumps(evaluate(manifest, truth), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
