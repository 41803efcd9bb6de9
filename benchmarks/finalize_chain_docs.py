"""Watch the reference-scale chain evidence and land its BASELINE.md row.

The chain (benchmarks/reference_scale.py) git-commits its evidence JSON
after every stage, but the human-facing BASELINE.md row has historically
been appended by hand *after* the evaluate stage — and three VM re-images
killed sessions before that hand-off happened.  This watcher closes the
gap: it polls the evidence file, and the moment the metric trio appears it
appends the BASELINE row(s) and git-commits them.  Idempotent via a row
marker; safe to run detached alongside the chain.

Usage:  python benchmarks/finalize_chain_docs.py [--once]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BASELINE.md")

# (evidence file, BASELINE row marker, setting label)
TARGETS = [
    ("reference_scale.json", "reference-scale chain METRIC TRIO",
     "full-target"),
    ("reference_scale_partial.json",
     "reference-scale chain METRIC TRIO (partial", "partial-target"),
]


def _fmt(v, nd=4):
    try:
        return f"{float(v):.{nd}g}"
    except (TypeError, ValueError):
        return "?"


def _row(tag, label, ev):
    s = ev.get("scale", {})
    m = ev.get("metrics", {})
    t = ev.get("stage_seconds", {})
    date = time.strftime("%Y-%m-%d", time.gmtime())
    parts = [
        f"best full cd **{_fmt(m.get('best_full_cd_loss'))}**",
        f"top-1 cd {_fmt(m.get('cd_loss_top1'))}",
        f"re {_fmt(m.get('best_full_re_loss'))}",
        f"NDCG@40 {_fmt(m.get('ndcg@40'))}",
        f"cl acc {_fmt(m.get('cl_acc'), nd=3)}%",
    ]
    vis = ev.get("vis_metrics")
    if isinstance(vis, dict) and vis:
        k, v = next(iter(vis.items()))
        parts.append(f"vis {k} {_fmt(v)}")
    stage_bits = ", ".join(
        f"{k} {t[k]:.0f} s" for k in
        ("pair_archive_train", "pair_archive_test", "train", "evaluate")
        if k in t)
    return (
        f"| {date} | {tag}: {label} setting, {s.get('targets')} targets x "
        f"{s.get('sources')} sources, {s.get('epochs')} epochs, "
        f"bn_recalibration_passes=0 (one resumable chain command; "
        f"{stage_bits}; total {ev.get('total_seconds', 0):.0f} s) | "
        + ", ".join(parts) + " |\n")


def _metrics_ready(ev):
    m = ev.get("metrics") or {}
    return "best_full_cd_loss" in m


def check_once():
    landed = []
    with open(BASELINE) as f:
        doc = f.read()
    for fname, marker, label in TARGETS:
        path = os.path.join(REPO, fname)
        if marker in doc:
            continue
        try:
            with open(path) as f:
                ev = json.load(f)
        except (OSError, ValueError):
            continue
        if not _metrics_ready(ev):
            continue
        row = _row(marker, label, ev)
        with open(BASELINE, "a") as f:
            f.write(row)
        doc += row
        subprocess.run(["git", "add", "BASELINE.md", fname], cwd=REPO,
                       check=False)
        subprocess.run(
            ["git", "commit", "-q", "-m",
             f"BASELINE: {label} reference-scale metric trio "
             "(auto-landed by finalize_chain_docs)"],
            cwd=REPO, check=False)
        landed.append(fname)
    return landed


def main(argv):
    once = "--once" in argv
    while True:
        landed = check_once()
        for f in landed:
            print(f"landed BASELINE row from {f}", flush=True)
        if once:
            return
        time.sleep(60.0)


if __name__ == "__main__":
    main(sys.argv[1:])
