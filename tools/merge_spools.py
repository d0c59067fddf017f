"""Merge per-host sweep spools into one global summary.

Multi-host runs write per-host JSONL spools (cli.infer tags them
``<tag>_h<rank>``, one per process; scene indices are LOCAL to each host's
contiguous slice, parallel/mesh.process_scene_slice).  This tool merges them
into a single spool with globalised scene indices and prints the combined
summary — the cross-host reduction the reference never had (its multi-GPU
practice was disjoint config files, SURVEY §2.3).

Usage:
  python -m tools.merge_spools --out merged.jsonl spool_h0.jsonl spool_h1.jsonl
  python -m tools.merge_spools --total-scenes 128 ... # globalise indices

With --total-scenes the per-host local indices are offset by the same
contiguous-slice arithmetic the hosts used (rank order = argument order);
without it records keep their local indices and a 'host' field
disambiguates.
"""

from __future__ import annotations

import argparse
import json
import sys


def read_spool(path):
    """Latest record per scene_index (resume may append duplicates)."""
    records = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn tail write
            records[rec["scene_index"]] = rec
    return [records[k] for k in sorted(records)]


def slice_offsets(total_scenes: int, n_hosts: int):
    """Contiguous-block offsets matching mesh.process_scene_slice."""
    per = -(-total_scenes // n_hosts)
    return [min(i * per, total_scenes) for i in range(n_hosts)]


def merge(paths, total_scenes=None):
    merged = []
    offsets = (slice_offsets(total_scenes, len(paths))
               if total_scenes is not None else None)
    for rank, path in enumerate(paths):
        for rec in read_spool(path):
            rec = dict(rec)
            rec["host"] = rank
            if offsets is not None:
                rec["scene_index"] = rec["scene_index"] + offsets[rank]
            merged.append(rec)
    merged.sort(key=lambda r: (r["scene_index"], r["host"]))
    return merged


def summarize(records):
    """Combined summary with the same shape as SweepState.summary()."""
    by_type = {}
    for rec in records:
        by_type.setdefault(rec["scene_type"], []).append(rec)
    out = {}
    total_n = total_s = 0
    for st, recs in sorted(by_type.items()):
        n, s = len(recs), sum(r["success"] for r in recs)
        out[st] = {"n": n, "successes": s,
                   "success_rate": 100.0 * s / n if n else 0.0}
        total_n += n
        total_s += s
    out["overall"] = {"n": total_n, "successes": total_s,
                      "success_rate":
                      100.0 * total_s / total_n if total_n else 0.0}
    out["hosts"] = sorted({r["host"] for r in records})
    wins = {}
    win_success = {}
    for rec in records:
        g = rec.get("winning_guide")
        if g is None:
            continue
        wins[g] = wins.get(g, 0) + 1
        win_success[g] = win_success.get(g, 0) + int(rec["success"])
    if wins:
        n_attr = sum(wins.values())
        out["per_guide"] = {
            str(g): {"wins": wins[g], "win_rate": 100.0 * wins[g] / n_attr,
                     "successes_when_winning": win_success[g]}
            for g in sorted(wins)}
    with_metrics = [r["metrics"] for r in records if r.get("metrics")]
    if with_metrics:
        n = len(with_metrics)
        out["protocol"] = {
            "n": n,
            "success_rate": 100.0 * sum(
                m["protocol_success"] for m in with_metrics) / n,
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="merge_spools")
    ap.add_argument("spools", nargs="+", help="per-host JSONL spools, "
                    "in process-rank order")
    ap.add_argument("--out", default=None, help="write merged JSONL here")
    ap.add_argument("--total-scenes", type=int, default=None,
                    help="globalise local indices using the contiguous "
                    "slice arithmetic over this many scenes")
    args = ap.parse_args(argv)

    records = merge(args.spools, args.total_scenes)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    print(json.dumps(summarize(records), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
