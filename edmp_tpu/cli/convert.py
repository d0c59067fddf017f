"""Artifact conversion CLI.

  dataset:  reference *_solvable_problems.pkl  ->  packed .npz
  weights:  reference weights_latest.pt        ->  torch-free .npz

Usage:
  python -m edmp_tpu.cli.convert dataset datasets/global_solvable_problems.pkl global.npz
  python -m edmp_tpu.cli.convert weights models/TemporalUNetModel255_N50/weights_latest.pt weights.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="edmp-convert")
    ap.add_argument("kind", choices=["dataset", "weights"])
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)

    if args.kind == "dataset":
        from edmp_tpu.data.problems import convert_reference_dataset

        ds = convert_reference_dataset(args.src, args.dst)
        print(f"packed {len(ds)} problems -> {args.dst}")
    else:
        from edmp_tpu.models.convert import export_npz

        export_npz(args.src, args.dst)
        print(f"exported weights -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
