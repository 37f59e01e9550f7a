"""Drop-in metrics CLI (reference metrics.py:9-15 flag surface).

    python -m tecogan_tpu.cli.metrics --output <dir> \
        --results <dir1,dir2,...> --targets <dir1,dir2,...>

Writes ``metrics.csv`` (+ ``metricsfile.txt`` log tee) in the reference's
exact format via :mod:`tecogan_tpu.eval.suite`.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser("tecogan_tpu.cli.metrics")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--results", required=True,
                   help="comma-separated result directories")
    p.add_argument("--targets", required=True,
                   help="comma-separated target (GT) directories")
    p.add_argument("--lpips_backbone", default=None,
                   help="AlexNet backbone weights (.pth/.npz) for LPIPS")
    args = p.parse_args(argv)

    import os

    from tecogan_tpu.eval import default_lpips, evaluate_folders
    from tecogan_tpu.eval.suite import Tee

    os.makedirs(args.output, exist_ok=True)
    sys.stdout = Tee(os.path.join(args.output, "metricsfile.txt"))
    print("[Configurations]:")
    for k, v in sorted(vars(args).items()):
        print(f"\t{k}: {v}")
    print("End of configuration")

    evaluate_folders(
        args.results.split(","),
        args.targets.split(","),
        args.output,
        lpips_model=default_lpips(backbone_path=args.lpips_backbone),
    )


if __name__ == "__main__":
    main()
