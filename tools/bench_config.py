"""Measure the full train step (fwd+bwd+optimizer) of any recipe YAML.

Usage: python tools/bench_config.py configs/SAN/zinc-SAN.yaml [dim_out]

Same methodology as bench.py's bench_shape (min window, one workload per
process); datasets resolve through the loader like production (synthetic
fallback sizes come from the recipe's dataset block).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from graphgps_tpu.config.config import load_cfg  # noqa: E402


def main():
    path = sys.argv[1]
    dim_out = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    def make_cfg(new_cfg):
        cfg = load_cfg(new_cfg(), path)
        cfg.train.enable_ckpt = False
        return cfg, dim_out

    out = bench.bench_shape(make_cfg, windows=4, iters=100)
    print(os.path.basename(path), out)


if __name__ == "__main__":
    main()
