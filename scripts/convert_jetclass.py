"""Offline JetClass shard converter: `.root` → the padded `.h5` layout the
TPU pipeline reads natively (schema documented in
multimodal_particles_tpu/data/particle_clouds/utils.py; reference `.root`
decoding: data/particle_clouds/utils.py:15-29).

Run this on a machine where `uproot` IS installed, then ship the `.h5`:

  python scripts/convert_jetclass.py shard0.root [shard1.root ...] --out-dir converted/

The converted shards load with
  ParticleClouds(dataset="JetClass", data_paths=["converted/shard0.h5"]).
"""

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_particles_tpu.data.particle_clouds.utils import (  # noqa: E402
    convert_jetclass_root_to_h5,
    validate_jetclass_h5,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shards", nargs="+", help=".root shard paths")
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for shard in args.shards:
        stem = os.path.splitext(os.path.basename(shard))[0]
        out = os.path.join(args.out_dir, f"{stem}.h5")
        convert_jetclass_root_to_h5(shard, out)
        shape = validate_jetclass_h5(out)
        print(f"{shard} -> {out}  ({shape[0]} jets, max {shape[1]} particles)")


if __name__ == "__main__":
    main()
