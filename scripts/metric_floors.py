"""Sampling-noise floors for the physics KL/W1 quality metrics.

Every quality artifact in benchmarks/ scores generated jets against the
bundled 100-jet AOJ-mini shard (the same protocol as the reference's
evaluation notebooks, reference: data/particle_clouds/jets.py:143-163).
At that data scale the metrics have a non-zero floor: even a PERFECT
model — one that reproduces the shard's empirical distribution exactly —
scores KL/W1 > 0 because the generated sample and the 100-jet reference
histogram both carry sampling noise.

This script measures that floor, model-independently: each bootstrap
round draws `--gen-jets` jets WITH replacement from the data's
physics-space cloud (the plug-in "perfect model") and scores them against
the full data cloud through the exact scoring path the harnesses use
(`quality_parity.score` for the 1-D feature KL/W1s,
`quality_families._hist_kl` for the integer multiplicity histogram KL).
Reported per feature: median / min / max over the bootstrap rounds.

The transdim ledger already carries one hand-measured instance of this
number (quality_transdim.json `kl_floor_note`: KL_mult floor 0.0066 at
4096 draws); this generalizes it to every feature and family scale.

  python scripts/metric_floors.py --out benchmarks/metric_floors.json
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_families import _hist_kl, _w1  # noqa: E402
from quality_parity import score  # noqa: E402


def subsample_cloud(cloud, idx, ParticleClouds):
    """Physics-space jet subsample (rows of the padded cloud arrays)."""
    state = SimpleNamespace(
        continuous=cloud.continuous[idx],
        discrete=cloud.discrete[idx] if hasattr(cloud, "discrete") else None,
        absorbing=cloud.mask[idx],
    )
    return ParticleClouds(state)


def bootstrap_floors(cloud, hl_data, features, gen_jets, boots, seed,
                     compute_substructure=True):
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import (
        ParticleClouds,
    )

    rng = np.random.default_rng(seed)
    n_data = cloud.mask.shape[0]
    n_slots = cloud.mask.shape[1]
    mult_data = np.sum(cloud.mask[..., 0] > 0, axis=-1)

    rows = []
    for _ in range(boots):
        idx = rng.integers(0, n_data, size=gen_jets)
        hl_gen = JetClassHighLevelFeatures(
            subsample_cloud(cloud, idx, ParticleClouds),
            compute_substructure=compute_substructure,
        )
        row = score(hl_gen, hl_data, features)
        mult_gen = mult_data[idx]
        row["KL_mult_hist"] = round(_hist_kl(mult_gen, mult_data, 0, n_slots), 4)
        row["W1_mult_particles"] = round(_w1(mult_gen, mult_data), 4)
        rows.append(row)

    floors = {}
    for key in rows[0]:
        vals = [r[key] for r in rows if r[key] is not None]
        if not vals:
            floors[key] = None
            continue
        floors[key] = {
            "median": round(float(np.median(vals)), 4),
            "min": round(float(np.min(vals)), 4),
            "max": round(float(np.max(vals)), 4),
        }
    return floors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-jets", type=int, default=100,
                    help="AOJ-mini shard size used by every quality harness")
    ap.add_argument("--gen-jets", type=int, nargs="+", default=[4096],
                    help="generation sample size(s) to measure the floor at")
    ap.add_argument("--boots", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-substructure", action="store_true")
    ap.add_argument("--out",
                    default=os.path.join(REPO_ROOT, "benchmarks",
                                         "metric_floors.json"))
    args = ap.parse_args()

    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import (
        ParticleClouds,
    )

    cloud = ParticleClouds("AspenOpenJets", num_jets=args.data_jets)
    hl_data = JetClassHighLevelFeatures(cloud)

    features = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet"]
    if not args.no_substructure:
        features += ["tau21", "tau32", "d2"]

    out = {
        "data_jets": int(cloud.mask.shape[0]),
        "boots": args.boots,
        "seed": args.seed,
        "protocol": (
            "plug-in bootstrap: gen_jets draws WITH replacement from the "
            "data shard, scored vs the full shard with the harnesses' exact "
            "scoring path; the floor a perfect model of the shard would hit"
        ),
        "floors": {},
    }
    for gen_jets in args.gen_jets:
        t0 = time.time()
        out["floors"][str(gen_jets)] = bootstrap_floors(
            cloud, hl_data, features, gen_jets, args.boots, args.seed,
            compute_substructure=not args.no_substructure,
        )
        print(f"[floors] gen_jets={gen_jets}: {time.time() - t0:.1f}s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["floors"], indent=2))
    print(f"[floors] wrote {args.out}")


if __name__ == "__main__":
    main()
