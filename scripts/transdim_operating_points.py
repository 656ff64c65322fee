"""Transdimensional solver operating-point sweep (steps x multi_birth).

The transdim bench line is the weakest perf number (2,167 jets/s/chip =
1.04x target at the quality-valid 96-step x multi_birth=16 point,
BENCH_r04). Sampler cost is ~linear in step count, so if a lower step
count holds quality, the canonical number rises proportionally. This
sweep re-scores the converged cached params
(.cache/transdim_3000ep_params.pkl) at a grid of (sampler_steps,
multi_birth) settings — sampling-time only, no retraining — through the
exact quality_families.py scoring path (same shard, same metrics,
same analytic all-dims posterior) and records the grid in
`benchmarks/transdim_operating_points.json`.

Quality gate for promoting a faster point (vs the 96x16 headline in
quality_transdim.json: KL_mult 0.0428, W1_mult 0.545, measured sampling
floor 0.0058-0.0066 at 4096 jets):
  - KL_mult_gen_vs_data <= 2x the 96-step value, and
  - W1_mult and the continuous physics W1s within ~15% of the 96-step row
    (those are data-scale-structural per cross_family_continuous.json, so
    they should be flat across solver settings).

Each point runs in a subprocess so a Mosaic/axon flake cannot kill the
sweep; points that fail are recorded as errors.

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/transdim_operating_points.py
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(steps, mb, args):
    out = tempfile.mktemp(suffix=f"_transdim_{steps}x{mb}.json")
    cmd = [
        sys.executable,
        os.path.join(REPO_ROOT, "scripts", "quality_families.py"),
        "--family", "transdimensional",
        "--reuse-params", args.reuse_params,
        "--skip-ref-mode",
        "--sampler-steps", str(steps),
        "--multi-birth", str(mb),
        "--gen-jets", str(args.gen_jets),
        "--gen-chunk", str(args.gen_chunk),
        "--seed", str(args.seed),
        "--out", out,
    ]
    env = dict(os.environ)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=args.point_timeout)
    wall = time.time() - t0
    if proc.returncode != 0 or not os.path.exists(out):
        tail = (proc.stdout + proc.stderr)[-2000:]
        print(f"[{steps}x{mb}] FAILED rc={proc.returncode}\n{tail}")
        return {"sampler_steps": steps, "multi_birth": mb,
                "error": tail.splitlines()[-1] if tail else "no output"}
    with open(out) as f:
        h = json.load(f)  # quality_families.py writes a flat document
    os.remove(out)
    row = {
        "sampler_steps": steps,
        "multi_birth": mb,
        "subprocess_wall_s": round(wall, 1),
        "gen_wall_s": h["gen_wall_s"],
        "KL_mult": h["metrics"]["KL_mult_gen_vs_data"],
        "W1_mult": h["metrics"]["W1_mult_gen_vs_data"],
        "mult_mean_gen": h["metrics"]["mult_mean_gen"],
        "mult_mean_data": h["metrics"]["mult_mean_data"],
        "diverged_constituent_frac": h["metrics"]["diverged_constituent_frac"],
        "physics_W1": {
            k: h["physics_metrics"][k]
            for k in ("W1_pt", "W1_m", "W1_eta", "W1_phi",
                      "W1_tau21", "W1_tau32", "W1_d2")
        },
        "scored_jet_fraction": h["physics_metrics"]["scored_jet_fraction"],
    }
    print(f"[{steps}x{mb}] KL_mult {row['KL_mult']} W1_mult {row['W1_mult']} "
          f"mean {row['mult_mean_gen']} (data {row['mult_mean_data']}) "
          f"gen {row['gen_wall_s']}s")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="96x16,64x16,64x24,48x24,48x32",
                    help="comma-separated stepsxmulti_birth grid; the "
                         "96x16 anchor re-scores the current headline")
    ap.add_argument("--gen-jets", type=int, default=4096)
    ap.add_argument("--gen-chunk", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--point-timeout", type=float, default=1200.0)
    ap.add_argument("--reuse-params",
                    default=os.path.join(REPO_ROOT, ".cache",
                                         "transdim_3000ep_params.pkl"))
    ap.add_argument("--out",
                    default=os.path.join(REPO_ROOT, "benchmarks",
                                         "transdim_operating_points.json"))
    args = ap.parse_args()

    grid = []
    for tok in args.points.split(","):
        s, m = tok.strip().split("x")
        grid.append((int(s), int(m)))

    doc = {
        "protocol": (
            "sampling-only re-score of the converged 3000-epoch params "
            "(.cache/transdim_3000ep_params.pkl) through "
            "quality_families.py --skip-ref-mode at each (sampler_steps, "
            "multi_birth); 4096 jets, AOJ-mini 100-jet shard, analytic "
            "all-dims posterior on; same metric path as "
            "quality_transdim.json. gen_wall_s includes the jit compile "
            "for that point — use bench.py for canonical timing"
        ),
        "gate": (
            "promote a faster point only if KL_mult <= 2x the 96x16 "
            "anchor AND W1_mult + continuous W1s within ~15% of it"
        ),
        "rows": [],
    }
    for steps, mb in grid:
        doc["rows"].append(run_point(steps, mb, args))
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)
    print(json.dumps(doc["rows"], indent=2))


if __name__ == "__main__":
    main()
