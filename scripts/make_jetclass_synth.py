"""Synthetic JetClass-schema shard generator at quality-evaluation scale.

The quality ledger's weakness (VERDICT r4 "What's weak" #1) is that every
artifact scores against the bundled 100-jet AOJ-mini shard, where even a
PERFECT model floors at KL_pt ~ 1.6 (benchmarks/metric_floors.json). A real
JetClass `.root` shard is not redistributable here and uproot is absent, so
this generator writes a shard in EXACTLY the layout
`convert_jetclass_root_to_h5` produces (schema contract:
multimodal_particles_tpu/data/particle_clouds/utils.py:263-360, enforced by
`validate_jetclass_h5`) at 10k-50k jets — big enough that the KL/W1 floors
drop ~10-100x and the metrics can actually fail a bad model.

The physics content is synthetic but deliberately MULTIMODAL, mimicking the
three JetClass regimes the reference trains on (QCD / W / top,
reference: data/particle_clouds/utils.py:15-29 branch list):

  class 0 "QCD-like"  1 prong   falling pt spectrum, low multiplicity
  class 1 "W-like"    2 prongs  two-body mass peak, mid multiplicity
  class 2 "top-like"  3 prongs  three-body cascade, high multiplicity

so multiplicity, jet mass, tau21, tau32 and d2 are all genuinely
multimodal — a model that collapses any of them scores far above floor.

  python scripts/make_jetclass_synth.py --n-jets 20000 \
      --out .cache/jetclass_synth_20k.h5
"""

import argparse
import os

import h5py
import numpy as np

FLAG_NAMES = (
    "part_isPhoton",
    "part_isNeutralHadron",
    "part_isChargedHadron",
    "part_isElectron",
    "part_isMuon",
)

# (class fraction, n prongs, multiplicity (mean, dispersion),
#  jet pt (lognorm mean, sigma), prong spread, particle spread)
_CLASSES = (
    (0.5, 1, (22.0, 6.0), (6.2, 0.35), 0.00, 0.12),
    (0.3, 2, (32.0, 7.0), (6.4, 0.25), 0.22, 0.07),
    (0.2, 3, (45.0, 8.0), (6.5, 0.20), 0.28, 0.06),
)


def write_synthetic_jetclass_shard(path, n_jets=20000, max_particles=64,
                                   seed=20260819):
    """Write a synthetic converted-JetClass shard; returns (n_jets, L)."""
    rng = np.random.default_rng(seed)
    L = max_particles

    fracs = np.array([c[0] for c in _CLASSES])
    cls = rng.choice(len(_CLASSES), n_jets, p=fracs / fracs.sum())

    counts = np.empty(n_jets, np.int64)
    jet_pt = np.empty(n_jets)
    pt = np.zeros((n_jets, L))
    eta = np.zeros((n_jets, L))
    phi = np.zeros((n_jets, L))

    slot = np.arange(L)[None, :]
    for ci, (_, n_prong, (m_mu, m_sd), (pt_mu, pt_sd), p_spread,
             x_spread) in enumerate(_CLASSES):
        sel = np.nonzero(cls == ci)[0]
        n = len(sel)
        if n == 0:
            continue
        counts[sel] = np.clip(
            rng.normal(m_mu, m_sd, n).round().astype(np.int64), 5, L
        )
        jet_pt[sel] = np.exp(rng.normal(pt_mu, pt_sd, n))

        # prong directions around the jet axis; prong 0 carries the core
        p_eta = rng.normal(0.0, p_spread, (n, n_prong))
        p_phi = rng.normal(0.0, p_spread, (n, n_prong))
        p_share = rng.dirichlet(np.full(n_prong, 6.0), n)  # (n, n_prong)

        # each particle joins a prong w.p. = the prong's momentum share
        u = rng.random((n, L, 1))
        prong = (u > np.cumsum(p_share, -1)[:, None, :]).sum(-1)
        prong = np.minimum(prong, n_prong - 1)

        # momentum fractions: Dirichlet within the jet, weighted toward the
        # particle's prong share so prongs carry their momentum
        z = rng.gamma(0.6, 1.0, (n, L))
        z *= np.take_along_axis(p_share, prong, axis=1)
        alive = slot < counts[sel][:, None]
        z *= alive
        z /= z.sum(1, keepdims=True)
        pt[sel] = z * jet_pt[sel][:, None]
        eta[sel] = (
            np.take_along_axis(p_eta, prong, 1)
            + rng.normal(0, x_spread, (n, L))
        ) * alive
        phi[sel] = (
            np.take_along_axis(p_phi, prong, 1)
            + rng.normal(0, x_spread, (n, L))
        ) * alive

    mask = (slot < counts[:, None]).astype(np.uint8)
    # place jets across the detector
    jet_eta = rng.normal(0.0, 1.0, n_jets)[:, None]
    jet_phi = rng.uniform(-np.pi, np.pi, n_jets)[:, None]
    eta = (eta + jet_eta) * mask
    phi = ((phi + jet_phi + np.pi) % (2 * np.pi) - np.pi) * mask

    px = pt * np.cos(phi)
    py = pt * np.sin(phi)
    pz = pt * np.sinh(eta)
    m_h = rng.uniform(0.0, 0.14, (n_jets, L))
    energy = np.sqrt(px**2 + py**2 + pz**2 + m_h**2) * mask

    # exclusive flavor flags with a pt-dependent neutral fraction
    flavor = rng.choice(5, (n_jets, L), p=[0.25, 0.2, 0.45, 0.06, 0.04])
    flags = {
        name: ((flavor == i) & (mask > 0)).astype(np.uint8)
        for i, name in enumerate(FLAG_NAMES)
    }
    charged = (flavor >= 2) & (mask > 0)
    charge = np.where(charged, rng.choice([-1, 1], (n_jets, L)), 0).astype(
        np.int8
    )

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["format_version"] = 1
        f.attrs["tree"] = "tree"
        f.attrs["source"] = (
            "synthetic 3-class prong mixture (make_jetclass_synth.py, "
            f"seed {seed})"
        )
        for name, arr in (
            ("part_px", px),
            ("part_py", py),
            ("part_pz", pz),
            ("part_energy", energy),
        ):
            f.create_dataset(
                name, data=(arr * mask).astype(np.float32), compression="gzip"
            )
        for name, arr in flags.items():
            f.create_dataset(name, data=arr, compression="gzip")
        f.create_dataset("part_charge", data=charge * mask, compression="gzip")
        f.create_dataset("mask", data=mask, compression="gzip")
    return n_jets, L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-jets", type=int, default=20000)
    ap.add_argument("--max-particles", type=int, default=64)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache", "jetclass_synth_20k.h5",
        ),
    )
    args = ap.parse_args()
    n, L = write_synthetic_jetclass_shard(
        args.out, args.n_jets, args.max_particles, args.seed
    )
    print(f"wrote {args.out}: {n} jets, max {L} particles")


if __name__ == "__main__":
    main()
