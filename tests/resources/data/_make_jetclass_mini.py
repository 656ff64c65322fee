"""Generate jetclass_mini.h5 — a synthetic converted-JetClass fixture.

A real JetClass `.root` shard is not redistributable here (and uproot is not
installed), so this deterministic generator writes a shard in EXACTLY the
layout `convert_jetclass_root_to_h5` produces (see the schema comment in
multimodal_particles_tpu/data/particle_clouds/utils.py): padded raw
4-momenta + exclusive flavor flags + charge + mask. The physics content is
synthetic boosted-jet-like kinematics; the *contract* (dataset names, dtypes,
flag exclusivity, charge consistency) mirrors one converted shard.

  python tests/resources/data/_make_jetclass_mini.py
"""

import os

import h5py
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jetclass_mini.h5")

B, L = 60, 40
rng = np.random.default_rng(20260816)

counts = rng.integers(5, L + 1, B)
mask = (np.arange(L)[None, :] < counts[:, None]).astype(np.uint8)

# boosted jet cores: each jet has a direction, particles scatter around it
jet_pt = rng.uniform(400.0, 900.0, B)
jet_eta = rng.normal(0.0, 1.2, B)
jet_phi = rng.uniform(-np.pi, np.pi, B)
z = rng.dirichlet(np.ones(L) * 0.5, B)  # momentum fractions
pt = z * jet_pt[:, None] * mask
eta = (jet_eta[:, None] + rng.normal(0, 0.25, (B, L))) * mask
phi = (jet_phi[:, None] + rng.normal(0, 0.25, (B, L))) * mask

px = pt * np.cos(phi)
py = pt * np.sin(phi)
pz = pt * np.sinh(eta)
# small hadron masses so energy > |p| for most species
m = rng.uniform(0.0, 0.14, (B, L))
energy = np.sqrt(px**2 + py**2 + pz**2 + m**2) * mask

# exclusive flavor flags: photon / h0 / h± / e / mu
flavor = rng.choice(5, (B, L), p=[0.25, 0.2, 0.45, 0.06, 0.04])
names = (
    "part_isPhoton",
    "part_isNeutralHadron",
    "part_isChargedHadron",
    "part_isElectron",
    "part_isMuon",
)
flags = {
    name: ((flavor == i) & (mask > 0)).astype(np.uint8)
    for i, name in enumerate(names)
}
charged = (flavor >= 2) & (mask > 0)
charge = np.where(charged, rng.choice([-1, 1], (B, L)), 0).astype(np.int8)

with h5py.File(OUT, "w") as f:
    f.attrs["format_version"] = 1
    f.attrs["tree"] = "tree"
    f.attrs["source"] = "synthetic (see _make_jetclass_mini.py)"
    for name, arr in (
        ("part_px", px),
        ("part_py", py),
        ("part_pz", pz),
        ("part_energy", energy),
    ):
        f.create_dataset(name, data=(arr * mask).astype(np.float32), compression="gzip")
    for name, arr in flags.items():
        f.create_dataset(name, data=arr, compression="gzip")
    f.create_dataset("part_charge", data=charge * mask, compression="gzip")
    f.create_dataset("mask", data=mask, compression="gzip")

print(f"wrote {OUT}: {B} jets, max {L} particles")
