"""Raw IO, featurization, noise sources and token codec for jet datasets.

Pure numpy host-side pipeline (device code never touches ragged data). This
re-implements the reference extraction stack (reference:
data/particle_clouds/utils.py:15-344) WITHOUT the uproot/awkward/vector
dependency chain: AOJ `.h5` shards are decoded directly with h5py + vectorized
numpy kinematics, and padding/compaction is index arithmetic on fixed-shape
arrays — the same representation the TPU consumes.

AOJ PFCands layout (verified on tests/resources/data/2016H_job0_mini.h5):
  columns [px, py, pz, energy, d0, d0Err, dz, dzErr, charge, pid, PUPPI].
"""

import h5py
import numpy as np


def _wrap_phi(dphi):
    """Wrap azimuthal differences into (-pi, pi]."""
    return -((-dphi + np.pi) % (2.0 * np.pi) - np.pi)


def read_aoj_file(filepath):
    """Load one AOJ `.h5` shard into per-particle feature arrays.

    Mirrors the reference decoding (reference: utils.py:32-105): PFCands with
    |pid| < 11 are zeroed ("weird quark pids"), pid → 5-way flavor one-hot
    in the category order produced by the reference's sorted OneHotEncoder
    (electron, muon, photon, neutralHadron, chargedHadron), and relative
    kinematics are computed against the jet 4-momentum sum.

    Returns a dict of (num_jets, max_len) arrays plus 'mask'.
    """
    with h5py.File(filepath, "r") as f:
        pf = f["PFCands"][:].astype(np.float64)

    # remove entries whose |pid| is not a known species (the reference zeroes
    # |pid| < 11; unknown heavier species (e.g. 321, 2212) must not silently
    # fall through to the electron slot)
    known = (11, 13, 22, 130, 211)
    bad = ~np.isin(np.abs(pf[:, :, -2]), known)
    pf[bad] = 0.0

    pid = np.abs(pf[:, :, -2])
    code = np.zeros_like(pid)
    for raw, tok in ((11, 0), (13, 1), (22, 2), (130, 3), (211, 4)):
        code[pid == raw] = tok
    # one-hot over sorted categories {0:e, 1:mu, 2:gamma, 3:h0, 4:h±}
    one_hot = (code[..., None] == np.arange(5)[None, None, :]).astype(np.float64)

    px, py, pz, energy = pf[:, :, 0], pf[:, :, 1], pf[:, :, 2], pf[:, :, 3]
    charge = pf[:, :, 8]
    mask = energy > 0

    with np.errstate(divide="ignore", invalid="ignore"):
        pt = np.hypot(px, py)
        eta = np.arcsinh(np.where(pt > 0, pz / np.maximum(pt, 1e-30), 0.0))
        phi = np.arctan2(py, px)

        jet_px = (px * mask).sum(1)
        jet_py = (py * mask).sum(1)
        jet_pz = (pz * mask).sum(1)
        jet_pt = np.hypot(jet_px, jet_py)
        jet_eta = np.arcsinh(jet_pz / np.maximum(jet_pt, 1e-30))
        jet_phi = np.arctan2(jet_py, jet_px)

    etarel = np.nan_to_num(eta - jet_eta[:, None]) * mask
    phirel = _wrap_phi(phi - jet_phi[:, None]) * mask

    return {
        "part_pt": pt * mask,
        "part_etarel": etarel,
        "part_phirel": phirel,
        "part_isPhoton": one_hot[..., 2] * mask,
        "part_isNeutralHadron": one_hot[..., 3] * mask,
        "part_isChargedHadron": one_hot[..., 4] * mask,
        "part_isElectron": one_hot[..., 0] * mask,
        "part_isMuon": one_hot[..., 1] * mask,
        "part_charge": charge * mask,
        "mask": mask.astype(np.float64),
    }


def _compact_pad(features, mask, min_num, max_num):
    """Compact valid particles to the front of each row, pad/clip to max_num.

    numpy equivalent of the reference's awkward mask→drop_none→pad_none→clip
    chain (reference: utils.py:35-46,108-113). Jets with fewer than `min_num`
    valid particles are dropped.
    """
    num_valid = mask.sum(1).astype(np.int64)
    keep = num_valid >= min_num
    features = features[keep]
    mask = mask[keep]
    num_valid = num_valid[keep]

    B, L, F = features.shape
    # stable argsort of ~mask puts valid entries first, preserving order
    order = np.argsort(~mask.astype(bool), axis=1, kind="stable")  # (B, L)
    compacted = np.take_along_axis(features, order[:, :, None], axis=1)

    out = np.zeros((B, max_num, F), dtype=features.dtype)
    n = min(L, max_num)
    out[:, :n] = compacted[:, :n]
    # zero anything beyond the per-jet multiplicity (already zero by mask mult,
    # but charge columns etc. may carry zeros anyway — enforce)
    valid = np.arange(max_num)[None, :] < np.minimum(num_valid, max_num)[:, None]
    out *= valid[:, :, None]
    return out, valid.astype(features.dtype)


FEATURE_ORDER = [
    "part_pt",
    "part_etarel",
    "part_phirel",
    "part_isPhoton",
    "part_isNeutralHadron",
    "part_isChargedHadron",
    "part_isElectron",
    "part_isMuon",
    "part_charge",
]


def extract_aoj_features(dataset, **args):
    """AOJ shard(s) → (continuous, discrete, mask) padded numpy arrays.

    continuous: (num_jets, N, 3)  [pt, etarel, phirel]
    discrete:   (num_jets, N, 6)  [5-dim flavor one-hot, charge]
    mask:       (num_jets, N, 1)
    pT-descending sorted per jet (reference: utils.py:169-219).
    """
    max_num_particles = args.get("max_num_particles", 150)
    min_num_particles = args.get("min_num_particles", 0)
    num_jets = args.get("num_jets", 100_000)

    if isinstance(dataset, str):
        dataset = [dataset]
    all_feats, all_masks = [], []
    for path in dataset:
        assert ".h5" in path, "Input should be a path to a .h5 file"
        d = read_aoj_file(path)
        feats = np.stack([d[k] for k in FEATURE_ORDER], axis=-1)  # (B, L, 9)
        feats, valid = _compact_pad(
            feats, d["mask"] > 0, min_num_particles, max_num_particles
        )
        all_feats.append(feats)
        all_masks.append(valid)
    feats = np.concatenate(all_feats, axis=0)
    masks = np.concatenate(all_masks, axis=0)

    data = np.concatenate([feats, masks[:, :, None]], axis=-1)  # (B, N, 10)
    idx = np.argsort(-data[..., 0], axis=1, kind="stable")
    data = np.take_along_axis(data, idx[:, :, None], axis=1)
    data = data[:num_jets].astype(np.float32)

    continuous = data[..., :3]
    discrete = data[..., 3:-1].astype(np.int64)
    mask = data[..., -1:].astype(np.int64)
    return continuous, discrete, mask


# --------------------------------------------------------------- JetClass
#
# JetClass record schema (reference: utils.py:15-29,116-166). One `.root`
# shard holds a TTree named "tree" with ragged per-particle branches; the
# ones this pipeline consumes are:
#
#   part_px, part_py, part_pz, part_energy   float  — particle 4-momentum
#   part_isPhoton, part_isNeutralHadron,
#   part_isChargedHadron, part_isElectron,
#   part_isMuon                              0/1    — exclusive flavor flags
#   part_charge                              -1/0/1 — electric charge
#
# Derived exactly as the reference's vector/awkward chain does:
#   part_pt     = hypot(px, py)
#   part_etarel = arcsinh(pz/pt) - jet_eta     (jet = Σ particle 4-momenta)
#   part_phirel = wrap(atan2(py, px) - jet_phi)
#
# `uproot` is not installed in this environment, so the `.root` path is
# gated: `convert_jetclass_root_to_h5` (or scripts/convert_jetclass.py)
# converts a shard offline where uproot IS available, writing the padded
# HDF5 layout below, which `extract_jetclass_features` reads natively:
#
#   /part_px, /part_py, /part_pz, /part_energy    (B, L) float32
#   /part_isPhoton ... /part_isMuon               (B, L) uint8
#   /part_charge                                  (B, L) int8
#   /mask                                         (B, L) uint8   1 = real
#   attrs: format_version = 1, tree = "tree", source = <root filename>
JETCLASS_KINEMATIC_BRANCHES = ("part_px", "part_py", "part_pz", "part_energy")
JETCLASS_FLAG_BRANCHES = (
    "part_isPhoton",
    "part_isNeutralHadron",
    "part_isChargedHadron",
    "part_isElectron",
    "part_isMuon",
)
JETCLASS_H5_FORMAT_VERSION = 1


def _jetclass_features_from_raw(px, py, pz, flags, charge, mask):
    """Padded raw JetClass arrays → the FEATURE_ORDER dict (same contract as
    read_aoj_file): relative kinematics against the summed jet momentum."""
    mask = mask.astype(bool)
    px = px * mask
    py = py * mask
    pz = pz * mask
    with np.errstate(divide="ignore", invalid="ignore"):
        pt = np.hypot(px, py)
        eta = np.arcsinh(np.where(pt > 0, pz / np.maximum(pt, 1e-30), 0.0))
        phi = np.arctan2(py, px)
        jet_px, jet_py, jet_pz = px.sum(1), py.sum(1), pz.sum(1)
        jet_pt = np.hypot(jet_px, jet_py)
        jet_eta = np.arcsinh(jet_pz / np.maximum(jet_pt, 1e-30))
        jet_phi = np.arctan2(jet_py, jet_px)

    out = {
        "part_pt": pt * mask,
        "part_etarel": np.nan_to_num(eta - jet_eta[:, None]) * mask,
        "part_phirel": _wrap_phi(phi - jet_phi[:, None]) * mask,
        "part_charge": charge * mask,
        "mask": mask.astype(np.float64),
    }
    for i, name in enumerate(JETCLASS_FLAG_BRANCHES):
        out[name] = flags[..., i] * mask
    return out


def _load_and_validate_jetclass_h5(filepath):
    """One pass: read every schema dataset once, validate the contract on
    the in-memory arrays. Returns (arrays dict, (num_jets, max_len))."""
    required = (
        JETCLASS_KINEMATIC_BRANCHES + JETCLASS_FLAG_BRANCHES + ("part_charge", "mask")
    )
    with h5py.File(filepath, "r") as f:
        version = f.attrs.get("format_version")
        if version != JETCLASS_H5_FORMAT_VERSION:
            raise ValueError(
                f"{filepath}: format_version {version!r} != "
                f"{JETCLASS_H5_FORMAT_VERSION}"
            )
        missing = [k for k in required if k not in f]
        if missing:
            raise ValueError(f"{filepath}: missing datasets {missing}")
        shape = f["part_px"].shape
        if len(shape) != 2:
            raise ValueError(f"{filepath}: part_px must be (B, L), got {shape}")
        for k in required:
            if f[k].shape != shape:
                raise ValueError(
                    f"{filepath}: {k} shape {f[k].shape} != {shape}"
                )
        arrays = {k: f[k][:] for k in required}
    flags = np.stack([arrays[k] for k in JETCLASS_FLAG_BRANCHES], axis=-1)
    mask = arrays["mask"].astype(bool)
    if not np.all(flags.sum(-1)[mask] == 1):
        raise ValueError(f"{filepath}: flavor flags not exclusive one-hot")
    if not np.isin(arrays["part_charge"][mask], (-1, 0, 1)).all():
        raise ValueError(f"{filepath}: part_charge outside {{-1,0,1}}")
    return arrays, shape


def validate_jetclass_h5(filepath):
    """Check a converted JetClass `.h5` against the documented schema.

    Returns (num_jets, max_len); raises ValueError on any contract breach.
    """
    _, shape = _load_and_validate_jetclass_h5(filepath)
    return shape


def read_jetclass_h5(filepath):
    """Load one converted JetClass shard (schema above) into the same
    per-particle feature dict read_aoj_file produces. Each dataset is read
    exactly once (validation runs on the loaded arrays)."""
    arrays, _ = _load_and_validate_jetclass_h5(filepath)
    px = arrays["part_px"].astype(np.float64)
    py = arrays["part_py"].astype(np.float64)
    pz = arrays["part_pz"].astype(np.float64)
    flags = np.stack(
        [arrays[k].astype(np.float64) for k in JETCLASS_FLAG_BRANCHES], axis=-1
    )
    charge = arrays["part_charge"].astype(np.float64)
    mask = arrays["mask"].astype(bool)
    return _jetclass_features_from_raw(px, py, pz, flags, charge, mask)


def read_jetclass_root(filepath):
    """Load one raw JetClass `.root` shard (requires uproot)."""
    try:
        import uproot
    except ImportError as e:
        raise ImportError(
            "JetClass .root extraction requires `uproot`, which is not "
            "installed here. Convert the shard offline with "
            "scripts/convert_jetclass.py (where uproot is available) and "
            "load the resulting .h5 instead."
        ) from e

    pad_branch, mask = _load_jetclass_root_padded(filepath, uproot)
    px = pad_branch("part_px", np.float64)
    py = pad_branch("part_py", np.float64)
    pz = pad_branch("part_pz", np.float64)
    flags = np.stack(
        [pad_branch(k, np.float64) for k in JETCLASS_FLAG_BRANCHES], axis=-1
    )
    charge = pad_branch("part_charge", np.float64)
    return _jetclass_features_from_raw(px, py, pz, flags, charge, mask)


def _load_jetclass_root_padded(path, uproot):
    """Open one `.root` shard and return (pad_branch(name, dtype) closure,
    bool validity mask) — the ragged-to-padded plumbing shared by the
    direct reader and the offline `.h5` converter."""
    tree = uproot.open(path)["tree"]
    branches = tree.arrays(
        list(
            JETCLASS_KINEMATIC_BRANCHES
            + JETCLASS_FLAG_BRANCHES
            + ("part_charge",)
        ),
        library="np",
    )
    # ragged (object arrays of per-jet vectors) → padded + mask
    ragged = branches["part_px"]
    B = len(ragged)
    L = max((len(v) for v in ragged), default=0)

    def pad_branch(name, dtype):
        out = np.zeros((B, L), dtype=dtype)
        for b, v in enumerate(branches[name]):
            out[b, : len(v)] = v
        return out

    mask = np.zeros((B, L), dtype=bool)
    for b, v in enumerate(ragged):
        mask[b, : len(v)] = True
    return pad_branch, mask


def convert_jetclass_root_to_h5(root_path, h5_path):
    """Offline converter: one JetClass `.root` shard → the documented padded
    `.h5` layout (run where uproot is installed; see schema comment above)."""
    try:
        import uproot
    except ImportError as e:
        raise ImportError(
            "convert_jetclass_root_to_h5 requires `uproot`; run the "
            "conversion on a machine where it is installed."
        ) from e

    pad_branch, mask = _load_jetclass_root_padded(root_path, uproot)

    import os

    with h5py.File(h5_path, "w") as f:
        f.attrs["format_version"] = JETCLASS_H5_FORMAT_VERSION
        f.attrs["tree"] = "tree"
        f.attrs["source"] = os.path.basename(str(root_path))
        for name in JETCLASS_KINEMATIC_BRANCHES:
            f.create_dataset(
                name, data=pad_branch(name, np.float32), compression="gzip"
            )
        for name in JETCLASS_FLAG_BRANCHES:
            f.create_dataset(
                name, data=pad_branch(name, np.uint8), compression="gzip"
            )
        f.create_dataset(
            "part_charge",
            data=pad_branch("part_charge", np.int8),
            compression="gzip",
        )
        f.create_dataset(
            "mask", data=mask.astype(np.uint8), compression="gzip"
        )
    return h5_path


def extract_jetclass_features(dataset, **args):
    """JetClass shard(s) → (continuous, discrete, mask) padded numpy arrays,
    same contract as extract_aoj_features (reference: utils.py:116-166).

    Accepts converted `.h5` shards natively; raw `.root` shards require
    uproot (gated — convert offline with convert_jetclass_root_to_h5).
    """
    max_num_particles = args.get("max_num_particles", 128)
    min_num_particles = args.get("min_num_particles", 0)
    num_jets = args.get("num_jets", 100_000)

    if isinstance(dataset, str):
        dataset = [dataset]
    all_feats, all_masks = [], []
    for path in dataset:
        if str(path).endswith(".root"):
            d = read_jetclass_root(path)
        elif str(path).endswith((".h5", ".hdf5")):
            d = read_jetclass_h5(path)
        else:
            raise ValueError(
                f"{path}: expected a JetClass .root shard or a converted .h5"
            )
        feats = np.stack([d[k] for k in FEATURE_ORDER], axis=-1)  # (B, L, 9)
        feats, valid = _compact_pad(
            feats, d["mask"] > 0, min_num_particles, max_num_particles
        )
        all_feats.append(feats)
        all_masks.append(valid)
    feats = np.concatenate(all_feats, axis=0)
    masks = np.concatenate(all_masks, axis=0)

    data = np.concatenate([feats, masks[:, :, None]], axis=-1)  # (B, N, 10)
    idx = np.argsort(-data[..., 0], axis=1, kind="stable")
    data = np.take_along_axis(data, idx[:, :, None], axis=1)
    data = data[:num_jets].astype(np.float32)

    continuous = data[..., :3]
    discrete = data[..., 3:-1].astype(np.int64)
    mask = data[..., -1:].astype(np.int64)
    return continuous, discrete, mask


def sample_noise(rng, noise="GaussNoise", **args):
    """Source noise clouds: Gauss/Beta continuous + categorical flavor/charge
    (reference: utils.py:222-251).

    Args:
      rng: numpy Generator.
    Returns:
      continuous (num_jets, N, 3) float32, discrete (num_jets, N, 6) int64.
    """
    max_num_particles = args.get("max_num_particles", 128)
    num_jets = args.get("num_jets", 100_000)
    scale = args.get("scale", 1.0)
    cat_probs = args.get("cat_probs", [0.2, 0.2, 0.2, 0.2, 0.2])

    if "BetaNoise" in str(noise):
        concentration = args.get("concentration", [0.1, 10])
        a, b = concentration
        pt = rng.beta(a, b, size=(num_jets, max_num_particles, 1))
        eta_phi = rng.standard_normal((num_jets, max_num_particles, 2)) * scale
        continuous = np.concatenate([pt, eta_phi], axis=2)
    elif "GaussNoise" in str(noise):
        continuous = rng.standard_normal((num_jets, max_num_particles, 3)) * scale
    else:
        raise ValueError(
            'Noise type not recognized. Choose between "GaussNoise" and "BetaNoise".'
        )

    flavor = rng.choice(5, size=(num_jets, max_num_particles), p=cat_probs)
    charge = rng.choice([-1, 1], size=(num_jets, max_num_particles))
    charge[(flavor == 0) | (flavor == 1)] = 0
    flavor_oh = (flavor[..., None] == np.arange(5)[None, None, :]).astype(np.int64)
    discrete = np.concatenate([flavor_oh, charge[..., None]], axis=-1)
    return continuous.astype(np.float32), discrete.astype(np.int64)


def sample_masks(rng, **args):
    """Sample existence masks from an empirical multiplicity histogram
    (reference: utils.py:254-286)."""
    hist = args.get("target_multiplicity", None)
    min_num_particles = args.get("min_num_particles", 128)
    max_num_particles = args.get("max_num_particles", 128)
    num_jets = args.get("num_jets", 100_000)

    if hist is None or min_num_particles == max_num_particles:
        return np.ones((num_jets, max_num_particles, 1), dtype=np.int64)

    hist = np.asarray(hist).reshape(-1)
    hist_values, _ = np.histogram(
        hist, bins=np.arange(0, max_num_particles + 2), density=True
    )
    probs = hist_values / hist_values.sum()
    multiplicity = rng.choice(len(probs), size=num_jets, p=probs)
    masks = (np.arange(max_num_particles)[None, :] < multiplicity[:, None]).astype(
        np.int64
    )
    return masks[:, :, None]


def physics_to_onehot(flavor, charge):
    """(5-dim flavor one-hot, charge∈{-1,0,1}) → 8-dim token one-hot.

    Token order: photon, neutral hadron, h-, h+, e-, e+, mu-, mu+
    (reference: utils.py:289-307).
    """
    flavor = np.asarray(flavor)
    charge = np.asarray(charge)
    neutrals = flavor[..., :2].astype(np.int64)
    signed = flavor[..., 2:].astype(np.int64) * charge[..., None].astype(np.int64)
    # for each charged species (h, e, mu): [-1 → neg slot, +1 → pos slot]
    neg = (signed == -1).astype(np.int64)
    pos = (signed == 1).astype(np.int64)
    charged = np.stack(
        [neg[..., 0], pos[..., 0], neg[..., 1], pos[..., 1], neg[..., 2], pos[..., 2]],
        axis=-1,
    )
    return np.concatenate([neutrals, charged], axis=-1)


TOKEN_TO_FLAVOR = np.array([0, 1, 2, 2, 3, 3, 4, 4])
TOKEN_TO_CHARGE = np.array([0, 0, -1, 1, -1, 1, -1, 1])


def tokens_to_physics(states):
    """8-token vocab (…, 1) → (flavor one-hot (…, 5), charge (…, 1)) — the
    inverse codec (reference: utils.py:310-337)."""
    states = np.asarray(states).astype(np.int64)
    squeeze_last = states.ndim >= 1 and states.shape[-1] == 1
    tokens = states[..., 0] if squeeze_last else states
    flavor_idx = TOKEN_TO_FLAVOR[tokens]
    charge = TOKEN_TO_CHARGE[tokens]
    flavor = (flavor_idx[..., None] == np.arange(5)).astype(np.int64)
    if squeeze_last:
        charge = charge[..., None]
    return flavor, charge.astype(np.int64)


def sizes_to_histograms(sizes):
    """{multiplicity: count} dict from a vector of per-jet sizes
    (reference: utils.py:339-344)."""
    sizes = np.asarray(sizes).reshape(-1).astype(np.int64)
    unique, counts = np.unique(sizes, return_counts=True)
    return dict(zip(unique.tolist(), counts.tolist()))
