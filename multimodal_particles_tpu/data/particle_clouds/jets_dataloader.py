"""Dataset + dataloader module for jet particle clouds.

JAX-native replacement of the reference torch DataLoader stack (reference:
data/particle_clouds/jets_dataloader.py:18-333): batches are NamedTuples of
fixed-shape numpy arrays produced by a lightweight host-side batcher; device
placement/sharding happens in the trainer (per-host `jax.device_put` or
`make_array_from_process_local_data` on multi-host meshes).
"""

from collections import namedtuple
from typing import List, NamedTuple, Optional

import numpy as np

from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.utils import sizes_to_histograms


class MultimodalDatabatch(NamedTuple):
    source_continuous: np.ndarray
    source_discrete: np.ndarray
    source_mask: np.ndarray

    target_continuous: np.ndarray
    target_discrete: np.ndarray
    target_mask: np.ndarray

    context_continuous: Optional[np.ndarray] = None
    context_discrete: Optional[np.ndarray] = None


class MultimodalBridgeDataset:
    """Array-backed dataset with 'namedtuple' (MBM/absorbing) and 'list'
    (transdimensional) return modes (reference: jets_dataloader.py:30-151)."""

    def __init__(self, data: JetDataclass, return_type=None):
        self.data = data
        self.attributes = []
        self.vocab_size_features = data.vocab_size_features
        self.vocab_size_context = data.vocab_size_context
        self.return_type = (
            return_type if return_type is not None else data.config.data.return_type
        )

        if hasattr(data.source, "continuous") and self.return_type == "namedtuple":
            self.attributes.append("source_continuous")
            self.source_continuous = data.source.continuous
        if hasattr(data.source, "discrete") and self.return_type == "namedtuple":
            self.attributes.append("source_discrete")
            self.source_discrete = data.source.discrete
        if hasattr(data.source, "mask") and self.return_type == "namedtuple":
            self.attributes.append("source_mask")
            self.source_mask = data.source.mask

        if hasattr(data.target, "continuous"):
            self.attributes.append("target_continuous")
            self.target_continuous = data.target.continuous
        if hasattr(data.target, "discrete"):
            self.attributes.append("target_discrete")
            self.target_discrete = data.target.discrete
        if hasattr(data.target, "mask"):
            if self.return_type != "list":
                self.attributes.append("target_mask")
            self.target_mask = data.target.mask

        if hasattr(data, "context_continuous"):
            self.attributes.append("context_continuous")
            self.context_continuous = data.context_continuous
        if hasattr(data, "context_discrete"):
            self.attributes.append("context_discrete")
            self.context_discrete = data.context_discrete

        self.databatch_namedtuple = namedtuple("databatch", self.attributes)

    def __len__(self):
        return len(self.data.target)

    def gather(self, idx):
        """Vectorized batch gather — returns one batch for integer indices."""
        if self.return_type == "namedtuple":
            return self.databatch_namedtuple(
                *[getattr(self, attr)[idx] for attr in self.attributes]
            )
        elif self.return_type == "list":
            target_mask = self.target_mask[idx]
            n_particles = target_mask[..., 0].sum(axis=-1)
            data = [n_particles]
            for attr in self.attributes:
                if attr == "target_mask":
                    continue
                value = getattr(self, attr)[idx]
                if attr in ("source_discrete", "target_discrete"):
                    value = _one_hot(value[..., 0], self.vocab_size_features)
                if attr == "context_discrete":
                    value = _one_hot(value[..., 0], self.vocab_size_context)
                data.append(value)
            return data
        raise ValueError("Invalid return_type. Choose 'namedtuple' or 'list'.")

    def __getitem__(self, idx):
        if np.isscalar(idx):
            idx = np.array([idx])
            batch = self.gather(idx)
            if self.return_type == "namedtuple":
                return self.databatch_namedtuple(*[v[0] for v in batch])
            return [v[0] for v in batch]
        return self.gather(np.asarray(idx))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def get_available_keys(self):
        return self.attributes


def _one_hot(tokens, num_classes):
    return (tokens[..., None] == np.arange(num_classes)).astype(np.float32)


class _Loader:
    """Minimal epoch iterator over a dataset subset."""

    def __init__(self, dataset, indices, batch_size, shuffle, drop_last=False, seed=0):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.dataset.gather(chunk)


class JetsDataloaderModule:
    """Train/val/test split + batch iterators + multiplicity histograms
    (reference: jets_dataloader.py:153-333)."""

    def __init__(self, config, jetdataset, batch_size=None, data_split_frac=None):
        self.dataclass = jetdataset
        self.config = config
        self.dataset = MultimodalBridgeDataset(
            jetdataset, return_type=config.data.return_type
        )

        self.histogram_target = sizes_to_histograms(
            self.dataset.target_mask[..., 0].sum(axis=1)
        )
        if config.data.return_type == "namedtuple":
            self.histogram_source = sizes_to_histograms(
                self.dataset.source_mask[..., 0].sum(axis=1)
            )

        self.data_split = (
            config.data.data_split_frac if data_split_frac is None else data_split_frac
        )
        self.batch_size = config.data.batch_size if batch_size is None else batch_size
        self.set_dataloader()

        # graphical structure enables particle creation/destruction for the
        # transdimensional model family (reference: jets_dataloader.py:181-185)
        if hasattr(config.data, "graphical_structure"):
            self.set_batch_handlers()
            from multimodal_particles_tpu.models.generative.transdimensional.structure import (
                JetsGraphicalStructure,
            )

            self.graphical_structure = JetsGraphicalStructure(self)

    def train_val_test_split(self, shuffle=False):
        assert abs(1.0 - sum(self.data_split)) < 1e-3, "Split fractions do not sum to 1!"
        total = len(self.dataset)
        train_size = int(total * self.data_split[0])
        valid_size = int(total * self.data_split[1])
        idx = (
            np.random.default_rng(0).permutation(total)
            if shuffle
            else np.arange(total)
        )
        if self.data_split[2] == 0:
            # flooring both fractions can strand a remainder in the (unused)
            # test slice; fold it into validation instead of dropping it
            return idx[:train_size], idx[train_size:], idx[:0]
        return (
            idx[:train_size],
            idx[train_size : train_size + valid_size],
            idx[train_size + valid_size :],
        )

    def set_dataloader(self):
        idx_train, idx_valid, idx_test = self.train_val_test_split(shuffle=False)
        self.train = _Loader(self.dataset, idx_train, self.batch_size, shuffle=True)
        self.valid = (
            _Loader(self.dataset, idx_valid, self.batch_size, shuffle=False)
            if len(idx_valid) > 0
            else None
        )
        self.test = (
            _Loader(self.dataset, idx_test, self.batch_size, shuffle=False)
            if self.data_split[2] > 0 and len(idx_test) > 0
            else None
        )

    @staticmethod
    def random_databatch(config) -> MultimodalDatabatch:
        """Shape-correct random databatch built purely from config — the test
        fixture generator (reference: jets_dataloader.py:239-271)."""
        rng = np.random.default_rng(0)
        B = config.data.batch_size
        N = config.data.max_num_particles
        dim_c = config.data.dim_features_continuous
        dim_d = config.data.dim_features_discrete
        vocab = config.data.vocab_size_features
        return MultimodalDatabatch(
            source_continuous=rng.random((B, N, dim_c), dtype=np.float32),
            source_discrete=rng.integers(0, vocab, (B, N, dim_d)),
            source_mask=rng.integers(0, 2, (B, N, 1)),
            target_continuous=rng.random((B, N, dim_c), dtype=np.float32),
            target_discrete=rng.integers(0, vocab, (B, N, dim_d)),
            target_mask=rng.integers(0, 2, (B, N, 1)),
        )

    def update_config(self, model_config):
        model_config.data.target_info["hist_num_particles"] = self.histogram_target
        if self.config.data.return_type == "namedtuple":
            model_config.data.source_info["hist_num_particles"] = self.histogram_source
        return model_config

    # ...transdimensional batch-handler metadata (reference: :279-333)

    def set_without_onehot_shapes(self, names_in_batch):
        cfg = self.config
        N = cfg.data.max_num_particles
        shapes = []
        for name in names_in_batch:
            if name == "target_continuous":
                shapes.append((N, cfg.data.dim_features_continuous))
            if name == "target_mask":
                shapes.append((N, 1))
            if name == "context_continuous":
                shapes.append((N, cfg.data.dim_context_continuous))
            if name == "context_discrete":
                shapes.append((N, cfg.data.vocab_size_features))
        self.without_onehot_shapes = shapes

    def set_onehot_shapes(self, names_in_batch):
        cfg = self.config
        N = cfg.data.max_num_particles
        shapes = []
        for name in names_in_batch:
            if name == "target_continuous":
                shapes.append((N, cfg.data.dim_features_continuous))
            if name == "target_discrete":
                shapes.append((N, cfg.data.vocab_size_features))
            if name == "target_mask":
                shapes.append((N, 1))
            if name == "context_continuous":
                shapes.append((N, cfg.data.dim_context_continuous))
            if name == "context_discrete":
                shapes.append((N, cfg.data.vocab_size_features))
        self.with_onehot_shapes = shapes

    def set_batch_handlers(self):
        names_in_batch = self.dataset.get_available_keys()
        self.names_in_batch = names_in_batch
        self.observed = np.zeros(len(names_in_batch), dtype=int)
        self.is_onehot = np.zeros(len(names_in_batch), dtype=int)
        self.exist = np.ones(len(names_in_batch), dtype=int)
        self.name_to_index = dict(zip(names_in_batch, range(len(names_in_batch))))

        if "target_discrete" in names_in_batch:
            self.is_onehot[self.name_to_index["target_discrete"]] = 1
        if "context_continuous" in names_in_batch:
            self.observed[self.name_to_index["context_continuous"]] = 1
        if "context_discrete" in names_in_batch:
            self.observed[self.name_to_index["context_discrete"]] = 1

        self.set_onehot_shapes(names_in_batch)
        self.set_without_onehot_shapes(names_in_batch)
