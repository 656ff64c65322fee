"""In-process loader for the upstream torch reference implementation.

The reference (`cesarali/multimodal_particles`, mounted read-only at
/root/reference by default, override with MMP_REFERENCE_ROOT) depends on
several packages that are not installed here (lightning, wandb, vector,
awkward, uproot, fastjet, mlflow). Its *model* stack, however — EPiC encoder
(models/architectures/epic.py), bridges (models/generative/bridges.py),
MultiModalBridgeMatching (models/generative/multimodal_bridge_matching.py),
MultiHeadLoss (utils/losses.py) — only needs torch plus a LightningModule
base class. This module installs minimal stubs for the absent packages and
imports the reference so that:

  * parity tests can transplant weights between torch and flax modules and
    assert forward equality (tests/test_parity_reference.py), and
  * the quality head-to-head (scripts/quality_parity.py) can train/sample the
    actual reference model on identical data.

The stubs are only installed for modules that are genuinely absent; nothing
is overridden if the real package exists. Importing the reference never
writes to its tree (bytecode writing is disabled first).
"""

import importlib
import os
import sys
import types

DEFAULT_REFERENCE_ROOT = "/root/reference"

_SIMPLE_STUBS = ("wandb", "awkward", "uproot", "fastjet", "mlflow", "comet_ml")


def _stub(name):
    mod = types.ModuleType(name)
    mod.__stub__ = True
    if name == "mlflow":
        # the rebuild's Trainer soft-probes mlflow.active_run(); a bare stub
        # must answer "no active run" rather than AttributeError
        mod.active_run = lambda: None
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Install import stubs for the reference's absent dependencies."""
    if "lightning" not in sys.modules:
        try:
            importlib.import_module("lightning")
        except ImportError:
            import torch
            import torch.nn as nn

            L = _stub("lightning")

            class LightningModule(nn.Module):
                """Just enough of lightning.LightningModule for the reference
                models: an nn.Module with no-op logging hooks."""

                def save_hyperparameters(self, *args, **kwargs):
                    pass

                def log(self, *args, **kwargs):
                    pass

                @property
                def device(self):
                    try:
                        return next(self.parameters()).device
                    except StopIteration:
                        return torch.device("cpu")

            L.LightningModule = LightningModule

    if "vector" not in sys.modules:
        try:
            importlib.import_module("vector")
        except ImportError:
            vec = _stub("vector")
            vec.register_awkward = lambda: None

    for name in _SIMPLE_STUBS:
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                _stub(name)


def reference_root():
    return os.environ.get("MMP_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)


def reference_available():
    root = reference_root()
    return os.path.isdir(os.path.join(root, "multimodal_particles"))


def load_reference():
    """Import and return the reference `multimodal_particles` package.

    Returns None when the reference tree is not mounted. Safe to call
    repeatedly. The reference mount may be read-only: bytecode writing is
    disabled globally before the import.
    """
    if not reference_available():
        return None
    install_stubs()
    sys.dont_write_bytecode = True
    root = reference_root()
    if root not in sys.path:
        sys.path.insert(0, root)
    import multimodal_particles  # noqa: F401 — the reference package

    return multimodal_particles
