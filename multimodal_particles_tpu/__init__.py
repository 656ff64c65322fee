"""multimodal_particles_tpu — a TPU-native JAX framework for generative modeling
of multimodal particle clouds (continuous kinematics + discrete flavor/charge
tokens + existence masks).

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the reference PyTorch framework `cesarali/multimodal_particles`:

- hybrid continuous/discrete bridge matching (flow matching + telegraph CTMC),
- absorbing flows (mask-generating survival bridges),
- transdimensional jump diffusion (variable particle multiplicity),
- the jet data pipeline (AspenOpenJets / JetClass / noise sources) and
  physics evaluation observables (jet kinematics, substructure, KL/W1 metrics).

Path constants mirror the reference package root
(reference: multimodal_particles/__init__.py:1-8).
"""

import os

base_dir = os.path.abspath(os.path.join(os.path.dirname(__file__)))
project_dir = os.path.abspath(os.path.join(base_dir, ".."))
data_dir = os.path.join(project_dir, "data")
test_resources_dir = os.path.join(project_dir, "tests", "resources")
results_dir = os.path.join(project_dir, "results")
config_dir = os.path.join(project_dir, "configs_files")

__version__ = "0.1.0"
