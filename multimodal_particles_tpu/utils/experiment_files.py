"""Experiment artifact layout: timestamped run dirs with logs/, checkpoints/,
sample/ and a config snapshot (reference: utils/experiment_files.py:13-86)."""

import datetime
import os
import subprocess


def get_git_revision_short_hash() -> str:
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "--short", "HEAD"], stderr=subprocess.DEVNULL
            )
            .decode("ascii")
            .strip()
        )
    except Exception:
        return "nogit"


class ExperimentsFiles:
    """Creates (or attaches to) an experiment directory tree."""

    def __init__(self, experiment_dir=None, experiment_indentifier=None, delete=False):
        if experiment_indentifier is None:
            experiment_indentifier = datetime.datetime.now().strftime(
                "%Y-%m-%d_%H-%M-%S"
            )
        if experiment_dir is None:
            from multimodal_particles_tpu import results_dir

            experiment_dir = os.path.join(results_dir, experiment_indentifier)
        self.experiment_indentifier = experiment_indentifier
        self.experiment_dir = experiment_dir

        if delete and os.path.isdir(self.experiment_dir):
            import shutil

            shutil.rmtree(self.experiment_dir)

        self.logs_dir = os.path.join(self.experiment_dir, "logs")
        self.checkpoints_dir = os.path.join(self.experiment_dir, "checkpoints")
        self.sample_dir = os.path.join(self.experiment_dir, "sample")
        for d in (self.logs_dir, self.checkpoints_dir, self.sample_dir):
            os.makedirs(d, exist_ok=True)

        self.params_yaml = os.path.join(self.experiment_dir, "params.yaml")
        self.metrics_file = os.path.join(self.logs_dir, "metrics.jsonl")
        self.plot_path = os.path.join(self.sample_dir, "{0}.png")
        self.metrics_path = os.path.join(self.sample_dir, "metrics_{0}.json")
        self.git_hash = get_git_revision_short_hash()

    def checkpoint_path(self, tag: str) -> str:
        return os.path.join(self.checkpoints_dir, tag)

    def get_checkpoint_path(self, checkpoint_type="best") -> str:
        """Resolve 'best' or 'last' checkpoint directory."""
        path = self.checkpoint_path(checkpoint_type)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no {checkpoint_type!r} checkpoint in {self.checkpoints_dir}")
        return path
