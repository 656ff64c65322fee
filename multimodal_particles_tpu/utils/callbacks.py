"""Training callbacks (reference: utils/callbacks.py:7-40 — an MLflow
best-checkpoint artifact logger). MLflow is optional in this environment;
the callback degrades to a no-op when it is unavailable."""

import os


class MLflowCallback:
    """Logs the best checkpoint directory as an MLflow artifact at the end
    of training. Use with Trainer via `on_train_end(trainer)`."""

    def __init__(self, tracking_uri=None):
        self.tracking_uri = tracking_uri

    def on_train_end(self, trainer):
        try:
            import mlflow
        except ImportError:
            return None
        if self.tracking_uri:
            mlflow.set_tracking_uri(self.tracking_uri)
        if trainer.files is None:
            return None
        best = trainer.files.checkpoint_path("best")
        if os.path.isdir(best) and mlflow.active_run() is not None:
            mlflow.log_artifacts(best, artifact_path="checkpoints/best")
        return best


class JSONLMetricsCallback:
    """Append-only JSONL metrics writer (the Trainer logs epoch records by
    default; this callback allows extra user records)."""

    def __init__(self, path):
        self.path = path

    def log(self, record: dict):
        import json

        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
