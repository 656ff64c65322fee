"""Driver-contract smoke tests: bench.py emits one valid JSON line and the
graft entry points import/compile (CPU)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # drop the TPU sitecustomize path
    return env


def test_bench_smoke_emits_json():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True,
        text=True,
        env=_cpu_env(),
        cwd=REPO,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in result
    assert result["value"] > 0


def test_graft_entry_functions_exist():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
