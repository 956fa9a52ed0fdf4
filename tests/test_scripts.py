"""Smoke tests for the diagnostic scripts (reference scripts/ parity).

Each script runs as a subprocess against offline fixture data, matching how
a user invokes it. regression.py is exercised at the arg/plumbing level only
(its job is shelling out git checkouts + full eval runs).
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import FIXTURE_DOCS  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("taskdata")
    for task in ("piqa", "boolq"):
        os.makedirs(root / task, exist_ok=True)
        for split, docs in FIXTURE_DOCS[task].items():
            with open(root / task / f"{split}.json", "w") as f:
                json.dump(docs, f)
    return str(root)


def _run(args, timeout=240):
    env = dict(os.environ)
    # scripts import jax transitively; keep them on CPU and off the tunnel
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_write_out_dumps_prompts(tmp_path, data_dir):
    out = tmp_path / "prompts"
    r = _run([
        "scripts/write_out.py", "--tasks", "piqa", "--sets", "val",
        "--num_fewshot", "1", "--num_examples", "2",
        "--output_base_path", str(out), "--data_dir", data_dir,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out)
    assert any("piqa" in f for f in files), files
    body = open(out / files[0]).read()
    assert "!!@@##@@!!" in body and len(body) > 50


def test_cost_estimate_counts_tokens(data_dir):
    r = _run([
        "scripts/cost_estimate.py", "--tasks", "piqa", "--limit", "2",
        "--data_dir", data_dir,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total tokens:" in r.stdout
    total = int(r.stdout.strip().rsplit(" ", 1)[-1])
    assert total > 0


def test_regression_script_parses():
    r = _run(["scripts/regression.py", "--help"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--branches" in r.stdout or "--commits" in r.stdout or "usage" in r.stdout.lower()
