"""CLI end-to-end tests (subprocess, tiny dataset, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mpgnn_tpu.graph.generate import generate_synthetic_graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds"))
    generate_synthetic_graph(400, 4, "red-red-blue", seed=3, out_dir=out)
    return out


@pytest.mark.slow
def test_run_cli_end_to_end(dataset, tmp_path):
    ck = str(tmp_path / "ck.json")
    cmd = [
        sys.executable, "-m", "mpgnn_tpu.run",
        "--hidden_dim", "16", "--dataset", "synthetic",
        "--folder", dataset, "--node_file", "node.dat",
        "--link_file", "link.dat", "--label_file", "label.dat",
        "--epochs", "40", "--max_hops", "1",
        "--pickle_filename", ck,
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=_env(), timeout=420
    )
    assert r.returncode == 0, r.stderr[-2000:]
    last = r.stdout.strip().splitlines()[-1]
    summary = json.loads(last)
    assert summary["dataset"] == "synthetic"
    assert "0" in summary["classes"]
    assert os.path.exists(ck)

    # resume path: second run restores from the checkpoint quickly
    r2 = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=_env(), timeout=420
    )
    assert r2.returncode == 0
    assert "restored from checkpoint" in r2.stderr


@pytest.mark.slow
def test_generate_cli(tmp_path):
    out = str(tmp_path / "gen")
    r = subprocess.run(
        [
            sys.executable, "-m", "mpgnn_tpu.generate", "synthetic",
            "--num_nodes", "200", "--max_rel_for_node", "3",
            "--metapath", "red-blue", "--out", out,
        ],
        capture_output=True, text=True, cwd=REPO, env=_env(), timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert os.path.exists(os.path.join(out, "metapath.dat"))


@pytest.mark.slow
def test_rgcn_baseline_cli(dataset):
    r = subprocess.run(
        [
            sys.executable, "-m", "mpgnn_tpu.rgcn_baseline",
            "--folder", dataset, "--metapath_length", "2",
            "--hidden_dim", "16", "--epochs", "60",
        ],
        capture_output=True, text=True, cwd=REPO, env=_env(), timeout=420,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "test F1" in r.stdout


@pytest.mark.slow
def test_run_cli_save_model(dataset, tmp_path):
    out = str(tmp_path / "models")
    cmd = [
        sys.executable, "-m", "mpgnn_tpu.run",
        "--hidden_dim", "16", "--dataset", "synthetic",
        "--folder", dataset, "--node_file", "node.dat",
        "--link_file", "link.dat", "--label_file", "label.dat",
        "--epochs", "30", "--max_hops", "1", "--save_model", out,
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=_env(), timeout=420
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(out, "class_0"))


@pytest.mark.slow
def test_save_then_serve_roundtrip(dataset, tmp_path):
    """run.py --save_model -> serve.py predictions round trip."""
    out = str(tmp_path / "m")
    run_cmd = [
        sys.executable, "-m", "mpgnn_tpu.run",
        "--hidden_dim", "16", "--dataset", "synthetic",
        "--folder", dataset, "--node_file", "node.dat",
        "--link_file", "link.dat", "--label_file", "label.dat",
        "--epochs", "40", "--max_hops", "1", "--save_model", out,
    ]
    r = subprocess.run(run_cmd, capture_output=True, text=True, cwd=REPO,
                       env=_env(), timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    metas = summary["classes"]["0"]["metapaths"]
    assert metas

    serve_cmd = [
        sys.executable, "-m", "mpgnn_tpu.serve",
        "--model_dir", os.path.join(out, "class_0"),
        "--metapaths", json.dumps(metas),
        "--folder", dataset, "--hidden_dim", "16",
        "--nodes", "0,1,2,3",
    ]
    r2 = subprocess.run(serve_cmd, capture_output=True, text=True, cwd=REPO,
                        env=_env(), timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    preds = json.loads(r2.stdout.strip().splitlines()[-1])
    assert set(preds.keys()) == {"0", "1", "2", "3"}
    assert all(v in (0, 1) for v in preds.values())


def test_run_cli_retries_supervisor(dataset, tmp_path):
    """--retries runs the search in a supervised child process (a crashed
    TPU runtime poisons the JAX client, so recovery needs a process
    boundary); a healthy run completes on the first attempt with the same
    JSON output."""
    cmd = [
        sys.executable, "-m", "mpgnn_tpu.run",
        "--hidden_dim", "8", "--dataset", "synthetic",
        "--folder", dataset, "--node_file", "node.dat",
        "--link_file", "link.dat", "--label_file", "label.dat",
        "--epochs", "20", "--max_hops", "1", "--retries", "2",
        "--frontier", str(tmp_path / "fr"),
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=_env(), timeout=420
    )
    assert r.returncode == 0, r.stderr[-2000:]
    last = r.stdout.strip().splitlines()[-1]
    out = json.loads(last)
    assert "classes" in out
    assert os.path.exists(str(tmp_path / "fr") + ".class0.pkl")
