"""Top-level API + CLI tests (reference python.rs embed/dmap_embed
signatures and bin/embed.rs flow)."""

import json
import subprocess
import sys

import numpy as np

import annembed_tpu as at


def blobs(rng, n_per=80, d=12):
    centers = rng.normal(size=(3, d)) * 10
    x = np.concatenate([centers[i] + rng.normal(size=(n_per, d))
                        for i in range(3)])
    return x.astype(np.float32)


def test_embed_from_array(rng):
    x = blobs(rng)
    y, info = at.embed(x, dim=2, batch=5, nbng=6)
    assert y.shape == (240, 2)
    assert np.isfinite(y).all()
    assert info["final_ce"] < info["initial_ce"] * 1.5


def test_embed_from_csv_with_quality(tmp_path, rng):
    x = blobs(rng, n_per=60)
    p = tmp_path / "in.csv"
    np.savetxt(p, x, delimiter=",")
    out = tmp_path / "out.csv"
    y, info = at.embed(str(p), outfile=str(out), dim=2, batch=5, nbng=6,
                       with_quality=True)
    assert out.exists()
    assert "quality" in info
    assert info["quality"]["mean_nb_matched"] > 0


def test_embed_hierarchical(rng):
    x = blobs(rng, n_per=100)
    y, info = at.embed(x, dim=2, batch=4, nbng=6, layer=1,
                       hierarchy_fraction=0.2)
    assert y.shape == (300, 2)
    assert np.isfinite(y).all()


def test_dmap_embed_api(rng):
    x = blobs(rng)
    y, info = at.dmap_embed(x, dim=3, alfa=0.5, beta=-0.1, nbng=8)
    assert y.shape == (240, 3)
    assert np.isfinite(y).all()


def test_dmap_embed_layer(rng):
    x = blobs(rng, n_per=100)
    y, info = at.dmap_embed(x, dim=2, nbng=8, layer=1,
                            hierarchy_fraction=0.3)
    # hierarchical dmap embeds only the subsample (dmapembed.rs:415-422)
    assert y.shape[0] == info["nb_embedded"]
    assert 70 <= y.shape[0] <= 110


def test_cli_embed(tmp_path, rng):
    x = blobs(rng, n_per=40)
    p = tmp_path / "in.csv"
    np.savetxt(p, x, delimiter=",")
    out = tmp_path / "o.csv"
    res = subprocess.run(
        [sys.executable, "-m", "annembed_tpu.cli", "embed",
         "--csv", str(p), "--outfile", str(out), "--nbng", "5",
         "--batch", "3"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo:/root/.axon_site",
             "HOME": "/root"})
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().split("\n")[-1])
    assert info["n"] == 120
    assert out.exists()


def test_cli_dmapembed(tmp_path, rng):
    x = blobs(rng, n_per=40)
    p = tmp_path / "in.csv"
    np.savetxt(p, x, delimiter=",")
    out = tmp_path / "o.csv"
    res = subprocess.run(
        [sys.executable, "-m", "annembed_tpu.cli", "dmapembed",
         "--csv", str(p), "--outfile", str(out), "--nbng", "8",
         "--alfa", "0.5", "--beta", "-0.1", "--dim", "3"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo:/root/.axon_site",
             "HOME": "/root"})
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().split("\n")[-1])
    assert info["n"] == 120 and info["dim"] == 3
    assert out.exists()
