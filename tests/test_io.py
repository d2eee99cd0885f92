"""IO tests: CSV round trip (native + numpy paths), header skipping,
subsampling (reference io.rs:245-255 tests + mnistio magic checks)."""

import gzip
import struct

import numpy as np
import pytest

from annembed_tpu.io import csv_io, mnist_io


@pytest.fixture
def csv_file(tmp_path, rng):
    data = rng.normal(size=(50, 4)).astype(np.float32)
    p = tmp_path / "data.csv"
    with open(p, "w") as f:
        f.write("# a header line\n")
        f.write("% another header\n")
        for row in data:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    return p, data


def test_csv_native_roundtrip(csv_file):
    p, data = csv_file
    arr = csv_io.get_toembed_from_csv(p)
    assert arr.shape == data.shape
    np.testing.assert_allclose(arr, data, atol=1e-5)


def test_csv_numpy_fallback(csv_file):
    p, data = csv_file
    arr = csv_io.get_toembed_from_csv(p, use_native=False)
    np.testing.assert_allclose(arr, data, atol=1e-5)


def test_csv_subsample(csv_file):
    p, data = csv_file
    arr = csv_io.get_toembed_from_csv(p, subsample=0.5, seed=1)
    assert 5 <= arr.shape[0] <= 45
    assert arr.shape[1] == 4


def test_csv_write_read_roundtrip(tmp_path, rng):
    data = rng.normal(size=(20, 3)).astype(np.float32)
    p = tmp_path / "out.csv"
    csv_io.write_csv_array2(p, data)
    back = csv_io.get_toembed_from_csv(p)
    np.testing.assert_allclose(back, data, rtol=1e-4)


def test_csv_labeled_write(tmp_path, rng):
    data = rng.normal(size=(10, 2)).astype(np.float32)
    labels = np.arange(10)
    p = tmp_path / "lab.csv"
    csv_io.write_csv_labeled_array2(p, labels, data)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 10
    assert lines[3].split(",")[0] == "3"


def _write_idx(tmp_path, gz=False):
    images = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    labels = np.array([7, 2], np.uint8)
    ip = tmp_path / ("train-images-idx3-ubyte" + (".gz" if gz else ""))
    lp = tmp_path / ("train-labels-idx1-ubyte" + (".gz" if gz else ""))
    op = gzip.open if gz else open
    with op(ip, "wb") as f:
        f.write(struct.pack(">IIII", 2051, 2, 4, 3))
        f.write(images.tobytes())
    with op(lp, "wb") as f:
        f.write(struct.pack(">II", 2049, 2))
        f.write(labels.tobytes())
    return images, labels


@pytest.mark.parametrize("gz", [False, True])
def test_idx_reader(tmp_path, gz):
    images, labels = _write_idx(tmp_path, gz=gz)
    xi, yi = mnist_io.load_mnist_train_data(tmp_path)
    np.testing.assert_array_equal(xi, images)
    np.testing.assert_array_equal(yi, labels)


def test_idx_bad_magic(tmp_path):
    p = tmp_path / "bad"
    with open(p, "wb") as f:
        f.write(struct.pack(">IIII", 1234, 1, 2, 2))
        f.write(b"\x00" * 4)
    with pytest.raises(ValueError):
        mnist_io.read_image_file(p)


def test_kgraph_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from annembed_tpu.knn.brute import knn_graph_brute
    from annembed_tpu.graph.kgraph import KGraph
    from annembed_tpu.io.checkpoint import save_kgraph, load_kgraph
    x = rng.normal(size=(100, 5)).astype(np.float32)
    idx, dist = knn_graph_brute(x, k=4)
    g = KGraph(indices=idx, dists=dist)
    p = tmp_path / "g.npz"
    save_kgraph(p, g)
    back = load_kgraph(p)
    np.testing.assert_array_equal(np.asarray(back.indices), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(back.dists), np.asarray(dist))


def test_reservoir_sampling():
    from annembed_tpu.utils.reservoir import unweighted_reservoir
    sample = unweighted_reservoir(100, range(10000), seed=1)
    assert len(sample) == 100
    assert len(set(sample)) == 100
    # mean should be near the population mean (reference reservoir.rs:63-75)
    assert abs(np.mean(sample) - 5000) < 1200
    # short iterable returns everything
    assert unweighted_reservoir(10, range(5)) == [0, 1, 2, 3, 4]
