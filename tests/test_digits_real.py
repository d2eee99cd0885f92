"""REAL-data end-to-end regression: sklearn's bundled handwritten
digits (1797 x 64).  The only real dataset reachable in this
environment (no egress); guards that the full pipeline preserves
neighborhood structure on real data — the bench's synthetic manifold
intentionally has little 2-D-preservable structure, so this is the row
that shows conservation where conservation is possible.

Reference analogue: the MNIST quality rows (embedder.rs:588-618); no
reference row exists for this dataset, thresholds are from the
recorded repo run (PERF.md round 4: honest no-match 6.3%, compat 1.4%,
knn10 accuracy embedded 0.983 vs raw 0.982)."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")


@pytest.fixture(scope="module")
def digits():
    from sklearn.datasets import load_digits
    ds = load_digits()
    return ds.data.astype(np.float32), ds.target.astype(np.int64)


def test_digits_real_pipeline(digits):
    x, labels = digits
    import annembed_tpu as at
    y, info = at.embed(x, dim=2, batch=30, nbng=10, with_quality=True,
                       quality_nbng=10, quality_radius_compat=25,
                       return_graph=True)
    assert y.shape == (1797, 2)
    assert np.isfinite(y).all()
    q = info["quality"]
    n = x.shape[0]
    # honest radius: most nodes keep a neighbour inside their embedded
    # 10-NN radius (recorded 113/1797 = 6.3%; generous bound 15%)
    assert q["nb_without_match"] / n < 0.15
    # compat radius: reference-grade conservation (recorded 25/1797,
    # 6.23 of 10 matched, median ratio 0.80)
    assert q["compat_nb_without_match"] / n < 0.05
    assert q["compat_mean_nb_matched"] > 5.0
    assert q["compat_median_ratio"] < 1.2

    # label-based external check: embedded kNN classification within
    # 2 points of the raw-space classifier (recorded 0.9827 vs 0.9822)
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    from digits import knn_label_accuracy
    acc_emb = knn_label_accuracy(np.asarray(y), labels)
    acc_raw = knn_label_accuracy(x, labels)
    assert acc_emb > acc_raw - 0.02
    assert acc_emb > 0.95
