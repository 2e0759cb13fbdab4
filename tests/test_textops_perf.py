"""r6 optimization-round data contracts.

The Arrow-vectorized cosine paths (ann_ivf assignment, dedup_embedding's
in-bucket scorer) reproduce the JVM fold bit-exactly by accumulating over
exactly ``_EMB_DIM`` dimensions in ascending order — which is only the
same computation if every embeddings row really is ``_EMB_DIM`` floats.
Assert that contract against every scale factor present on this box, plus
the numpy-vs-fold bit-identity on a synthetic case.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from crawlspark.textops import _EMB_DIM


@pytest.mark.parametrize("path", sorted(glob.glob(
    "/root/testdata/sf*/embeddings.parquet")))
def test_embeddings_are_fixed_dim(path):
    if not os.path.exists(path):
        pytest.skip("no testdata")
    t = pq.read_table(path, columns=["embedding"])
    lens = pc.list_value_length(t["embedding"])
    assert pc.min(lens).as_py() == _EMB_DIM
    assert pc.max(lens).as_py() == _EMB_DIM


def test_numpy_stepwise_fold_matches_sequential_sum():
    """The vectorized 'one dimension at a time' accumulation used by the
    Arrow scorers is the SAME float op sequence as the scalar left fold
    (acc = 0.0; acc += a[i]*b[i] in ascending i) — bit-equal, not just
    approximately equal, for every row."""
    rng = np.random.RandomState(3)
    a = rng.randn(257, _EMB_DIM)
    b = rng.randn(257, _EMB_DIM)
    vec = np.zeros(len(a))
    for d in range(_EMB_DIM):
        vec += a[:, d] * b[:, d]
    for i in range(len(a)):
        acc = 0.0
        for d in range(_EMB_DIM):
            acc += a[i, d] * b[i, d]
        assert acc == vec[i]          # bitwise float64 equality
