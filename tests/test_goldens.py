"""Golden-fixture regression: backbone and Pallas-kernel outputs must match
the committed activations (tests/golden/backbones.npz, generated once by
tests/_make_goldens.py). The live oracle-parity tests cannot catch the
model and the oracle drifting TOGETHER; these goldens pin the verified
round-2 numerics against future kernel/optimization work."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "backbones.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def current():
    from _make_goldens import compute_goldens
    return compute_goldens()


@pytest.mark.parametrize("key,rtol,atol", [
    ("resnet_flax", 1e-5, 1e-4),
    ("resnet_torch", 1e-5, 1e-5),
    ("vit_flax", 1e-5, 1e-4),
    ("vit_torch", 1e-5, 1e-5),
    ("attention_out", 1e-5, 1e-5),
    ("csr_sum", 1e-5, 1e-4),
    ("csr_wsum", 1e-5, 1e-4),
    ("csr_wden", 1e-5, 1e-4),
])
def test_matches_golden(golden, current, key, rtol, atol):
    np.testing.assert_allclose(current[key], golden[key], rtol=rtol,
                               atol=atol, err_msg=key)
