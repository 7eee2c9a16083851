"""Golden-numerics lock: current outputs must match the checked-in arrays
(fp32-exact on CPU; tiny tolerance only to absorb cross-backend fma
differences)."""

import numpy as np
import pytest

from tests.golden_utils import GOLDEN_PATH, compute_goldens


@pytest.fixture(scope="module")
def goldens():
    try:
        return dict(np.load(GOLDEN_PATH))
    except FileNotFoundError:
        pytest.skip("goldens.npz not generated")


def test_goldens_match(goldens):
    current = compute_goldens()
    assert set(current) == set(goldens)
    for name, want in goldens.items():
        got = current[name]
        assert got.shape == want.shape, name
        assert got.dtype == want.dtype, name
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6, err_msg=name)


def test_goldens_bitwise_on_cpu(goldens):
    """On the CPU backend the attention maps are expected bitwise stable."""
    current = compute_goldens()
    for name in ("grid_attn", "damsm_attn", "obj_attn", "gmm_logprob"):
        np.testing.assert_array_equal(current[name], goldens[name],
                                      err_msg=name)
