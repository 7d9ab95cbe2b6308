"""Schedule tables must match the reference bit-for-bit (at fp32)."""

import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.core.schedules import (
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)

TAGS = {"full": "", "s250": "250", "ddim25": "ddim25"}


@pytest.mark.parametrize("tag", sorted(TAGS))
def test_tables_match_reference(goldens, tag):
    s = make_schedule(TAGS[tag])
    for name, mine in [
        ("betas", s.betas),
        ("alphas_cumprod", s.alphas_cumprod),
        ("posterior_variance", s.posterior_variance),
        ("posterior_log_variance_clipped", s.posterior_log_variance_clipped),
        ("posterior_mean_coef1", s.posterior_mean_coef1),
        ("posterior_mean_coef2", s.posterior_mean_coef2),
        ("sqrt_alphas_cumprod", s.sqrt_alphas_cumprod),
        ("sqrt_one_minus_alphas_cumprod", s.sqrt_one_minus_alphas_cumprod),
    ]:
        ref = goldens[f"{tag}_{name}"]
        np.testing.assert_allclose(
            np.asarray(mine), ref, rtol=1e-6, atol=1e-7, err_msg=f"{tag}/{name}")
    np.testing.assert_array_equal(
        np.asarray(s.timestep_map), goldens[f"{tag}_timestep_map"])


def test_cosine_schedule(goldens):
    np.testing.assert_allclose(
        get_named_beta_schedule("squaredcos_cap_v2", 100),
        goldens["cosine_betas"], rtol=1e-12)


def test_space_timesteps_counts():
    assert len(space_timesteps(1000, "250")) == 250
    assert len(space_timesteps(1000, "ddim25")) == 25
    assert space_timesteps(1000, "ddim25") == set(range(0, 1000, 40))
    assert len(space_timesteps(300, [10, 15, 20])) == 45
    with pytest.raises(ValueError):
        space_timesteps(10, "100")


def test_respaced_marginals_preserved():
    """Respacing must preserve alphas_cumprod at the kept steps."""
    full = make_schedule("")
    s250 = make_schedule("250")
    kept = np.asarray(s250.timestep_map)
    np.testing.assert_allclose(
        np.asarray(s250.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[kept], rtol=1e-6)
