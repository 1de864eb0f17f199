"""Config validation tests."""

import pytest

from covid19uk_tpu.config import McmcConfig


def test_defaults_match_reference_example():
    c = McmcConfig()
    # example_config.yaml:25-34
    assert (c.dmax, c.nmax, c.m, c.occult_nmax) == (84, 25, 2, 15)
    assert c.num_event_time_updates == 5
    assert (c.num_bursts, c.num_burst_samples, c.thin) == (50, 100, 1)


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="Unknown Mcmc config keys"):
        McmcConfig.from_dict({"dmaxx": 3})


def test_bad_values_rejected():
    with pytest.raises(ValueError, match="positive int"):
        McmcConfig.from_dict({"num_bursts": 0})
    with pytest.raises(ValueError, match="dtype"):
        McmcConfig.from_dict({"dtype": "bfloat16"})
    with pytest.raises(ValueError, match="warmup unknown"):
        McmcConfig.from_dict({"warmup": {"first": 10}})


def test_roundtrip():
    d = dict(dmax=5, num_chains=4, dtype="float64",
             warmup=dict(first_window=10))
    c = McmcConfig.from_dict(d)
    assert c.dmax == 5 and c.num_chains == 4
    assert c.to_dict()["dtype"] == "float64"
