"""Utility module tests: metrics, config."""

from quisquis_tpu.utils.metrics import Metrics
from quisquis_tpu import config


def test_metrics_counters_and_timers():
    m = Metrics()
    m.count("ops", 10)
    m.count("ops", 5)
    with m.timer("phase"):
        pass
    assert m.counters["ops"] == 15
    assert len(m.timers["phase"]) == 1
    assert "phase" in m.report()
    m.reset()
    assert not m.counters


def test_config_defaults_match_reference():
    c = config.QuisQuisConfig()
    assert c.anonymity_set_size == 9
    assert c.rows == 3 and c.columns == 3
    assert c.range_bits == 64
    assert c.bp_gens_capacity == 64 and c.bp_party_capacity == 16
    assert c.r1cs_gens_capacity == 512
    c2 = config.QuisQuisConfig(anonymity_set_size=64)
    assert c2.rows == 8
