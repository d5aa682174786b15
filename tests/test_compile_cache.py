"""Persistent-cache schema fingerprinting (round-5 VERDICT item 7)."""

import hashlib

from humanoid_mppi_rl_tpu.utils.compile_cache import (check_schema_marker,
                                                      count_cache_entries,
                                                      schema_fingerprint)


def test_fingerprint_covers_schemas_not_an_error_path():
    """The fingerprint must hash the REAL dataclass field lists — round 5
    shipped (and caught) a version that silently hashed an ImportError
    string, making every schema look identical."""
    import dataclasses

    from humanoid_mppi_rl_tpu.physics.engine import PhysicsState
    from humanoid_mppi_rl_tpu.physics.model import PhysicsModel
    from humanoid_mppi_rl_tpu.solver.mppi import MPPIConfig, MPPIState

    parts = []
    for cls in (PhysicsModel, PhysicsState, MPPIConfig, MPPIState):
        names = [f.name for f in dataclasses.fields(cls)]
        assert names, cls
        parts.append(f"{cls.__name__}:{','.join(names)}")
    expect = hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]
    fp = schema_fingerprint()
    assert fp == expect
    # the silent-error sentinel must never be the produced value
    bad = hashlib.sha256(b"error:ImportError").hexdigest()[:16]
    assert fp != bad


def test_schema_marker_roundtrip(tmp_path):
    d = str(tmp_path)
    first = check_schema_marker(d)
    assert first["schema_changed"] is True          # cold dir: expect miss
    again = check_schema_marker(d)
    assert again["schema_changed"] is False
    assert again["schema_fingerprint"] == first["schema_fingerprint"]
    assert count_cache_entries(d) == 0              # marker not counted
