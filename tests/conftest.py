from __future__ import annotations

import os

import pytest

# Test-session core count (bench/driver set their own env; this only
# affects `pytest tests/`). Measured round 12 on the 32-core sandbox:
# the heavy data-parallel files (pipeline e2e, property tests) run 1.7x
# faster at 8 cores (277 -> 164 s) while the parity-dominated light set
# still improves (332 -> 304 s); 16 cores adds nothing (305 s) because
# tiny-frame stages then pay more per-stage task bookkeeping.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from morphik_core_spark.session import get_spark

    spark = get_spark(app_name="morphik_core_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
