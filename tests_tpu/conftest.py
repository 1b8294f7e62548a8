"""On-chip validation suite (run manually / by the bench harness):

    python -m pytest tests_tpu/ -q

Unlike tests/ (which forces CPU + 8 virtual devices), this suite runs on the
real TPU backend and validates exactly what the CPU suite cannot: the compiled
Mosaic lowering of the fused Pallas kernels at production block size, and the
in-kernel hardware PRNG action stream behind the headline benchmark.
Everything here skips cleanly when no TPU is attached.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.devices()[0].platform != "tpu":
        skip = pytest.mark.skip(reason="real TPU required")
        for item in items:
            item.add_marker(skip)
