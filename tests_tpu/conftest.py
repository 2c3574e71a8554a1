"""On-chip (real TPU) test suite.

Unlike ``tests/`` (which forces an 8-virtual-device CPU backend so CI can
run anywhere), this suite runs on whatever accelerator ``jax.devices()``
reports and SKIPS itself on CPU. Run it on a machine with a real chip:

    python -m pytest tests_tpu/ -q

Keep it small: remote compiles are slow (see CLAUDE.md), so every test
here uses tiny codes and relies on the persistent compilation cache.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="tests_tpu needs a real accelerator")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _cache():
    from ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
