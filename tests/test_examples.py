"""Smoke tests for the demo surface (examples.py scenarios)."""

import subprocess
import sys


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=timeout,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd=".",
    )


def test_examples_quick():
    r = _run(["-c",
              "import jax; jax.config.update('jax_platforms','cpu');"
              "import examples; examples.run_quick_test()"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "quick test OK" in r.stdout


def test_examples_single_scenario():
    r = _run(["-c",
              "import jax; jax.config.update('jax_platforms','cpu');"
              "import examples; examples.SCENARIOS['2d']();"
              "examples.SCENARIOS['rcq']()"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "type 4" in r.stdout and "round-trip" in r.stdout


def test_examples_rejects_unknown():
    r = _run(["examples.py", "nonsense"])
    assert r.returncode == 1
    assert "unknown scenario" in r.stdout


def test_examples_design_scenario():
    r = _run(["-c",
              "import jax; jax.config.update('jax_platforms','cpu');"
              "import examples; examples.SCENARIOS['design']()"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DE threshold" in r.stdout and "trajectory" in r.stdout


def test_examples_encode_scenario():
    r = _run(["-c",
              "import jax; jax.config.update('jax_platforms','cpu');"
              "import examples; examples.SCENARIOS['encode']()"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "recovered" in r.stdout


def test_examples_floor_scenario():
    r = _run(["-c",
              "import jax; jax.config.update('jax_platforms','cpu');"
              "import examples; examples.SCENARIOS['floor']()"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "IS floor estimate" in r.stdout
