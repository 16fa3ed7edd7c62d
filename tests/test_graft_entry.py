"""The driver entry contract (`__graft_entry__.py`) under test.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual CPU mesh; breaking either must be a
suite failure, not a round artifact (round-3 regression class)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = graft.entry()
    jitted = jax.jit(fn)
    lowered = jitted.lower(*example_args)
    lowered.compile()  # compile-check, as the driver does
    out = np.asarray(jitted(*example_args))
    assert out.shape[0] == example_args[1].shape[0]
    assert np.isfinite(out).all()


def test_dryrun_multichip_two_devices():
    graft.dryrun_multichip(2)


def test_dryrun_multichip_eight_devices():
    # the driver's actual config: 8 virtual CPU devices (conftest forces
    # xla_force_host_platform_device_count=8)
    if len(jax.devices("cpu")) < 8:
        import pytest

        pytest.skip("fewer than 8 CPU devices in this environment")
    graft.dryrun_multichip(8)
