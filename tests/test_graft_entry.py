"""Driver-integration checks: the exact entry points the driver runs.

``dryrun_multichip`` must be hermetic on CPU — it may never touch the
default backend (the axon TPU plugin can be version-skewed in the driver
environment; see VERDICT round 1, MULTICHIP_r01 failure). conftest.py
forces JAX_PLATFORMS=cpu with 8 virtual devices, same as the driver's
``xla_force_host_platform_device_count`` setup.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    """The driver's multi-chip validation, invoked verbatim."""
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_dryrun_requires_enough_devices():
    with pytest.raises(AssertionError):
        graft.dryrun_multichip(len(jax.devices("cpu")) + 1)


def test_entry_compiles_single_chip():
    """entry() returns (fn, args) that trace/lower without error."""
    fn, args = graft.entry()
    jax.jit(fn).lower(*args)  # compile-check only; no execution
