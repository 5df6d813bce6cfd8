"""Guard the driver interface: entry() compiles and dryrun_multichip runs
on the 8-virtual-device CPU mesh (exactly how the driver invokes it)."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = graft.entry()
    y = jax.jit(fn)(*example_args)
    assert y.shape == (1, 192, 192, 3)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
