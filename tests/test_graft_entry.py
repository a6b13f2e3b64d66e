"""Driver contract: entry() compiles (shape-level) and dryrun_multichip runs
a full sharded train step on the 8-device virtual CPU mesh."""

import importlib
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip():
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(8)


def test_entry_shapes():
    ge = importlib.import_module("__graft_entry__")
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    decoded, seg = out
    assert decoded.shape == (1, 8400, 5)
    assert set(seg.keys()) == {"p3", "p4", "p5"}
    assert seg["p3"].shape == (1, 80, 80, 1)
