"""Driver entry-point contract tests (CPU mesh)."""
import sys

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


@pytest.mark.slow
def test_entry_compiles(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 5
    assert out[0].shape == (1, 48, 48, 25)


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)
