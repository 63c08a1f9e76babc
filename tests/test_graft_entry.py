"""Driver-contract tests for __graft_entry__.py.

The driver calls ``entry()`` (single-chip compile check) and
``dryrun_multichip(N)`` from a process that may already hold the single TPU
backend; ``dryrun_multichip`` must self-provision an N-device virtual CPU
mesh (VERDICT round 1, item 1).
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_compiles():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    recon, rot, trans = out
    # flagship head: 4 hypotheses x (6d rep + confidence logit)
    # (docs/MULTIHYP.md; so3.split_hypotheses)
    assert rot.shape[-1] == 4 * (6 + 1) and trans.shape[-1] == 3
    assert recon.ndim == 3 and recon.shape[-1] == 3


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    # Must pass regardless of the calling process's backend state.
    __graft_entry__.dryrun_multichip(8)
