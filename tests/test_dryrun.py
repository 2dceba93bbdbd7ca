"""The driver's multichip dryrun is part of the test suite so it cannot
rot: full LLMEngine (scheduler, async pipeline, prefill + decode windows)
over a data=2 x model=4 mesh with the shard_map'd Pallas kernels in
interpret mode, asserting greedy outputs equal the tp=1 jnp-oracle engine."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_drives_full_engine():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
