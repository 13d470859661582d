"""Multi-process (pod-shaped) mesh validation.

Real TPU pods are multi-process: one host process per chip group, devices
coordinated via ``jax.distributed`` and DCN (SURVEY.md section 5-h). Every
other mesh test in this suite runs 8 virtual devices in ONE process, where
GSPMD cannot surface device-order, input-addressability, or output-fetch
mistakes. This test launches 2 coordinated OS processes x 2 virtual CPU
devices each (Gloo collectives across the process boundary) and runs the
same sharded blind round as the driver dryrun — the TPU-native replacement
of the reference's only parallelism (``WideFieldModel.java:216-217,287-288``)
holding on real pod topology, not just one process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft_entry


def test_two_process_sharded_blind_round(capsys):
    # 2 x 2 keeps the compile small on this 1-core host; the worker asserts
    # jax.process_count() == 2 and finite per-round costs itself.
    graft_entry.dryrun_multiprocess(n_processes=2, local_devices=2)
    out = capsys.readouterr().out
    assert "dryrun_multiprocess ok (2 processes x 2 virtual devices" in out
    assert "process_count=2" in out
