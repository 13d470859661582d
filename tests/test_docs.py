"""Documentation guards."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_index_in_sync():
    """docs/API.md must match what docs/gen_api.py generates from the live
    public surface — regenerate it after changing exports/docstrings."""
    sys.path.insert(0, os.path.join(REPO, "docs"))
    try:
        import gen_api
    finally:
        sys.path.pop(0)
    generated = gen_api.generate()
    with open(os.path.join(REPO, "docs", "API.md")) as fh:
        committed = fh.read()
    assert committed == generated, (
        "docs/API.md is stale — run: PYTHONPATH=. python docs/gen_api.py")


def test_every_export_documented():
    import microtipi_tpu as m

    undocumented = [
        n for n in m.__all__
        if callable(getattr(m, n)) and not getattr(m, n).__doc__
    ]
    assert not undocumented, undocumented
