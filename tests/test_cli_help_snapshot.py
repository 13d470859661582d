"""CLI --help snapshot: the full help text of every subcommand is pinned.

Guards the ``microtipi_tpu/cli/`` package split (a pure refactor of the
former ``__main__.py`` monolith, VERDICT r3 item 6): any drift in the
argument surface — a lost flag, a changed default rendered in help, a
renamed metavar — fails here with a diff. Regenerate deliberately with:

    python tests/test_cli_help_snapshot.py --regen

The snapshot is rendered at COLUMNS=80 (argparse wraps to the terminal).
Runs in-process (``--help`` exits before any jax backend is touched), so
it is cheap enough for the smoke tier.
"""

import contextlib
import io
import os
import sys

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cli_help_snapshot.txt")


def _capture_help(argv):
    from microtipi_tpu.__main__ import main

    buf = io.StringIO()
    old_cols = os.environ.get("COLUMNS")
    os.environ["COLUMNS"] = "80"
    try:
        with contextlib.redirect_stdout(buf):
            try:
                main(argv)
            except SystemExit as e:
                assert e.code in (0, None), (argv, e.code, buf.getvalue())
    finally:
        if old_cols is None:
            os.environ.pop("COLUMNS", None)
        else:
            os.environ["COLUMNS"] = old_cols
    return buf.getvalue()


def _subcommands(top_help):
    # argparse renders the choices line as "  {doctor,info,...}"
    for line in top_help.splitlines():
        s = line.strip()
        if s.startswith("{") and s.endswith("}"):
            return s[1:-1].split(",")
    raise AssertionError("no subcommand choices line in top-level help")


def render_all():
    top = _capture_help(["--help"])
    parts = ["$ microtipi_tpu --help\n" + top]
    for cmd in _subcommands(top):
        parts.append(f"$ microtipi_tpu {cmd} --help\n"
                     + _capture_help([cmd, "--help"]))
    return ("\n" + "=" * 78 + "\n").join(parts)


def test_cli_help_matches_snapshot():
    with open(SNAPSHOT) as fh:
        expected = fh.read()
    actual = render_all()
    assert actual == expected, (
        "CLI --help drifted from the snapshot. If the change is deliberate "
        "(new flag/command), regenerate with: "
        "python tests/test_cli_help_snapshot.py --regen"
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(SNAPSHOT)))
        with open(SNAPSHOT, "w") as fh:
            fh.write(render_all())
        print("wrote", SNAPSHOT)
    else:
        print(__doc__)
