"""Register/action edge parity for kpop-twistdb (VERDICT r4 #9): the
reference validates the WHOLE delayed-action program before executing any
action (bin/KPopTwistDB.ml:368-408) — a twister must be in the twister
register for -k, and for -e/-d/-s/-O m (which need the inertia-induced
metric); violations are parse errors with specific texts, raised before
any side effect."""

import os
import subprocess
import sys

import pytest

from kpop_tpu.cli import twistdb
from kpop_tpu.utils.cli import ParseError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MSG_KMERS = "Option '-k' requires a twister in the twister register!"
MSG_METRIC = (
    "Options '-O m', '-e', '-d', and '-s' require a twister in the "
    "twister register to provide a metric!"
)


@pytest.mark.parametrize(
    "argv,msg",
    [
        (["-k", "spectra.txt"], MSG_KMERS),
        (["-e"], MSG_METRIC),
        (["-d", "other"], MSG_METRIC),
        (["-s", "other", "out"], MSG_METRIC),
        (["-O", "m", "metrics_out"], MSG_METRIC),
        # program ORDER matters: loading the twister after the action that
        # needs it does not satisfy the requirement (reference iterates the
        # program in order, bin/KPopTwistDB.ml:369-372)
        (["-k", "spectra.txt", "-i", "T", "tw"], MSG_KMERS),
        (["-e", "-i", "T", "tw"], MSG_METRIC),
    ],
)
def test_twister_required_parse_errors(argv, msg):
    with pytest.raises(ParseError) as ei:
        twistdb.main(argv)
    assert str(ei.value) == msg


def test_valid_orders_pass_validation(tmp_path):
    """The same actions preceded by a twister load parse fine (and then
    fail LATER, at execution, on the missing file — not with the
    validation texts)."""
    missing = str(tmp_path / "nope")
    for argv in (
        ["-i", "T", missing, "-k", "x.txt"],
        ["-I", "T", missing, "-e"],
        ["-i", "T", missing, "-d", "y"],
    ):
        with pytest.raises(Exception) as ei:
            twistdb.main(argv)
        assert not isinstance(ei.value, ParseError), argv
        assert "twister register" not in str(ei.value)


def test_validation_fails_before_any_side_effect(tmp_path):
    """`-z t -o t OUT -d X` must fail at parse (no twister for -d) WITHOUT
    writing OUT: the reference validates before executing any action."""
    out = tmp_path / "out"
    with pytest.raises(ParseError):
        twistdb.main(["-z", "t", "-o", "t", str(out), "-d", "x"])
    assert not (tmp_path / "out.KPopTwisted").exists()
    assert list(tmp_path.iterdir()) == []


def test_cli_fatal_ux(tmp_path):
    """Through the real CLI surface the violation surfaces as the
    reference's parse-error UX with the exact message and rc != 0."""
    env = dict(os.environ, PYTHONPATH=REPO)
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        [sys.executable, "-m", "kpop_tpu.cli.twistdb", "-k", "x.txt"],
        env=env, capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert res.returncode != 0
    assert MSG_KMERS in res.stderr
    assert list(tmp_path.iterdir()) == []
