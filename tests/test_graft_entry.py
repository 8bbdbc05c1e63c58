"""Driver-contract tests for __graft_entry__.py."""

import importlib.util

import jax
import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_entry_compiles_and_runs():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out["classification_output"].shape == (8, 23)
    assert out["segmentation_output"].shape == (8, 1024, 12)
    assert out["se3"].shape == (8, 3, 3)


@pytest.mark.parametrize(
    "n",
    [
        # n=2 exercises the same three legs at a different mesh factoring;
        # slow lane only (fast-lane budget, VERDICT r4 item 4) — the driver
        # also runs dryrun_multichip directly every round.
        pytest.param(2, marks=pytest.mark.slow),
        8,
    ],
)
def test_dryrun_multichip(n, capsys):
    m = _load()
    m.dryrun_multichip(n)
    assert "dryrun_multichip OK" in capsys.readouterr().out
