"""bench.py integrity smoke tests.

The driver runs `python bench.py` unattended at the end of every round
and records the output as the round's perf artifact — a broken bench
emits error lines instead of measurements and nothing else notices
(round 5 shipped exactly that: _train_step_ms grew a third return value
and its three callers still unpacked two, so configs 2/3/5 errored).
These tests pin the two failure classes cheaply, without TPU access or
full-size workloads:

1. every _train_step_ms call site unpacks exactly as many targets as
   the function returns (AST check — the literal round-5 bug);
2. the config-2 measurement path (train step + eval step + WER/CER
   metrics) runs end-to-end on CPU at tiny shapes and returns the
   documented triple.
"""

import ast
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def test_train_step_ms_call_sites_unpack_full_return():
    tree = ast.parse(open(BENCH).read())
    n_returns = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and \
                node.name == "_train_step_ms":
            rets = [r for r in ast.walk(node) if isinstance(r, ast.Return)
                    and r.value is not None]
            assert rets, "no return statements found"
            for r in rets:
                assert isinstance(r.value, ast.Tuple), ast.dump(r.value)
                k = len(r.value.elts)
                assert n_returns in (None, k), "inconsistent return arity"
                n_returns = k
    assert n_returns is not None, "_train_step_ms not found"

    checked = 0
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign):
            continue
        call = node.value
        if not (isinstance(call, ast.Call)
                and isinstance(call.func, ast.Name)
                and call.func.id == "_train_step_ms"):
            continue
        target = node.targets[0]
        assert isinstance(target, ast.Tuple) and \
            len(target.elts) == n_returns, (
                f"line {node.lineno}: _train_step_ms returns {n_returns} "
                f"values but the assignment unpacks "
                f"{len(target.elts) if isinstance(target, ast.Tuple) else 1}")
        checked += 1
    assert checked >= 3, f"expected >=3 call sites, found {checked}"


@pytest.mark.slow
def test_config2_measurement_path_runs(monkeypatch):
    """The config-2 path end-to-end at tiny shapes: train step, eval
    step, and the WER/CER scoring of real device output."""
    import bench
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(d_model=32, n_heads=2, n_blocks=1)
    sec, eval_sec, eval_metrics = bench._train_step_ms(
        8, augment=False, accumulation_steps=1, n_steps=1,
        cfg=cfg, seconds=1.0)
    assert sec > 0 and eval_sec > 0
    assert set(eval_metrics) == {"wer", "cer"}
    assert 0.0 <= eval_metrics["cer"] <= eval_metrics["wer"] <= 1.0
