"""Compile-time audit of the sharded train step (round-4 VERDICT #4).

The 2-process round-4 run logged 36 GSPMD "involuntary full
rematerialization" warnings — replicate-then-repartition fallbacks that
waste ICI/DCN bytes on a real pod. This test compiles the dp×tp(+SP,
+ZeRO-1) step on the virtual 8-device mesh, captures the C++ compiler
log from FD 2, and fails on any fallback warning, so a sharding
annotation that regresses into a fallback can't land silently.
scripts/shard_audit.py is the interactive twin (collective histograms,
HLO dumps, alternate geometries).
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "shard_audit", os.path.join(REPO, "scripts", "shard_audit.py")
)
shard_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(shard_audit)


def test_sharded_train_step_compiles_without_gspmd_fallbacks():
    warnings, counts, stderr, hlo = shard_audit.compile_and_audit(
        "ret%tva_cap%tva", use_sp=True, zero1=True, data=4, model=2
    )
    assert warnings == [], "GSPMD fallback warnings:\n" + "\n".join(warnings)
    # the step is really partitioned: TP/SP/DP collectives present
    assert counts["all-reduce"] > 0 and counts["all-gather"] > 0, counts


def test_tpu_lowering_uses_reduce_scatter_for_zero1():
    """AOT-compile the dp4×tp2+SP+ZeRO-1 step against a REAL v5e-8
    topology (compile-only PJRT — no chips needed) and assert the actual
    TPU lowering: zero GSPMD fallbacks and reduce-scatter collectives on
    the ZeRO-1 grad path (the CPU backend lacks the all-reduce→
    reduce-scatter rewrite, so only the TPU lowering can certify this)."""
    import pytest

    try:
        warnings, counts, stderr, hlo = shard_audit.compile_and_audit(
            "ret%tva_cap%tva", use_sp=True, zero1=True, data=4, model=2,
            topology="v5e:2x4",
        )
    except Exception as e:  # no compile-only TPU client in this env
        pytest.skip(f"TPU compile-only client unavailable: {e}")
    assert warnings == [], "GSPMD fallback warnings:\n" + "\n".join(warnings)
    assert counts["reduce-scatter"] > 0, counts
