"""Audit the sharded train step's lowered HLO (round-4 VERDICT item 4).

Compiles the production train step on the virtual 8-device CPU mesh
(data=4 x model=2, ZeRO-1, sequence-parallel cross-attention — the exact
dryrun/multihost geometry) and reports:

  - every GSPMD complaint on stderr during compilation (the "Involuntary
    full rematerialization" warnings are replicate-then-repartition
    fallbacks: wasted ICI/DCN bytes on a real pod)
  - a histogram of the collectives in the compiled module (the ZeRO-1
    layout should show reduce-scatter + all-gather, not all-reduce into
    replicated moments)

Usage: python scripts/shard_audit.py [--task MIX] [--dump-hlo PATH]
The test twin is tests/test_shard_audit.py.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# surface C++ WARNING logs (tsl default already shows warnings; make sure
# nothing raised the threshold)
os.environ.pop("TF_CPP_MIN_LOG_LEVEL", None)

import contextlib
import tempfile

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

# collectives that can appear in a compiled SPMD module
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# GSPMD fallback complaints worth failing a build over
WARNING_PATTERNS = (
    r"[Ii]nvoluntary full rematerialization",
    r"[Ii]nvoluntary fully pad",
    r"[Ii]nvoluntary full pad",
)


@contextlib.contextmanager
def capture_stderr_fd():
    """Capture writes to FD 2 (C++ XLA logs bypass sys.stderr)."""
    with tempfile.TemporaryFile(mode="w+b") as tmp:
        saved = os.dup(2)
        try:
            os.dup2(tmp.fileno(), 2)
            box = {}
            yield box
        finally:
            os.dup2(saved, 2)
            os.close(saved)
            tmp.seek(0)
            box["text"] = tmp.read().decode("utf-8", "replace")


def build_step_and_args(task: str, use_sp: bool = True, zero1: bool = True,
                        data: int = 4, model: int = 2,
                        dtype: str = "bfloat16", flash: bool = True,
                        heads: int = 4, topology: str | None = None,
                        grad_constraint: bool = True):
    """Tiny dims, production structure. Defaults = the dryrun_multichip
    geometry; --data 8 --model 1 --fp32 --no-flash mirrors the 2-process
    multihost CLI test. topology="v5e:2x4" AOT-compiles against a REAL
    TPU topology (compile-only PJRT client — no chips needed) so the audit
    sees the actual TPU collective lowering (the CPU backend lacks e.g.
    the all-reduce→reduce-scatter rewrite); inputs become abstract
    ShapeDtypeStructs carrying the mesh shardings."""
    from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
    from mico_tpu.models.mico import init_mico
    from mico_tpu.parallel.mesh import create_mesh
    from mico_tpu.train.optim import OptimConfig, build_optimizer
    from mico_tpu.train.train_step import (
        make_train_step,
        shard_batch,
        shard_train_state,
    )

    if topology:
        from jax.experimental import topologies

        dims = tuple(int(x) for x in topology.split(":")[1].split("x"))
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=topology,
            chips_per_host_bounds=(*dims, 1), num_slices=1,
        )
        mesh = create_mesh(data=data, model=model, devices=topo.devices)
        flash = False  # interpret-mode Pallas is not AOT-compilable
    else:
        mesh = create_mesh(data=data, model=model)
    cfg = MiCoConfig(
        eva_override=EvaVitConfig(
            image_size=28, patch_size=14, layers=2, width=64, head_width=16,
            mlp_ratio=4.0, embed_dim=32,
        ),
        bert_override=BertConfig(
            vocab_size=30522, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=heads, intermediate_size=128,
            max_position_embeddings=64, encoder_width=64,
        ),
        contra_dim=32, max_vision_sample_num=2, max_audio_sample_num=2,
        max_depth_sample_num=2, compute_dtype=dtype,
        use_flash_attention=flash, itm_ratio=0.1,
        shard_condition_sequence=use_sp,
    )
    from mico_tpu.ops import flash_attention as fa

    fa.FORCE_KERNEL_INTERPRET = True

    if topology:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from mico_tpu.train.train_step import train_state_shardings

        params = jax.eval_shape(
            lambda: init_mico(jax.random.PRNGKey(0), cfg)
        )
        opt = build_optimizer(params, OptimConfig(num_train_steps=100))
        opt_state = jax.eval_shape(opt.init, params)
        p_sh, o_sh = train_state_shardings(mesh, params, opt_state,
                                           zero1=zero1)
        as_abs = lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype,
                                                   sharding=s)
        params = jax.tree.map(as_abs, params, p_sh)
        opt_state = jax.tree.map(as_abs, opt_state, o_sh)
        b = 8
        import jax.numpy as _jnp

        bspec = NamedSharding(mesh, P("data"))
        def abs_batch(shape, dt=_jnp.float32):
            return jax.ShapeDtypeStruct(shape, dt, sharding=bspec)

        batch = {
            "vision_pixels": abs_batch((b, 2, 3, 28, 28)),
            "audio_spectrograms": abs_batch((b, 2, 28, 28)),
            "caption_ids": abs_batch((b, 12), _jnp.int32),
            "caption_mask": abs_batch((b, 12), _jnp.int32),
            "subtitle_ids": abs_batch((b, 8), _jnp.int32),
            "subtitle_mask": abs_batch((b, 8), _jnp.int32),
            "depth_pixels": abs_batch((b, 2, 3, 28, 28)),
            "question_ids": abs_batch((b, 6), _jnp.int32),
            "question_mask": abs_batch((b, 6), _jnp.int32),
            "answer_ids": abs_batch((b, 4), _jnp.int32),
            "answer_mask": abs_batch((b, 4), _jnp.int32),
        }
        rng_abs = jax.ShapeDtypeStruct(
            (2,), _jnp.uint32, sharding=NamedSharding(mesh, P())
        )
        step = make_train_step(cfg, opt, task, donate=False, mesh=mesh,
                               zero1=zero1 and grad_constraint)
        return mesh, step, (params, opt_state, batch, rng_abs)

    params = init_mico(jax.random.PRNGKey(0), cfg)
    opt = build_optimizer(params, OptimConfig(num_train_steps=100))
    opt_state = opt.init(params)
    params, opt_state = shard_train_state(mesh, params, opt_state,
                                          zero1=zero1)
    b = 8
    rng = np.random.default_rng(0)
    batch = {
        "vision_pixels": jnp.asarray(
            rng.standard_normal((b, 2, 3, 28, 28)), jnp.float32),
        "audio_spectrograms": jnp.asarray(
            rng.standard_normal((b, 2, 28, 28)), jnp.float32),
        "caption_ids": jnp.asarray(
            rng.integers(200, 20000, (b, 12)), jnp.int32),
        "caption_mask": jnp.ones((b, 12), jnp.int32),
        "subtitle_ids": jnp.asarray(
            rng.integers(200, 20000, (b, 8)), jnp.int32),
        "subtitle_mask": jnp.ones((b, 8), jnp.int32),
        "depth_pixels": jnp.asarray(
            rng.standard_normal((b, 2, 3, 28, 28)), jnp.float32),
        "question_ids": jnp.asarray(
            rng.integers(200, 20000, (b, 6)), jnp.int32),
        "question_mask": jnp.ones((b, 6), jnp.int32),
        "answer_ids": jnp.asarray(
            rng.integers(200, 20000, (b, 4)), jnp.int32),
        "answer_mask": jnp.ones((b, 4), jnp.int32),
    }
    batch = shard_batch(mesh, batch)
    step = make_train_step(cfg, opt, task, donate=False, mesh=mesh,
                           zero1=zero1 and grad_constraint)
    return mesh, step, (params, opt_state, batch, jax.random.PRNGKey(1))


def compile_and_audit(task: str, use_sp: bool = True, zero1: bool = True,
                      dump_hlo: str | None = None, **geom):
    mesh, step, args = build_step_and_args(task, use_sp, zero1, **geom)
    with jax.sharding.set_mesh(mesh):
        lowered = step.lower(*args)
        with capture_stderr_fd() as box:
            compiled = lowered.compile()
    stderr = box["text"]
    warnings = [
        ln for ln in stderr.splitlines()
        if any(re.search(p, ln) for p in WARNING_PATTERNS)
    ]
    hlo = compiled.as_text()
    if dump_hlo:
        with open(dump_hlo, "w") as f:
            f.write(hlo)
    counts = {
        op: len(re.findall(rf"(?m)^\s*[%\w.-]+ = \S+ {op}(-start)?\(", hlo))
        for op in COLLECTIVE_OPS
    }
    # the TPU backend lowers reduce-scatter as kCustom fusions calling
    # %all-reduce-scatter.* computations — count those as reduce-scatter
    counts["reduce-scatter"] += len(
        re.findall(r"calls=%all-reduce-scatter", hlo)
    )
    return warnings, counts, stderr, hlo


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="ret%tva%tid_cap%tvas_qa%tva")
    ap.add_argument("--no-sp", action="store_true")
    ap.add_argument("--no-zero1", action="store_true")
    ap.add_argument("--data", type=int, default=4)
    ap.add_argument("--model", type=int, default=2)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--no-grad-constraint", action="store_true",
                    help="A/B: keep ZeRO-1 state sharding but skip the "
                         "train step's grad sharding constraint")
    ap.add_argument("--topology", default=None,
                    help='AOT-compile against a real TPU topology, e.g. '
                         '"v5e:2x4" (compile-only PJRT — no chips needed)')
    ap.add_argument("--dump-hlo", default=None)
    a = ap.parse_args()

    warnings, counts, stderr, hlo = compile_and_audit(
        a.task, use_sp=not a.no_sp, zero1=not a.no_zero1,
        dump_hlo=a.dump_hlo, data=a.data, model=a.model,
        dtype="float32" if a.fp32 else "bfloat16",
        flash=not a.no_flash, heads=a.heads, topology=a.topology,
        grad_constraint=not a.no_grad_constraint)
    print(f"task={a.task} sp={not a.no_sp} zero1={not a.no_zero1} "
          f"mesh={a.data}x{a.model} topology={a.topology}")
    print("collectives:", counts)
    print(f"GSPMD fallback warnings: {len(warnings)}")
    for w in warnings:
        print("  ", w.strip())
    if a.dump_hlo:
        print("HLO dumped to", a.dump_hlo)
    return 1 if warnings else 0


if __name__ == "__main__":
    sys.exit(main())
