"""Checkpoint save / resume.

Mirrors the reference contract (data/utils/save.py:9-41,
data/utils/build_model.py:65-124, inference_demo.py:14-116):
  - `ckpt/model_step_{N}` (+ `optimizer_step_{N}`) under the output dir,
    previous checkpoint removed unless remove_before_ckpt=False
  - `best_{metric}` snapshots
  - resume picks the max-step model/optimizer pair
  - `load_from_pretrained_dir` reads `log/hps.json` and the latest
    checkpoint, accepting BOTH the released PyTorch `.pt` state_dicts
    (converted through mico_tpu.convert with legacy-key surgery and
    embedding resizes) and this framework's native `.npz` pytrees.
"""

from __future__ import annotations

import glob
import io
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from mico_tpu.config import MiCoConfig, mico_config_from_dict
from mico_tpu.utils.config_io import AttrDict, load_hps
from mico_tpu.utils.logger import LOGGER

SEP = "/"


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}{SEP}"))
    else:
        out[prefix.rstrip(SEP)] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def host_fetch(x) -> np.ndarray:
    """Leaf → host numpy, tolerating multi-process placements: a global
    array whose LOCAL shard is full-size (replicated in practice — e.g. a
    size-1 model-axis sharding, which jax does not report as
    fully-replicated) reads its local shard. Genuinely cross-process-
    sharded leaves cannot be host-gathered without a collective — that is
    the orbax backend's job."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shard = x.addressable_data(0)
        if shard.shape == x.shape:
            return np.asarray(shard)
        raise ValueError(
            f"cannot host-gather a cross-process-sharded array "
            f"(global {x.shape}, local shard {shard.shape}); use "
            f"checkpoint_backend=orbax for sharded saves"
        )
    return np.asarray(x)


def save_pytree_npz(path: str, tree) -> None:
    np.savez(path, **flatten_pytree(jax.tree.map(host_fetch, tree)))


def load_pytree_npz(path: str):
    with np.load(path) as z:
        return unflatten_pytree({k: z[k] for k in z.files})


class ModelSaver:
    """npz (default) or orbax backend. orbax saves ASYNCHRONOUSLY — the
    training loop continues while the previous checkpoint flushes (the
    production behavior for billion-param models; the reference blocks on
    torch.save, data/utils/save.py:15-41)."""

    def __init__(self, output_dir: str, remove_before_ckpt: bool = True,
                 backend: str = "npz"):
        self.ckpt_dir = os.path.join(output_dir, "ckpt")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.remove_before_ckpt = remove_before_ckpt
        self.backend = backend
        self._orbax = None
        self._orbax_opt = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            # Multi-process: SYNCHRONOUS checkpointers. The async commit
            # thread (asyncio.run per commit + the cross-process
            # array-metadata validation pass) intermittently dies with
            # "cannot schedule new futures after shutdown" inside orbax
            # 0.11 under a busy GIL (observed in the 2-process CLI test;
            # the isolated repro passes) — the inline commit path has no
            # background asyncio nesting to race. Single-process keeps the
            # async saver: training continues while the previous
            # checkpoint flushes.
            ctor = (
                (lambda h: ocp.Checkpointer(h))
                if jax.process_count() > 1
                else (lambda h: ocp.AsyncCheckpointer(h))
            )
            self._orbax = ctor(ocp.StandardCheckpointHandler())
            self._orbax_opt = ctor(ocp.StandardCheckpointHandler())

    def _clean(self, pattern: str):
        import shutil

        for p in glob.glob(os.path.join(self.ckpt_dir, pattern)):
            if os.path.isdir(p):
                shutil.rmtree(p)
            else:
                os.remove(p)

    def save(self, step: int, params, opt_state=None):
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            _ckpt_wait(self._orbax)
            _ckpt_wait(self._orbax_opt)
            # multihost: every process calls save (shard writes are
            # collective) but only process 0 deletes the previous step.
            # The barrier is load-bearing: wait_until_finished only flushes
            # THIS process's async commit — without it process 0 can rmtree
            # a directory another process is still finalizing (observed as
            # orphaned *-tmp dirs + orbax barrier errors in the 2-process
            # test).
            if jax.process_count() > 1:
                from mico_tpu.parallel.collectives import gather_objects

                gather_objects(None)  # all prior saves committed everywhere
            if self.remove_before_ckpt and jax.process_index() == 0:
                self._clean("model_step_*.orbax")
                self._clean("optimizer_step_*.orbax")
            # mesh-sharded jax.Arrays go straight to orbax: each process
            # writes only its addressable shards (no host gather — the
            # npz path below gathers and is for single-host small runs)
            self._orbax.save(
                os.path.join(self.ckpt_dir, f"model_step_{step}.orbax"),
                args=ocp.args.StandardSave(params),
            )
            if opt_state is not None:
                self._orbax_opt.save(
                    os.path.join(
                        self.ckpt_dir, f"optimizer_step_{step}.orbax"
                    ),
                    args=ocp.args.StandardSave(_opt_flat_dict(opt_state)),
                )
            return
        if self.remove_before_ckpt:
            self._clean("model_step_*.npz")
        save_pytree_npz(
            os.path.join(self.ckpt_dir, f"model_step_{step}.npz"), params
        )
        if opt_state is not None:
            if self.remove_before_ckpt:
                self._clean("optimizer_step_*.npz")
            flat, _ = jax.tree_util.tree_flatten(opt_state)
            np.savez(
                os.path.join(self.ckpt_dir, f"optimizer_step_{step}.npz"),
                **{str(i): host_fetch(x) for i, x in enumerate(flat)},
            )

    def save_best(self, metric: str, params):
        """Best-metric snapshot (reference save.py:33-41). orbax backend:
        a COLLECTIVE sharded save (every process calls this — the metrics
        are identical everywhere after the eval gather), overwriting in
        place; npz backend: process-0 host write."""
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            _ckpt_wait(self._orbax)
            self._orbax.save(
                os.path.join(self.ckpt_dir, f"best_{metric}.orbax"),
                args=ocp.args.StandardSave(params),
                force=True,
            )
            return
        save_pytree_npz(
            os.path.join(self.ckpt_dir, f"best_{metric}.npz"), params
        )

    def wait(self):
        _ckpt_wait(self._orbax)
        _ckpt_wait(self._orbax_opt)


def _ckpt_wait(ckptr) -> None:
    """Flush an orbax checkpointer's in-flight save; no-op for the
    synchronous Checkpointer (commits inline) and for absent backends."""
    if ckptr is not None and hasattr(ckptr, "wait_until_finished"):
        ckptr.wait_until_finished()


def _opt_flat_dict(opt_state) -> Dict[str, Any]:
    """Positional {str(i): leaf} view of the optimizer state — the same
    layout the npz path saves, so both backends restore into a template's
    treedef (optax state classes never round-trip by name)."""
    flat, _ = jax.tree_util.tree_flatten(opt_state)
    return {str(i): x for i, x in enumerate(flat)}


def load_checkpoint_path(path: str):
    """Load a model checkpoint by extension: .orbax dir or .npz."""
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            return ckptr.restore(path)
    return load_pytree_npz(path)


def _latest_step(ckpt_dir: str, prefix: str):
    steps = []
    for p in glob.glob(os.path.join(ckpt_dir, f"{prefix}_step_*")):
        if p.endswith("-tmp"):
            # uncommitted orbax scratch from an interrupted save — never a
            # resume candidate (crash mid-save must fall back to the last
            # COMMITTED checkpoint)
            continue
        m = re.search(rf"{prefix}_step_(\d+)", os.path.basename(p))
        if m:
            steps.append((int(m.group(1)), p))
    return max(steps) if steps else (None, None)


def resume_latest(output_dir: str, opt_state_template=None):
    """→ (params, opt_state|None, step) or (None, None, 0)."""
    ckpt_dir = os.path.join(output_dir, "ckpt")
    step, model_path = _latest_step(ckpt_dir, "model")
    if step is None:
        return None, None, 0
    params = load_checkpoint_path(model_path)
    opt_state = None
    if opt_state_template is not None:
        opt_state = load_latest_opt_state(output_dir, opt_state_template)
    LOGGER.info("resumed from %s (step %d)", model_path, step)
    return params, opt_state, step


def load_latest_opt_state(output_dir: str, opt_state_template):
    """Restore the newest `optimizer_step_*` into the template's tree
    structure, or None when absent. Split out of resume_latest so callers
    that must build the optimizer AFTER loading params (run.py: the
    optimizer's param groups depend on the loaded tree) can restore the
    moments without re-reading the model checkpoint."""
    _, opt_path = _latest_step(os.path.join(output_dir, "ckpt"), "optimizer")
    if not opt_path:
        return None
    treedef = jax.tree_util.tree_structure(opt_state_template)
    if opt_path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            d = ckptr.restore(opt_path)
        leaves = [d[str(i)] for i in range(len(d))]
    else:
        with np.load(opt_path) as z:
            leaves = [z[str(i)] for i in range(len(z.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Sharding-aware restore (orbax backend)
# ---------------------------------------------------------------------------


def abstract_with_shardings(abstract_tree, shardings):
    """Attach a NamedSharding pytree to an abstract (jax.eval_shape) tree:
    the orbax restore target. Each device then reads ONLY its shard from
    the checkpoint — for ViT-g that is the difference between every host
    materializing ~15.6 GB of fp32 params+moments and reading 1/N of it."""
    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        abstract_tree, shardings,
    )


def restore_sharded(path: str, abstract_tree):
    """Orbax restore straight onto the mesh: abstract_tree leaves are
    ShapeDtypeStructs carrying NamedSharding (see abstract_with_shardings)."""
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(path, args=ocp.args.StandardRestore(abstract_tree))


def resume_latest_sharded(
    output_dir: str,
    abstract_params,
    param_shardings,
    abstract_opt_state=None,
    opt_shardings=None,
):
    """Mesh-aware resume (the multi-chip path; reference resume contract
    build_model.py:106-124 at sharded scale): restore the newest
    `model_step_*.orbax` (+ `optimizer_step_*.orbax`) directly into the
    given shardings. → (params, opt_state|None, step); (None, None, 0)
    when no orbax checkpoint exists."""
    ckpt_dir = os.path.join(output_dir, "ckpt")
    step, model_path = _latest_step(ckpt_dir, "model")
    if step is None or not model_path.endswith(".orbax"):
        return None, None, 0
    params = restore_sharded(
        model_path, abstract_with_shardings(abstract_params, param_shardings)
    )
    opt_state = None
    if abstract_opt_state is not None:
        _, opt_path = _latest_step(ckpt_dir, "optimizer")
        if opt_path and opt_path.endswith(".orbax"):
            flat, treedef = jax.tree_util.tree_flatten(abstract_opt_state)
            sh_flat = treedef.flatten_up_to(opt_shardings)
            target = {
                str(i): jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
                for i, (x, s) in enumerate(zip(flat, sh_flat))
            }
            d = restore_sharded(opt_path, target)
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [d[str(i)] for i in range(len(flat))]
            )
    LOGGER.info("sharded resume from %s (step %d)", model_path, step)
    return params, opt_state, step


# ---------------------------------------------------------------------------
# Pretrained-dir loader (reference inference entry)
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    from mico_tpu.convert import to_numpy

    return to_numpy(sd)


def _hf_trainer_state_dict(pretrain_dir: str):
    """HuggingFace-trainer layout: `checkpoint-N/pytorch_model.bin`, possibly
    sharded as `pytorch_model-0000i-of-0000n.bin` (reference
    data/utils/build_model.py:65-88). Returns the merged state dict or None
    when the layout is absent."""
    import glob

    steps = []
    for d in os.listdir(pretrain_dir) if os.path.isdir(pretrain_dir) else []:
        if d.startswith("checkpoint-") and d.split("-")[-1].isdigit():
            steps.append(int(d.split("-")[-1]))
    if not steps:
        return None
    cdir = os.path.join(pretrain_dir, f"checkpoint-{max(steps)}")
    single = os.path.join(cdir, "pytorch_model.bin")
    shards = sorted(glob.glob(os.path.join(cdir, "pytorch_model-*.bin")))
    if os.path.exists(single):
        LOGGER.info("load_from_pretrained: %s", single)
        return load_torch_state_dict(single)
    if shards:
        merged: Dict[str, np.ndarray] = {}
        for s in shards:
            LOGGER.info("load_from_pretrained shard: %s", s)
            merged.update(load_torch_state_dict(s))
        return merged
    return None


def load_from_pretrained_dir(
    pretrain_dir: str,
    video_resolution: int = 224,
    config_overrides: Optional[dict] = None,
    return_modal: str = "full",
) -> Tuple[dict, MiCoConfig]:
    """Reference-parity loader (inference_demo.py:14-116 +
    build_model.py:65-103): read `log/hps.json`, pick the newest HF-trainer
    `checkpoint-N` or `ckpt/model_step_*`, convert to the param pytree.
    → (params, MiCoConfig).

    return_modal (inference_demo.py:99-112): 'full' = the whole model;
    'uni' = just the shared vision tower subtree; 'text' = just the BERT
    interface subtree."""
    hps = load_hps(pretrain_dir)
    model_cfg = dict(hps.get("model_cfg", hps))
    model_cfg["vision_resolution"] = video_resolution
    if config_overrides:
        model_cfg.update(config_overrides)
    cfg = mico_config_from_dict(model_cfg)

    def finish(params):
        if return_modal == "uni":
            return params["vision_encoder"], cfg
        if return_modal == "text":
            return params["bert"], cfg
        return params, cfg

    def convert_with_audit(sd):
        """Convert + warn about checkpoint tensors the converter never read
        (a silently-dropped weight would otherwise be invisible)."""
        from mico_tpu.models.mico import mico_from_torch, remap_legacy_keys

        consumed: set = set()
        params = mico_from_torch(sd, cfg, consumed=consumed)
        leftover = sorted(set(remap_legacy_keys(dict(sd))) - consumed)
        if leftover:
            LOGGER.warning(
                "checkpoint keys NOT consumed by the converter (%d): %s%s",
                len(leftover), leftover[:8], " ..." if len(leftover) > 8 else "",
            )
        return params

    hf_sd = _hf_trainer_state_dict(pretrain_dir)
    if hf_sd is not None:
        return finish(convert_with_audit(hf_sd))

    ckpt_dir = os.path.join(pretrain_dir, "ckpt")
    step, path = _latest_step(ckpt_dir, "model")
    if path is None:
        raise FileNotFoundError(f"no model_step_* checkpoint in {ckpt_dir}")
    LOGGER.info("load_from_pretrained: %s", path)

    if path.endswith((".npz", ".orbax")):
        params = load_checkpoint_path(path)
    else:
        params = convert_with_audit(load_torch_state_dict(path))
    return finish(params)


# ---------------------------------------------------------------------------
# Torch optimizer-resume layout (reference optimizer_step_*.pt)
# ---------------------------------------------------------------------------

# The reference's AdamW param grouping (data/utils/build_optimizer.py:15-62):
# named_parameters partitioned into [basic, basic_no_decay, new,
# new_no_decay, clip_visual, clip_visual_no_decay]; torch's state_dict keys
# the per-param moments by the GLOBAL position across those groups in order.
_TORCH_NO_DECAY = ("bias", "LayerNorm.bias", "LayerNorm.weight")

# state_dict names that alias another parameter's tensor: torch's
# named_parameters() yields tied tensors once (first registration), so the
# optimizer state lives under the live partner's index only.
_TORCH_TIED = {
    "multimodal_encoder.cls.predictions.decoder.weight":
        "multimodal_encoder.bert.embeddings.word_embeddings.weight",
    "multimodal_encoder.cls.predictions.decoder.bias":
        "multimodal_encoder.cls.predictions.bias",
}

# state_dict entries that are buffers, not parameters — never in the
# optimizer state
_TORCH_BUFFERS = ("multimodal_encoder.bert.embeddings.position_ids",)


def torch_adamw_param_index(
    named_keys, new_params_name=(), vision_clip=True,
) -> Dict[str, int]:
    """Replay the reference optimizer grouping over named-parameter keys →
    {torch_key: global_param_index} exactly as `optimizer.state_dict()`
    numbers them (data/utils/build_optimizer.py:31-62 + torch
    Optimizer.state_dict packing). vision_clip mirrors the reference's
    `'clip' in vision_encoder_type` gate (True for the released
    EVA-CLIP-g run); `'visual' in key` selects the EVA tower."""
    named_keys = [
        k for k in named_keys
        if k not in _TORCH_TIED and k not in _TORCH_BUFFERS
    ]

    def is_new(k):
        return any(n in k for n in new_params_name)

    def no_decay(k):
        return any(n in k for n in _TORCH_NO_DECAY)

    groups = {i: [] for i in range(6)}
    for k in named_keys:
        if is_new(k):
            groups[3 if no_decay(k) else 2].append(k)
        elif vision_clip and "visual" in k:
            groups[5 if no_decay(k) else 4].append(k)
        else:
            groups[1 if no_decay(k) else 0].append(k)
    index = {}
    i = 0
    for g in range(6):
        for k in groups[g]:
            index[k] = i
            i += 1
    return index


def optimizer_moments_from_torch(
    opt_sd, named_keys, cfg: MiCoConfig,
    new_params_name=(), vision_clip=True,
):
    """Reference `optimizer_step_*.pt` (torch AdamW state_dict,
    build_optimizer.py:105-140: per-param step/exp_avg/exp_avg_sq) →
    (exp_avg_tree, exp_avg_sq_tree, step) in the mico_tpu param layout.

    The moment tensors have the parameters' own shapes, so the weight
    converter (`mico_from_torch`) performs the layout mapping — valid
    because every conversion it applies is an element
    permutation/stack/concat (Adam moments are per-element). Assumes a
    same-geometry resume (no pos-embed/frame-embedding resize — the
    reference's own resume contract, load_from_resume). Tied parameters'
    moments are read from their live partner's slot."""
    from mico_tpu.models.mico import mico_from_torch

    index = torch_adamw_param_index(
        named_keys, new_params_name=new_params_name, vision_clip=vision_clip,
    )
    state = opt_sd["state"]

    def field_sd(field):
        sd = {}
        for k, i in index.items():
            st = state[i] if i in state else state[str(i)]
            sd[k] = np.asarray(st[field])
        for tied, live in _TORCH_TIED.items():
            if live in sd:
                sd[tied] = sd[live]
        return sd

    avg = mico_from_torch(field_sd("exp_avg"), cfg)
    sq = mico_from_torch(field_sd("exp_avg_sq"), cfg)
    step = max(
        int(st["step"]) for st in state.values()
    ) if state else 0
    return avg, sq, step
