"""PyTorch checkpoint → JAX pytree converters.

Handles the exact state_dict layouts of the released MiCo checkpoints
(reference key surgery: inference_demo.py:29-97, model/mico.py:250-321):
  - `vision_encoder.visual.*`  : EVA ViT weights (fused qkv w/ q+v bias, or
    subln split q/k/v projections, eva_vit_model.py:239-251)
  - `multimodal_encoder.bert.*` + `multimodal_encoder.cls.*` : BERT branch
  - top-level MiCo heads / embeddings

Linear weights are transposed to (in, out); the conv patch embed becomes a
matmul kernel; pos-embeds / frame-embeds are resized here with the same
interpolation modes the reference uses.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from mico_tpu.config import BertConfig, EvaVitConfig
from mico_tpu.ops.interpolate import interp_bilinear_2d, interp_nearest_1d


Array = np.ndarray


def to_numpy(state_dict: Mapping) -> Dict[str, Array]:
    """Accepts torch tensors or numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def _t(w: Array) -> Array:
    """torch Linear weight (out, in) → (in, out)."""
    return np.ascontiguousarray(w.T)


class _TrackedDict(dict):
    """State-dict view that records every consumed key (getitem / get) into
    a shared set, re-prefixed with the original checkpoint prefix — the
    complete-consumption audit for released-layout checkpoints
    (tests/test_checkpoints.py::test_released_layout_manifest; the load path
    warns about leftovers so a silently-dropped tensor is impossible)."""

    def __init__(self, data, consumed=None, prefix=""):
        super().__init__(data)
        self._consumed = consumed
        self._prefix = prefix

    def __getitem__(self, k):
        if self._consumed is not None:
            self._consumed.add(self._prefix + k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if self._consumed is not None and super().__contains__(k):
            self._consumed.add(self._prefix + k)
        return super().get(k, default)


# ---------------------------------------------------------------------------
# EVA ViT
# ---------------------------------------------------------------------------


def resize_vit_pos_embed(pos: Array, new_grid: int) -> Array:
    """(1, old_grid**2+1, w) → (1, new_grid**2+1, w); CLS kept, patch grid
    bilinearly resized (reference: inference_demo.py:78-95)."""
    old_n = pos.shape[1] - 1
    old_grid = int(round(old_n**0.5))
    if old_grid == new_grid:
        return pos
    w = pos.shape[2]
    cls, rest = pos[:, :1], pos[:, 1:]
    grid = rest.reshape(old_grid, old_grid, w).transpose(2, 0, 1)[None]
    grid = np.asarray(interp_bilinear_2d(jnp.asarray(grid), (new_grid, new_grid)))
    rest = grid[0].transpose(1, 2, 0).reshape(1, new_grid * new_grid, w)
    return np.concatenate([cls, rest], axis=1)


def eva_vit_from_torch(
    sd: Mapping, cfg: EvaVitConfig, prefix: str = "", consumed=None
) -> dict:
    """Build the eva_vit param tree from a torch state_dict (already
    numpy-fied via `to_numpy`). `prefix` e.g. 'vision_encoder.visual.'."""
    sd = _TrackedDict(
        {k[len(prefix):]: v for k, v in to_numpy(sd).items()
         if k.startswith(prefix)},
        consumed, prefix,
    )
    d, w = cfg.layers, cfg.width

    conv = sd["patch_embed.proj.weight"]  # (w, 3, p, p)
    kernel = conv.reshape(w, -1).T        # ((c,dy,dx), w)

    pos = resize_vit_pos_embed(sd["pos_embed"], cfg.grid_size)

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(
            np.stack([transform(sd[fmt.format(i)]) for i in range(d)])
        )

    blocks = {
        "norm1_w": stack("blocks.{}.norm1.weight"),
        "norm1_b": stack("blocks.{}.norm1.bias"),
        "norm2_w": stack("blocks.{}.norm2.weight"),
        "norm2_b": stack("blocks.{}.norm2.bias"),
        "proj_w": stack("blocks.{}.attn.proj.weight", _t),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
    }

    if f"blocks.0.attn.qkv.weight" in sd:
        blocks["qkv_w"] = stack("blocks.{}.attn.qkv.weight", _t)
    else:  # subln: separate q/k/v projections — pack to fused layout
        blocks["qkv_w"] = jnp.asarray(
            np.stack(
                [
                    np.concatenate(
                        [
                            _t(sd[f"blocks.{i}.attn.q_proj.weight"]),
                            _t(sd[f"blocks.{i}.attn.k_proj.weight"]),
                            _t(sd[f"blocks.{i}.attn.v_proj.weight"]),
                        ],
                        axis=1,
                    )
                    for i in range(d)
                ]
            )
        )
    if "blocks.0.attn.q_bias" in sd:
        blocks["q_bias"] = stack("blocks.{}.attn.q_bias")
        blocks["v_bias"] = stack("blocks.{}.attn.v_bias")
    else:
        blocks["q_bias"] = jnp.zeros((d, w))
        blocks["v_bias"] = jnp.zeros((d, w))

    if "blocks.0.mlp.w1.weight" in sd:  # SwiGLU
        blocks.update(
            w1_w=stack("blocks.{}.mlp.w1.weight", _t),
            w1_b=stack("blocks.{}.mlp.w1.bias"),
            w2_w=stack("blocks.{}.mlp.w2.weight", _t),
            w2_b=stack("blocks.{}.mlp.w2.bias"),
            w3_w=stack("blocks.{}.mlp.w3.weight", _t),
            w3_b=stack("blocks.{}.mlp.w3.bias"),
        )
    else:
        blocks.update(
            fc1_w=stack("blocks.{}.mlp.fc1.weight", _t),
            fc1_b=stack("blocks.{}.mlp.fc1.bias"),
            fc2_w=stack("blocks.{}.mlp.fc2.weight", _t),
            fc2_b=stack("blocks.{}.mlp.fc2.bias"),
        )
    if "blocks.0.mlp.ffn_ln.weight" in sd:
        blocks.update(
            ffn_ln_w=stack("blocks.{}.mlp.ffn_ln.weight"),
            ffn_ln_b=stack("blocks.{}.mlp.ffn_ln.bias"),
        )
    if "blocks.0.attn.inner_attn_ln.weight" in sd:
        blocks.update(
            inner_attn_ln_w=stack("blocks.{}.attn.inner_attn_ln.weight"),
            inner_attn_ln_b=stack("blocks.{}.attn.inner_attn_ln.bias"),
        )
    if "blocks.0.gamma_1" in sd:
        blocks["gamma_1"] = stack("blocks.{}.gamma_1")
        blocks["gamma_2"] = stack("blocks.{}.gamma_2")
    if "blocks.0.attn.relative_position_bias_table" in sd:
        blocks["rel_pos_bias_table"] = stack(
            "blocks.{}.attn.relative_position_bias_table"
        )

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(pos),
        "blocks": blocks,
        "norm_w": jnp.asarray(sd["norm.weight"]),
        "norm_b": jnp.asarray(sd["norm.bias"]),
    }
    if "rel_pos_bias.relative_position_bias_table" in sd:
        params["rel_pos_bias_table"] = jnp.asarray(
            sd["rel_pos_bias.relative_position_bias_table"]
        )
    if "head.weight" in sd:
        params["head"] = {
            "kernel": jnp.asarray(_t(sd["head.weight"])),
            "bias": jnp.asarray(sd["head.bias"]),
        }
    return params


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------


def bert_from_torch(sd: Mapping, cfg: BertConfig, prefix: str = "",
                    consumed=None) -> dict:
    """Build the bert param tree from `multimodal_encoder.*` keys
    (HF-style: bert.embeddings.*, bert.encoder.layer.{i}.*, cls.predictions.*)."""
    sd = _TrackedDict(
        {k[len(prefix):]: v for k, v in to_numpy(sd).items()
         if k.startswith(prefix)},
        consumed, prefix,
    )
    d = cfg.num_hidden_layers

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(
            np.stack([transform(sd[fmt.format(i)]) for i in range(d)])
        )

    layers = {
        "q_w": stack("bert.encoder.layer.{}.attention.self.query.weight", _t),
        "q_b": stack("bert.encoder.layer.{}.attention.self.query.bias"),
        "k_w": stack("bert.encoder.layer.{}.attention.self.key.weight", _t),
        "k_b": stack("bert.encoder.layer.{}.attention.self.key.bias"),
        "v_w": stack("bert.encoder.layer.{}.attention.self.value.weight", _t),
        "v_b": stack("bert.encoder.layer.{}.attention.self.value.bias"),
        "attn_out_w": stack("bert.encoder.layer.{}.attention.output.dense.weight", _t),
        "attn_out_b": stack("bert.encoder.layer.{}.attention.output.dense.bias"),
        "attn_ln_w": stack("bert.encoder.layer.{}.attention.output.LayerNorm.weight"),
        "attn_ln_b": stack("bert.encoder.layer.{}.attention.output.LayerNorm.bias"),
        "inter_w": stack("bert.encoder.layer.{}.intermediate.dense.weight", _t),
        "inter_b": stack("bert.encoder.layer.{}.intermediate.dense.bias"),
        "out_w": stack("bert.encoder.layer.{}.output.dense.weight", _t),
        "out_b": stack("bert.encoder.layer.{}.output.dense.bias"),
        "out_ln_w": stack("bert.encoder.layer.{}.output.LayerNorm.weight"),
        "out_ln_b": stack("bert.encoder.layer.{}.output.LayerNorm.bias"),
    }
    if cfg.add_cross_attention:
        layers.update(
            xq_w=stack("bert.encoder.layer.{}.crossattention.self.query.weight", _t),
            xq_b=stack("bert.encoder.layer.{}.crossattention.self.query.bias"),
            xk_w=stack("bert.encoder.layer.{}.crossattention.self.key.weight", _t),
            xk_b=stack("bert.encoder.layer.{}.crossattention.self.key.bias"),
            xv_w=stack("bert.encoder.layer.{}.crossattention.self.value.weight", _t),
            xv_b=stack("bert.encoder.layer.{}.crossattention.self.value.bias"),
            x_out_w=stack("bert.encoder.layer.{}.crossattention.output.dense.weight", _t),
            x_out_b=stack("bert.encoder.layer.{}.crossattention.output.dense.bias"),
            x_ln_w=stack("bert.encoder.layer.{}.crossattention.output.LayerNorm.weight"),
            x_ln_b=stack("bert.encoder.layer.{}.crossattention.output.LayerNorm.bias"),
        )

    params = {
        "embeddings": {
            "word": jnp.asarray(sd["bert.embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd["bert.embeddings.position_embeddings.weight"]),
            "token_type": jnp.asarray(sd["bert.embeddings.token_type_embeddings.weight"]),
            "ln_w": jnp.asarray(sd["bert.embeddings.LayerNorm.weight"]),
            "ln_b": jnp.asarray(sd["bert.embeddings.LayerNorm.bias"]),
        },
        "layers": layers,
    }
    if "cls.predictions.transform.dense.weight" in sd:
        decoder_w = sd.get(
            "cls.predictions.decoder.weight",
            sd["bert.embeddings.word_embeddings.weight"],  # tied weights
        )
        params["mlm_head"] = {
            "dense_w": jnp.asarray(_t(sd["cls.predictions.transform.dense.weight"])),
            "dense_b": jnp.asarray(sd["cls.predictions.transform.dense.bias"]),
            "ln_w": jnp.asarray(sd["cls.predictions.transform.LayerNorm.weight"]),
            "ln_b": jnp.asarray(sd["cls.predictions.transform.LayerNorm.bias"]),
            "decoder_w": jnp.asarray(_t(decoder_w)),
            "decoder_b": jnp.asarray(sd["cls.predictions.bias"]),
        }
    return params


# ---------------------------------------------------------------------------
# Frame embeddings (nearest-1D resize, reference inference_demo.py:42-59)
# ---------------------------------------------------------------------------


def resize_frame_embedding(emb: Array, target_n: int) -> Array:
    """(1, n, c) → (1, target_n, c) via torch-nearest over the frame axis."""
    if emb.shape[1] == target_n:
        return emb
    x = jnp.asarray(emb).transpose(0, 2, 1)       # (1, c, n)
    x = interp_nearest_1d(x, target_n)
    return np.asarray(x.transpose(0, 2, 1))
