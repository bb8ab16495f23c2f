"""Config system, checkpoint save/resume, and the end-to-end pretrained-dir
load path (hps.json + ckpt/model_step_N) with a native checkpoint."""

import json
import os

import jax
import numpy as np
import pytest

from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
from mico_tpu.models.mico import MiCoModel, init_mico
from mico_tpu.train.checkpoints import (
    ModelSaver,
    load_from_pretrained_dir,
    load_pytree_npz,
    resume_latest,
    save_pytree_npz,
)
from mico_tpu.utils.config_io import (
    apply_cli_overrides,
    derive_sample_nums,
    dump_hps,
    load_layered_config,
)

TINY = dict(
    eva_override=EvaVitConfig(
        image_size=28, patch_size=14, layers=2, width=32, head_width=16,
        mlp_ratio=4.0, embed_dim=16,
    ),
    bert_override=BertConfig(
        vocab_size=500, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, encoder_width=32,
    ),
    contra_dim=16, compute_dtype="float32", use_flash_attention=False,
)


def test_layered_config_merge_and_cli(tmp_path):
    exp = {
        "run_cfg": {"learning_rate": 3e-5},
        "data_cfg": {
            "train": [
                {"vision_sample_num": 4, "audio_sample_num": 2},
                {"vision_sample_num": 2, "concatenated_nums": 3},
            ]
        },
    }
    p = tmp_path / "exp.json"
    p.write_text(json.dumps(exp))
    cfg = load_layered_config(
        str(p), argv=["run_cfg.seed=7", "--model_cfg.beam_size", "5"]
    )
    assert cfg.run_cfg.learning_rate == 3e-5          # experiment override
    assert cfg.run_cfg.weight_decay == 0.01           # default survives
    assert cfg.run_cfg.seed == 7                      # cli override
    assert cfg.model_cfg.beam_size == 5
    assert cfg.model_cfg.max_vision_sample_num == 6   # 2*3 concatenated
    assert cfg.model_cfg.max_audio_sample_num == 2
    assert cfg.run_cfg.fp16 is False                  # bf16 wins


def test_checkpointing_rule():
    cfg = load_layered_config(argv=["model_cfg.checkpointing=true"])
    assert cfg.run_cfg.use_ddp is False


def test_pytree_npz_roundtrip(tmp_path):
    cfg = MiCoConfig(**TINY)
    params = init_mico(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "p.npz")
    save_pytree_npz(path, params)
    back = load_pytree_npz(path)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_saver_resume_and_pretrained_dir(tmp_path):
    out = str(tmp_path / "run")
    cfg = MiCoConfig(**TINY)
    params = init_mico(jax.random.PRNGKey(1), cfg)

    saver = ModelSaver(out)
    saver.save(10, params)
    saver.save(20, params)
    # remove_before_ckpt: only latest remains
    files = os.listdir(os.path.join(out, "ckpt"))
    assert files == ["model_step_20.npz"]

    p, _, step = resume_latest(out)
    assert step == 20 and p is not None

    # hps.json + load_from_pretrained_dir (the inference-demo path)
    dump_hps({"model_cfg": {"contra_dim": 16, "vision_encoder_type": "evaclip01_giant"}}, out)
    params2, cfg2 = load_from_pretrained_dir(
        out,
        config_overrides=dict(
            eva_override=TINY["eva_override"],
            bert_override=TINY["bert_override"],
            compute_dtype="float32",
            use_flash_attention=False,
        ),
    )
    assert cfg2.contra_dim == 16
    model = MiCoModel(params2, cfg2)
    x = np.random.default_rng(0).standard_normal((1, 1, 3, 28, 28)).astype(np.float32)
    import jax.numpy as jnp

    outv = model.forward_vision_encoder(jnp.asarray(x))
    assert outv.shape == (1, 1, 5, 32)


def test_hf_trainer_sharded_checkpoint(tmp_path):
    """HF-trainer layout: checkpoint-N/pytorch_model-*-of-*.bin shards
    merged, newest step picked (reference build_model.py:65-88)."""
    import torch

    from mico_tpu.train.checkpoints import _hf_trainer_state_dict

    old = tmp_path / "checkpoint-100"
    old.mkdir()
    torch.save({"a": torch.zeros(1)}, old / "pytorch_model.bin")
    new = tmp_path / "checkpoint-200"
    new.mkdir()
    torch.save(
        {"a": torch.ones(2)}, new / "pytorch_model-00001-of-00002.bin"
    )
    torch.save(
        {"b": torch.full((3,), 2.0)}, new / "pytorch_model-00002-of-00002.bin"
    )
    sd = _hf_trainer_state_dict(str(tmp_path))
    assert set(sd) == {"a", "b"}
    assert sd["a"].shape == (2,)  # newest step won
    assert _hf_trainer_state_dict(str(tmp_path / "nope")) is None


def test_return_modal_filter(tmp_path):
    """return_modal sub-checkpoint extraction (inference_demo.py:99-112):
    'uni' = vision tower, 'text' = BERT interface."""
    import jax

    from mico_tpu.config import BertConfig, EvaVitConfig, mico_config_from_dict
    from mico_tpu.models.mico import init_mico
    from mico_tpu.train.checkpoints import ModelSaver, load_from_pretrained_dir

    model_cfg = {
        "eva_override": {"image_size": 28, "patch_size": 14, "layers": 1,
                         "width": 32, "head_width": 16, "embed_dim": 16},
        "bert_override": {"hidden_size": 32, "num_hidden_layers": 1,
                          "num_attention_heads": 2, "intermediate_size": 64,
                          "encoder_width": 32},
        "contra_dim": 16, "compute_dtype": "float32",
        "use_flash_attention": False,
    }
    import json

    pre = tmp_path / "dir"
    (pre / "log").mkdir(parents=True)
    (pre / "log" / "hps.json").write_text(json.dumps({"model_cfg": model_cfg}))
    cfg = mico_config_from_dict(model_cfg)
    ModelSaver(str(pre)).save(1, init_mico(jax.random.PRNGKey(0), cfg))

    full, _ = load_from_pretrained_dir(str(pre), video_resolution=28,
                                       config_overrides=model_cfg)
    uni, _ = load_from_pretrained_dir(str(pre), video_resolution=28,
                                      config_overrides=model_cfg,
                                      return_modal="uni")
    text, _ = load_from_pretrained_dir(str(pre), video_resolution=28,
                                       config_overrides=model_cfg,
                                       return_modal="text")
    assert "blocks" in uni and "contra_head_v" not in uni
    assert "layers" in text and "vision_encoder" not in text
    np.testing.assert_array_equal(
        np.asarray(full["vision_encoder"]["cls_token"]),
        np.asarray(uni["cls_token"]),
    )


def test_orbax_backend_roundtrip(tmp_path):
    """orbax async checkpoint backend: save -> resume round-trip."""
    import jax
    import jax.numpy as jnp

    from mico_tpu.train.checkpoints import ModelSaver, resume_latest

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    saver = ModelSaver(str(tmp_path), backend="orbax")
    saver.save(7, params)
    saver.wait()
    got, _, step = resume_latest(str(tmp_path))
    assert step == 7
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(
        np.asarray(got["b"]["c"]), np.asarray(params["b"]["c"])
    )
    # second save removes the previous one
    saver.save(9, params)
    saver.wait()
    import os

    names = os.listdir(tmp_path / "ckpt")
    assert any("model_step_9" in n for n in names)
    assert not any("model_step_7" in n for n in names)


def test_released_layout_manifest():
    """Complete-consumption audit of the released MiCo-ViT-g-14 layout
    (round-2 VERDICT item 8): the vendored key+shape manifest was dumped
    from the reference MiCo(opts).state_dict() (model/mico.py:374-423 +
    eva_vit_model.py:488-659 + bert.py; CLIP text tower dropped as
    from_pretrained deletes it, model/mico.py:419). The converter must
    (a) consume every checkpoint tensor except the known non-weights, and
    (b) initialize every leaf of the param tree from the checkpoint — no
    silent drops in either direction."""
    import json

    import numpy as np

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models.mico import init_mico, mico_from_torch
    from mico_tpu.train.checkpoints import flatten_pytree

    with open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "mico_vit_g_manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest) == 897

    sd = {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}
    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant", contra_dim=512,
        max_vision_sample_num=4, max_audio_sample_num=2,
        max_depth_sample_num=2,
    )
    consumed = set()
    params = mico_from_torch(sd, cfg, consumed=consumed)

    # (a) every checkpoint tensor consumed, except known non-weights:
    #     - HF position_ids buffer (not a parameter)
    #     - tied decoder bias (cls.predictions.bias is the live copy)
    #     - CustomCLIP logit_scale (MiCo uses its own contra_temp;
    #       reference never reads vision_encoder.logit_scale)
    expected_leftover = {
        "multimodal_encoder.bert.embeddings.position_ids",
        "multimodal_encoder.cls.predictions.decoder.bias",
        "vision_encoder.logit_scale",
    }
    leftover = set(manifest) - consumed
    assert leftover == expected_leftover, (
        f"unconsumed: {sorted(leftover - expected_leftover)[:10]} / "
        f"over-expected: {sorted(expected_leftover - leftover)}"
    )

    # (b) the converted tree has exactly the leaves a fresh init has —
    #     nothing silently left at random init
    got = set(flatten_pytree(params))
    want = set(flatten_pytree(init_mico(jax.random.PRNGKey(0), cfg)))
    assert got == want, (
        f"missing: {sorted(want - got)[:10]} extra: {sorted(got - want)[:10]}"
    )

    # shapes survive the conversion round trip
    flat = flatten_pytree(params)
    assert flat["vision_encoder/blocks/qkv_w"].shape == (40, 1408, 3 * 1408)
    assert flat["bert/embeddings/word"].shape == (30522, 768)


def test_sharded_save_restore_under_mesh(tmp_path):
    """Sharding-aware checkpointing (round-3 VERDICT item 2): save a
    mesh-sharded train state (Megatron TP over `model` + ZeRO-1 moments
    over `data`) through the orbax backend WITHOUT a host gather, restore
    it via NamedSharding abstract targets (each device reads only its
    shard), and assert (a) restored shardings match the originals, (b)
    values are bit-exact, (c) a train step from the restored state equals
    a step from the never-saved state. Reference resume contract at
    sharded scale: data/utils/save.py:9-41, build_model.py:106-124."""
    import jax.numpy as jnp

    from mico_tpu.parallel.mesh import create_mesh
    from mico_tpu.train.checkpoints import resume_latest_sharded
    from mico_tpu.train.optim import OptimConfig, build_optimizer
    from mico_tpu.train.train_step import (
        make_train_step,
        shard_train_state,
        train_state_shardings,
    )

    cfg = MiCoConfig(**TINY, max_vision_sample_num=1)
    mesh = create_mesh(data=4, model=2)
    params = init_mico(jax.random.PRNGKey(0), cfg)
    opt = build_optimizer(params, OptimConfig(num_train_steps=100))
    opt_state = opt.init(params)
    params, opt_state = shard_train_state(
        mesh, params, opt_state, model_axis="model", zero1=True
    )

    saver = ModelSaver(str(tmp_path), backend="orbax")
    saver.save(5, params, opt_state)
    saver.wait()

    abstract_p = jax.eval_shape(lambda: init_mico(jax.random.PRNGKey(0), cfg))
    abstract_o = jax.eval_shape(opt.init, abstract_p)
    p_sh, o_sh = train_state_shardings(
        mesh, abstract_p, abstract_o, model_axis="model", zero1=True
    )
    got_p, got_o, step = resume_latest_sharded(
        str(tmp_path), abstract_p, p_sh, abstract_o, o_sh
    )
    assert step == 5
    jax.tree.map(
        lambda a, b: (
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            # restored leaves live on the mesh with the original layout
            (a.sharding == b.sharding
             or (_ for _ in ()).throw(AssertionError((a.sharding, b.sharding)))),
        ),
        got_p, params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        got_o, opt_state,
    )

    # loss continuity: one step from restored == one step from live state
    rng = np.random.default_rng(0)
    batch = {
        "vision_pixels": jnp.asarray(
            rng.standard_normal((8, 1, 3, 28, 28)), jnp.float32
        ),
        "caption_ids": jnp.asarray(
            rng.integers(200, 400, (8, 12)), jnp.int32
        ).at[:, 0].set(101),
        "caption_mask": jnp.ones((8, 12), jnp.int32),
    }
    step_fn = make_train_step(cfg, opt, "cap%tv", donate=False)
    key = jax.random.PRNGKey(3)
    _, _, l_live = step_fn(params, opt_state, batch, key)
    _, _, l_got = step_fn(got_p, got_o, batch, key)
    assert float(l_live["loss_total"]) == float(l_got["loss_total"])


def test_torch_optimizer_resume_layout_manifest():
    """Optimizer-resume layout audit (round-3 VERDICT next #8): replay the
    reference's AdamW grouping over the released-layout manifest
    (build_optimizer.py:15-62), synthesize the torch
    `optimizer_step_*.pt` state_dict it would save (per-param
    step/exp_avg/exp_avg_sq keyed by global group position,
    build_optimizer.py:105-140 + save.py:41), and check
    `optimizer_moments_from_torch` lands every moment tensor on exactly
    the leaf the weight converter gives its parameter — full consumption,
    no silent drops, tied params resolved to their live slot."""
    import json

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models.mico import mico_from_torch
    from mico_tpu.train.checkpoints import (
        _TORCH_BUFFERS,
        _TORCH_TIED,
        flatten_pytree,
        optimizer_moments_from_torch,
        torch_adamw_param_index,
    )

    with open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "mico_vit_g_manifest.json")) as f:
        manifest = json.load(f)

    named_keys = [
        k for k in manifest
        if k not in _TORCH_TIED and k not in _TORCH_BUFFERS
    ]
    assert len(named_keys) == 897 - 3

    index = torch_adamw_param_index(named_keys)
    # dense 0..n-1, and the reference group order: every non-'visual' key
    # indexes before every 'visual' (clip-lr) key
    assert sorted(index.values()) == list(range(len(named_keys)))
    max_basic = max(i for k, i in index.items() if "visual" not in k)
    min_clip = min(i for k, i in index.items() if "visual" in k)
    assert max_basic < min_clip

    # distinct sentinel per parameter (tied names share their live value)
    val = {k: float(i + 1) for i, k in enumerate(manifest)}
    for tied, live in _TORCH_TIED.items():
        val[tied] = val[live]

    def weight_sd(offset):
        return {
            k: np.full(shape, val[k] + offset, np.float32)
            for k, shape in manifest.items()
        }

    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant", contra_dim=512,
        max_vision_sample_num=4, max_audio_sample_num=2,
        max_depth_sample_num=2,
    )
    want_avg = flatten_pytree(mico_from_torch(weight_sd(0.0), cfg))
    want_sq = flatten_pytree(mico_from_torch(weight_sd(0.25), cfg))

    state = {
        index[k]: {
            "step": 300000,
            "exp_avg": np.full(manifest[k], val[k], np.float32),
            "exp_avg_sq": np.full(manifest[k], val[k] + 0.25, np.float32),
        }
        for k in named_keys
    }
    opt_sd = {"state": state, "param_groups": []}
    avg, sq, step = optimizer_moments_from_torch(opt_sd, named_keys, cfg)
    assert step == 300000
    got_avg = flatten_pytree(avg)
    got_sq = flatten_pytree(sq)
    assert set(got_avg) == set(want_avg)
    for k in want_avg:
        np.testing.assert_array_equal(got_avg[k], want_avg[k], err_msg=k)
        np.testing.assert_array_equal(got_sq[k], want_sq[k], err_msg=k)
