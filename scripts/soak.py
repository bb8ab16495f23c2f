"""Sustained-training soak through the FULL runtime (round-4 VERDICT #3).

Everything else tests <=4 steps; this drives `python -m mico_tpu.run` for
hundreds of steps of the production omni-modal mix over a real generated
corpus (MetaLoader task sampling, periodic eval + orbax save cadence),
SIGKILLs the process mid-run, resumes with `run_cfg.resume=true`, and then
audits the logs:

  - per-task loss curves (EMA meters) — descending, finite
  - step-time stability (compile churn / host starvation / leaks show up
    as trends or spikes in the per-step deltas)
  - the resume seam: step numbering, loss level, and LR-schedule continuity

Reference loop being soaked: data/utils/pipeline.py:17-143.

Usage:
  python scripts/soak.py --steps 600 --kill-at 300            # real chip
  python scripts/soak.py --tiny --steps 12 --kill-at 6        # CPU smoke
Writes <out>/SOAK.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = "/root/reference/model/tokenizer/vocab.txt"

STEP_RE = re.compile(r"step (\d+)/(\d+) \(([\d.]+) s\): (.*)")
METER_RE = re.compile(r"(\S+/\S+): ([-\d.na]+)")


def make_corpus(root: str, n: int, tiny: bool, seed: int = 0):
    """Images (4-frame jpg dirs), wavs, depth maps, captions/subtitles/QA —
    the full omni anno corpus the tid/tvas/tva mix needs."""
    import wave as wave_mod

    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    hw = (40, 44) if tiny else (224, 224)
    seconds = 0.5 if tiny else 6.0
    annos = []
    objects = ("cat", "dog", "car", "tree", "boat", "bird", "chair", "lamp")
    for i in range(n):
        fdir = os.path.join(root, "frames", f"v{i}")
        os.makedirs(fdir, exist_ok=True)
        for k in range(4):
            cv2.imwrite(
                os.path.join(fdir, f"f{k:02d}.jpg"),
                rng.integers(0, 255, (*hw, 3), dtype=np.uint8),
            )
        for k in range(4):
            cv2.imwrite(
                os.path.join(root, "depth", f"v{i}_{k}.png"),
                rng.integers(0, 255, hw, dtype=np.uint8),
            )
        w = (rng.standard_normal(int(16000 * seconds)) * 0.1).clip(-1, 1)
        with wave_mod.open(os.path.join(root, "wav", f"v{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((w * 32767).astype(np.int16).tobytes())
        obj = objects[i % len(objects)]
        annos.append({
            "video_id": f"v{i}",
            "caption": f"a {obj} in scene number {i}",
            "subtitle": f"someone talks about the {obj}",
            "question": "what object is shown",
            "answer": obj,
        })
    with open(os.path.join(root, "annos.json"), "w") as f:
        json.dump(annos, f)


def make_config(root: str, args) -> str:
    d = {
        "txt": os.path.join(root, "annos.json"),
        "vision": os.path.join(root, "frames"),
        "audio": os.path.join(root, "wav"),
        "depth": os.path.join(root, "depth"),
        "vision_format": "video_frame",
        "vision_sample_num": 4,
        "audio_sample_num": 2,
        "depth_sample_num": 4,
        "n_workers": args.workers,
        "type": "annoindexed",
    }
    if args.tiny:
        model_cfg = {
            "vision_resolution": 28, "vision_encoder_type": "evaclip01_giant",
            "audio_melbins": 28, "audio_target_length": 28,
            "audio_encoder_type": "beats", "max_caption_len": 8,
            "beam_size": 2, "compute_dtype": "float32",
            "use_flash_attention": False,
            "max_vision_sample_num": 4, "max_audio_sample_num": 2,
            "max_depth_sample_num": 4,
            "eva_override": {
                "image_size": 28, "patch_size": 14, "layers": 2, "width": 64,
                "head_width": 32, "embed_dim": 64,
            },
            "bert_override": {
                "hidden_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 2, "intermediate_size": 128,
                "encoder_width": 64,
            },
        }
    else:
        # the production flagship: ViT-g + BERT-base, bf16 params (fp32
        # params + moments for 1.3B exceed single-chip HBM — BASELINE
        # round-4 mix account). checkpointing (per-block remat) is
        # REQUIRED at this scale: without it the omni tid mix allocates
        # ~200G of layer-stacked activations vs 15.75G HBM.
        model_cfg = {
            "vision_resolution": 224,
            "vision_encoder_type": "evaclip01_giant",
            "audio_melbins": 64, "audio_target_length": 1024,
            "audio_encoder_type": "beats",
            "compute_dtype": "bfloat16",
            "checkpointing": True,
            "max_vision_sample_num": 4, "max_audio_sample_num": 2,
            "max_depth_sample_num": 4,
        }
    cfg = {
        "run_cfg": {
            "seed": 0,
            "num_train_steps": args.steps,
            "valid_steps": args.valid_steps,
            "log_every": 1,
            "learning_rate": 1e-4,
            "checkpoint_backend": "orbax",
            **({"platform": "cpu"} if args.tiny else
               {"param_dtype": "bfloat16"}),
        },
        "model_cfg": model_cfg,
        "data_cfg": {
            "train": [{**d, "name": "soak", "task": args.task,
                       "training": True, "batch_size": args.batch,
                       "steps": args.steps}],
            "val": [{**d, "name": "soak", "task": "ret%tva",
                     "training": False, "batch_size": args.val_batch,
                     "n_workers": args.workers}],
        },
    }
    path = os.path.join(root, "soak_config.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=1)
    return path


def launch(cfg_path: str, out_dir: str, log_path: str, resume: bool):
    env = dict(os.environ)
    # APPEND to PYTHONPATH: the TPU plugin registers via a sitecustomize
    # dir already on it (clobbering it leaves JAX_PLATFORMS pointing at an
    # unregistered backend)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    # persistent executable cache: the resume phase replays the same
    # compiles (3 task groups + eval fns, ~10 min each on ViT-g) for free
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(log_path), "jax_cache"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
    cmd = [
        sys.executable, "-m", "mico_tpu.run",
        "--config", cfg_path, "--output_dir", out_dir, "--vocab", VOCAB,
    ]
    if resume:
        cmd.append("run_cfg.resume=true")
    logf = open(log_path, "ab")
    return subprocess.Popen(
        cmd, stdout=logf, stderr=subprocess.STDOUT, env=env, cwd=REPO
    ), logf


def watch_until(proc, log_path: str, kill_at: int | None, deadline_s: float):
    """Poll the log; if kill_at is set, SIGKILL the run once that step is
    logged (mid-run crash injection). Returns ('killed'|'exit', last_step)."""
    t0 = time.time()
    last = 0
    while True:
        if os.path.exists(log_path):
            with open(log_path, "rb") as f:
                txt = f.read().decode("utf-8", "replace")
            for m in STEP_RE.finditer(txt):
                last = max(last, int(m.group(1)))
            if kill_at is not None and last >= kill_at:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return "killed", last
        if proc.poll() is not None:
            return "exit", last
        if time.time() - t0 > deadline_s:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            raise TimeoutError(
                f"soak run exceeded {deadline_s}s (last step {last})"
            )
        time.sleep(5)


def parse_log(log_path: str):
    """→ list of {step, t, meters{name: val}} per logged step."""
    steps = []
    with open(log_path, "rb") as f:
        for ln in f.read().decode("utf-8", "replace").splitlines():
            m = STEP_RE.search(ln)
            if not m:
                continue
            meters = {
                k: float(v) for k, v in METER_RE.findall(m.group(4))
                if v not in ("nan", "na")
            }
            steps.append(
                {"step": int(m.group(1)), "t": float(m.group(3)),
                 "meters": meters}
            )
    return steps


def audit(first, second, kill_at, args):
    """Build the soak report from both phases' parsed logs."""
    report = {"config": {
        "steps": args.steps, "kill_at": kill_at, "task": args.task,
        "batch": args.batch, "tiny": args.tiny,
    }}
    # per-step wall deltas within each phase (t is cumulative per process)
    def deltas(steps):
        out = []
        for a, b in zip(steps, steps[1:]):
            if b["step"] == a["step"] + 1:
                out.append((b["step"], b["t"] - a["t"]))
        return out

    d1, d2 = deltas(first), deltas(second)
    # steady state excludes each phase's first 3 deltas (compile / warmup);
    # steps on the valid_steps cadence carry eval+save and are reported
    # separately (the step AFTER an eval boundary absorbs the eval wall)
    vs = args.valid_steps
    pure, evalb = [], []
    for s, d in d1[3:] + d2[3:]:
        (evalb if (s % vs == 0 or (s - 1) % vs == 0) else pure).append(d)
    if pure:
        import numpy as np

        arr = np.asarray(pure)
        half = len(arr) // 2
        report["step_time"] = {
            "mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
            "p95_s": float(np.percentile(arr, 95)), "max_s": float(arr.max()),
            "first_half_mean_s": float(arr[:half].mean()) if half else None,
            "second_half_mean_s": float(arr[half:].mean()) if half else None,
            "n": int(arr.size),
            "eval_boundary_mean_s": float(np.mean(evalb)) if evalb else None,
            "n_eval_boundary": len(evalb),
        }
    # loss curves: meter values at sampled steps
    curve = {}
    for rec in first + second:
        for k, v in rec["meters"].items():
            curve.setdefault(k, []).append([rec["step"], v])
    report["loss_curves"] = {
        k: v[:: max(1, len(v) // 50)] for k, v in curve.items()
    }
    # resume seam: last pre-kill vs first post-resume loss_total per task
    seam = {}
    pre = {k: v for rec in first for k, v in rec["meters"].items()
           if k.endswith("loss_total")}
    for rec in second:
        for k, v in rec["meters"].items():
            if k.endswith("loss_total") and k in pre and k not in seam:
                seam[k] = {"pre_kill_ema": pre[k], "post_resume": v,
                           "rel_jump": abs(v - pre[k]) / max(abs(pre[k]), 1e-9)}
    report["resume_seam"] = seam
    report["first_phase_last_step"] = first[-1]["step"] if first else 0
    report["second_phase_last_step"] = second[-1]["step"] if second else 0
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mico_soak")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--kill-at", type=int, default=None,
                    help="SIGKILL the run at this step, then resume "
                         "(default steps//2)")
    ap.add_argument("--valid-steps", type=int, default=None,
                    help="eval+save cadence (default steps//5)")
    ap.add_argument("--task", default="ret%tva%tid_cap%tvas_qa%tva")
    # b8: the ret%tva%tid group runs the ViT-g tower on vision AND depth
    # (2x the bench mix's vision bytes) — b16 is the no-depth mix ceiling
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--val-batch", type=int, default=8)
    ap.add_argument("--corpus-items", type=int, default=128)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode (tiny model, driver self-test)")
    ap.add_argument("--deadline", type=float, default=4 * 3600)
    args = ap.parse_args()
    kill_at = args.kill_at if args.kill_at is not None else args.steps // 2
    if args.valid_steps is None:
        args.valid_steps = max(1, args.steps // 5)

    os.makedirs(args.out, exist_ok=True)
    corpus = os.path.join(args.out, "corpus")
    if not os.path.exists(os.path.join(corpus, "annos.json")):
        print("generating corpus ...", flush=True)
        make_corpus(corpus, args.corpus_items, args.tiny)
    cfg_path = make_config(corpus, args)
    out_dir = os.path.join(args.out, "run")
    log1 = os.path.join(args.out, "phase1.log")
    log2 = os.path.join(args.out, "phase2.log")
    for p in (log1, log2):
        if os.path.exists(p):
            os.unlink(p)

    print(f"phase 1: train to step {kill_at} then SIGKILL", flush=True)
    proc, lf = launch(cfg_path, out_dir, log1, resume=False)
    how, last = watch_until(proc, log1, kill_at, args.deadline)
    lf.close()
    print(f"phase 1 done ({how} at step {last})", flush=True)

    print("phase 2: resume to completion", flush=True)
    proc, lf = launch(cfg_path, out_dir, log2, resume=True)
    how2, last2 = watch_until(proc, log2, None, args.deadline)
    lf.close()
    rc = proc.returncode
    print(f"phase 2 done (rc={rc}, last step {last2})", flush=True)

    first, second = parse_log(log1), parse_log(log2)
    report = audit(first, second, kill_at, args)
    report["phase2_rc"] = rc
    report["resumed_from"] = second[0]["step"] - 1 if second else None
    ok = (
        rc == 0
        and report["second_phase_last_step"] >= args.steps
        and bool(second)
        and second[0]["step"] > kill_at - args.valid_steps
    )
    report["ok"] = ok
    with open(os.path.join(args.out, "SOAK.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "loss_curves"}, indent=1))
    print("full report:", os.path.join(args.out, "SOAK.json"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
