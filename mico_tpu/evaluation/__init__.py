"""Evaluation registry: the `evaluation_mm` package the reference imports but
does not ship (data/utils/pipeline.py:9 imports
`from evaluation import evaluation_registry`; no such package exists in the
repo). The call shape is reconstructed from its call sites:

    evaluate_fn = evaluation_registry[model_cfg.evaluation_type]
    eval_log = evaluate_fn(model, val_loaders, args, global_step)
    # → {loader_name: {metric: value}}, metrics incl. CIDEr / accuracy /
    #   video_r1 (best-metric tracking, data/utils/pipeline.py:168-179)

Tasks per loader name "task--dataset" (data/model/vast.py:317-371):
  ret%XX  — contrastive retrieval recall (t2v/v2t r1/5/10) per subtask
  cap%XX  — caption generation + BLEU-4/CIDEr-D; captioner_mode emits
            generate_nums top-k samples per clip instead of scoring
            (data/model/vast.py:521-553)
  qa%XX   — beam-decoded short answers + VQA accuracy
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import MiCoConfig
from mico_tpu.data.tokenize_collate import BatchTokenizer
from mico_tpu.evaluation.metrics import (
    bleu4,
    cider_d,
    retrieval_recall,
    vqa_accuracy,
)
from mico_tpu.generation import generate, generate_answers
from mico_tpu.models import mico as mico_mod
from mico_tpu.train.objectives import compute_features, compute_text_feature
from mico_tpu.utils.logger import LOGGER


def _subtasks(task: str):
    parts = task.split("%")
    return parts[0], parts[1:]


def _localize(x):
    """Eval runs PER PROCESS on its own loader shard (the reference's
    per-rank eval; outputs are merged afterwards via gather_objects). A
    multi-host training run hands the Evaluator GLOBAL mesh arrays — bring
    each leaf onto this process's devices so the eval jits stay local:
    fully-replicated leaves read their local replica; model-sharded leaves
    are first gathered to replicated (a collective every process issues in
    the same order, since every process builds the Evaluator per step)."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return x
    if not x.sharding.is_fully_replicated:
        from jax.sharding import NamedSharding, PartitionSpec

        x = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(
                x.sharding.mesh, PartitionSpec()
            ),
        )(x)
    return jnp.asarray(x.addressable_data(0))


class Evaluator:
    """Jit-cached eval step functions over a fixed MiCoConfig + params."""

    def __init__(self, cfg: MiCoConfig, params, tokenizer, run_cfg=None):
        if cfg.pipeline_stages > 1:
            # PP is a training-memory tool; eval jits have no ambient mesh
            # and single-pass inference gains nothing from staging
            import dataclasses

            cfg = dataclasses.replace(cfg, pipeline_stages=1)
        self.cfg = cfg
        self.params = jax.tree.map(_localize, params)
        self.tok = tokenizer
        self.run_cfg = run_cfg or {}
        self.batch_tok = BatchTokenizer(
            tokenizer,
            max_caption_len=cfg.max_caption_len,
            max_omni_caption_len=cfg.max_omni_caption_len,
            max_subtitle_len=cfg.max_subtitle_len,
        )
        self._feat_fns: Dict[str, callable] = {}
        self._cond_fns: Dict[str, callable] = {}

    def _cond_fn(self, modalities: str):
        if modalities not in self._cond_fns:
            @jax.jit
            def fn(params, batch, m=modalities):
                return compute_features(params, self.cfg, batch, m)[
                    f"condition_feats_{m}"
                ]
            self._cond_fns[modalities] = fn
        return self._cond_fns[modalities]

    # ---- retrieval ----

    def _feat_fn(self, modalities: str):
        if modalities not in self._feat_fns:
            @jax.jit
            def fn(params, batch):
                out = compute_features(params, self.cfg, batch, modalities)
                return {f"feat_{modalities}": out[f"feat_{modalities}"]}
            self._feat_fns[modalities] = fn
        return self._feat_fns[modalities]

    def _flatten_captions(self, tb, task):
        """Multi-caption eval sets: every caption becomes a text row, with
        the reference's ids_txt row→visual-item mapping (IndexAnno id_txt,
        vast.py:441-443 raw-caption flattening). → (flat texts, local map)."""
        flat, local = [], []
        for j, c in enumerate(tb["raw_captions"]):
            caps = c if isinstance(c, list) else [c]
            flat.extend(caps)
            local.extend([j] * len(caps))
        return flat, local

    def _encode_texts(self, texts, task):
        omni = any("s" in s[1:] for s in _subtasks(task)[1])
        length = (
            self.cfg.max_omni_caption_len if omni else self.cfg.max_caption_len
        )
        # pad the row count to a multiple of 8 to bound jit re-compiles
        n = len(texts)
        n_pad = -(-n // 8) * 8
        enc = self.tok(texts + [""] * (n_pad - n), max_length=length)
        return enc["input_ids"], enc["attention_mask"], n

    @functools.cached_property
    def _text_fn(self):
        @jax.jit
        def fn(params, ids, mask):
            return compute_text_feature(
                params, self.cfg,
                {"caption_ids": ids, "caption_mask": mask},
            )
        return fn

    def eval_retrieval(
        self, loader, task: str, itm_rerank: bool = False
    ) -> Dict[str, float]:
        _, subs = _subtasks(task)
        feats = {m: [] for m in (s[1:] for s in subs)}
        conds = {m: [] for m in feats} if itm_rerank else None
        feats_t, txt2vis = [], []
        text_ids, text_masks = [], []
        n_vis = 0
        for batch in loader:
            tb = self.batch_tok(batch, task)
            arrays = {
                k: jnp.asarray(v)
                for k, v in tb.items()
                if not isinstance(v, list)
            }
            b = len(tb["ids"])
            for sub in subs:
                m = sub[1:]
                out = self._feat_fn(m)(self.params, arrays)
                feats[m].append(np.asarray(out[f"feat_{m}"]))
                if itm_rerank:
                    conds[m].append(
                        np.asarray(self._cond_fn(m)(self.params, arrays))
                    )
            # text side: one row per caption (multi-caption sets flatten)
            flat, local = self._flatten_captions(tb, task)
            ids, mask, n_txt = self._encode_texts(flat, task)
            t_out = np.asarray(
                self._text_fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )[:n_txt]
            feats_t.append(t_out)
            if itm_rerank:
                text_ids.append(ids[:n_txt])
                text_masks.append(mask[:n_txt])
            txt2vis.extend(n_vis + j for j in local)
            n_vis += b
        # Multi-host: val loaders shard samples across processes (no-pad
        # sampler), so every process holds 1/world of the gallery. Gather
        # everything before scoring — the reference ddp_allgathers eval
        # outputs for the same reason (data/utils/distributed.py:133-149).
        if jax.process_count() > 1:
            from mico_tpu.parallel.collectives import gather_objects

            payload = {
                "t": np.concatenate(feats_t) if feats_t else
                np.zeros((0, self.cfg.contra_dim), np.float32),
                "v": {m: (np.concatenate(c) if c else None)
                      for m, c in feats.items()},
                "txt2vis": txt2vis,
                "n_vis": n_vis,
                "conds": {m: (np.concatenate(c) if c else None)
                          for m, c in conds.items()} if itm_rerank else None,
                "text_ids": np.concatenate(text_ids) if text_ids else None,
                "text_masks": (np.concatenate(text_masks)
                               if text_masks else None),
            }
            shards = gather_objects(payload)
            off, merged_map = 0, []
            for sh in shards:
                merged_map.extend(off + j for j in sh["txt2vis"])
                off += sh["n_vis"]
            txt2vis = merged_map
            feats_t = [sh["t"] for sh in shards]
            feats = {
                m: [sh["v"][m] for sh in shards if sh["v"][m] is not None]
                for m in feats
            }
            if itm_rerank:
                conds = {
                    m: [sh["conds"][m] for sh in shards
                        if sh["conds"][m] is not None]
                    for m in conds
                }
                text_ids = [sh["text_ids"] for sh in shards
                            if sh["text_ids"] is not None]
                text_masks = [sh["text_masks"] for sh in shards
                              if sh["text_masks"] is not None]
        results: Dict[str, float] = {}
        t = np.concatenate(feats_t)
        for m, chunks in feats.items():
            v = np.concatenate(chunks)
            sim = t @ v.T
            for k, val in retrieval_recall(sim, txt2vis).items():
                results[f"{k}_{m}"] = val
            if itm_rerank:
                sim_r = self._itm_rerank(
                    sim,
                    np.concatenate(conds[m]),
                    np.concatenate(text_ids),
                    np.concatenate(text_masks),
                )
                for k, val in retrieval_recall(sim_r, txt2vis).items():
                    results[f"{k}_itm_{m}"] = val
        results["video_r1"] = float(
            np.mean([v for k, v in results.items() if k.startswith("video_r1")])
        )
        return results

    def _itm_rerank(self, sim, cond, text_ids, text_masks) -> np.ndarray:
        """Re-score each text's top `cfg.itm_rerank_num` ITC candidates with
        the ITM head (reference model_cfg.itm_rerank_num; BLIP/VAST-style
        coarse-to-fine retrieval). With cfg.ret_bidirection_evaluation the
        vis→text direction is reranked too; scores outside the top-N keep
        a rank-preserving -inf-ish floor."""
        from mico_tpu.train.objectives import compute_slice_scores

        n = min(self.cfg.itm_rerank_num, sim.shape[1])

        @jax.jit
        def score(params, cond_n, ids, mask):
            ids_n = jnp.broadcast_to(ids[None], (n,) + ids.shape)
            mask_n = jnp.broadcast_to(mask[None], (n,) + mask.shape)
            return compute_slice_scores(params, self.cfg, cond_n, ids_n, mask_n)

        out = np.full_like(sim, -1.0)
        top = np.argsort(-sim, axis=1)[:, :n]
        for i in range(sim.shape[0]):
            s = np.asarray(
                score(
                    self.params,
                    jnp.asarray(cond[top[i]]),
                    jnp.asarray(text_ids[i]),
                    jnp.asarray(text_masks[i]),
                )
            )
            out[i, top[i]] = s
        if self.cfg.ret_bidirection_evaluation:
            nt = min(self.cfg.itm_rerank_num, sim.shape[0])

            @jax.jit
            def score_v(params, cond_1, ids, mask):
                cond_n = jnp.broadcast_to(cond_1[None], (nt,) + cond_1.shape)
                return compute_slice_scores(params, self.cfg, cond_n, ids, mask)

            top_t = np.argsort(-sim, axis=0)[:nt]        # (nt, n_vis)
            for j in range(sim.shape[1]):
                rows = top_t[:, j]
                s = np.asarray(
                    score_v(
                        self.params,
                        jnp.asarray(cond[j]),
                        jnp.asarray(text_ids[rows]),
                        jnp.asarray(text_masks[rows]),
                    )
                )
                # average with the t2v pass where both scored the pair
                cur = out[rows, j]
                out[rows, j] = np.where(cur > -1.0, (cur + s) / 2.0, s)
        return out

    # ---- captioning ----

    def eval_caption(
        self, loader, task: str, captioner_mode: bool = False,
        generate_nums: int = 1, output_path: Optional[str] = None,
    ) -> Dict[str, float]:
        _, subs = _subtasks(task)
        rc = self.run_cfg
        hyps: Dict[str, list] = {s: [] for s in subs}
        refs, ids = [], []
        annotations = []
        for batch in loader:
            tb = self.batch_tok(batch, task)
            arrays = {
                k: jnp.asarray(v) for k, v in tb.items() if not isinstance(v, list)
            }
            for sub in subs:
                m = sub[1:]
                cond = self._cond_fn(m)(self.params, arrays)
                if captioner_mode:
                    # VAST-27M annotation mode: generate_nums top-k samples
                    # per clip (data/model/vast.py:521-537)
                    cond_rep = jnp.repeat(cond, generate_nums, axis=0)
                    toks = generate(
                        self.params["bert"],
                        self.cfg.bert_config,
                        cond_rep,
                        max_new_tokens=self.cfg.max_caption_len,
                        mode="sample",
                        top_k=int(rc.get("top_k", 10)),
                        rng=jax.random.PRNGKey(len(ids)),
                        compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                    )
                else:
                    toks = generate(
                        self.params["bert"],
                        self.cfg.bert_config,
                        cond,
                        max_new_tokens=self.cfg.max_caption_len,
                        mode="beam",
                        num_beams=self.cfg.beam_size,
                        compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                    )
                hyps[sub].extend(self.tok.batch_decode(np.asarray(toks)))
            ids.extend(tb["ids"])
            caps = tb.get("raw_captions")
            if caps is not None:
                refs.extend([c if isinstance(c, list) else [c] for c in caps])
        if jax.process_count() > 1:
            from mico_tpu.parallel.collectives import gather_objects

            shards = gather_objects(
                {"hyps": hyps, "refs": refs, "ids": ids}
            )
            hyps = {s: sum((sh["hyps"][s] for sh in shards), [])
                    for s in subs}
            refs = sum((sh["refs"] for sh in shards), [])
            ids = sum((sh["ids"] for sh in shards), [])
        results: Dict[str, float] = {}
        if captioner_mode:
            for sub in subs:
                grouped = [
                    hyps[sub][i : i + generate_nums]
                    for i in range(0, len(hyps[sub]), generate_nums)
                ]
                annotations.extend(
                    {"clip_id": i, f"{sub}_captions": g}
                    for i, g in zip(ids, grouped)
                )
            if output_path and jax.process_index() == 0:
                with open(output_path, "w") as f:
                    json.dump(annotations, f)
            results["num_annotated"] = float(len(ids))
            return results
        for sub in subs:
            if refs:
                results[f"CIDEr_{sub}"] = cider_d(hyps[sub], refs)
                results[f"Bleu4_{sub}"] = bleu4(hyps[sub], refs)
        if results:
            results["CIDEr"] = float(
                np.mean([v for k, v in results.items() if k.startswith("CIDEr")])
            )
        return results

    # ---- QA ----

    def eval_qa(self, loader, task: str,
                submission_path: Optional[str] = None) -> Dict[str, float]:
        """VQA eval; with `submission_path` also dumps
        [{question_id, answer}] for test-server submission (the dataset
        `make_submission` flag, reference data/data/IndexAnno.py eval
        fields)."""
        _, subs = _subtasks(task)
        preds: Dict[str, list] = {s: [] for s in subs}
        answers = []
        question_ids = []
        for batch in loader:
            tb = self.batch_tok(batch, task)
            arrays = {
                k: jnp.asarray(v) for k, v in tb.items() if not isinstance(v, list)
            }
            for sub in subs:
                m = sub[1:]
                cond = self._cond_fn(m)(self.params, arrays)
                toks = generate_answers(
                    self.params["bert"],
                    self.cfg.bert_config,
                    arrays["question_ids"],
                    arrays["question_mask"],
                    cond,
                    max_new_tokens=10,
                    mode="beam",
                    num_beams=self.cfg.beam_size,
                    compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                )
                preds[sub].extend(self.tok.batch_decode(np.asarray(toks)))
            answers.extend(batch.get("raw_answers", [None] * len(tb["ids"])))
            question_ids.extend(batch.get("question_ids_raw",
                                          batch.get("ids", [])))
        if jax.process_count() > 1:
            from mico_tpu.parallel.collectives import gather_objects

            shards = gather_objects(
                {"preds": preds, "answers": answers, "qids": question_ids}
            )
            preds = {s: sum((sh["preds"][s] for sh in shards), [])
                     for s in subs}
            answers = sum((sh["answers"] for sh in shards), [])
            question_ids = sum((sh["qids"] for sh in shards), [])
        results = {}
        scored = [a for a in answers if a is not None]
        for sub in subs:
            if scored:
                results[f"accuracy_{sub}"] = vqa_accuracy(
                    [p for p, a in zip(preds[sub], answers) if a is not None],
                    scored,
                )
        if results:
            results["accuracy"] = float(np.mean(list(results.values())))
        if submission_path:
            sub0 = subs[0]
            if jax.process_index() == 0:
                with open(submission_path, "w") as f:
                    json.dump(
                        [
                            {"question_id": q, "answer": p}
                            for q, p in zip(question_ids, preds[sub0])
                        ],
                        f,
                    )
            results["num_submitted"] = float(len(preds[sub0]))
        return results


def evaluation_mm(
    evaluator: Evaluator, val_loaders: Dict, run_cfg, global_step: int
) -> Dict[str, Dict[str, float]]:
    """Evaluate every val loader according to its task prefix."""
    logs: Dict[str, Dict[str, float]] = {}
    for name, loader in val_loaders.items():
        task = name.split("--")[0]
        head = task.split("%")[0].split("_")[0]
        captioner_mode = bool(run_cfg.get("captioner_mode", False))
        if head == "ret":
            logs[name] = evaluator.eval_retrieval(
                loader, task,
                itm_rerank=bool(run_cfg.get("itm_rerank", False)),
            )
        elif head == "cap":
            out_dir = run_cfg.get("output_dir", ".")
            logs[name] = evaluator.eval_caption(
                loader,
                task,
                captioner_mode=captioner_mode,
                generate_nums=int(run_cfg.get("generate_nums", 1)),
                output_path=os.path.join(
                    out_dir, f"annotations_step{global_step}_{name}.json"
                ) if captioner_mode else None,
            )
        elif head == "qa":
            out_dir = run_cfg.get("output_dir", ".")
            logs[name] = evaluator.eval_qa(
                loader, task,
                submission_path=os.path.join(
                    out_dir, f"submission_step{global_step}_{name}.json"
                ) if run_cfg.get("make_submission") else None,
            )
        else:
            LOGGER.warning("unknown eval task %s for loader %s", task, name)
        LOGGER.info("eval step %d %s: %s", global_step, name, logs.get(name))
    return logs


evaluation_registry = {"evaluation_mm": evaluation_mm}
