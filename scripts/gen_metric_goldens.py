"""Generate golden caption-metric fixtures (VERDICT round-2 item 10).

pycocoevalcap is not installed in this environment, so the CIDEr-D goldens
come from a verbatim transcription of its cider_scorer.py math (raw-count
tf-idf vectors, clipped -D numerator over the hypothesis n-grams, Gaussian
length penalty e^(-d^2/2s^2) per n, mean over n=1..4, x10, df from one set
per image, idf = log(n_images) - log(max(1, df))) — an independent
implementation used ONLY here, cross-checking mico_tpu.evaluation.metrics.
BLEU-4 goldens come from sacrebleu's corpus_bleu (closest-ref brevity
penalty, max(0, len-n+1) precision denominators — the same conventions as
pycocoevalcap's bleu_scorer; nltk differs by clamping the denominator to
min 1 for hypotheses shorter than n), an independently-maintained
implementation of the same definition.

Writes tests/fixtures/caption_metric_goldens.json.
"""

import json
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [
    ("a man is riding a horse on the beach",
     ["a man rides a horse along the beach", "someone riding a horse by the sea"]),
    ("two dogs play in the snow",
     ["two dogs are playing in the snow", "dogs playing outside in winter snow"]),
    ("a cat sleeps on a red couch", ["a cat sleeping on a couch"]),
    ("a group of people standing around a table",
     ["people gathered around a table", "a group of friends stand near a table",
      "several people standing at a table"]),
    ("the chef cooks pasta in a kitchen", ["a chef is cooking in a kitchen"]),
    ("a red car drives down the street", ["a car driving on a road"]),
    ("children playing soccer in the park",
     ["kids play football at the park", "children kick a ball in a park"]),
    ("a bird flies over the water", ["a bird flying above a lake"]),
    ("an old man reads a newspaper", ["a man reading the paper on a bench"]),
    ("the train arrives at the station", ["a train pulling into a station"]),
    ("a woman takes a photo of the mountains",
     ["a woman photographing mountains", "someone takes pictures of a mountain"]),
    ("two cats fight over a toy", ["cats playing with a toy"]),
    ("a boat sails across the ocean", ["a sailboat on the open sea"]),
    ("students listen to a lecture in class", ["a teacher lectures students"]),
    ("a dog catches a frisbee in the air",
     ["a dog jumping to catch a frisbee", "dog catches frisbee"]),
    ("rain falls on the city at night", ["a rainy night in the city"]),
    ("a man is riding a horse on the beach",           # exact-ish duplicate
     ["a man is riding a horse on the beach"]),
    ("quantum flux capacitors oscillate wildly",       # zero overlap
     ["a bowl of fruit on the table"]),
    ("the the the the", ["a repeated word test case"]),  # degenerate hyp
    ("a single word", ["word"]),                          # very short ref
]


def norm(s):
    import re

    return re.sub(r"[^\w\s]", "", s.lower()).split()


def ngrams(toks, n):
    return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))


def cider_d_pycoco(hyps, refs, n_max=4, sigma=6.0):
    """Verbatim pycocoevalcap cider_scorer math."""
    crefs = [[norm(r) for r in rs] for rs in refs]
    ctest = [norm(h) for h in hyps]
    # document frequency: each ngram counted once per image
    document_frequency = defaultdict(float)
    for rs in crefs:
        for ng in set(g for r in rs for n in range(1, n_max + 1)
                      for g in ngrams(r, n)):
            document_frequency[ng] += 1
    ref_len = math.log(float(len(crefs)))

    def counts2vec(toks):
        vec = [defaultdict(float) for _ in range(n_max)]
        norm_ = [0.0] * n_max
        length = len(toks)
        for n in range(1, n_max + 1):
            for g, c in ngrams(toks, n).items():
                df = math.log(max(1.0, document_frequency[g]))
                vec[n - 1][g] = float(c) * (ref_len - df)
                norm_[n - 1] += vec[n - 1][g] ** 2
        norm_ = [math.sqrt(x) for x in norm_]
        return vec, norm_, length

    def sim(vec_h, norm_h, len_h, vec_r, norm_r, len_r):
        delta = float(len_h - len_r)
        val = [0.0] * n_max
        for n in range(n_max):
            for g, c in vec_h[n].items():
                val[n] += min(c, vec_r[n].get(g, 0.0)) * vec_r[n].get(g, 0.0)
            if norm_h[n] != 0 and norm_r[n] != 0:
                val[n] /= norm_h[n] * norm_r[n]
            val[n] *= math.e ** (-(delta ** 2) / (2 * sigma ** 2))
        return val

    scores = []
    for toks, rs in zip(ctest, crefs):
        vec, norm_, length = counts2vec(toks)
        score = [0.0] * n_max
        for r in rs:
            vr, nr, lr = counts2vec(r)
            for n, v in enumerate(sim(vec, norm_, length, vr, nr, lr)):
                score[n] += v
        score_avg = sum(score) / n_max / len(rs) * 10.0
        scores.append(score_avg)
    return sum(scores) / len(scores), scores


def main():
    hyps = [h for h, _ in PAIRS]
    refs = [rs for _, rs in PAIRS]

    import sacrebleu

    hyp_strs = [" ".join(norm(h)) for h in hyps]
    ref_strs = [[" ".join(norm(r)) for r in rs] for rs in refs]
    max_refs = max(len(rs) for rs in ref_strs)
    ref_streams = [
        [rs[i] if i < len(rs) else None for rs in ref_strs]
        for i in range(max_refs)
    ]
    bleu = sacrebleu.corpus_bleu(
        hyp_strs, ref_streams, smooth_method="none", tokenize="none",
        force=True,
    ).score / 100.0
    cider_mean, cider_per = cider_d_pycoco(hyps, refs)

    out = {
        "pairs": [{"hyp": h, "refs": rs} for h, rs in PAIRS],
        "bleu4_sacrebleu": bleu,
        "cider_d_mean": cider_mean,
        "cider_d_per_image": cider_per,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "caption_metric_goldens.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"bleu4={bleu:.6f} cider_d={cider_mean:.6f} → {path}")


if __name__ == "__main__":
    main()
