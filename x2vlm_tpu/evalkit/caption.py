"""Caption metrics: BLEU-1..4 and CIDEr-D (reference vendors utils/cider/ and
relies on pycocoevalcap, dataset/utils.py:456-483). Self-contained
implementations of the standard algorithms (corpus BLEU with brevity penalty;
CIDEr-D with tf-idf 1-4-gram cosine similarity, length/ clipping penalties).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

__all__ = ["bleu", "cider_d", "caption_eval"]


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(predictions: List[str], references: List[List[str]], max_n: int = 4
         ) -> Dict[str, float]:
    """Corpus BLEU with uniform weights and closest-length brevity penalty."""
    clipped = [0] * max_n
    totals = [0] * max_n
    pred_len, ref_len = 0, 0
    for pred, refs in zip(predictions, references):
        p = pred.split()
        rs = [r.split() for r in refs]
        pred_len += len(p)
        ref_len += min((abs(len(r) - len(p)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            pn = _ngrams(p, n)
            maxref: Counter = Counter()
            for r in rs:
                rn = _ngrams(r, n)
                for g, c in rn.items():
                    maxref[g] = max(maxref[g], c)
            totals[n - 1] += max(len(p) - n + 1, 0)
            clipped[n - 1] += sum(min(c, maxref[g]) for g, c in pn.items())
    out = {}
    log_sum = 0.0
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    for n in range(1, max_n + 1):
        pn = clipped[n - 1] / totals[n - 1] if totals[n - 1] else 0.0
        log_sum += math.log(pn) if pn > 0 else -9999.0
        out[f"bleu{n}"] = bp * math.exp(log_sum / n)
    return out


def cider_d(predictions: List[str], references: List[List[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D corpus score (Vedantam et al. 2015), df from the reference set."""
    doc_freq: Dict = defaultdict(int)
    ref_grams = []
    pred_grams = []
    for pred, refs in zip(predictions, references):
        rgs = []
        for r in refs:
            toks = r.split()
            gs = {n: _ngrams(toks, n) for n in range(1, max_n + 1)}
            rgs.append((gs, len(toks)))
        ref_grams.append(rgs)
        for g in set(g for gs, _ in rgs for n in gs for g in gs[n]):
            doc_freq[g] += 1
        ptoks = pred.split()
        pred_grams.append(({n: _ngrams(ptoks, n) for n in range(1, max_n + 1)},
                           len(ptoks)))
    n_docs = max(len(references), 1)
    log_n = math.log(n_docs)

    def tfidf(gs: Counter, n: int):
        vec = {}
        norm = 0.0
        length = sum(gs.values())
        for g, c in gs.items():
            df = math.log(max(doc_freq[g], 1))
            w = (c / max(length, 1)) * max(log_n - df, 0.0)
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = []
    for (pgs, plen), rgs in zip(pred_grams, ref_grams):
        score_n = [0.0] * max_n
        for n in range(1, max_n + 1):
            pvec, pnorm = tfidf(pgs[n], n)
            for (rg, rlen) in rgs:
                rvec, rnorm = tfidf(rg[n], n)
                # clipped dot product (CIDEr-D)
                dot = sum(min(pvec[g], rvec.get(g, 0.0)) * rvec.get(g, 0.0)
                          for g in pvec)
                sim = dot / (pnorm * rnorm) if pnorm > 0 and rnorm > 0 else 0.0
                delta = plen - rlen
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                score_n[n - 1] += sim
            score_n[n - 1] /= len(rgs)
        scores.append(10.0 * sum(score_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def caption_eval(predictions: List[Dict], annotations: Dict) -> Dict[str, float]:
    """predictions: [{image_id, caption}]; annotations: image_id → [refs]."""
    preds, refs = [], []
    for p in predictions:
        if p["image_id"] in annotations:
            preds.append(p["caption"].lower())
            refs.append([r.lower() for r in annotations[p["image_id"]]])
    out = bleu(preds, refs)
    out["cider"] = cider_d(preds, refs)
    out["n"] = len(preds)
    return out
