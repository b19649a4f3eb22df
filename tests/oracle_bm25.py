"""Independent pure-pandas BM25 oracle (FIXTURES.md §5) — no engine imports
beyond the shared analyzer registry, so rank-identity checks are meaningful.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

_SIMPLE = re.compile(r"[a-z0-9]+")


def simple_tokens(text: str) -> list[str]:
    return _SIMPLE.findall((text or "").lower())


def bm25_topk(
    docs: pd.DataFrame,  # columns: docid, content
    query: str,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    tokenizer=simple_tokens,
) -> pd.DataFrame:
    toks = {int(r.docid): tokenizer(r.content) for r in docs.itertuples(index=False)}
    n = len(toks)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n if n else 0.0
    tfs = {d: Counter(t) for d, t in toks.items()}
    df: Counter = Counter()
    for d, c in tfs.items():
        df.update(c.keys())

    qterms = list(dict.fromkeys(tokenizer(query)))
    scores: dict[int, float] = {}
    for t in qterms:
        if t not in df:
            continue
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for d, c in tfs.items():
            tf = c.get(t)
            if not tf:
                continue
            s = idf * tf / (tf + k1 * (1 - b + b * dls[d] / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(ranked, columns=["docid", "score"])
