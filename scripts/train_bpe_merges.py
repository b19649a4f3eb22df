"""Train the packaged BPE merge table (functions/bpe_merges.txt).

Deterministic: the corpus is the driver-seeded synthetic documents table
(sf0.001) read in doc_id order, and the learner breaks ties lexicographically
— rerunning this script reproduces the committed file byte-for-byte.

Usage:  python scripts/train_bpe_merges.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

sys.path.insert(0, ".")
from gitlab_elasticsearch_indexer_spark.functions import bpe  # noqa: E402

OUT = "gitlab_elasticsearch_indexer_spark/functions/bpe_merges.txt"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = tbl.to_pandas().sort_values("doc_id")
    # The synthetic corpus has only ~60 distinct pretokens — merges would
    # exhaust after ~130 steps with every word fully collapsed.  Mix in the
    # packaged KStem headword list (30k English words, frequency 1 each, one
    # per "document" so pretokenization leaves them intact) so the learner
    # sees real English subword structure: corpus words still dominate the
    # pair counts (and merge fully, early), rare lexicon words segment.
    from importlib import resources

    lex = resources.files(
        "gitlab_elasticsearch_indexer_spark.functions"
    ).joinpath("kstem_lexicon.txt").read_text()
    texts = df["text"].tolist() + sorted(w for w in lex.split() if w)
    merges = bpe.train_merges(texts, n_merges)
    with open(OUT, "w") as f:
        f.write(
            "# BPE merge table, GPT-2 merges.txt layout (rank = line order),\n"
            "# tab-separated escaped pairs (learned symbols may contain\n"
            "# spaces; tab/newline/backslash and a leading '#' are escaped).\n"
            f"# Trained by scripts/train_bpe_merges.py on {sf_dir} documents\n"
            f"# (deterministic driver seed), n_merges={n_merges}.\n"
        )
        ranks = {p: i for i, p in enumerate(merges)}
        for line in bpe.dump_lines(ranks):
            f.write(line + "\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
