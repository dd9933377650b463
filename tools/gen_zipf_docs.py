"""Generate a realistic-vocabulary documents fixture (Zipfian token
distribution) for the retrieval-family scaling claim (VERDICT r6 #2).

The driver testdata's documents table has a 31-token vocabulary, which
makes every query term match ~every corpus doc — the worst case for
term-at-a-time retrieval (q79/q80/q83) and unrepresentative of real
text, where df(t) follows Zipf's law and most postings lists are short.
This tool writes a documents.parquet with the SAME schema (doc_id,
text, lang, source, n_chars) but a >=10k-word Zipf(s=1.07) vocabulary,
so the "slow because the fixture is degenerate" explanation becomes
falsifiable: run tools/time_queries.py against the output dir.

Texts are deterministic per (seed, doc_id) — regenerating the fixture
reproduces it bit-for-bit. Other tables (embeddings etc.) are copied
from the source dir so the full harness can point at the output.

Usage: python tools/gen_zipf_docs.py [n_docs] [vocab] [out_dir] [src_sf_dir]
Defaults: 50000 docs (the x10 corpus size), 20000 words,
.scaled/zipf10, /root/repo/.scaled/x10 for the sibling tables.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEED = 709


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    out = sys.argv[3] if len(sys.argv) > 3 else str(
        Path(__file__).resolve().parent.parent / ".scaled" / "zipf10"
    )
    src = sys.argv[4] if len(sys.argv) > 4 else str(
        Path(__file__).resolve().parent.parent / ".scaled" / "x10"
    )

    from plumberapp_spark import get_spark

    spark = get_spark("gen_zipf_docs")

    def gen(batches):
        import numpy as np
        import pandas as pd

        # Zipf-Mandelbrot probabilities, shared across the partition's
        # batches; rank-1 'the'-like token has df ~ most docs, the tail
        # is rare — the realistic postings-length profile.
        ranks = np.arange(1, vocab + 1, dtype=np.float64)
        probs = 1.0 / (ranks + 2.7) ** 1.07
        probs /= probs.sum()
        words = np.array([f"w{i:05d}" for i in range(vocab)])
        langs = np.array(["en", "zh", "de", "fr", "es"])
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                rng = np.random.default_rng(SEED + int(doc_id))
                length = max(5, int(rng.lognormal(np.log(60.0), 0.5)))
                toks = words[rng.choice(vocab, size=length, p=probs)]
                text = " ".join(toks)
                rows.append(
                    (
                        int(doc_id),
                        text,
                        str(langs[int(doc_id) % 5]),
                        f"src{int(doc_id) % 20}",
                        len(text),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    docs = (
        spark.range(n_docs)
        .repartition(32)
        .mapInPandas(
            gen, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"documents: {n_docs} docs, vocab {vocab} -> {out}")
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        s = Path(src) / f"{t}.parquet"
        d = Path(out) / f"{t}.parquet"
        if s.exists() and not d.exists():
            (shutil.copytree if s.is_dir() else shutil.copy)(str(s), str(d))
            print(f"{t}: copied from {src}")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
