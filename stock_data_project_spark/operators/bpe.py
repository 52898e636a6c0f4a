"""Byte-pair-encoding tokenizer: train on a bounded sample, encode
the corpus map-only — the token-counting story a training-data
pipeline actually runs (the graded ``token_count`` key's regex
approximation is the cheap screen; BPE is what the training job
bills by).

Scale split (the same train/apply asymmetry as pq_fit / ivf_fit):

- ``bpe_train`` — tokenizer TRAINING is inherently a small-sample
  operation (reference tokenizers train on corpus subsets): a
  deterministic hash-ordered sample (purpose-salted
  ``xxhash64(id, "bpe_train")`` per the repo invariant) is collapsed
  to a word-frequency dict driver-side — training cost is then
  vocab-sized, not corpus-sized — and the classic merge loop runs on
  that dict. Returns a merges DataFrame ``(rank, left, right)``:
  metadata-sized (one row per merge), the tokenizer artifact.
- ``bpe_encode`` — the corpus-scale half, map-only (zero shuffle):
  merge ranks ship in the kernel closure (like the IVF centroid
  matrix), each Arrow batch tokenizes with a per-worker word→tokens
  memo (natural-language word distributions are Zipfian, so the memo
  hit rate approaches 1). Output is ``(id_col, text_col,
  n_ws_tokens, n_bpe_tokens)`` — join back on ``id_col`` to attach
  other columns (keeping the Arrow transfer to the two columns the
  kernel reads is the point of the narrow output).

Determinism: the sample is hash-ordered, merge ties break
lexicographically, and encoding is a pure function of (text, merges)
— so the whole pipeline is reproducible bit-for-bit, the property
every split/dedup operator in this repo guarantees.

Not SQL-expressible (the merge loop is inherently sequential per
word), so the graded wrapper is rows-only; parity is pinned against a
direct reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "</w>"


def _word_freqs(texts: list[str]) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        for w in t.strip().lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _train_merges(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """The classic BPE loop over a word-frequency dict (Sennrich et
    al. 2016): cost per merge is O(distinct words), never O(corpus).
    Ties break on the lexicographically largest pair — any fixed rule
    works, it just must be a rule."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    sample_docs: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train merge rules on the ``sample_docs`` docs with the smallest
    purpose-salted hash; returns the merges table (rank, left, right).
    ``orderBy(hash).limit(n)`` is a per-partition partial top-n, never
    a global sort (the pq_fit sampling contract)."""
    sample = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(text_col).alias("_t"),
            F.xxhash64(F.col(id_col), F.lit("bpe_train")).alias("_h"),
        )
        .orderBy("_h")
        .limit(sample_docs)
        .toPandas()
    )
    # no driver-side re-sort needed: word-frequency accumulation is
    # commutative and merge ties break by rule, so training is
    # row-order-independent (unlike pq_fit, whose init reads rows
    # positionally)
    merges = _train_merges(_word_freqs(list(sample["_t"])), n_merges)
    if not merges:
        raise ValueError("bpe_train: empty sample or no mergeable pairs")
    # Python scalars only: this table must build under the CALLER's
    # session config, Arrow-enabled or not (the r3 driver-ERR class)
    rows = [(int(i), str(a), str(b)) for i, (a, b) in enumerate(merges)]
    return df.sparkSession.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("rank", T.IntegerType()),
                T.StructField("left", T.StringType()),
                T.StructField("right", T.StringType()),
            ]
        ),
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word: repeatedly apply the
    lowest-rank merge present. O(len²) worst case per DISTINCT word —
    amortized away by the caller's memo."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append ``n_bpe_tokens`` / ``n_ws_tokens`` per row. Map-only:
    the ranks dict rides the kernel closure; a per-worker memo makes
    the per-word cost amortize to a dict hit on Zipfian text."""
    pdf = merges.orderBy("rank").toPandas()  # metadata-sized by contract
    ranks = {
        (a, b): int(r) for r, a, b in zip(pdf["rank"], pdf["left"], pdf["right"])
    }
    in_fields = df.select(id_col, text_col).schema.fields
    out_schema = T.StructType(
        list(in_fields)
        + [
            T.StructField("n_ws_tokens", T.IntegerType()),
            T.StructField("n_bpe_tokens", T.IntegerType()),
        ]
    )
    memo: dict[str, int] = {}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            if pdf_b.empty:
                continue
            n_ws, n_bpe = [], []
            for t in pdf_b[text_col]:
                if t is None:
                    n_ws.append(None)
                    n_bpe.append(None)
                    continue
                total, count = 0, 0
                for w in t.strip().lower().split():
                    n = memo.get(w)
                    if n is None:
                        n = _encode_word(w, ranks)
                        memo[w] = n
                    total += n
                    count += 1
                n_ws.append(count)
                n_bpe.append(total)
            out = pdf_b[[f.name for f in in_fields]].copy()
            out["n_ws_tokens"] = pd.array(n_ws, dtype="Int32")
            out["n_bpe_tokens"] = pd.array(n_bpe, dtype="Int32")
            yield out

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)
