"""Real BPE tokenization over the ``documents`` table.

``textops.bpe_token_count`` approximates a subword tokenizer with a regex;
this module is the real thing a training-data pipeline runs: byte-pair-
encoding merges TRAINED from the corpus itself (on its distributed word-
frequency table — the classic Sennrich et al. 2016 algorithm, public),
then APPLIED corpus-wide as an Arrow-batched ``mapInPandas`` kernel.

Scale design:

* **Training never sees documents.**  It consumes the word-frequency
  table — one distributed ``explode → groupBy word`` pass (map-side
  combine absorbs Zipf mass before the shuffle), then only the top-K
  words (K small, e.g. 10⁴-10⁵) are collected.  At 100 TB the frequency
  table is GBs, its top-K is KBs; the driver loop is O(K · merges).
* **Application is embarrassingly parallel.**  The merge ranks broadcast
  as a dict (≤ a few MB); each Arrow batch tokenizes with a per-word
  memo — Zipf means the memo hit-rate is ~99% — so the per-row cost is a
  dict lookup for all but the tail.  No shuffle anywhere.
* **Determinism.**  Ties in pair frequency break lexicographically, so
  the trained merges — and therefore every token id — are identical
  across runs, partitionings, and cluster sizes.

The encode loop is not SQL-expressible (iterative, data-dependent merge
order), so the contract entry is rows-only; pytest pins hand-computed
merges and the decode(encode(x)) == x round-trip invariant.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

END = "</w>"  # end-of-word marker (standard BPE word boundary symbol)


def word_frequencies(docs: DataFrame, text_col: str = "text", top_k: int = 50_000) -> DataFrame:
    """The distributed word-frequency table BPE training consumes:
    lowercased whitespace words, counted, top-K by (count desc, word asc)
    — the deterministic tiebreak matters for reproducible merges."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_k)
    )


def train_bpe(word_freqs: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training (driver-side, on the collected top-K word
    frequency list): start from characters (+ ``</w>``), repeatedly merge
    the most frequent adjacent symbol pair.  Ties break lexicographically
    — bit-reproducible merges regardless of input order."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in word_freqs:
        sym = tuple(word) + (END,)
        vocab[sym] = vocab.get(sym, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # count desc, pair lexicographically asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def build_vocab(merges: list[tuple[str, str]], word_freqs: list[tuple[str, int]]) -> dict[str, int]:
    """Token → id: base symbols (sorted chars seen in training + ``</w>``)
    first, then one token per merge, in merge order — the conventional
    BPE id layout, deterministic by construction."""
    chars = sorted({c for w, _ in word_freqs for c in w})
    toks = chars + [END] + [a + b for a, b in merges]
    seen: dict[str, int] = {}
    for t in toks:
        if t not in seen:
            seen[t] = len(seen)
    return seen


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document: ``(doc_id, token_ids array<int>, n_tokens)``.

    One Arrow-batched ``mapInPandas`` stage, no shuffle.  A per-executor
    word → ids memo exploits Zipf: almost every word after the first few
    thousand rows is a dict hit.  Unknown symbols (chars never seen in
    training) map to id -1 — the pipeline's OOV sentinel."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    vb = dict(vocab)

    schema = f"{id_col} long, token_ids array<int>, n_tokens long"

    def kernel(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        memo: dict[str, list[int]] = {}

        def ids_for(word: str) -> list[int]:
            got = memo.get(word)
            if got is None:
                got = [vb.get(t, -1) for t in _encode_word(word, ranks)]
                memo[word] = got
            return got

        for pdf in batches:
            out_ids, out_n = [], []
            for text in pdf[text_col]:
                ids: list[int] = []
                for w in (text or "").lower().split():
                    ids.extend(ids_for(w))
                out_ids.append(ids)
                out_n.append(len(ids))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "token_ids": out_ids, "n_tokens": out_n}
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def bpe_decode(token_ids: list[int], vocab: dict[str, int]) -> str:
    """Inverse of :func:`bpe_encode` for one document (driver-side test
    helper): concatenate tokens, split words at ``</w>``."""
    rev = {i: t for t, i in vocab.items()}
    text = "".join(rev.get(i, "�") for i in token_ids)
    return text.replace(END, " ").strip()
