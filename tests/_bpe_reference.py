"""Independently-written BPE (trainer + apply) used ONLY to verify
``batch_processing_system_spark.functions.bpe`` and to pin the r08
fixture oracle — the independent-encoder discipline from the
multimodal tests, applied to tokenization.

Deliberately different mechanics from the engine implementation:

- the trainer keeps the vocabulary as whitespace-joined symbol STRINGS
  and mutates them with ``str.split``/``' '.join`` (the engine uses
  symbol tuples);
- pair counting uses ``collections.Counter`` over zipped slices (the
  engine hand-rolls a dict loop);
- apply runs a SINGLE PASS over the merge list in rank order (the
  engine repeatedly searches the word for the lowest-rank pair
  present). These agree for ranks produced by consistent training
  because a pair involving a merged symbol always ranks after the
  merge that created it — the tests assert that equivalence on random
  corpora rather than assuming it.

Shares no code with functions/bpe.py beyond the '</w>' convention.
"""

from __future__ import annotations

from collections import Counter


END = "</w>"


def _to_line(word: str) -> str:
    return " ".join(list(word) + [END])


def ref_train(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    vocab = Counter()
    for w, c in word_counts.items():
        if w:
            vocab[_to_line(w)] += c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for line, c in vocab.items():
            syms = line.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        find = f"{a} {b}"
        repl = a + b
        new_vocab: Counter = Counter()
        for line, c in vocab.items():
            new_vocab[_replace_pair(line, find, repl)] += c
        vocab = new_vocab
    return merges


def _replace_pair(line: str, find: str, repl: str) -> str:
    # token-boundary-safe replacement of the space-joined pair
    syms = line.split(" ")
    out = []
    i = 0
    fa, fb = find.split(" ")
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == fa and syms[i + 1] == fb:
            out.append(repl)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return " ".join(out)


def ref_apply_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    line = _to_line(word)
    for a, b in merges:
        line = _replace_pair(line, f"{a} {b}", a + b)
    return line.split(" ")


def ref_tokenize(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    for w in text.split():
        out.extend(ref_apply_word(w, merges))
    return out
