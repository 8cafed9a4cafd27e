"""Host-side ngram proposal (reference vllm/spec_decode/ngram_worker.py:
find the most recent occurrence of the current tail n-gram in the
request's token history and propose the tokens that followed it)."""

from __future__ import annotations


def propose_ngram(tokens: list[int], k: int, n_max: int,
                  n_min: int) -> list[int]:
    """Propose up to ``k`` continuation tokens; always returns exactly k
    (falling back to repeating the last token so the verify batch keeps a
    fixed shape — bad proposals cost nothing, they are simply rejected).
    """
    t = len(tokens)
    for n in range(min(n_max, t - 1), n_min - 1, -1):
        tail = tokens[t - n:]
        # Most recent earlier occurrence of the tail n-gram.
        for start in range(t - n - 1, -1, -1):
            if tokens[start:start + n] == tail:
                follow = tokens[start + n:start + n + k]
                if follow:
                    return (follow + [tokens[-1]] * (k - len(follow)))[:k]
        # no match at this n: try a shorter one
    return [tokens[-1]] * k
