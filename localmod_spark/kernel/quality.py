"""Quality scoring: KenLM-style character-bigram perplexity + heuristics.

North-rule addition (no reference counterpart): a deterministic,
self-contained quality filter in the style of large-corpus pipelines
(C4/Gopher-type rules + an n-gram LM perplexity signal).

The LM is a character-bigram model over a 28-symbol alphabet
(a–z, space, OTHER) trained at import time on a small seed corpus
embedded below, with add-one smoothing — no downloads, no files,
bit-identical across processes.  Perplexity is exp of the average
negative log2... (natural log) per-transition surprisal.

Heuristic stats follow the published Gopher rules (Rae et al. 2021,
arXiv:2112.11446 §A1.1): word count, mean word length, symbol ratios,
and repetition (top-token / duplicate-bigram fractions).

Decision policy: ``quality_flagged`` is deliberately conservative and is
NOT part of the default keep/drop aggregate (the parity gate is vs the
reference pipeline, which has no quality classifier); it is emitted as its
own column so a corpus builder can filter on it explicitly.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import NamedTuple, Optional

# ~1.5 kB of ordinary English prose (written for this module) used purely
# as bigram-statistics seed material.
_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog while the sun sets behind "
    "the hills and the river keeps moving toward the sea people gather in "
    "the town square to talk about the harvest and the weather and the news "
    "from distant places a good sentence carries its meaning with simple "
    "words placed in a natural order readers understand text that flows the "
    "way speech flows with subjects and verbs and objects arriving when "
    "expected every language has its own rhythm but english leans on word "
    "order more than most the cat sat on the mat and the child read a book "
    "by the window as rain fell softly on the roof science and art both "
    "begin with careful attention to the world we measure we compare we "
    "describe and then we explain the history of writing is the history of "
    "people trying to hold a thought still long enough to share it markets "
    "open in the morning and close in the evening and between those hours "
    "a thousand small decisions move goods from one hand to another "
    "questions deserve clear answers and clear answers come from clear "
    "thinking practice improves almost every skill from cooking to coding "
    "to playing the piano and patience is the quiet engine of practice"
)

_ALPHABET = "abcdefghijklmnopqrstuvwxyz "  # index 27 = OTHER
_N_SYMBOLS = 28

import numpy as np  # noqa: E402

# byte → symbol index; every byte outside [a-z ] (including each byte of a
# multi-byte UTF-8 char) maps to OTHER.
_BYTE_TO_SYM = np.full(256, 27, dtype=np.int64)
for _i, _c in enumerate(_ALPHABET):
    _BYTE_TO_SYM[ord(_c)] = _i


def _sym_indices(text: str) -> np.ndarray:
    return _BYTE_TO_SYM[np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)]


def bigram_counts(text: str) -> np.ndarray:
    """Raw (unsmoothed) 28×28 transition counts of one text."""
    counts = np.zeros((_N_SYMBOLS, _N_SYMBOLS))
    syms = _sym_indices(text)
    if len(syms) >= 2:
        np.add.at(counts, (syms[:-1], syms[1:]), 1.0)
    return counts


def logprob_table(counts: np.ndarray) -> np.ndarray:
    """Add-one-smoothed row-normalized log-probability table from raw
    transition counts — shared by the static seed table and the
    corpus-trained one (operators/textstats.train_char_bigram_lm)."""
    sm = counts + 1.0  # add-one smoothing
    return np.log(sm / sm.sum(axis=1, keepdims=True))


def _build_logprob_table() -> np.ndarray:
    return logprob_table(bigram_counts(_SEED_CORPUS))


_LOGPROB = _build_logprob_table()
_LOGPROB_FLAT = _LOGPROB.reshape(-1)

_WS_RE = re.compile(r"\s+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_SYMBOL_RE = re.compile(r"[#…]|\.\.\.")


def trigram_counts(text: str) -> np.ndarray:
    """Raw 28×28×28 transition counts of one text (context = previous two
    symbols)."""
    counts = np.zeros((_N_SYMBOLS, _N_SYMBOLS, _N_SYMBOLS))
    syms = _sym_indices(text)
    if len(syms) >= 3:
        np.add.at(counts, (syms[:-2], syms[1:-1], syms[2:]), 1.0)
    return counts


def kn_logprob_table(tri_counts: np.ndarray, discount: float = 0.75) -> np.ndarray:
    """Interpolated Kneser-Ney over the 28-symbol alphabet — the actual
    KenLM smoothing (Heafield 2011; Chen & Goodman 1999 eq. 4.25), not
    add-one: absolute discounting at the trigram level, backing off to a
    CONTINUATION-count bigram distribution, then to a discounted unigram
    continuation distribution interpolated with uniform.  The alphabet is
    tiny (28), so the fully smoothed model materializes as a dense
    (28², 28) log-probability table — scoring stays a single gather+sum
    per text, identical shape to the bigram scorer.

    Every context row sums to probability 1 (tested); contexts never
    observed fall back entirely to the lower order.
    """
    d = float(discount)
    V = _N_SYMBOLS
    tri = tri_counts.reshape(V * V, V)

    # --- unigram continuation: in how many distinct (u,v) contexts does w
    # follow?  Interpolated with uniform so nothing is ever zero.
    cont_bi = (tri_counts > 0).sum(axis=0)  # cc(v, w) = #{u : c(uvw) > 0}
    u1 = (cont_bi > 0).sum(axis=0).astype(np.float64)  # #{v : cc(vw) > 0}
    n1 = u1.sum()
    if n1 > 0:
        t1 = float((u1 > 0).sum())
        p_uni = (np.maximum(u1 - d, 0.0) + d * t1 / V) / n1
        p_uni = p_uni / p_uni.sum()  # guard fp drift; exact sum-to-1
    else:
        p_uni = np.full(V, 1.0 / V)

    # --- bigram continuation level: p_kn(w | v) from continuation counts
    cc = cont_bi.astype(np.float64)  # (V, V): context v → w
    n2 = cc.sum(axis=1, keepdims=True)
    t2 = (cc > 0).sum(axis=1, keepdims=True).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        p_bi = np.where(
            n2 > 0,
            (np.maximum(cc - d, 0.0) + d * t2 * p_uni[None, :]) / n2,
            p_uni[None, :],
        )

    # --- trigram level: absolute discounting, interpolated with p_bi(w|v)
    n3 = tri.sum(axis=1, keepdims=True)  # c(uv·)
    t3 = (tri > 0).sum(axis=1, keepdims=True).astype(np.float64)  # distinct continuations
    # context (u, v) backs off to the bigram row of v
    backoff = np.repeat(p_bi[None, :, :], V, axis=0).reshape(V * V, V)
    with np.errstate(invalid="ignore", divide="ignore"):
        p_tri = np.where(
            n3 > 0,
            (np.maximum(tri - d, 0.0) + d * t3 * backoff) / n3,
            backoff,
        )
    return np.log(p_tri)


def char_perplexity_trigram(text: str, logprob_flat: np.ndarray) -> float:
    """Perplexity under a trained KN trigram table (flattened (28², 28)
    from :func:`kn_logprob_table`); 0.0 below two transitions.  Same
    byte-level symbolization as the bigram scorer."""
    syms = _sym_indices(text)
    if len(syms) < 3:
        return 0.0
    ctx = syms[:-2] * _N_SYMBOLS + syms[1:-1]
    total = logprob_flat[ctx * _N_SYMBOLS + syms[2:]].sum()
    return math.exp(-total / (len(syms) - 2))


def char_perplexity(text: str, logprob_flat: Optional[np.ndarray] = None) -> float:
    """Bigram perplexity over UTF-8 bytes of the lowercased text; 0.0 for
    texts shorter than one transition.  Deterministic; higher = less
    English-like.  (Bytes, not code points: each byte of a multi-byte
    char counts as an OTHER transition — a vectorizable simplification
    that only affects non-ASCII text, which scores as OTHER either way.)

    ``logprob_flat`` swaps in a corpus-trained table (flattened 28×28,
    from :func:`logprob_table`); default = the static seed-corpus LM."""
    table = _LOGPROB_FLAT if logprob_flat is None else logprob_flat
    syms = _sym_indices(text)
    if len(syms) < 2:
        return 0.0
    total = table[syms[:-1] * _N_SYMBOLS + syms[1:]].sum()
    return math.exp(-total / (len(syms) - 1))


class QualityStats(NamedTuple):
    n_tokens: int
    mean_word_len: float
    alpha_ratio: float       # alphabetic chars / chars
    symbol_word_ratio: float  # '#'/ellipsis per word (Gopher rule)
    top_token_frac: float    # share of the most frequent token
    dup_bigram_frac: float   # share of duplicate word-bigrams
    perplexity: float


def quality_stats(text: str) -> QualityStats:
    tokens = [t for t in _WS_RE.split(text.strip()) if t]
    n = len(tokens)
    n_chars = len(text)
    if n == 0:
        return QualityStats(0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    # map(len)/Counter are the C-speed forms of the old per-token Python
    # loops — identical counts, same floats
    mean_len = sum(map(len, tokens)) / n
    alpha = len(_ALPHA_RE.findall(text)) / max(n_chars, 1)
    symbols = len(_SYMBOL_RE.findall(text)) / n
    top = max(Counter(tokens).values()) / n
    if n >= 2:
        bigrams = list(zip(tokens, tokens[1:]))
        dup = 1.0 - len(set(bigrams)) / len(bigrams)
    else:
        dup = 0.0
    return QualityStats(n, mean_len, alpha, symbols, top, dup, char_perplexity(text))


# Conservative gates: only degenerate text trips the flag.
MAX_MEAN_WORD_LEN = 30.0
MIN_ALPHA_RATIO = 0.05   # (only applied when n_tokens >= 20)
MAX_PERPLEXITY = 26.0    # uniform-random 28-symbol text scores ~= 28


def quality_score(stats: QualityStats) -> float:
    """Composite in [0, 1]; 1 = clean prose.  Deterministic arithmetic."""
    if stats.n_tokens == 0:
        return 1.0  # blank turns are the blank-guard's business, not ours
    penalty = 0.0
    penalty += min(max(stats.perplexity - 18.0, 0.0) / 10.0, 0.4)
    penalty += min(stats.dup_bigram_frac * 0.3, 0.3)
    penalty += min(max(stats.mean_word_len - 12.0, 0.0) / 30.0, 0.2)
    if stats.n_tokens >= 20:
        penalty += min(max(MIN_ALPHA_RATIO - stats.alpha_ratio, 0.0) * 4.0, 0.1)
    return max(0.0, round(1.0 - penalty, 6))


def quality_flagged(stats: QualityStats) -> bool:
    if stats.n_tokens == 0:
        return False
    if stats.mean_word_len > MAX_MEAN_WORD_LEN:
        return True
    if stats.n_tokens >= 20 and stats.alpha_ratio < MIN_ALPHA_RATIO:
        return True
    if stats.perplexity > MAX_PERPLEXITY and stats.n_tokens >= 5:
        return True
    return False
