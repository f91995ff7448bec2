"""Toxicity kernel: deterministic surrogate for the 4-model ensemble.

The reference toxicity classifier (`src/localmod/classifiers/toxicity.py`)
is a weighted transformer ensemble (toxic-bert 0.50, dehatebert 0.20,
s-nlp 0.15, dynabench 0.15 — `src/localmod/models/paths.py:31-36`) with
flag threshold **0.17** (`toxicity.py:46`) and severity bands
<0.4/<0.6/<0.8 (`toxicity.py:277-288`).  No model artifacts exist in the
sandbox, so the ensemble probability is replaced by a deterministic
lexicon scorer with a noisy-OR combination; the threshold, the severity
banding, the blank-guard and the flag/categories contract are the
reference's.  The test oracle and the Spark UDF share this module, so the
keep/drop parity gate is exact by construction.

Swap in real inference by passing ``prob_fn`` implementing the batched
ensemble of ``predict_batch`` (`toxicity.py:191-275`), including the
weight renormalization when models are missing (`toxicity.py:172-173`).
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from localmod_spark.kernel.types import CRITICAL, HIGH, LOW, MEDIUM, NONE, KernelResult, is_blank

DEFAULT_THRESHOLD = 0.17  # ensemble flag threshold, `toxicity.py:46`

# Surrogate lexicon: token -> weight.  Weights chosen so the reference's
# own fixture texts land on the intended side of the 0.17 threshold
# (e.g. `tests/conftest.py:24-28`, `cli.py:117-121`).
_LEXICON = {
    "idiot": 0.50, "moron": 0.50, "stupid": 0.45, "dumb": 0.35,
    "hate": 0.40, "loser": 0.40, "pathetic": 0.35, "worthless": 0.45,
    "die": 0.35, "kill": 0.35, "hurt": 0.20, "destroy": 0.15,
    "ugly": 0.30, "disgusting": 0.35, "trash": 0.25, "garbage": 0.25,
    "shut": 0.10, "fool": 0.30, "scum": 0.45, "vermin": 0.45,
}

_TOKEN_RE = re.compile(r"[a-z']+")


def surrogate_prob(text: str) -> float:
    """Noisy-OR over matched lexicon tokens: 1 - Π(1 - w).

    Deterministic, order-independent (product over a set), bounded [0, 1).
    """
    tokens = set(_TOKEN_RE.findall(text.lower()))
    prod = 1.0
    for tok in tokens & _LEXICON.keys():
        prod *= 1.0 - _LEXICON[tok]
    return 1.0 - prod


def _toxicity_severity(confidence: float, threshold: float) -> str:
    """Bands from `src/localmod/classifiers/toxicity.py:277-288`."""
    if confidence < threshold:
        return NONE
    if confidence < 0.4:
        return LOW
    if confidence < 0.6:
        return MEDIUM
    if confidence < 0.8:
        return HIGH
    return CRITICAL


def toxicity_result(
    text: str,
    threshold: float = DEFAULT_THRESHOLD,
    prob_fn: Optional[Callable[[str], float]] = None,
) -> KernelResult:
    """Verdict with the reference's flag contract
    (`src/localmod/classifiers/toxicity.py:133-189`)."""
    if is_blank(text):
        return KernelResult("toxicity", False, 0.0, NONE, ())
    prob = (prob_fn or surrogate_prob)(text)
    flagged = prob >= threshold
    return KernelResult(
        "toxicity",
        flagged,
        prob,
        _toxicity_severity(prob, threshold),
        ("general_toxicity",) if flagged else (),
    )
