"""NSFW-image decision layer (O7) — the post-inference math, surrogate-ready.

The reference's image classifier (`src/localmod/classifiers/nsfw_image.py`)
is a ViT (`Falconsai/nsfw_image_detection`) whose *decision layer* is pure
arithmetic over the softmax vector and the label names
(`nsfw_image.py:149-172` single, `nsfw_image.py:236-252` batched — same
math).  That layer is reproduced here exactly, decoupled from the model:

  * scan labels for "nsfw"/"porn"/"explicit"; nsfw_prob = max of their
    probabilities (`nsfw_image.py:153-159`);
  * predicted_label = the (last, on ties) label whose probability equals
    the max (`nsfw_image.py:158-159`);
  * fallback when no NSFW-named label fired: if the predicted label
    contains "normal", nsfw_prob = 1 - max-prob ("inverse of normal",
    `nsfw_image.py:161-163`); otherwise nsfw_prob = max-prob only if the
    predicted label itself contains "nsfw", else 0.0
    (`nsfw_image.py:164-166`);
  * threshold 0.5 (`nsfw_image.py:66`), severity bands <0.6/<0.75/<0.9
    (`nsfw_image.py:276-287`), categories ["nsfw"] when flagged
    (`nsfw_image.py:174`).

The probability vector comes from a pluggable scorer; in the sandbox the
deterministic fake decoder in ``operators/multimodal.py`` fills the slot
(no PIL/torch in this container), exactly like the toxicity surrogate.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from localmod_spark.kernel.types import CRITICAL, HIGH, LOW, MEDIUM, NONE, KernelResult

DEFAULT_THRESHOLD = 0.5  # `src/localmod/classifiers/nsfw_image.py:66`

# The reference model's label map (`Falconsai/nsfw_image_detection`):
# binary normal/nsfw.  The decision layer works for any id2label.
DEFAULT_ID2LABEL = {0: "normal", 1: "nsfw"}

_NSFW_MARKERS = ("nsfw", "porn", "explicit")


def nsfw_image_prob(
    probs: Sequence[float], id2label: Mapping[int, str] = DEFAULT_ID2LABEL
) -> Tuple[float, str]:
    """(nsfw_prob, predicted_label) per `nsfw_image.py:149-166`."""
    max_prob = max(probs)
    nsfw_prob = 0.0
    predicted_label = ""
    for idx, prob in enumerate(probs):
        label = id2label.get(idx, f"label_{idx}").lower()
        if any(m in label for m in _NSFW_MARKERS):
            nsfw_prob = max(nsfw_prob, prob)
        if prob == max_prob:  # last tie wins, as in the reference loop
            predicted_label = label
    if nsfw_prob == 0.0 and "normal" in predicted_label:
        nsfw_prob = 1.0 - max_prob  # inverse-of-normal fallback
    elif nsfw_prob == 0.0:
        nsfw_prob = max_prob if "nsfw" in predicted_label else 0.0
    return nsfw_prob, predicted_label


def _severity(confidence: float, threshold: float) -> str:
    """`src/localmod/classifiers/nsfw_image.py:276-287`."""
    if confidence < threshold:
        return NONE
    if confidence < 0.6:
        return LOW
    if confidence < 0.75:
        return MEDIUM
    if confidence < 0.9:
        return HIGH
    return CRITICAL


def nsfw_image_result(
    probs: Sequence[float],
    id2label: Mapping[int, str] = DEFAULT_ID2LABEL,
    threshold: float = DEFAULT_THRESHOLD,
) -> KernelResult:
    """Full verdict from a probability vector (`nsfw_image.py:168-182`)."""
    nsfw_prob, _ = nsfw_image_prob(probs, id2label)
    flagged = nsfw_prob >= threshold
    return KernelResult(
        "nsfw_image",
        flagged,
        nsfw_prob,
        _severity(nsfw_prob, threshold),
        ("nsfw",) if flagged else (),
    )
