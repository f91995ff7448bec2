"""PII detection + redaction kernel (deterministic, regex-based).

Reproduces, byte-for-byte, the decision semantics of the reference PII
detector (`src/localmod/classifiers/pii.py`).  The pattern strings, their
iteration order, the validators, the overlap rule and the end→start splice
are all semantics-bearing and therefore identical; the code structure
(stateless functions over tuples) is our own.

Byte-exactness notes (why this must stay CPython ``re``):
  * the email pattern's TLD class ``[A-Z|a-z]`` literally contains ``|``
    (`pii.py:33`) — Java/RE2 regex engines treat classes subtly
    differently around case folding and word boundaries, so the scrub
    contract pins CPython ``re`` semantics;
  * patterns are compiled with ``re.IGNORECASE`` (`pii.py:66`);
  * pattern iteration order = dict insertion order (`pii.py:32-40`),
    preserved here as a list;
  * the overlap filter compares each match only against the *last kept*
    match and replaces it when strictly longer (`pii.py:180-194`) — a
    quirk we reproduce exactly.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Optional, Tuple

from localmod_spark.kernel.types import CRITICAL, HIGH, LOW, MEDIUM, NONE, KernelResult, is_blank

# (type, pattern, redaction label) in the reference's dict insertion order.
# Patterns: `src/localmod/classifiers/pii.py:32-40`;
# labels:   `src/localmod/classifiers/pii.py:42-50`.
_PII_SPECS: List[Tuple[str, str, str]] = [
    ("email", r'\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b', "[EMAIL]"),
    ("phone_us", r'\b(?:\+?1[-.\s]?)?(?:\(?\d{3}\)?[-.\s]?)?\d{3}[-.\s]?\d{4}\b', "[PHONE]"),
    ("phone_intl", r'\b\+?[1-9]\d{1,14}\b', "[PHONE]"),
    ("ssn", r'\b\d{3}[-\s]?\d{2}[-\s]?\d{4}\b', "[SSN]"),
    ("credit_card", r'\b(?:\d{4}[-\s]?){3}\d{4}\b', "[CREDIT_CARD]"),
    ("ip_address", r'\b(?:\d{1,3}\.){3}\d{1,3}\b', "[IP_ADDRESS]"),
    ("date_of_birth", r'\b(?:0?[1-9]|1[0-2])[/-](?:0?[1-9]|[12]\d|3[01])[/-](?:19|20)?\d{2}\b', "[DOB]"),
]

# Compiled once per process (per Spark Python worker) at module import,
# matching the reference's compile-at-load (`pii.py:62-67`).
_COMPILED: List[Tuple[str, "re.Pattern[str]", str]] = [
    (t, re.compile(p, re.IGNORECASE), label) for t, p, label in _PII_SPECS
]

_NON_DIGIT = re.compile(r"\D")
_ANY_DIGIT = re.compile(r"\d")


class PIIHit(NamedTuple):
    type: str
    value: str
    start: int
    end: int
    label: str


def _luhn_ok(candidate: str) -> bool:
    """Luhn checksum over the digits of *candidate*
    (`src/localmod/classifiers/pii.py:143-158`)."""
    digits = [int(d) for d in _NON_DIGIT.sub("", candidate)]
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _ssn_ok(candidate: str) -> bool:
    """SSN prefix rules: 9 digits, not starting 9/666/000
    (`src/localmod/classifiers/pii.py:160-169`)."""
    digits = _NON_DIGIT.sub("", candidate)
    if len(digits) != 9:
        return False
    return not (digits.startswith("9") or digits.startswith("666") or digits.startswith("000"))


def _ip_ok(candidate: str) -> bool:
    """Each dotted octet in [0, 255] (`src/localmod/classifiers/pii.py:171-178`)."""
    try:
        return all(0 <= int(part) <= 255 for part in candidate.split("."))
    except ValueError:
        return False


_VALIDATORS = {"credit_card": _luhn_ok, "ssn": _ssn_ok, "ip_address": _ip_ok}


def pii_scan(text: str) -> List[PIIHit]:
    """All validated, overlap-filtered PII hits, sorted by start offset.

    Mirrors ``_find_all_pii`` (`pii.py:113-131`): per-type ``finditer`` in
    insertion order, validation, stable sort by start (ties keep type
    order), then the last-kept-only overlap filter (`pii.py:180-194`).
    """
    # Prescreen (pure optimization, decision-identical): the email pattern
    # requires a literal '@'; every other pattern requires at least one
    # digit.  Texts lacking both cannot match anything.
    has_at = "@" in text
    has_digit = _ANY_DIGIT.search(text) is not None
    if not has_at and not has_digit:
        return []

    hits: List[PIIHit] = []
    for pii_type, pattern, label in _COMPILED:
        if pii_type == "email":
            if not has_at:
                continue
        elif not has_digit:
            continue
        validator = _VALIDATORS.get(pii_type)
        for m in pattern.finditer(text):
            if validator is not None and not validator(m.group()):
                continue
            hits.append(PIIHit(pii_type, m.group(), m.start(), m.end(), label))

    hits.sort(key=lambda h: h.start)  # stable: ties keep pattern order

    if not hits:
        return hits
    kept = [hits[0]]
    for cur in hits[1:]:
        prev = kept[-1]
        if cur.start >= prev.end:
            kept.append(cur)
        elif cur.end - cur.start > prev.end - prev.start:
            kept[-1] = cur
    return kept


def pii_scrub(text: str, replacement: Optional[str] = None) -> Tuple[str, List[PIIHit]]:
    """Redact all hits end→start so earlier offsets stay valid
    (`src/localmod/classifiers/pii.py:215-229`).  This is the byte-exact
    surface: with ``replacement=None`` each hit uses its type label."""
    hits = pii_scan(text)
    if not hits:
        return text, []
    out = text
    for h in reversed(hits):
        out = out[: h.start] + (replacement or h.label) + out[h.end :]
    return out, hits


def _pii_severity(hits: List[PIIHit]) -> str:
    """Severity by detected type set (`src/localmod/classifiers/pii.py:196-213`)."""
    if not hits:
        return NONE
    types = set(h.type for h in hits)
    if types & {"ssn", "credit_card"}:
        return CRITICAL
    if len(types) > 1 or "date_of_birth" in types:
        return HIGH
    if types & {"email", "phone_us", "phone_intl"}:
        return MEDIUM
    return LOW


def pii_categories_from(hits: List[PIIHit]) -> tuple:
    """Distinct detected types in first-seen order (see pii_result note)."""
    seen: List[str] = []
    for h in hits:
        if h.type not in seen:
            seen.append(h.type)
    return tuple(seen)


def pii_result_from(text: str, hits: List[PIIHit]) -> KernelResult:
    """Verdict from an existing scan — lets callers that already scrubbed
    (and therefore scanned) avoid a second full regex pass."""
    if is_blank(text):
        return KernelResult("pii", False, 0.0, NONE, ())
    flagged = len(hits) > 0
    return KernelResult(
        "pii",
        flagged,
        1.0 if flagged else 0.0,
        _pii_severity(hits),
        pii_categories_from(hits),
    )


def pii_result(text: str) -> KernelResult:
    """Full PII verdict (`src/localmod/classifiers/pii.py:69-111`):
    flagged iff any hit, confidence 1.0/0.0, categories = distinct types.

    Category ordering: the reference builds ``list(set(...))`` (`pii.py:88`)
    — set order is unspecified, so categories never feed ordered output in
    the reference either (the summary joins them, but only the *flag* and
    severity gate decisions).  We use first-seen order for determinism.
    """
    return pii_result_from(text, [] if is_blank(text) else pii_scan(text))
