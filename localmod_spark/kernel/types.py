"""Shared result types for the decision kernel.

Severity ordering reproduces the reference enum
(`src/localmod/models/base.py:9-15`): none < low < medium < high < critical,
ordered by list position (`src/localmod/pipeline.py:129` uses
``list(Severity).index``).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

SEVERITIES: List[str] = ["none", "low", "medium", "high", "critical"]
SEVERITY_RANK: Dict[str, int] = {s: i for i, s in enumerate(SEVERITIES)}

NONE = "none"
LOW = "low"
MEDIUM = "medium"
HIGH = "high"
CRITICAL = "critical"


class KernelResult(NamedTuple):
    """One classifier's verdict on one text.

    Mirrors the fields of the reference ``ClassificationResult``
    (`src/localmod/models/base.py:18-38`) that bear on the keep/drop
    decision and summary string; metadata/explanation are omitted.
    """

    classifier: str
    flagged: bool
    confidence: float
    severity: str
    categories: tuple  # tuple[str, ...] — hashable, ordered


def max_severity(severities) -> str:
    """Max severity by enum position (`src/localmod/pipeline.py:129`)."""
    return max(severities, key=lambda s: SEVERITY_RANK[s])


def is_blank(text: str) -> bool:
    """The empty/whitespace guard every reference classifier applies first
    (e.g. `src/localmod/classifiers/pii.py:73`, `spam.py:85`)."""
    return not text.strip()
