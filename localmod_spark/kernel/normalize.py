"""Unicode text normalization — the canonical form fed to dedup hashing.

CCNet/Gopher-style corpora normalize before hashing so that byte-level
noise (decomposed accents, control characters, run-on spaces) does not
defeat exact and near dedup.  The spec here is deliberately minimal and
ENGINE-NEUTRAL — every step has an exact DuckDB equivalent, which is
what makes the Spark implementation cross-checkable:

  1. Unicode NFC (canonical composition — `e` + U+0301 → `é`);
  2. strip C0 control characters except LF, plus DEL
     (``[\\x00-\\x09\\x0B-\\x1F\\x7F]`` — literal byte ranges, identical
     in CPython `re`, Java regex and RE2);
  3. collapse runs of ASCII spaces to one space;
  4. trim leading/trailing ASCII spaces (space only — LF is content).

NFKC is deliberately NOT applied: compatibility folding (ligatures,
fullwidth forms) is lossy and belongs to tokenizer-side preprocessing,
not to the dedup key.
"""

from __future__ import annotations

import re
import unicodedata

_CTRL = re.compile("[\x00-\x09\x0b-\x1f\x7f]")
_MULTISPACE = re.compile(" {2,}")


def normalize_text(s: str) -> str:
    """Apply the 4-step canonical normalization to one string."""
    s = unicodedata.normalize("NFC", s)
    s = _CTRL.sub("", s)
    s = _MULTISPACE.sub(" ", s)
    return s.strip(" ")


# The exact DuckDB expression template equivalent to normalize_text —
# kept next to the kernel so the oracle and the implementation evolve
# together (format with the source column expression).
DUCKDB_NORMALIZE_TEMPLATE = (
    r"trim(regexp_replace(regexp_replace(nfc_normalize({col}),"
    r" '[\x00-\x09\x0B-\x1F\x7F]', '', 'g'), ' +', ' ', 'g'), ' ')"
)
