"""Differential test: our kernel vs the ACTUAL reference implementation.

Loads `/root/reference/src/localmod` with torch/transformers stubbed (the
deterministic pattern-only paths never touch them) and asserts zero
decision/byte mismatches on a mixed fixture + fuzz corpus — the round-1
validation run, now living in the repo.  Skipped wholesale when the
reference checkout is absent.
"""

import random
import string
import sys
import types

import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_SRC), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with ML libs stubbed."""

    class _NoGrad:
        def __call__(self, fn=None):
            return self if fn is None else fn

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    torch_stub = types.ModuleType("torch")
    torch_stub.no_grad = _NoGrad  # @torch.no_grad() and `with` both work
    torch_stub.cuda = types.SimpleNamespace(is_available=lambda: False)
    torch_stub.Tensor = type("Tensor", (), {})
    transformers_stub = types.ModuleType("transformers")
    transformers_stub.AutoTokenizer = object
    transformers_stub.AutoModelForSequenceClassification = object
    transformers_stub.AutoModelForImageClassification = object
    transformers_stub.AutoImageProcessor = object

    saved = {k: sys.modules.get(k) for k in ("torch", "transformers")}
    sys.modules["torch"] = torch_stub
    sys.modules["transformers"] = transformers_stub
    sys.path.insert(0, REF_SRC)
    try:
        for mod in [m for m in list(sys.modules) if m.startswith("localmod")]:
            if not mod.startswith("localmod_spark"):
                del sys.modules[mod]
        from localmod.classifiers.pii import PIIDetector
        from localmod.classifiers.prompt_injection import PromptInjectionDetector
        from localmod.classifiers.spam import SpamClassifier

        yield types.SimpleNamespace(
            pii=PIIDetector(device="cpu"),
            spam=SpamClassifier(device="cpu", threshold=0.3, use_ml_model=False),
            injection=PromptInjectionDetector(device="cpu", threshold=0.2, use_ml_model=False),
        )
    finally:
        sys.path.remove(REF_SRC)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _corpus():
    """Reference fixtures + seeded fuzz (same recipe as the kernel fuzz)."""
    from localmod_spark.sources.transcripts import CORPUS

    rng = random.Random(20260816)
    alphabet = string.ascii_letters + string.digits + " .-@+()/\n!?$€[]|"
    words = (
        "free winner urgent click here buy now DAN ignore previous instructions "
        "pretend you are base64 [SYSTEM] bit.ly/x expires act now "
        "ssn 123-45-6789 test@example.com 4111111111111111 192.168.1.1 "
        "call 555-123-4567 born 01/02/1990 $100 !!! HELLO normal sentence"
    ).split()
    texts = list(CORPUS) + ["", "   ", "\n\t", "a" * 300]
    for _ in range(600):
        if rng.random() < 0.6:
            texts.append(" ".join(rng.choice(words) for _ in range(rng.randint(0, 14))))
        else:
            texts.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))))
    return texts


def test_pii_scrub_and_flags_match_reference(ref):
    from localmod_spark.kernel.pii import pii_result_from, pii_scrub

    mismatches = []
    for t in _corpus():
        ref_scrubbed, ref_hits = ref.pii.redact(t)
        got_scrubbed, got_hits = pii_scrub(t)
        if got_scrubbed != ref_scrubbed:
            mismatches.append(("scrub", t, got_scrubbed, ref_scrubbed))
            continue
        ref_res = ref.pii.predict(t)
        got_res = pii_result_from(t, got_hits)
        if (got_res.flagged, got_res.severity, sorted(got_res.categories)) != (
            ref_res.flagged, ref_res.severity.value, sorted(ref_res.categories or [])
        ):
            mismatches.append(("flags", t, got_res, ref_res))
        if [(h.type, h.start, h.end) for h in got_hits] != [
            (m.type, m.start, m.end) for m in ref_hits
        ]:
            mismatches.append(("spans", t, got_hits, ref_hits))
    assert not mismatches, mismatches[:3]


def test_spam_pattern_mode_matches_reference(ref):
    from localmod_spark.kernel.spam import spam_result

    mismatches = []
    for t in _corpus():
        want = ref.spam.predict(t)
        got = spam_result(t, threshold=0.3)
        same = (
            got.flagged == want.flagged
            and got.confidence == pytest.approx(want.confidence, abs=1e-12)
            and got.severity == want.severity.value
            and sorted(got.categories) == sorted(want.categories or [])
        )
        if not same:
            mismatches.append((t, got, want))
    assert not mismatches, mismatches[:3]


def test_injection_pattern_mode_matches_reference(ref):
    from localmod_spark.kernel.injection import injection_result

    mismatches = []
    for t in _corpus():
        want = ref.injection.predict(t)
        got = injection_result(t, threshold=0.2)
        same = (
            got.flagged == want.flagged
            and got.confidence == pytest.approx(want.confidence, abs=1e-12)
            and got.severity == want.severity.value
            and sorted(got.categories) == sorted(want.categories or [])
        )
        if not same:
            mismatches.append((t, got, want))
    assert not mismatches, mismatches[:3]
