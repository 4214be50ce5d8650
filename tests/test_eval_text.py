"""VQA text-normalization parity tests.

Golden oracle: the reference's own normalization functions, exec'd straight
from the read-only reference snapshot when present (no LLaVA import needed
for lines 33-114); standalone fixture expectations otherwise.
"""

import os
import re

import pytest

from attwarp_tpu.eval import calculate_vqa_accuracy, get_acc, process_text

REF = "/root/reference/Attention Guided Warping/evaluate_accuracy.py"

CASES = [
    "The answer is no.1",
    "No. 1",
    "number.42",
    "a dog and an apple",
    "dont stop",
    "It's 3,000 dollars!",
    "yes",
    "one",
    "ten dogs",
    "hello-world",
    "semi;colon test",
    "what? really!",
    "a/b testing",
    "(parenthetical)",
    "3.5 meters",
    "it is 5.",
    "I'dve guessed",
    "y'allll come",
    "  spaced   out  ",
    "UPPER Case",
    "1,234,567",
    "....................................many dots....",
]


def _load_reference_normalizer():
    with open(REF, "r", encoding="utf-8") as f:
        src = f.read()
    start = src.index("contractions = {")
    end = src.index("def get_acc")
    ns = {"re": re}
    # The snapshot uses bare "\d" regex escapes which are SyntaxWarnings on
    # py3.12 — suppress them at compile time (44 per run otherwise).
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        code = compile(src[start:end], REF, "exec")
    exec(code, ns)  # noqa: S102 — test-only oracle from snapshot
    return ns["process_text"]


@pytest.mark.skipif(not os.path.exists(REF), reason="reference snapshot absent")
@pytest.mark.parametrize("text", CASES)
def test_process_text_matches_reference(text):
    ref = _load_reference_normalizer()
    assert process_text(text) == ref(text)


def test_fixture_expectations():
    # standalone expectations (valid without the reference snapshot)
    assert process_text("The answer is no.1") == "answer is no 1"
    assert process_text("a dog and an apple") == "dog and apple"
    assert process_text("dont stop") == "don't stop"
    assert process_text("one") == "1"
    assert process_text("YES") == "yes"
    assert process_text("it is 3.5 meters") == "it is 3.5 meters"


def test_get_acc():
    # 0.33333 * 3 = 0.99999 < 1, faithfully reproducing the reference metric
    assert abs(get_acc("yes", ["yes", "yes", "yes", "no"]) - 99.999) < 1e-6
    assert get_acc("yes", ["yes"] * 4) == 100
    assert abs(get_acc("yes", ["yes", "no", "no"]) - 33.333) < 0.01
    assert get_acc("blue", ["red"]) == 0


def test_calculate_vqa_accuracy_threshold():
    gts = ["cat", "cat", "dog", "Cat"]
    assert calculate_vqa_accuracy("cat", gts, threshold=3) is True
    assert calculate_vqa_accuracy("dog", gts, threshold=1) is True
    assert calculate_vqa_accuracy("dog", gts, threshold=2) is False
    assert calculate_vqa_accuracy("", gts, threshold=1) is False
    assert calculate_vqa_accuracy("cat", [], threshold=1) is False
