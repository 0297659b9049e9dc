"""Language detection goldens (T1) — the scale analogue of the reference's
per-language fixture expectations (spec/rika/parser_spec.rb:252-259) plus
the undetermined path (lang_cant_be_determined.txt, "hej")."""

from __future__ import annotations

from rika_ray.corpus import FIXTURE_TEXT, WORD_POOL, _paragraph
from rika_ray.stages.lang import build_profiles, detect_language

import random


def test_fixture_texts_detected():
    profiles = build_profiles()
    for lang, text in FIXTURE_TEXT.items():
        assert detect_language(text, profiles) == lang, lang


def test_generated_paragraphs_detected():
    profiles = build_profiles()
    rng = random.Random(7)
    for lang in WORD_POOL:
        for _ in range(5):
            text = _paragraph(rng, WORD_POOL[lang], 5)
            assert detect_language(text, profiles) == lang, (lang, text[:60])


def test_undetermined_cases():
    profiles = build_profiles()
    assert detect_language("hej", profiles) is None
    assert detect_language("hello", profiles) is None
    assert detect_language("", profiles) is None
    assert detect_language(None, profiles) is None
    assert detect_language("   \n  ", profiles) is None
